"""The production-shape MFU harness (benchmarks/scale_mfu.py) stays
buildable: a tiny config compiles, steps, and reports sane numbers on CPU.
"""

import sys

sys.path.insert(0, "/root/repo/benchmarks")


def test_scale_mfu_tiny_config_runs():
    import scale_mfu

    row = scale_mfu.measure("tiny", (32, 64, 4, 2, 16, 4, True, True),
                            use_amp=True, iters=2)
    assert row["params_millions"] > 0.5  # embed table dominates
    assert row["ms_per_step"] > 0
    assert row["tokens_per_sec"] > 0
    assert row["flops_per_step"] and row["flops_per_step"] > 1e6


def test_scale_mfu_fp32_no_remat_runs():
    import scale_mfu

    row = scale_mfu.measure("tiny", (32, 64, 4, 1, 16, 4, False, False),
                            use_amp=False, iters=2)
    assert row["ms_per_step"] > 0
