#!/usr/bin/env python
"""A/B the dense max-pool backward (ATQ_FAST_POOL) on the real chip.

The round-3 profile (benchmarks/mfu_profile_join.json) measured the
ResNet stem maxpool backward (XLA ``select-and-scatter``) at 0.80
ms/step — 5.9% of device time — in the tuned retrieval config (batch
128 + bf16 AMP). ``atq_tpu/ops/fast_pool.py`` replaces it with dense
strided masked adds. This harness measures the same config-5 step both
ways in ONE process (the env var is read at trace time, so each variant
builds its own jit) and prints a JSON verdict.

Usage: ``python benchmarks/fastpool_ab.py [--batch 128] [--amp]
[--out benchmarks/fastpool_ab.json]``
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from atq_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from mfu_attack import build_retrieval_step  # noqa: E402


def measure(batch, use_amp, iters=12):
    from atq_tpu.utils.timing import steady_state_sec_per_step

    step, step_fn, state, args = build_retrieval_step(batch,
                                                      use_amp=use_amp)
    dt, state = steady_state_sec_per_step(step_fn, state, (), warmup=3,
                                          iters=iters)
    del state
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--amp", action="store_true", default=True)
    ap.add_argument("--no-amp", dest="amp", action="store_false")
    ap.add_argument("--out", type=str,
                    default=os.path.join(os.path.dirname(
                        os.path.abspath(__file__)), "fastpool_ab.json"))
    args = ap.parse_args()

    results = {}
    for variant, env in (("xla_pool", "0"), ("fast_pool", "1")):
        os.environ["ATQ_FAST_POOL"] = env
        dt = measure(args.batch, args.amp)
        results[variant] = {"ms_per_step": dt * 1000,
                            "pairs_per_sec": args.batch / dt}
        print(f"{variant}: {dt * 1000:.2f} ms/step "
              f"({args.batch / dt:.0f} pairs/sec)", flush=True)

    speedup = (results["xla_pool"]["ms_per_step"]
               / results["fast_pool"]["ms_per_step"])
    results["speedup"] = speedup
    results["batch"] = args.batch
    results["use_amp"] = args.amp
    print(f"fast/xla speedup: {speedup:.3f}x", flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
