#!/usr/bin/env python
"""A/B the space-to-depth ResNet stem (ATQ_S2D_STEM) on the real chip.

The round-3 profile-HLO join put the stem conv1 (7x7/2, 3 input
channels) at the top of the op table — its 3-channel contraction
starves the MXU. ``atq_tpu/ops/s2d_stem.py`` rewrites it exactly as a
4x4/stride-1 conv over a 2x2 space-to-depth input (12 channels). This
harness measures the tuned config-5 step both ways in one process (the
env var is read at trace time, so each variant builds its own jit).

Usage: ``python benchmarks/s2d_ab.py [--batch 128] [--no-amp]
[--out <json>]``
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
                        os.path.abspath(__file__)), "s2d_ab.json"))
    args = ap.parse_args()

    results = {}
    for variant, env in (("direct_stem", "0"), ("s2d_stem", "1")):
        os.environ["ATQ_S2D_STEM"] = env
        dt = measure(args.batch, args.amp)
        results[variant] = {"ms_per_step": dt * 1000,
                            "pairs_per_sec": args.batch / dt}
        print(f"{variant}: {dt * 1000:.2f} ms/step "
              f"({args.batch / dt:.0f} pairs/sec)", flush=True)

    speedup = (results["direct_stem"]["ms_per_step"]
               / results["s2d_stem"]["ms_per_step"])
    results["speedup"] = speedup
    results["batch"] = args.batch
    results["use_amp"] = args.amp
    print(f"s2d/direct speedup: {speedup:.3f}x", flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
