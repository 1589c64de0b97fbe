#!/usr/bin/env python
"""Round-5 forensics: the batch-512 retrieval regression (VERDICT r4 #2).

benchmarks/mfu_attack.json shows the tuned retrieval step (config 5, bf16
AMP) peaking at 25.4% MFU at batch 128, then FALLING to 18.2% at batch
512 — per-pair throughput goes backwards exactly where amortization
should be helping. Nobody has profiled the 512 step. This probe:

1. re-measures batch 128 and 512 (AMP) in ONE session (dispersion
   control — the r4 numbers were a different day), and
2. captures the op-level trace of the batch-512 step so the regression
   has a name (spill? O(B^2) loss terms? input assembly? optimizer?).

Usage: python benchmarks/r5/batch512_probe.py [--mode measure|profile|both]
Writes benchmarks/r5/batch512_probe.json incrementally.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from atq_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

OUT = os.path.join(os.path.dirname(__file__), "batch512_probe.json")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", default="both",
                        choices=("measure", "profile", "both"))
    args = parser.parse_args()

    from mfu_attack import measure, profile_config5  # noqa: E402

    results = {}

    def flush():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

    if args.mode in ("measure", "both"):
        for b in (128, 512):
            print(f"--- measure batch {b} amp ---", flush=True)
            try:
                row = measure(b, True, iters=10)
            except Exception as e:
                row = {"batch": b, "use_amp": True, "error": str(e)}
            print(row, flush=True)
            results[f"measure_b{b}"] = row
            flush()

    if args.mode in ("profile", "both"):
        print("--- profile batch 512 amp ---", flush=True)
        try:
            results["profile_b512"] = profile_config5(
                "/tmp/b512_trace", batch=512, use_amp=True, iters=6)
        except Exception as e:
            results["profile_b512"] = {"error": str(e)}
        flush()

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
