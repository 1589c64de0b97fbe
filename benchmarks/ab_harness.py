"""Generic env-var A/B harness for the tuned config-5 retrieval step.

Several ops ship behind trace-time env-var switches (ATQ_S2D_STEM,
ATQ_FAST_POOL, ATQ_NO_PALLAS ...). This harness measures the same
config-5 step with the switch off and on in ONE process — each variant
builds its own jit, so the env var is honored per-variant — and writes a
JSON verdict. s2d_ab.py and fastpool_ab.py are thin wrappers; a change
to the measurement protocol lands here once and both A/Bs stay
comparable.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from atq_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from builders import build_retrieval_step  # noqa: E402


def measure(batch, use_amp, iters=12):
    from atq_tpu.utils.timing import steady_state_sec_per_step

    step, step_fn, state, args = build_retrieval_step(batch,
                                                      use_amp=use_amp)
    dt, state = steady_state_sec_per_step(step_fn, state, (), warmup=3,
                                          iters=iters)
    del state
    return dt


def run_ab(env_name, off_label, on_label, default_out, argv=None):
    """Measure the step with ``env_name`` = "0" then "1"; print and dump
    {off_label: ..., on_label: ..., speedup: off_ms/on_ms}."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--amp", action="store_true", default=True)
    ap.add_argument("--no-amp", dest="amp", action="store_false")
    ap.add_argument("--out", type=str, default=default_out)
    args = ap.parse_args(argv)

    results = {}
    for variant, env in ((off_label, "0"), (on_label, "1")):
        os.environ[env_name] = env
        dt = measure(args.batch, args.amp)
        results[variant] = {"ms_per_step": dt * 1000,
                            "pairs_per_sec": args.batch / dt}
        print(f"{variant}: {dt * 1000:.2f} ms/step "
              f"({args.batch / dt:.0f} pairs/sec)", flush=True)

    speedup = (results[off_label]["ms_per_step"]
               / results[on_label]["ms_per_step"])
    results["speedup"] = speedup
    results["batch"] = args.batch
    results["use_amp"] = args.amp
    print(f"{on_label}/{off_label} speedup: {speedup:.3f}x", flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    return results
