#!/usr/bin/env python
"""MFU attack on the retrieval training step (BASELINE config 5).

Round-2 verdict: config 5 measured 14.1% MFU (15.3% under bf16 AMP) and
nobody had published where the other ~85% goes. This harness produces the
evidence and sweeps the available levers in one TPU session:

1. **Op profile**: captures a jax.profiler trace of the steady-state step
   and prints the top-op table (atq_tpu/utils/profile_step.py).
2. **Batch sweep**: 64 -> 512, fp32 and bf16 AMP — bigger batches amortize
   the fixed per-step cost (threshold sorts, layer norms, optimizer
   update) over more MXU work.
3. **Order-stat A/B**: the one-launch Pallas order-statistic kernel vs the
   XLA sort fallback (ATQ_NO_PALLAS=1), isolating whether the per-layer
   threshold computation serializes the step.

Run on the TPU: ``python benchmarks/mfu_attack.py [--out out.json]
[--quick]``. Writes incrementally so a mid-run crash keeps earlier rows.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from atq_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()  # persistent XLA compilation cache across retries

from builders import build_retrieval_step  # noqa: E402,F401  (canonical
# config-5 step construction shared with run_all.py and the A/B harnesses)


def measure(batch, use_amp, iters=10, grad_accum_steps=1):
    from atq_tpu.utils.flops import compiled_flops, mfu
    from atq_tpu.utils.timing import steady_state_sec_per_step

    import jax

    step, step_fn, state, args = build_retrieval_step(
        batch, use_amp=use_amp, grad_accum_steps=grad_accum_steps)
    dt, state = steady_state_sec_per_step(step_fn, state, (), warmup=3,
                                          iters=iters)
    abstract = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state)
    flops = compiled_flops(step, abstract, *args)
    util = mfu(flops, dt)
    row = {
        "batch": batch, "use_amp": use_amp,
        "grad_accum_steps": grad_accum_steps,
        "ms_per_step": dt * 1000, "pairs_per_sec": batch / dt,
        "flops_per_step": flops,
        "mfu_pct": None if util is None else util * 100.0,
    }
    del state
    return row


def profile_config5(out_dir, batch=64, use_amp=False, iters=8,
                    grad_accum_steps=1):
    """Capture a steady-state trace and return the top-op rows."""
    from atq_tpu.utils.profile_step import profile_fn, print_summary

    step, step_fn, state, args = build_retrieval_step(
        batch, use_amp=use_amp, grad_accum_steps=grad_accum_steps)

    holder = {"state": state}

    def run_once():
        holder["state"], loss = step_fn(holder["state"])
        return loss

    stats = profile_fn(run_once, iters=iters, trace_dir=out_dir)
    print_summary(stats)
    return [{"op": s.name, "total_us": s.total_us, "count": s.count,
             "pct": s.pct} for s in stats[:20]]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str,
                        default="benchmarks/mfu_attack.json")
    parser.add_argument("--quick", action="store_true",
                        help="smaller sweep (batch 64/256, fewer iters)")
    parser.add_argument("--skip-profile", action="store_true")
    parser.add_argument("--gradcache", action="store_true",
                        help="also sweep GradCache accumulation configs")
    args = parser.parse_args()

    results = {"no_pallas": os.environ.get("ATQ_NO_PALLAS", "0")}

    def flush():
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    batches = (64, 256) if args.quick else (64, 128, 256, 512)
    sweep = []
    if args.gradcache:
        # GradCache rows: same pool sizes at microbatch activation
        # memory — how much step time the two-pass scheme costs on-chip.
        for b, accum in ((128, 2), (256, 4), (512, 8)):
            print(f"--- gradcache batch {b} accum {accum} ---", flush=True)
            try:
                row = measure(b, True, iters=6, grad_accum_steps=accum)
            except Exception as e:
                row = {"batch": b, "grad_accum_steps": accum,
                       "error": str(e)}
            print(row, flush=True)
            sweep.append(row)
            results["sweep"] = sweep
            flush()
    for use_amp in (False, True):
        for b in batches:
            print(f"--- batch {b} amp={use_amp} ---", flush=True)
            try:
                row = measure(b, use_amp, iters=6 if args.quick else 10)
            except Exception as e:  # record and continue the sweep
                row = {"batch": b, "use_amp": use_amp, "error": str(e)}
            print(row, flush=True)
            sweep.append(row)
            results["sweep"] = sweep
            flush()

    if not args.skip_profile:
        for use_amp in (False, True):
            key = "profile_amp" if use_amp else "profile_fp32"
            print(f"--- trace {key} ---", flush=True)
            try:
                results[key] = profile_config5(
                    f"/tmp/mfu_trace_{key}", use_amp=use_amp)
            except Exception as e:
                results[key] = {"error": str(e)}
            flush()
    print(json.dumps({k: v for k, v in results.items()
                      if k == "sweep"}, indent=2))


if __name__ == "__main__":
    main()
