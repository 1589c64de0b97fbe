#!/usr/bin/env python
"""Where the device time goes for a production-shape config.

Profiles the steady-state `scale_mfu` training step with jax.profiler,
buckets per-op device time by fusion kind, and writes the table that
says what to attack next. Companion to `scale_mfu.py`'s MFU numbers.

Run on the TPU: ``python benchmarks/scale_profile.py --config bert-base
[--out benchmarks/scale_profile.json]``.
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from atq_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

CATEGORY_PATTERNS = [
    # (bucket, regex over "<instruction name> | <jax op_name metadata>")
    ("control-flow wrapper (excluded)", r"^while[.\d]* \|"),
    ("matmul (MXU)", r"dot_general|dot[.\d]* |convolution|conv_general"),
    ("sort / order-stat (thresholds)", r"sort|top_k|topk|order_stat|"
                                       r"partition"),
    ("async copy (VMEM staging)", r"copy"),
    ("collective", r"all-reduce|all-gather|reduce-scatter|all_to_all|"
                   r"ppermute|collective"),
    ("reduce (LN stats, loss)", r"reduce"),
    ("pallas kernel", r"pallas"),
    ("elementwise / fusion", r"fusion|add|multiply|select|convert|"
                             r"broadcast|transpose|slice|scatter|iota|"
                             r"tanh|exp|erf|rsqrt|compare|gelu"),
]


def build_opname_map(hlo_text: str):
    """instruction name -> jax-level op_name metadata, from optimized HLO.

    Fusion instructions carry the metadata of their root op, which names
    the jax primitive (e.g. ``.../dot_general``) — the join that makes
    TPU's anonymous ``fusion.N`` trace events attributable.
    """
    pat = re.compile(r"%?([\w.-]+) = [^\n]*?op_name=\"([^\"]+)\"")
    return {m.group(1): m.group(2) for m in pat.finditer(hlo_text)}


def categorize(name: str, opname_map) -> str:
    label = f"{name} | {opname_map.get(name, '')}".lower()
    for bucket, pat in CATEGORY_PATTERNS:
        if re.search(pat, label):
            return bucket
    return "other"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="bert-base")
    parser.add_argument("--out", default="benchmarks/scale_profile.json")
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--top", type=int, default=25)
    parser.add_argument("--remat-policy", default="save_quantized",
                        choices=["save_quantized", "save_dots", "full"])
    parser.add_argument("--attn", default="einsum",
                        choices=["einsum", "fused"])
    args = parser.parse_args()

    import jax

    import scale_mfu
    from atq_tpu.utils.profile_step import profile_fn

    spec = scale_mfu.CONFIGS[args.config]
    step, step_fn, state, n_params = scale_mfu.build_step(
        *spec, remat_policy=args.remat_policy, attn_impl=args.attn)

    # steady state before tracing
    holder = {"state": state}
    for _ in range(2):
        holder["state"], _ = step(holder["state"])
    jax.block_until_ready(holder["state"])

    def run_once():
        holder["state"], loss = step(holder["state"])
        return loss

    trace_dir = "/tmp/scale_profile_trace"
    # top=10000: category totals must cover ALL ops, not the top table.
    stats = profile_fn(run_once, iters=args.iters, trace_dir=trace_dir,
                       top=10000)

    abstract = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
        holder["state"])
    hlo_text = step.lower(abstract).compile().as_text()
    opname_map = build_opname_map(hlo_text)

    per_step = [
        {"name": s.name, "ms_per_step": s.total_us / 1000.0 / args.iters,
         "count": s.count, "category": categorize(s.name, opname_map),
         "op_name": opname_map.get(s.name, "")}
        for s in stats
    ]
    # Control-flow wrapper events (the scan `while`s) cover their
    # children, which are traced separately — excluding them makes the
    # category totals sum to the real step time instead of ~2x it.
    per_step = [r for r in per_step
                if r["category"] != "control-flow wrapper (excluded)"]
    cats = {}
    for row in per_step:
        cats[row["category"]] = cats.get(row["category"], 0.0) \
            + row["ms_per_step"]
    total = sum(cats.values())
    out = {
        "config": args.config,
        "remat_policy": args.remat_policy,
        "attn_impl": args.attn,
        "iters": args.iters,
        "total_device_ms_per_step": total,
        "categories": dict(sorted(cats.items(), key=lambda kv: -kv[1])),
        "top_ops": per_step[: args.top],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"total_device_ms_per_step": total,
                      "categories": out["categories"]}, indent=2))
    for row in per_step[: args.top]:
        print(f"{row['ms_per_step']:8.3f} ms  {row['category']:<28} "
              f"{row['name'][:80]}")


if __name__ == "__main__":
    main()
