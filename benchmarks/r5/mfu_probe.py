#!/usr/bin/env python
"""Round-5 bert-base MFU probes (VERDICT.md round-4 item 1 follow-through).

The round-4/5 on-chip A/B showed the purpose-built fused attention kernel
LOSES to XLA's einsum attention at every scale config (bert-base 24.35% vs
28.28% MFU, benchmarks/scale_mfu_r5.json), so the path to the >=35% bar runs
through the einsum program. The round-4 profile join names two costs:
remat recompute (~25 ms/step) and the per-weight order-statistic kernel
launches (~11-17 ms/step, 72 launches under the scanned stack). Each probe
isolates one of them with a bounded on-chip measurement:

  baseline   scan + save_dots einsum step (reproduces the scale_mfu row)
  noremat    scan WITHOUT remat — pays HBM for stacked residuals to skip
             the backward recompute entirely (OOMs are caught and recorded)
  fixthr     ternary_threshold monkeypatched to a constant: an UPPER BOUND
             on what removing every order-stat launch could buy (not a
             semantics-preserving optimization — a measurement instrument)
  dense      plain flax Dense encoder at identical shapes: the chip's
             ceiling for this program shape independent of quantization

Run one probe per process (``--probe X``) so an OOM cannot kill the sweep:
``bash benchmarks/r5/run_probes.sh`` drives the queue.
"""

import argparse
import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from atq_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def _load_scale_mfu():
    spec = importlib.util.spec_from_file_location(
        "scale_mfu", os.path.join(REPO, "benchmarks", "scale_mfu.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


BERT_BASE = (768, 3072, 12, 12, 256, 64)  # embed ffn heads layers seq batch


def probe_baseline(iters):
    sm = _load_scale_mfu()
    spec = BERT_BASE + (True, True)  # remat, scan
    return sm.measure("bert-base", spec, iters=iters,
                      remat_policy="save_dots", attn_impl="einsum")


def probe_noremat(iters):
    sm = _load_scale_mfu()
    spec = BERT_BASE + (False, True)
    return sm.measure("bert-base", spec, iters=iters,
                      remat_policy="save_dots", attn_impl="einsum")


def probe_fixthr(iters):
    import jax.numpy as jnp

    import atq_tpu.core.quantize as Q
    import atq_tpu.nn.layers as L

    def fixed_threshold(weights, threshold_factor=0.05, sparsity_target=0.3):
        # Constant in (0, typical |w| max): keeps the where-pattern and all
        # downstream math structurally identical, removes only the
        # data-dependent selection. NOT semantics-preserving.
        return jnp.asarray(0.02, weights.dtype)

    Q.ternary_threshold = fixed_threshold
    L.ternary_threshold = fixed_threshold
    sm = _load_scale_mfu()
    spec = BERT_BASE + (True, True)
    row = sm.measure("bert-base", spec, iters=iters,
                     remat_policy="save_dots", attn_impl="einsum")
    row["note"] = "ternary_threshold pinned to 0.02 (order-stat removed)"
    return row


def probe_profile_qat(iters):
    """Op-level trace of the baseline QAT step: where the 55.6 ms of
    quantization overhead (probe baseline 158.1 ms vs dense 102.5 ms)
    actually goes."""
    sm = _load_scale_mfu()
    spec = BERT_BASE + (True, True)
    step, step_fn, state, _ = sm.build_step(
        *spec, remat_policy="save_dots", attn_impl="einsum")

    from atq_tpu.utils.profile_step import profile_fn

    holder = {"s": state}

    def once():
        holder["s"], loss = step(holder["s"])
        return loss

    stats = profile_fn(once, iters=8, top=40)
    return {"config": "bert-base", "kind": "profile-qat",
            "ops": [{"name": s.name, "total_us": s.total_us,
                     "count": s.count, "pct": s.pct} for s in stats]}


def probe_profile_dense(iters):
    import jax

    step, state = _build_dense()
    from atq_tpu.utils.profile_step import profile_fn

    holder = {"s": state}

    def once():
        holder["s"], loss = step(holder["s"])
        return loss

    stats = profile_fn(once, iters=8, top=40)
    return {"config": "bert-base-DENSE", "kind": "profile-dense",
            "ops": [{"name": s.name, "total_us": s.total_us,
                     "count": s.count, "pct": s.pct} for s in stats]}


def _build_dense():
    """Plain flax Dense encoder at bert-base dims (shared by the dense
    timing probe and its profile probe). Returns (jitted step, state)."""
    import functools

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    sm = _load_scale_mfu()
    embed, ffn, heads, layers, seq, batch = BERT_BASE
    dtype = jnp.bfloat16

    class Layer(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.LayerNorm(dtype=jnp.float32)(x.astype(jnp.float32))
            h = h.astype(dtype)
            q = nn.Dense(embed, dtype=dtype)(h)
            k = nn.Dense(embed, dtype=dtype)(h)
            v = nn.Dense(embed, dtype=dtype)(h)
            hd = embed // heads
            def split(t):
                return t.reshape(batch, seq, heads, hd).transpose(0, 2, 1, 3)
            q, k, v = split(q), split(k), split(v)
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
            a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
            o = o.transpose(0, 2, 1, 3).reshape(batch, seq, embed)
            x = x + nn.Dense(embed, dtype=dtype)(o)
            h2 = nn.LayerNorm(dtype=jnp.float32)(x.astype(jnp.float32))
            h2 = nn.Dense(ffn, dtype=dtype)(h2.astype(dtype))
            h2 = nn.gelu(h2)
            return x + nn.Dense(embed, dtype=dtype)(h2)

    class Body(nn.Module):
        @nn.compact
        def __call__(self, carry, _):
            return Layer(name="layer")(carry).astype(carry.dtype), None

    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, tokens):
            x = nn.Embed(sm.VOCAB, embed, dtype=dtype)(tokens)
            body = nn.remat(
                Body,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
            x, _ = nn.scan(body, variable_axes={"params": 0},
                           split_rngs={"params": True},
                           length=layers)(name="scan")(x, None)
            x = nn.LayerNorm()(x.astype(jnp.float32))
            return nn.Dense(sm.N_CLASSES)(jnp.mean(x, axis=1))

    model = Encoder()
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, sm.VOCAB, (batch, seq)), jnp.int32)
    labels = jnp.asarray(rng.randint(0, sm.N_CLASSES, (batch,)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]
    tx = optax.adamw(1e-4)

    def loss_fn(p):
        logits = model.apply({"params": p}, tokens)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state):
        p, opt = state
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt = tx.update(grads, opt, p)
        return (optax.apply_updates(p, updates), opt), loss

    return step, (params, tx.init(params))


def probe_dense(iters):
    """Plain flax Dense encoder, same dims/remat shape — the chip ceiling
    for this program independent of quantization."""
    sm = _load_scale_mfu()
    from atq_tpu.utils.flops import mfu
    from atq_tpu.utils.timing import steady_state_sec_per_step

    step, state = _build_dense()
    dt, _ = steady_state_sec_per_step(lambda s: step(s), state,
                                      warmup=2, iters=iters)
    embed, ffn, heads, layers, seq, batch = BERT_BASE
    flops = sm.analytic_step_flops(embed, ffn, heads, layers, seq, batch)
    util = mfu(flops, dt)
    return {"config": "bert-base-DENSE", "ms_per_step": dt * 1000,
            "flops_per_step": flops,
            "mfu_pct": None if util is None else util * 100.0,
            "note": "plain flax Dense encoder, dots-saveable remat"}


def probe_hoist(iters):
    """Hoisted-quantization step (nn/hoist.py): quantize once per step
    outside the scan, body is pure matmuls."""
    sm = _load_scale_mfu()
    spec = BERT_BASE + (True, True)
    row = sm.measure("bert-base", spec, iters=iters,
                     remat_policy="save_dots", attn_impl="einsum",
                     hoist_quant=True)
    row["note"] = "hoist_quant=True"
    return row


def probe_hoistraw(iters):
    """Hoisted structure with the quantize chain REPLACED by a cast-only
    transform (raw f32 weights straight to the matmul dtype). Splits the
    remaining QAT-vs-dense gap into (a) TernaryTransformerLayer structure
    (W.T layout, gates, extra casts, optimizer extras) vs (b) the batched
    quantize chain fwd+bwd. NOT semantics-preserving — an instrument."""
    import atq_tpu.nn.hoist as H

    def cast_only(node, quant_node, grad_mode, dtype):
        w = node["weight"]
        return w.astype(dtype) if dtype is not None else w

    H._effective_weight = cast_only
    sm = _load_scale_mfu()
    spec = BERT_BASE + (True, True)
    row = sm.measure("bert-base", spec, iters=iters,
                     remat_policy="save_dots", attn_impl="einsum",
                     hoist_quant=True)
    row["note"] = "hoist transform = cast-only (quantize chain removed)"
    return row


def probe_profile_hoist(iters):
    """Op-level trace of the HOISTED step: what the remaining gap vs the
    dense ceiling (102.5 ms) actually is once quantization is out of the
    scan."""
    sm = _load_scale_mfu()
    spec = BERT_BASE + (True, True)
    step, step_fn, state, _ = sm.build_step(
        *spec, remat_policy="save_dots", attn_impl="einsum",
        hoist_quant=True)

    from atq_tpu.utils.profile_step import profile_fn

    holder = {"s": state}

    def once():
        holder["s"], loss = step(holder["s"])
        return loss

    stats = profile_fn(once, iters=8, top=40)
    return {"config": "bert-base", "kind": "profile-hoist",
            "ops": [{"name": s.name, "total_us": s.total_us,
                     "count": s.count, "pct": s.pct} for s in stats]}


REF_SCALE = (128, 512, 8, 4, 50, 256)  # embed ffn heads layers seq batch


def probe_profile_ref(iters):
    """Op-level trace of the ref-scale step (the reference's own model
    shape, 6.6% MFU): name the fixed cost (VERDICT round-4 item 2)."""
    sm = _load_scale_mfu()
    spec = REF_SCALE + (False, False)
    step, step_fn, state, _ = sm.build_step(*spec, attn_impl="einsum")

    from atq_tpu.utils.profile_step import profile_fn

    holder = {"s": state}

    def once():
        holder["s"], loss = step(holder["s"])
        return loss

    stats = profile_fn(once, iters=16, top=40)
    return {"config": "ref-scale", "kind": "profile-ref",
            "ops": [{"name": s.name, "total_us": s.total_us,
                     "count": s.count, "pct": s.pct} for s in stats]}


def probe_reffixthr(iters):
    """ref-scale with the threshold pinned: upper bound on what removing
    every order-stat/sort could buy at the reference's own shape."""
    import jax.numpy as jnp

    import atq_tpu.core.quantize as Q
    import atq_tpu.nn.layers as L

    def fixed_threshold(weights, threshold_factor=0.05, sparsity_target=0.3):
        return jnp.asarray(0.02, weights.dtype)

    Q.ternary_threshold = fixed_threshold
    L.ternary_threshold = fixed_threshold
    sm = _load_scale_mfu()
    spec = REF_SCALE + (False, False)
    row = sm.measure("ref-scale", spec, iters=max(iters, 16),
                     attn_impl="einsum")
    row["note"] = "ternary_threshold pinned to 0.02 (order-stat removed)"
    return row


def probe_refbase(iters):
    """ref-scale baseline re-measure in the same session as the other
    ref probes (cross-session dispersion control)."""
    sm = _load_scale_mfu()
    spec = REF_SCALE + (False, False)
    return sm.measure("ref-scale", spec, iters=max(iters, 16),
                      attn_impl="einsum")


PROBES = {
    "baseline": probe_baseline,
    "noremat": probe_noremat,
    "fixthr": probe_fixthr,
    "dense": probe_dense,
    "profqat": probe_profile_qat,
    "profdense": probe_profile_dense,
    "hoist": probe_hoist,
    "hoistraw": probe_hoistraw,
    "profhoist": probe_profile_hoist,
    "profref": probe_profile_ref,
    "reffixthr": probe_reffixthr,
    "refbase": probe_refbase,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", required=True, choices=sorted(PROBES))
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or os.path.join(
        REPO, "benchmarks", "r5", f"probe_{args.probe}.json")
    try:
        row = PROBES[args.probe](args.iters)
    except Exception as e:  # record OOMs etc. as data, not a dead sweep
        row = {"probe": args.probe, "error": f"{type(e).__name__}: {e}"[:500]}
    row["probe"] = args.probe
    with open(out, "w") as f:
        json.dump(row, f, indent=2)
    print(json.dumps(row, indent=2), flush=True)


if __name__ == "__main__":
    main()
