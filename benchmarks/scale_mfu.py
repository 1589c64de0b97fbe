#!/usr/bin/env python
"""MFU at production shapes: the framework without the reference's tiny dims.

The config-5 profile (BENCHMARKS.md "where the other 75% goes") shows the
*reference's* shapes — embed 192, 160px images, a high-res low-channel conv
trunk — cap conv-internal MFU at ~46%, and the achieved 25.4% is 55% of that
ceiling. This harness answers the question that analysis raises: what does
the same framework sustain when the shapes are production-sized and the
FLOPs live where the MXU wants them (large ternary-transformer matmuls)?

Each config is a full quantization-aware training step — ternary RPB
projections with per-step on-device threshold selection (the ATQ method's
real cost, order-stat kernel included), STE gradients, AdamW — on a
BERT-class encoder stack: token embedding + N TernaryTransformerLayer
(atq_tpu/nn/transformer.py, the same module the retrieval text encoder
stacks) + mean-pool + dense head, softmax CE.

Run on the TPU: ``python benchmarks/scale_mfu.py [--quick] [--out f.json]``.
Writes incrementally so a mid-run crash keeps earlier rows.
"""

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from atq_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

# name: (embed, ffn, heads, layers, seq, batch, remat, scan)
# scan=True stacks the layers with nn.scan: the compiled program is
# depth-independent (required past ~8 layers on the tunneled runtime,
# whose remote-compile endpoint caps the request body), and it is the
# right way to build deep ternary stacks under XLA anyway. The tiny
# ref-scale anchor stays unrolled — at 4 × 5M-param layers the scan's
# stacked-weight indexing costs more than it saves.
CONFIGS = {
    # the reference text encoder's own scale, as the anchor point
    "ref-scale": (128, 512, 8, 4, 50, 256, False, False),
    # scanned stacks remat by necessity: without it XLA materializes the
    # full (layers, B, S, ffn) stacked activation buffers in f32 — 19.8 GB
    # for bert-base, past the v5e's 15.75 GB HBM.
    "bert-base": (768, 3072, 12, 12, 256, 64, True, True),
    "bert-large": (1024, 4096, 16, 24, 256, 32, True, True),
    "wide-2k": (2048, 8192, 16, 8, 128, 32, True, True),
}
VOCAB = 32000
N_CLASSES = 1000


def analytic_step_flops(embed, ffn, heads, layers, seq, batch):
    """Matmul FLOPs for one training step (fwd + bwd = 3 x forward).

    XLA's ``cost_analysis()`` counts a ``lax.scan`` body ONCE, not
    x length, so the compiled count under-reports a scanned stack by
    the layer count. MFU's definition wants the model's required FLOPs
    anyway (remat recompute excluded), so this harness counts them
    analytically: per layer 4 E^2 (qkv+out) and 2 E F (FFN) matmuls
    over B*S tokens plus the 2 B S^2 E attention pair, then the head.
    Elementwise/optimizer work is excluded — the number is conservative.
    """
    tokens = batch * seq
    per_layer = (2 * tokens * (4 * embed * embed + 2 * embed * ffn)
                 + 4 * batch * seq * seq * embed)
    fwd = layers * per_layer + 2 * batch * embed * N_CLASSES
    return 3.0 * fwd


def build_step(embed, ffn, heads, layers, seq, batch, remat, scan,
               use_amp=True, grad_mode="ste",
               remat_policy="save_quantized", attn_impl="einsum",
               hoist_quant=False):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from atq_tpu.nn.transformer import TernaryTransformerLayer

    from atq_tpu.nn.transformer import ScannedTernaryStack

    dtype = jnp.bfloat16 if use_amp else None

    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, tokens):
            x = nn.Embed(VOCAB, embed, dtype=dtype)(tokens)
            if scan:
                x = ScannedTernaryStack(
                    num_layers=layers, embed_dim=embed, num_heads=heads,
                    dim_feedforward=ffn, dropout=0.0, use_rpb=True,
                    sparsity_target=0.3, grad_mode=grad_mode,
                    dtype=dtype, remat=remat,
                    remat_policy=remat_policy, attn_impl=attn_impl,
                    hoist_quant=hoist_quant,
                    name="layers",
                )(x, deterministic=True)
            else:
                if remat and remat_policy != "full":
                    from atq_tpu.nn.layers import (
                        quantized_weight_and_dots_policy,
                        quantized_weight_policy,
                    )

                    pol = (quantized_weight_and_dots_policy()
                           if remat_policy == "save_dots"
                           else quantized_weight_policy())
                    layer_cls = nn.remat(TernaryTransformerLayer,
                                         policy=pol)
                elif remat:
                    layer_cls = nn.remat(TernaryTransformerLayer)
                else:
                    layer_cls = TernaryTransformerLayer
                for i in range(layers):
                    x = layer_cls(
                        embed_dim=embed, num_heads=heads,
                        dim_feedforward=ffn, dropout=0.0, use_rpb=True,
                        sparsity_target=0.3, layer_idx=i,
                        grad_mode=grad_mode, dtype=dtype,
                        name=f"layer_{i}",
                    )(x, deterministic=True)
            x = nn.LayerNorm()(x.astype(jnp.float32))
            return nn.Dense(N_CLASSES)(jnp.mean(x, axis=1))

    model = Encoder()
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, VOCAB, (batch, seq)), jnp.int32)
    labels = jnp.asarray(rng.randint(0, N_CLASSES, (batch,)), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), tokens)
    params, quant = v["params"], v.get("quant", {})
    tx = optax.adamw(1e-4)

    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))

    def loss_fn(p, q):
        logits = model.apply({"params": p, "quant": q}, tokens)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    # quant (the fixed RPB precision masks) must be a real argument:
    # closed-over arrays are baked into the program as dense literals,
    # which at bert-base scale is ~680 MB of HLO text — far past any
    # compile-request limit and wasteful at every scale. Donating the
    # state halves its live footprint (old + new state alive across the
    # call otherwise — wide-2k's 6.8 GiB state exhausted HBM that way).
    @functools.partial(jax.jit, donate_argnums=0)
    def step(state):
        (p, opt_state), q = state
        loss, grads = jax.value_and_grad(loss_fn)(p, q)
        updates, opt_state = tx.update(grads, opt_state, p)
        return ((optax.apply_updates(p, updates), opt_state), q), loss

    state = ((params, tx.init(params)), quant)

    def step_fn(state, *args):
        return step(state)

    return step, step_fn, state, n_params


def measure(name, spec, use_amp=True, iters=8,
            remat_policy="save_quantized", attn_impl="einsum",
            hoist_quant=False):
    import jax

    from atq_tpu.utils.flops import compiled_flops, mfu
    from atq_tpu.utils.timing import steady_state_sec_per_step

    embed, ffn, heads, layers, seq, batch, remat, scan = spec
    step, step_fn, state, n_params = build_step(
        embed, ffn, heads, layers, seq, batch, remat, scan,
        use_amp=use_amp, remat_policy=remat_policy, attn_impl=attn_impl,
        hoist_quant=hoist_quant)
    dt, state = steady_state_sec_per_step(step_fn, state, (), warmup=2,
                                          iters=iters)
    abstract = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state)
    flops = analytic_step_flops(embed, ffn, heads, layers, seq, batch)
    flops_xla = compiled_flops(step, abstract)
    util = mfu(flops, dt)
    tokens_per_step = batch * seq
    row = {
        "config": name, "embed": embed, "ffn": ffn, "heads": heads,
        "layers": layers, "seq": seq, "batch": batch, "remat": remat,
        "scan": scan, "use_amp": use_amp,
        "remat_policy": remat_policy if (remat and scan) else None,
        "attn_impl": attn_impl,
        "hoist_quant": bool(hoist_quant and scan),
        "params_millions": n_params / 1e6,
        "ms_per_step": dt * 1000,
        "tokens_per_sec": tokens_per_step / dt,
        "flops_per_step": flops,
        "flops_per_step_xla": flops_xla,
        "mfu_pct": None if util is None else util * 100.0,
    }
    del state
    return row


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="benchmarks/scale_mfu.json")
    parser.add_argument("--quick", action="store_true",
                        help="ref-scale + bert-base only")
    parser.add_argument("--configs", nargs="*", default=None,
                        help="subset of config names to run")
    parser.add_argument("--batch", type=int, default=None,
                        help="override the configs' batch size")
    parser.add_argument("--fp32", action="store_true",
                        help="also measure fp32 rows")
    parser.add_argument("--attn", default="einsum",
                        choices=["einsum", "fused"],
                        help="attention implementation (fused = the "
                             "single-block VMEM-resident Pallas kernel, "
                             "ops/fused_attention.py)")
    parser.add_argument("--remat-policy", default="save_quantized",
                        choices=["save_quantized", "save_dots", "full"],
                        help="scanned-stack remat policy (save_dots "
                             "additionally keeps projection-matmul "
                             "outputs: no matmul recompute in backward)")
    parser.add_argument("--hoist", action="store_true",
                        help="hoist quantization out of the scan "
                             "(nn/hoist.py): all layers' effective "
                             "weights in one batched pass before the "
                             "scan; scan body is pure matmuls")
    args = parser.parse_args()

    names = args.configs or (["ref-scale", "bert-base"] if args.quick
                             else list(CONFIGS))
    rows = []

    def flush():
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)

    for name in names:
        for use_amp in ((True, False) if args.fp32 else (True,)):
            print(f"--- {name} amp={use_amp} ---", flush=True)
            try:
                spec = CONFIGS[name]  # inside try: a typo'd --configs
                # name records an error row, it doesn't kill the sweep
                if args.batch is not None:
                    spec = spec[:5] + (args.batch,) + spec[6:]
                row = measure(name, spec, use_amp=use_amp,
                              remat_policy=args.remat_policy,
                              attn_impl=args.attn,
                              hoist_quant=args.hoist)
            except Exception as e:
                row = {"config": name, "use_amp": use_amp, "error": str(e)}
            print(row, flush=True)
            rows.append(row)
            flush()
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
