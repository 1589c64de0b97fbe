#!/usr/bin/env python
"""Benchmark harness for the 5 BASELINE configs (BASELINE.json).

Run on TPU: ``python benchmarks/run_all.py [--out results.json]``.
Each config measures the real jitted path at steady state:

1. Fashion-MNIST ATQ classifier (TernaryLinear, sparsity 0.3) — train
   imgs/sec/chip
2. Fashion-MNIST + RPB + distillation — train imgs/sec/chip (the headline
   bench.py metric)
3. Mixed-precision ATQ (importance-allocated EnhancedATQTransformerLayer)
   — train tokens/sec/chip
4. Bit-packed 2-bit inference — latency + measured weight-memory
   compression
5. Flickr8k multimodal contrastive (gradual-quant config) — train
   pairs/sec/chip
6. The same retrieval config under bf16 AMP (--use_amp) — the fp32 ResNet
   convs dominate config 5, so this is the headroom the MXU's bf16 peak
   actually offers

Every config also reports XLA's compiled FLOP count and MFU vs the chip's
bf16 peak.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _steady_state(step_fn, state, args, warmup=3, iters=20, windows=5):
    """Honest seconds/step: device_get-synced window timing
    (atq_tpu/utils/timing.py) — block_until_ready can return early over
    the axon tunnel and each dispatch->fetch roundtrip costs ~27 ms, so
    naive windows measure mostly latency. Round-4 protocol: MEDIAN of
    N>=5 windows plus IQR (best-window headlines proved unreproducible
    across tunnel windows; BENCHMARKS.md round-3 config-3 note).
    Returns (median_sec_per_step, stats_dict)."""
    from atq_tpu.utils.timing import steady_state_step_stats

    stats, _state = steady_state_step_stats(step_fn, state, args,
                                            warmup=warmup, iters=iters,
                                            windows=windows)
    return stats["sec_per_step_median"], stats


def _dispersion(result, stats):
    """Attach the window dispersion to a config's result dict."""
    result["ms_per_step_iqr"] = stats["sec_per_step_iqr"] * 1000
    result["ms_per_step_best_window"] = stats["sec_per_step_best"] * 1000
    result["windows_ms_per_step"] = [s * 1000
                                     for s in stats["windows_sec_per_step"]]
    result["timing_protocol"] = "median-of-%d-windows" % len(
        stats["windows_sec_per_step"])
    return result


def _add_mfu(result, jitted, dt, *concrete_args):
    """Attach XLA's own FLOP count and the MFU line (VERDICT: achieved vs
    peak) to a config's result dict. ``dt`` is seconds/step at steady state.
    """
    import jax

    from atq_tpu.utils.flops import compiled_flops, mfu, peak_flops_per_chip

    # The timing loop donated the original state buffers; lower against
    # abstract shapes so cost analysis never touches deleted arrays.
    abstract_args = jax.tree_util.tree_map(
        lambda a: (jax.ShapeDtypeStruct(a.shape, a.dtype)
                   if hasattr(a, "shape") and hasattr(a, "dtype") else a),
        concrete_args,
    )
    flops = compiled_flops(jitted, *abstract_args)
    if flops is None:
        return result
    result["model_flops_per_step"] = flops
    peak = peak_flops_per_chip()
    if peak is not None:
        result["peak_flops_per_chip"] = peak
        result["mfu_pct"] = round(100.0 * mfu(flops, dt), 3)
    return result


def bench_classifier(use_rpb: bool, distill: bool, batch=256):
    import jax
    import jax.numpy as jnp

    from atq_tpu.models.image_classifier import (
        ATQImageClassifier,
        BaselineCNNClassifier,
    )
    from atq_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from atq_tpu.train.classifier import (
        ClassifierConfig,
        build_train_step,
        make_optimizer,
    )

    cfg = ClassifierConfig(use_rpb=use_rpb, distill=distill,
                           batch_size=batch)
    atq_model = ATQImageClassifier(use_rpb=use_rpb, sparsity_target=0.3)
    base_model = BaselineCNNClassifier()
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, 28, 28, 1), jnp.float32)
    atq_vars = atq_model.init(rng, sample)
    base_vars = base_model.init(jax.random.fold_in(rng, 1), sample)
    atq_tx = make_optimizer(cfg, 200, weight_decay=1e-4)
    base_tx = make_optimizer(cfg, 200)
    mesh = make_mesh()
    state = replicate({
        "atq_params": atq_vars["params"],
        "quant": atq_vars.get("quant", {}),
        "atq_batch_stats": atq_vars.get("batch_stats", {}),
        "atq_opt_state": atq_tx.init(atq_vars["params"]),
        "base_params": base_vars["params"],
        "base_batch_stats": base_vars.get("batch_stats", {}),
        "base_opt_state": base_tx.init(base_vars["params"]),
        "step": jnp.asarray(0, jnp.int32),
    }, mesh)
    step = jax.jit(build_train_step(atq_model, base_model, atq_tx, base_tx,
                                    cfg), donate_argnums=(0,))
    rngd = np.random.RandomState(0)
    batch_data = shard_batch(
        (rngd.randn(batch, 28, 28, 1).astype(np.float32),
         rngd.randint(0, 10, batch).astype(np.int32)), mesh,
    )

    # Per-call constants live on device: recreating them per step would
    # add host->device scalar transfers to every measured iteration (over
    # the axon tunnel that dominates the sub-ms step itself).
    sparsity = jnp.float32(0.3)
    l1 = jnp.float32(1e-5)
    key = jax.random.PRNGKey(1)

    def step_fn(state, *args):
        return step(state, batch_data, sparsity, l1, key)

    dt, stats = _steady_state(step_fn, state, ())
    return _add_mfu(_dispersion({"ms_per_step": dt * 1000,
                                 "imgs_per_sec": batch / dt}, stats),
                    step, dt, state, batch_data, sparsity, l1, key)


def bench_mixed_precision(batch=64, seq=128, dim=256):
    import jax
    import jax.numpy as jnp
    import optax

    from atq_tpu.nn.mixed_precision import EnhancedATQTransformerLayer

    layer = EnhancedATQTransformerLayer(embed_dim=dim, num_heads=8,
                                        dim_feedforward=4 * dim,
                                        layer_idx=2, total_layers=4)
    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, seq, dim).astype(np.float32)
    )
    variables = layer.init(jax.random.PRNGKey(0), x)
    tx = optax.adam(1e-3)
    state = {"params": variables["params"],
             "quant": variables.get("quant", {}),
             "opt_state": tx.init(variables["params"])}

    @jax.jit
    def step(state):
        def loss_fn(p):
            out = layer.apply({"params": p, "quant": state["quant"]}, x)
            return jnp.mean(out ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt_state = tx.update(grads, state["opt_state"])
        return {**state,
                "params": optax.apply_updates(state["params"], updates),
                "opt_state": opt_state}, loss

    def step_fn(state, *args):
        return step(state)

    dt, stats = _steady_state(step_fn, state, ())
    return _add_mfu(_dispersion({"ms_per_step": dt * 1000,
                                 "tokens_per_sec": batch * seq / dt},
                                stats), step, dt, state)


def bench_packed_inference(batch=64):
    import jax
    import jax.numpy as jnp

    from atq_tpu.models.image_classifier import ATQImageClassifier
    from atq_tpu.serve.packed_model import PackedClassifier

    model = ATQImageClassifier(use_rpb=True)
    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, 28, 28, 1).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    served = PackedClassifier(variables["params"], variables["quant"],
                              variables["batch_stats"])
    dense_apply = jax.jit(lambda v, x: model.apply(v, x, train=False))

    from atq_tpu.utils.timing import sec_per_call

    packed_ms = sec_per_call(served, x, iters=50) * 1000
    dense_ms = sec_per_call(dense_apply, variables, x, iters=50) * 1000

    fp = served.memory_footprint_bytes()
    result = {
        "packed_ms_per_batch": packed_ms,
        "dense_ms_per_batch": dense_ms,
        "classifier_weight_compression":
            fp["dense_fp32_bytes"] / fp["packed_bytes"],
        "pure_ternary_compression": 16.0,
    }
    return _add_mfu(result, served._apply, packed_ms / 1000,
                    served._features_vars, served.packed, x)


def bench_retrieval(batch=64, image_size=160, use_amp=False):
    # Canonical config-5 construction shared with mfu_attack.py and the
    # A/B harnesses; per-call constants are device-resident inside it
    # (see bench_classifier note).
    from builders import build_retrieval_step

    step, step_fn, state, (batch_data, temp, stage, key) = (
        build_retrieval_step(batch, image_size=image_size, use_amp=use_amp))

    dt, stats = _steady_state(step_fn, state, (), warmup=3, iters=10)
    return _add_mfu(_dispersion({"ms_per_step": dt * 1000,
                                 "pairs_per_sec": batch / dt}, stats),
                    step, dt, state, batch_data, temp, stage, key)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--only", type=str, default=None,
                        help="comma-separated config keys to run (e.g. "
                             "'config4'); default = all")
    parser.add_argument("--with-config4", action="store_true",
                        help="include config4 (packed inference). "
                             "EXCLUDED by default: the round-3 "
                             "investigation (BENCHMARKS.md) showed this "
                             "program destabilizes the tunneled axon "
                             "worker even on successful runs, wedging "
                             "the chip for 1-2 h. Its last good numbers "
                             "are recorded in BENCHMARKS.md.")
    args = parser.parse_args()

    import jax

    # config4 (the Pallas serving path) runs LAST: a kernel fault crashes
    # the TPU worker process, and on remote-dispatch setups that wedges
    # the chip — ordering it last (plus incremental --out writes) means a
    # crash can't take the other configs' results with it.
    configs = [
        ("config1_ternary_classifier",
         "Fashion-MNIST TernaryLinear classifier",
         lambda: bench_classifier(False, False)),
        ("config2_rpb_distill", "Fashion-MNIST RPB + distillation",
         lambda: bench_classifier(True, True)),
        ("config3_mixed_precision", "Mixed-precision transformer layer",
         bench_mixed_precision),
        ("config5_retrieval", "Flickr8k retrieval contrastive",
         bench_retrieval),
        ("config5_retrieval_amp",
         "Flickr8k retrieval contrastive (bf16 AMP)",
         lambda: bench_retrieval(use_amp=True)),
        ("config4_packed_inference", "Bit-packed inference path",
         bench_packed_inference),
    ]
    if args.only:
        wanted = [w.strip() for w in args.only.split(",")]
        configs = [c for c in configs
                   if any(c[0].startswith(w) for w in wanted)]
    elif not args.with_config4:
        configs = [c for c in configs
                   if c[0] != "config4_packed_inference"]
        print("# config4 skipped by default (wedges the axon worker; "
              "--with-config4 or --only config4 to run)", flush=True)

    results = {"backend": jax.default_backend(),
               "device": str(jax.devices()[0])}
    if args.out and os.path.exists(args.out):
        with open(args.out) as f:  # --only merges into existing results
            prev = json.load(f)
        prev.update(results)
        results = prev
    for i, (key, title, fn) in enumerate(configs):
        print(f"{i + 1}/{len(configs)} {title}...")
        results[key] = fn()
        if args.out:  # incremental write: crash-safe
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)

    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
