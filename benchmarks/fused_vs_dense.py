"""Honest fused-vs-dense training-step comparison on TPU.

The fused Pallas training kernels (ops/fused_linear.py) were measured
0.81-0.96x of the dense XLA path with the PRE-methodology-fix timers
(block_until_ready returning early — see BENCHMARKS.md) and left off by
default. This re-measures both paths with the honest timing helper so
the default rests on real numbers.

    python benchmarks/fused_vs_dense.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_shape(m, n, k, fused, grad_mode="parity", use_mask=True):
    import jax
    import jax.numpy as jnp
    import optax

    from atq_tpu.nn.layers import ResidualPrecisionBoostLinear
    from atq_tpu.utils.timing import steady_state_sec_per_step

    layer = ResidualPrecisionBoostLinear(
        features=n, precision_ratio=0.05 if use_mask else 0.0,
        grad_mode=grad_mode, fused=fused)
    x = jnp.asarray(np.random.RandomState(0).randn(m, k), jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randn(m, n), jnp.float32)
    v = layer.init(jax.random.PRNGKey(0), x)
    tx = optax.sgd(1e-3)
    state = {"params": v["params"], "quant": v.get("quant", {}),
             "opt": tx.init(v["params"])}

    @jax.jit
    def step(state, x, y):
        def loss_fn(p):
            out = layer.apply({"params": p, "quant": state["quant"]}, x)
            return jnp.mean((out - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt = tx.update(grads, state["opt"])
        return {**state, "params": optax.apply_updates(state["params"],
                                                       updates),
                "opt": opt}, loss

    sec, _ = steady_state_sec_per_step(lambda s: step(s, x, y), state, (),
                                       warmup=3, iters=20)
    return sec * 1e6  # us


def main():
    shapes = [
        (256, 256, 3136, "reference classifier"),
        (256, 1024, 3136, "4x width"),
        (256, 2048, 6272, "8x width"),
        (800, 384, 192, "retrieval FFN-ish"),
    ]
    results = {}
    for m, n, k, label in shapes:
        dense_us = bench_shape(m, n, k, fused=False)
        fused_us = bench_shape(m, n, k, fused=True)
        ratio = fused_us / dense_us
        results[f"{n}x{k}_m{m}"] = {
            "label": label, "dense_us": round(dense_us, 1),
            "fused_us": round(fused_us, 1),
            "fused_over_dense": round(ratio, 3),
        }
        print(f"{label:24s} dense {dense_us:8.1f} us | fused "
              f"{fused_us:8.1f} us | ratio {ratio:.3f}")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
