"""Hoisted-quantization parity: ScannedTernaryStack(hoist_quant=True).

The hoisted path (nn/hoist.py) computes every layer's effective weight in
one batched pass OUTSIDE the scan (nn.map_variables) and runs the scan
body in pre_quantized mode. These tests pin that it is a pure program
transformation: identical init, bit-identical ternary decisions, and
forward/gradient parity with the in-scan path across grad modes, RPB
on/off, and AMP on/off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu.nn.transformer import ScannedTernaryStack

L, B, S, E, H, F = 3, 2, 10, 16, 4, 32


def _build(hoist, grad_mode="parity", use_rpb=True, dtype=None,
           remat=True):
    return ScannedTernaryStack(
        num_layers=L, embed_dim=E, num_heads=H, dim_feedforward=F,
        dropout=0.0, use_rpb=use_rpb, sparsity_target=0.3,
        grad_mode=grad_mode, dtype=dtype, remat=remat,
        remat_policy="save_dots", hoist_quant=hoist)


def _data():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(B, S, E).astype(np.float32))


@pytest.mark.parametrize("grad_mode", ["parity", "ste", "ttq"])
@pytest.mark.parametrize("use_rpb", [True, False])
def test_hoist_forward_and_grad_parity(grad_mode, use_rpb):
    x = _data()
    ref = _build(False, grad_mode, use_rpb)
    hoi = _build(True, grad_mode, use_rpb)
    v_ref = ref.init(jax.random.PRNGKey(0), x)
    v_hoi = hoi.init(jax.random.PRNGKey(0), x)

    # Init is unaffected by hoisting: same tree, same values.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        v_ref, v_hoi)

    quant = v_ref.get("quant", {})

    def loss(mod, p):
        y = mod.apply({"params": p, "quant": quant}, x)
        return jnp.sum(jnp.tanh(y))

    l0, g0 = jax.value_and_grad(lambda p: loss(ref, p))(v_ref["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(hoi, p))(v_ref["params"])
    assert np.isfinite(float(l0))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    def check(path, a, b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")

    jax.tree_util.tree_map_with_path(check, g0, g1)


def test_hoist_parity_under_amp():
    x = _data()
    ref = _build(False, "ste", True, dtype=jnp.bfloat16)
    hoi = _build(True, "ste", True, dtype=jnp.bfloat16)
    v = ref.init(jax.random.PRNGKey(0), x)
    quant = v.get("quant", {})
    y0 = ref.apply({"params": v["params"], "quant": quant}, x)
    y1 = hoi.apply({"params": v["params"], "quant": quant}, x)
    # bf16 matmuls on identical effective weights: outputs bit-equal.
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_hoist_respects_mutated_sparsity():
    """The hoisted transform reads the LIVE quant values (the schedule
    mutates sparsity_target between epochs without recompiling)."""
    x = _data()
    ref = _build(False)
    hoi = _build(True)
    v = ref.init(jax.random.PRNGKey(0), x)
    quant = jax.tree_util.tree_map(jnp.asarray, v["quant"])
    bumped = jax.tree_util.tree_map(lambda a: a, quant)
    # raise every sparsity target to 0.9: outputs must change, and the
    # two paths must still agree
    bumped = jax.tree_util.tree_map_with_path(
        lambda p, a: (jnp.full_like(a, 0.9)
                      if "sparsity_target" in jax.tree_util.keystr(p)
                      else a), bumped)
    y_ref = ref.apply({"params": v["params"], "quant": bumped}, x)
    y_hoi = hoi.apply({"params": v["params"], "quant": bumped}, x)
    y_orig = ref.apply({"params": v["params"], "quant": quant}, x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_hoi),
                               rtol=1e-6, atol=1e-7)
    assert float(jnp.max(jnp.abs(y_ref - y_orig))) > 1e-4


def test_hoist_no_remat_path():
    x = _data()
    ref = _build(False, remat=False)
    hoi = _build(True, remat=False)
    v = ref.init(jax.random.PRNGKey(0), x)
    quant = v.get("quant", {})
    y0 = ref.apply({"params": v["params"], "quant": quant}, x)
    y1 = hoi.apply({"params": v["params"], "quant": quant}, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-6, atol=1e-7)


def test_batched_quantize_matches_per_layer():
    """Direct unit parity of the batched quantizer primitives (bit-exact
    thresholds/patterns, per-layer alpha) — the foundation the hoisted
    transform stands on."""
    from atq_tpu.core.quantize import (
        adaptive_ternary_quantization,
        adaptive_ternary_quantization_batched,
        ternary_threshold,
        ternary_threshold_batched,
    )

    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(4, 24, 40).astype(np.float32) * 0.05)
    sp = jnp.asarray([0.0, 0.3, 0.7, 1.0], jnp.float32)
    thr_b = ternary_threshold_batched(w, sparsity_target=sp)
    for i in range(4):
        thr_i = ternary_threshold(w[i], sparsity_target=sp[i])
        assert float(thr_b[i]) == float(thr_i)
    wt_b, a_b = adaptive_ternary_quantization_batched(w, sparsity_target=sp)
    for i in range(4):
        wt_i, a_i = adaptive_ternary_quantization(w[i], sparsity_target=sp[i])
        np.testing.assert_array_equal(np.asarray(wt_b[i]), np.asarray(wt_i))
        np.testing.assert_allclose(float(a_b[i]), float(a_i), rtol=1e-6)
