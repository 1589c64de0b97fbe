"""Fused quantize+matmul training op: forward/grad parity vs the dense path.

The fused op (ops/fused_linear.py) must be a drop-in for the dense
quantize->blend->matmul (nn/layers.py legacy path) in BOTH grad modes:
parity (zero grad to latent weight in TernaryLinear, masked-only in RPB —
SURVEY.md §2.1 quirk) and ste. On CPU these tests exercise the XLA fallback
inside the custom_vjp; the Pallas kernels compute the same math on TPU
(asserted by benchmarks/tpu_selftest.py on-chip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu.core.quantize import (
    adaptive_ternary_quantization,
    ternarize_ste,
    ternary_threshold,
)
from atq_tpu.nn.layers import ResidualPrecisionBoostLinear, TernaryLinear
from atq_tpu.ops.fused_linear import fused_quantized_linear


def _dense_rpb(x, w, alpha, mask, sparsity, grad_mode):
    if grad_mode == "ste":
        wt, a = ternarize_ste(w, alpha=alpha, sparsity_target=sparsity)
    else:
        wt, a = adaptive_ternary_quantization(w, alpha=alpha,
                                              sparsity_target=sparsity)
    if mask is None:
        w_eff = wt * a
    else:
        w_eff = wt * a * (1.0 - mask) + w * mask
    return jnp.matmul(x, w_eff.T)


@pytest.mark.parametrize("grad_mode", ["parity", "ste"])
@pytest.mark.parametrize("with_mask", [True, False])
def test_fused_matches_dense_forward_and_grads(grad_mode, with_mask):
    rng = np.random.RandomState(0)
    m, n, k = 16, 24, 40
    sparsity = 0.3
    x = jnp.asarray(rng.randn(m, k), jnp.float32)
    w = jnp.asarray(rng.randn(n, k), jnp.float32)
    alpha = jnp.asarray([0.7], jnp.float32)
    mask = (jnp.asarray(rng.rand(n, k), jnp.float32) < 0.1).astype(
        jnp.float32) if with_mask else None
    g_out = jnp.asarray(rng.randn(m, n), jnp.float32)

    def dense_loss(x, w, alpha):
        y = _dense_rpb(x, w, alpha, mask, sparsity, grad_mode)
        return jnp.sum(y * g_out)

    def fused_loss(x, w, alpha):
        thr = ternary_threshold(w, sparsity_target=sparsity)
        y = fused_quantized_linear(x, w, alpha, thr, mask=mask,
                                   grad_mode=grad_mode)
        return jnp.sum(y * g_out)

    yd = _dense_rpb(x, w, alpha, mask, sparsity, grad_mode)
    thr = ternary_threshold(w, sparsity_target=sparsity)
    yf = fused_quantized_linear(x, w, alpha, thr, mask=mask,
                                grad_mode=grad_mode)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yd),
                               rtol=1e-5, atol=1e-5)

    gd = jax.grad(dense_loss, argnums=(0, 1, 2))(x, w, alpha)
    gf = jax.grad(fused_loss, argnums=(0, 1, 2))(x, w, alpha)
    for name, d, f in zip(("dx", "dw", "dalpha"), gd, gf):
        np.testing.assert_allclose(np.asarray(f), np.asarray(d),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_fused_parity_zero_latent_grad():
    """TernaryLinear parity mode: the latent weight grad is EXACTLY zero
    (reference quirk — atq/layers.py:37-40 + quantizers.py:41-43)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 32), jnp.float32)
    w = jnp.asarray(rng.randn(16, 32), jnp.float32)
    alpha = jnp.asarray([1.0], jnp.float32)

    def loss(w):
        thr = ternary_threshold(w, sparsity_target=0.3)
        return jnp.sum(fused_quantized_linear(x, w, alpha, thr,
                                              grad_mode="parity"))

    dw = jax.grad(loss)(w)
    assert np.all(np.asarray(dw) == 0.0)


def test_fused_rpb_masked_only_grad():
    """RPB parity mode: grads land ONLY on masked entries
    (precision_boost.py:72 semantics)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 32), jnp.float32)
    w = jnp.asarray(rng.randn(16, 32), jnp.float32)
    alpha = jnp.asarray([1.0], jnp.float32)
    mask = (jnp.asarray(rng.rand(16, 32), jnp.float32) < 0.2).astype(
        jnp.float32)

    def loss(w):
        thr = ternary_threshold(w, sparsity_target=0.3)
        return jnp.sum(fused_quantized_linear(x, w, alpha, thr, mask=mask,
                                              grad_mode="parity"))

    dw = np.asarray(jax.grad(loss)(w))
    assert np.all(dw[np.asarray(mask) == 0.0] == 0.0)
    assert np.any(dw[np.asarray(mask) == 1.0] != 0.0)


def test_fused_nd_input():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 5, 24), jnp.float32)
    w = jnp.asarray(rng.randn(12, 24), jnp.float32)
    alpha = jnp.asarray([0.5], jnp.float32)
    thr = ternary_threshold(w, sparsity_target=0.3)
    y = fused_quantized_linear(x, w, alpha, thr)
    assert y.shape == (2, 5, 12)
    flat = fused_quantized_linear(x.reshape(10, 24), w, alpha, thr)
    np.testing.assert_allclose(np.asarray(y).reshape(10, 12),
                               np.asarray(flat), rtol=1e-6)


@pytest.mark.parametrize("layer_cls,kwargs", [
    (TernaryLinear, {}),
    (ResidualPrecisionBoostLinear, {"precision_ratio": 0.1}),
])
def test_layer_fused_flag_equivalence(layer_cls, kwargs):
    """Layer outputs and grads are identical with fused=True and fused=False
    (same init => same params)."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(6, 20), jnp.float32)

    outs, grads = [], []
    for fused in (False, True):
        layer = layer_cls(features=10, grad_mode="parity", fused=fused,
                          **kwargs)
        vs = layer.init(jax.random.PRNGKey(0), x)

        def loss(params):
            y = layer.apply({"params": params, **{k: v for k, v in vs.items()
                                                  if k != "params"}}, x)
            return jnp.sum(y ** 2)

        outs.append(np.asarray(layer.apply(vs, x)))
        grads.append(jax.device_get(jax.grad(loss)(vs["params"])))

    np.testing.assert_allclose(outs[1], outs[0], rtol=1e-5, atol=1e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(grads[0])
    flat1 = jax.tree_util.tree_leaves_with_path(grads[1])
    for (p0, l0), (p1, l1) in zip(flat0, flat1):
        assert p0 == p1
        np.testing.assert_allclose(l1, l0, rtol=1e-5, atol=1e-5,
                                   err_msg=str(p0))
