"""fast_max_pool: bit-identical forward, dense backward semantics.

The XLA/torch backward routes a tied window's whole cotangent to the
first tied element; the fast backward splits it equally. With unique
maxima the two agree exactly — that's the equivalence test. Tie
handling is pinned separately (gradient sum preserved, equal split).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu.ops.fast_pool import fast_max_pool

import flax.linen as nn

WINDOW, STRIDES, PAD = (3, 3), (2, 2), ((1, 1), (1, 1))


def _xla_pool(x):
    return nn.max_pool(x, WINDOW, strides=STRIDES, padding=PAD)


def _unique_max_input(shape, seed):
    """Random input with (almost surely) unique in-window maxima."""
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.permutation(np.prod(shape)).reshape(shape)
                       .astype(np.float32)) / np.prod(shape)


@pytest.mark.parametrize("shape", [(2, 80, 80, 8), (1, 7, 9, 3)])
def test_forward_bitwise(shape):
    x = jnp.asarray(np.random.RandomState(0).randn(*shape), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(fast_max_pool(x, WINDOW, STRIDES, PAD)),
        np.asarray(_xla_pool(x)))


@pytest.mark.parametrize("shape", [(2, 16, 16, 4), (1, 7, 9, 3)])
def test_backward_matches_xla_when_unique(shape):
    x = _unique_max_input(shape, 1)
    g_out = jnp.asarray(np.random.RandomState(2).randn(
        *_xla_pool(x).shape), jnp.float32)
    _, vjp_fast = jax.vjp(
        lambda a: fast_max_pool(a, WINDOW, STRIDES, PAD), x)
    _, vjp_xla = jax.vjp(_xla_pool, x)
    np.testing.assert_allclose(np.asarray(vjp_fast(g_out)[0]),
                               np.asarray(vjp_xla(g_out)[0]),
                               rtol=0, atol=1e-6)


def test_tied_maxima_split_equally_and_preserve_sum():
    # With pad 1 / stride 2, output window (0, 0) sees input rows 0..1,
    # cols 0..1. Tie the maxima at (0, 0) and (1, 1) inside it.
    x = jnp.zeros((1, 3, 3, 1), jnp.float32)
    x = x.at[0, 0, 0, 0].set(5.0).at[0, 1, 1, 0].set(5.0)
    y, vjp = jax.vjp(
        lambda a: fast_max_pool(a, (3, 3), (2, 2), ((1, 1), (1, 1))), x)
    g = jnp.zeros(y.shape, jnp.float32)
    g = g.at[0, 0, 0, 0].set(1.0)
    gx = np.asarray(vjp(g)[0])[0, :, :, 0]
    assert gx[0, 0] == pytest.approx(0.5)
    assert gx[1, 1] == pytest.approx(0.5)
    # Whole-tensor cotangent: gradient mass is conserved regardless of
    # how many windows each element belongs to.
    g_all = jnp.ones(y.shape, jnp.float32)
    gx_all = np.asarray(vjp(g_all)[0])
    assert gx_all.sum() == pytest.approx(float(np.prod(y.shape)), rel=1e-6)


def test_grad_through_jit_and_bf16():
    x = _unique_max_input((2, 16, 16, 4), 3).astype(jnp.bfloat16)

    @jax.jit
    def loss(a):
        return jnp.sum(fast_max_pool(a, WINDOW, STRIDES, PAD) ** 2)

    g = jax.grad(loss)(x)
    assert g.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


def test_env_dispatch(monkeypatch):
    from atq_tpu.ops.fast_pool import max_pool
    x = _unique_max_input((1, 8, 8, 2), 4)
    monkeypatch.setenv("ATQ_FAST_POOL", "1")
    fast = max_pool(x)
    monkeypatch.setenv("ATQ_FAST_POOL", "0")
    ref = max_pool(x)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref))
