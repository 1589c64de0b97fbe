"""Fused single-block attention kernel == einsum-pair attention.

The kernel (atq_tpu/ops/fused_attention.py) must match the einsum path
in nn/attention.py (reference semantics: models/text_encoder.py:117-163)
for outputs AND gradients, with and without key padding, in f32 and
bf16 — it is a performance substitution, never a math change.
Runs in Pallas interpret mode on CPU (conftest forces cpu).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu.ops.fused_attention import fused_attention, padding_bias

B, H, S, D = 2, 3, 16, 8


def einsum_attention(q, k, v, scale, pad=None):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if pad is not None:
        scores = jnp.where(pad[:, None, None, :], -1e30, scores)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)


def _qkv(dtype):
    rng = np.random.RandomState(0)
    mk = lambda: jnp.asarray(rng.randn(B, H, S, D), dtype)
    return mk(), mk(), mk()


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_einsum(dtype):
    q, k, v = _qkv(dtype)
    scale = 1.0 / np.sqrt(D)
    out = fused_attention(q, k, v, scale)
    ref = einsum_attention(q, k, v, scale)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_forward_with_padding_mask():
    q, k, v = _qkv(jnp.float32)
    scale = 1.0 / np.sqrt(D)
    lengths = jnp.asarray([5, S])
    pad = jnp.arange(S)[None, :] >= lengths[:, None]
    out = fused_attention(q, k, v, scale, padding_bias(lengths, S))
    ref = einsum_attention(q, k, v, scale, pad=pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("with_bias", [False, True])
def test_gradients_match_einsum(with_bias):
    q, k, v = _qkv(jnp.float32)
    scale = 1.0 / np.sqrt(D)
    lengths = jnp.asarray([5, S])
    bias = padding_bias(lengths, S) if with_bias else None
    pad = (jnp.arange(S)[None, :] >= lengths[:, None]) if with_bias \
        else None

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, scale, bias) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(einsum_attention(q, k, v, scale, pad=pad) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"d{name} mismatch")


def test_lengths_vector_bias_equals_bool_mask_bias():
    lengths = jnp.asarray([3, S])
    pad = jnp.arange(S)[None, :] >= lengths[:, None]
    np.testing.assert_array_equal(
        np.asarray(padding_bias(lengths, S)),
        np.asarray(padding_bias(pad, S)))


def test_fully_padded_row_is_finite():
    q, k, v = _qkv(jnp.float32)
    scale = 1.0 / np.sqrt(D)
    lengths = jnp.asarray([0, S])  # first batch row: everything padded
    out = fused_attention(q, k, v, scale, padding_bias(lengths, S))
    assert bool(jnp.all(jnp.isfinite(out)))


def test_transformer_layer_fused_matches_einsum():
    """Full TernaryTransformerLayer with attn_impl='fused' == 'einsum'
    (outputs and grads), including a lengths-vector padding mask."""
    from atq_tpu.nn.transformer import TernaryTransformerLayer

    E = 16
    x = jnp.asarray(np.random.RandomState(1).randn(2, S, E), jnp.float32)
    lengths = jnp.asarray([5, S])
    kw = dict(embed_dim=E, num_heads=2, dim_feedforward=32, dropout=0.0,
              grad_mode="ste")
    lyr_e = TernaryTransformerLayer(attn_impl="einsum", **kw)
    lyr_f = TernaryTransformerLayer(attn_impl="fused", **kw)
    v = lyr_e.init(jax.random.PRNGKey(0), x)

    def loss(lyr, params):
        y = lyr.apply({**v, "params": params}, x,
                      src_key_padding_mask=lengths)
        return jnp.sum(y ** 2)

    le, ge = jax.value_and_grad(lambda p: loss(lyr_e, p))(v["params"])
    lf, gf = jax.value_and_grad(lambda p: loss(lyr_f, p))(v["params"])
    np.testing.assert_allclose(float(le), float(lf), rtol=1e-5)
    # Bias grads are near-cancelling sums of large terms, so the two
    # paths' different f32 accumulation orders leave absolute noise
    # proportional to the TREE's magnitude, not the leaf's.
    scale = max(float(jnp.abs(g).max())
                for g in jax.tree_util.tree_leaves(ge))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=3e-6 * scale),
        ge, gf)
