"""Fused multi-head attention Pallas kernel for short sequences.

Motivation (benchmarks/BENCHMARKS.md round-4 MFU attack): at the
training shapes this framework actually runs (S<=512, head_dim 64), the
unfused einsum-pair attention leaves ~10x on the table — the
(B, H, S, S) score tensor round-trips HBM through the softmax, the
QK^T contraction is K=64 (half an MXU pass), and the backward
re-materializes scores twice. jax's stock ``flash_attention`` kernel
LOSES to the einsum pair here (measured 0.86/4.20 ms vs 0.71/2.43 ms
fwd / fwd+bwd at B64 H12 S256 D64 — its block machinery is sized for
long sequences). This kernel takes the opposite design point:

- grid = (B, H); each program computes ONE head's ENTIRE attention in
  VMEM (at S=256, q/k/v/out are 32 KB each and the f32 score tile is
  256 KB — nowhere near the ~128 MB VMEM), so scores NEVER touch HBM;
- softmax in f32 on the VPU between the two MXU dots;
- backward is a second single-pass kernel that recomputes the
  (cheap, VMEM-resident) scores and produces dq, dk, dv in one sweep —
  no saved score tensor, no second softmax round-trip.

Semantics match ``nn.attention``'s einsum path exactly (additive f32
key-padding bias, f32 softmax, compute-dtype second dot); equivalence
incl. gradients is pinned by tests/test_fused_attention.py. Supports
any (S, D) whose full extents satisfy the TPU (8, 128)-divisibility
rule trivially (blocks cover the whole axis). Not for long sequences:
the f32 score tile is O(S^2) VMEM — use
atq_tpu/parallel/ring_attention.py past ~2k.

Reference behavior being accelerated: models/text_encoder.py:117-163
(scaled dot-product attention with key_padding_mask).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret() -> bool:
    return jax.default_backend() != "tpu" or \
        os.environ.get("ATQ_PALLAS_INTERPRET", "0") == "1"


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[0, 0]                      # (S, D) compute dtype
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                            # (S, S) f32
    if bias_ref is not None:
        s = s + bias_ref[0, 0]           # additive -inf padding bias
    m = jnp.max(s, axis=-1, keepdims=True)
    # Guard fully-masked rows (all -inf): exp(nan) otherwise.
    m = jnp.maximum(m, -1e30)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(q.dtype)          # compute dtype for the MXU dot
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if bias_ref is not None:
        s = s + bias_ref[0, 0]
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), -1e30)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p32 = e / l                          # (S, S) f32 softmax
    p = p32.astype(q.dtype)
    # dv = P^T @ do
    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dP = do @ v^T  — keep f32: the softmax backward subtraction below
    # cancels catastrophically in bf16.
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
          ).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _specs(b, h, s, d, with_bias):
    qkv = pl.BlockSpec((1, 1, s, d), lambda i, j: (i, j, 0, 0))
    specs = [qkv, qkv, qkv]
    if with_bias:
        specs.append(pl.BlockSpec((1, 1, 1, s), lambda i, j: (i, 0, 0, 0)))
    return specs, qkv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, scale, bias=None):
    """Softmax(q @ k^T * scale + bias) @ v, one (b, h) program per head.

    q, k, v: (B, H, S, D); bias: optional additive f32 (B, 1, 1, S)
    (broadcast over heads and query rows — the key-padding form).
    Returns (B, H, S, D) in q's dtype.
    """
    return _fused_fwd(q, k, v, scale, bias)[0]


def _fused_fwd(q, k, v, scale, bias=None):
    b, h, s, d = q.shape
    with_bias = bias is not None
    in_specs, qkv = _specs(b, h, s, d, with_bias)
    if with_bias:
        kernel = functools.partial(_fwd_kernel, scale=scale)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref):
            _fwd_kernel(q_ref, k_ref, v_ref, None, o_ref, scale=scale)
    args = (q, k, v, bias) if with_bias else (q, k, v)
    out = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=in_specs,
        out_specs=qkv,
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        interpret=_interpret(),
    )(*args)
    return out, (q, k, v, bias)


def _fused_bwd(scale, res, do):
    q, k, v, bias = res
    b, h, s, d = q.shape
    with_bias = bias is not None
    in_specs, qkv = _specs(b, h, s, d, with_bias)
    in_specs.append(qkv)  # do
    if with_bias:
        kernel = functools.partial(_bwd_kernel, scale=scale)
    else:
        def kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
            _bwd_kernel(q_ref, k_ref, v_ref, None, do_ref,
                        dq_ref, dk_ref, dv_ref, scale=scale)
    args = (q, k, v, bias, do) if with_bias else (q, k, v, do)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=in_specs,
        out_specs=[qkv, qkv, qkv],
        out_shape=[jax.ShapeDtypeStruct((b, h, s, d), q.dtype)] * 3,
        interpret=_interpret(),
    )(*args)
    dbias = None
    if with_bias:
        # bias is the -inf key-padding bias: treat as a constant mask
        # (its cotangent is never used — the mask does not train).
        dbias = jnp.zeros_like(bias)
    return dq, dk, dv, dbias


fused_attention.defvjp(_fused_fwd, _fused_bwd)


def padding_bias(key_padding_mask: Optional[jax.Array],
                 seq_length: int) -> Optional[jax.Array]:
    """Boolean (B, S) pad mask (or 1-D lengths) -> additive f32
    (B, 1, 1, S) bias for :func:`fused_attention` (the einsum path's
    ``jnp.where(pad, -inf, scores)`` in additive form; -1e30 rather
    than -inf so fully-padded rows degrade to uniform rather than NaN,
    matching the where+softmax path up to that guard)."""
    if key_padding_mask is None:
        return None
    mask = jnp.asarray(key_padding_mask)
    if mask.ndim == 1:
        positions = jnp.arange(seq_length)[None, :]
        mask = positions >= mask[:, None]
    return jnp.where(mask, -1e30, 0.0).astype(jnp.float32)[:, None, None, :]
