"""Ring attention: sequence-parallel attention over a mesh axis.

Framework capability called for by SURVEY.md §5 (long-context): the parity
path never needs it (reference sequences are <= 50 tokens,
models/text_encoder.py:119 is plain O(L^2) attention), so it is OFF by
default and exposed behind the same attention math as the dense path.

Design: Q, K, V are sharded along the sequence axis over a mesh axis; each
device holds a local query block and streams K/V blocks around the ring
with ``jax.lax.ppermute`` while maintaining a numerically-stable online
softmax (running max / denominator, flash-attention style). Communication
is one (B, H, L_local, D) block per step riding ICI; compute overlaps with
the next permute under XLA's scheduler. N devices -> N ring steps.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ring_attention(q, k, v, axis_name: str,
                   key_padding_mask: Optional[jax.Array] = None,
                   scale: Optional[float] = None):
    """Sequence-sharded attention (call inside shard_map).

    Args:
        q, k, v: local shards (B, H, L_local, D); the global sequence is the
            concatenation of shards along the mesh axis.
        axis_name: mesh axis the sequence is sharded over.
        key_padding_mask: optional local bool shard (B, L_local), True = pad.
        scale: attention scale; default 1/sqrt(D).

    Returns:
        (B, H, L_local, D) local output shard — bitwise equivalent (up to
        float reassociation) to dense softmax attention over the gathered
        sequence.
    """
    n_devices = jax.lax.psum(1, axis_name)
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    b, h, lq, _ = q.shape
    o = jnp.zeros((b, h, lq, d), jnp.float32)
    row_max = jnp.full((b, h, lq), NEG_INF, jnp.float32)
    row_sum = jnp.zeros((b, h, lq), jnp.float32)

    perm = [(i, (i + 1) % n_devices) for i in range(n_devices)]

    def body(i, carry):
        o, row_max, row_sum, k_blk, v_blk, mask_blk = carry
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_blk,
            preferred_element_type=jnp.float32,
        ) * scale
        if mask_blk is not None:
            scores = jnp.where(mask_blk[:, None, None, :], NEG_INF, scores)

        blk_max = jnp.max(scores, axis=-1)
        new_max = jnp.maximum(row_max, blk_max)
        correction = jnp.exp(row_max - new_max)
        p = jnp.exp(scores - new_max[..., None])
        new_sum = row_sum * correction + jnp.sum(p, axis=-1)
        new_o = (o * correction[..., None]
                 + jnp.einsum("bhqk,bhkd->bhqd", p,
                              v_blk.astype(jnp.float32)))

        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        if mask_blk is not None:
            mask_blk = jax.lax.ppermute(mask_blk, axis_name, perm)
        return new_o, new_max, new_sum, k_blk, v_blk, mask_blk

    carry = (o, row_max, row_sum, k, v, key_padding_mask)
    for i in range(n_devices):  # n_devices is static under shard_map
        carry = body(i, carry)
    o, row_max, row_sum, *_ = carry

    return (o / jnp.maximum(row_sum, 1e-30)[..., None]).astype(q.dtype)


def dense_reference_attention(q, k, v, key_padding_mask=None, scale=None):
    """Plain softmax attention (the single-device oracle for tests)."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if key_padding_mask is not None:
        scores = jnp.where(key_padding_mask[:, None, None, :], NEG_INF,
                           scores)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def sequence_parallel_attention(q, k, v, mesh, axis_name: str = "data",
                                key_padding_mask=None, scale=None):
    """Convenience wrapper: shard (B, H, L, D) tensors along L over
    ``axis_name`` and run :func:`ring_attention` under shard_map."""
    from jax.sharding import PartitionSpec as P

    spec = P(None, None, axis_name, None)
    mask_spec = P(None, axis_name)

    def fn(q, k, v, mask):
        return ring_attention(q, k, v, axis_name, mask, scale)

    in_specs = (spec, spec, spec,
                mask_spec if key_padding_mask is not None else P())
    if key_padding_mask is None:
        def fn(q, k, v, _mask):  # noqa: F811
            return ring_attention(q, k, v, axis_name, None, scale)
        mask_arg = jnp.zeros((), jnp.float32)
    else:
        mask_arg = key_padding_mask

    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=spec, check_vma=False,
    )(q, k, v, mask_arg)
