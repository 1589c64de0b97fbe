"""Ternary attention modules (Flax).

- :class:`TernaryMultiheadAttention` <- /root/reference/models/text_encoder.py:10-163
- :class:`TernaryCrossAttention`     <- /root/reference/models/fusion.py:10-144

Parity notes:
* torch LayerNorm eps is 1e-5 (flax default is 1e-6) — set explicitly.
* the pre-LN is applied to the *query only* (text_encoder.py:76-77), and the
  critical-path residual ``output + 0.1 * query`` uses the normalized query
  (text_encoder.py:111-114).
* key_padding_mask accepts either a boolean mask (True = pad) or a 1-D vector
  of sequence lengths (text_encoder.py:131-141).
* attention runs as one batched (B, H, L, L) einsum pair — both matmuls land
  on the MXU; the padding mask is applied as an additive -inf before a single
  softmax.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from atq_tpu.nn.layers import (
    ResidualPrecisionBoostLinear,
    TernaryLinear,
    apply_selective_routing,
)

NEG_INF = float("-inf")

_warned_fused_dropout = False


def _warn_fused_dropout_fallback():
    """One-time notice that attn_impl='fused' is running the einsum path
    because attention dropout is active (the fused kernel has no dropout;
    benchmarks set dropout=0.0 so their fused numbers are real)."""
    global _warned_fused_dropout
    if not _warned_fused_dropout:
        _warned_fused_dropout = True
        import warnings

        warnings.warn(
            "attn_impl='fused' requested but attention dropout is active "
            "(training with dropout > 0): falling back to the einsum "
            "attention path for these steps. Set dropout=0.0 (or run "
            "deterministically) to use the fused kernel.",
            stacklevel=2,
        )


def _norm(name=None):
    # Computation pinned to f32: under bf16 AMP torch autocast runs
    # LayerNorm in fp32 (and the parity path is f32 anyway).
    return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)


def lengths_to_padding_mask(lengths, seq_length: int):
    """1-D lengths -> boolean (B, L) mask with True at padding positions
    (reference: text_encoder.py:134-141)."""
    positions = jnp.arange(seq_length)[None, :]
    return positions >= lengths[:, None]


def _proj(use_rpb: bool, features: int, precision_ratio: float,
          sparsity_target: float, name: str, grad_mode: str = "parity",
          dtype=None, pre_quantized: bool = False):
    """``dtype`` is the MATMUL compute dtype (autocast semantics: the
    latent weights, quantizer sort/threshold, and alpha stay f32; the
    effective weight and activations cast at the matmul — exactly what
    torch autocast does to the reference's F.linear). ``pre_quantized``:
    hoisted-quantization mode (nn/hoist.py) — weights arrive already
    effective."""
    if use_rpb:
        return ResidualPrecisionBoostLinear(
            features=features, precision_ratio=precision_ratio,
            sparsity_target=sparsity_target, name=name, grad_mode=grad_mode,
            dtype=dtype, pre_quantized=pre_quantized,
        )
    return TernaryLinear(features=features, name=name, grad_mode=grad_mode,
                         dtype=dtype, pre_quantized=pre_quantized)


class TernaryMultiheadAttention(nn.Module):
    """Multi-head self/cross attention over ATQ projections.

    Reference: models/text_encoder.py:10-163. ``critical_attention`` raises
    the projection precision ratio to 0.2 (out: 0.4) and adds the
    ``output + 0.1 * query`` residual.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    use_rpb: bool = True
    sparsity_target: float = 0.3
    attention_scale: Optional[float] = None
    critical_attention: bool = False
    grad_mode: str = "parity"
    dtype: Optional[jnp.dtype] = None  # matmul compute dtype (AMP)
    # 'einsum' (default, reference-parity path) or 'fused': the
    # single-block Pallas kernel (ops/fused_attention.py) that keeps the
    # (S, S) scores in VMEM — measurably faster at training shapes
    # (S<=512). Identical math (tests/test_fused_attention.py); the
    # fused path requires attn_mask=None and inactive dropout, and
    # falls back to einsum otherwise.
    attn_impl: str = "einsum"
    # Hoisted-quantization mode (nn/hoist.py): projections consume
    # already-effective weights (plain matmuls).
    pre_quantized: bool = False

    @nn.compact
    def __call__(self, query, key, value, attn_mask=None,
                 key_padding_mask=None, deterministic: bool = True):
        head_dim = self.embed_dim // self.num_heads
        assert head_dim * self.num_heads == self.embed_dim

        # Initial sparsity: reference layers are constructed with
        # min(0.1, target) and ramped by the schedule (text_encoder.py:22-25).
        initial_sparsity = min(0.1, self.sparsity_target)
        precision_ratio = 0.2 if self.critical_attention else 0.05

        query = _norm(name="pre_layer_norm")(query)
        batch = query.shape[0]

        q = _proj(self.use_rpb, self.embed_dim, precision_ratio,
                  initial_sparsity, "q_proj", self.grad_mode,
                  self.dtype, self.pre_quantized)(query)
        k = _proj(self.use_rpb, self.embed_dim, precision_ratio,
                  initial_sparsity, "k_proj", self.grad_mode,
                  self.dtype, self.pre_quantized)(key)
        v = _proj(self.use_rpb, self.embed_dim, precision_ratio,
                  initial_sparsity, "v_proj", self.grad_mode,
                  self.dtype, self.pre_quantized)(value)

        gradient_threshold = 0.01 if self.critical_attention else 0.05
        q = apply_selective_routing(q, threshold=gradient_threshold)
        k = apply_selective_routing(k, threshold=gradient_threshold)
        v = apply_selective_routing(v, threshold=gradient_threshold)

        # (B, L, D) -> (B, H, L, Dh)
        def split(t):
            return t.reshape(batch, -1, self.num_heads, head_dim).transpose(
                0, 2, 1, 3
            )

        q, k, v = split(q), split(k), split(v)

        scale = self.attention_scale or (1.0 / math.sqrt(head_dim))
        dropout_active = self.dropout > 0.0 and not deterministic
        if self.attn_impl == "fused" and dropout_active:
            _warn_fused_dropout_fallback()
        if self.attn_impl == "fused" and attn_mask is None \
                and not dropout_active and q.shape[2] == k.shape[2]:
            from atq_tpu.ops.fused_attention import (
                fused_attention,
                padding_bias,
            )

            # The bias masks KEYS: size it by the key length (identical
            # to the query length on this guarded self-attention branch,
            # but k.shape is the semantically right extent).
            bias = padding_bias(key_padding_mask, k.shape[2])
            out = fused_attention(q, k, v, float(scale), bias)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale

            if key_padding_mask is not None:
                key_padding_mask = jnp.asarray(key_padding_mask)
                if key_padding_mask.ndim == 1:
                    key_padding_mask = lengths_to_padding_mask(
                        key_padding_mask, scores.shape[-1]
                    )
                pad = key_padding_mask[:, None, None, :]
                scores = jnp.where(pad, NEG_INF, scores)
            if attn_mask is not None:
                scores = scores + attn_mask

            attn = nn.softmax(scores.astype(jnp.float32), axis=-1)
            attn = attn.astype(v.dtype)  # compute dtype for the matmul
            attn = nn.Dropout(self.dropout)(attn,
                                            deterministic=deterministic)

            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(batch, -1, self.embed_dim)

        out = _proj(self.use_rpb, self.embed_dim, precision_ratio * 2,
                    initial_sparsity, "out_proj", self.grad_mode,
                    self.dtype, self.pre_quantized)(out)

        if self.critical_attention:
            out = out + 0.1 * query
        return out


class TernaryCrossAttention(nn.Module):
    """Cross-modal attention with ATQ projections and gated residual.

    Reference: models/fusion.py:10-144. Quirks preserved: per-input
    LayerNorms; learnable attention-scale parameter (init 1/sqrt(head_dim));
    2-D inputs get a singleton sequence axis; post-projection LayerNorm; and
    a sigmoid-gated residual blend with the *normalized* query when the
    dimensions match (gate init 0.8).
    """

    hidden_dim: int
    num_heads: int = 4
    dropout: float = 0.1
    use_rpb: bool = True
    sparsity_target: float = 0.3
    grad_mode: str = "parity"
    dtype: Optional[jnp.dtype] = None  # matmul compute dtype (AMP)

    @nn.compact
    def __call__(self, query, key, value, deterministic: bool = True):
        head_dim = self.hidden_dim // self.num_heads
        assert head_dim * self.num_heads == self.hidden_dim
        initial_sparsity = min(0.1, self.sparsity_target)
        batch = query.shape[0]

        query = _norm(name="layer_norm_q")(query)
        key = _norm(name="layer_norm_k")(key)
        value = _norm(name="layer_norm_v")(value)

        q = _proj(self.use_rpb, self.hidden_dim, 0.15, initial_sparsity,
                  "q_proj", self.grad_mode, self.dtype)(query)
        k = _proj(self.use_rpb, self.hidden_dim, 0.15, initial_sparsity,
                  "k_proj", self.grad_mode, self.dtype)(key)
        v = _proj(self.use_rpb, self.hidden_dim, 0.15, initial_sparsity,
                  "v_proj", self.grad_mode, self.dtype)(value)

        q = apply_selective_routing(q, threshold=0.01)
        k = apply_selective_routing(k, threshold=0.01)
        v = apply_selective_routing(v, threshold=0.01)

        if q.ndim == 2:
            q = q[:, None, :]
        if k.ndim == 2:
            k = k[:, None, :]
        if v.ndim == 2:
            v = v[:, None, :]

        def split(t):
            return t.reshape(batch, -1, self.num_heads, head_dim).transpose(
                0, 2, 1, 3
            )

        q, k, v = split(q), split(k), split(v)

        scale = self.param(
            "attention_scale",
            lambda _key, shape: jnp.full(shape, 1.0 / math.sqrt(head_dim),
                                         jnp.float32),
            (1,),
        )
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        attn = nn.softmax(scores.astype(jnp.float32), axis=-1)
        attn = attn.astype(v.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(batch, -1, self.hidden_dim)

        if out.shape[1] == 1:
            out = out[:, 0, :]

        out = _proj(self.use_rpb, self.hidden_dim, 0.2, initial_sparsity,
                    "out_proj", self.grad_mode, self.dtype)(out)
        out = _norm(name="layer_norm_out")(out)

        gate = self.param(
            "gate", lambda _key, shape: jnp.full(shape, 0.8, jnp.float32), (1,)
        )
        if query.ndim == out.ndim and query.shape[-1] == out.shape[-1]:
            g = nn.sigmoid(gate)
            out = g * out + (1.0 - g) * query
        return out
