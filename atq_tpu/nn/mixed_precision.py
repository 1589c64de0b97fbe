"""Importance-controlled layers (mixed-precision allocation at module level).

- :class:`PrecisionControlledLinear` <- /root/reference/atq/mixed_precision_atq.py:238-285
- :class:`EnhancedATQTransformerLayer` <- /root/reference/atq/mixed_precision_atq.py:289-401
  (an example post-norm transformer layer with per-sublayer importance;
  not used by either reference driver but part of the public API)
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from atq_tpu.core.schedules import MixedPrecisionATQ
from atq_tpu.nn.layers import (
    ResidualPrecisionBoostLinear,
    TernaryLinear,
    apply_selective_routing,
)


class PrecisionControlledLinear(nn.Module):
    """Linear layer whose precision_ratio / sparsity_target are derived
    from an importance score (mixed_precision_atq.py:238-285)."""

    features: int
    importance: float = 1.0
    base_sparsity: float = 0.3
    base_precision_ratio: float = 0.05
    use_bias: bool = True
    use_rpb: bool = True
    grad_mode: str = "parity"

    @nn.compact
    def __call__(self, x):
        if self.use_rpb:
            precision_ratio = MixedPrecisionATQ.get_precision_ratio(
                self.importance, base_ratio=self.base_precision_ratio
            )
            sparsity_target = MixedPrecisionATQ.get_sparsity_target(
                self.importance, base_sparsity=self.base_sparsity
            )
            layer = ResidualPrecisionBoostLinear(
                features=self.features, precision_ratio=precision_ratio,
                sparsity_target=sparsity_target, use_bias=self.use_bias,
                grad_mode=self.grad_mode, name="linear",
            )
        else:
            layer = TernaryLinear(features=self.features,
                                  use_bias=self.use_bias,
                                  grad_mode=self.grad_mode, name="linear")
        return layer(x)


class EnhancedATQTransformerLayer(nn.Module):
    """Post-norm transformer layer with importance-scaled precision per
    sublayer: later layers and attention get more precision
    (mixed_precision_atq.py:289-401). Routing thresholds decay with depth."""

    embed_dim: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    use_rpb: bool = True
    base_sparsity: float = 0.3
    layer_idx: int = 0
    total_layers: int = 4
    grad_mode: str = "parity"

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        head_dim = self.embed_dim // self.num_heads
        assert head_dim * self.num_heads == self.embed_dim

        layer_progress = self.layer_idx / max(1, self.total_layers - 1)
        layer_importance = 1.0 + layer_progress          # 1.0 .. 2.0
        attn_importance = layer_importance * 1.2
        ff_importance = layer_importance * 0.8

        def pcl(features, importance, name):
            return PrecisionControlledLinear(
                features=features, importance=importance,
                base_sparsity=self.base_sparsity, use_rpb=self.use_rpb,
                grad_mode=self.grad_mode, name=name,
            )

        q = pcl(self.embed_dim, attn_importance, "query")(x)
        k = pcl(self.embed_dim, attn_importance, "key")(x)
        v = pcl(self.embed_dim, attn_importance, "value")(x)

        threshold = max(0.01, 0.05 * (1.0 - self.layer_idx / 10))
        q = apply_selective_routing(q, threshold=threshold)
        k = apply_selective_routing(k, threshold=threshold)
        v = apply_selective_routing(v, threshold=threshold)

        batch = x.shape[0]

        def split(t):
            return t.reshape(batch, -1, self.num_heads, head_dim).transpose(
                0, 2, 1, 3
            )

        qh, kh, vh = split(q), split(k), split(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(head_dim)
        if mask is not None:
            scores = jnp.where(mask == 0, float("-inf"), scores)
        attn = nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(batch, -1, self.embed_dim)
        out = pcl(self.embed_dim, attn_importance * 1.1, "attn_out")(out)

        # Post-norm residuals (unlike the pre-norm TernaryTransformerLayer).
        x = x + nn.Dropout(self.dropout)(out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)

        h = pcl(self.dim_feedforward, ff_importance, "ff1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = pcl(self.embed_dim, ff_importance * 1.2, "ff2")(h)

        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        return x
