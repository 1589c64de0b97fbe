"""Ternary transformer encoder layer (Flax).

Reference: /root/reference/models/text_encoder.py:166-249.

Preserved quirks: pre-norm architecture; every layer is "critical"
(``is_critical = layer_idx >= 0``, text_encoder.py:182) so attention uses
precision 0.2 and FFN linear1/linear2 use 0.2/0.4; a single learnable sigmoid
gate (init 0.8) scales BOTH residual branches; GELU (exact, not tanh-approx)
in the FFN.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from atq_tpu.nn.attention import TernaryMultiheadAttention, _norm, _proj


class TernaryTransformerLayer(nn.Module):
    embed_dim: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    use_rpb: bool = True
    sparsity_target: float = 0.3
    layer_idx: int = 0
    grad_mode: str = "parity"

    @nn.compact
    def __call__(self, src, src_mask=None, src_key_padding_mask=None,
                 deterministic: bool = True):
        initial_sparsity = min(0.1, self.sparsity_target)
        is_critical = self.layer_idx >= 0  # all layers (text_encoder.py:182)
        precision_ratio = 0.2 if is_critical else 0.05

        gate = self.param(
            "gate", lambda _key, shape: jnp.full(shape, 0.8, jnp.float32), (1,)
        )
        gate_value = nn.sigmoid(gate)

        # Self-attention block (pre-norm).
        src2 = _norm(name="norm1")(src)
        src2 = TernaryMultiheadAttention(
            embed_dim=self.embed_dim, num_heads=self.num_heads,
            dropout=self.dropout, use_rpb=self.use_rpb,
            sparsity_target=initial_sparsity, critical_attention=is_critical,
            grad_mode=self.grad_mode, name="self_attn",
        )(src2, src2, src2, attn_mask=src_mask,
          key_padding_mask=src_key_padding_mask, deterministic=deterministic)
        src = src + nn.Dropout(self.dropout)(
            src2, deterministic=deterministic
        ) * gate_value

        # Feed-forward block (pre-norm), GELU exact like torch F.gelu.
        src2 = _norm(name="norm2")(src)
        h = _proj(self.use_rpb, self.dim_feedforward, precision_ratio,
                  initial_sparsity, "linear1", self.grad_mode)(src2)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        src2 = _proj(self.use_rpb, self.embed_dim, precision_ratio * 2,
                     initial_sparsity, "linear2", self.grad_mode)(h)
        src = src + nn.Dropout(self.dropout)(
            src2, deterministic=deterministic
        ) * gate_value
        return src
