"""ATQ text encoder (Flax).

Reference: /root/reference/models/text_encoder.py:252-432.

Architecture: full-precision embedding (init N(0, 0.02)) + embedding
LayerNorm + fixed sinusoidal positional encoding + dropout, N ternary
transformer layers, final LayerNorm, attention pooling, learnable output
scaling clamped to [1, 10].

Preserved quirks:
- the attention-pooling MLP ends in Softmax(axis=1) and, when a padding
  mask is present, the already-softmaxed weights are masked to -inf and
  softmaxed a SECOND time (text_encoder.py:292-311, :415-417) — reproduce
  as-is for metric parity;
- the positional encoding is a non-trainable constant (requires_grad=False
  Parameter in the reference, text_encoder.py:334-341) — here it is simply
  computed as a constant, which XLA folds;
- `src_key_padding_mask` may be a boolean mask (True = pad) or a vector of
  sequence lengths.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from atq_tpu.nn.attention import _norm, _proj, lengths_to_padding_mask
from atq_tpu.nn.initializers import normal_std
from atq_tpu.nn.transformer import TernaryTransformerLayer


def sinusoidal_positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Classic fixed sin/cos table (reference text_encoder.py:334-341)."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32)
        * (-math.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe[None]  # (1, max_len, d_model)


class ATQTextEncoder(nn.Module):
    vocab_size: int
    embed_dim: int = 128
    num_heads: int = 8
    num_layers: int = 4
    dim_feedforward: int = 512
    dropout: float = 0.1
    use_rpb: bool = True
    sparsity_target: float = 0.3
    max_seq_length: int = 256
    grad_mode: str = "parity"

    @nn.compact
    def __call__(self, x, src_key_padding_mask=None,
                 deterministic: bool = True):
        """Token ids (B, L) -> pooled text features (B, embed_dim)."""
        initial_sparsity = min(0.1, self.sparsity_target)

        if src_key_padding_mask is not None:
            src_key_padding_mask = jnp.asarray(src_key_padding_mask)
            if src_key_padding_mask.ndim == 1:
                src_key_padding_mask = lengths_to_padding_mask(
                    src_key_padding_mask, x.shape[1]
                )

        h = nn.Embed(self.vocab_size, self.embed_dim,
                     embedding_init=normal_std(0.02), name="embedding")(x)
        h = _norm(name="embed_norm")(h)

        pe = sinusoidal_positional_encoding(self.max_seq_length,
                                            self.embed_dim)
        h = h + jnp.asarray(pe[:, : h.shape[1], :])
        h = nn.Dropout(self.dropout, name="embed_dropout")(
            h, deterministic=deterministic
        )

        for i in range(self.num_layers):
            h = TernaryTransformerLayer(
                embed_dim=self.embed_dim, num_heads=self.num_heads,
                dim_feedforward=self.dim_feedforward, dropout=self.dropout,
                use_rpb=self.use_rpb, sparsity_target=initial_sparsity,
                layer_idx=i, grad_mode=self.grad_mode, name=f"layers_{i}",
            )(h, src_key_padding_mask=src_key_padding_mask,
              deterministic=deterministic)

        h = _norm(name="norm")(h)

        # Attention pooling: RPB dim -> dim/2 -> 1 with Tanh, softmax over
        # the sequence axis (text_encoder.py:292-311).
        a = _proj(self.use_rpb, self.embed_dim // 2, 0.2, initial_sparsity,
                  "attention_pool_0", self.grad_mode)(h)
        a = jnp.tanh(a)
        a = _proj(self.use_rpb, 1, 0.2, initial_sparsity,
                  "attention_pool_2", self.grad_mode)(a)
        attn_weights = nn.softmax(a, axis=1)  # (B, L, 1)

        if src_key_padding_mask is not None:
            # Double-softmax quirk (text_encoder.py:415-417): mask the
            # already-softmaxed weights and renormalize.
            attn_weights = jnp.where(
                src_key_padding_mask[:, :, None], float("-inf"), attn_weights
            )
            attn_weights = nn.softmax(attn_weights, axis=1)

        text_features = jnp.sum(h * attn_weights, axis=1)  # (B, D)

        scaling = self.param(
            "scaling", lambda _k, shape: jnp.full(shape, 4.0, jnp.float32),
            (1,),
        )
        return text_features * jnp.clip(scaling, 1.0, 10.0)

    def extract_features(self, x, src_key_padding_mask=None,
                         deterministic: bool = True):
        return self(x, src_key_padding_mask, deterministic)
