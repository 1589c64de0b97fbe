"""Full-precision baseline retrieval model (accuracy oracle).

Reference: /root/reference/train_multimodal.py:93-194 (`create_baseline_model`):
ResNet18 image encoder + Linear/GELU/LN projector, embedding + bidirectional
GRU text encoder (last hidden states of both directions concatenated) +
projector, L2-normalized embeddings, learnable temperature 0.07.

The reference packs variable-length sequences for the GRU; here the GRU runs
the full padded length and the per-direction final states are gathered at
each sequence's true length — same semantics, static shapes (TPU-friendly,
no PackedSequence)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from atq_tpu.models.fusion import l2_normalize
from atq_tpu.models.resnet import BasicBlock, ResNetFeatures
from atq_tpu.nn.initializers import normal_std


class BaselineRetrievalModel(nn.Module):
    vocab_size: int
    embed_dim: int = 192
    hidden_dim: int = 384

    def setup(self):
        self.image_encoder = ResNetFeatures(stage_sizes=(2, 2, 2, 2),
                                            block=BasicBlock)
        self.image_projector = _Projector(self.embed_dim)
        self.embedding = nn.Embed(self.vocab_size, self.embed_dim,
                                  embedding_init=normal_std(0.02))
        self.gru_fwd = nn.RNN(nn.GRUCell(features=self.hidden_dim))
        self.gru_bwd = nn.RNN(nn.GRUCell(features=self.hidden_dim),
                              reverse=True, keep_order=True)
        self.text_projector = _Projector(self.embed_dim)
        self.temperature = self.param(
            "temperature", lambda _k, s: jnp.full(s, 0.07, jnp.float32), ()
        )

    def encode_image(self, image, train: bool = False):
        features = self.image_encoder(image, train=train)
        return l2_normalize(self.image_projector(features), axis=1)

    def encode_text(self, text, text_lengths=None):
        embedded = self.embedding(text)                    # (B, L, D)
        batch, seq_len = text.shape
        if text_lengths is None:
            text_lengths = jnp.full((batch,), seq_len, jnp.int32)
        lengths = jnp.clip(text_lengths, 1, seq_len)

        fwd = self.gru_fwd(embedded)                        # (B, L, H)
        bwd = self.gru_bwd(embedded, seq_lengths=lengths)   # (B, L, H)

        # Final forward state at position length-1; final backward state at
        # position 0 (it consumed the sequence right-to-left).
        idx = (lengths - 1)[:, None, None]
        last_fwd = jnp.take_along_axis(fwd, idx, axis=1)[:, 0, :]
        first_bwd = bwd[:, 0, :]
        hidden = jnp.concatenate([last_fwd, first_bwd], axis=1)
        return l2_normalize(self.text_projector(hidden), axis=1)

    def __call__(self, image, text, text_lengths=None,
                 return_embeddings: bool = False, train: bool = False):
        image_embeddings = self.encode_image(image, train=train)
        text_embeddings = self.encode_text(text, text_lengths)
        if return_embeddings:
            return image_embeddings, text_embeddings
        return (jnp.matmul(image_embeddings, text_embeddings.T)
                / self.temperature)


class _Projector(nn.Module):
    """Linear -> GELU -> LayerNorm -> Linear (train_multimodal.py:102-107)."""

    embed_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.embed_dim)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        return nn.Dense(self.embed_dim)(x)
