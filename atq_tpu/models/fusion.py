"""Multimodal fusion modules (Flax).

- :class:`ModalitySpecificQuantization` <- /root/reference/models/fusion.py:147-211
- :class:`MultimodalFusion`             <- /root/reference/models/fusion.py:214-423

Preserved quirks:
- hard-coded per-modality sparsity targets: image 0.3, text 0.2,
  fusion 0.15, default 0.25 (fusion.py:156-168);
- learnable per-modality scale clamped to [0.5, 2] (fusion.py:311-315);
- the element-wise gate method computes an output_dim-wide gate vector but
  uses only its first len(modalities) columns (fusion.py:408-414);
- L2-normalization of attended features and of the fused output.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from atq_tpu.nn.attention import TernaryCrossAttention, _norm, _proj

MODALITY_SPARSITY = {"image": 0.3, "text": 0.2, "fusion": 0.15}
DEFAULT_MODALITY_SPARSITY = 0.25


def l2_normalize(x, axis=1, eps=1e-12):
    """torch F.normalize(p=2) semantics: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


class ModalitySpecificQuantization(nn.Module):
    """RPB projection + LayerNorm + GELU with modality-tuned sparsity
    (reference fusion.py:147-211)."""

    output_dim: int
    modality_name: str
    use_rpb: bool = True
    grad_mode: str = "parity"
    dtype: Optional[jnp.dtype] = None  # matmul compute dtype (AMP)

    @nn.compact
    def __call__(self, x):
        target = MODALITY_SPARSITY.get(self.modality_name,
                                       DEFAULT_MODALITY_SPARSITY)
        initial_sparsity = min(0.1, target)
        precision_ratio = 0.2 if self.modality_name == "fusion" else 0.15
        x = _proj(self.use_rpb, self.output_dim, precision_ratio,
                  initial_sparsity, "projection", self.grad_mode,
                  self.dtype)(x)
        x = _norm(name="norm")(x)
        return nn.gelu(x, approximate=False)


class MultimodalFusion(nn.Module):
    """Cross-attention / concat / element-wise-gate fusion of modality
    features into a joint L2-normalized embedding."""

    input_dims: Dict[str, int]
    output_dim: int
    fusion_method: str = "cross_attention"
    num_heads: int = 4
    dropout: float = 0.1
    use_rpb: bool = True
    grad_mode: str = "parity"
    dtype: Optional[jnp.dtype] = None  # matmul compute dtype (AMP)

    @nn.compact
    def __call__(self, inputs: Dict[str, jnp.ndarray],
                 deterministic: bool = True):
        for name in self.input_dims:
            if name not in inputs:
                raise ValueError(
                    f"Required modality '{name}' not found in inputs"
                )

        initial_sparsity = 0.05  # fusion starts very low (fusion.py:227-229)

        projected = {}
        for name in self.input_dims:
            features = inputs[name]
            batch = features.shape[0]
            if features.ndim > 2:
                features = features.reshape(batch, -1)
            features = ModalitySpecificQuantization(
                output_dim=self.output_dim, modality_name=name,
                use_rpb=self.use_rpb, grad_mode=self.grad_mode,
                dtype=self.dtype,
                name=f"modality_projections_{name}",
            )(features)
            scale = self.param(
                f"modality_scales_{name}",
                lambda _k, shape: jnp.ones(shape, jnp.float32), (1,),
            )
            projected[name] = features * jnp.clip(scale, 0.5, 2.0)

        if (self.fusion_method == "cross_attention"
                and "text" in projected and "image" in projected):
            text_features = projected["text"]
            image_features = projected["image"]

            text_attended = TernaryCrossAttention(
                hidden_dim=self.output_dim, num_heads=self.num_heads,
                dropout=self.dropout, use_rpb=self.use_rpb,
                sparsity_target=initial_sparsity, grad_mode=self.grad_mode,
                dtype=self.dtype, name="text2image",
            )(text_features, image_features, image_features,
              deterministic=deterministic)
            image_attended = TernaryCrossAttention(
                hidden_dim=self.output_dim, num_heads=self.num_heads,
                dropout=self.dropout, use_rpb=self.use_rpb,
                sparsity_target=initial_sparsity, grad_mode=self.grad_mode,
                dtype=self.dtype, name="image2text",
            )(image_features, text_features, text_features,
              deterministic=deterministic)

            if self.use_rpb:
                text_attended = _proj(True, self.output_dim, 0.2,
                                      initial_sparsity,
                                      "cross_modal_align_text",
                                      self.grad_mode,
                                      self.dtype)(text_attended)
                image_attended = _proj(True, self.output_dim, 0.2,
                                       initial_sparsity,
                                       "cross_modal_align_image",
                                       self.grad_mode,
                                       self.dtype)(image_attended)

            text_attended = l2_normalize(text_attended, axis=1)
            image_attended = l2_normalize(image_attended, axis=1)

            combined = jnp.concatenate([text_attended, image_attended],
                                       axis=1)
            fused = _proj(self.use_rpb, self.output_dim, 0.2,
                          initial_sparsity, "final_fusion",
                          self.grad_mode, self.dtype)(combined)

        elif self.fusion_method == "concat":
            concatenated = jnp.concatenate(
                [projected[n] for n in self.input_dims], axis=1
            )
            fused = _proj(self.use_rpb, self.output_dim, 0.2,
                          initial_sparsity, "fusion_layer",
                          self.grad_mode, self.dtype)(concatenated)

        else:  # element-wise gated sum
            stacked = jnp.concatenate(
                [projected[n] for n in self.input_dims], axis=1
            )
            gates = nn.sigmoid(
                _proj(self.use_rpb, self.output_dim, 0.2, initial_sparsity,
                      "fusion_gate", self.grad_mode, self.dtype)(stacked)
            )
            # Reference quirk: only the first len(modalities) gate columns
            # are used (fusion.py:408-414).
            fused = sum(
                gates[:, i:i + 1] * feat
                for i, feat in enumerate(projected[n]
                                         for n in self.input_dims)
            )

        fused = _norm(name="norm")(fused)
        fused = nn.Dropout(self.dropout)(fused, deterministic=deterministic)
        return l2_normalize(fused, axis=1)
