"""Legacy multimodal classifier (backward-compatibility surface).

Reference: /root/reference/models/multimodal_classifier.py:322-562
(`ATQMultimodalClassifier`, alias `MultimodalATQ` at :560-562). Not used by
either reference driver, but part of the public API.

Dual classifier paths — a quantized RPB stack and a full-precision stack —
blended by a learnable sigmoid mix ratio (init 0.8). Modality dropout zeroes
a modality's features; in this functional design the per-batch drop
decisions are explicit call arguments instead of mutated instance flags.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from atq_tpu.models.fusion import MultimodalFusion
from atq_tpu.models.image_classifier import _ConvFeatures
from atq_tpu.models.text_encoder import ATQTextEncoder
from atq_tpu.nn.attention import _proj
from atq_tpu.nn.layers import apply_selective_routing

IMAGE_FEATURE_DIM = 64 * 7 * 7  # 28x28 input after two 2x2 pools


class ATQMultimodalClassifier(nn.Module):
    num_classes: int = 10
    vocab_size: int = 10000
    embed_dim: int = 128
    hidden_dim: int = 256
    fusion_method: str = "cross_attention"
    vision_threshold: float = 0.05
    text_threshold: float = 0.05
    fusion_threshold: float = 0.05
    use_residual: bool = True
    residual_scale: float = 0.1
    grad_mode: str = "parity"

    @nn.compact
    def __call__(self, image, text, text_padding_mask=None,
                 drop_image: bool = False, drop_text: bool = False,
                 train: bool = False):
        deterministic = not train
        initial_fusion = min(0.01, self.fusion_threshold)

        # Image branch: the classifier's CNN feature stack only
        # (multimodal_classifier.py:446-456).
        image_features = _ConvFeatures(name="image_encoder_features")(
            image, train=train
        )
        if drop_image:
            image_features = jnp.zeros_like(image_features)

        text_features = ATQTextEncoder(
            vocab_size=self.vocab_size, embed_dim=self.embed_dim,
            num_heads=4, num_layers=2, dim_feedforward=self.hidden_dim,
            use_rpb=self.use_residual,
            sparsity_target=min(0.01, self.text_threshold),
            grad_mode=self.grad_mode, name="text_encoder",
        )(text, text_padding_mask, deterministic=deterministic)
        if drop_text:
            text_features = jnp.zeros_like(text_features)

        fused = MultimodalFusion(
            input_dims={"image": IMAGE_FEATURE_DIM, "text": self.embed_dim},
            output_dim=self.hidden_dim, fusion_method=self.fusion_method,
            use_rpb=self.use_residual, grad_mode=self.grad_mode,
            name="fusion",
        )({"image": image_features, "text": text_features},
          deterministic=deterministic)

        fused_routed = apply_selective_routing(fused, threshold=0.01)

        # Quantized path.
        h = _proj(self.use_residual, self.hidden_dim // 2, 0.2,
                  initial_fusion, "classifier_0", self.grad_mode)(fused_routed)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(0.2)(h, deterministic=deterministic)
        quant_logits = _proj(self.use_residual, self.num_classes, 0.2,
                             initial_fusion, "classifier_3",
                             self.grad_mode)(h)

        # Full-precision path.
        f = nn.Dense(self.hidden_dim // 2, name="full_classifier_0")(fused)
        f = nn.gelu(f, approximate=False)
        f = nn.Dropout(0.2)(f, deterministic=deterministic)
        full_logits = nn.Dense(self.num_classes,
                               name="full_classifier_3")(f)

        mix_ratio = self.param(
            "mix_ratio", lambda _k, s: jnp.full(s, 0.8, jnp.float32), ()
        )
        mix = nn.sigmoid(mix_ratio)
        return mix * quant_logits + (1.0 - mix) * full_logits


# Alias for backward compatibility (multimodal_classifier.py:560-562).
MultimodalATQ = ATQMultimodalClassifier
