"""Image-text retrieval model (Flax).

- :class:`ImageEncoder`          <- /root/reference/models/multimodal_classifier.py:12-99
- :class:`ATQMultimodalRetrieval` <- /root/reference/models/multimodal_classifier.py:102-319

The flagship model of the framework: FP ResNet backbone + RPB projector on
the vision side, ternary transformer text encoder, cross-attention fusion,
RPB joint-space projectors, learnable temperature.

Module names mirror the reference ('image_encoder', 'text_encoder',
'text_projector', ...) so the mixed-precision keyword heuristics
(core/schedules.py) classify layers identically — including the quirky
"'vision' iff 'image' in name" rule.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from atq_tpu.models.fusion import MultimodalFusion, l2_normalize
from atq_tpu.models.resnet import FEATURE_DIMS  # noqa: F401 (public re-export)
from atq_tpu.models.text_encoder import ATQTextEncoder
from atq_tpu.nn.attention import _norm, _proj


class ImageEncoder(nn.Module):
    """FP ResNet backbone -> LayerNorm -> RPB projector -> GELU -> LN ->
    clamped scaling -> L2 normalize (reference multimodal_classifier.py:77-99)."""

    embed_dim: int = 256
    use_rpb: bool = True
    sparsity_target: float = 0.3
    base_model: str = "resnet18"
    grad_mode: str = "parity"
    dtype: Optional[jnp.dtype] = None  # matmul/conv compute dtype (AMP)

    @nn.compact
    def __call__(self, x, train: bool = False):
        initial_sparsity = min(0.1, self.sparsity_target)
        from atq_tpu.models.resnet import BasicBlock, Bottleneck, ResNetFeatures

        if self.base_model == "resnet18":
            backbone = ResNetFeatures(stage_sizes=(2, 2, 2, 2),
                                      block=BasicBlock, dtype=self.dtype,
                                      name="base_model")
        elif self.base_model == "resnet50":
            backbone = ResNetFeatures(stage_sizes=(3, 4, 6, 3),
                                      block=Bottleneck, dtype=self.dtype,
                                      name="base_model")
        else:
            raise ValueError(f"Unknown base model: {self.base_model}")
        features = backbone(x, train=train)
        features = _norm(name="feature_norm")(features)

        embeddings = _proj(self.use_rpb, self.embed_dim, 0.2,
                           initial_sparsity, "projector",
                           self.grad_mode, self.dtype)(features)
        embeddings = nn.gelu(embeddings, approximate=False)
        embeddings = _norm(name="proj_norm")(embeddings)

        scaling = self.param(
            "scaling", lambda _k, s: jnp.full(s, 4.0, jnp.float32), (1,)
        )
        embeddings = embeddings * jnp.clip(scaling, 1.0, 10.0)
        return l2_normalize(embeddings, axis=1)


class ATQMultimodalRetrieval(nn.Module):
    """Joint image-text embedding model for retrieval.

    forward modes (reference multimodal_classifier.py:228-267):
      - return_embeddings=True -> (image_embeddings, text_embeddings)
      - return_fused=True      -> fused cross-modal embedding
      - default                -> similarity matrix img @ txt.T / temperature
        (with the extra image_projector + LayerNorm + L2 on the image side)
    """

    vocab_size: int = 10000
    embed_dim: int = 256
    hidden_dim: int = 512
    vision_threshold: float = 0.3
    text_threshold: float = 0.2
    use_residual: bool = True
    base_model: str = "resnet18"
    grad_mode: str = "parity"
    text_moe_experts: int = 0  # >0: ternary-expert MoE FFN in the text
    # encoder layers (EP capability; 0 = reference-parity dense FFN)
    text_scan_layers: bool = False  # build the text stack with nn.scan
    # (ScannedTernaryStack: depth-independent program + remat with the
    # threshold-saving policy — the production choice for deep stacks;
    # off the parity path, params live under layers/scan/layer)
    text_attn_impl: str = "einsum"  # 'fused' = the single-block Pallas
    # attention kernel (ops/fused_attention.py); identical math, faster
    # at training shapes. Off the parity path by default.
    max_seq_length: int = 50
    dropout: float = 0.1  # reference hard-codes 0.1 throughout; exposed
    # so deterministic comparisons (trajectory parity) can zero it
    compute_dtype: Optional[jnp.dtype] = None  # AMP: matmul/conv compute
    # dtype with torch-autocast semantics — latent weights, quantizer
    # thresholds, LayerNorm/BatchNorm/softmax stay f32; effective weights
    # and activations cast at the matmul/conv (--use_amp sets bfloat16)

    def setup(self):
        initial_vision = min(0.1, self.vision_threshold)
        initial_text = min(0.1, self.text_threshold)
        self.image_encoder = ImageEncoder(
            embed_dim=self.embed_dim, use_rpb=self.use_residual,
            sparsity_target=initial_vision, base_model=self.base_model,
            grad_mode=self.grad_mode, dtype=self.compute_dtype,
        )
        self.text_encoder = ATQTextEncoder(
            vocab_size=self.vocab_size, embed_dim=self.embed_dim,
            num_heads=8, num_layers=4, dim_feedforward=self.hidden_dim,
            use_rpb=self.use_residual, sparsity_target=initial_text,
            max_seq_length=self.max_seq_length, grad_mode=self.grad_mode,
            moe_experts=self.text_moe_experts, dropout=self.dropout,
            scan_layers=self.text_scan_layers,
            attn_impl=self.text_attn_impl,
            dtype=self.compute_dtype,
        )
        self.fusion = MultimodalFusion(
            input_dims={"image": self.embed_dim, "text": self.embed_dim},
            output_dim=self.embed_dim, fusion_method="cross_attention",
            num_heads=4, use_rpb=self.use_residual, grad_mode=self.grad_mode,
            dropout=self.dropout, dtype=self.compute_dtype,
        )
        self.text_projector = _proj(self.use_residual, self.embed_dim, 0.2,
                                    initial_text, "text_projector",
                                    self.grad_mode, self.compute_dtype)
        self.image_projector = _proj(self.use_residual, self.embed_dim, 0.2,
                                     initial_vision, "image_projector",
                                     self.grad_mode, self.compute_dtype)
        self.img_norm = _norm()
        self.text_norm = _norm()
        # Learnable temperature init 0.07 (multimodal_classifier.py:170-171).
        self.temperature = self.param(
            "temperature", lambda _k, s: jnp.full(s, 0.07, jnp.float32), ()
        )

    def encode_image(self, image, train: bool = False):
        return self.image_encoder(image, train=train)

    def encode_text(self, text, text_lengths=None,
                    deterministic: bool = True):
        text_features = self.text_encoder(text, text_lengths,
                                          deterministic=deterministic)
        text_embeddings = self.text_projector(text_features)
        text_embeddings = self.text_norm(text_embeddings)
        return l2_normalize(text_embeddings, axis=1)

    def __call__(self, image, text, text_lengths=None,
                 return_embeddings: bool = False, return_fused: bool = False,
                 train: bool = False):
        deterministic = not train
        image_embeddings = self.encode_image(image, train=train)
        text_embeddings = self.encode_text(text, text_lengths,
                                           deterministic=deterministic)

        if self.is_initializing():
            # Touch every branch once so a single init() creates the full
            # parameter tree (fusion + image projector are on different
            # forward modes).
            self.fusion({"image": image_embeddings, "text": text_embeddings},
                        deterministic=True)
            self.img_norm(self.image_projector(image_embeddings))

        if return_embeddings:
            return image_embeddings, text_embeddings

        if return_fused:
            return self.fusion(
                {"image": image_embeddings, "text": text_embeddings},
                deterministic=deterministic,
            )

        image_embeddings = self.image_projector(image_embeddings)
        image_embeddings = self.img_norm(image_embeddings)
        image_embeddings = l2_normalize(image_embeddings, axis=1)

        return (jnp.matmul(image_embeddings, text_embeddings.T)
                / self.temperature)


def get_model_size_info(params: dict, use_rpb: bool = True) -> dict:
    """Parameter counts per component + estimated ternarized memory
    (reference multimodal_classifier.py:269-305: assumes 75% of parameters
    ternarizable at 2 bits with RPB, 90% without)."""
    import jax

    def count(tree):
        return sum(x.size for x in jax.tree_util.tree_leaves(tree))

    components = {
        "image_encoder": params.get("image_encoder", {}),
        "text_encoder": params.get("text_encoder", {}),
        "text_projector": params.get("text_projector", {}),
        "image_projector": params.get("image_projector", {}),
        "fusion": params.get("fusion", {}),
    }
    counts = {f"{k}_parameters": count(v) for k, v in components.items()}
    total = sum(counts.values())
    if use_rpb:
        memory_bytes = total * 0.75 * 2 / 8 + total * 0.25 * 4
    else:
        memory_bytes = total * 0.9 * 2 / 8 + total * 0.1 * 4
    return {
        "total_parameters": total,
        **counts,
        "estimated_memory_usage_MB": memory_bytes / (1024 * 1024),
    }


def modality_dropout_flags(rng_key, rate: float = 0.1):
    """Roll per-batch modality-drop decisions (reference
    multimodal_classifier.py:307-319). NOTE: in the reference retrieval
    model these flags are set but never consumed by forward — a quirk we
    document rather than silently 'fix'; the legacy classifier does use
    them."""
    import jax

    k1, k2 = jax.random.split(rng_key)
    return (jax.random.uniform(k1) < rate, jax.random.uniform(k2) < rate)
