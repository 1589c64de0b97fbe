"""Fashion-MNIST / MNIST image classifier with ATQ classifier head.

Reference: /root/reference/models/image_classifier.py:8-64.

Architecture: a full-precision CNN feature stack
Conv(1->32, 3x3, pad 1) + BN + ReLU + MaxPool(2) twice, flatten to
64 * 7 * 7 = 3136 features, identity selective routing, then a quantized
2-layer classifier head (RPB precision 0.05 / 0.1, or TernaryLinear).

TPU-native notes:
- NHWC layout (channels-last) — the native TPU convolution layout; the
  flattened feature order is therefore (H, W, C) rather than torch's
  (C, H, W). Torch-checkpoint converters must permute the first classifier
  weight accordingly (see atq_tpu/utils/torch_interop.py).
- BatchNorm uses torch semantics: momentum 0.1 (flax momentum=0.9),
  eps 1e-5.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from atq_tpu.nn.layers import (
    ResidualPrecisionBoostLinear,
    TernaryLinear,
    apply_selective_routing,
)


class _ConvFeatures(nn.Module):
    """The FP CNN feature stack (reference image_classifier.py:19-32)."""

    input_channels: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, C) NHWC
        x = nn.Conv(32, (3, 3), padding=1, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(64, (3, 3), padding=1, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x.reshape(x.shape[0], -1)  # (B, 7*7*64) for 28x28 inputs


class ATQImageClassifier(nn.Module):
    num_classes: int = 10
    input_channels: int = 1
    use_rpb: bool = True
    sparsity_target: float = 0.3
    hidden_size: int = 128
    grad_mode: str = "parity"
    dropout_rate: float = 0.3
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = _ConvFeatures(self.input_channels, name="features")(
            x, train=train
        )
        features = apply_selective_routing(features, threshold=0.05,
                                           importance_factor=0.7)
        return self._classify(features, train)

    def _classify(self, features, train: bool):
        if self.use_rpb:
            h = ResidualPrecisionBoostLinear(
                features=self.hidden_size, precision_ratio=0.05,
                sparsity_target=self.sparsity_target,
                grad_mode=self.grad_mode, dtype=self.compute_dtype,
                name="classifier_0",
            )(features)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=not train)
            out = ResidualPrecisionBoostLinear(
                features=self.num_classes, precision_ratio=0.1,
                sparsity_target=self.sparsity_target,
                grad_mode=self.grad_mode, dtype=self.compute_dtype,
                name="classifier_3",
            )(h)
        else:
            h = TernaryLinear(features=self.hidden_size,
                              grad_mode=self.grad_mode,
                              dtype=self.compute_dtype, name="classifier_0")(
                features)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=not train)
            out = TernaryLinear(features=self.num_classes,
                                grad_mode=self.grad_mode,
                                dtype=self.compute_dtype,
                                name="classifier_3")(h)
        return out

    def extract_features(self, x, train: bool = False):
        """Feature stack only (reference image_classifier.py:63-64) — used by
        the legacy multimodal classifier."""
        return _ConvFeatures(self.input_channels, name="features")(
            x, train=train
        )


class BaselineCNNClassifier(nn.Module):
    """Full-precision co-trained teacher with identical architecture
    (reference train.py:42-59) — the accuracy oracle for distillation."""

    num_classes: int = 10
    input_channels: int = 1
    hidden_size: int = 128
    dropout_rate: float = 0.3

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = _ConvFeatures(self.input_channels, name="features")(
            x, train=train
        )
        h = nn.Dense(self.hidden_size, name="fc1")(features)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=not train)
        return nn.Dense(self.num_classes, name="fc2")(h)
