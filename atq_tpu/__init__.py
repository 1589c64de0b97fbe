"""ATQ-TPU: a TPU-native JAX framework for Adaptive Ternary Quantization.

A ground-up rebuild of the capabilities of the ATQ-Multimodal reference
(image classification + image-text retrieval with adaptive ternary
quantization), designed TPU-first:

- the quantizer is a pure JAX function whose threshold selection runs
  on-device at fixed shapes (reference: atq/quantizers.py:7-60),
- ternary/RPB linear layers are Flax modules whose quantize-dequantize
  fuses into the matmul under XLA, with a Pallas kernel path that computes
  the matmul directly from 2-bit packed weight planes
  (reference: atq/bit_packing.py:148-176 "would need native implementation"),
- data parallelism / tensor parallelism are first-class via
  jax.sharding.Mesh + shard_map (absent in the reference),
- checkpointing uses Orbax with reference-compatible logical keys.
"""

__version__ = "0.1.0"

from atq_tpu.core.quantize import adaptive_ternary_quantization
from atq_tpu.nn.layers import (
    TernaryLinear,
    ResidualPrecisionBoostLinear,
    SelectiveGradientRouting,
    apply_selective_routing,
    selective_gradient_routing,
)

__all__ = [
    "adaptive_ternary_quantization",
    "TernaryLinear",
    "ResidualPrecisionBoostLinear",
    "apply_selective_routing",
    "selective_gradient_routing",
    "SelectiveGradientRouting",
]
