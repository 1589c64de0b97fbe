from atq_tpu.nn.layers import (
    TernaryLinear,
    ResidualPrecisionBoostLinear,
    apply_selective_routing,
    selective_gradient_routing,
)
from atq_tpu.nn.attention import (
    TernaryMultiheadAttention,
    TernaryCrossAttention,
)
from atq_tpu.nn.transformer import TernaryTransformerLayer

__all__ = [
    "TernaryLinear",
    "ResidualPrecisionBoostLinear",
    "apply_selective_routing",
    "selective_gradient_routing",
    "TernaryMultiheadAttention",
    "TernaryCrossAttention",
    "TernaryTransformerLayer",
]
