from atq_tpu.nn.layers import (
    TernaryLinear,
    ResidualPrecisionBoostLinear,
    apply_selective_routing,
    selective_gradient_routing,
    quantized_weight_policy,
    quantized_weight_and_dots_policy,
)
from atq_tpu.nn.attention import (
    TernaryMultiheadAttention,
    TernaryCrossAttention,
)
from atq_tpu.nn.transformer import (
    ScannedTernaryStack,
    TernaryTransformerLayer,
    stack_layer_params,
    unstack_layer_params,
)

__all__ = [
    "TernaryLinear",
    "ResidualPrecisionBoostLinear",
    "apply_selective_routing",
    "selective_gradient_routing",
    "quantized_weight_policy",
    "quantized_weight_and_dots_policy",
    "TernaryMultiheadAttention",
    "TernaryCrossAttention",
    "ScannedTernaryStack",
    "TernaryTransformerLayer",
    "stack_layer_params",
    "unstack_layer_params",
]
