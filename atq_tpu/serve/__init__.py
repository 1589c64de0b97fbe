from atq_tpu.serve.packed_model import (
    pack_quantized_params,
    packed_linear_apply,
    PackedClassifier,
)

__all__ = [
    "pack_quantized_params",
    "packed_linear_apply",
    "PackedClassifier",
]
