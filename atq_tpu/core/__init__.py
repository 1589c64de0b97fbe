from atq_tpu.core.quantize import adaptive_ternary_quantization, ternarize_ste
from atq_tpu.core.packing import TernaryBitPacking
from atq_tpu.core.schedules import (
    GradualQuantizationScheduler,
    MixedPrecisionATQ,
)

__all__ = [
    "adaptive_ternary_quantization",
    "ternarize_ste",
    "TernaryBitPacking",
    "GradualQuantizationScheduler",
    "MixedPrecisionATQ",
]
