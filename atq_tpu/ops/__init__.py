from atq_tpu.ops.ternary_matmul import (
    packed_ternary_matmul,
    pallas_eligible,
)

__all__ = ["packed_ternary_matmul", "pallas_eligible"]
