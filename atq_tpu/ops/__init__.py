from atq_tpu.ops.fast_pool import fast_max_pool
from atq_tpu.ops.ternary_matmul import (
    packed_ternary_matmul,
    pallas_eligible,
)

__all__ = ["fast_max_pool", "packed_ternary_matmul", "pallas_eligible"]
