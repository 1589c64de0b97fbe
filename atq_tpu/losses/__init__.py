from atq_tpu.losses.contrastive import (
    HardNegativeMiningInfoNCE,
    MultiPositiveInfoNCE,
    ContrastiveLearningManager,
)

__all__ = [
    "HardNegativeMiningInfoNCE",
    "MultiPositiveInfoNCE",
    "ContrastiveLearningManager",
]
