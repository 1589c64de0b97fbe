from atq_tpu.utils.metrics import (
    count_parameters,
    measure_model_memory,
    measure_inference_time,
    estimate_flops,
    accuracy,
    confusion_matrix,
)
from atq_tpu.utils.platform import apply_platform_env
from atq_tpu.utils.visualization import (
    compare_model_efficiency,
    plot_weight_distribution,
    visualize_ternary_weights,
)

__all__ = [
    "count_parameters",
    "measure_model_memory",
    "measure_inference_time",
    "estimate_flops",
    "accuracy",
    "confusion_matrix",
    "apply_platform_env",
    "plot_weight_distribution",
    "visualize_ternary_weights",
    "compare_model_efficiency",
]
