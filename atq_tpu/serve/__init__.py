from atq_tpu.serve.aot import AOTServing, export_serving, load_serving
from atq_tpu.serve.engine import BatchServer, pad_to_bucket, pick_bucket
from atq_tpu.serve.index import EmbeddingIndex
from atq_tpu.serve.packed_model import (
    pack_quantized_params,
    packed_linear_apply,
    PackedClassifier,
)

__all__ = [
    "AOTServing",
    "export_serving",
    "load_serving",
    "BatchServer",
    "EmbeddingIndex",
    "pad_to_bucket",
    "pick_bucket",
    "pack_quantized_params",
    "packed_linear_apply",
    "PackedClassifier",
]
