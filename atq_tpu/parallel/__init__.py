from atq_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
)
from atq_tpu.parallel.collectives import (
    all_gather_embeddings,
    psum_grads,
)
from atq_tpu.parallel.pipeline import (
    pipeline_apply,
    split_microbatches,
    merge_microbatches,
    stack_stage_params,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_sharding",
    "all_gather_embeddings",
    "psum_grads",
    "pipeline_apply",
    "split_microbatches",
    "merge_microbatches",
    "stack_stage_params",
]
