from atq_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
    fsdp_spec,
    shard_state_fsdp,
    shard_state_tp,
    shard_tree_tp,
    init_distributed,
)
from atq_tpu.parallel.multihost import (
    global_batch_from_local,
    process_batch_slice,
)
from atq_tpu.parallel.collectives import (
    all_gather_embeddings,
    psum_grads,
)
from atq_tpu.parallel.moe import (
    init_moe_params,
    moe_ffn,
    moe_ffn_sharded,
    top1_dispatch,
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
    "fsdp_spec",
    "shard_state_fsdp",
    "shard_state_tp",
    "shard_tree_tp",
    "init_distributed",
    "global_batch_from_local",
    "process_batch_slice",
    "all_gather_embeddings",
    "psum_grads",
    "pipeline_apply",
    "split_microbatches",
    "merge_microbatches",
    "stack_stage_params",
    "init_moe_params",
    "moe_ffn",
    "moe_ffn_sharded",
    "top1_dispatch",
]
