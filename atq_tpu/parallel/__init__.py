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

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_sharding",
    "all_gather_embeddings",
    "psum_grads",
]
