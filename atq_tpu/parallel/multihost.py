"""Multi-host input pipeline utilities.

On a multi-host TPU slice every process sees only its local devices;
the global batch must be assembled from per-process shards without any
host ever materializing the whole thing. The pattern (scaling-book
recipe): each host's data loader yields ONLY the rows its devices own,
and ``jax.make_array_from_process_local_data`` stitches them into one
global ``jax.Array`` sharded over the 'data' mesh axis — no cross-host
data movement, the arrays land directly on the local devices.

Single-process (including the virtual CPU mesh used in tests), this
degrades to exactly ``shard_batch``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_batch_slice(global_batch_size: int) -> Tuple[int, int]:
    """``[start, end)`` rows of the global batch THIS process should
    load. Deterministic round-robin by process index; raises when the
    batch doesn't divide evenly (a silently uneven split would skew the
    contrastive negative pool per host)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"process count {n}")
    per = global_batch_size // n
    start = jax.process_index() * per
    return start, start + per


def global_batch_from_local(local_batch, mesh: Mesh, axis: str = "data"):
    """Assemble a global, ``axis``-sharded batch pytree from per-process
    local arrays (each process passes only its own rows, e.g. the
    :func:`process_batch_slice` range of its loader).

    Returns jax.Arrays whose global shape is ``process_count *
    local_rows`` on the leading dim; under ``jit`` they behave exactly
    like a :func:`atq_tpu.parallel.mesh.shard_batch` batch, so the same
    train step serves single- and multi-host runs."""
    def place(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(place, local_batch)
