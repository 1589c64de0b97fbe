"""Device mesh + sharding utilities (the distributed layer the reference
does not have — SURVEY.md §2.6).

Design: a 2-D ('data', 'model') mesh. Data parallelism shards the batch over
'data'; parameters are replicated (these models are small — tens of MB) and
XLA's GSPMD inserts the gradient psum automatically when a jitted step
consumes a 'data'-sharded batch with replicated params. Tensor parallelism
over 'model' is provided as a capability for TernaryLinear out-features
(off by default, matching SURVEY.md §2.6 "keep as capability").

Multi-host: call :func:`init_distributed` first (jax.distributed); the same
code then spans hosts, with collectives riding ICI within a slice and DCN
across slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(**kwargs):
    """Initialize jax.distributed for multi-host execution. No-op if
    already initialized or single-process."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices.

    dp defaults to n_devices // tp. On one chip this is a trivial 1x1 mesh —
    the same jitted step runs unchanged from 1 chip to a full slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != device count {n}")
    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; all others replicated."""
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def shard_batch(batch, mesh: Mesh):
    """Place every array in a batch pytree with its leading axis sharded
    over the 'data' mesh axis."""
    def place(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))

    return jax.tree_util.tree_map(place, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
