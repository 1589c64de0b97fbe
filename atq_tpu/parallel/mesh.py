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


# Layers whose out-features axis shards over 'model' by default: the
# transformer FFN projections, attention q/k/v/out, and the wide
# embedding projectors — the bulk of the quantized-matmul FLOPs.
# (GSPMD re-shards activations around the head reshape in attention; the
# step function itself never changes.)
DEFAULT_TP_LAYERS = (
    "linear1", "linear2",
    "q_proj", "k_proj", "v_proj", "out_proj",
    "projector", "image_projector", "text_projector", "final_fusion",
)


def tp_spec(path_keys, leaf, tp: int,
            layer_names=DEFAULT_TP_LAYERS) -> P:
    """PartitionSpec for one param/quant leaf under tensor parallelism:
    2-D weights (and their precision masks) of the named layers shard
    their out-features axis over 'model'; everything else replicates.
    Scanned stacks (ScannedTernaryStack) carry a leading layer axis —
    their (L, out, in) weights shard the same out-features dim."""
    if (tp > 1 and str(path_keys[-1]) in ("weight", "precision_mask")
            and any(nm in path_keys for nm in layer_names)):
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 2 and leaf.shape[0] % tp == 0:
            return P("model", None)
        if ndim == 3 and "scan" in path_keys and leaf.shape[1] % tp == 0:
            return P(None, "model", None)
    return P()


def shard_tree_tp(tree, mesh: Mesh, tp: int,
                  layer_names=DEFAULT_TP_LAYERS):
    """Place a params-like pytree with :func:`tp_spec` per leaf. Returns
    (placed_tree, set of sharded leaf shapes)."""
    sharded_shapes = set()

    def place(path, leaf):
        keys = [str(getattr(p, "key", p)) for p in path]
        spec = tp_spec(keys, leaf, tp, layer_names)
        if spec != P():
            sharded_shapes.add(tuple(leaf.shape))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    placed = jax.tree_util.tree_map_with_path(place, tree)
    return placed, sharded_shapes


def fsdp_spec(leaf, dp: int, min_size: int = 16384,
              existing: P = None) -> P:
    """ZeRO-3-style spec for one state leaf: the largest dp-divisible
    axis of a large leaf shards over 'data'; small leaves (below
    ``min_size`` elements) replicate — the all-gather latency isn't worth
    saving a few KB. ``existing`` composes with a tensor-parallel spec:
    dimensions already taken by 'model' are skipped and 'data' goes on a
    free divisible one, giving 2-D ('model', 'data') weight sharding."""
    shape = tuple(getattr(leaf, "shape", ()) or ())
    if dp <= 1 or not shape:
        return existing if existing is not None else P()
    if int(np.prod(shape)) < min_size:
        return existing if existing is not None else P()
    taken = tuple(existing) if existing is not None else ()
    taken = taken + (None,) * (len(shape) - len(taken))
    best = -1
    for i, d in enumerate(shape):
        if taken[i] is None and d % dp == 0 and (
                best < 0 or d > shape[best]):
            best = i
    if best < 0:
        return existing if existing is not None else P()
    spec = list(taken)
    spec[best] = "data"
    return P(*spec)


def shard_state_fsdp(state: dict, mesh: Mesh, *, tp: int = 1,
                     layer_names=DEFAULT_TP_LAYERS,
                     min_size: int = 16384,
                     param_keys=("params", "quant", "ema_params")) -> dict:
    """Fully-sharded-data-parallel placement of a training-state dict
    (ZeRO stage 3): every large leaf — weights, precision masks, adam
    moments, EMA copies — shards over the 'data' axis, so per-device
    state memory scales ~1/dp. The jitted step is unchanged: GSPMD
    all-gathers each layer's weights for its forward/backward use and
    reduce-scatters the gradients, which is exactly the FSDP schedule.

    With ``tp > 1`` the placement composes with :func:`tp_spec`: a
    tp-matched 2-D weight becomes P('model', 'data') when its in-features
    axis is dp-divisible. Optimizer-state leaves (no stable key paths
    inside optax wrapper types) are placed by shape match against the
    param placements, like :func:`shard_state_tp`."""
    dp = mesh.shape["data"]

    if tp <= 1:
        # Pure FSDP: the spec depends only on the leaf, so one rule
        # places params, masks, optimizer moments, and EMA consistently.
        def place(leaf):
            spec = fsdp_spec(leaf, dp, min_size)
            return jax.device_put(leaf, NamedSharding(mesh, spec))

        return jax.tree_util.tree_map(place, state)

    # tp + fsdp composition: params by path rule, optimizer state by
    # shape match (same approach as shard_state_tp).
    shape_spec = {}

    def place_param(path, leaf):
        keys = [str(getattr(p, "key", p)) for p in path]
        base = tp_spec(keys, leaf, tp, layer_names)
        spec = fsdp_spec(leaf, dp, min_size,
                         existing=base if base != P() else None)
        if spec != P():
            shape_spec.setdefault(tuple(leaf.shape), spec)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    out = {}
    for key in param_keys:
        if key in state:
            out[key] = jax.tree_util.tree_map_with_path(
                place_param, state[key])

    def place_by_shape(leaf):
        spec = shape_spec.get(tuple(getattr(leaf, "shape", ()) or ()))
        if spec is None:
            spec = fsdp_spec(leaf, dp, min_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    for key, value in state.items():
        if key not in out:
            out[key] = jax.tree_util.tree_map(place_by_shape, value)
    return out


def shard_state_tp(state: dict, mesh: Mesh, tp: int,
                   layer_names=DEFAULT_TP_LAYERS,
                   param_keys=("params", "quant", "ema_params")) -> dict:
    """Tensor-parallel placement of a full training-state dict.

    params / quant / ema_params shard by path rule (:func:`tp_spec`);
    optimizer-state leaves (adam moments mirror param shapes inside optax
    wrapper types, so no stable key paths) shard by SHAPE match against
    the sharded params; everything else replicates. With these input
    shardings GSPMD partitions the projections' matmuls over 'model' and
    inserts the activation collectives — the step function itself is
    unchanged.
    """
    out = {}
    shapes = set()
    for key in param_keys:
        if key in state:
            out[key], s = shard_tree_tp(state[key], mesh, tp, layer_names)
            shapes |= s

    def place_by_shape(leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 2 and tuple(leaf.shape) in shapes:
            return jax.device_put(leaf, NamedSharding(mesh,
                                                      P("model", None)))
        if ndim == 3 and tuple(leaf.shape) in shapes:
            # scanned-stack (L, out, in) weights — moments match on the
            # same shape and shard the same out-features dim.
            return jax.device_put(
                leaf, NamedSharding(mesh, P(None, "model", None)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    for key, value in state.items():
        if key not in out:
            out[key] = jax.tree_util.tree_map(place_by_shape, value)
    return out
