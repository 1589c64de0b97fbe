"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

Framework capability beyond the reference (SURVEY.md §2.6 records PP as
absent there — single-device `cpu|cuda|mps` only). The parity path never
needs it; it exists so deep ternary stacks (e.g. N x TernaryTransformerLayer,
`atq_tpu/nn/transformer.py`) can span chips when a model outgrows one HBM.

Design (the standard JAX/TPU pattern): each device along the ``pipe`` mesh
axis owns one stage's parameters. Inside ``shard_map`` the schedule is a
``lax.scan`` over ``n_micro + n_stages - 1`` ticks; on every tick each
stage applies its layer to the activation it holds, then the activations
rotate one hop along the ring with ``jax.lax.ppermute`` (one (mb, ...)
block per tick riding ICI). Stage 0 feeds a fresh microbatch each tick;
the last stage banks its output. Bubble fraction is the usual
``(n_stages - 1) / (n_micro + n_stages - 1)`` — pick ``n_micro >> n_stages``.

The whole schedule is differentiable (scan + ppermute have transposes), so
the same function serves forward-only serving and end-to-end training; XLA
inserts the reverse-direction ppermutes for the backward pass.

Constraints: every stage must map ``(mb, ...) -> (mb, ...)`` with one fixed
activation shape (true of transformer blocks); per-stage parameters are
stacked on a leading ``n_stages`` axis and sharded over the pipe axis.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def split_microbatches(batch, n_micro: int):
    """Reshape every leaf's leading batch axis (B, ...) -> (n_micro, B/n_micro, ...)."""
    def split(x):
        b = x.shape[0]
        if b % n_micro:
            raise ValueError(f"batch {b} not divisible by n_micro {n_micro}")
        return x.reshape(n_micro, b // n_micro, *x.shape[1:])

    return jax.tree_util.tree_map(split, batch)


def merge_microbatches(batch):
    """Inverse of :func:`split_microbatches`."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape(x.shape[0] * x.shape[1], *x.shape[2:]), batch
    )


def stack_stage_params(param_list):
    """Stack per-stage parameter pytrees on a new leading (stage) axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *param_list)


def pipeline_apply(stage_fn: Callable[[Any, jax.Array], jax.Array],
                   stage_params, x, *, mesh: Mesh, n_micro: int,
                   axis: str = "pipe") -> jax.Array:
    """Run ``x`` through ``n_stages`` chained stages, pipelined over ``axis``.

    Args:
        stage_fn: ``(params_for_one_stage, activation) -> activation``; the
            same callable for every stage (different params per stage).
        stage_params: pytree whose leaves have leading axis ``n_stages``
            (see :func:`stack_stage_params`); sharded over ``axis``.
        x: global input batch ``(B, ...)``; split into ``n_micro``
            microbatches internally.
        mesh: mesh containing ``axis`` with size ``n_stages``.
        n_micro: number of microbatches (B must divide evenly).

    Returns:
        ``(B, ...)`` output of the final stage.
    """
    n_stages = mesh.shape[axis]
    xs = split_microbatches(x, n_micro)

    param_specs = jax.tree_util.tree_map(lambda _: P(axis), stage_params)

    @partial(shard_map, mesh=mesh, in_specs=(param_specs, P()),
             out_specs=P(axis), check_vma=False)
    def schedule(params, xs):
        # params leaves arrive with leading axis 1 (this stage's slice).
        params = jax.tree_util.tree_map(lambda p: p[0], params)
        stage = jax.lax.axis_index(axis)
        mb_shape = xs.shape[1:]
        fwd_perm = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(carry, t):
            buf, outs = carry
            # Stage 0 ingests microbatch t (clamped; masked-out ticks feed
            # garbage that never reaches a banked output slot).
            feed = xs[jnp.clip(t, 0, n_micro - 1)]
            inp = jnp.where(stage == 0, feed, buf)
            out = stage_fn(params, inp)
            # Bank the last stage's result for microbatch t-(n_stages-1).
            slot = t - (n_stages - 1)
            valid = (slot >= 0) & (slot < n_micro)
            outs = jax.lax.cond(
                valid,
                lambda o: o.at[jnp.clip(slot, 0, n_micro - 1)].set(out),
                lambda o: o,
                outs,
            )
            # Rotate activations one hop down the pipeline.
            buf = jax.lax.ppermute(out, axis, fwd_perm)
            return (buf, outs), None

        init = (jnp.zeros(mb_shape, xs.dtype),
                jnp.zeros((n_micro,) + mb_shape, xs.dtype))
        (_, outs), _ = jax.lax.scan(tick, init,
                                    jnp.arange(n_micro + n_stages - 1))
        # out_specs=P(axis): each stage contributes a leading slice; only
        # the last stage's slice holds the real outputs.
        return outs[None]

    outs = schedule(stage_params, xs)   # (n_stages, n_micro, mb, ...)
    return merge_microbatches(outs[-1])
