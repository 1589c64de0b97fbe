"""Max pooling with a dense, fusion-friendly backward pass.

XLA derives max-pool's gradient as ``select-and-scatter``, which the
round-3 profile of the retrieval step (benchmarks/mfu_profile_join.json)
measured as the single largest op on the chip: 0.80 ms/step, 5.9% of
device time, for the one 3x3/s2 stem pool of the ResNet trunk
(reference architecture: /root/reference/models/multimodal_classifier.py:28-39
via torchvision resnet18 — conv1/bn1/relu/maxpool stem).

``fast_max_pool`` keeps the forward bit-identical (``lax.reduce_window``
max, exactly what ``flax.linen.max_pool`` emits) but replaces the
backward with W*H strided masked adds: for every window offset the
input slice that landed at that offset is compared against the pooled
maxima and the cotangent is routed to the positions that match. These
are plain elementwise compares/multiplies and strided in-place adds —
all fusable, no select-and-scatter.

Semantics difference (why this is off the parity path): when a window
has TIED maxima, torch and XLA route the whole cotangent to the first
tied element; this backward splits it equally among the tied elements
(``g / tie_count``). Both are valid subgradients and the gradient sum
is preserved, but post-ReLU feature maps tie at 0 frequently, so
parity-mode training keeps the XLA backward. Enable with
``ATQ_FAST_POOL=1`` (read at trace time) or by calling
``fast_max_pool`` directly.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

Pad2 = Tuple[Tuple[int, int], Tuple[int, int]]


def _reduce_max(x: jax.Array, window: Tuple[int, int],
                strides: Tuple[int, int], padding: Pad2) -> jax.Array:
    dims = (1, window[0], window[1], 1)
    strd = (1, strides[0], strides[1], 1)
    pads = ((0, 0), padding[0], padding[1], (0, 0))
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strd, pads)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fast_max_pool(x: jax.Array, window: Tuple[int, int] = (3, 3),
                  strides: Tuple[int, int] = (2, 2),
                  padding: Pad2 = ((1, 1), (1, 1))) -> jax.Array:
    """NHWC max pool; forward == ``flax.linen.max_pool``, dense backward."""
    return _reduce_max(x, window, strides, padding)


def _fwd(x, window, strides, padding):
    y = _reduce_max(x, window, strides, padding)
    return y, (x, y)


def _offset_slice(xp: jax.Array, di: int, dj: int,
                  strides: Tuple[int, int], out_hw: Tuple[int, int]):
    """Elements of padded input xp seen at window offset (di, dj)."""
    ho, wo = out_hw
    return lax.slice(
        xp, (0, di, dj, 0),
        (xp.shape[0], di + strides[0] * (ho - 1) + 1,
         dj + strides[1] * (wo - 1) + 1, xp.shape[3]),
        (1, strides[0], strides[1], 1))


def _bwd(window, strides, padding, res, g):
    x, y = res
    ho, wo = y.shape[1], y.shape[2]
    xp = jnp.pad(x, ((0, 0), padding[0], padding[1], (0, 0)),
                 constant_values=-jnp.inf)

    # Tie count per window, then route g / ties to every tied position.
    ties = None
    for di in range(window[0]):
        for dj in range(window[1]):
            eq = (_offset_slice(xp, di, dj, strides, (ho, wo)) == y)
            ties = eq.astype(g.dtype) if ties is None \
                else ties + eq.astype(g.dtype)
    gsplit = g / ties

    gp = jnp.zeros(xp.shape, g.dtype)
    for di in range(window[0]):
        for dj in range(window[1]):
            eq = (_offset_slice(xp, di, dj, strides, (ho, wo)) == y)
            contrib = jnp.where(eq, gsplit, jnp.zeros((), g.dtype))
            gp = gp.at[:,
                       di:di + strides[0] * (ho - 1) + 1:strides[0],
                       dj:dj + strides[1] * (wo - 1) + 1:strides[1],
                       :].add(contrib)
    gx = lax.slice(
        gp, (0, padding[0][0], padding[1][0], 0),
        (gp.shape[0], padding[0][0] + x.shape[1],
         padding[1][0] + x.shape[2], gp.shape[3]))
    return (gx.astype(x.dtype),)


fast_max_pool.defvjp(_fwd, _bwd)


def max_pool(x: jax.Array, window: Tuple[int, int] = (3, 3),
             strides: Tuple[int, int] = (2, 2),
             padding: Pad2 = ((1, 1), (1, 1))) -> jax.Array:
    """Dispatch: XLA backward (parity default) or the dense fast backward.

    ``ATQ_FAST_POOL=1`` flips the backward for every caller; the
    environment variable is read at trace time, so set it before the
    first jit of the model.
    """
    if os.environ.get("ATQ_FAST_POOL", "0") == "1":
        return fast_max_pool(x, window, strides, padding)
    import flax.linen as nn
    return nn.max_pool(x, window, strides=strides, padding=padding)
