"""Space-to-depth stem: the 7x7/stride-2 ResNet stem conv as an exact
4x4/stride-1 conv on a 2x2 space-to-depth input.

The round-3 profile-HLO join (benchmarks/mfu_profile_join.json) showed
the retrieval step's structural MFU ceiling is set by the ResNet
trunk's high-resolution low-channel convolutions — the stem
``conv1`` (7x7, stride 2, 3 input channels) leads the op table. With
3 input channels the contraction dimension is 7*7*3 = 147 and the MXU's
128x128 systolic array runs mostly empty. The classic TPU fix (used by
the MLPerf ResNet submissions) is to fold a 2x2 spatial block into
channels first: the stride-2 conv then becomes a *stride-1* 4x4 conv
over 12 input channels — identical math, 4x fewer output positions per
kernel application and a denser contraction.

Derivation (1-D; 2-D is the tensor product). The stem computes

    o[i] = sum_{a=0..6} x[2i + a - 3] * w[a]          (padding 3)

Pad the kernel on the left to 8 taps, ``w8[0] = 0, w8[a'] = w[a'-1]``:

    o[i] = sum_{a'=0..7} x[2i + a' - 4] * w8[a']

and split ``a' = 2A + dr`` (A in 0..3, dr in {0,1}); with the
space-to-depth view ``y[p, dr] = x[2p + dr]`` this is

    o[i] = sum_{A=0..3} sum_{dr} y[i - 2 + A, dr] * w8[2A + dr]

i.e. a stride-1 4-tap conv over ``y`` with padding (2, 1). The extra
left-pad position multiplies the zero column ``w8[0]``, and every real
zero-padding position of ``x`` maps to a zero-padding position of
``y``, so the equality is exact (up to float reassociation).

The latent parameter stays the standard ``(7, 7, C, K)`` kernel —
checkpoints and the torchvision importer (models/resnet.py) are
unaffected; the 8x8 pad + (dr, dc, c) repack runs per step on a tensor
of a few thousand elements.

Gated off by default (``ATQ_S2D_STEM=1``, read at trace time like
ATQ_FAST_POOL): the math is exact but XLA reassociates differently, so
it stays off the bitwise parity path until the on-chip A/B
(benchmarks/s2d_ab.py) justifies the default.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), folding each 2x2 spatial block
    into channels in (dr, dc, c) row-major order."""
    n, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"space_to_depth needs even H, W; got {(h, w)}")
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # N, H/2, W/2, dr, dc, C
    return x.reshape(n, h // 2, w // 2, 4 * c)


def pack_stem_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(7, 7, C, K) stem kernel -> (4, 4, 4C, K) space-to-depth kernel.

    Pads to 8x8 with a zero leading row/column, then splits each spatial
    axis into (block, offset) and moves the offsets into the input-channel
    axis with the same (dr, dc, c) order as :func:`space_to_depth`.
    """
    kh, kw, c, k = kernel.shape
    if (kh, kw) != (7, 7):
        raise ValueError(f"expected a 7x7 stem kernel, got {(kh, kw)}")
    w8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w8 = w8.reshape(4, 2, 4, 2, c, k)          # A, dr, B, dc, C, K
    w8 = w8.transpose(0, 2, 1, 3, 4, 5)        # A, B, dr, dc, C, K
    return w8.reshape(4, 4, 4 * c, k)


def stem_conv(x: jnp.ndarray, kernel: jnp.ndarray,
              use_s2d: bool | None = None) -> jnp.ndarray:
    """The ResNet stem conv (7x7, stride 2, padding 3, no bias), either
    directly or via the exact space-to-depth rewrite.

    ``use_s2d=None`` reads ``ATQ_S2D_STEM`` at trace time. Odd spatial
    sizes fall back to the direct conv (space-to-depth needs even H, W).
    """
    if use_s2d is None:
        use_s2d = os.environ.get("ATQ_S2D_STEM", "0") == "1"
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    if use_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        y = space_to_depth(x)
        k4 = pack_stem_kernel(kernel).astype(kernel.dtype)
        dn4 = lax.conv_dimension_numbers(y.shape, k4.shape,
                                         ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            y, k4, window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=dn4)
    return lax.conv_general_dilated(
        x, kernel, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=dn)
