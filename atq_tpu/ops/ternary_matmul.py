"""Pallas TPU kernel: matmul directly from 2-bit packed ternary planes.

This is the native implementation the reference explicitly lacks
(/root/reference/atq/bit_packing.py:152-154: "For actual speed gains, this
would need native implementation" — its `fast_ternary_matmul` unpacks in the
Python interpreter and then matmuls).

Design: weights live in HBM as row-packed uint8 planes (4 ternary values per
byte, atq_tpu/core/packing.py:pack_rows format). The kernel tiles the output
(M x N) over a grid; each program DMAs its packed K-slab into VMEM, unpacks
with lane-wise shifts/masks on the VPU, and feeds the MXU with an fp32/bf16
dot. Unpacking is O(K*N/4 bytes) of VMEM traffic instead of O(K*N*4) for
dense fp32 — the op is HBM-bandwidth bound at serving batch sizes, so the 16x
byte reduction is the speedup.

The same entry point transparently falls back to an XLA dense matmul
(`unpack -> dot`, still fully fused on-device) on CPU/interpreter platforms
and for shapes below the tile grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from atq_tpu.core.packing import unpack_rows

# MXU-aligned tiles.
_TILE_M = 128
_TILE_N = 128


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def pallas_eligible(x_shape, w_shape) -> bool:
    """The Pallas path needs TPU hardware and K % 4 == 0 (whole packed
    bytes). Small shapes still work — the grid pads via masking."""
    if not _on_tpu():
        return False
    (m, k) = x_shape
    (n, k2) = w_shape
    return k == k2 and k % 4 == 0 and k >= 128 and n >= 8 and m >= 1


def _unpack_block(packed_u8, k: int):
    """uint8 (n, k//4) block -> float32 (n, k) ternary values in VMEM.

    2-bit fields at positions 0/2/4/6; encoded = ternary + 1.
    """
    shifted = jnp.stack(
        [(packed_u8 >> s) & jnp.uint8(0x3) for s in (0, 2, 4, 6)], axis=-1
    )
    vals = shifted.reshape(packed_u8.shape[0], k)
    return vals.astype(jnp.float32) - 1.0


def _kernel(x_ref, wp_ref, alpha_ref, out_ref, *, k: int):
    from jax.experimental import pallas as pl  # noqa: F401

    w = _unpack_block(wp_ref[:], k)  # (TILE_N, K)
    acc = jax.lax.dot_general(
        x_ref[:], w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = acc * alpha_ref[0]


@functools.partial(jax.jit, static_argnames=("w_shape",))
def _pallas_matmul(x, w_packed, w_shape, alpha):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = w_shape
    m = x.shape[0]
    kb = k // 4

    m_pad = (-m) % _TILE_M
    n_pad = (-n) % _TILE_N
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    if n_pad:
        w_packed = jnp.pad(
            w_packed, ((0, n_pad), (0, 0)),
            constant_values=jnp.uint8(0b01010101),  # encoded zeros
        )
    mp, np_ = m + m_pad, n + n_pad

    grid = (mp // _TILE_M, np_ // _TILE_N)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_M, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, kb), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_M, _TILE_N), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(x.astype(jnp.float32), w_packed,
      jnp.asarray(alpha, jnp.float32).reshape(1))
    return out[:m, :n]


def packed_ternary_matmul(x, w_packed_rows, w_shape, alpha=1.0):
    """``x @ unpack(W)^T * alpha`` where W is row-packed ternary.

    Args:
        x: (M, K) activations.
        w_packed_rows: (N, ceil(K/4)) uint8 from core.packing.pack_rows, OR a
            flat reference-format uint8 array (reshaped when sizes allow).
        w_shape: static (N, K) logical weight shape.
        alpha: scalar scale.
    """
    n, k = w_shape
    w_packed_rows = jnp.asarray(w_packed_rows)
    if w_packed_rows.ndim == 1:
        # Flat reference-format layout only reshapes cleanly when K % 4 == 0.
        if k % 4 != 0:
            raise ValueError(
                "flat packed layout requires K % 4 == 0; repack with pack_rows"
            )
        w_packed_rows = w_packed_rows.reshape(n, k // 4)

    if pallas_eligible((jnp.shape(x)[0], k), w_shape):
        return _pallas_matmul(jnp.asarray(x), w_packed_rows, (n, k),
                              alpha).astype(jnp.asarray(x).dtype)

    x = jnp.asarray(x)
    w = unpack_rows(w_packed_rows, k, dtype=x.dtype)
    return jnp.matmul(x, w.T) * jnp.asarray(alpha, x.dtype)
