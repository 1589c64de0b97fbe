"""Pallas TPU kernel: matmul directly from 2-bit packed ternary planes.

This is the native implementation the reference explicitly lacks
(/root/reference/atq/bit_packing.py:152-154: "For actual speed gains, this
would need native implementation" — its `fast_ternary_matmul` unpacks in the
Python interpreter and then matmuls).

Design: weights live in HBM as *planar* 2-bit planes
(atq_tpu/core/packing.py:pack_planar — the K axis is split into 4
contiguous quarters, one per bit-field, so in-kernel decoding is pure
shift/mask lane ops with NO interleaving reshapes, which Mosaic does not
support). Each grid program DMAs its (TILE_N, K/4) uint8 slab into VMEM,
decodes the 4 quarters on the VPU, and accumulates 4 MXU dots of
(TILE_M, K/4) x (K/4, TILE_N). The op is HBM-bandwidth bound at serving
batch sizes and the packed weights move 16x fewer bytes than fp32 (4x fewer
than int8).

The same entry point transparently falls back to an XLA dense matmul
(`unpack -> dot`, still fully fused on-device) on CPU/interpreter platforms
and for shapes below the tile grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from atq_tpu.core.packing import (
    PLANAR32_ZERO_WORD,
    pack_planar,
    unpack_planar,
    unpack_planar32,
    unpack_rows,
)

# MXU-aligned tiles.
_TILE_M = 128
_TILE_N = 128
_K_ALIGN = 512  # K padded so K/4 is a whole number of 128-lane vectors


def pallas_interpret() -> bool:
    """``ATQ_PALLAS_INTERPRET=1``: run every Pallas kernel through the
    interpreter on the current backend — CPU-testable kernel semantics
    (bit-exact for the order statistic, float-rounding-level for the
    matmuls). Read at trace time; set it before first use."""
    import os

    return os.environ.get("ATQ_PALLAS_INTERPRET", "0") == "1"


def pallas_disabled() -> bool:
    """Global Pallas kill-switch: ``ATQ_NO_PALLAS=1`` forces every kernel
    entry point to its XLA fallback. Production escape hatch — a faulting
    kernel crashes the TPU worker process (and on remote-dispatch setups
    can wedge the chip for minutes), so operators need a flag that
    restores service without a code change."""
    import os

    return os.environ.get("ATQ_NO_PALLAS", "0") == "1"


def _on_tpu() -> bool:
    if pallas_disabled():
        return False
    try:
        return jax.default_backend() == "tpu" or pallas_interpret()
    except RuntimeError:  # pragma: no cover
        return False


def pallas_eligible(x_shape, w_shape) -> bool:
    """The Pallas path needs TPU hardware and non-trivial shapes; smaller
    inputs go through the XLA fallback."""
    if not _on_tpu():
        return False
    (m, k) = x_shape
    (n, k2) = w_shape
    return k == k2 and k >= 128 and n >= 8 and m >= 1


def _kernel(x_ref, wp_ref, alpha_ref, out_ref, *, kq: int,
            asym: bool = False):
    packed_i32 = wp_ref[:].astype(jnp.int32)  # (TILE_N, kq)
    acc = jnp.zeros((x_ref.shape[0], wp_ref.shape[0]), jnp.float32)
    for s in range(4):
        w_s = ((packed_i32 >> (2 * s)) & 0x3).astype(jnp.float32) - 1.0
        if asym:
            # TTQ asymmetric scales: +1 -> alpha_p, -1 -> -alpha_n
            # (wp·[w>t] − wn·[w<−t]); pre-scaled on the VPU so the MXU
            # dot count is unchanged.
            w_s = (alpha_ref[0] * jnp.maximum(w_s, 0.0)
                   + alpha_ref[1] * jnp.minimum(w_s, 0.0))
        x_s = x_ref[:, s * kq:(s + 1) * kq]
        acc = acc + jax.lax.dot_general(
            x_s, w_s,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc if asym else acc * alpha_ref[0]


def _kernel_rpb(x_ref, wp_ref, corr_ref, alpha_ref, out_ref, *, kq: int,
                k: int):
    """Packed ternary matmul with the RPB sparse correction fused in-kernel
    (the north-star form): out = x @ (unpack(Wp) * alpha + corr)^T."""
    packed_i32 = wp_ref[:].astype(jnp.int32)
    acc = jnp.zeros((x_ref.shape[0], wp_ref.shape[0]), jnp.float32)
    for s in range(4):
        w_s = ((packed_i32 >> (2 * s)) & 0x3).astype(jnp.float32) - 1.0
        x_s = x_ref[:, s * kq:(s + 1) * kq]
        acc = acc + jax.lax.dot_general(
            x_s, w_s,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = acc * alpha_ref[0]
    acc = acc + jax.lax.dot_general(
        x_ref[:, :k], corr_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("w_shape",))
def _pallas_matmul_rpb(x, w_packed_planar, correction, w_shape, alpha):
    """Fused packed matmul + RPB correction on the Pallas path.

    ``correction`` is the dense (N, K) bf16 residual ``mask*(w - w_t*a)``.
    """
    from jax.experimental.pallas import tpu as pltpu

    n, k = w_shape
    m = x.shape[0]
    k_padded = k + ((-k) % _K_ALIGN)
    kq = k_padded // 4
    tile_m = min(_TILE_M, max(8, ((m + 7) // 8) * 8))
    m_pad = (-m) % tile_m
    n_pad = (-n) % _TILE_N
    if k_padded != k:
        x = jnp.pad(x, ((0, 0), (0, k_padded - k)))
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    if n_pad:
        w_packed_planar = jnp.pad(
            w_packed_planar, ((0, n_pad), (0, 0)),
            constant_values=jnp.uint8(0b01010101),
        )
        correction = jnp.pad(correction, ((0, n_pad), (0, 0)))
    mp, np_ = m + m_pad, n + n_pad

    grid = (mp // tile_m, np_ // _TILE_N)
    out = pl.pallas_call(
        functools.partial(_kernel_rpb, kq=kq, k=k),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, k_padded), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, kq), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, k), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, _TILE_N), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * np_ * k_padded,
            bytes_accessed=mp * k_padded * 4 + np_ * kq + np_ * k * 2
            + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=pallas_interpret(),
    )(x.astype(jnp.float32), w_packed_planar,
      correction.astype(jnp.bfloat16),
      jnp.asarray(alpha, jnp.float32).reshape(1))
    return out[:m, :n]


def packed_ternary_matmul_rpb(x, w_packed_planar, correction, w_shape,
                              alpha=1.0):
    """``x @ (unpack(Wp)*alpha + correction)^T`` — single fused kernel on
    TPU, XLA fallback elsewhere."""
    n, k = w_shape
    x = jnp.asarray(x)
    if pallas_eligible((x.shape[0], k), w_shape):
        return _pallas_matmul_rpb(x, jnp.asarray(w_packed_planar),
                                  jnp.asarray(correction), (n, k),
                                  alpha).astype(x.dtype)
    w = unpack_planar(jnp.asarray(w_packed_planar), k, dtype=x.dtype)
    w_eff = w * jnp.asarray(alpha, x.dtype) + jnp.asarray(
        correction, x.dtype)
    return jnp.matmul(x, w_eff.T)


# Above this x-block byte size the kernel tiles the K axis as a third grid
# dimension (VMEM is ~16 MB/core; leave room for W, correction, output).
_VMEM_X_BUDGET = 4 * 1024 * 1024
_K_SLAB = 2048  # columns per K-grid step (quarter-aligned: _K_SLAB % 4 == 0)


def _kernel_kblocked(x_ref, wp_ref, alpha_ref, out_ref, *,
                     slabs_per_q: int, asym: bool = False):
    """Grid (M, N, 4*slabs_per_q): the third dimension walks quarter s
    (bit-field) major, byte-slab minor. Each step decodes ONE field of one
    byte slab and accumulates a (tile_m, tile_n) partial dot into out_ref
    (same output block revisited across the K dimension)."""
    t = pl.program_id(2)
    s = t // slabs_per_q  # which 2-bit field
    packed_i32 = wp_ref[:].astype(jnp.int32)
    w_s = ((packed_i32 >> (2 * s)) & 0x3).astype(jnp.float32) - 1.0
    if asym:  # TTQ scales folded into the decode (see _kernel)
        w_s = (alpha_ref[0] * jnp.maximum(w_s, 0.0)
               + alpha_ref[1] * jnp.minimum(w_s, 0.0))
    partial = jax.lax.dot_general(
        x_ref[:], w_s,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = out_ref[:] + partial

    if not asym:
        @pl.when(t == pl.num_programs(2) - 1)
        def _():
            out_ref[:] = out_ref[:] * alpha_ref[0]


def _alpha_vec(alpha, alpha_neg):
    """SMEM scale vector: [alpha, alpha] symmetric, [alpha_p, alpha_n]
    asymmetric (TTQ)."""
    a = jnp.asarray(alpha, jnp.float32).reshape(())
    b = (a if alpha_neg is None
         else jnp.asarray(alpha_neg, jnp.float32).reshape(()))
    return jnp.stack([a, b])


@functools.partial(jax.jit, static_argnames=("w_shape", "asym"))
def _pallas_matmul_kblocked(x, w_packed_planar, w_shape, alpha,
                            asym: bool = False):
    from jax.experimental.pallas import tpu as pltpu

    n, k = w_shape
    m = x.shape[0]
    # The packing fixes the quarter stride: kq bytes per row, quarter s of
    # the padded K axis at columns [s*kq, (s+1)*kq). Slab size must divide
    # kq (and stay lane-aligned) so each grid step stays inside one quarter.
    kq = w_packed_planar.shape[1]
    k_padded = 4 * kq
    slab_bytes = min(_K_SLAB, kq)
    while kq % slab_bytes != 0 and slab_bytes > 128:
        slab_bytes -= 128
    slabs_per_q = kq // slab_bytes
    slab_cols = slab_bytes       # 1 byte : 1 column of the quarter

    tile_m = min(_TILE_M, max(8, ((m + 7) // 8) * 8))
    m_pad = (-m) % tile_m
    n_pad = (-n) % _TILE_N
    if k_padded != x.shape[1]:
        x = jnp.pad(x, ((0, 0), (0, k_padded - x.shape[1])))
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    if n_pad:
        w_packed_planar = jnp.pad(
            w_packed_planar, ((0, n_pad), (0, 0)),
            constant_values=jnp.uint8(0b01010101),
        )
    mp, np_ = m + m_pad, n + n_pad

    grid = (mp // tile_m, np_ // _TILE_N, 4 * slabs_per_q)
    out = pl.pallas_call(
        functools.partial(_kernel_kblocked, slabs_per_q=slabs_per_q,
                          asym=asym),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        grid=grid,
        in_specs=[
            # x slab: quarter-major walk over the padded K axis — step t
            # covers columns [t * slab_cols, (t+1) * slab_cols) which lie
            # entirely inside field t // slabs_per_q's quarter.
            pl.BlockSpec((tile_m, slab_cols), lambda i, j, t: (i, t),
                         memory_space=pltpu.VMEM),
            # wp slab: the byte range repeats per field.
            pl.BlockSpec(
                (_TILE_N, slab_bytes),
                lambda i, j, t, spq=slabs_per_q: (j, t % spq),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, _TILE_N), lambda i, j, t: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k_padded,
            bytes_accessed=mp * k_padded * 4 + np_ * kq + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=pallas_interpret(),
    )(x.astype(jnp.float32), w_packed_planar,
      jnp.asarray(alpha, jnp.float32).reshape(-1))
    return out[:m, :n]


@functools.partial(jax.jit, static_argnames=("w_shape", "asym"))
def _pallas_matmul(x, w_packed_planar, w_shape, alpha, asym: bool = False):
    from jax.experimental.pallas import tpu as pltpu

    n, k = w_shape
    m = x.shape[0]
    k_padded = k + ((-k) % _K_ALIGN)
    kq = k_padded // 4

    # Small serving batches don't pay for a full 128-row tile: round M up
    # to the f32 sublane minimum (8) instead.
    tile_m = min(_TILE_M, max(8, ((m + 7) // 8) * 8))
    m_pad = (-m) % tile_m
    n_pad = (-n) % _TILE_N
    if k_padded != k:
        x = jnp.pad(x, ((0, 0), (0, k_padded - k)))
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    if n_pad:
        w_packed_planar = jnp.pad(
            w_packed_planar, ((0, n_pad), (0, 0)),
            constant_values=jnp.uint8(0b01010101),  # encoded zeros
        )
    mp, np_ = m + m_pad, n + n_pad

    grid = (mp // tile_m, np_ // _TILE_N)
    out = pl.pallas_call(
        functools.partial(_kernel, kq=kq, asym=asym),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, k_padded), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, kq), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, _TILE_N), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k_padded,
            bytes_accessed=mp * k_padded * 4 + np_ * kq + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=pallas_interpret(),
    )(x.astype(jnp.float32), w_packed_planar,
      jnp.asarray(alpha, jnp.float32).reshape(-1))
    return out[:m, :n]


def _kernel32(x_ref, wp_ref, alpha_ref, out_ref, *, k16: int,
              asym: bool = False):
    """Like :func:`_kernel` but over int32-lane planes (pack_planar32):
    16 fields per word, each decoding to a contiguous (TILE_N, K/16)
    block. All decode ops run at the TPU's native 32-bit lane width."""
    packed = wp_ref[:]  # (TILE_N, k16) int32
    acc = jnp.zeros((x_ref.shape[0], wp_ref.shape[0]), jnp.float32)
    for f in range(16):
        w_f = ((packed >> (2 * f)) & 0x3).astype(jnp.float32) - 1.0
        if asym:
            w_f = (alpha_ref[0] * jnp.maximum(w_f, 0.0)
                   + alpha_ref[1] * jnp.minimum(w_f, 0.0))
        x_f = x_ref[:, f * k16:(f + 1) * k16]
        acc = acc + jax.lax.dot_general(
            x_f, w_f,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc if asym else acc * alpha_ref[0]


@functools.partial(jax.jit, static_argnames=("w_shape", "asym"))
def _pallas_matmul32(x, w_packed32, w_shape, alpha, asym: bool = False):
    from jax.experimental.pallas import tpu as pltpu

    n, k = w_shape
    m = x.shape[0]
    k16 = w_packed32.shape[1]
    k_padded = 16 * k16

    tile_m = min(_TILE_M, max(8, ((m + 7) // 8) * 8))
    m_pad = (-m) % tile_m
    n_pad = (-n) % _TILE_N
    if k_padded != x.shape[1]:
        x = jnp.pad(x, ((0, 0), (0, k_padded - x.shape[1])))
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    if n_pad:
        w_packed32 = jnp.pad(
            w_packed32, ((0, n_pad), (0, 0)),
            constant_values=jnp.int32(PLANAR32_ZERO_WORD),
        )
    mp, np_ = m + m_pad, n + n_pad

    grid = (mp // tile_m, np_ // _TILE_N)
    out = pl.pallas_call(
        functools.partial(_kernel32, k16=k16, asym=asym),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, k_padded), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, k16), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, _TILE_N), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k_padded,
            bytes_accessed=mp * k_padded * 4 + np_ * k16 * 4 + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=pallas_interpret(),
    )(x.astype(jnp.float32), w_packed32,
      jnp.asarray(alpha, jnp.float32).reshape(-1))
    return out[:m, :n]


def packed_ternary_matmul(x, w_packed, w_shape, alpha=1.0,
                          layout: str = "planar", alpha_neg=None):
    """``x @ unpack(W)^T * alpha`` from packed ternary planes.

    Args:
        x: (M, K) activations.
        w_packed: packed weights — (N, K_pad/4) uint8 planar
            (core.packing.pack_planar, the kernel-native layout),
            (N, K_pad/16) int32 planar (pack_planar32, native-lane
            variant), (N, ceil(K/4)) uint8 row-interleaved (pack_rows),
            or a flat reference-format uint8 array.
        w_shape: static (N, K) logical weight shape.
        alpha: scalar scale (the TTQ positive scale when ``alpha_neg``
            is given).
        layout: 'planar' | 'planar32' | 'rows' | 'flat'.
        alpha_neg: optional TTQ negative scale — computes the asymmetric
            ``x @ (alpha·[w=+1] − alpha_neg·[w=−1])^T`` (core/quantize.py
            ternarize_ttq semantics) from the SAME 2-bit planes.
    """
    n, k = w_shape
    x = jnp.asarray(x)
    w_packed = jnp.asarray(w_packed)
    asym = alpha_neg is not None

    if layout == "flat":
        if k % 4 != 0:
            # Reference flat format (bit_packing.py:47-69) packs the
            # flattened N*K stream, so rows don't align to byte boundaries
            # when K % 4 != 0. Decode the stream densely and matmul —
            # matches the reference's unpack-then-matmul semantics.
            shifts = jnp.asarray([0, 2, 4, 6], dtype=jnp.uint8)
            vals = (w_packed.reshape(-1)[:, None] >> shifts) & jnp.uint8(0x3)
            w = (vals.reshape(-1)[: n * k].astype(x.dtype) - 1.0).reshape(
                n, k
            )
            return _scaled_matmul(x, w, alpha, alpha_neg)
        w_packed = w_packed.reshape(n, k // 4)
        layout = "rows"

    if pallas_eligible((x.shape[0], k), w_shape):
        avec = _alpha_vec(alpha, alpha_neg)
        tile_m = min(_TILE_M, max(8, ((x.shape[0] + 7) // 8) * 8))
        if layout == "planar32":
            k_padded = 16 * w_packed.shape[1]
            if tile_m * k_padded * 4 <= _VMEM_X_BUDGET:
                return _pallas_matmul32(x, w_packed, (n, k), avec,
                                        asym=asym).astype(x.dtype)
            # No K-blocked int32 variant: decode via XLA below (the
            # budget is only exceeded for K in the tens of thousands,
            # beyond any layer this framework serves packed).
        else:
            if layout == "rows":
                # Interleaved -> planar conversion (XLA elementwise,
                # on-device).
                w_packed = pack_planar(unpack_rows(w_packed, k))
            k_padded = k + ((-k) % _K_ALIGN)
            if tile_m * k_padded * 4 > _VMEM_X_BUDGET:
                return _pallas_matmul_kblocked(x, w_packed, (n, k), avec,
                                               asym=asym).astype(x.dtype)
            return _pallas_matmul(x, w_packed, (n, k), avec,
                                  asym=asym).astype(x.dtype)

    if layout == "planar32":
        w = unpack_planar32(w_packed, k, dtype=x.dtype)
    elif layout == "planar":
        w = unpack_planar(w_packed, k, dtype=x.dtype)
    else:
        w = unpack_rows(w_packed, k, dtype=x.dtype)
    return _scaled_matmul(x, w, alpha, alpha_neg)


def _scaled_matmul(x, w, alpha, alpha_neg):
    """XLA fallback matmul over a decoded ±1/0 plane, symmetric or TTQ."""
    if alpha_neg is None:
        return jnp.matmul(x, w.T) * jnp.asarray(alpha, x.dtype)
    ap = jnp.asarray(alpha, x.dtype)
    an = jnp.asarray(alpha_neg, x.dtype)
    w_eff = ap * jnp.maximum(w, 0) + an * jnp.minimum(w, 0)
    return jnp.matmul(x, w_eff.T)
