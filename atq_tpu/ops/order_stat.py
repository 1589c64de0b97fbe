"""Pallas TPU kernel: exact order statistic of |w| in one launch.

The quantizer threshold (reference quantizers.py:24-38:
``sorted(|w|)[int(sparsity*n)]``) is the dominant per-step latency on TPU:
a full `jnp.sort` costs milliseconds at multi-million-element widths, and
even the XLA bit-bisection replacement (core/quantize.py:_order_statistic_f32)
pays ~31 sequential device-op latencies (~10us each over the runtime) because
every compare+count round trips through HBM-level kernel dispatch.

This kernel keeps the uint32 bit patterns of |w| resident in VMEM and runs
the entire 31-step bisection inside ONE kernel launch — each step is a
VPU compare+reduce over on-chip memory. It also folds in the two auxiliary
reductions `max|w|` and `sum|w|` that the threshold's edge cases need
(quantizers.py:33-38), so the whole data-dependent half of the quantizer is
a single dispatch.

Non-negative IEEE-754 floats order identically to their uint32 bit patterns,
which makes the bisection exact (bit-identical to the sort).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# VMEM budget for the resident bit matrix (bytes). Above this the caller
# falls back to the XLA bisection.
_VMEM_BITS_BUDGET = 12 * 1024 * 1024
# Bit pattern strictly above +inf: padding sentinel that never counts as
# <= any finite search midpoint.
_PAD_BITS = 0x7F800001
# Rows per strip-mined chunk inside the kernel. Elementwise temps
# (compare masks, bitcast floats) materialize per CHUNK, not per matrix,
# keeping the kernel's scoped-VMEM stack ~ bits + 256 KB: without this a
# 768x3072 weight's count pass allocated 2x the bit matrix and blew the
# 16 MB scoped-vmem limit inside large programs (observed compiling the
# bert-base config of benchmarks/scale_mfu.py).
_ROW_CHUNK = 512


def _kernel(bits_ref, rank_ref, stat_ref, agg_ref):
    target = rank_ref[0] + 1
    n_chunks = bits_ref.shape[0] // _ROW_CHUNK  # caller pads rows

    def count_le(mid):
        # Lane-vector accumulator: each chunk contributes a (1, 128)
        # partial count (a cheap sublane reduce); the expensive
        # cross-lane scalar reduction happens ONCE per bisection round.
        # The original per-chunk scalar accumulation cost ~36 scalar
        # reductions x 31 rounds per call and dominated the kernel
        # (measured 259 us for a 768x3072 weight; VPU math alone is
        # ~20 us).
        def chunk(i, acc):
            blk = bits_ref[pl.ds(i * _ROW_CHUNK, _ROW_CHUNK), :]
            return acc + jnp.sum((blk <= mid).astype(jnp.int32),
                                 axis=0, keepdims=True)

        vec = jax.lax.fori_loop(
            0, n_chunks, chunk, jnp.zeros((1, 128), jnp.int32))
        return jnp.sum(vec)

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // jnp.uint32(2)
        ge = count_le(mid) >= target
        return (jnp.where(ge, lo, mid + jnp.uint32(1)),
                jnp.where(ge, mid, hi))

    lo = jnp.uint32(0)
    hi = jnp.uint32(0x7F800000)  # +inf bits: above every finite |w|
    lo, hi = jax.lax.fori_loop(0, 31, body, (lo, hi))
    # Mosaic can't bitcast scalars; hi <= 0x7F800000 < 2^31 so the integer
    # conversion preserves the bit pattern (bitcast happens outside).
    stat_ref[0] = hi.astype(jnp.int32)

    # Padding sentinels sit above +inf; mask them out of max and sum.
    # Same lane-vector accumulation as count_le.
    def agg_chunk(i, carry):
        m, s = carry
        blk = bits_ref[pl.ds(i * _ROW_CHUNK, _ROW_CHUNK), :]
        finite = blk <= jnp.uint32(0x7F800000)
        vals = jnp.where(
            finite, jax.lax.bitcast_convert_type(blk, jnp.float32), 0.0)
        return (jnp.maximum(m, jnp.max(vals, axis=0, keepdims=True)),
                s + jnp.sum(vals, axis=0, keepdims=True))

    zero = jnp.zeros((1, 128), jnp.float32)
    mx, sm = jax.lax.fori_loop(0, n_chunks, agg_chunk, (zero, zero))
    agg_ref[0] = jnp.max(mx)
    agg_ref[1] = jnp.sum(sm)


@jax.jit
def _pallas_select(bits2d, rank):
    from jax.experimental.pallas import tpu as pltpu

    from atq_tpu.ops.ternary_matmul import pallas_interpret

    stat_bits, agg = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=pallas_interpret(),
    )(bits2d, rank.reshape(1).astype(jnp.int32))
    stat = jax.lax.bitcast_convert_type(stat_bits[0], jnp.float32)
    return stat, agg[0], agg[1]


def order_stat_eligible(n: int) -> bool:
    from atq_tpu.ops.ternary_matmul import (
        pallas_disabled,
        pallas_interpret,
    )

    if pallas_disabled():  # ATQ_NO_PALLAS=1 kill-switch
        return False
    try:
        on_tpu = (jax.default_backend() == "tpu"
                  or pallas_interpret())
    except RuntimeError:  # pragma: no cover
        return False
    return on_tpu and n * 4 <= _VMEM_BITS_BUDGET


def _batched_kernel(bits_hbm, rank_ref, stat_ref, agg_ref, scratch, sem):
    """Grid-batched variant of :func:`_kernel`: each grid step owns one
    layer of the stacked (L, rows, 128) bit tensor. The stack stays in
    HBM (``ANY``) and each layer is DMA'd into ONE VMEM scratch — with a
    blocked VMEM input, Pallas double-buffers the 9 MB bert-ffn layer
    block and blows the 16 MB scoped-vmem limit; the manual copy costs
    ~11 us/layer against ~150+ us of bisection compute. Scalar refs are
    UNBLOCKED SMEM arrays indexed by program_id (partially-blocked SMEM
    scalars trip the TPU lowering's (8, 128) tiling constraint)."""
    from jax.experimental.pallas import tpu as pltpu

    layer = pl.program_id(0)
    dma = pltpu.make_async_copy(bits_hbm.at[layer], scratch, sem)
    dma.start()
    dma.wait()

    target = rank_ref[layer] + 1
    n_chunks = scratch.shape[0] // _ROW_CHUNK

    def count_le(mid):
        def chunk(i, acc):
            blk = scratch[pl.ds(i * _ROW_CHUNK, _ROW_CHUNK), :]
            return acc + jnp.sum((blk <= mid).astype(jnp.int32),
                                 axis=0, keepdims=True)

        vec = jax.lax.fori_loop(
            0, n_chunks, chunk, jnp.zeros((1, 128), jnp.int32))
        return jnp.sum(vec)

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // jnp.uint32(2)
        ge = count_le(mid) >= target
        return (jnp.where(ge, lo, mid + jnp.uint32(1)),
                jnp.where(ge, mid, hi))

    lo = jnp.uint32(0)
    hi = jnp.uint32(0x7F800000)
    lo, hi = jax.lax.fori_loop(0, 31, body, (lo, hi))
    stat_ref[layer] = hi.astype(jnp.int32)

    def agg_chunk(i, carry):
        m, s = carry
        blk = scratch[pl.ds(i * _ROW_CHUNK, _ROW_CHUNK), :]
        finite = blk <= jnp.uint32(0x7F800000)
        vals = jnp.where(
            finite, jax.lax.bitcast_convert_type(blk, jnp.float32), 0.0)
        return (jnp.maximum(m, jnp.max(vals, axis=0, keepdims=True)),
                s + jnp.sum(vals, axis=0, keepdims=True))

    zero = jnp.zeros((1, 128), jnp.float32)
    mx, sm = jax.lax.fori_loop(0, n_chunks, agg_chunk, (zero, zero))
    agg_ref[layer, 0] = jnp.max(mx)
    agg_ref[layer, 1] = jnp.sum(sm)


@jax.jit
def _pallas_select_batched(bits3d, ranks):
    from jax.experimental.pallas import tpu as pltpu

    from atq_tpu.ops.ternary_matmul import pallas_interpret

    lead, rows, cols = bits3d.shape
    stat_bits, agg = pl.pallas_call(
        _batched_kernel,
        grid=(lead,),
        out_shape=(
            jax.ShapeDtypeStruct((lead,), jnp.int32),
            jax.ShapeDtypeStruct((lead, 2), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, cols), jnp.uint32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=pallas_interpret(),
    )(bits3d, ranks.astype(jnp.int32))
    stat = jax.lax.bitcast_convert_type(stat_bits, jnp.float32)
    return stat, agg[:, 0], agg[:, 1]


def order_statistic_reductions_batched(abs2d: jax.Array, ranks: jax.Array):
    """Per-layer ``(sorted(abs2d[l])[ranks[l]], max, sum)`` for a stacked
    (L, n) non-negative float32 tensor in ONE grid-batched kernel launch
    (vs L separate :func:`order_statistic_reductions` launches — the
    hoisted-quantization path of ScannedTernaryStack computes every
    layer's threshold here before the scan). Returns three (L,) arrays."""
    lead, n = abs2d.shape
    bits = jax.lax.bitcast_convert_type(abs2d, jnp.uint32)
    cols = 128
    rows = -(-n // cols)
    rows = -(-rows // _ROW_CHUNK) * _ROW_CHUNK
    pad = rows * cols - n
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.full((lead, pad), _PAD_BITS, jnp.uint32)], axis=1)
    return _pallas_select_batched(bits.reshape(lead, rows, cols), ranks)


def order_statistic_reductions(abs_flat: jax.Array, rank: jax.Array):
    """``(sorted(abs_flat)[rank], max(abs_flat), sum(abs_flat))`` in one
    kernel launch. ``abs_flat`` must be non-negative float32."""
    n = abs_flat.size
    bits = jax.lax.bitcast_convert_type(abs_flat, jnp.uint32)
    cols = 128
    rows = -(-n // cols)
    # Pad rows to a multiple of the kernel's strip-mine chunk so the
    # in-kernel fori_loops cover the matrix exactly; sentinel rows never
    # count (they sit above +inf) and are masked from max/sum.
    rows = -(-rows // _ROW_CHUNK) * _ROW_CHUNK
    pad = rows * cols - n
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.full((pad,), _PAD_BITS, jnp.uint32)])
    return _pallas_select(bits.reshape(rows, cols), rank)
