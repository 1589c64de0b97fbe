"""Fused quantize+matmul Pallas kernels for the TRAINING path.

The reference's hot op (quantizers.py:7-60 called from precision_boost.py:62-74
and layers.py:35-43 on every forward) is: sort |w| for a threshold, build the
ternary tensor, blend ``w_mixed = w_t*alpha*(1-mask) + w*mask``, then matmul.
The dense JAX port materializes ``w_t`` and ``w_mixed`` in HBM every step.

Here the data-dependent half (the |w| sort -> scalar threshold,
core/quantize.py:ternary_threshold) stays outside as one reduction per layer
per step, and everything elementwise moves INTO the matmul tile: each grid
program ternarizes its weight block on the VPU registers and feeds the MXU
directly — ``w_t``/``w_mixed`` never exist in HBM. All three kernels are
K-blocked (3-D grids with a revisited accumulator block), so any layer width
fits the ~16 MB VMEM.

Gradient semantics (reference parity, SURVEY.md §2.1 quirk) are preserved by
a ``jax.custom_vjp`` whose backward also runs as Pallas kernels:

- parity: latent ``w`` gets ZERO grad in TernaryLinear; only ``mask``-ed
  entries get grad in RPB. ``alpha`` gets ``sum(G * w_t * (1-mask))`` where
  ``G = g^T @ x`` (G is formed tile-by-tile in VMEM, never in HBM).
- ste: straight-through — ``w`` gets ``G * alpha`` (TernaryLinear) or
  ``G * (alpha*(1-mask) + mask)`` (RPB).

Off-TPU (and for batch sizes past the VMEM guard) every path falls back to
the identical XLA math, so grads and outputs are platform-independent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_TILE_M = 256
_TILE_N = 256
_TILE_K = 512
# dwda keeps the full (padded) batch dim resident; guard it.
_MAX_RESIDENT_M = 2048


def _on_tpu() -> bool:
    from atq_tpu.ops.ternary_matmul import pallas_disabled

    if pallas_disabled():  # ATQ_NO_PALLAS=1 kill-switch
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def _pad_to(x, rows, cols):
    r, c = x.shape
    if r == rows and c == cols:
        return x
    return jnp.pad(x, ((0, rows - r), (0, cols - c)))


def _ternarize(w, thr):
    one = jnp.asarray(1.0, w.dtype)
    zero = jnp.asarray(0.0, w.dtype)
    return jnp.where(w > thr, one, jnp.where(w < -thr, -one, zero))


def _round_up(v, m):
    return v + ((-v) % m)


def _tiles(m, n, k):
    tile_m = min(_TILE_M, max(8, _round_up(m, 8)))
    tile_n = min(_TILE_N, _round_up(n, 128))
    tile_k = min(_TILE_K, _round_up(k, 128))
    return tile_m, tile_n, tile_k


def _w_eff_tile(w, m, alpha, thr):
    wt = _ternarize(w, thr)
    if m is None:
        return wt * alpha
    return wt * alpha * (1.0 - m) + w * m


# ---------------------------------------------------------------------------
# Forward: out[i,j] += x[i,kt] @ w_eff[j,kt]^T over the kt grid dim.
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, w_ref, m_ref, scal_ref, out_ref):
    alpha, thr = scal_ref[0], scal_ref[1]
    w_eff = _w_eff_tile(w_ref[:], None if m_ref is None else m_ref[:],
                        alpha, thr)
    partial = jax.lax.dot_general(
        x_ref[:], w_eff,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = out_ref[:] + partial


def _fwd_kernel_nomask(x_ref, w_ref, scal_ref, out_ref):
    _fwd_kernel(x_ref, w_ref, None, scal_ref, out_ref)


@functools.partial(jax.jit, static_argnames=("has_mask",))
def _pallas_forward(x, w, mask, alpha, threshold, has_mask: bool):
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    n = w.shape[0]
    tile_m, tile_n, tile_k = _tiles(m, n, k)
    mp, np_, kp = (_round_up(m, tile_m), _round_up(n, tile_n),
                   _round_up(k, tile_k))

    x = _pad_to(x.astype(jnp.float32), mp, kp)
    w = _pad_to(w.astype(jnp.float32), np_, kp)
    scal = jnp.stack([jnp.asarray(alpha, jnp.float32).reshape(()),
                      jnp.asarray(threshold, jnp.float32).reshape(())])

    grid = (mp // tile_m, np_ // tile_n, kp // tile_k)
    x_spec = pl.BlockSpec((tile_m, tile_k), lambda i, j, t: (i, t),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((tile_n, tile_k), lambda i, j, t: (j, t),
                          memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((tile_m, tile_n), lambda i, j, t: (i, j),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * mp * np_ * kp,
        bytes_accessed=mp * kp * 4 + (2 if has_mask else 1) * np_ * kp * 4
        + mp * np_ * 4,
        transcendentals=0,
    )
    if has_mask:
        out = pl.pallas_call(
            _fwd_kernel,
            out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
            grid=grid,
            in_specs=[x_spec, w_spec, w_spec, smem],
            out_specs=out_spec,
            cost_estimate=cost,
        )(x, w, _pad_to(mask.astype(jnp.float32), np_, kp), scal)
    else:
        out = pl.pallas_call(
            _fwd_kernel_nomask,
            out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
            grid=grid,
            in_specs=[x_spec, w_spec, smem],
            out_specs=out_spec,
            cost_estimate=cost,
        )(x, w, scal)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Backward 1: dx[i,j] += g[i,nt] @ w_eff[nt,j] over the nt grid dim.
# ---------------------------------------------------------------------------

def _dx_kernel(g_ref, w_ref, m_ref, scal_ref, out_ref):
    alpha, thr = scal_ref[0], scal_ref[1]
    w_eff = _w_eff_tile(w_ref[:], None if m_ref is None else m_ref[:],
                        alpha, thr)
    partial = jax.lax.dot_general(
        g_ref[:], w_eff,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = out_ref[:] + partial


def _dx_kernel_nomask(g_ref, w_ref, scal_ref, out_ref):
    _dx_kernel(g_ref, w_ref, None, scal_ref, out_ref)


@functools.partial(jax.jit, static_argnames=("has_mask",))
def _pallas_dx(g, w, mask, alpha, threshold, has_mask: bool):
    from jax.experimental.pallas import tpu as pltpu

    m, n = g.shape
    k = w.shape[1]
    tile_m, tile_n, tile_k = _tiles(m, n, k)
    mp, np_, kp = (_round_up(m, tile_m), _round_up(n, tile_n),
                   _round_up(k, tile_k))

    g = _pad_to(g.astype(jnp.float32), mp, np_)
    w = _pad_to(w.astype(jnp.float32), np_, kp)
    scal = jnp.stack([jnp.asarray(alpha, jnp.float32).reshape(()),
                      jnp.asarray(threshold, jnp.float32).reshape(())])

    grid = (mp // tile_m, kp // tile_k, np_ // tile_n)
    g_spec = pl.BlockSpec((tile_m, tile_n), lambda i, j, t: (i, t),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((tile_n, tile_k), lambda i, j, t: (t, j),
                          memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((tile_m, tile_k), lambda i, j, t: (i, j),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * mp * np_ * kp,
        bytes_accessed=mp * np_ * 4 + (2 if has_mask else 1) * np_ * kp * 4
        + mp * kp * 4,
        transcendentals=0,
    )
    if has_mask:
        out = pl.pallas_call(
            _dx_kernel,
            out_shape=jax.ShapeDtypeStruct((mp, kp), jnp.float32),
            grid=grid,
            in_specs=[g_spec, w_spec, w_spec, smem],
            out_specs=out_spec,
            cost_estimate=cost,
        )(g, w, _pad_to(mask.astype(jnp.float32), np_, kp), scal)
    else:
        out = pl.pallas_call(
            _dx_kernel_nomask,
            out_shape=jax.ShapeDtypeStruct((mp, kp), jnp.float32),
            grid=grid,
            in_specs=[g_spec, w_spec, smem],
            out_specs=out_spec,
            cost_estimate=cost,
        )(g, w, scal)
    return out[:m, :k]


# ---------------------------------------------------------------------------
# Backward 2: per (N, K) tile, G = g^T @ x is formed in VMEM, immediately
# turned into dw (mode-dependent elementwise) and the dalpha partial — G
# itself never hits HBM. Grid is (k-tiles, n-tiles) with n fastest so the
# x slab (full batch rows, one K tile) stays resident across the n sweep.
# ---------------------------------------------------------------------------

def _dwda_kernel(g_ref, x_ref, w_ref, m_ref, scal_ref, dw_ref, da_ref, *,
                 ste: bool):
    alpha, thr = scal_ref[0], scal_ref[1]
    G = jax.lax.dot_general(
        g_ref[:], x_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (tile_n, tile_k)
    wt = _ternarize(w_ref[:], thr)
    if m_ref is None:
        inv_m = 1.0
        dw_ref[:] = G * alpha if ste else jnp.zeros_like(G)
    else:
        m = m_ref[:]
        inv_m = 1.0 - m
        dw_ref[:] = G * (alpha * inv_m + m) if ste else G * m
    part = jnp.sum(G * wt * inv_m)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        da_ref[0, 0] = 0.0

    da_ref[0, 0] += part


def _dwda_kernel_nomask(g_ref, x_ref, w_ref, scal_ref, dw_ref, da_ref, *,
                        ste: bool):
    _dwda_kernel(g_ref, x_ref, w_ref, None, scal_ref, dw_ref, da_ref,
                 ste=ste)


@functools.partial(jax.jit, static_argnames=("has_mask", "ste"))
def _pallas_dwda(g, x, w, mask, alpha, threshold, has_mask: bool, ste: bool):
    from jax.experimental.pallas import tpu as pltpu

    m, n = g.shape
    k = x.shape[1]
    _, tile_n, tile_k = _tiles(m, n, k)
    mp = _round_up(m, 8)
    np_, kp = _round_up(n, tile_n), _round_up(k, tile_k)

    g = _pad_to(g.astype(jnp.float32), mp, np_)
    x = _pad_to(x.astype(jnp.float32), mp, kp)
    w = _pad_to(w.astype(jnp.float32), np_, kp)
    scal = jnp.stack([jnp.asarray(alpha, jnp.float32).reshape(()),
                      jnp.asarray(threshold, jnp.float32).reshape(())])

    grid = (kp // tile_k, np_ // tile_n)
    g_spec = pl.BlockSpec((mp, tile_n), lambda j, i: (0, i),
                          memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((mp, tile_k), lambda j, i: (0, j),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((tile_n, tile_k), lambda j, i: (i, j),
                          memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    dw_spec = pl.BlockSpec((tile_n, tile_k), lambda j, i: (i, j),
                           memory_space=pltpu.VMEM)
    da_spec = pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                           memory_space=pltpu.SMEM)
    out_shape = (
        jax.ShapeDtypeStruct((np_, kp), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )
    cost = pl.CostEstimate(
        flops=2 * mp * np_ * kp,
        bytes_accessed=mp * (np_ + kp) * 4
        + (2 if has_mask else 1) * np_ * kp * 4 + np_ * kp * 4,
        transcendentals=0,
    )
    kernel = functools.partial(_dwda_kernel, ste=ste)
    if has_mask:
        dw, da = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=[g_spec, x_spec, w_spec, w_spec, smem],
            out_specs=(dw_spec, da_spec),
            cost_estimate=cost,
        )(g, x, w, _pad_to(mask.astype(jnp.float32), np_, kp), scal)
    else:
        nomask = functools.partial(_dwda_kernel_nomask, ste=ste)
        dw, da = pl.pallas_call(
            nomask,
            out_shape=out_shape,
            grid=grid,
            in_specs=[g_spec, x_spec, w_spec, smem],
            out_specs=(dw_spec, da_spec),
            cost_estimate=cost,
        )(g, x, w, scal)
    return dw[:n, :k], da.reshape(())


# ---------------------------------------------------------------------------
# XLA fallback math (identical semantics; used off-TPU / oversize batch).
# ---------------------------------------------------------------------------

def _w_eff(w, mask, alpha, threshold):
    wt = _ternarize(w, threshold)
    if mask is None:
        return wt * alpha, wt
    return wt * alpha * (1.0 - mask) + w * mask, wt


def _xla_forward(x, w, mask, alpha, threshold):
    w_eff, _ = _w_eff(w, mask, alpha, threshold)
    return jnp.matmul(x, w_eff.T)


def _fwd_eligible(m, n, k):
    del n, k  # every width fits: all kernels are K/N-blocked
    return _on_tpu() and _round_up(m, 8) <= _MAX_RESIDENT_M


# ---------------------------------------------------------------------------
# The custom_vjp ops.
# ---------------------------------------------------------------------------

def _dispatch_forward(x, w, mask, alpha, threshold):
    m, k = x.shape
    n = w.shape[0]
    if _fwd_eligible(m, n, k):
        return _pallas_forward(x, w, mask, alpha, threshold,
                               has_mask=mask is not None)
    return _xla_forward(x, w, mask, alpha, threshold)


def _dispatch_backward(grad_mode, res, g):
    x, w, mask, alpha, threshold = res
    m, k = x.shape
    n = w.shape[0]
    ste = grad_mode == "ste"
    has_mask = mask is not None
    if _fwd_eligible(m, n, k):
        dx = _pallas_dx(g, w, mask, alpha, threshold, has_mask=has_mask)
        dw, da = _pallas_dwda(g, x, w, mask, alpha, threshold,
                              has_mask=has_mask, ste=ste)
    else:
        w_eff, wt = _w_eff(w, mask, alpha, threshold)
        dx = jnp.matmul(g, w_eff)
        G = jnp.matmul(g.T, x)
        inv_m = 1.0 if mask is None else 1.0 - mask
        if has_mask:
            dw = G * (alpha * inv_m + mask) if ste else G * mask
        else:
            dw = G * alpha if ste else jnp.zeros_like(G)
        da = jnp.sum(G * wt * inv_m)
    dalpha = jnp.broadcast_to(da, jnp.shape(alpha)).astype(
        jnp.result_type(alpha))
    dthr = jnp.zeros_like(threshold)
    if has_mask:
        return (dx.astype(x.dtype), dw.astype(w.dtype),
                jnp.zeros_like(mask), dalpha, dthr)
    return dx.astype(x.dtype), dw.astype(w.dtype), dalpha, dthr


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_rpb(grad_mode, x, w, mask, alpha, threshold):
    return _dispatch_forward(x, w, mask, alpha, threshold)


def _fused_rpb_fwd(grad_mode, x, w, mask, alpha, threshold):
    y = _dispatch_forward(x, w, mask, alpha, threshold)
    return y, (x, w, mask, alpha, threshold)


def _fused_rpb_bwd(grad_mode, res, g):
    return _dispatch_backward(grad_mode, res, g)


_fused_rpb.defvjp(_fused_rpb_fwd, _fused_rpb_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_ternary(grad_mode, x, w, alpha, threshold):
    return _dispatch_forward(x, w, None, alpha, threshold)


def _fused_ternary_fwd(grad_mode, x, w, alpha, threshold):
    y = _dispatch_forward(x, w, None, alpha, threshold)
    return y, (x, w, None, alpha, threshold)


def _fused_ternary_bwd(grad_mode, res, g):
    return _dispatch_backward(grad_mode, res, g)


_fused_ternary.defvjp(_fused_ternary_fwd, _fused_ternary_bwd)


def fused_quantized_linear(x, weight, alpha, threshold, mask=None,
                           grad_mode: str = "parity"):
    """``x @ (w_t*alpha*(1-mask) + w*mask)^T`` as one fused op.

    ``threshold`` is the pre-computed quantizer threshold
    (core/quantize.py:ternary_threshold — one order-statistic per layer per
    step); the elementwise ternarize+blend happens inside the matmul tile, so
    neither ``w_t`` nor ``w_mixed`` is ever materialized in HBM. ``mask=None``
    is the TernaryLinear form ``x @ (w_t*alpha)^T``.

    Gradients follow the reference parity semantics exactly (or STE when
    ``grad_mode='ste'``); see module docstring. Accepts inputs with any
    number of leading batch dims.
    """
    if grad_mode not in ("parity", "ste"):
        raise ValueError(f"unknown grad_mode: {grad_mode!r}")
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    alpha = jnp.asarray(alpha)
    threshold = jnp.asarray(threshold)
    if mask is None:
        y = _fused_ternary(grad_mode, x2, weight, alpha, threshold)
    else:
        y = _fused_rpb(grad_mode, x2, weight, mask, alpha, threshold)
    return y.reshape(*lead, weight.shape[0]).astype(x.dtype)
