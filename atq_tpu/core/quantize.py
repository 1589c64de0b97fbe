"""Adaptive Ternary Quantization core (TPU-native).

Re-implements the reference quantizer semantics
(`/root/reference/atq/quantizers.py:7-60`) as a pure JAX function that runs
entirely on-device at fixed shapes, so it can be called from inside a jitted
training step every iteration without host synchronization.

Semantics reproduced exactly (see tests/test_quantize.py for golden parity
against the PyTorch reference):

- threshold index rule: ``idx = int(sparsity_target * n)`` over the ascending
  sort of |w| (quantizers.py:24-32)
- edge case ``idx >= n``: threshold = max|w| + 1 (all-zero output,
  quantizers.py:33-35)
- edge case ``idx == 0``: classic fallback ``threshold_factor * mean|w|``
  (quantizers.py:36-38)
- strict comparisons: +1 where ``w > t``, -1 where ``w < -t``
  (quantizers.py:41-43)
- optimal alpha ``sum(w * w_t) / nnz`` with ``mean|w|`` fallback when the
  ternary pattern is all zeros (quantizers.py:46-55); a caller-provided alpha
  overrides it (quantizers.py:58-59)

Gradient semantics: the ternary pattern ``w_t`` is built from constant branch
values of ``jnp.where`` and therefore carries **zero gradient** w.r.t.
``weights`` — identical to the reference's masked assignment of constants
(the reference has no straight-through estimator; see SURVEY.md §2.1).
``ternarize_ste`` provides the STE variant as a documented improvement,
flag-gated at the layer level.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Below this size the plain sort is cheap enough; above it the bit-bisection
# order statistic wins (31 fused bandwidth-bound passes vs an O(n log n)
# sort, which costs milliseconds at multi-million-element widths on TPU).
_SELECT_MIN_SIZE = 16384

# jax.ad_checkpoint.checkpoint_name tag on the quantizer threshold: the
# one data-dependent scalar whose recomputation in a remat backward pass
# costs a full order-statistic kernel run per layer. Remat policies save
# it via nn.layers.quantized_weight_policy().
THRESHOLD_NAME = "atq_ternary_threshold"


def _order_statistic_f32(flat_nonneg: jax.Array, rank: jax.Array):
    """Exact ``sorted(flat)[rank]`` for non-negative float32 without sorting.

    Non-negative IEEE-754 floats order identically to their bit patterns, so
    a 31-step binary search over the uint32 bit space for the smallest value
    ``u`` with ``count(flat <= u) >= rank+1`` recovers the order statistic
    bit-exactly. Each step is one fused compare+sum pass over the array —
    O(n) bandwidth-bound work per step versus the sort's O(n log n) with
    TPU-hostile data movement.
    """
    bits = jax.lax.bitcast_convert_type(flat_nonneg, jnp.uint32)
    target = (rank + 1).astype(jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // jnp.uint32(2)
        ge = jnp.sum((bits <= mid).astype(jnp.int32)) >= target
        return jnp.where(ge, lo, mid + jnp.uint32(1)), jnp.where(ge, mid, hi)

    lo = jnp.uint32(0)
    hi = jnp.uint32(0x7F800000)  # +inf: above every finite |w|
    lo, hi = jax.lax.fori_loop(0, 31, body, (lo, hi))
    return jax.lax.bitcast_convert_type(hi, jnp.float32)


def ternary_threshold(
    weights: jax.Array,
    threshold_factor: float = 0.05,
    sparsity_target=0.3,
) -> jax.Array:
    """The quantizer's sparsity-targeted threshold as a scalar.

    This is the data-dependent half of the quantizer (the |w| sort ->
    ``sorted[int(sparsity*n)]`` rule, quantizers.py:24-38) factored out so
    fused kernels can compute the threshold once per step outside the matmul
    and apply the elementwise ternarization in-kernel. Large float32 tensors
    use an exact bit-bisection order statistic instead of a full sort
    (bit-identical result; see :func:`_order_statistic_f32`).
    """
    dtype = weights.dtype
    abs_w = jnp.abs(weights)
    flat = abs_w.reshape(-1)
    n = flat.size  # static under jit

    st = jnp.asarray(sparsity_target, dtype=jnp.float32)
    # Reference uses python int() which truncates toward zero; sparsity >= 0
    # so floor is equivalent.
    idx = jnp.floor(st * jnp.float32(n)).astype(jnp.int32)
    rank = jnp.clip(idx, 0, n - 1)

    mean_w = None
    if dtype == jnp.float32 and n >= _SELECT_MIN_SIZE:
        from atq_tpu.ops.order_stat import (
            order_stat_eligible,
            order_statistic_reductions,
        )

        if order_stat_eligible(n):
            # One kernel launch for all three data-dependent reductions.
            thr_at_idx, max_w, sum_w = order_statistic_reductions(flat, rank)
            mean_w = sum_w / jnp.float32(n)
        else:
            thr_at_idx = _order_statistic_f32(flat, rank)
            max_w = jnp.max(flat)
    else:
        sorted_w = jnp.sort(flat)
        thr_at_idx = sorted_w[rank]
        max_w = sorted_w[n - 1]

    if mean_w is None:
        mean_w = jnp.mean(abs_w)
    thr_all_zero = max_w + jnp.asarray(1.0, dtype)
    thr_fallback = jnp.asarray(threshold_factor, dtype) * mean_w
    thr = jnp.where(
        idx >= n, thr_all_zero, jnp.where(idx > 0, thr_at_idx, thr_fallback)
    )
    # Remat tag: under a jax.checkpoint policy that saves this name
    # (nn.layers.quantized_weight_policy), the backward pass reuses the
    # scalar instead of re-running the order-statistic kernel — the only
    # expensive stage of the quantizer. Identity outside checkpoint.
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(thr, THRESHOLD_NAME)


def _order_statistic_f32_batched(flat2d: jax.Array, ranks: jax.Array):
    """Batched :func:`_order_statistic_f32`: ``flat2d`` is (L, n)
    non-negative float32, ``ranks`` is (L,) int32; returns the (L,) order
    statistics. All L bisections share the same 31 rounds — each round is
    one fused compare+sum pass over the whole (L, n) block, so batching
    over a stacked weight axis costs the same bandwidth as one layer's
    bisection repeated, with none of the per-layer launch overhead."""
    bits = jax.lax.bitcast_convert_type(flat2d, jnp.uint32)
    target = (ranks + 1).astype(jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // jnp.uint32(2)
        counts = jnp.sum((bits <= mid[:, None]).astype(jnp.int32), axis=1)
        ge = counts >= target
        return (jnp.where(ge, lo, mid + jnp.uint32(1)),
                jnp.where(ge, mid, hi))

    lo = jnp.zeros(flat2d.shape[0], jnp.uint32)
    hi = jnp.full(flat2d.shape[0], 0x7F800000, jnp.uint32)
    lo, hi = jax.lax.fori_loop(0, 31, body, (lo, hi))
    return jax.lax.bitcast_convert_type(hi, jnp.float32)


def ternary_threshold_batched(
    weights: jax.Array,
    threshold_factor: float = 0.05,
    sparsity_target=0.3,
) -> jax.Array:
    """Per-layer thresholds for a STACKED weight tensor.

    ``weights`` is (L, ...) — L independent weight matrices on a leading
    axis (the ``nn.scan`` parameter layout). Returns (L,) thresholds,
    each exactly equal to ``ternary_threshold(weights[l])`` (the bisection
    is bit-exact; the hoisted-quantization path in
    nn/transformer.ScannedTernaryStack computes all layers' thresholds in
    one batched pass instead of one launch per layer per scan iteration).
    ``sparsity_target`` may be a scalar or an (L,) vector (the RPB
    per-layer mutable sparsity)."""
    dtype = weights.dtype
    lead = weights.shape[0]
    flat = jnp.abs(weights).reshape(lead, -1)
    n = flat.shape[1]  # static under jit

    st = jnp.broadcast_to(
        jnp.asarray(sparsity_target, jnp.float32), (lead,))
    idx = jnp.floor(st * jnp.float32(n)).astype(jnp.int32)
    ranks = jnp.clip(idx, 0, n - 1)

    mean_w = None
    if dtype == jnp.float32 and n >= _SELECT_MIN_SIZE:
        from atq_tpu.ops.order_stat import (
            order_stat_eligible,
            order_statistic_reductions_batched,
        )

        if order_stat_eligible(n):
            thr_at_idx, max_w, sum_w = order_statistic_reductions_batched(
                flat, ranks)
            mean_w = sum_w / jnp.float32(n)
        else:
            thr_at_idx = _order_statistic_f32_batched(flat, ranks)
            max_w = jnp.max(flat, axis=1)
    else:
        sorted_w = jnp.sort(flat, axis=1)
        thr_at_idx = jnp.take_along_axis(
            sorted_w, ranks[:, None], axis=1)[:, 0]
        max_w = sorted_w[:, n - 1]

    if mean_w is None:
        mean_w = jnp.mean(flat, axis=1)
    thr_all_zero = max_w.astype(dtype) + jnp.asarray(1.0, dtype)
    thr_fallback = jnp.asarray(threshold_factor, dtype) * mean_w.astype(dtype)
    thr = jnp.where(
        idx >= n, thr_all_zero,
        jnp.where(idx > 0, thr_at_idx.astype(dtype), thr_fallback))
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(thr, THRESHOLD_NAME)


def adaptive_ternary_quantization(
    weights: jax.Array,
    alpha: jax.Array | None = None,
    threshold_factor: float = 0.05,
    sparsity_target=0.3,
):
    """Sparsity-targeted ternarization of a weight tensor.

    Args:
        weights: floating-point weight tensor (any shape).
        alpha: optional scaling factor; if None, the optimal L2-minimizing
            alpha is computed on-device.
        threshold_factor: classic-method factor used when the sparsity index
            degenerates to 0.
        sparsity_target: target fraction of zeros in [0, 1]; may be a python
            float or a traced scalar (so per-epoch schedules don't trigger
            recompilation).

    Returns:
        (w_ternary, alpha): ternary tensor in {-1, 0, +1} with the same shape
        and dtype as ``weights``, and the scaling factor.
    """
    dtype = weights.dtype
    abs_w = jnp.abs(weights)
    threshold = ternary_threshold(weights, threshold_factor, sparsity_target)

    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)
    # Constant branch values => zero gradient to `weights` through w_ternary,
    # matching the reference's non-differentiable masked assignment.
    w_ternary = jnp.where(
        weights > threshold, one, jnp.where(weights < -threshold, -one, zero)
    )

    nonzero_count = jnp.sum(w_ternary != 0).astype(dtype)
    # `weights` is intentionally NOT stop-gradiented here: in the reference,
    # sum(weights * w_t) is differentiable w.r.t. weights when alpha=None.
    optimal_alpha = jnp.where(
        nonzero_count > 0,
        jnp.sum(weights * w_ternary) / jnp.maximum(nonzero_count, one),
        jnp.mean(abs_w),
    )

    if alpha is None:
        alpha = optimal_alpha

    return w_ternary, alpha


def adaptive_ternary_quantization_batched(
    weights: jax.Array,
    alpha: jax.Array | None = None,
    threshold_factor: float = 0.05,
    sparsity_target=0.3,
):
    """Batched :func:`adaptive_ternary_quantization` over a leading layer
    axis: ``weights`` (L, ...), ``alpha`` None or broadcastable to (L,),
    ``sparsity_target`` scalar or (L,). Returns ``(w_ternary, alpha)``
    with ``alpha`` shaped (L,). Ternary decisions are bit-identical to
    the per-layer function (exact threshold; strict compares); the alpha
    reductions run per layer over axis 1..N (same sums, batched)."""
    dtype = weights.dtype
    lead = weights.shape[0]
    reduce_axes = tuple(range(1, weights.ndim))
    bshape = (lead,) + (1,) * (weights.ndim - 1)

    threshold = ternary_threshold_batched(
        weights, threshold_factor, sparsity_target).reshape(bshape)

    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)
    w_ternary = jnp.where(
        weights > threshold, one,
        jnp.where(weights < -threshold, -one, zero))

    nonzero = jnp.sum(w_ternary != 0, axis=reduce_axes).astype(dtype)
    optimal_alpha = jnp.where(
        nonzero > 0,
        jnp.sum(weights * w_ternary, axis=reduce_axes)
        / jnp.maximum(nonzero, one),
        jnp.mean(jnp.abs(weights), axis=reduce_axes),
    )
    if alpha is None:
        alpha = optimal_alpha
    else:
        alpha = jnp.broadcast_to(jnp.asarray(alpha).reshape(lead, -1)[:, 0],
                                 (lead,))
    return w_ternary, alpha


def ternarize_ste_batched(
    weights: jax.Array,
    alpha: jax.Array | None = None,
    threshold_factor: float = 0.05,
    sparsity_target=0.3,
):
    """Batched :func:`ternarize_ste` (the STE identity is elementwise, so
    it composes with the batched quantizer unchanged)."""
    w_ternary, alpha = adaptive_ternary_quantization_batched(
        weights, alpha=alpha, threshold_factor=threshold_factor,
        sparsity_target=sparsity_target,
    )
    return _ste_identity(weights, w_ternary), alpha


@jax.custom_vjp
def _ttq_combine_batched(weights, pos_mask, neg_mask, wp, wn):
    bshape = (weights.shape[0],) + (1,) * (weights.ndim - 1)
    return pos_mask * wp.reshape(bshape) - neg_mask * wn.reshape(bshape)


def _ttq_combine_batched_fwd(weights, pos_mask, neg_mask, wp, wn):
    return (_ttq_combine_batched(weights, pos_mask, neg_mask, wp, wn),
            (pos_mask, neg_mask, wp, wn))


def _ttq_combine_batched_bwd(res, g):
    pos_mask, neg_mask, wp, wn = res
    lead = pos_mask.shape[0]
    axes = tuple(range(1, pos_mask.ndim))
    bshape = (lead,) + (1,) * (pos_mask.ndim - 1)
    dead = 1.0 - pos_mask - neg_mask
    # Per-layer TTQ rule (see _ttq_combine_bwd): mean-normalized scale
    # grads, scale-weighted straight-through on the latent weights.
    dw = g * (pos_mask * wp.reshape(bshape) + neg_mask * wn.reshape(bshape)
              + dead)
    n_pos = jnp.maximum(jnp.sum(pos_mask, axis=axes), 1.0)
    n_neg = jnp.maximum(jnp.sum(neg_mask, axis=axes), 1.0)
    dwp = (jnp.sum(g * pos_mask, axis=axes) / n_pos).reshape(wp.shape)
    dwn = (-jnp.sum(g * neg_mask, axis=axes) / n_neg).reshape(wn.shape)
    return dw, jnp.zeros_like(pos_mask), jnp.zeros_like(neg_mask), dwp, dwn


_ttq_combine_batched.defvjp(_ttq_combine_batched_fwd,
                            _ttq_combine_batched_bwd)


def ternarize_ttq_batched(
    weights: jax.Array,
    wp: jax.Array,
    wn: jax.Array,
    threshold_factor: float = 0.05,
    sparsity_target=0.3,
):
    """Batched :func:`ternarize_ttq` over a leading layer axis. ``wp``/
    ``wn`` broadcastable to (L,); per-layer scale gradients use per-layer
    mean normalization (identical to L separate ternarize_ttq calls)."""
    lead = weights.shape[0]
    bshape = (lead,) + (1,) * (weights.ndim - 1)
    threshold = ternary_threshold_batched(
        weights, threshold_factor, sparsity_target).reshape(bshape)
    pos = (weights > threshold).astype(weights.dtype)
    neg = (weights < -threshold).astype(weights.dtype)
    wp = jnp.broadcast_to(jnp.asarray(wp).reshape(lead, -1)[:, 0], (lead,))
    wn = jnp.broadcast_to(jnp.asarray(wn).reshape(lead, -1)[:, 0], (lead,))
    return _ttq_combine_batched(weights, pos, neg, wp, wn)


@jax.custom_vjp
def _ste_identity(weights: jax.Array, w_ternary: jax.Array) -> jax.Array:
    return w_ternary


def _ste_identity_fwd(weights, w_ternary):
    return w_ternary, None


def _ste_identity_bwd(_, g):
    # Straight-through: the quantizer behaves as identity in the backward
    # pass, so the latent weights receive the full upstream gradient.
    return g, jnp.zeros_like(g)


_ste_identity.defvjp(_ste_identity_fwd, _ste_identity_bwd)


def ternarize_ste(
    weights: jax.Array,
    alpha: jax.Array | None = None,
    threshold_factor: float = 0.05,
    sparsity_target=0.3,
):
    """ATQ with a straight-through estimator on the ternary pattern.

    This is the documented improvement over the reference's no-STE gradient
    flow (SURVEY.md §2.1 gradient quirk): the forward pass is bitwise
    identical to :func:`adaptive_ternary_quantization`, but the backward pass
    routes the upstream gradient straight through to the latent weights.
    """
    w_ternary, alpha = adaptive_ternary_quantization(
        weights, alpha=alpha, threshold_factor=threshold_factor,
        sparsity_target=sparsity_target,
    )
    return _ste_identity(weights, w_ternary), alpha


@jax.custom_vjp
def _ttq_combine(weights, pos_mask, neg_mask, wp, wn):
    return pos_mask * wp - neg_mask * wn


def _ttq_combine_fwd(weights, pos_mask, neg_mask, wp, wn):
    return _ttq_combine(weights, pos_mask, neg_mask, wp, wn), (
        pos_mask, neg_mask, wp, wn)


def _ttq_combine_bwd(res, g):
    pos_mask, neg_mask, wp, wn = res
    dead = 1.0 - pos_mask - neg_mask
    # TTQ gradient rule (Zhu et al. 2017, arXiv:1612.01064 §3): the
    # scales accumulate their side's gradients, latent weights get the
    # scale-weighted straight-through gradient. The paper compensates the
    # scale gradients' O(group size) magnitude with a separate scale
    # learning rate; here they are MEAN-normalized instead (same effect,
    # one optimizer) — raw sums over ~1e5-element groups blow past the
    # weight gradients and destabilize adam within an epoch (measured:
    # immediate collapse to chance on the classification recipe).
    dw = g * (pos_mask * wp + neg_mask * wn + dead)
    n_pos = jnp.maximum(jnp.sum(pos_mask), 1.0)
    n_neg = jnp.maximum(jnp.sum(neg_mask), 1.0)
    dwp = (jnp.sum(g * pos_mask) / n_pos).reshape(wp.shape)
    dwn = (-jnp.sum(g * neg_mask) / n_neg).reshape(wn.shape)
    return dw, jnp.zeros_like(pos_mask), jnp.zeros_like(neg_mask), dwp, dwn


_ttq_combine.defvjp(_ttq_combine_fwd, _ttq_combine_bwd)


def ternarize_ttq(
    weights: jax.Array,
    wp: jax.Array,
    wn: jax.Array,
    threshold_factor: float = 0.05,
    sparsity_target=0.3,
):
    """Trained Ternary Quantization (PAPERS.md: Zhu et al., arXiv:1612.01064).

    Same sparsity-targeted threshold selection as the reference quantizer,
    but with SEPARATE learnable positive/negative scales and the TTQ
    backward rule: the scales accumulate the gradients of the weights they
    quantize, and latent weights receive a scale-weighted straight-through
    gradient. Returns the effective weight ``wp·[w>t] − wn·[w<−t]``
    (scales folded in — callers must NOT multiply by alpha again).
    """
    threshold = ternary_threshold(weights, threshold_factor, sparsity_target)
    pos = (weights > threshold).astype(weights.dtype)
    neg = (weights < -threshold).astype(weights.dtype)
    return _ttq_combine(weights, pos, neg, wp, wn)


def ternary_distribution(w_ternary: jax.Array) -> dict:
    """Fractions of {-1, 0, +1} values — used by training-time introspection
    (reference: train.py:273-295 weight-distribution report)."""
    total = w_ternary.size
    return {
        "neg": jnp.sum(w_ternary == -1) / total,
        "zero": jnp.sum(w_ternary == 0) / total,
        "pos": jnp.sum(w_ternary == 1) / total,
    }
