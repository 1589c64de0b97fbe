"""Quantized linear layers and selective gradient routing (Flax).

TPU-native re-designs of the reference layer classes:

- :class:`TernaryLinear`       <- /root/reference/atq/layers.py:7-43
- :class:`ResidualPrecisionBoostLinear`
                               <- /root/reference/atq/precision_boost.py:9-91
- :func:`apply_selective_routing` / :func:`selective_gradient_routing`
                               <- /root/reference/atq/routing.py:4-59

Design notes (see SURVEY.md §2.1):

* Weight layout is (out_features, in_features) — torch's layout — so
  checkpoints and golden tests line up element-for-element. The matmul is
  ``x @ w.T`` which XLA lowers to the same MXU contraction either way.

* The per-epoch mutable ``sparsity_target`` lives in a ``'quant'`` variable
  collection: the trainer overwrites the *values* of that pytree between
  epochs, which never triggers recompilation (the jitted step sees the same
  shapes/dtypes every time). This replaces the reference's Python attribute
  mutation (mixed_precision_atq.py:130-145).

* Gradient semantics default to exact reference parity: in ``TernaryLinear``
  the latent weight receives ZERO gradient (only alpha/bias train); in
  ``ResidualPrecisionBoostLinear`` only the masked top-k% entries receive
  gradient. ``grad_mode='ste'`` enables the straight-through estimator as the
  documented improvement.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from atq_tpu.core.quantize import (
    adaptive_ternary_quantization,
    ternarize_ste,
    ternarize_ttq,
    ternary_threshold,
)
from atq_tpu.nn.initializers import bias_uniform_torch, kaiming_uniform_torch

DEFAULT_SPARSITY = 0.3

# Rematerialization tag for the dequantized effective weight. Profiling
# the bert-class scanned stack showed the quantize -> mask-blend -> cast
# pipeline re-running for every matmul *use* of a weight (forward, remat
# forward, grad-wrt-input), which put each big matmul at ~1.04 ms vs
# 0.614 ms for the same-shape pure bf16 matmul on the same chip. Layers
# tag the finished effective weight with this name so a remat policy
# (jax.checkpoint_policies.save_only_these_names(QUANTIZED_WEIGHT_NAME))
# saves the small bf16 weight copy instead of re-deriving it — see
# nn.transformer.ScannedTernaryStack.
QUANTIZED_WEIGHT_NAME = "atq_quantized_weight"


def _tag_weight(w: jax.Array) -> jax.Array:
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(w, QUANTIZED_WEIGHT_NAME)


def quantized_weight_policy():
    """Remat policy for ``jax.checkpoint``/``nn.remat``: recompute
    activations, but keep the tagged dequantized weights AND the
    quantizer threshold scalars (saving the weight alone does not help:
    the mask-blend backward still depends on the ternary pattern, so
    remat would re-run the order-statistic kernel to rebuild it — the
    saved threshold makes that rebuild a cheap elementwise ``where``)."""
    from atq_tpu.core.quantize import THRESHOLD_NAME

    return jax.checkpoint_policies.save_only_these_names(
        QUANTIZED_WEIGHT_NAME, THRESHOLD_NAME)


def quantized_weight_and_dots_policy():
    """``quantized_weight_policy`` UNIONED with XLA's
    ``dots_with_no_batch_dims_saveable``: additionally save every
    projection-matmul output (qkv/out/FFN — their dots carry no batch
    dims), so the backward pass recomputes only elementwise work
    (norms, GELU, softmax) and the batched attention einsums. This
    trades ~O(tokens x width) bf16 residuals per layer for skipping
    the full matmul recompute that plain remat pays — the right point
    on the memory/FLOPs curve whenever the saved residuals fit in HBM
    (bert-class stacks at the benchmarked batches: ~0.2-0.3 GB/layer).
    Used by ScannedTernaryStack(remat_policy='save_dots')."""
    return jax.checkpoint_policies.save_from_both_policies(
        quantized_weight_policy(),
        jax.checkpoint_policies.dots_with_no_batch_dims_saveable)


def _use_fused(fused: Optional[bool], dtype) -> bool:
    """Resolve the layer's fused-matmul flag (ops/fused_linear.py).

    Auto default is OFF: measured on TPU (v5e-class, 2026-08), the dense
    XLA path (quantize -> blend -> matmul, with the threshold computed by
    the one-launch Pallas order-statistic kernel both paths share) beats
    the fused Pallas matmuls at every tested shape — XLA's GEMM emitter
    out-pipelines the hand-written revisited-accumulator kernels
    (fused/dense step: 0.96x at reference shapes, 0.81x at 8x width; see
    benchmarks/BENCHMARKS.md). The fused path remains available per-layer
    (``fused=True``) or globally (``ATQ_FUSED=1``) and computes identical
    outputs and gradients (tests/test_fused_linear.py,
    benchmarks/tpu_selftest.py).
    """
    if fused is not None:
        return fused
    import os

    return os.environ.get("ATQ_FUSED", "0") == "1" and dtype is None


def apply_selective_routing(x, threshold: float = 0.05,
                            importance_factor: float = 0.3):
    """Identity pass-through — the reference's applied routing function is a
    placeholder that returns its input unchanged (routing.py:4-20). Kept as a
    named op so model code reads like the reference and the full variant can
    be swapped in behind a flag."""
    del threshold, importance_factor
    return x


@jax.custom_vjp
def _routed_identity(x, importance_factor):
    return x


def _routed_fwd(x, importance_factor):
    return x, (x, importance_factor)


def _routed_bwd(res, g):
    x, importance_factor = res
    importance = jnp.abs(x)
    n = importance.size
    # torch.kthvalue(k) is the k-th smallest, 1-indexed (routing.py:43-50).
    k = int((1.0 - importance_factor) * n)
    if k < n:
        flat = jnp.sort(importance.reshape(-1))
        threshold = flat[max(k - 1, 0)]
    else:
        threshold = jnp.asarray(0.0, x.dtype)
    mask = (importance > threshold).astype(g.dtype)
    return g * mask, None


_routed_identity.defvjp(_routed_fwd, _routed_bwd)


def selective_gradient_routing(x, threshold: float = 0.05,
                               importance_factor: float = 0.3):
    """Full routing variant (reference: routing.py:22-59): identity forward,
    backward masks gradients to the top ``importance_factor`` fraction of
    activations by |input|. Not used on the parity path (the reference never
    calls it), provided for completeness."""
    del threshold  # unused by the reference backward as well
    return _routed_identity(x, importance_factor)


def _quantize(weight, alpha, sparsity_target, grad_mode: str):
    if grad_mode == "ste":
        return ternarize_ste(weight, alpha=alpha,
                             sparsity_target=sparsity_target)
    return adaptive_ternary_quantization(weight, alpha=alpha,
                                         sparsity_target=sparsity_target)



def _ttq_scale_init(weight, sparsity_target, positive: bool, dtype):
    """Data-dependent init for the TTQ scales: the mean |w| of the side
    the scale will quantize (the paper initializes scales from the data;
    starting at 1.0 inflates outputs ~50x versus the optimal alpha and
    saturates downstream softmaxes — measured: training frozen at chance).
    """
    def init(_key, shape):
        thr = ternary_threshold(weight, sparsity_target=sparsity_target)
        m = (weight > thr) if positive else (weight < -thr)
        s = jnp.sum(jnp.abs(weight) * m) / jnp.maximum(jnp.sum(m), 1.0)
        return jnp.full(shape, s, dtype)

    return init


def _packed_forward(entry, x, features: int):
    """Serve this layer from its exported 2-bit planes (the 'packed'
    variable collection, serve/packed_model.py:export_packed_collection).
    Bias lives inside the entry."""
    from atq_tpu.serve.packed_model import packed_linear_apply

    lead = x.shape[:-1]
    y = packed_linear_apply(entry, x.reshape(-1, x.shape[-1]))
    return y.reshape(*lead, features)


class TernaryLinear(nn.Module):
    """Linear layer over ternarized weights with a learnable scalar alpha.

    Reference: atq/layers.py:7-43. Uses the quantizer *defaults*
    (sparsity_target=0.3) because the reference forward passes only
    ``alpha=self.alpha`` (layers.py:37-40), and the driver's schedule pushes
    never reach it (TernaryLinear has no sparsity_target attribute). Same
    behavior in train and eval.
    """

    features: int
    use_bias: bool = True
    grad_mode: str = "parity"  # 'parity' | 'ste'
    fused: Optional[bool] = None  # None = auto (fused when dtype is None)
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    # Hoisted-quantization mode (nn/hoist.py, ScannedTernaryStack
    # hoist_quant=True): the 'weight' this layer reads has ALREADY been
    # quantized/blended/cast outside the scan (nn.map_variables), so the
    # forward is a plain matmul. Init still runs the full path (all
    # params and quant vars are created identically).
    pre_quantized: bool = False

    @nn.compact
    def __call__(self, x):
        if self.has_variable("packed", "entry"):
            return _packed_forward(self.get_variable("packed", "entry"),
                                   x, self.features)
        in_features = x.shape[-1]
        weight = self.param(
            "weight", kaiming_uniform_torch(math.sqrt(5)),
            (self.features, in_features), self.param_dtype,
        )
        alpha = self.param("alpha", nn.initializers.ones, (1,),
                           self.param_dtype)

        if self.pre_quantized and not self.is_initializing():
            if self.dtype is not None:
                x = x.astype(self.dtype)
                weight = weight.astype(self.dtype)
            y = jnp.matmul(x, weight.T)
        elif self.grad_mode == "ttq":
            # Trained Ternary Quantization (PAPERS.md, arXiv:1612.01064):
            # separate learnable +/- scales with the TTQ gradient rule.
            wp = self.param(
                "wp", _ttq_scale_init(weight, DEFAULT_SPARSITY, True,
                                      self.param_dtype), (1,))
            wn = self.param(
                "wn", _ttq_scale_init(weight, DEFAULT_SPARSITY, False,
                                      self.param_dtype), (1,))
            w_eff = ternarize_ttq(weight, wp, wn,
                                  sparsity_target=DEFAULT_SPARSITY)
            if self.dtype is not None:
                x = x.astype(self.dtype)
                w_eff = w_eff.astype(self.dtype)
            y = jnp.matmul(x, _tag_weight(w_eff).T)
        elif _use_fused(self.fused, self.dtype):
            from atq_tpu.ops.fused_linear import fused_quantized_linear

            thr = ternary_threshold(weight, sparsity_target=DEFAULT_SPARSITY)
            y = fused_quantized_linear(x, weight, alpha, thr,
                                       grad_mode=self.grad_mode)
        else:
            w_ternary, a = _quantize(weight, alpha, DEFAULT_SPARSITY,
                                     self.grad_mode)
            w_eff = w_ternary * a
            if self.dtype is not None:
                x = x.astype(self.dtype)
                w_eff = w_eff.astype(self.dtype)
            y = jnp.matmul(x, _tag_weight(w_eff).T)
        if self.use_bias:
            bias = self.param("bias", bias_uniform_torch(in_features),
                              (self.features,), self.param_dtype)
            y = y + bias
        return y


def _precision_mask(weight: jax.Array, precision_ratio: float) -> jax.Array:
    """Fixed binary mask marking the top ``precision_ratio`` fraction of |w|
    at init (reference: precision_boost.py:49-60). Non-learnable; per-epoch
    precision_ratio updates in the reference never recompute it.

    Stored as bool — 4x less state than the f32 of the torch reference
    (one mask per weight matrix adds up: ~1.9 GiB of a 470M-param
    model's 6.8 GiB state). Arithmetic uses promote on use, so f32
    masks from old checkpoints / torch imports keep working."""
    flat = jnp.abs(weight).reshape(-1)
    k = int(precision_ratio * flat.size)
    mask = jnp.zeros(flat.shape, jnp.bool_)
    if k > 0:
        _, idx = jax.lax.top_k(flat, k)
        mask = mask.at[idx].set(True)
    return mask.reshape(weight.shape)


class ResidualPrecisionBoostLinear(nn.Module):
    """TernaryLinear plus a fixed full-precision residual on critical weights.

    Reference: atq/precision_boost.py:9-91. Forward computes
    ``w_mixed = w_ternary * alpha * (1 - mask) + weight * mask`` so the masked
    top-k% of weights stay (and train in) full precision; everything else is
    frozen ternary (parity grad mode).

    ``sparsity_target`` is a mutable scalar in the 'quant' collection so
    schedules (core/schedules.py) update it without recompiling.
    """

    features: int
    precision_ratio: float = 0.05
    use_bias: bool = True
    sparsity_target: float = DEFAULT_SPARSITY
    grad_mode: str = "parity"
    fused: Optional[bool] = None  # None = auto (fused when dtype is None)
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    pre_quantized: bool = False  # see TernaryLinear.pre_quantized

    @nn.compact
    def __call__(self, x):
        if self.has_variable("packed", "entry"):
            return _packed_forward(self.get_variable("packed", "entry"),
                                   x, self.features)
        in_features = x.shape[-1]
        weight = self.param(
            "weight", kaiming_uniform_torch(math.sqrt(5)),
            (self.features, in_features), self.param_dtype,
        )
        alpha = self.param("alpha", nn.initializers.ones, (1,),
                           self.param_dtype)
        if self.pre_quantized and not self.is_initializing():
            # 'weight' is the hoisted effective (mask-blended) weight.
            if self.dtype is not None:
                x = x.astype(self.dtype)
                weight = weight.astype(self.dtype)
            y = jnp.matmul(x, weight.T)
            if self.use_bias:
                bias = self.param("bias", bias_uniform_torch(in_features),
                                  (self.features,), self.param_dtype)
                y = y + bias
            return y
        mask_var = self.variable(
            "quant", "precision_mask",
            lambda: _precision_mask(weight, self.precision_ratio),
        )
        sparsity_var = self.variable(
            "quant", "sparsity_target",
            lambda: jnp.asarray(self.sparsity_target, jnp.float32),
        )

        # Stored bool (4x less state); promote once here — f32 masks from
        # old checkpoints / torch imports pass through unchanged.
        mask = mask_var.value.astype(weight.dtype)
        if self.grad_mode == "ttq":
            wp = self.param(
                "wp", _ttq_scale_init(weight, self.sparsity_target, True,
                                      self.param_dtype), (1,))
            wn = self.param(
                "wn", _ttq_scale_init(weight, self.sparsity_target, False,
                                      self.param_dtype), (1,))
            w_t = ternarize_ttq(weight, wp, wn,
                                sparsity_target=sparsity_var.value)
            w_mixed = w_t * (1.0 - mask) + weight * mask
            if self.dtype is not None:
                x = x.astype(self.dtype)
                w_mixed = w_mixed.astype(self.dtype)
            y = jnp.matmul(x, _tag_weight(w_mixed).T)
        elif _use_fused(self.fused, self.dtype):
            from atq_tpu.ops.fused_linear import fused_quantized_linear

            thr = ternary_threshold(
                weight, sparsity_target=sparsity_var.value)
            y = fused_quantized_linear(x, weight, alpha, thr, mask=mask,
                                       grad_mode=self.grad_mode)
        else:
            w_ternary, a = _quantize(weight, alpha, sparsity_var.value,
                                     self.grad_mode)
            w_mixed = w_ternary * a * (1.0 - mask) + weight * mask

            if self.dtype is not None:
                x = x.astype(self.dtype)
                w_mixed = w_mixed.astype(self.dtype)
            y = jnp.matmul(x, _tag_weight(w_mixed).T)
        if self.use_bias:
            bias = self.param("bias", bias_uniform_torch(in_features),
                              (self.features,), self.param_dtype)
            y = y + bias
        return y

    @staticmethod
    def quantized_weights(params: dict, quant: dict):
        """Ternary weights + alpha for analysis/bit-packing, computed from a
        layer's param/quant pytrees (reference: precision_boost.py:76-91)."""
        return adaptive_ternary_quantization(
            params["weight"], alpha=params["alpha"],
            sparsity_target=quant["sparsity_target"],
        )


# Reference-name alias: the reference exports SelectiveGradientRouting
# (a torch.autograd.Function class, routing.py:22-59); in JAX the same
# semantics are a custom_vjp FUNCTION. Bound so
# `from atq_tpu import SelectiveGradientRouting` keeps working for
# migrating code; calling it applies the routing.
SelectiveGradientRouting = selective_gradient_routing
