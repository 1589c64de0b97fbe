"""Hoisted quantization for scanned ternary stacks.

The scanned stack (nn/transformer.py:ScannedTernaryStack) runs one traced
layer body L times with weights stacked on a leading layer axis. With the
quantizer INSIDE the body, every scan iteration re-runs the whole
quantize -> alpha -> mask-blend -> cast chain as a string of small ops —
measured at bert-base (benchmarks/r5/): the QAT step costs 158.1 ms where
the same-shape dense step costs 102.5 ms, and only ~5 ms of the 55.6 ms
gap is the threshold selection itself; the rest is per-iteration launch
and fusion overhead of the in-scan quantize chains.

The TPU-first layout: quantization depends only on parameters, never on
activations, so it is computed ONCE per step, OUTSIDE the scan, batched
over the stacked layer axis (one fused elementwise chain over (L, out, in)
tensors, one grid-batched threshold kernel per weight kind — see
core/quantize.py ternary_threshold_batched and
ops/order_stat.py order_statistic_reductions_batched). The scan body then
consumes finished effective weights through ``nn.map_variables`` and runs
pure matmuls (layers in ``pre_quantized`` mode).

Semantics are preserved exactly: ternary decisions are bit-identical
(exact batched threshold), alpha/STE/TTQ gradient rules are the batched
equivalents of the per-layer functions (tests/test_hoist.py pins
forward/grad parity against the unhoisted stack for every grad mode).
"""

from __future__ import annotations

from typing import Mapping, Optional

import jax.numpy as jnp

from atq_tpu.core.quantize import (
    adaptive_ternary_quantization_batched,
    ternarize_ste_batched,
    ternarize_ttq_batched,
)
from atq_tpu.nn.layers import DEFAULT_SPARSITY


def _effective_weight(node: Mapping, quant_node: Mapping, grad_mode: str,
                      dtype) -> jnp.ndarray:
    """The stacked effective weight exactly as the layer forward builds it
    (nn/layers.py TernaryLinear / ResidualPrecisionBoostLinear):
    quantize -> scale -> optional RPB mask blend -> optional AMP cast."""
    weight = node["weight"]
    lead = weight.shape[0]
    bshape = (lead,) + (1,) * (weight.ndim - 1)

    mask = None
    sparsity = DEFAULT_SPARSITY
    if quant_node:
        if "sparsity_target" in quant_node:
            sparsity = quant_node["sparsity_target"]
        if "precision_mask" in quant_node:
            mask = quant_node["precision_mask"].astype(weight.dtype)

    if grad_mode == "ttq" and "wp" in node and "wn" in node:
        w_eff = ternarize_ttq_batched(weight, node["wp"], node["wn"],
                                      sparsity_target=sparsity)
    else:
        quantize = (ternarize_ste_batched if grad_mode == "ste"
                    else adaptive_ternary_quantization_batched)
        w_t, a = quantize(weight, alpha=node["alpha"],
                          sparsity_target=sparsity)
        w_eff = w_t * a.reshape(bshape)

    if mask is not None:
        w_eff = w_eff * (1.0 - mask) + weight * mask
    if dtype is not None:
        w_eff = w_eff.astype(dtype)
    return w_eff


def _is_ternary_node(node) -> bool:
    return (isinstance(node, Mapping) and "weight" in node
            and "alpha" in node)


def _walk(params, quant, grad_mode, dtype):
    out = {}
    for key, value in params.items():
        q = quant.get(key, {}) if isinstance(quant, Mapping) else {}
        if _is_ternary_node(value):
            out[key] = {**dict(value),
                        "weight": _effective_weight(value, q, grad_mode,
                                                    dtype)}
        elif isinstance(value, Mapping):
            out[key] = _walk(value, q, grad_mode, dtype)
        else:
            out[key] = value
    return out


def make_hoist_transform(quant_tree, grad_mode: str,
                         dtype: Optional[jnp.dtype]):
    """``trans_in_fn`` for ``nn.map_variables(target, ["params"], ...)``
    over a scanned stack: replaces every ternary layer's stacked 'weight'
    with its batched effective weight. ``quant_tree`` is the stack's
    stacked 'quant' collection subtree (closed over — masks/sparsity are
    read, never differentiated); pass ``{}`` when the stack has no quant
    vars. The trans fn receives/returns the mapped-collections dict."""
    quant_tree = quant_tree or {}

    def trans_in(vars_):
        params = vars_.get("params", {})
        if not params:  # init-time safety; init never maps (init=False)
            return vars_
        return {**dict(vars_),
                "params": _walk(params, quant_tree, grad_mode, dtype)}

    return trans_in
