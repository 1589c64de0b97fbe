"""FLOP accounting and MFU (model FLOPs utilization) reporting.

The reference estimates FLOPs with forward hooks on Conv2d/Linear modules
(``/root/reference/utils/metrics.py:59-107``) and never relates them to
hardware peak. The TPU-native harness instead asks XLA itself: a lowered
``jit`` computation exposes the compiler's own FLOP count via
``compiled.cost_analysis()``, which covers every op in the step (both
models, backward pass, optimizer) rather than a hand model of the forward.
MFU = achieved FLOPs/s ÷ the chip's peak matmul FLOPs/s, the standard
utilization metric for TPU workloads.

Peak numbers are bf16/int8-era MXU peaks per chip (public spec sheets).
fp32 work runs at a fraction of bf16 peak on the MXU, so fp32-dominated
configs will honestly report low MFU against the bf16 ceiling — that is
the actionable number (it says "cast to bf16", not "the chip is busy").
"""
from __future__ import annotations

from typing import Any, Optional

import jax

__all__ = ["compiled_flops", "peak_flops_per_chip", "mfu"]

# device_kind substring -> peak dense matmul FLOPs/s per chip (bf16).
_PEAK_BF16 = {
    "v5 lite": 197e12,   # TPU v5e (v5 lite): 197 TFLOP/s bf16
    "v5e": 197e12,
    "v5p": 459e12,
    "v6": 918e12,        # Trillium
    "v4": 275e12,
    "v3": 123e12,
    "v2": 46e12,
}


def compiled_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """XLA's FLOP count for one invocation of a jitted function.

    Lowers and compiles ``jitted_fn`` for the given abstract arguments and
    reads the compiler's cost analysis. Returns None when the backend does
    not expose cost analysis (older CPU plugins) — callers should then skip
    the MFU line rather than invent a number.
    """
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):  # one entry per device
            analysis = analysis[0]
        flops = analysis.get("flops") if analysis else None
        return float(flops) if flops else None
    except Exception:
        return None


def peak_flops_per_chip(device: Optional[Any] = None) -> Optional[float]:
    """Peak bf16 MXU FLOPs/s for ``device`` (default: first local device)."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _PEAK_BF16.items():
        if key in kind:
            return peak
    return None


def mfu(flops_per_step: Optional[float], seconds_per_step: float,
        device: Optional[Any] = None) -> Optional[float]:
    """Model FLOPs utilization in [0, 1]: achieved / peak. None off-TPU."""
    peak = peak_flops_per_chip(device)
    if peak is None or flops_per_step is None or seconds_per_step <= 0:
        return None
    return flops_per_step / seconds_per_step / peak
