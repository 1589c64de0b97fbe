"""Packed serving path: run trained ATQ models from 2-bit weights.

The reference motivates bit-packing with edge deployment but can only
simulate it (atq/bit_packing.py:148-176 unpacks in Python before every
matmul). Here the trained quantized layers are exported ONCE into the
kernel-native planar 2-bit layout plus a sparse full-precision correction,
and inference runs the Pallas packed matmul directly from those planes:

    w_mixed = w_t * alpha * (1 - mask) + w * mask
            = w_t * alpha + mask * (w - w_t * alpha)
    y = packed_matmul(x, packed(w_t), alpha) + x @ correction.T + bias

``correction = mask * (w - w_t * alpha)`` has only precision_ratio (5-25%)
nonzeros; it is stored bf16 (the values are full-precision residuals whose
products accumulate in f32). Total weight bytes per layer:
K*N/4 (2-bit planes) + 2*K*N (bf16 correction) vs 4*K*N dense f32 — and the
correction is optional for pure-TernaryLinear layers.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from atq_tpu.core.packing import pack_planar
from atq_tpu.core.quantize import adaptive_ternary_quantization
from atq_tpu.ops.ternary_matmul import packed_ternary_matmul


def pack_quantized_layer(params: Dict, quant: Optional[Dict] = None) -> Dict:
    """Export one TernaryLinear/RPB layer's params into serving form."""
    weight = np.asarray(params["weight"])
    alpha = params["alpha"]
    sparsity = (quant or {}).get("sparsity_target", 0.3)
    w_t, a = adaptive_ternary_quantization(
        jnp.asarray(weight), alpha=jnp.asarray(alpha),
        sparsity_target=sparsity,
    )
    packed = pack_planar(w_t)
    entry = {
        "packed": packed,
        "alpha": jnp.asarray(a).reshape(()),
        "shape": tuple(weight.shape),
    }
    if "bias" in params:
        entry["bias"] = jnp.asarray(params["bias"])
    mask = (quant or {}).get("precision_mask")
    if mask is not None:
        correction = np.asarray(mask) * (
            weight - np.asarray(w_t) * float(jnp.asarray(a).reshape(()))
        )
        entry["correction"] = jnp.asarray(correction, jnp.bfloat16)
    return entry


def packed_linear_apply(entry: Dict, x: jax.Array) -> jax.Array:
    """Forward through a packed layer. When an RPB correction is present
    the whole op runs as ONE fused Pallas kernel (ternary dots + correction
    dot accumulate in the same VMEM tile — the in-kernel sparse correction
    of the design north star)."""
    n, k = entry["shape"]
    if "correction" in entry:
        from atq_tpu.ops.ternary_matmul import packed_ternary_matmul_rpb

        y = packed_ternary_matmul_rpb(x, entry["packed"],
                                      entry["correction"], (n, k),
                                      alpha=entry["alpha"])
    else:
        y = packed_ternary_matmul(x, entry["packed"], (n, k),
                                  alpha=entry["alpha"])
    if "bias" in entry:
        y = y + entry["bias"]
    return y


def pack_quantized_params(params: Dict, quant: Dict,
                          layer_names) -> Dict[str, Dict]:
    """Pack a set of quantized layers by name from a model's pytrees."""
    return {
        name: pack_quantized_layer(params[name], quant.get(name))
        for name in layer_names
    }


class PackedClassifier:
    """Serving wrapper for ATQImageClassifier: FP conv features + packed
    ternary classifier head (the reference's deployment target)."""

    def __init__(self, params: Dict, quant: Dict, batch_stats: Dict,
                 use_rpb: bool = True, hidden_size: int = 128):
        from atq_tpu.models.image_classifier import ATQImageClassifier

        self._model = ATQImageClassifier(use_rpb=use_rpb,
                                         hidden_size=hidden_size)
        self._features_vars = {
            "params": params["features"],
            "batch_stats": batch_stats["features"],
        }
        self.packed = pack_quantized_params(
            params, quant, ["classifier_0", "classifier_3"]
        )
        self._apply = jax.jit(self._forward)

    def _forward(self, x):
        from atq_tpu.models.image_classifier import _ConvFeatures

        features = _ConvFeatures().apply(self._features_vars, x,
                                         train=False)
        h = packed_linear_apply(self.packed["classifier_0"], features)
        h = jax.nn.relu(h)
        return packed_linear_apply(self.packed["classifier_3"], h)

    def __call__(self, x):
        return self._apply(x)

    def memory_footprint_bytes(self) -> Dict[str, int]:
        """Serving weight bytes: packed planes + corrections + bias."""
        total = 0
        for entry in self.packed.values():
            total += entry["packed"].size
            if "correction" in entry:
                total += entry["correction"].size * 2
            if "bias" in entry:
                total += entry["bias"].size * 4
        dense = sum(int(np.prod(e["shape"])) * 4
                    for e in self.packed.values())
        return {"packed_bytes": int(total), "dense_fp32_bytes": int(dense)}
