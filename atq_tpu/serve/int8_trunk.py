"""Int8 post-training quantization of the FP ResNet trunk (serving path).

The packed 2-bit path (serve/packed_model.py) covers every *quantized*
layer, but the retrieval model's largest serving cost is the layer family
the reference keeps full-precision: the ResNet backbone
(/root/reference/models/multimodal_classifier.py:28-39). This module
completes the quantized-serving story — ternary 2-bit planes for ATQ
layers, int8 for the FP trunk — so the whole image tower serves from
integer weights:

- **Weights**: symmetric per-output-channel int8
  (``scale = max|W| / 127``), stored as int8 HWIO kernels (4x smaller
  than f32).
- **Activations**: dynamic symmetric per-tensor int8, scale computed
  on-device per call (one max-reduction — cheap next to the conv).
- **BatchNorm**: serving is eval-mode (running statistics), so the BN
  affine folds EXACTLY into the conv's per-channel rescale + bias:
  ``bn(conv(x, W)) == conv_int8(x_q, W_q) * (a_s * w_s * g/sqrt(v+eps))
  + (b - m * g/sqrt(v+eps))``.
- **Compute**: ``lax.conv_general_dilated`` on int8 operands with
  ``preferred_element_type=int32`` — the MXU's native int8 path (2x the
  bf16 rate on TPU v5e). ``ATQ_INT8_DEQUANT=1`` (read at trace time)
  switches to an f32 conv over the SAME quantized integer values for
  backends without int8 conv support — identical quantization, the
  accumulator rounds in f32 instead of int32.

Wiring mirrors the 'packed' collection: ``export_int8_collection`` walks a
model's params for ResNet trunks and emits an ``'int8'`` variable
collection; ``ResNetFeatures`` detects ``('int8', 'trunk')`` at its scope
and serves through :func:`int8_resnet_apply` instead of the FP path::

    col = export_int8_collection(vars["params"], vars["batch_stats"])
    model.apply({**vars, "int8": col}, images,
                method=ATQMultimodalRetrieval.encode_image)

Composable with the 'packed' collection — quantized projectors serve from
2-bit planes while the trunk serves int8.
"""

from __future__ import annotations

import os
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from atq_tpu.ops.fast_pool import max_pool as atq_max_pool

_BN_EPS = 1e-5  # models/resnet.py _BN (torch semantics)


def _quantize_weight(kernel: np.ndarray):
    """(kh, kw, I, O) f32 -> (int8 kernel, per-O scale). Symmetric
    per-output-channel; all-zero channels get scale 1 to avoid 0/0."""
    kernel = np.asarray(kernel, np.float32)
    absmax = np.abs(kernel).reshape(-1, kernel.shape[-1]).max(axis=0)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(kernel / scale), -127, 127).astype(np.int8)
    return q, scale


def _fold_bn(bn_params: Dict, bn_stats: Dict):
    """Eval-mode BatchNorm as an exact per-channel affine (s, b)."""
    gamma = np.asarray(bn_params["scale"], np.float32)
    beta = np.asarray(bn_params["bias"], np.float32)
    mean = np.asarray(bn_stats["mean"], np.float32)
    var = np.asarray(bn_stats["var"], np.float32)
    s = gamma / np.sqrt(var + _BN_EPS)
    return s, beta - mean * s


def _export_conv_bn(conv_params: Dict, bn_params: Dict,
                    bn_stats: Dict) -> Dict:
    q, w_scale = _quantize_weight(conv_params["kernel"])
    bn_s, bn_b = _fold_bn(bn_params, bn_stats)
    return {
        "kernel": jnp.asarray(q),
        "scale": jnp.asarray(w_scale * bn_s),
        "bias": jnp.asarray(bn_b),
    }


def export_int8_trunk(params: Dict, stats: Dict) -> Dict:
    """Export a ResNetFeatures (params, batch_stats) pair into the int8
    serving tree. Stage structure is discovered from the param keys, so
    resnet18 (BasicBlock) and resnet50 (Bottleneck) both work."""
    tree = {"conv1": _export_conv_bn(params["conv1"], params["bn1"],
                                     stats["bn1"])}
    for name in sorted(k for k in params if k.startswith("layer")):
        block_p, block_s = params[name], stats[name]
        entry = {}
        for c in ("conv1", "conv2", "conv3"):
            if c in block_p:
                bn = "bn" + c[-1]
                entry[c] = _export_conv_bn(block_p[c], block_p[bn],
                                           block_s[bn])
        if "downsample_conv" in block_p:
            entry["downsample"] = _export_conv_bn(
                block_p["downsample_conv"], block_p["downsample_bn"],
                block_s["downsample_bn"])
        tree[name] = entry
    return tree


def _dequant_mode() -> bool:
    return os.environ.get("ATQ_INT8_DEQUANT", "0") == "1"


def int8_conv(entry: Dict, x: jax.Array, strides=(1, 1),
              padding=((1, 1), (1, 1))) -> jax.Array:
    """Quantize activations per-tensor, convolve in int8, rescale.

    Returns f32 ``conv(x_q, W_q) * (a_scale * entry.scale) + entry.bias``
    where the conv accumulates in int32 (or f32 under ATQ_INT8_DEQUANT=1).
    """
    from jax import lax

    x = x.astype(jnp.float32)
    a_scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / a_scale), -127, 127)
    kernel = entry["kernel"]
    if _dequant_mode():
        y = lax.conv_general_dilated(
            xq, kernel.astype(jnp.float32), strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    else:
        y = lax.conv_general_dilated(
            xq.astype(jnp.int8), kernel, strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32).astype(jnp.float32)
    return y * (a_scale * entry["scale"]) + entry["bias"]


def int8_resnet_apply(tree: Dict, x: jax.Array,
                      stage_sizes: Sequence[int],
                      bottleneck: bool = False) -> jax.Array:
    """Full trunk forward from the int8 tree — mirrors
    models/resnet.py:ResNetFeatures (stem 7x7/2 pad 3, 3x3/2 maxpool,
    stages, global average pool). BN is already folded into each entry."""
    x = int8_conv(tree["conv1"], x, strides=(2, 2),
                  padding=((3, 3), (3, 3)))
    x = jax.nn.relu(x)
    x = atq_max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    for stage, num_blocks in enumerate(stage_sizes):
        for block_idx in range(num_blocks):
            entry = tree[f"layer{stage + 1}_{block_idx}"]
            strides = (2, 2) if stage > 0 and block_idx == 0 else (1, 1)
            residual = x
            if bottleneck:
                y = jax.nn.relu(int8_conv(entry["conv1"], x, (1, 1),
                                          ((0, 0), (0, 0))))
                y = jax.nn.relu(int8_conv(entry["conv2"], y, strides))
                y = int8_conv(entry["conv3"], y, (1, 1), ((0, 0), (0, 0)))
            else:
                y = jax.nn.relu(int8_conv(entry["conv1"], x, strides))
                y = int8_conv(entry["conv2"], y)
            if "downsample" in entry:
                residual = int8_conv(entry["downsample"], x, strides,
                                     ((0, 0), (0, 0)))
            x = jax.nn.relu(y + residual)
    return jnp.mean(x, axis=(1, 2))


def _looks_like_trunk(node) -> bool:
    return (isinstance(node, dict) and "conv1" in node and "bn1" in node
            and "layer1_0" in node)


def export_int8_collection(params: Dict, batch_stats: Dict) -> Dict:
    """Walk a model's params for ResNet trunks and emit the 'int8'
    variable collection (same tree paths, each trunk under a 'trunk' key)
    that ResNetFeatures detects at serving time."""
    def walk(p_node, s_node):
        if not isinstance(p_node, dict):
            return None
        if _looks_like_trunk(p_node):
            return {"trunk": export_int8_trunk(p_node, s_node or {})}
        out = {}
        for k, v in p_node.items():
            sub = walk(v, s_node.get(k, {}) if isinstance(s_node, dict)
                       else {})
            if sub:
                out[k] = sub
        return out or None

    return walk(params, batch_stats) or {}


def int8_collection_bytes(col: Dict) -> int:
    """Serving weight bytes in an exported 'int8' collection."""
    total = 0

    def walk(node):
        nonlocal total
        if isinstance(node, dict):
            if "kernel" in node and "scale" in node:
                total += node["kernel"].size  # int8
                total += node["scale"].size * 4 + node["bias"].size * 4
            else:
                for v in node.values():
                    walk(v)

    walk(col)
    return total
