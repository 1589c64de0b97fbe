"""PyTorch checkpoint interop.

Converts reference-format ``.pth`` state_dicts (torch nn.Module naming,
NCHW conv layout) into this framework's param/quant pytrees and back, so a
user of the reference can bring trained weights across. Covers:

- the classification model ``ATQImageClassifier``
  (reference checkpoint: checkpoints/atq_model_{dataset}.pth,
  /root/reference/train.py:300-303)
- the retrieval model ``ATQMultimodalRetrieval``
  (best_model.pth / final_model.pth, train_multimodal.py:645-669)
- bare torchvision ResNet backbones (see models/resnet.py
  load_torch_state_dict)

Layout conversions:
- conv weights (O, I, kh, kw) -> (kh, kw, I, O)
- the first classifier/linear after a flattened conv stack: torch flattens
  NCHW as (C, H, W); this framework flattens NHWC as (H, W, C) — the
  weight's input axis is permuted accordingly.
- Linear weights keep the torch (out, in) layout (our quantized layers use
  it natively for bitwise quantizer parity); flax nn.Dense kernels are
  transposed (in, out).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def _npy(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state_dict into numpy (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    return {k: _npy(v) for k, v in sd.items()}


def _chw_to_hwc_columns(weight: np.ndarray, c: int, h: int, w: int
                        ) -> np.ndarray:
    """Permute a linear weight's input columns from torch's (C, H, W)
    flatten order to NHWC's (H, W, C)."""
    out_f = weight.shape[0]
    return (weight.reshape(out_f, c, h, w)
            .transpose(0, 2, 3, 1)
            .reshape(out_f, c * h * w))


def _set(tree: dict, path: tuple, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = jnp.asarray(value)


def import_classifier_state_dict(sd: Dict[str, np.ndarray],
                                 use_rpb: bool = True,
                                 hidden_size: int = 128):
    """Reference ATQImageClassifier state_dict -> (params, quant,
    batch_stats) for models.image_classifier.ATQImageClassifier.

    Reference module names: features.{0,1,4,5}.* (convs/bns),
    classifier.{0,3}.{weight,alpha,bias,precision_mask}
    (image_classifier.py:19-48)."""
    params: dict = {}
    quant: dict = {}
    stats: dict = {}

    conv_map = {"features.0": ("features", "conv1"),
                "features.4": ("features", "conv2")}
    bn_map = {"features.1": ("features", "bn1"),
              "features.5": ("features", "bn2")}
    for tname, fpath in conv_map.items():
        _set(params, fpath + ("kernel",),
             sd[f"{tname}.weight"].transpose(2, 3, 1, 0))
        _set(params, fpath + ("bias",), sd[f"{tname}.bias"])
    for tname, fpath in bn_map.items():
        _set(params, fpath + ("scale",), sd[f"{tname}.weight"])
        _set(params, fpath + ("bias",), sd[f"{tname}.bias"])
        _set(stats, fpath + ("mean",), sd[f"{tname}.running_mean"])
        _set(stats, fpath + ("var",), sd[f"{tname}.running_var"])

    for tidx, name in ((0, "classifier_0"), (3, "classifier_3")):
        w = sd[f"classifier.{tidx}.weight"]
        if tidx == 0:
            # input is the flattened conv stack: (64, 7, 7) CHW -> HWC
            w = _chw_to_hwc_columns(w, 64, 7, 7)
        _set(params, (name, "weight"), w)
        _set(params, (name, "alpha"), sd[f"classifier.{tidx}.alpha"])
        if f"classifier.{tidx}.bias" in sd:
            _set(params, (name, "bias"), sd[f"classifier.{tidx}.bias"])
        if use_rpb and f"classifier.{tidx}.precision_mask" in sd:
            m = sd[f"classifier.{tidx}.precision_mask"]
            if tidx == 0:
                m = _chw_to_hwc_columns(m, 64, 7, 7)
            _set(quant, (name, "precision_mask"), m)
            _set(quant, (name, "sparsity_target"), np.float32(0.3))
    return params, quant, stats


def _import_quantized_linear(sd, prefix: str, params: dict, quant: dict,
                             path: tuple, sparsity: float = 0.1):
    """Map one reference TernaryLinear/RPB layer's tensors into our trees."""
    _set(params, path + ("weight",), sd[f"{prefix}.weight"])
    _set(params, path + ("alpha",), sd[f"{prefix}.alpha"])
    if f"{prefix}.bias" in sd:
        _set(params, path + ("bias",), sd[f"{prefix}.bias"])
    if f"{prefix}.precision_mask" in sd:
        _set(quant, path + ("precision_mask",), sd[f"{prefix}.precision_mask"])
        _set(quant, path + ("sparsity_target",), np.float32(sparsity))


def _import_layer_norm(sd, prefix: str, params: dict, path: tuple):
    _set(params, path + ("scale",), sd[f"{prefix}.weight"])
    _set(params, path + ("bias",), sd[f"{prefix}.bias"])


def import_text_encoder_state_dict(sd: Dict[str, np.ndarray],
                                   num_layers: int = 4,
                                   prefix: str = "",
                                   sparsity_target: float = 0.3):
    """Reference ATQTextEncoder state_dict -> (params, quant) for
    models.text_encoder.ATQTextEncoder.

    Reference module names (text_encoder.py:252-314): embedding, embed_norm,
    layers.{i}.self_attn.{pre_layer_norm,q/k/v/out_proj}, layers.{i}.
    {linear1,linear2,norm1,norm2,gate}, norm, attention_pool.{0,2}, scaling.
    The fixed positional encoding is recomputed, not imported.
    """
    p = prefix
    params: dict = {}
    quant: dict = {}
    constants: dict = {}
    initial = min(0.1, sparsity_target)

    # The reference's PE parameter was clobbered by its own xavier re-init
    # (see models/text_encoder.py docstring) — import whatever the
    # checkpoint holds rather than recomputing the sinusoid.
    if f"{p}positional_encoding" in sd:
        _set(constants, ("positional_encoding",),
             sd[f"{p}positional_encoding"])

    _set(params, ("embedding", "embedding"), sd[f"{p}embedding.weight"])
    _import_layer_norm(sd, f"{p}embed_norm", params, ("embed_norm",))

    for i in range(num_layers):
        lp = f"{p}layers.{i}"
        fpath = (f"layers_{i}",)
        _import_layer_norm(sd, f"{lp}.self_attn.pre_layer_norm", params,
                           fpath + ("self_attn", "pre_layer_norm"))
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _import_quantized_linear(
                sd, f"{lp}.self_attn.{proj}", params, quant,
                fpath + ("self_attn", proj), sparsity=initial,
            )
        for lin in ("linear1", "linear2"):
            _import_quantized_linear(sd, f"{lp}.{lin}", params, quant,
                                     fpath + (lin,), sparsity=initial)
        for norm in ("norm1", "norm2"):
            _import_layer_norm(sd, f"{lp}.{norm}", params, fpath + (norm,))
        _set(params, fpath + ("gate",), sd[f"{lp}.gate"])

    _import_layer_norm(sd, f"{p}norm", params, ("norm",))
    _import_quantized_linear(sd, f"{p}attention_pool.0", params, quant,
                             ("attention_pool_0",), sparsity=initial)
    _import_quantized_linear(sd, f"{p}attention_pool.2", params, quant,
                             ("attention_pool_2",), sparsity=initial)
    _set(params, ("scaling",), sd[f"{p}scaling"])
    return params, quant, constants


def export_classifier_params(params: dict, quant: dict,
                             batch_stats: dict) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_classifier_state_dict` (torch naming)."""
    def g(tree, *path):
        node = tree
        for k in path:
            node = node[k]
        return np.asarray(node)

    sd: Dict[str, np.ndarray] = {}
    for tname, fname in (("features.0", "conv1"), ("features.4", "conv2")):
        sd[f"{tname}.weight"] = g(params, "features", fname,
                                  "kernel").transpose(3, 2, 0, 1)
        sd[f"{tname}.bias"] = g(params, "features", fname, "bias")
    for tname, fname in (("features.1", "bn1"), ("features.5", "bn2")):
        sd[f"{tname}.weight"] = g(params, "features", fname, "scale")
        sd[f"{tname}.bias"] = g(params, "features", fname, "bias")
        sd[f"{tname}.running_mean"] = g(batch_stats, "features", fname,
                                        "mean")
        sd[f"{tname}.running_var"] = g(batch_stats, "features", fname, "var")

    def hwc_to_chw_columns(w, c, h, wd):
        out_f = w.shape[0]
        return (w.reshape(out_f, h, wd, c).transpose(0, 3, 1, 2)
                .reshape(out_f, c * h * wd))

    for tidx, name in ((0, "classifier_0"), (3, "classifier_3")):
        w = g(params, name, "weight")
        if tidx == 0:
            w = hwc_to_chw_columns(w, 64, 7, 7)
        sd[f"classifier.{tidx}.weight"] = w
        sd[f"classifier.{tidx}.alpha"] = g(params, name, "alpha")
        sd[f"classifier.{tidx}.bias"] = g(params, name, "bias")
        if quant and name in quant and "precision_mask" in quant[name]:
            m = np.asarray(quant[name]["precision_mask"])
            if tidx == 0:
                m = hwc_to_chw_columns(m, 64, 7, 7)
            sd[f"classifier.{tidx}.precision_mask"] = m
    return sd
