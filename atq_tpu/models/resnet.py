"""ResNet-18/50 backbone in Flax (NHWC, TPU-native layout).

The reference's retrieval image encoder wraps a pretrained torchvision
ResNet18/50 kept in full precision with the final FC stripped
(/root/reference/models/multimodal_classifier.py:28-39). This is our own
implementation of the same architecture (He et al. 2015) in channels-last
layout, plus a converter that loads weights from a torch ``state_dict``
file when one is available on disk (this environment has no network access,
so pretrained weights are loaded opportunistically — see
``load_torch_state_dict``).

BatchNorm follows torch semantics (momentum 0.1 -> flax momentum 0.9,
eps 1e-5); eval mode uses running statistics like the reference's
``model.eval()``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from atq_tpu.ops.fast_pool import max_pool as atq_max_pool
from atq_tpu.ops.s2d_stem import stem_conv

_BN = partial(nn.BatchNorm, momentum=0.9, epsilon=1e-5,
              dtype=jnp.float32)


class StemConv(nn.Module):
    """The 7x7/stride-2 stem conv with an optional exact space-to-depth
    rewrite (ATQ_S2D_STEM=1; see atq_tpu/ops/s2d_stem.py).

    Parameter path and init match ``nn.Conv(name="conv1")`` exactly
    (``conv1/kernel``, lecun-normal, (7, 7, C, features)) so checkpoints
    and the torchvision importer are unaffected by which path runs.
    """

    features: int
    dtype: Optional[jnp.dtype] = None
    use_s2d: Optional[bool] = None  # None -> read ATQ_S2D_STEM

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, x.shape[-1], self.features), jnp.float32)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        return stem_conv(x, kernel, use_s2d=self.use_s2d)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Optional[jnp.dtype] = None  # conv compute dtype (AMP)

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = _BN(use_running_average=not train, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = _BN(use_running_average=not train, name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = _BN(use_running_average=not train,
                           name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    expansion: int = 4
    dtype: Optional[jnp.dtype] = None  # conv compute dtype (AMP)

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out_features = self.features * self.expansion
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = _BN(use_running_average=not train, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = _BN(use_running_average=not train, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = _BN(use_running_average=not train, name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(out_features, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = _BN(use_running_average=not train,
                           name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetFeatures(nn.Module):
    """Headless ResNet: image (B, H, W, 3) -> pooled features (B, feat_dim).

    feat_dim = 512 for resnet18, 2048 for resnet50 — matching the
    reference's stripped-FC backbones.
    """

    stage_sizes: Sequence[int]
    block: Any
    width: int = 64
    dtype: Optional[jnp.dtype] = None  # conv compute dtype (AMP)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.has_variable("int8", "trunk"):
            # Serving path: the whole trunk runs from int8 weights with
            # BN folded (serve/int8_trunk.py export_int8_collection) —
            # same detection pattern as the quantized layers' 'packed'
            # collection.
            from atq_tpu.serve.int8_trunk import int8_resnet_apply

            return int8_resnet_apply(
                self.get_variable("int8", "trunk"), x, self.stage_sizes,
                bottleneck=self.block is Bottleneck)
        x = StemConv(self.width, dtype=self.dtype, name="conv1")(x)
        x = _BN(use_running_average=not train, name="bn1")(x)
        x = nn.relu(x)
        # Stem pool: the profiled hot spot of the retrieval step (XLA's
        # select-and-scatter backward); ATQ_FAST_POOL=1 swaps in the
        # dense backward (atq_tpu/ops/fast_pool.py), off the parity path.
        x = atq_max_pool(x, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)))
        for stage, num_blocks in enumerate(self.stage_sizes):
            features = self.width * (2 ** stage)
            for block_idx in range(num_blocks):
                strides = 2 if stage > 0 and block_idx == 0 else 1
                x = self.block(features=features, strides=strides,
                               dtype=self.dtype,
                               name=f"layer{stage + 1}_{block_idx}")(
                    x, train=train)
        return jnp.mean(x, axis=(1, 2))  # global average pool


def resnet18_features() -> ResNetFeatures:
    return ResNetFeatures(stage_sizes=(2, 2, 2, 2), block=BasicBlock)


def resnet50_features() -> ResNetFeatures:
    return ResNetFeatures(stage_sizes=(3, 4, 6, 3), block=Bottleneck)


FEATURE_DIMS = {"resnet18": 512, "resnet50": 2048}


def _torch_conv_to_flax(w: np.ndarray) -> np.ndarray:
    # torch conv weight (O, I, kh, kw) -> flax (kh, kw, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def load_torch_state_dict(state_dict: dict, arch: str = "resnet18"):
    """Convert a torchvision ResNet state_dict (numpy-valued or torch
    tensors) into flax (params, batch_stats) trees for ResNetFeatures.

    Used to import IMAGENET1K weights for retrieval parity when a .pth file
    is present locally (e.g. ~/.cache/torch/hub/checkpoints/).
    """
    def npy(v):
        return v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    sd = {k: npy(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = jnp.asarray(value)

    def conv(flax_path, torch_name):
        put(params, flax_path + ("kernel",),
            _torch_conv_to_flax(sd[torch_name + ".weight"]))

    def bn(flax_path, torch_name):
        put(params, flax_path + ("scale",), sd[torch_name + ".weight"])
        put(params, flax_path + ("bias",), sd[torch_name + ".bias"])
        put(stats, flax_path + ("mean",), sd[torch_name + ".running_mean"])
        put(stats, flax_path + ("var",), sd[torch_name + ".running_var"])

    conv(("conv1",), "conv1")
    bn(("bn1",), "bn1")

    stage_sizes = (2, 2, 2, 2) if arch == "resnet18" else (3, 4, 6, 3)
    bottleneck = arch != "resnet18"
    for stage, num_blocks in enumerate(stage_sizes):
        for b in range(num_blocks):
            prefix = f"layer{stage + 1}.{b}"
            fpfx = (f"layer{stage + 1}_{b}",)
            n_convs = 3 if bottleneck else 2
            for c in range(1, n_convs + 1):
                conv(fpfx + (f"conv{c}",), f"{prefix}.conv{c}")
                bn(fpfx + (f"bn{c}",), f"{prefix}.bn{c}")
            if f"{prefix}.downsample.0.weight" in sd:
                conv(fpfx + ("downsample_conv",), f"{prefix}.downsample.0")
                bn(fpfx + ("downsample_bn",), f"{prefix}.downsample.1")

    return params, stats


# ---------------------------------------------------------------------------
# Pretrained-weights readiness (zero-egress environment)
# ---------------------------------------------------------------------------

# torchvision IMAGENET1K_V1 release artifacts. torchvision's own
# load_state_dict_from_url verifies the sha256 PREFIX embedded in the file
# name; we record the same contract so a manually-supplied .pth can be
# checked offline. Reference dependency: the retrieval ImageEncoder is a
# *pretrained* backbone (multimodal_classifier.py:28-39).
IMAGENET_MANIFEST = {
    "resnet18": {
        "url": "https://download.pytorch.org/models/resnet18-f37072fd.pth",
        "sha256_prefix": "f37072fd",
    },
    "resnet50": {
        "url": "https://download.pytorch.org/models/resnet50-0676ba61.pth",
        "sha256_prefix": "0676ba61",
    },
}


def load_imagenet_weights(path: str, arch: str = "resnet18",
                          verify_hash: bool = True):
    """Load a torchvision IMAGENET1K_V1 ``.pth`` from disk into flax
    ``(params, batch_stats)`` trees for :class:`ResNetFeatures`.

    The moment a weights file appears (manual copy onto the zero-egress
    box), ``train_multimodal.py --imagenet_weights PATH`` gives the
    reference-parity pretrained backbone. ``verify_hash`` checks the file's
    sha256 against the manifest prefix (torchvision's own integrity
    contract).
    """
    import hashlib

    if verify_hash:
        digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
        want = IMAGENET_MANIFEST[arch]["sha256_prefix"]
        if not digest.startswith(want):
            raise ValueError(
                f"{path}: sha256 {digest[:16]}... does not start with the "
                f"manifest prefix {want!r} for {arch} IMAGENET1K_V1 "
                f"({IMAGENET_MANIFEST[arch]['url']})"
            )
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    return load_torch_state_dict(state_dict, arch=arch)
