"""Pretrained-backbone import readiness (VERDICT round-1 missing #1).

No IMAGENET1K weights exist on this zero-egress box, so these tests build a
synthetic ``.pth`` with the exact torchvision resnet18 state_dict key set
and shapes, and assert the converter (models/resnet.py:load_torch_state_dict)
lands every tensor at the right flax tree path with the right transposition
— so the moment a real weights file appears, parity is one flag away
(``train_multimodal.py --imagenet_weights PATH``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atq_tpu.models.resnet import (
    IMAGENET_MANIFEST,
    load_imagenet_weights,
    load_torch_state_dict,
    resnet18_features,
)

torch = pytest.importorskip("torch")


def _resnet18_state_dict(seed=0):
    """The torchvision resnet18 key set (public layout) with random values."""
    rng = np.random.RandomState(seed)
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_var"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{name}.num_batches_tracked"] = np.asarray(100, np.int64)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    chans = [64, 128, 256, 512]
    for stage in range(4):
        c = chans[stage]
        for b in range(2):
            pre = f"layer{stage + 1}.{b}"
            c_in = chans[stage - 1] if (stage > 0 and b == 0) else c
            conv(f"{pre}.conv1", c, c_in, 3)
            bn(f"{pre}.bn1", c)
            conv(f"{pre}.conv2", c, c, 3)
            bn(f"{pre}.bn2", c)
            if stage > 0 and b == 0:
                conv(f"{pre}.downsample.0", c, c_in, 1)
                bn(f"{pre}.downsample.1", c)
    sd["fc.weight"] = rng.randn(1000, 512).astype(np.float32)
    sd["fc.bias"] = rng.randn(1000).astype(np.float32)
    return sd


def test_converter_tree_matches_flax_init_exactly():
    sd = _resnet18_state_dict()
    params, stats = load_torch_state_dict(sd, arch="resnet18")

    model = resnet18_features()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    want_p = jax.tree_util.tree_structure(jax.device_get(ref["params"]))
    want_s = jax.tree_util.tree_structure(jax.device_get(ref["batch_stats"]))
    assert jax.tree_util.tree_structure(params) == want_p
    assert jax.tree_util.tree_structure(stats) == want_s
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(ref["params"])):
        assert pa == pb and a.shape == b.shape, (pa, a.shape, b.shape)


def test_converter_golden_slices():
    """Specific tensors land at specific paths with the (O,I,kh,kw) ->
    (kh,kw,I,O) transposition applied."""
    sd = _resnet18_state_dict()
    params, stats = load_torch_state_dict(sd, arch="resnet18")

    np.testing.assert_array_equal(
        np.asarray(params["conv1"]["kernel"]),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(params["layer3_0"]["downsample_conv"]["kernel"]),
        np.transpose(sd["layer3.0.downsample.0.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(params["layer2_1"]["bn2"]["scale"]),
        sd["layer2.1.bn2.weight"])
    np.testing.assert_array_equal(
        np.asarray(stats["layer4_0"]["bn1"]["mean"]),
        sd["layer4.0.bn1.running_mean"])
    np.testing.assert_array_equal(
        np.asarray(stats["bn1"]["var"]), sd["bn1.running_var"])


def test_converted_weights_run_forward():
    sd = _resnet18_state_dict()
    params, stats = load_torch_state_dict(sd, arch="resnet18")
    model = resnet18_features()
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.ones((2, 32, 32, 3)), train=False)
    assert out.shape == (2, 512)
    assert np.all(np.isfinite(np.asarray(out)))


def test_load_imagenet_weights_pth_roundtrip(tmp_path):
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in _resnet18_state_dict().items()}
    path = tmp_path / "resnet18-test.pth"
    torch.save(sd, str(path))

    # synthetic file: hash check must reject it...
    with pytest.raises(ValueError, match="sha256"):
        load_imagenet_weights(str(path), arch="resnet18")
    # ...and verify_hash=False loads + converts it.
    params, stats = load_imagenet_weights(str(path), arch="resnet18",
                                          verify_hash=False)
    model = resnet18_features()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                jax.device_get(ref["params"])))
    assert stats["bn1"]["mean"].shape == (64,)


def test_manifest_records_torchvision_contract():
    for arch, entry in IMAGENET_MANIFEST.items():
        assert entry["url"].startswith("https://download.pytorch.org/")
        # torchvision embeds the sha256 prefix in the filename; the
        # manifest must be self-consistent with its own URL.
        assert entry["sha256_prefix"] in entry["url"]
