"""Int8 trunk serving path (serve/int8_trunk.py).

Covers: exact BN folding, weight-quantization error bound, end-to-end
embedding drift through the retrieval image tower for both block types,
the dequantized-compute fallback, and composition with the 'packed'
collection.
"""

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu.models.resnet import (
    BasicBlock,
    Bottleneck,
    ResNetFeatures,
)
from atq_tpu.serve.int8_trunk import (
    _fold_bn,
    _quantize_weight,
    export_int8_collection,
    export_int8_trunk,
    int8_collection_bytes,
)


def test_bn_fold_matches_flax_eval():
    rng = np.random.RandomState(0)
    bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, use_running_average=True)
    x = jnp.asarray(rng.randn(4, 8, 8, 16), jnp.float32)
    params = {"scale": jnp.asarray(rng.rand(16) + 0.5, jnp.float32),
              "bias": jnp.asarray(rng.randn(16), jnp.float32)}
    stats = {"mean": jnp.asarray(rng.randn(16), jnp.float32),
             "var": jnp.asarray(rng.rand(16) + 0.1, jnp.float32)}
    want = bn.apply({"params": params, "batch_stats": stats}, x)
    s, b = _fold_bn(params, stats)
    got = x * s + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_weight_quantization_error_bound():
    rng = np.random.RandomState(1)
    w = rng.randn(3, 3, 8, 16).astype(np.float32)
    q, scale = _quantize_weight(w)
    assert q.dtype == np.int8
    err = np.abs(w - q.astype(np.float32) * scale)
    # round-to-nearest: error <= scale/2 per output channel
    assert (err <= scale / 2 + 1e-7).all()
    # all-zero channel gets scale 1, quantizes to 0
    w[..., 3] = 0.0
    q, scale = _quantize_weight(w)
    assert scale[3] == 1.0 and (q[..., 3] == 0).all()


@pytest.mark.parametrize("block,stages", [(BasicBlock, (2, 2)),
                                          (Bottleneck, (1, 1))])
def test_trunk_int8_close_to_dense(block, stages):
    model = ResNetFeatures(stage_sizes=stages, block=block, width=16)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    dense = model.apply(v, x, train=False)
    tree = export_int8_trunk(v["params"], v["batch_stats"])
    got = model.apply({**v, "int8": {"trunk": tree}}, x, train=False)
    assert got.shape == dense.shape
    # per-tensor int8 activations + per-channel int8 weights: small drift
    rel = float(jnp.linalg.norm(got - dense) / jnp.linalg.norm(dense))
    assert rel < 0.05, rel


def test_dequant_fallback_matches_int8():
    model = ResNetFeatures(stage_sizes=(1, 1), block=BasicBlock, width=8)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    tree = export_int8_trunk(v["params"], v["batch_stats"])
    got_i8 = model.apply({**v, "int8": {"trunk": tree}}, x, train=False)
    os.environ["ATQ_INT8_DEQUANT"] = "1"
    try:
        got_f = model.apply({**v, "int8": {"trunk": tree}}, x, train=False)
    finally:
        del os.environ["ATQ_INT8_DEQUANT"]
    # same quantized integers, f32 vs int32 accumulator
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(got_i8),
                               rtol=1e-4, atol=1e-4)


def test_retrieval_encode_image_int8_and_packed_compose():
    from atq_tpu.models.retrieval import ATQMultimodalRetrieval
    from atq_tpu.serve.packed_model import export_packed_collection

    model = ATQMultimodalRetrieval(vocab_size=100, embed_dim=32,
                                   hidden_dim=64)
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), img,
                   jnp.zeros((2, 50), jnp.int32), jnp.asarray([5, 5]))
    dense = model.apply(v, img,
                        method=ATQMultimodalRetrieval.encode_image)
    col = export_int8_collection(v["params"], v.get("batch_stats", {}))
    assert "trunk" in col["image_encoder"]["base_model"]
    packed = export_packed_collection(v["params"], v.get("quant"))
    both = model.apply({**v, "int8": col, "packed": packed}, img,
                       method=ATQMultimodalRetrieval.encode_image)
    cos = np.asarray(jnp.sum(dense * both, axis=1))  # L2-normalized
    assert (cos > 0.99).all(), cos
    # 4x trunk weight compression (int8 + f32 scale/bias vs f32)
    i8 = int8_collection_bytes(col)
    trunk = v["params"]["image_encoder"]["base_model"]
    f32 = sum(a.size * 4 for a in jax.tree_util.tree_leaves(trunk))
    assert i8 < f32 / 3.5
