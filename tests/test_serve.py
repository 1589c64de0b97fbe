"""Packed serving path: logits must match the training-mode (eval) model."""

import jax
import jax.numpy as jnp
import numpy as np

from atq_tpu.models.image_classifier import ATQImageClassifier
from atq_tpu.serve.packed_model import (
    PackedClassifier,
    pack_quantized_layer,
    packed_linear_apply,
)
from atq_tpu.nn.layers import ResidualPrecisionBoostLinear


def test_packed_layer_matches_rpb_forward():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 64).astype(np.float32))
    layer = ResidualPrecisionBoostLinear(features=32, precision_ratio=0.1,
                                         sparsity_target=0.3)
    variables = layer.init(jax.random.PRNGKey(0), x)
    expected = layer.apply(variables, x)

    entry = pack_quantized_layer(variables["params"],
                                 variables["quant"])
    got = packed_linear_apply(entry, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-2, atol=2e-3)  # bf16 correction


def test_packed_classifier_matches_model():
    model = ATQImageClassifier(use_rpb=True, hidden_size=128)
    x = jnp.asarray(
        np.random.RandomState(1).randn(4, 28, 28, 1).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    expected = model.apply(variables, x, train=False)

    served = PackedClassifier(variables["params"], variables["quant"],
                              variables["batch_stats"])
    got = served(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-2, atol=2e-2)

    fp = served.memory_footprint_bytes()
    assert fp["packed_bytes"] < fp["dense_fp32_bytes"]


def test_sparse_correction_matches_dense_correction():
    """ELL sparse correction serves the exact same numbers as the dense
    bf16 correction path (values are bf16-rounded identically at pack)."""
    x = jnp.asarray(np.random.RandomState(2).randn(4, 96).astype(np.float32))
    layer = ResidualPrecisionBoostLinear(features=48, precision_ratio=0.15,
                                         sparsity_target=0.3)
    variables = layer.init(jax.random.PRNGKey(3), x)

    sparse = pack_quantized_layer(variables["params"], variables["quant"],
                                  sparse_correction=True)
    dense = pack_quantized_layer(variables["params"], variables["quant"],
                                 sparse_correction=False)
    assert "corr_idx" in sparse and "correction" in dense
    assert sparse["corr_idx"].dtype == jnp.uint16

    y_sparse = packed_linear_apply(sparse, x)
    y_dense = packed_linear_apply(dense, x)
    np.testing.assert_allclose(np.asarray(y_sparse), np.asarray(y_dense),
                               rtol=1e-5, atol=1e-5)

    # Round-trip the sparse form against the raw mask*(w - wt*a) residual.
    idx = np.asarray(sparse["corr_idx"])
    val = np.asarray(sparse["corr_val"].astype(jnp.float32))
    rebuilt = np.zeros((48, 96), np.float32)
    for r in range(48):
        np.add.at(rebuilt[r], idx[r], val[r])
    if "coo_row" in sparse:
        np.add.at(rebuilt,
                  (np.asarray(sparse["coo_row"], np.int64),
                   np.asarray(sparse["coo_col"], np.int64)),
                  np.asarray(sparse["coo_val"].astype(jnp.float32)))
    np.testing.assert_allclose(
        rebuilt,
        np.asarray(dense["correction"].astype(jnp.float32)),
        rtol=0, atol=0)


def test_sparse_correction_compression_exceeds_8x():
    """The serving claim: >=8x end-to-end weight compression at the
    reference classifier shapes (readme.md:14 claims 8-10x)."""
    model = ATQImageClassifier(use_rpb=True, hidden_size=128)
    x = jnp.asarray(
        np.random.RandomState(1).randn(2, 28, 28, 1).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    served = PackedClassifier(variables["params"], variables["quant"],
                              variables["batch_stats"])
    fp = served.memory_footprint_bytes()
    ratio = fp["dense_fp32_bytes"] / fp["packed_bytes"]
    assert ratio >= 8.0, f"compression {ratio:.2f}x < 8x"
