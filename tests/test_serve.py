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
