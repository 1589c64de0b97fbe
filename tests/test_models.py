"""Shape/behavior tests for the model zoo (reference used __main__ smoke
blocks, text_encoder.py:436-461 and fusion.py:427-461 — these are their
pytest equivalents plus quirk checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu.models import (
    ATQImageClassifier,
    ATQMultimodalClassifier,
    ATQMultimodalRetrieval,
    ATQTextEncoder,
    MultimodalFusion,
)
from atq_tpu.models.image_classifier import BaselineCNNClassifier
from atq_tpu.models.retrieval import get_model_size_info

pytestmark = pytest.mark.slow  # model-compile-heavy; excluded from the fast gate



@pytest.fixture(scope="module")
def rngs():
    return jax.random.PRNGKey(0)


def test_image_classifier_shapes(rngs):
    model = ATQImageClassifier(use_rpb=True, hidden_size=128)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 28, 28, 1), jnp.float32)
    variables = model.init(rngs, x)
    out = model.apply(variables, x)
    assert out.shape == (4, 10)
    # train mode needs dropout rng + mutable batch stats
    out_t, mutated = model.apply(
        variables, x, train=True, rngs={"dropout": rngs},
        mutable=["batch_stats"],
    )
    assert out_t.shape == (4, 10)
    assert "batch_stats" in mutated


def test_image_classifier_ternary_mode(rngs):
    model = ATQImageClassifier(use_rpb=False)
    x = jnp.zeros((2, 28, 28, 1), jnp.float32)
    variables = model.init(rngs, x)
    # TernaryLinear has no per-layer quant state -> no 'quant' collection
    # entries under classifier (reference parity: no sparsity_target attr).
    assert "quant" not in variables or not any(
        "classifier" in k for k in variables.get("quant", {})
    )


def test_text_encoder_shapes_and_mask(rngs):
    model = ATQTextEncoder(vocab_size=50, embed_dim=32, num_heads=4,
                           num_layers=2, dim_feedforward=64,
                           max_seq_length=16)
    x = jnp.asarray(np.random.RandomState(1).randint(0, 50, (3, 10)))
    variables = model.init(rngs, x)
    out_nomask = model.apply(variables, x)
    assert out_nomask.shape == (3, 32)

    # lengths and the equivalent boolean mask must agree exactly
    lengths = jnp.asarray([4, 7, 10])
    out_lengths = model.apply(variables, x, lengths)
    bool_mask = jnp.arange(10)[None, :] >= lengths[:, None]
    out_bool = model.apply(variables, x, bool_mask)
    np.testing.assert_allclose(np.asarray(out_lengths), np.asarray(out_bool),
                               rtol=1e-6)
    # masking changes the output vs no mask
    assert not np.allclose(np.asarray(out_lengths), np.asarray(out_nomask))
    # NOTE: padded token ids are NOT fully invariant — the reference's
    # double-softmax pooling (text_encoder.py:292-311, :415-417) normalizes
    # over all positions before masking, a quirk we reproduce.


def test_fusion_methods(rngs):
    inputs = {
        "image": jnp.asarray(np.random.RandomState(2).randn(4, 24),
                             jnp.float32),
        "text": jnp.asarray(np.random.RandomState(3).randn(4, 16),
                            jnp.float32),
    }
    for method in ["cross_attention", "concat", "gated"]:
        model = MultimodalFusion(
            input_dims={"image": 24, "text": 16}, output_dim=32,
            fusion_method=method,
        )
        variables = model.init(rngs, inputs)
        out = model.apply(variables, inputs)
        assert out.shape == (4, 32)
        # output is L2-normalized (reference fusion.py:416-422)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(out, axis=1)), 1.0, rtol=1e-5
        )


def test_fusion_missing_modality_raises(rngs):
    model = MultimodalFusion(input_dims={"image": 8, "text": 8},
                             output_dim=8)
    with pytest.raises(ValueError, match="Required modality"):
        model.init(rngs, {"image": jnp.zeros((2, 8))})


def test_retrieval_model_modes(rngs):
    model = ATQMultimodalRetrieval(vocab_size=60, embed_dim=32,
                                   hidden_dim=64, max_seq_length=12)
    img = jnp.asarray(np.random.RandomState(4).randn(2, 32, 32, 3),
                      jnp.float32)
    txt = jnp.asarray(np.random.RandomState(5).randint(0, 60, (2, 12)))
    lengths = jnp.asarray([6, 12])
    variables = model.init(rngs, img, txt, lengths)

    sim = model.apply(variables, img, txt, lengths)
    assert sim.shape == (2, 2)
    ie, te = model.apply(variables, img, txt, lengths,
                         return_embeddings=True)
    assert ie.shape == te.shape == (2, 32)
    # embeddings are L2-normalized
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(ie, axis=1)), 1.0,
                               rtol=1e-5)
    fused = model.apply(variables, img, txt, lengths, return_fused=True)
    assert fused.shape == (2, 32)

    info = get_model_size_info(variables["params"])
    assert info["total_parameters"] > 0
    assert info["estimated_memory_usage_MB"] > 0


def test_legacy_classifier_and_modality_dropout(rngs):
    model = ATQMultimodalClassifier(vocab_size=40, embed_dim=32,
                                    hidden_dim=64)
    img = jnp.asarray(np.random.RandomState(6).randn(2, 28, 28, 1),
                      jnp.float32)
    txt = jnp.asarray(np.random.RandomState(7).randint(0, 40, (2, 8)))
    variables = model.init(rngs, img, txt)
    logits = model.apply(variables, img, txt)
    assert logits.shape == (2, 10)
    # modality dropout changes the output
    logits_dropped = model.apply(variables, img, txt, drop_image=True)
    assert not np.allclose(np.asarray(logits), np.asarray(logits_dropped))


def test_baseline_cnn(rngs):
    model = BaselineCNNClassifier()
    x = jnp.zeros((2, 28, 28, 1), jnp.float32)
    variables = model.init(rngs, x)
    assert model.apply(variables, x).shape == (2, 10)
