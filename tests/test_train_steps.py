"""Trainer building blocks: KD loss formula parity vs torch, L1 penalty
scope, cross-entropy, optimizer construction, and visualization smoke."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from atq_tpu.train.classifier import (

    ClassifierConfig,
    _cross_entropy,
    _kd_loss,
    _l1_penalty,
    _set_all_sparsity,
    make_optimizer,
)

pytestmark = pytest.mark.slow  # model-compile-heavy; excluded from the fast gate


def test_kd_loss_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    student = rng.randn(8, 10).astype(np.float32)
    teacher = rng.randn(8, 10).astype(np.float32)
    T = 4.0
    ref = float(F.kl_div(
        F.log_softmax(torch.tensor(student) / T, dim=1),
        F.softmax(torch.tensor(teacher) / T, dim=1),
        reduction="batchmean",
    ) * T ** 2)
    ours = float(_kd_loss(jnp.asarray(student), jnp.asarray(teacher), T))
    assert abs(ours - ref) < 1e-5


def test_cross_entropy_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    logits = rng.randn(16, 10).astype(np.float32)
    labels = rng.randint(0, 10, 16)
    ref = float(F.cross_entropy(torch.tensor(logits),
                                torch.tensor(labels)))
    ours = float(_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(ours - ref) < 1e-5


def test_l1_penalty_matches_torch_weight_name_scope():
    """L1 covers every torch-'.weight' analog INCLUDING BN/LN scales:
    the reference's `'bn' not in name` filter never fires because its
    BatchNorms sit at Sequential indices ('features.1.weight'), so BN
    scales are regularized (train.py:194-203; verified end-to-end by
    tests/test_trajectory_parity.py with use_l1=True)."""
    params = {
        "classifier_0": {"weight": jnp.ones((2, 2)), "alpha": jnp.ones(1)},
        "features": {
            "conv1": {"kernel": jnp.ones((3, 3, 1, 2)), "bias": jnp.ones(2)},
            "bn1": {"scale": jnp.ones(2), "bias": jnp.zeros(2)},
        },
    }
    # 4 (weight) + 18 (kernel) + 2 (bn scale); alpha/bias excluded
    assert float(_l1_penalty(params)) == 24.0


def test_set_all_sparsity():
    quant = {
        "a": {"sparsity_target": jnp.float32(0.1),
              "precision_mask": jnp.zeros((2, 2))},
        "b": {"c": {"sparsity_target": jnp.float32(0.2)}},
    }
    out = _set_all_sparsity(quant, 0.45)
    assert float(out["a"]["sparsity_target"]) == np.float32(0.45)
    assert float(out["b"]["c"]["sparsity_target"]) == np.float32(0.45)
    assert out["a"]["precision_mask"].shape == (2, 2)


def test_make_optimizer_variants():
    import optax

    for cosine in (False, True):
        for clip in (False, True):
            cfg = ClassifierConfig(use_cosine_lr=cosine, clip_grad=clip,
                                   epochs=4)
            tx = make_optimizer(cfg, steps_per_epoch=10, weight_decay=1e-4)
            params = {"w": jnp.ones((3, 3))}
            state = tx.init(params)
            g = {"w": jnp.full((3, 3), 2.0)}
            updates, _ = tx.update(g, state, params)
            assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_visualization_smoke(tmp_path):
    from atq_tpu.utils.visualization import (
        plot_weight_distribution,
        visualize_ternary_weights,
    )

    params = {"classifier_0": {
        "weight": jnp.asarray(
            np.random.RandomState(0).randn(16, 8).astype(np.float32)
        ),
    }}
    p1 = tmp_path / "dist.png"
    plot_weight_distribution(params, out_path=str(p1))
    assert p1.exists()
    p2 = tmp_path / "ternary.png"
    visualize_ternary_weights(params, "classifier_0", out_path=str(p2))
    assert p2.exists()


def test_amp_autocast_semantics():
    """--use_amp follows torch-autocast semantics: master params and the
    quantizer threshold stay f32 (the ternary pattern is bitwise identical
    to the fp32 run), while matmuls/convs compute in bf16 — embeddings
    deviate only at bf16 rounding level and one train step stays finite."""
    import jax
    import jax.numpy as jnp

    from atq_tpu.losses.contrastive import (
        ContrastiveLearningManager,
        HardNegativeMiningInfoNCE,
    )
    from atq_tpu.models.retrieval import ATQMultimodalRetrieval
    from atq_tpu.nn.layers import TernaryLinear
    from atq_tpu.train.retrieval import (
        RetrievalConfig,
        build_retrieval_train_step,
        make_retrieval_optimizer,
    )

    # Layer level: the bf16 layer's output must match quantize-in-f32 math
    # (pattern identical; only the matmul rounds).
    x = jnp.asarray(np.random.RandomState(0).randn(4, 64).astype(np.float32))
    layer32 = TernaryLinear(features=32)
    v = layer32.init(jax.random.PRNGKey(0), x)
    y32 = layer32.apply(v, x)
    y16 = TernaryLinear(features=32, dtype=jnp.bfloat16).apply(v, x)
    np.testing.assert_allclose(np.asarray(y16, np.float32),
                               np.asarray(y32), rtol=2e-2, atol=5e-2)

    # Model + step level.
    rngd = np.random.RandomState(1)
    img = rngd.randn(4, 32, 32, 3).astype(np.float32)
    txt = rngd.randint(0, 60, (4, 8)).astype(np.int32)
    ln = np.full(4, 6, np.int32)
    outs = {}
    for amp in (False, True):
        model = ATQMultimodalRetrieval(
            vocab_size=60, embed_dim=32, hidden_dim=64, use_residual=True,
            max_seq_length=8,
            compute_dtype=jnp.bfloat16 if amp else None)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                       jnp.zeros((2, 8), jnp.int32), jnp.asarray([4, 4]))
        ie, te = model.apply(v, jnp.asarray(img), jnp.asarray(txt),
                             jnp.asarray(ln), return_embeddings=True)
        assert ie.dtype == jnp.float32 and te.dtype == jnp.float32
        outs[amp] = (np.asarray(ie), np.asarray(te))

        cfg = RetrievalConfig(batch_size=4, image_size=32, embed_dim=32,
                              hidden_dim=64, use_residual=True,
                              use_amp=amp, max_seq_length=8)
        tx = make_retrieval_optimizer(cfg, 10)
        crit = HardNegativeMiningInfoNCE()
        mgr = ContrastiveLearningManager(criterion=crit)
        state = {"params": v["params"], "quant": v.get("quant", {}),
                 "constants": v.get("constants", {}),
                 "batch_stats": v.get("batch_stats", {}),
                 "opt_state": tx.init(v["params"]),
                 "step": jnp.asarray(0, jnp.int32)}
        step = jax.jit(build_retrieval_train_step(model, tx, crit, mgr,
                                                  cfg))
        s2, loss = step(state,
                        (jnp.asarray(img), jnp.asarray(txt),
                         jnp.asarray(ln)),
                        jnp.float32(0.07), jnp.int32(0),
                        jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        assert all(bool(jnp.all(jnp.isfinite(p)))
                   for p in jax.tree_util.tree_leaves(s2["params"]))

    # L2-normalized embeddings: bf16 rounding only, no structural drift.
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=3e-2)
    np.testing.assert_allclose(outs[True][1], outs[False][1], atol=6e-2)
