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
