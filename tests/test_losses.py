"""Golden parity for contrastive losses vs the PyTorch reference
(/root/reference/utils/enhanced_contrastive.py), incl. the entropy-sign
quirks and temperature annealing schedule."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu.losses import (
    ContrastiveLearningManager,
    HardNegativeMiningInfoNCE,
    MultiPositiveInfoNCE,
)


@pytest.fixture(scope="module")
def ref_contrastive():
    sys.path.insert(0, "/root/reference")
    try:
        import utils.enhanced_contrastive as ref
        yield ref
    finally:
        sys.path.remove("/root/reference")


def _embeds(seed=0, batch=8, dim=16):
    rng = np.random.RandomState(seed)
    img = rng.randn(batch, dim).astype(np.float32)
    txt = rng.randn(batch, dim).astype(np.float32)
    return img, txt


@pytest.mark.parametrize("epoch,total", [(0, 10), (3, 10), (9, 10)])
def test_hard_negative_infonce_parity(ref_contrastive, epoch, total):
    import torch

    img, txt = _embeds(seed=epoch)
    ref_loss_fn = ref_contrastive.HardNegativeMiningInfoNCE(
        temperature=0.07, lambda_reg=0.02, hard_negative_weight=0.5,
        temperature_schedule=True,
    )
    ref_loss_fn.set_epoch(epoch, total)
    ref_loss = float(ref_loss_fn(torch.tensor(img), torch.tensor(txt)))

    ours = HardNegativeMiningInfoNCE(
        temperature=0.07, lambda_reg=0.02, hard_negative_weight=0.5,
        temperature_schedule=True,
    )
    ours.set_epoch(epoch, total)
    jax_loss = float(ours(jnp.asarray(img), jnp.asarray(txt)))

    assert abs(jax_loss - ref_loss) < 1e-4


def test_temperature_schedule_parity(ref_contrastive):
    ref_loss_fn = ref_contrastive.HardNegativeMiningInfoNCE(temperature=0.07)
    ours = HardNegativeMiningInfoNCE(temperature=0.07)
    for epoch in range(12):
        ref_loss_fn.set_epoch(epoch, 12)
        ours.set_epoch(epoch, 12)
        assert abs(ours.get_current_temperature()
                   - ref_loss_fn.get_current_temperature()) < 1e-7


def test_hard_negative_with_weights_parity(ref_contrastive):
    import torch

    img, txt = _embeds(seed=42)
    w = np.random.RandomState(1).uniform(0.2, 1.0, size=8).astype(np.float32)
    ref_loss_fn = ref_contrastive.HardNegativeMiningInfoNCE(
        temperature_schedule=False
    )
    ref_loss = float(
        ref_loss_fn(torch.tensor(img), torch.tensor(txt), torch.tensor(w))
    )
    ours = HardNegativeMiningInfoNCE(temperature_schedule=False)
    jax_loss = float(ours(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(w)))
    assert abs(jax_loss - ref_loss) < 1e-4


def test_multi_positive_infonce_parity(ref_contrastive):
    import torch

    img, txt = _embeds(seed=7)
    # 2 positives per image, one row intentionally empty.
    mask = np.zeros((8, 8), dtype=np.float32)
    rng = np.random.RandomState(3)
    for i in range(7):
        mask[i, rng.choice(8, 2, replace=False)] = 1.0

    ref_loss = float(
        ref_contrastive.MultiPositiveInfoNCE()(
            torch.tensor(img), torch.tensor(txt), torch.tensor(mask)
        )
    )
    jax_loss = float(
        MultiPositiveInfoNCE()(jnp.asarray(img), jnp.asarray(txt),
                               jnp.asarray(mask))
    )
    assert abs(jax_loss - ref_loss) < 1e-4


def test_curriculum_weights_parity(ref_contrastive):
    import torch

    sim = np.random.RandomState(5).uniform(-1, 1, (8, 8)).astype(np.float32)
    for epoch, total in [(0, 9), (4, 9), (8, 9)]:
        ref_mgr = ref_contrastive.ContrastiveLearningManager(
            model=None, criterion=None
        )
        ref_mgr.set_epoch(epoch, total)
        ref_w = ref_mgr.get_curriculum_weight(torch.tensor(sim)).numpy()

        mgr = ContrastiveLearningManager(criterion=None)
        mgr.set_epoch(epoch, total)
        our_w = np.asarray(mgr.get_curriculum_weight(jnp.asarray(sim)))
        np.testing.assert_allclose(our_w, ref_w, rtol=1e-5, atol=1e-6)


def test_manager_compute_loss_runs():
    img, txt = _embeds(seed=11)
    criterion = HardNegativeMiningInfoNCE(temperature_schedule=False)
    mgr = ContrastiveLearningManager(criterion=criterion)
    mgr.set_epoch(0, 10)
    loss = mgr.compute_loss(jnp.asarray(img), jnp.asarray(txt))
    assert np.isfinite(float(loss))
