"""Orbax full-state checkpointing (atq_tpu/train/checkpoint.py).

The reference has NO training resume path (SURVEY.md §5 — checkpoints are
only reloaded for final evaluation). Checks the async save → commit →
restore loop, latest-step selection, and pruning.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from atq_tpu.train.checkpoint import (
    latest_step,
    restore_train_state,
    save_train_state,
    wait_for_checkpoints,
)


def _make_state(seed):
    rng = np.random.RandomState(seed)
    params = {"dense": {"weight": jnp.asarray(rng.randn(8, 4), jnp.float32),
                        "bias": jnp.asarray(rng.randn(8), jnp.float32)}}
    tx = optax.adam(1e-3)
    return {"params": params, "opt_state": tx.init(params),
            "step": jnp.asarray(seed, jnp.int32),
            "quant": {"dense": {"sparsity_target":
                                jnp.asarray(0.3, jnp.float32)}}}


def test_async_save_restore_roundtrip(tmp_path):
    d = str(tmp_path / "ckpt")
    state = _make_state(3)
    save_train_state(d, 3, state)
    wait_for_checkpoints()  # async write must commit before reading back

    template = _make_state(0)
    restored, step = restore_train_state(d, template)
    assert step == 3
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_step_and_prune(tmp_path):
    d = str(tmp_path / "ckpt")
    for s in (1, 2, 3, 4, 5):
        save_train_state(d, s, _make_state(s), keep=2)
    wait_for_checkpoints()
    assert latest_step(d) == 5
    # restore without explicit step takes the latest
    restored, step = restore_train_state(d, _make_state(0))
    assert step == 5 and int(restored["step"]) == 5
    # old steps beyond keep are pruned (the in-flight current step is
    # never pruned; after 5 saves with keep=2 at most ~3 remain)
    import os

    remaining = sorted(int(p.split("_")[1]) for p in os.listdir(d)
                       if p.startswith("step_"))
    assert 5 in remaining and 1 not in remaining
    assert len(remaining) <= 3


def test_restore_missing_raises(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        restore_train_state(str(tmp_path / "nope"), _make_state(0))
