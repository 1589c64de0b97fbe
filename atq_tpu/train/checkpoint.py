"""Orbax-based checkpointing (preemption-safe training state).

The reference saves .pth snapshots but has NO resume path — checkpoints are
only reloaded for final evaluation (SURVEY.md §5, train_multimodal.py:723-741).
This module supplies both: async Orbax saves of the FULL training state
(params, quant, batch stats, optimizer state, step/epoch counters) and a
restore that resumes training exactly where it stopped.

The flat .npz format (train/classifier.py) remains for lightweight
weight-only snapshots and torch interop.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


_ASYNC_CKPT = None


def _checkpointer():
    """Process-wide AsyncCheckpointer: ``save`` returns once the state is
    snapshotted to host memory and the write happens on a background
    thread, so per-epoch checkpointing overlaps the next epoch's compute
    instead of stalling it."""
    global _ASYNC_CKPT
    import orbax.checkpoint as ocp

    if _ASYNC_CKPT is None:
        _ASYNC_CKPT = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPT


def wait_for_checkpoints() -> None:
    """Block until every in-flight async save has committed to disk. Call
    before reading checkpoints back or exiting the process."""
    if _ASYNC_CKPT is not None:
        _ASYNC_CKPT.wait_until_finished()


def save_train_state(directory: str, step: int, state: Any,
                     keep: int = 3) -> str:
    """Async-save the full training state under ``directory/step_N``;
    prunes old COMMITTED steps beyond ``keep``."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step}")
    ckpt = _checkpointer()
    ckpt.save(path, jax.device_get(state), force=True)

    steps = sorted(
        (int(d.split("_")[1]) for d in os.listdir(directory)
         if d.startswith("step_") and d.split("_")[1].isdigit()
         and int(d.split("_")[1]) != step),
    )
    for old in steps[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(directory, f"step_{old}"),
                      ignore_errors=True)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(directory)
             if d.startswith("step_") and d.split("_")[1].isdigit()]
    return max(steps) if steps else None


def restore_train_state(directory: str, template: Any,
                        step: Optional[int] = None) -> tuple[Any, int]:
    """Restore the training state saved by :func:`save_train_state`.

    ``template`` is a freshly-initialized state pytree (defines structure
    and dtypes). Returns (state, step). Raises FileNotFoundError if nothing
    is there."""
    if step is None:
        step = latest_step(directory)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    wait_for_checkpoints()  # the latest save may still be in flight
    ckpt = _checkpointer()
    restored = ckpt.restore(path, item=jax.device_get(template))
    return restored, step
