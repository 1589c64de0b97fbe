"""Preemption drill: SIGKILL a real training CLI mid-run, resume, finish.

The reference has no resume path at all (SURVEY.md §5: checkpoints are
loaded only for final evaluation). This framework's async-Orbax state +
``--resume`` must survive the production failure mode — the process
dying with no chance to clean up — so this test kills the classifier CLI
with SIGKILL once the first epoch's training state is committed, then
reruns with ``--resume`` and asserts training continues from the saved
epoch instead of restarting.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow

_ARGS = [
    "--dataset", "fashion_mnist", "--batch-size", "32", "--epochs", "5",
    "--use-rpb", "--subset-fraction", "0.02", "--orbax-freq", "1",
]


def _launch(tmp_path, extra):
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "ATQ_NO_DOWNLOAD": "1"})
    return subprocess.Popen(
        [sys.executable, "-u", "train.py", *_ARGS,
         "--checkpoint-dir", str(tmp_path / "ckpt"),
         "--plots-dir", str(tmp_path / "plots"), *extra],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
    )


def test_sigkill_then_resume(tmp_path):
    orbax_dir = tmp_path / "ckpt" / "orbax_fashion_mnist"

    # Phase 1: run until the epoch-1 Orbax state is committed, then
    # SIGKILL — no atexit, no finally blocks, nothing flushes.
    proc = _launch(tmp_path, [])
    try:
        deadline = time.time() + 420
        committed = False
        while time.time() < deadline and proc.poll() is None:
            if orbax_dir.exists() and any(
                    (orbax_dir / d / "_CHECKPOINT_METADATA").exists()
                    or (orbax_dir / d).is_dir()
                    for d in os.listdir(orbax_dir)):
                committed = True
                break
            time.sleep(2.0)
        assert committed, "no Orbax state appeared within the deadline"
        # Let the async save finish its commit before the kill: the drill
        # tests dying AFTER a checkpoint exists, not torn-write recovery
        # (Orbax handles torn saves by ignoring uncommitted steps). Short
        # sleep so the remaining epochs don't finish before the kill.
        time.sleep(4.0)
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode != 0  # it really was killed

    # Phase 2: resume. Must pick up from a saved epoch (>=1), not scratch.
    proc2 = _launch(tmp_path, ["--resume"])
    out, _ = proc2.communicate(timeout=540)
    assert proc2.returncode == 0, out
    assert "Resumed from" in out, out
    resumed_epoch = int(out.split("at epoch", 1)[1].split()[0])
    assert resumed_epoch >= 1, out
    # And it trained the REMAINING epochs only.
    assert f"Epoch {resumed_epoch + 1}/5" in out, out
    assert "Epoch 1/5" not in out, out
