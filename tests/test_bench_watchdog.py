"""bench.py phase watchdog: timeouts, retries, and partial results.

The driver runs ``python bench.py`` unattended on the tunneled chip; a
wedged tunnel blocks inside native code, so bench.py runs each TPU
phase in a killable subprocess (bench.py:_run_phase). These tests pin
the recovery contract with a mocked subprocess layer — no TPU, no real
sleeps.
"""

import json
import subprocess
import sys
import types

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


class _Result:
    def __init__(self, rc=0, stdout="", stderr=""):
        self.returncode = rc
        self.stdout = stdout
        self.stderr = stderr


@pytest.fixture(autouse=True)
def _no_sleep(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)


def test_phase_parses_last_json_line(monkeypatch):
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **k: _Result(0, "noise\n{\"throughput\": 42.0}\n"))
    assert bench._run_phase("tpu") == {"throughput": 42.0}


def test_phase_retries_after_timeout_then_succeeds(monkeypatch):
    calls = {"n": 0}

    def fake_run(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise subprocess.TimeoutExpired(cmd="bench", timeout=1)
        return _Result(0, '{"throughput": 7.0}')

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench._run_phase("tpu") == {"throughput": 7.0}
    assert calls["n"] == 2


def test_phase_gives_up_after_attempts(monkeypatch):
    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd="bench", timeout=1)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench._run_phase("tpu", attempts=2) is None


def test_phase_nonzero_rc_is_failure(monkeypatch):
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **k: _Result(1, "", "boom"))
    assert bench._run_phase("tpu", attempts=1) is None


def test_main_reports_wedge_honestly(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_run_phase", lambda *a, **k: None)
    monkeypatch.setattr(bench, "bench_torch_cpu", lambda: 100.0)
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] is None
    assert "error" in rec


def test_main_partial_result_keeps_tpu_number(monkeypatch, capsys):
    def fake_phase(phase, attempts=2):
        if phase == "tpu":
            return {"throughput": 1000.0}
        if phase == "calibrate":
            return {"calibration_ms": bench.CALIBRATION_ANCHOR_MS * 2}
        return None  # retrieval wedged

    monkeypatch.setattr(bench, "_run_phase", fake_phase)
    monkeypatch.setattr(bench, "bench_torch_cpu", lambda: 100.0)
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 1000.0
    # Round 5: vs_baseline divides by the MEASURED reference train.py
    # rate (benchmarks/ref_timing/ref_train_timing.json); the in-process
    # torch step remains as a secondary key.
    ref = bench._ref_measured_imgs_per_sec()
    assert ref is not None and rec["vs_baseline"] == round(1000.0 / ref, 2)
    assert "actual reference train.py" in rec["vs_baseline_kind"]
    assert rec["vs_torch_inprocess_step"] == 10.0
    # Calibration: this fake session ran 2x SLOWER than the anchor, so
    # the anchor-normalized value is 2x the raw one.
    assert rec["session_speed_vs_anchor"] == 0.5
    assert rec["value_anchor_normalized"] == 2000.0
    assert rec["retrieval_train_pairs_per_sec"] is None
    assert "retrieval" in rec["error"]


def test_main_survives_missing_calibration(monkeypatch, capsys):
    def fake_phase(phase, attempts=2):
        if phase == "tpu":
            return {"throughput": 1000.0}
        if phase == "retrieval":
            return {"pairs_per_sec": 10.0, "infer_ms": 1.0}
        return None  # calibrate + tuned wedged

    monkeypatch.setattr(bench, "_run_phase", fake_phase)
    monkeypatch.setattr(bench, "bench_torch_cpu", lambda: 100.0)
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 1000.0
    assert rec["calibration_ms"] is None
    assert rec["session_speed_vs_anchor"] is None
    assert rec["value_anchor_normalized"] is None
