"""Trace-capture + summary parsing (atq_tpu/utils/profile_step.py).

The reference has no profiler (SURVEY.md §5); this checks our capture →
parse → summarize loop end-to-end on the CPU backend plus the pure
parser on a hand-built Chrome trace.
"""

import gzip
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from atq_tpu.utils.profile_step import (
    print_summary,
    profile_fn,
    summarize_trace,
)


def test_summarize_handmade_trace(tmp_path):
    d = tmp_path / "plugins" / "profile" / "2026_08_16"
    d.mkdir(parents=True)
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 2, "name": "process_name",
         "args": {"name": "python"}},
        {"ph": "X", "pid": 1, "tid": 1, "name": "fusion.1",
         "ts": 0, "dur": 300.0},
        {"ph": "X", "pid": 1, "tid": 1, "name": "fusion.1",
         "ts": 400, "dur": 100.0},
        {"ph": "X", "pid": 1, "tid": 1, "name": "dot.2",
         "ts": 600, "dur": 600.0},
        # host-side event must be excluded from the device summary
        {"ph": "X", "pid": 2, "tid": 9, "name": "HostCallback",
         "ts": 0, "dur": 9999.0},
    ]
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    stats = summarize_trace(str(tmp_path))
    names = [s.name for s in stats]
    assert names == ["dot.2", "fusion.1"]
    assert stats[0].total_us == 600.0
    assert stats[1].total_us == 400.0 and stats[1].count == 2
    assert abs(stats[0].pct + stats[1].pct - 100.0) < 1e-6
    print_summary(stats)  # smoke: formatting must not raise


def test_profile_fn_captures_real_ops(tmp_path):
    a = jnp.asarray(np.random.RandomState(0).randn(64, 64), jnp.float32)
    mm = jax.jit(lambda x: jnp.tanh(x @ x))

    stats = profile_fn(lambda: mm(a), iters=3,
                       trace_dir=str(tmp_path / "tr"))
    assert stats, "empty summary from a real capture"
    assert all(s.total_us > 0 for s in stats)
    # the capture directory contains a parseable trace file
    assert any(f.endswith((".trace.json.gz", ".trace.json"))
               for _, _, fs in os.walk(tmp_path) for f in fs)
