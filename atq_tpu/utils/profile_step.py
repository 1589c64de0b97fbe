"""Op-level step profiling: capture a jax.profiler trace and summarize it.

The reference has no profiler at all (SURVEY.md §5 — wall-clock
``time.time()`` only, utils/metrics.py:21-57). The trainers here already
capture traces behind ``--profile-dir``; this module closes the loop by
PARSING those traces so "where does the step time go" is answerable
without TensorBoard: it aggregates the Chrome-trace events XLA emits per
op and prints the top-k by device time.

Typical use::

    from atq_tpu.utils.profile_step import profile_fn, print_summary
    summary = profile_fn(lambda: step(state, batch, t, k, rng), iters=10)
    print_summary(summary)

or post-hoc on a ``--profile-dir`` capture::

    python -m atq_tpu.utils.profile_step outputs/run1/trace
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

# Track preference, most specific first: the op-level lane ("XLA Ops")
# gives per-fusion timings; module/step lanes only repeat the whole-step
# duration (module name / step number per execution) and would drown the
# op rows, so they are used only when no finer lane exists.
_TRACK_PREFERENCE = [
    re.compile(r"XLA Ops", re.I),
    re.compile(r"TensorFlow Ops", re.I),
    re.compile(r"XLA Modules", re.I),
    re.compile(r"(/device:|Steps)", re.I),
]


@dataclass
class OpStat:
    name: str
    total_us: float
    count: int
    pct: float


def _latest_trace_file(trace_dir: str) -> str:
    pats = [
        os.path.join(trace_dir, "**", "*.trace.json.gz"),
        os.path.join(trace_dir, "**", "*.trace.json"),
    ]
    hits: List[str] = []
    for p in pats:
        hits.extend(glob.glob(p, recursive=True))
    if not hits:
        raise FileNotFoundError(
            f"no *.trace.json(.gz) under {trace_dir!r} — was the trace "
            f"captured with jax.profiler.start_trace/stop_trace?")
    return max(hits, key=os.path.getmtime)


def _load_events(path: str) -> List[dict]:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", data if isinstance(data, list) else [])


def summarize_trace(trace_dir: str, top: int = 25,
                    device_only: bool = True) -> List[OpStat]:
    """Aggregate complete events by op name, descending total duration.

    Args:
        trace_dir: directory passed to ``jax.profiler.start_trace``.
        top: max rows returned.
        device_only: keep only events on device/XLA tracks (fall back to
            all tracks when none match — e.g. minimal CPU traces).
    """
    events = _load_events(_latest_trace_file(trace_dir))

    # metadata: map (pid) -> process name and (pid, tid) -> thread name
    proc_names: Dict[int, str] = {}
    thread_names: Dict[tuple, str] = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                proc_names[e.get("pid")] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                thread_names[(e.get("pid"), e.get("tid"))] = (
                    e["args"].get("name", ""))

    complete = [e for e in events if e.get("ph") == "X" and "dur" in e]
    if device_only:
        def track_name(e) -> str:
            return (proc_names.get(e.get("pid"), "") + " | " +
                    thread_names.get((e.get("pid"), e.get("tid")), ""))

        for pat in _TRACK_PREFERENCE:
            hit = [e for e in complete if pat.search(track_name(e))]
            if hit:
                complete = hit
                break

    agg: Dict[str, List[float]] = {}
    for e in complete:
        name = e.get("name", "?")
        cur = agg.setdefault(name, [0.0, 0])
        cur[0] += float(e["dur"])
        cur[1] += 1
    total = sum(v[0] for v in agg.values()) or 1.0
    stats = [OpStat(name=k, total_us=v[0], count=int(v[1]),
                    pct=100.0 * v[0] / total)
             for k, v in agg.items()]
    stats.sort(key=lambda s: -s.total_us)
    return stats[:top]


def profile_fn(fn: Callable[[], object], iters: int = 10,
               trace_dir: Optional[str] = None,
               top: int = 25) -> List[OpStat]:
    """Run ``fn`` ``iters`` times under the profiler; return the summary.

    ``fn`` should close over already-jitted callables and device-resident
    args (include one untraced warmup call before profiling to keep
    compilation out of the capture).
    """
    import tempfile

    import jax

    trace_dir = trace_dir or tempfile.mkdtemp(prefix="atq_profile_")
    fn()  # warmup outside the capture
    jax.profiler.start_trace(trace_dir)
    out = None
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    return summarize_trace(trace_dir, top=top)


def print_summary(stats: List[OpStat], file=None) -> None:
    width = max((len(s.name) for s in stats), default=10)
    width = min(width, 70)
    print(f"{'op':{width}s} {'total ms':>10s} {'count':>7s} {'%':>6s}",
          file=file)
    for s in stats:
        print(f"{s.name[:width]:{width}s} {s.total_us / 1e3:10.3f} "
              f"{s.count:7d} {s.pct:6.2f}", file=file)


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("trace_dir", help="--profile-dir of a previous run")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--all-tracks", action="store_true",
                   help="include host-side tracks, not just device ops")
    args = p.parse_args(argv)
    print_summary(summarize_trace(args.trace_dir, top=args.top,
                                  device_only=not args.all_tracks))


if __name__ == "__main__":
    main()
