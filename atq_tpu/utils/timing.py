"""Honest steady-state step timing for remote-dispatch TPU backends.

Two measurement hazards exist on tunneled/remote-dispatch platforms (the
axon backend here; pathologies measured 2026-08-17 on the v5e behind it):

1. ``jax.block_until_ready`` may return BEFORE the device finishes — a
   ~35 ms chained-matmul scan "completed" in 0.03 ms (implying 230
   PFLOP/s). ``jax.device_get`` of a tiny slice that depends on the
   result is the only sync that provably waits.
2. Every dispatch→fetch roundtrip costs a constant ~27 ms, which dwarfs
   millisecond steps, so a single timed window measures mostly latency.

:func:`steady_state_sec_per_step` handles both: it chains enough step
executions that the window holds >= ~0.6 s of real device work, syncs
once per window via ``device_get``, takes the best of ``windows``
windows (device rate over the tunnel jitters ~15% window to window),
and subtracts the directly-measured trivial-dispatch roundtrip floor.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence


def sync_tree(tree) -> None:
    """Block until ``tree`` is actually computed (device_get a tiny
    dependent slice of its first leaf)."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return
    leaf = leaves[0]
    jax.device_get(leaf.ravel()[0:1] if getattr(leaf, "ndim", 0) else leaf)


def steady_state_sec_per_step(step_fn: Callable, state,
                              args: Sequence = (), warmup: int = 3,
                              iters: int = 20, windows: int = 3) -> float:
    """Seconds per chained ``step_fn(state, *args) -> (state, out)`` call.

    ``state`` must thread through so successive calls form one dependency
    chain on the device; ``out`` is synced once per window. Returns
    ``(sec_per_step, final_state)`` — with donated step args the caller's
    original ``state`` buffers are stale afterwards, so reuse the
    returned one.
    """
    for _ in range(warmup):
        state, out = step_fn(state, *args)
    sync_tree(out)

    def window(n: int) -> float:
        nonlocal state
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            for _ in range(n):
                state, out = step_fn(state, *args)
            sync_tree(out)
            best = min(best, time.time() - t0)
        return best

    # Pilot window, then autoscale so each window is >= target_window_sec
    # of real work — with millisecond steps a handful of iterations is
    # comparable to the ~27 ms roundtrip. The per-window sync cost is then
    # measured directly (a trivial dispatch+fetch) and subtracted, rather
    # than estimated by differencing two windows: window-to-window device
    # rate jitter over the tunnel is ~15%, and a difference of two noisy
    # windows amplifies it.
    target_window_sec, max_iters = 0.6, 512
    pilot = window(iters)
    est = pilot / iters
    n = min(max_iters, max(iters, int(target_window_sec / max(est, 1e-7))))
    best = window(n)
    return max(best - _roundtrip_floor(), 1e-9) / n, state


def steady_state_step_stats(step_fn: Callable, state,
                            args: Sequence = (), warmup: int = 3,
                            iters: int = 20, windows: int = 5):
    """Median-of-N-windows step timing with dispersion (benchmark
    protocol, round 4): device rate over the tunnel jitters ~15%
    (occasionally 2x) window to window, so a best-window number is not
    comparable run to run — round 3's config-3 headline (6.5M tok/s)
    could not be reproduced by a later refresh (3.4M). Each of the
    ``windows`` windows is autoscaled to >= ~0.6 s of chained device
    work, synced once via ``device_get``, and pays the measured
    roundtrip floor; the reported number is the MEDIAN with the IQR as
    the dispersion bar. Returns ``(stats, final_state)``."""
    out = None
    for _ in range(warmup):
        state, out = step_fn(state, *args)
    if out is not None:  # warmup=0: nothing to sync yet
        sync_tree(out)

    def timed(n: int) -> float:
        nonlocal state
        t0 = time.time()
        for _ in range(n):
            state, out = step_fn(state, *args)
        sync_tree(out)
        return time.time() - t0

    target_window_sec, max_iters = 0.6, 512
    pilot = timed(iters)
    est = pilot / iters
    n = min(max_iters, max(iters, int(target_window_sec / max(est, 1e-7))))
    floor = _roundtrip_floor()
    samples = sorted(max(timed(n) - floor, 1e-9) / n
                     for _ in range(max(windows, 3)))
    k = len(samples)
    med = (samples[k // 2] if k % 2
           else 0.5 * (samples[k // 2 - 1] + samples[k // 2]))
    q1 = samples[max(0, (k - 1) // 4)]
    q3 = samples[min(k - 1, (3 * (k - 1) + 2) // 4)]
    stats = {
        "sec_per_step_median": med,
        "sec_per_step_best": samples[0],
        "sec_per_step_iqr": q3 - q1,
        "windows_sec_per_step": samples,
        "iters_per_window": n,
    }
    return stats, state


_FLOOR_CACHE: list = []


def _roundtrip_floor() -> float:
    """Measured dispatch->fetch roundtrip of a trivial jitted op (cached
    per process): the constant latency a synced window pays once."""
    if _FLOOR_CACHE:
        return _FLOOR_CACHE[0]
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    sync_tree(f(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        sync_tree(f(x))
        best = min(best, time.time() - t0)
    _FLOOR_CACHE.append(best)
    return best


def sec_per_call(fn: Callable, *args, warmup: int = 2, iters: int = 20,
                 windows: int = 3) -> float:
    """Slope timing for stateless repeated calls ``fn(*args)``.

    Calls don't feed each other, but a single device executes dispatches
    in order, so syncing the last call's output bounds the whole window.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync_tree(out)

    def window(n: int) -> float:
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            for _ in range(n):
                out = fn(*args)
            sync_tree(out)
            best = min(best, time.time() - t0)
        return best

    pilot = window(iters)
    est = pilot / iters
    n = min(512, max(iters, int(0.6 / max(est, 1e-7))))
    best = window(n)
    return max(best - _roundtrip_floor(), 1e-9) / n
