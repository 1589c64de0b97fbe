"""Benchmark timing protocol (atq_tpu/utils/timing.py).

The round-4 protocol reports the MEDIAN of N>=5 device_get-synced windows
with IQR dispersion — best-window headlines proved unreproducible across
tunnel windows (BENCHMARKS.md round-3 config-3 note). These tests pin the
stats contract on the CPU backend with a trivial chained step.
"""

import jax
import jax.numpy as jnp

from atq_tpu.utils.timing import (
    sec_per_call,
    steady_state_sec_per_step,
    steady_state_step_stats,
)


@jax.jit
def _step(state):
    new = state + 1.0
    return new, new.sum()


def test_step_stats_contract():
    state = jnp.zeros((16,), jnp.float32)
    stats, final = steady_state_step_stats(
        lambda s: _step(s), state, (), warmup=1, iters=5, windows=5)
    ws = stats["windows_sec_per_step"]
    assert len(ws) == 5
    assert ws == sorted(ws)
    assert stats["sec_per_step_best"] == ws[0]
    assert ws[0] <= stats["sec_per_step_median"] <= ws[-1]
    # median of a sorted odd-length list is the middle element
    assert stats["sec_per_step_median"] == ws[2]
    assert stats["sec_per_step_iqr"] >= 0.0
    assert stats["iters_per_window"] >= 5
    # state threaded through every warmup + pilot + window call
    assert float(final[0]) > 0


def test_step_stats_median_even_windows():
    state = jnp.zeros((4,), jnp.float32)
    stats, _ = steady_state_step_stats(
        lambda s: _step(s), state, (), warmup=1, iters=4, windows=4)
    ws = stats["windows_sec_per_step"]
    assert len(ws) == 4
    assert stats["sec_per_step_median"] == 0.5 * (ws[1] + ws[2])


def test_step_stats_min_windows_clamped():
    state = jnp.zeros((4,), jnp.float32)
    stats, _ = steady_state_step_stats(
        lambda s: _step(s), state, (), warmup=1, iters=4, windows=1)
    assert len(stats["windows_sec_per_step"]) == 3  # clamped to >= 3


def test_best_window_api_still_works():
    state = jnp.zeros((4,), jnp.float32)
    sec, final = steady_state_sec_per_step(
        lambda s: _step(s), state, (), warmup=1, iters=4, windows=2)
    assert sec > 0
    assert float(final[0]) > 0
    assert sec_per_call(lambda x: _step(x)[1], state, iters=4) > 0
