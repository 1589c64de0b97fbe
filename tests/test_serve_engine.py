"""Micro-batching serving engine (atq_tpu/serve/engine.py).

Framework capability beyond the reference (its deployment story stops at
per-sample measure_inference_time, utils/metrics.py:21-57). Checks:
batching correctness vs direct apply, shape buckets + padding, early
dispatch under light traffic, per-batch error isolation, and serving the
real packed classifier.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu.serve.engine import BatchServer, pad_to_bucket, pick_bucket


def test_bucket_helpers():
    assert pick_bucket([8, 16, 32], 5) == 8
    assert pick_bucket([8, 16, 32], 16) == 16
    assert pick_bucket([8, 16, 32], 17) == 32
    with pytest.raises(ValueError):
        pick_bucket([8], 9)
    padded = pad_to_bucket(np.arange(5), 8, pad_value=0)
    assert padded.shape == (8,) and padded[5:].sum() == 0


def test_batches_match_direct_apply():
    calls = []

    def apply_fn(x):
        calls.append(x.shape[0])
        return x * 2.0

    with BatchServer(apply_fn, max_batch=8, max_wait_ms=20) as srv:
        xs = [np.full((3,), i, np.float32) for i in range(20)]
        futs = [srv.submit(x) for x in xs]
        outs = [f.result(timeout=10) for f in futs]
    for i, o in enumerate(outs):
        np.testing.assert_allclose(o, xs[i] * 2.0)
    assert sum(calls) == 20
    assert max(calls) <= 8
    assert srv.stats["requests"] == 20


def test_buckets_pad_and_separate():
    seen = []

    def apply_fn(tokens, lengths):
        seen.append(tokens.shape)
        # mean over the true length — padding must not leak
        mask = np.arange(tokens.shape[1])[None, :] < lengths[:, None]
        return (tokens * mask).sum(axis=1) / lengths

    with BatchServer(apply_fn, max_batch=4, max_wait_ms=20, bucket_by=0,
                     buckets=(8, 16)) as srv:
        futs = []
        rng = np.random.RandomState(0)
        truths = []
        for i in range(12):
            n = int(rng.randint(1, 17))
            toks = rng.rand(n).astype(np.float32)
            truths.append(toks.mean())
            futs.append(srv.submit(toks, np.asarray(n, np.float32)))
        outs = [f.result(timeout=10) for f in futs]
    np.testing.assert_allclose(outs, truths, rtol=1e-6)
    assert set(s[1] for s in seen) <= {8, 16}  # every batch bucketed


def test_light_traffic_dispatches_early():
    def apply_fn(x):
        return x + 1

    with BatchServer(apply_fn, max_batch=64, max_wait_ms=5) as srv:
        t0 = time.monotonic()
        out = srv(np.zeros(2, np.float32))
        dt = time.monotonic() - t0
    np.testing.assert_allclose(out, np.ones(2))
    assert dt < 2.0  # did not wait for a full batch of 64


def test_error_isolated_to_failing_batch():
    def apply_fn(x):
        if float(x.sum()) < 0:
            raise RuntimeError("bad batch")
        return x

    with BatchServer(apply_fn, max_batch=1, max_wait_ms=1) as srv:
        bad = srv.submit(np.full(2, -5, np.float32))
        good = srv.submit(np.ones(2, np.float32))
        with pytest.raises(RuntimeError):
            bad.result(timeout=10)
        np.testing.assert_allclose(good.result(timeout=10), np.ones(2))


def test_serves_packed_classifier():
    from atq_tpu.models.image_classifier import ATQImageClassifier
    from atq_tpu.serve.packed_model import PackedClassifier

    model = ATQImageClassifier(use_rpb=True)
    rng = np.random.RandomState(0)
    sample = jnp.zeros((2, 28, 28, 1), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), sample)
    served = PackedClassifier(v["params"], v["quant"], v["batch_stats"])

    xs = [rng.randn(28, 28, 1).astype(np.float32) for _ in range(9)]
    direct = np.asarray(served(jnp.asarray(np.stack(xs))))
    with BatchServer(lambda x: served(jnp.asarray(x)), max_batch=4,
                     max_wait_ms=10) as srv:
        outs = [f.result(timeout=30)
                for f in [srv.submit(x) for x in xs]]
    # batch-4 vs batch-9 conv reductions reassociate; logits are O(500)
    np.testing.assert_allclose(np.stack(outs), direct, rtol=1e-5,
                               atol=5e-3)


def test_concurrent_submitters():
    def apply_fn(x):
        return x * 3.0

    results = {}

    def worker(srv, wid):
        x = np.full((4,), wid, np.float32)
        results[wid] = srv(x)

    with BatchServer(apply_fn, max_batch=16, max_wait_ms=5) as srv:
        threads = [threading.Thread(target=worker, args=(srv, i))
                   for i in range(24)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
    for wid, out in results.items():
        np.testing.assert_allclose(out, np.full((4,), wid * 3.0))
    assert len(results) == 24


def test_minority_bucket_not_starved():
    """A minority-bucket request under sustained majority-bucket traffic
    must be served within a bounded number of dispatch cycles, not
    re-queued behind newer arrivals (engine.py deferred-pending deques).
    """
    dispatch_log = []  # bucket width of each dispatched batch

    def apply_fn(tokens):
        dispatch_log.append(tokens.shape[1])
        time.sleep(0.005)  # make dispatch cycles observable
        return tokens.sum(axis=1)

    stop_flood = threading.Event()

    with BatchServer(apply_fn, max_batch=4, max_wait_ms=10, bucket_by=0,
                     buckets=(8, 16)) as srv:

        def flood():
            while not stop_flood.is_set():
                srv.submit(np.ones(4, np.float32))  # bucket 8
                time.sleep(0.001)

        flooder = threading.Thread(target=flood, daemon=True)
        flooder.start()
        time.sleep(0.05)  # sustained bucket-8 traffic established
        minority = srv.submit(np.ones(12, np.float32))  # bucket 16
        n_before = len(dispatch_log)
        out = minority.result(timeout=5)  # must not starve
        n_during = len(dispatch_log) - n_before
        stop_flood.set()
        flooder.join(timeout=5)
    np.testing.assert_allclose(out, 12.0)
    # Deferral holds it back at most ~one forming batch plus its own
    # dispatch; allow slack for thread scheduling.
    assert n_during <= 6, (
        f"minority bucket waited {n_during} dispatch cycles")
    assert 16 in dispatch_log


def test_lazy_start_and_stopped_rejection():
    srv = BatchServer(lambda x: x, max_batch=4, max_wait_ms=2)
    # bare submit auto-starts the collector
    out = srv.submit(np.ones(2, np.float32)).result(timeout=10)
    np.testing.assert_allclose(out, np.ones(2))
    srv.stop()
    with pytest.raises(RuntimeError):
        srv.submit(np.ones(2, np.float32))


def test_fallback_serves_when_primary_crashes():
    calls = {"primary": 0, "fallback": 0}

    def primary(x):
        calls["primary"] += 1
        raise RuntimeError("TPU worker process crashed or restarted")

    def fallback(x):
        calls["fallback"] += 1
        return x * 2.0

    with BatchServer(primary, max_batch=4, max_wait_ms=1,
                     fallback_fn=fallback,
                     max_primary_failures=2) as srv:
        out = srv(np.ones(3, np.float32))
        np.testing.assert_allclose(out, 2.0 * np.ones(3))
        assert srv.stats["primary_failures"] == 1
        assert srv.stats["fallback_batches"] == 1
        # Second failure latches the primary off...
        srv(np.ones(3, np.float32))
        assert srv.stats["primary_failures"] == 2
        n_primary = calls["primary"]
        # ...so further batches go straight to the fallback.
        out = srv(np.ones(3, np.float32))
        np.testing.assert_allclose(out, 2.0 * np.ones(3))
        assert calls["primary"] == n_primary
        assert srv.stats["fallback_batches"] == 3


def test_both_paths_failing_hits_only_that_batch():
    def bad(x):
        raise RuntimeError("primary down")

    def also_bad(x):
        raise ValueError("fallback down")

    def good_after(x):
        return x + 1.0

    srv = BatchServer(bad, max_batch=2, max_wait_ms=1,
                      fallback_fn=also_bad, max_primary_failures=10)
    with srv:
        with pytest.raises(ValueError):
            srv(np.zeros(2, np.float32))
        # The server thread survives; swap in a working fallback to show
        # later batches still serve.
        srv._fallback = good_after
        out = srv(np.zeros(2, np.float32))
    np.testing.assert_allclose(out, np.ones(2))


def test_no_fallback_never_latches_off_the_primary():
    """Regression: with no fallback_fn, repeated primary failures used to
    latch the primary off, leaving an empty path list whose
    set_exception(None) made every later Future silently resolve to None
    (a 200 response with a null body). The primary must keep being tried
    and every caller must get a real exception."""
    calls = {"n": 0}

    def flaky(x):
        calls["n"] += 1
        if calls["n"] <= 5:
            raise RuntimeError("transient crash")
        return x + 1.0

    with BatchServer(flaky, max_batch=1, max_wait_ms=1,
                     max_primary_failures=2) as srv:
        for _ in range(5):  # well past max_primary_failures
            with pytest.raises(RuntimeError, match="transient crash"):
                srv(np.zeros(2, np.float32))
        # Primary was never latched off: once it heals, it serves again.
        out = srv(np.zeros(2, np.float32))
    np.testing.assert_allclose(out, np.ones(2))
    assert srv.stats["primary_failures"] == 5


def test_poison_inputs_do_not_latch_off_the_primary():
    """Input-induced failures (both paths fail the same batch) must not
    count toward the latch: 3 bad client requests must not permanently
    abandon the packed program for the dense fallback."""

    def primary(x):
        if x.shape[-1] != 2:
            raise RuntimeError("wrong shape for compiled program")
        return x * 10.0

    def fallback(x):
        if x.shape[-1] != 2:
            raise ValueError("wrong shape here too")
        return x * 2.0

    with BatchServer(primary, max_batch=1, max_wait_ms=1,
                     fallback_fn=fallback,
                     max_primary_failures=2) as srv:
        for _ in range(4):  # poison requests, both paths fail
            with pytest.raises(ValueError):
                srv(np.zeros(3, np.float32))
        # A good request still runs on the PRIMARY (not latched off).
        out = srv(np.ones(2, np.float32))
    np.testing.assert_allclose(out, 10.0 * np.ones(2))
    assert srv.stats["fallback_batches"] == 0
