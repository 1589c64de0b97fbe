"""Native C++ pack/unpack kernels: build, round-trip, and byte-parity with
the jnp and reference packers."""

import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu import native
from atq_tpu.core.packing import TernaryBitPacking, pack_planar


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native library unavailable (no compiler?)")


def _ternary(shape, seed=0):
    return np.random.RandomState(seed).choice(
        [-1.0, 0.0, 1.0], size=shape
    ).astype(np.float32)


def test_flat_pack_matches_jnp():
    w = _ternary((37, 13), seed=1)
    ours = native.pack_ternary(w)
    ref = np.asarray(
        TernaryBitPacking.pack_ternary_weights(w)["packed_weights"]
    )
    np.testing.assert_array_equal(ours, ref)


def test_flat_round_trip():
    w = _ternary((100,), seed=2)
    packed = native.pack_ternary(w)
    out = native.unpack_ternary(packed, w.size, shape=w.shape)
    np.testing.assert_array_equal(out, w)


def test_planar_matches_jnp():
    w = _ternary((16, 300), seed=3)
    ours = native.pack_planar(w, k_align=512)
    ref = np.asarray(pack_planar(jnp.asarray(w), k_align=512))
    np.testing.assert_array_equal(ours, ref)


def test_pack_rejects_non_ternary():
    with pytest.raises(ValueError):
        native.pack_ternary(np.asarray([0.5], np.float32))


def test_ternarize_matches_reference_semantics():
    w = np.random.RandomState(4).randn(64, 32).astype(np.float32)
    thr = 0.4
    w_t, nnz, dot = native.ternarize(w, thr)
    expected = np.where(w > thr, 1.0, np.where(w < -thr, -1.0, 0.0))
    np.testing.assert_array_equal(w_t, expected)
    assert nnz == int(np.sum(expected != 0))
    assert abs(dot - float(np.sum(w * expected))) < 1e-3


def test_sparse_ell_native_matches_fallback():
    """Native C atq_sparse_ell == vectorized numpy fallback, and both
    reconstruct the correction matrix exactly (ELL + COO spill)."""
    import atq_tpu.native as native

    rng = np.random.RandomState(11)
    corr = np.zeros((64, 300), np.float32)
    mask = rng.rand(*corr.shape) < 0.12
    corr[mask] = rng.randn(mask.sum())
    c = 30

    results = []
    saved = (native._lib, native._tried)
    try:
        for force_fallback in (False, True):
            if force_fallback:
                native._lib, native._tried = None, True
            else:
                native._lib, native._tried = saved
            idx, val, cr, cc, cv = native.sparse_ell(corr, c)
            rec = np.zeros_like(corr)
            r_ = np.repeat(np.arange(corr.shape[0]), c)
            flat_idx, flat_val = idx.reshape(-1), val.reshape(-1)
            nz = flat_val != 0
            rec[r_[nz], flat_idx[nz]] = flat_val[nz]
            rec[cr, cc] = cv
            np.testing.assert_array_equal(rec, corr)
            results.append((idx, val, cr, cc, cv))
    finally:
        native._lib, native._tried = saved

    if native.available():
        for a, b in zip(results[0], results[1]):
            np.testing.assert_array_equal(a, b)
