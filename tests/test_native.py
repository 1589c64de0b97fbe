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
