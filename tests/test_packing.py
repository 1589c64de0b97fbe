"""Bit-packing round-trip + reference-format compatibility tests.

Reference format: /root/reference/atq/bit_packing.py (2 bits/value,
-1->00, 0->01, +1->10, 4 values/byte, little-end-first bit positions).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu.core.packing import TernaryBitPacking, pack_rows, unpack_rows


def _random_ternary(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.choice([-1.0, 0.0, 1.0], size=shape).astype(np.float32)


@pytest.mark.parametrize("shape", [(3, 4), (7, 5), (128, 33), (17,)])
def test_round_trip(shape):
    w = _random_ternary(shape, seed=sum(shape))
    packed = TernaryBitPacking.pack_ternary_weights(w)
    out = TernaryBitPacking.unpack_ternary_weights(packed)
    np.testing.assert_array_equal(np.asarray(out), w)


def test_packed_bytes_match_reference_format(reference_modules):
    """Byte-for-byte identical packed output vs the reference packer."""
    import torch

    w = _random_ternary((6, 7), seed=42)
    ours = TernaryBitPacking.pack_ternary_weights(w)
    theirs = reference_modules["bit_packing"].TernaryBitPacking.pack_ternary_weights(
        torch.tensor(w)
    )
    np.testing.assert_array_equal(
        np.asarray(ours["packed_weights"]),
        theirs["packed_weights"].numpy(),
    )
    assert ours["metadata"]["num_values"] == theirs["metadata"]["num_values"]
    assert ours["original_shape"] == tuple(theirs["original_shape"])


def test_cross_unpack_reference_packed(reference_modules):
    """Our unpacker must decode reference-packed dicts (checkpoint interop)."""
    import torch

    w = _random_ternary((5, 9), seed=7)
    theirs = reference_modules["bit_packing"].TernaryBitPacking.pack_ternary_weights(
        torch.tensor(w)
    )
    packed = {
        "packed_weights": jnp.asarray(theirs["packed_weights"].numpy()),
        "original_shape": tuple(theirs["original_shape"]),
        "metadata": {"num_values": theirs["metadata"]["num_values"]},
    }
    out = TernaryBitPacking.unpack_ternary_weights(packed)
    np.testing.assert_array_equal(np.asarray(out), w)


def test_validation_rejects_non_ternary():
    with pytest.raises(ValueError):
        TernaryBitPacking.pack_ternary_weights(np.asarray([0.5, 1.0]))


def test_memory_savings_16x():
    savings = TernaryBitPacking.compute_memory_savings(np.zeros((64, 64)))
    assert savings["compression_ratio"] == 16.0
    assert savings["packed_bytes"] == 64 * 64 * 2 // 8


def test_fast_ternary_matmul_matches_dense():
    w = _random_ternary((16, 24), seed=3)
    x = np.random.RandomState(4).randn(8, 24).astype(np.float32)
    packed = TernaryBitPacking.pack_ternary_weights(w)
    out = TernaryBitPacking.fast_ternary_matmul(packed, x, alpha=2.0)
    expected = x @ w.T * 2.0
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("in_features", [8, 33, 128])
def test_pack_rows_round_trip(in_features):
    w = _random_ternary((16, in_features), seed=in_features)
    packed = pack_rows(jnp.asarray(w))
    assert packed.shape == (16, (in_features + 3) // 4)
    out = unpack_rows(packed, in_features)
    np.testing.assert_array_equal(np.asarray(out), w)


def test_atq_no_pallas_kill_switch(monkeypatch):
    """ATQ_NO_PALLAS=1 must force every kernel gate to the XLA fallback
    regardless of backend — the production escape hatch for a faulting
    Pallas kernel (a kernel fault crashes the TPU worker process)."""
    from atq_tpu.ops import fused_linear, order_stat, ternary_matmul

    monkeypatch.setenv("ATQ_NO_PALLAS", "1")
    assert ternary_matmul.pallas_disabled()
    assert not ternary_matmul.pallas_eligible((64, 512), (128, 512))
    assert not order_stat.order_stat_eligible(1024)
    assert not fused_linear._on_tpu()
    monkeypatch.setenv("ATQ_NO_PALLAS", "0")
    assert not ternary_matmul.pallas_disabled()
