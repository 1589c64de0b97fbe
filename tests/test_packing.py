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


# ---------------------------------------------------------------------------
# planar32 (int32-lane) packing — the native-lane serving variant
# ---------------------------------------------------------------------------

def test_planar32_round_trip():
    from atq_tpu.core.packing import pack_planar32, unpack_planar32

    w = _random_ternary((9, 300), seed=3)
    packed = pack_planar32(jnp.asarray(w))
    assert packed.dtype == jnp.int32
    assert packed.shape == (9, 2048 // 16)  # K padded to 2048, 16/word
    out = unpack_planar32(packed, 300)
    np.testing.assert_array_equal(np.asarray(out), w)


def test_planar32_zero_word_constant():
    from atq_tpu.core.packing import PLANAR32_ZERO_WORD, unpack_planar32

    word = jnp.full((1, 1), PLANAR32_ZERO_WORD, jnp.int32)
    np.testing.assert_array_equal(np.asarray(unpack_planar32(word, 16)),
                                  np.zeros((1, 16), np.float32))


@pytest.mark.parametrize("alpha_neg", [None, 0.7])
def test_planar32_matmul_matches_dense(alpha_neg):
    from atq_tpu.core.packing import pack_planar32
    from atq_tpu.ops.ternary_matmul import packed_ternary_matmul

    rng = np.random.RandomState(11)
    w = _random_ternary((64, 200), seed=11)
    x = jnp.asarray(rng.randn(5, 200).astype(np.float32))
    packed = pack_planar32(jnp.asarray(w))
    got = packed_ternary_matmul(x, packed, (64, 200), alpha=1.3,
                                layout="planar32", alpha_neg=alpha_neg)
    if alpha_neg is None:
        want = np.asarray(x) @ w.T * 1.3
    else:
        w_eff = 1.3 * np.maximum(w, 0) + alpha_neg * np.minimum(w, 0)
        want = np.asarray(x) @ w_eff.T
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)


def test_pack32_export_serves_identically(monkeypatch):
    """ATQ_PACK32=1 export must serve the same numbers as the uint8 path
    (same planes, different word width), including the sparse correction."""
    import jax

    from atq_tpu.serve.packed_model import (
        pack_quantized_layer,
        packed_linear_apply,
    )

    rng = np.random.RandomState(5)
    n, k = 32, 150
    weight = rng.randn(n, k).astype(np.float32) * 0.1
    mask = (rng.rand(n, k) < 0.05).astype(np.float32)
    params = {"weight": jnp.asarray(weight), "alpha": jnp.asarray(1.1),
              "bias": jnp.asarray(rng.randn(n).astype(np.float32))}
    quant = {"sparsity_target": 0.3, "precision_mask": jnp.asarray(mask)}
    x = jnp.asarray(rng.randn(4, k).astype(np.float32))

    monkeypatch.setenv("ATQ_PACK32", "0")
    e8 = pack_quantized_layer(params, quant)
    y8 = packed_linear_apply(e8, x)
    monkeypatch.setenv("ATQ_PACK32", "1")
    e32 = pack_quantized_layer(params, quant)
    assert e32["packed"].dtype == jnp.int32
    assert e32["corr_idx"].dtype == jnp.int32
    y32 = packed_linear_apply(e32, x)
    np.testing.assert_allclose(np.asarray(y32), np.asarray(y8),
                               rtol=1e-5, atol=1e-4)
