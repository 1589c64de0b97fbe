"""Ring attention vs dense attention on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu.parallel.mesh import make_mesh
from atq_tpu.parallel.ring_attention import (

    dense_reference_attention,
    sequence_parallel_attention,
)

pytestmark = pytest.mark.slow  # model-compile-heavy; excluded from the fast gate


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(dp=8)


def _qkv(b=2, h=4, l=64, d=16, seed=0):
    rng = np.random.RandomState(seed)
    return [jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
            for _ in range(3)]


def test_ring_matches_dense(mesh8):
    q, k, v = _qkv()
    dense = dense_reference_attention(q, k, v)
    ring = sequence_parallel_attention(q, k, v, mesh8, "data")
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                               rtol=2e-4, atol=2e-5)


def test_ring_matches_dense_with_padding(mesh8):
    q, k, v = _qkv(seed=1)
    rng = np.random.RandomState(2)
    # True = pad; keep at least the first half unpadded per row
    mask = np.zeros((2, 64), bool)
    mask[:, 40:] = rng.rand(2, 24) < 0.5
    mask_j = jnp.asarray(mask)
    dense = dense_reference_attention(q, k, v, key_padding_mask=mask_j)
    ring = sequence_parallel_attention(q, k, v, mesh8, "data",
                                       key_padding_mask=mask_j)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                               rtol=2e-4, atol=2e-5)


def test_ring_custom_scale(mesh8):
    q, k, v = _qkv(seed=3)
    dense = dense_reference_attention(q, k, v, scale=0.05)
    ring = sequence_parallel_attention(q, k, v, mesh8, "data", scale=0.05)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                               rtol=2e-4, atol=2e-5)
