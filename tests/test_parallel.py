"""Multi-device tests on the virtual 8-device CPU mesh: DP loss
equivalence, the global contrastive negative pool, TP sharding, and the
driver entry points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from atq_tpu.losses.contrastive import HardNegativeMiningInfoNCE
from atq_tpu.parallel.collectives import (
    all_gather_embeddings,
    global_contrastive_similarity,
    psum_grads,
)
from atq_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(dp=8)


def test_mesh_axes(mesh8):
    assert mesh8.axis_names == ("data", "model")
    assert mesh8.devices.shape == (8, 1)


def test_shard_batch_and_replicate(mesh8):
    batch = (np.random.randn(16, 4).astype(np.float32),
             np.arange(16, dtype=np.int32))
    sharded = shard_batch(batch, mesh8)
    assert sharded[0].sharding.spec == P("data", None)
    params = {"w": jnp.ones((3, 3))}
    rep = replicate(params, mesh8)
    assert rep["w"].sharding.spec == P()


def test_global_negative_pool_matches_single_device(mesh8):
    """The DP contrastive loss over a sharded batch must equal the
    single-device loss over the full batch — the all-gathered global
    negative pool is what makes them match."""
    rng = np.random.RandomState(0)
    img = rng.randn(16, 8).astype(np.float32)
    txt = rng.randn(16, 8).astype(np.float32)
    criterion = HardNegativeMiningInfoNCE(temperature_schedule=False)

    expected = float(criterion(jnp.asarray(img), jnp.asarray(txt)))

    @jax.jit
    def dp_loss(img, txt):
        def shard_fn(img_shard, txt_shard):
            img_g = all_gather_embeddings(img_shard)
            txt_g = all_gather_embeddings(txt_shard)
            return criterion(img_g, txt_g)

        return jax.shard_map(
            shard_fn, mesh=mesh8,
            in_specs=(P("data", None), P("data", None)),
            out_specs=P(),  # loss replicated (identical on every device)
            check_vma=False,
        )(img, txt)

    got = float(dp_loss(jnp.asarray(img), jnp.asarray(txt)))
    assert abs(got - expected) < 1e-5


def test_psum_grads(mesh8):
    x = np.arange(8, dtype=np.float32)

    @jax.jit
    def summed(x):
        return jax.shard_map(
            lambda s: psum_grads(s), mesh=mesh8,
            in_specs=P("data"), out_specs=P("data"),
            check_vma=False,
        )(x)

    np.testing.assert_allclose(np.asarray(summed(jnp.asarray(x))),
                               np.full(8, x.sum()))


def test_global_similarity_helper(mesh8):
    rng = np.random.RandomState(1)
    img = rng.randn(8, 4).astype(np.float32)
    txt = rng.randn(8, 4).astype(np.float32)

    @jax.jit
    def sim(img, txt):
        return jax.shard_map(
            lambda i, t: global_contrastive_similarity(i, t, 0.07),
            mesh=mesh8, in_specs=(P("data", None), P("data", None)),
            out_specs=P(),
            check_vma=False,
        )(img, txt)

    expected = img @ txt.T / 0.07
    np.testing.assert_allclose(np.asarray(sim(jnp.asarray(img),
                                              jnp.asarray(txt))),
                               expected, rtol=1e-5)


def test_graft_entry_single():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_graft_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
