"""Space-to-depth stem: exact equivalence with the direct 7x7/2 conv.

The rewrite (atq_tpu/ops/s2d_stem.py) is algebraically identical to the
direct stem conv — same sum, reassociated — so forward and both VJPs
must agree to float rounding at every even spatial size, including ones
where the zero-padded kernel column overlaps real padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu.ops.s2d_stem import pack_stem_kernel, space_to_depth, stem_conv


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32))


@pytest.mark.parametrize("hw", [32, 160, 14])
def test_forward_equivalence(hw):
    x = _rand((2, hw, hw, 3), 0)
    k = _rand((7, 7, 3, 16), 1)
    direct = stem_conv(x, k, use_s2d=False)
    s2d = stem_conv(x, k, use_s2d=True)
    assert direct.shape == s2d.shape == (2, hw // 2, hw // 2, 16)
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def test_gradient_equivalence():
    x = _rand((2, 32, 32, 3), 2)
    k = _rand((7, 7, 3, 8), 3)
    g = _rand((2, 16, 16, 8), 4)

    def run(use_s2d):
        _, vjp = jax.vjp(lambda a, w: stem_conv(a, w, use_s2d=use_s2d), x, k)
        return vjp(g)

    gx_d, gk_d = run(False)
    gx_s, gk_s = run(True)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_d),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_s), np.asarray(gk_d),
                               rtol=1e-4, atol=1e-4)


def test_odd_size_falls_back():
    x = _rand((1, 15, 15, 3), 5)
    k = _rand((7, 7, 3, 4), 6)
    np.testing.assert_array_equal(
        np.asarray(stem_conv(x, k, use_s2d=True)),
        np.asarray(stem_conv(x, k, use_s2d=False)))


def test_space_to_depth_roundtrip_order():
    # (dr, dc, c) row-major: block offset (1, 0) of channel 2 lands at
    # channel index (1*2 + 0)*C + 2.
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    y = space_to_depth(x)
    assert y.shape == (2, 2, 2, 12)
    np.testing.assert_array_equal(np.asarray(y[0, 1, 0, (1 * 2 + 0) * 3 + 2]),
                                  np.asarray(x[0, 3, 0, 2]))


def test_pack_kernel_zero_pad_column():
    k = jnp.ones((7, 7, 3, 2), jnp.float32)
    k4 = pack_stem_kernel(k)
    assert k4.shape == (4, 4, 12, 2)
    # Total mass preserved: the pad contributes zeros only.
    assert float(k4.sum()) == pytest.approx(float(k.sum()))
    # Entries with A==0 and dr==0 map from the padded w8 row 0 == zeros.
    k4v = np.asarray(k4).reshape(4, 4, 2, 2, 3, 2)  # A, B, dr, dc, C, K
    assert (k4v[0, :, 0] == 0).all()
    assert (k4v[1:, :, :] != 0).any()


def test_stem_module_param_path_matches_nn_conv():
    import flax.linen as nn

    from atq_tpu.models.resnet import StemConv

    x = jnp.zeros((1, 16, 16, 3), jnp.float32)

    def scoped_init(make):
        class Parent(nn.Module):
            @nn.compact
            def __call__(self, inp):
                return make()(inp)

        return Parent().init(jax.random.PRNGKey(0), x)

    mine = scoped_init(lambda: StemConv(8, name="conv1"))
    ref = scoped_init(lambda: nn.Conv(8, (7, 7), strides=2, padding=3,
                                      use_bias=False, name="conv1"))
    assert mine["params"]["conv1"]["kernel"].shape == (7, 7, 3, 8)
    # Same param path, same init fn, same RNG folding -> identical init,
    # so from-scratch runs are unchanged by the stem swap.
    np.testing.assert_array_equal(
        np.asarray(mine["params"]["conv1"]["kernel"]),
        np.asarray(ref["params"]["conv1"]["kernel"]))


def test_resnet_env_dispatch(monkeypatch):
    from atq_tpu.models.resnet import resnet18_features

    model = resnet18_features()
    x = _rand((1, 32, 32, 3), 7)
    v = model.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("ATQ_S2D_STEM", "1")
    on = model.apply(v, x)
    monkeypatch.setenv("ATQ_S2D_STEM", "0")
    off = model.apply(v, x)
    np.testing.assert_allclose(np.asarray(on), np.asarray(off),
                               rtol=1e-4, atol=1e-5)
