"""Golden parity tests for the ATQ quantizer against the PyTorch reference.

Covers the decision rules at /root/reference/atq/quantizers.py:24-59 incl.
the idx==0 and idx>=n edge cases and both alpha paths, on shared fp32 inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu.core.quantize import (
    adaptive_ternary_quantization,
    ternarize_ste,
    ternary_distribution,
)


def _torch_atq(ref, w_np, alpha=None, sparsity_target=0.3):
    import torch

    w = torch.tensor(w_np)
    a = None if alpha is None else torch.tensor(alpha)
    w_t, out_alpha = ref["quantizers"].adaptive_ternary_quantization(
        w, alpha=a, sparsity_target=sparsity_target
    )
    return w_t.numpy(), np.asarray(out_alpha.detach() if hasattr(out_alpha, "detach") else out_alpha)


@pytest.mark.parametrize("shape", [(16, 8), (128, 64), (57, 3)])
@pytest.mark.parametrize("sparsity", [0.0, 0.05, 0.3, 0.7, 0.999])
def test_bitwise_parity_computed_alpha(reference_modules, shape, sparsity):
    rng = np.random.RandomState(hash((shape, int(sparsity * 1000))) % 2**31)
    w = rng.randn(*shape).astype(np.float32)

    ref_wt, ref_alpha = _torch_atq(reference_modules, w,
                                   sparsity_target=sparsity)
    jax_wt, jax_alpha = adaptive_ternary_quantization(
        jnp.asarray(w), sparsity_target=sparsity
    )

    np.testing.assert_array_equal(np.asarray(jax_wt), ref_wt)
    np.testing.assert_allclose(np.asarray(jax_alpha), ref_alpha, rtol=1e-5)


def test_bitwise_parity_provided_alpha(reference_modules):
    rng = np.random.RandomState(0)
    w = rng.randn(64, 32).astype(np.float32)
    alpha = np.asarray([1.7], dtype=np.float32)

    ref_wt, ref_alpha = _torch_atq(reference_modules, w, alpha=alpha)
    jax_wt, jax_alpha = adaptive_ternary_quantization(
        jnp.asarray(w), alpha=jnp.asarray(alpha)
    )
    np.testing.assert_array_equal(np.asarray(jax_wt), ref_wt)
    np.testing.assert_allclose(np.asarray(jax_alpha), ref_alpha)


def test_sparsity_one_gives_all_zero(reference_modules):
    """idx >= n edge case: threshold = max + 1 -> all zeros
    (quantizers.py:33-35), and alpha falls back to mean|w|."""
    w = np.random.RandomState(1).randn(10, 10).astype(np.float32)
    ref_wt, ref_alpha = _torch_atq(reference_modules, w, sparsity_target=1.0)
    jax_wt, jax_alpha = adaptive_ternary_quantization(
        jnp.asarray(w), sparsity_target=1.0
    )
    assert np.all(np.asarray(jax_wt) == 0)
    np.testing.assert_array_equal(np.asarray(jax_wt), ref_wt)
    np.testing.assert_allclose(np.asarray(jax_alpha), ref_alpha, rtol=1e-6)


def test_sparsity_zero_uses_classic_fallback(reference_modules):
    """idx == 0 edge case: threshold = 0.05 * mean|w| (quantizers.py:36-38)."""
    w = np.random.RandomState(2).randn(8, 4).astype(np.float32)
    ref_wt, _ = _torch_atq(reference_modules, w, sparsity_target=0.0)
    jax_wt, _ = adaptive_ternary_quantization(jnp.asarray(w),
                                              sparsity_target=0.0)
    np.testing.assert_array_equal(np.asarray(jax_wt), ref_wt)


def test_traced_sparsity_no_recompile():
    """sparsity_target as a traced scalar must work under jit so per-epoch
    schedule updates don't recompile."""
    w = jnp.asarray(np.random.RandomState(3).randn(32, 16).astype(np.float32))

    @jax.jit
    def quant(sparsity):
        return adaptive_ternary_quantization(w, sparsity_target=sparsity)

    wt1, _ = quant(jnp.float32(0.1))
    wt2, _ = quant(jnp.float32(0.6))
    s1 = float(jnp.mean(wt1 == 0))
    s2 = float(jnp.mean(wt2 == 0))
    assert s2 > s1  # higher sparsity target -> more zeros


def test_parity_grad_is_zero_to_weights():
    """With provided alpha, d(output)/d(weights) must be exactly zero —
    the reference's no-STE semantics (SURVEY.md §2.1 gradient quirk)."""
    w = jnp.asarray(np.random.RandomState(4).randn(16, 8).astype(np.float32))
    alpha = jnp.ones((1,))

    def loss(w):
        wt, a = adaptive_ternary_quantization(w, alpha=alpha)
        return jnp.sum(wt * a)

    g = jax.grad(loss)(w)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_ste_grad_passes_through():
    w = jnp.asarray(np.random.RandomState(5).randn(16, 8).astype(np.float32))
    alpha = jnp.ones((1,))

    def loss(w):
        wt, a = ternarize_ste(w, alpha=alpha)
        return jnp.sum(wt * a)

    g = jax.grad(loss)(w)
    np.testing.assert_array_equal(np.asarray(g), 1.0)


def test_computed_alpha_grad_flows_to_weights():
    """When alpha=None, the reference's optimal_alpha = sum(w*w_t)/nnz is
    differentiable w.r.t. weights; our version must match that topology."""
    w = jnp.asarray(np.random.RandomState(6).randn(16, 8).astype(np.float32))

    def loss(w):
        _, a = adaptive_ternary_quantization(w)
        return a

    g = np.asarray(jax.grad(loss)(w))
    assert np.any(g != 0)


def test_distribution_helper():
    wt = jnp.asarray([[-1.0, 0.0], [1.0, 0.0]])
    d = ternary_distribution(wt)
    assert float(d["zero"]) == 0.5
    assert float(d["neg"]) == 0.25
    assert float(d["pos"]) == 0.25


class TestOrderStatisticSelect:
    """The bit-bisection order statistic must be BIT-IDENTICAL to the sort
    (it replaces the sort for large f32 tensors inside ternary_threshold)."""

    def test_matches_sort_exactly(self):
        import numpy as np
        from atq_tpu.core.quantize import _order_statistic_f32

        rng = np.random.RandomState(0)
        cases = [
            np.abs(rng.randn(20000)).astype(np.float32),
            np.zeros(17000, np.float32),
            np.full(17000, 0.25, np.float32),
            np.abs(rng.randn(16384)).astype(np.float32) * 1e-30,  # subnormals
            np.repeat(np.abs(rng.randn(200)).astype(np.float32), 100),
        ]
        for arr in cases:
            s = np.sort(arr)
            for rank in [0, 1, len(arr) // 3, len(arr) // 2, len(arr) - 1]:
                got = np.asarray(_order_statistic_f32(
                    jnp.asarray(arr), jnp.int32(rank)))
                assert got.view(np.uint32) == s[rank].view(np.uint32), (
                    f"rank {rank}: got {got!r} want {s[rank]!r}")

    def test_threshold_large_equals_sort_path(self):
        import numpy as np
        from atq_tpu.core.quantize import ternary_threshold

        rng = np.random.RandomState(1)
        w = rng.randn(40000).astype(np.float32)
        got = np.asarray(ternary_threshold(jnp.asarray(w),
                                           sparsity_target=0.3))
        want = np.sort(np.abs(w))[int(0.3 * w.size)]
        assert got == want


def test_ttq_gradient_rule():
    """Trained Ternary Quantization (PAPERS.md, arXiv:1612.01064): forward
    uses the sparsity-targeted threshold with separate +/- scales; the
    backward rule gives dWp = mean(g[pos]), dWn = -mean(g[neg]) (mean-
    normalized per the one-optimizer variant), and latent
    weights a scale-weighted straight-through gradient."""
    import jax
    import jax.numpy as jnp

    from atq_tpu.core.quantize import ternarize_ttq, ternary_threshold

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(6, 8), jnp.float32)
    wp = jnp.asarray([1.3], jnp.float32)
    wn = jnp.asarray([0.7], jnp.float32)
    g = jnp.asarray(rng.randn(6, 8), jnp.float32)

    thr = ternary_threshold(w, sparsity_target=0.3)
    pos = np.asarray(w > thr, np.float32)
    neg = np.asarray(w < -thr, np.float32)

    # forward: wp on positives, -wn on negatives, 0 in the dead zone
    out = ternarize_ttq(w, wp, wn, sparsity_target=0.3)
    np.testing.assert_allclose(np.asarray(out),
                               pos * 1.3 - neg * 0.7, rtol=1e-6)

    def loss(w, wp, wn):
        return jnp.sum(ternarize_ttq(w, wp, wn, sparsity_target=0.3) * g)

    dw, dwp, dwn = jax.grad(loss, argnums=(0, 1, 2))(w, wp, wn)
    gn = np.asarray(g)
    dead = 1.0 - pos - neg
    np.testing.assert_allclose(np.asarray(dw),
                               gn * (pos * 1.3 + neg * 0.7 + dead),
                               rtol=1e-6)
    np.testing.assert_allclose(
        float(dwp[0]), float((gn * pos).sum() / max(pos.sum(), 1)),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(dwn[0]), float(-(gn * neg).sum() / max(neg.sum(), 1)),
        rtol=1e-5)


def test_ttq_layer_trains_all_parts():
    """grad_mode='ttq' layers declare wp/wn and everything trains (latent
    weights included — unlike parity mode)."""
    import jax
    import jax.numpy as jnp

    from atq_tpu.nn.layers import ResidualPrecisionBoostLinear

    layer = ResidualPrecisionBoostLinear(features=16, grad_mode="ttq")
    x = jnp.asarray(np.random.RandomState(1).randn(4, 12), jnp.float32)
    v = layer.init(jax.random.PRNGKey(0), x)
    assert "wp" in v["params"] and "wn" in v["params"]

    def loss(p):
        return jnp.sum(layer.apply({"params": p, "quant": v["quant"]},
                                   x) ** 2)

    grads = jax.grad(loss)(v["params"])
    for k in ("weight", "wp", "wn", "bias"):
        assert float(jnp.max(jnp.abs(grads[k]))) > 0, k
