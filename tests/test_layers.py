"""Layer-level numerical + gradient parity tests.

Verifies the SURVEY.md §2.1 gradient quirk exactly: TernaryLinear's latent
weight gets zero gradient (only alpha/bias train); RPBLinear's weight gets
gradient only on the masked top-k% entries.
"""

import flax.linen  # noqa: F401  (ensure flax imports cleanly)
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu.nn.layers import (
    ResidualPrecisionBoostLinear,
    TernaryLinear,
    apply_selective_routing,
    selective_gradient_routing,
)


def _init(module, x, rng=0):
    variables = module.init(jax.random.PRNGKey(rng), x)
    return variables


def test_ternary_linear_forward_matches_torch(reference_modules):
    import torch

    rng = np.random.RandomState(0)
    w = rng.randn(32, 16).astype(np.float32)
    b = rng.randn(32).astype(np.float32)
    alpha = np.asarray([1.3], dtype=np.float32)
    x = rng.randn(4, 16).astype(np.float32)

    ref = reference_modules["layers"].TernaryLinear(16, 32)
    with torch.no_grad():
        ref.weight.copy_(torch.tensor(w))
        ref.bias.copy_(torch.tensor(b))
        ref.alpha.copy_(torch.tensor(alpha))
    ref_out = ref(torch.tensor(x)).detach().numpy()

    layer = TernaryLinear(features=32)
    variables = _init(layer, jnp.asarray(x))
    variables = {
        "params": {
            "weight": jnp.asarray(w),
            "bias": jnp.asarray(b),
            "alpha": jnp.asarray(alpha),
        }
    }
    out = layer.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-5, atol=1e-5)


def test_rpb_linear_forward_matches_torch(reference_modules):
    import torch

    rng = np.random.RandomState(1)
    w = rng.randn(24, 48).astype(np.float32)
    b = rng.randn(24).astype(np.float32)
    alpha = np.asarray([0.9], dtype=np.float32)
    x = rng.randn(5, 48).astype(np.float32)

    ref = reference_modules["precision_boost"].ResidualPrecisionBoostLinear(
        48, 24, precision_ratio=0.1, sparsity_target=0.25
    )
    with torch.no_grad():
        ref.weight.copy_(torch.tensor(w))
        ref.bias.copy_(torch.tensor(b))
        ref.alpha.copy_(torch.tensor(alpha))
    # Recompute the mask from OUR weight values the way the reference does at
    # reset_parameters (precision_boost.py:49-60).
    with torch.no_grad():
        flat = torch.tensor(np.abs(w)).view(-1)
        k = int(0.1 * flat.numel())
        _, idx = torch.topk(flat, k)
        ref.precision_mask.zero_()
        ref.precision_mask.view(-1)[idx] = 1.0
    ref_out = ref(torch.tensor(x)).detach().numpy()

    layer = ResidualPrecisionBoostLinear(
        features=24, precision_ratio=0.1, sparsity_target=0.25
    )
    variables = _init(layer, jnp.asarray(x))
    mask = np.zeros(w.size, dtype=np.float32)
    mask[np.argsort(-np.abs(w).ravel())[: int(0.1 * w.size)]] = 1.0
    variables = {
        "params": {
            "weight": jnp.asarray(w),
            "bias": jnp.asarray(b),
            "alpha": jnp.asarray(alpha),
        },
        "quant": {
            "precision_mask": jnp.asarray(mask.reshape(w.shape)),
            "sparsity_target": jnp.float32(0.25),
        },
    }
    out = layer.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4, atol=1e-4)


def test_ternary_linear_zero_weight_grad():
    x = jnp.asarray(np.random.RandomState(2).randn(4, 16).astype(np.float32))
    layer = TernaryLinear(features=8)
    variables = layer.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(layer.apply({"params": params}, x) ** 2)

    g = jax.grad(loss)(variables["params"])
    np.testing.assert_array_equal(np.asarray(g["weight"]), 0.0)
    assert np.any(np.asarray(g["alpha"]) != 0)
    assert np.any(np.asarray(g["bias"]) != 0)


def test_rpb_grad_only_on_masked_entries():
    x = jnp.asarray(np.random.RandomState(3).randn(4, 32).astype(np.float32))
    layer = ResidualPrecisionBoostLinear(features=16, precision_ratio=0.05)
    variables = layer.init(jax.random.PRNGKey(0), x)
    mask = np.asarray(variables["quant"]["precision_mask"])

    def loss(params):
        return jnp.sum(
            layer.apply({"params": params, "quant": variables["quant"]}, x) ** 2
        )

    g = np.asarray(jax.grad(loss)(variables["params"])["weight"])
    # Gradient must vanish exactly where the mask is zero...
    np.testing.assert_array_equal(g[mask == 0], 0.0)
    # ...and be (generically) nonzero on the masked entries.
    assert np.any(g[mask == 1] != 0)


def test_ste_mode_trains_all_weights():
    x = jnp.asarray(np.random.RandomState(4).randn(4, 16).astype(np.float32))
    layer = TernaryLinear(features=8, grad_mode="ste")
    variables = layer.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(layer.apply({"params": params}, x) ** 2)

    g = np.asarray(jax.grad(loss)(variables["params"])["weight"])
    assert np.mean(g != 0) > 0.5


def test_sparsity_update_changes_quantization_without_recompile():
    x = jnp.asarray(np.random.RandomState(5).randn(2, 64).astype(np.float32))
    layer = ResidualPrecisionBoostLinear(features=32, sparsity_target=0.05)
    variables = layer.init(jax.random.PRNGKey(0), x)

    traces = []

    @jax.jit
    def fwd(variables):
        traces.append(1)
        return layer.apply(variables, x)

    out1 = fwd(variables)
    variables2 = {
        "params": variables["params"],
        "quant": {**variables["quant"], "sparsity_target": jnp.float32(0.9)},
    }
    out2 = fwd(variables2)
    assert len(traces) == 1  # no retrace on sparsity change
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_routing_identity_forward():
    x = jnp.asarray(np.random.RandomState(6).randn(3, 5).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(apply_selective_routing(x)), x)
    np.testing.assert_array_equal(
        np.asarray(selective_gradient_routing(x)), np.asarray(x)
    )


def test_full_routing_backward_masks_small_activations():
    x = jnp.asarray(
        np.asarray([[0.01, 10.0, 0.02, 5.0]], dtype=np.float32)
    )

    def loss(x):
        return jnp.sum(selective_gradient_routing(x, importance_factor=0.5))

    g = np.asarray(jax.grad(loss)(x))
    # top 50% by |x| (10.0 and 5.0) keep gradient; small ones are masked
    np.testing.assert_array_equal(g[0], [0.0, 1.0, 0.0, 1.0])


def test_f32_mask_checkpoints_still_work():
    """Masks are stored bool now; old checkpoints carry f32 {0,1} masks.
    Promote-on-use means both dtypes produce identical outputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from atq_tpu.nn.layers import ResidualPrecisionBoostLinear

    layer = ResidualPrecisionBoostLinear(features=16, precision_ratio=0.1,
                                         grad_mode="ste")
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8), jnp.float32)
    v = layer.init(jax.random.PRNGKey(0), x)
    assert v["quant"]["precision_mask"].dtype == jnp.bool_
    y_bool = layer.apply(v, x)
    v_f32 = {**v, "quant": {**v["quant"],
                            "precision_mask":
                            v["quant"]["precision_mask"].astype(
                                jnp.float32)}}
    y_f32 = layer.apply(v_f32, x)
    np.testing.assert_array_equal(np.asarray(y_bool), np.asarray(y_f32))
