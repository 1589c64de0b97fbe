"""Pipeline parallelism: GPipe schedule == sequential stage application.

Capability beyond the reference (SURVEY.md §2.6: no PP exists there); these
tests pin the schedule's correctness — forward equivalence, gradient
equivalence through the scan+ppermute schedule, and the TernaryLinear
stage case — on the 8-device virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from atq_tpu.parallel.pipeline import (

    merge_microbatches,
    pipeline_apply,
    split_microbatches,
    stack_stage_params,
)

pytestmark = pytest.mark.slow  # model-compile-heavy; excluded from the fast gate

DIM = 16


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("pipe",))


def _stage_fn(params, x):
    return jax.nn.gelu(x @ params["w"] + params["b"])


def _make_params(n_stages, seed=0):
    rng = np.random.RandomState(seed)
    return [
        {"w": jnp.asarray(rng.randn(DIM, DIM).astype(np.float32) * 0.3),
         "b": jnp.asarray(rng.randn(DIM).astype(np.float32) * 0.1)}
        for _ in range(n_stages)
    ]


def _sequential(param_list, x):
    for p in param_list:
        x = _stage_fn(p, x)
    return x


@pytest.mark.parametrize("n_stages,n_micro", [(4, 8), (8, 8), (2, 2)])
def test_pipeline_matches_sequential(n_stages, n_micro):
    mesh = _mesh(n_stages)
    param_list = _make_params(n_stages)
    stacked = stack_stage_params(param_list)
    x = jnp.asarray(
        np.random.RandomState(1).randn(n_micro * 4, DIM).astype(np.float32)
    )
    got = pipeline_apply(_stage_fn, stacked, x, mesh=mesh, n_micro=n_micro)
    want = _sequential(param_list, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_under_jit():
    mesh = _mesh(4)
    stacked = stack_stage_params(_make_params(4))
    x = jnp.asarray(
        np.random.RandomState(2).randn(16, DIM).astype(np.float32)
    )
    f = jax.jit(lambda p, x: pipeline_apply(_stage_fn, p, x, mesh=mesh,
                                            n_micro=8))
    np.testing.assert_allclose(np.asarray(f(stacked, x)),
                               np.asarray(_sequential(_make_params(4), x)),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match_sequential():
    """The schedule must be differentiable and produce the same parameter
    gradients as running the stages back to back on one device."""
    mesh = _mesh(4)
    param_list = _make_params(4, seed=3)
    stacked = stack_stage_params(param_list)
    x = jnp.asarray(
        np.random.RandomState(4).randn(8, DIM).astype(np.float32)
    )

    def loss_pipe(p):
        return jnp.mean(
            pipeline_apply(_stage_fn, p, x, mesh=mesh, n_micro=4) ** 2
        )

    def loss_seq(p_stacked):
        y = x
        for i in range(4):
            y = _stage_fn(jax.tree_util.tree_map(lambda a: a[i], p_stacked),
                          y)
        return jnp.mean(y ** 2)

    g_pipe = jax.grad(loss_pipe)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        g_pipe, g_seq,
    )


def test_pipeline_ternary_stage():
    """A quantized (TernaryLinear-math) stage pipelines identically."""
    from atq_tpu.core.quantize import adaptive_ternary_quantization

    mesh = _mesh(4)
    rng = np.random.RandomState(5)
    param_list = [
        {"w": jnp.asarray(rng.randn(DIM, DIM).astype(np.float32)),
         "alpha": jnp.float32(1.0)}
        for _ in range(4)
    ]

    def stage(params, x):
        w_t, alpha = adaptive_ternary_quantization(
            params["w"], alpha=params["alpha"]
        )
        return jnp.tanh(x @ (w_t * alpha).T)

    stacked = stack_stage_params(param_list)
    x = jnp.asarray(rng.randn(8, DIM).astype(np.float32))
    got = pipeline_apply(stage, stacked, x, mesh=mesh, n_micro=4)
    want = x
    for p in param_list:
        want = stage(p, want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_microbatch_roundtrip():
    x = {"a": jnp.arange(24).reshape(12, 2)}
    split = split_microbatches(x, 4)
    assert split["a"].shape == (4, 3, 2)
    merged = merge_microbatches(split)
    np.testing.assert_array_equal(np.asarray(merged["a"]),
                                  np.asarray(x["a"]))
    with pytest.raises(ValueError):
        split_microbatches({"a": jnp.zeros((10, 2))}, 4)
