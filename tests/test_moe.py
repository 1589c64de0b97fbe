"""Expert-parallel MoE FFN (atq_tpu/parallel/moe.py).

Framework capability beyond the reference (SURVEY.md §2.6: EP absent
there). Checks: EP sharded == single-device per shard, dense-equivalence
when nothing overflows, capacity drop semantics, ternary experts,
differentiability, load-balance aux.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from atq_tpu.parallel.moe import (

    init_moe_params,
    moe_ffn,
    moe_ffn_sharded,
    top1_dispatch,
)

pytestmark = pytest.mark.slow  # model-compile-heavy; excluded from the fast gate

T, D, H, E = 32, 16, 24, 8


@pytest.fixture(scope="module")
def setup():
    params = init_moe_params(jax.random.PRNGKey(0), D, H, E)
    x = jnp.asarray(np.random.RandomState(1).randn(T, D), jnp.float32)
    return params, x


def test_dispatch_one_slot_per_kept_token(setup):
    params, x = setup
    dispatch, combine, aux = top1_dispatch(x, params["gate"], E, capacity=4)
    # each kept token occupies exactly one (expert, slot); dropped = zero
    per_token = np.asarray(jnp.sum(dispatch, axis=(1, 2)))
    assert set(np.unique(per_token)) <= {0.0, 1.0}
    # no slot is double-booked
    per_slot = np.asarray(jnp.sum(dispatch, axis=0))
    assert per_slot.max() <= 1.0
    # combine carries the gate prob of the chosen expert
    probs = jax.nn.softmax(x @ params["gate"], axis=-1)
    gate = np.asarray(jnp.max(probs, axis=-1))
    got = np.asarray(jnp.sum(combine, axis=(1, 2)))
    kept = per_token > 0
    np.testing.assert_allclose(got[kept], gate[kept], rtol=1e-6)
    assert np.asarray(aux["aux_loss"]) > 0


def test_moe_equals_dense_when_capacity_sufficient(setup):
    """capacity >= T ⇒ no drops ⇒ MoE == per-token expert FFN."""
    params, x = setup
    y, _ = moe_ffn(x, params, capacity=T)
    probs = jax.nn.softmax(x @ params["gate"], axis=-1)
    eidx = np.asarray(jnp.argmax(probs, axis=-1))
    gate = np.asarray(jnp.max(probs, axis=-1))
    w1, w2 = np.asarray(params["w1"]), np.asarray(params["w2"])
    xs = np.asarray(x)
    want = np.stack([
        gate[t] * (np.asarray(jax.nn.gelu(xs[t] @ w1[eidx[t]]))
                   @ w2[eidx[t]])
        for t in range(T)
    ])
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-5)


def test_capacity_overflow_drops_to_zero(setup):
    """capacity=1: at most one token per expert contributes; later tokens
    routed to a full expert produce exactly zero output."""
    params, x = setup
    y, _ = moe_ffn(x, params, capacity=1)
    dispatch, _, _ = top1_dispatch(x, params["gate"], E, capacity=1)
    kept = np.asarray(jnp.sum(dispatch, axis=(1, 2))) > 0
    assert kept.sum() <= E
    dropped_rows = np.asarray(y)[~kept]
    np.testing.assert_array_equal(dropped_rows,
                                  np.zeros_like(dropped_rows))


def test_sharded_matches_single_device_per_shard(setup):
    """EP over 8 devices == moe_ffn applied shard-by-shard (same capacity
    accounting), and with ample capacity == the dense-equivalent path."""
    params, x = setup
    n = 8
    mesh = Mesh(np.asarray(jax.devices()[:n]), axis_names=("expert",))
    cap = T // n  # per-shard capacity covers every local token
    y_sharded, aux = jax.jit(
        lambda x, p: moe_ffn_sharded(x, p, mesh, capacity=cap)
    )(x, params)

    shards = []
    for i in range(n):
        xs = x[i * (T // n):(i + 1) * (T // n)]
        ys, _ = moe_ffn(xs, params, capacity=cap)
        shards.append(np.asarray(ys))
    want = np.concatenate(shards)
    np.testing.assert_allclose(np.asarray(y_sharded), want, atol=1e-5)
    assert np.isfinite(float(aux["aux_loss"]))


def test_sharded_ternary_matches_single_device(setup):
    params, x = setup
    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]), axis_names=("expert",))
    cap = T // n
    y_sharded, _ = jax.jit(
        lambda x, p: moe_ffn_sharded(x, p, mesh, capacity=cap,
                                     ternary=True)
    )(x, params)
    shards = []
    for i in range(n):
        xs = x[i * (T // n):(i + 1) * (T // n)]
        ys, _ = moe_ffn(xs, params, capacity=cap, ternary=True)
        shards.append(np.asarray(ys))
    np.testing.assert_allclose(np.asarray(y_sharded),
                               np.concatenate(shards), atol=1e-5)


def test_moe_is_differentiable(setup):
    """Gate and expert planes all receive nonzero gradient through the
    routing einsums (argmax gives no gradient path through expert CHOICE,
    but the gate probability multiplies the output)."""
    params, x = setup

    def loss(p):
        y, aux = moe_ffn(x, p, capacity=T // 2)
        return jnp.sum(y ** 2) + 0.01 * aux["aux_loss"]

    grads = jax.grad(loss)(params)
    for k in ("gate", "w1", "w2"):
        assert float(jnp.max(jnp.abs(grads[k]))) > 0, k


def test_transformer_layer_moe_variant():
    """moe_experts>0 swaps the FFN for the ternary-expert MoE: forward
    runs, params include expert planes, aux loss is sown, and the default
    (moe_experts=0) param tree is unchanged (reference parity)."""
    from atq_tpu.nn.transformer import TernaryTransformerLayer

    x = jnp.asarray(np.random.RandomState(2).randn(2, 6, 16), jnp.float32)
    dense = TernaryTransformerLayer(embed_dim=16, num_heads=2,
                                    dim_feedforward=32)
    vd = dense.init(jax.random.PRNGKey(0), x)
    assert "linear1" in vd["params"] and "moe_w1" not in vd["params"]

    moe = TernaryTransformerLayer(embed_dim=16, num_heads=2,
                                  dim_feedforward=32, moe_experts=4)
    vm = moe.init(jax.random.PRNGKey(0), x)
    assert vm["params"]["moe_w1"].shape == (4, 16, 32)
    assert "linear1" not in vm["params"]

    out, state = moe.apply(vm, x, deterministic=True,
                           mutable=["intermediates"])
    assert out.shape == x.shape
    aux = state["intermediates"]["moe_aux_loss"][0]
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_sharded_moe_gradients_match_single_device(setup):
    """Backward through the all_to_all EP path == backward through the
    single-device path applied shard-by-shard (all_to_all transposes to
    the reverse all_to_all; dispatch einsums transpose to combines)."""
    params, x = setup
    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]), axis_names=("expert",))
    cap = T // n

    def loss_sharded(p, x):
        y, _ = moe_ffn_sharded(x, p, mesh, capacity=cap)
        return jnp.sum(y ** 2)

    def loss_local(p, x):
        tot = 0.0
        for i in range(n):
            y, _ = moe_ffn(x[i * cap:(i + 1) * cap], p, capacity=cap)
            tot = tot + jnp.sum(y ** 2)
        return tot

    g_sharded = jax.jit(jax.grad(loss_sharded))(params, x)
    g_local = jax.grad(loss_local)(params, x)
    for k in ("gate", "w1", "w2"):
        np.testing.assert_allclose(np.asarray(g_sharded[k]),
                                   np.asarray(g_local[k]),
                                   atol=2e-5, err_msg=k)


def test_retrieval_model_moe_train_step():
    """--moe_experts plumbs through ATQTextEncoder into the retrieval
    train step: forward+backward run, the load-balance aux loss
    contributes, and the MoE expert planes receive gradient."""
    from atq_tpu.losses.contrastive import (
        ContrastiveLearningManager,
        HardNegativeMiningInfoNCE,
    )
    from atq_tpu.models.retrieval import ATQMultimodalRetrieval
    from atq_tpu.train.retrieval import (
        RetrievalConfig,
        build_retrieval_train_step,
        make_retrieval_optimizer,
    )

    cfg = RetrievalConfig(batch_size=4, image_size=32, embed_dim=32,
                          hidden_dim=64, max_seq_length=8,
                          use_residual=True, moe_experts=4)
    model = ATQMultimodalRetrieval(vocab_size=40, embed_dim=32,
                                   hidden_dim=64, use_residual=True,
                                   max_seq_length=8, text_moe_experts=4)
    rng = jax.random.PRNGKey(0)
    v = model.init(rng, jnp.zeros((2, 32, 32, 3)),
                   jnp.zeros((2, 8), jnp.int32), jnp.asarray([4, 4]))
    layer0 = v["params"]["text_encoder"]["layers_0"]
    assert "moe_w1" in layer0 and "linear1" not in layer0

    tx = make_retrieval_optimizer(cfg, 10)
    crit = HardNegativeMiningInfoNCE(temperature_schedule=False)
    mgr = ContrastiveLearningManager(criterion=crit)
    state = {"params": v["params"], "quant": v.get("quant", {}),
             "constants": v.get("constants", {}),
             "batch_stats": v.get("batch_stats", {}),
             "opt_state": tx.init(v["params"]),
             "step": jnp.asarray(0, jnp.int32)}
    step = jax.jit(build_retrieval_train_step(model, tx, crit, mgr, cfg))
    rngd = np.random.RandomState(0)
    batch = (rngd.randn(4, 32, 32, 3).astype(np.float32),
             rngd.randint(0, 40, (4, 8)).astype(np.int32),
             np.full(4, 6, np.int32))
    new_state = state
    for _ in range(3):  # step 0 sits in LR warmup (lr == 0)
        new_state, loss = step(new_state, batch, jnp.float32(0.07),
                               jnp.int32(0), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    delta = np.max(np.abs(
        np.asarray(new_state["params"]["text_encoder"]["layers_0"]
                   ["moe_gate"])
        - np.asarray(layer0["moe_gate"])))
    assert delta > 0, "moe gate did not train"
