"""ScannedTernaryStack: the nn.scan-built deep stack is a verified
drop-in for the unrolled layer loop (atq_tpu/nn/transformer.py).

Covers: fp32 output equivalence with converted (stacked) params,
stack/unstack round-trip, remat invariance, gradient flow under STE,
and the MoE guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu.models.text_encoder import ATQTextEncoder
from atq_tpu.nn.transformer import (
    stack_layer_params,
    unstack_layer_params,
)

VOCAB, EMBED, LAYERS, SEQ, BATCH = 50, 32, 3, 9, 4


def _encoders(**kw):
    common = dict(vocab_size=VOCAB, embed_dim=EMBED, num_heads=4,
                  num_layers=LAYERS, dim_feedforward=64, dropout=0.0,
                  grad_mode="ste", **kw)
    return (ATQTextEncoder(**common),
            ATQTextEncoder(scan_layers=True, **common))


def _tokens():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, VOCAB, (BATCH, SEQ)), jnp.int32)
    lengths = jnp.asarray(rng.randint(3, SEQ + 1, (BATCH,)), jnp.int32)
    return x, lengths


def _to_scanned(variables):
    out = dict(variables)
    for col in ("params", "quant"):
        out[col] = stack_layer_params(dict(variables[col]), LAYERS)
    return out


def test_scanned_equals_unrolled_fp32():
    unrolled, scanned = _encoders()
    x, lengths = _tokens()
    v = unrolled.init(jax.random.PRNGKey(0), x)
    y_ref = unrolled.apply(v, x, src_key_padding_mask=lengths)
    y_scan = scanned.apply(_to_scanned(v), x,
                           src_key_padding_mask=lengths)
    # Not bit-identical: scan vs unroll changes XLA's fusion grouping,
    # which reassociates fp32 accumulations (measured ~3e-5 abs here).
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_ref),
                               rtol=1e-4, atol=2e-4)


def test_stack_unstack_round_trip():
    unrolled, _ = _encoders()
    x, _ = _tokens()
    v = unrolled.init(jax.random.PRNGKey(1), x)
    stacked = stack_layer_params(dict(v["params"]), LAYERS)
    back = unstack_layer_params(stacked, LAYERS)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        dict(v["params"]), back)


def test_remat_invariance():
    _, scanned = _encoders()
    no_remat = ATQTextEncoder(vocab_size=VOCAB, embed_dim=EMBED,
                              num_heads=4, num_layers=LAYERS,
                              dim_feedforward=64, dropout=0.0,
                              grad_mode="ste", scan_layers=True,
                              remat_layers=False)
    x, lengths = _tokens()
    v = scanned.init(jax.random.PRNGKey(2), x)
    y1 = scanned.apply(v, x, src_key_padding_mask=lengths)
    y2 = no_remat.apply(v, x, src_key_padding_mask=lengths)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-6, atol=1e-6)


def test_gradients_flow_through_scan():
    _, scanned = _encoders()
    x, lengths = _tokens()
    v = scanned.init(jax.random.PRNGKey(3), x)

    def loss(params):
        y = scanned.apply({**v, "params": params}, x,
                          src_key_padding_mask=lengths)
        return jnp.sum(y ** 2)

    grads = jax.grad(loss)(v["params"])
    stacked = grads["layers"]["scan"]["layer"]
    norms = [float(jnp.linalg.norm(leaf))
             for leaf in jax.tree_util.tree_leaves(stacked)]
    assert norms and all(np.isfinite(norms))
    # STE routes gradient into every scanned layer's latent weights.
    per_layer = jax.tree_util.tree_map(
        lambda leaf: jnp.sum(jnp.abs(leaf), axis=tuple(
            range(1, leaf.ndim))), stacked)
    total = sum(jax.tree_util.tree_leaves(per_layer))
    assert np.all(np.asarray(total) > 0)


def test_scan_rejects_moe():
    enc = ATQTextEncoder(vocab_size=VOCAB, embed_dim=EMBED, num_heads=4,
                         num_layers=2, dim_feedforward=64,
                         scan_layers=True, moe_experts=4)
    x, _ = _tokens()
    with pytest.raises(ValueError, match="scan_layers"):
        enc.init(jax.random.PRNGKey(0), x)


import pytest


@pytest.mark.parametrize("policy", ["save_quantized", "save_dots"])
def test_remat_policy_equivalence(policy):
    """Every remat policy == full remat, outputs AND grads (a policy
    only changes WHAT is saved vs recomputed, never the math)."""
    from atq_tpu.nn.transformer import ScannedTernaryStack

    x = jnp.asarray(np.random.RandomState(5).randn(2, 7, EMBED),
                    jnp.float32)
    kw = dict(num_layers=2, embed_dim=EMBED, num_heads=4,
              dim_feedforward=64, dropout=0.0, grad_mode="ste",
              remat=True)
    saved = ScannedTernaryStack(remat_policy=policy, **kw)
    full = ScannedTernaryStack(remat_policy="full", **kw)
    v = saved.init(jax.random.PRNGKey(0), x)

    def loss(mod, params):
        y = mod.apply({**v, "params": params}, x)
        return jnp.sum(y ** 2)

    l1, g1 = jax.value_and_grad(lambda p: loss(saved, p))(v["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(full, p))(v["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5),
        g1, g2)


def test_retrieval_model_scan_layers():
    """The flagship model builds and runs with text_scan_layers=True."""
    from atq_tpu.models.retrieval import ATQMultimodalRetrieval

    model = ATQMultimodalRetrieval(
        vocab_size=VOCAB, embed_dim=48, hidden_dim=96,
        text_scan_layers=True, grad_mode="ste")
    rng = np.random.RandomState(7)
    imgs = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    caps = jnp.asarray(rng.randint(0, VOCAB, (2, 12)), jnp.int32)
    lengths = jnp.asarray([12, 7], jnp.int32)
    v = model.init(jax.random.PRNGKey(0), imgs, caps, lengths)
    sims, mutated = model.apply(
        v, imgs, caps, lengths, mutable=["batch_stats"])
    assert sims.shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(sims)))
    # the text stack's params are in the scanned layout
    assert "scan" in v["params"]["text_encoder"]["layers"]


def test_scanned_stack_tp_sharding():
    """Scanned (L, out, in) weights shard their out-features dim over
    'model' (tp_spec rank-3 case) and the sharded forward matches the
    replicated one."""
    import flax.linen as nn
    from jax.sharding import NamedSharding, PartitionSpec as P

    from atq_tpu.nn.transformer import ScannedTernaryStack
    from atq_tpu.parallel.mesh import make_mesh, shard_tree_tp

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = make_mesh(dp=4, tp=2)
    stack = ScannedTernaryStack(num_layers=2, embed_dim=32, num_heads=4,
                                dim_feedforward=64, dropout=0.0,
                                grad_mode="ste")
    x = jnp.asarray(np.random.RandomState(9).randn(4, 6, 32), jnp.float32)
    v = stack.init(jax.random.PRNGKey(0), x)
    y_ref = stack.apply(v, x)

    placed_params, shapes_p = shard_tree_tp(v["params"], mesh, tp=2)
    placed_quant, _ = shard_tree_tp(v["quant"], mesh, tp=2)
    # FFN weights (2, 64, 32) / (2, 32, 64) must actually shard.
    assert (2, 64, 32) in shapes_p
    w = placed_params["scan"]["layer"]["linear1"]["weight"]
    assert w.sharding.spec == P(None, "model", None)

    @jax.jit
    def fwd(p, q, x):
        return stack.apply({"params": p, "quant": q}, x)

    y_tp = fwd(placed_params, placed_quant, x)
    # GSPMD partial-sum ordering shifts fp32 accumulation (~2e-4 rel
    # measured on outputs of magnitude ~70).
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               rtol=5e-4, atol=5e-4)


def test_scheduler_preserves_stacked_quant_shapes():
    """GradualQuantizationScheduler on a scanned encoder's quant keeps
    the (L,)-stacked sparsity_target leaves (scalar replacement would
    break nn.scan's axis-0 slicing)."""
    from atq_tpu.core.schedules import GradualQuantizationScheduler

    _, scanned = _encoders()
    x, _ = _tokens()
    v = scanned.init(jax.random.PRNGKey(4), x)
    sched = GradualQuantizationScheduler(total_epochs=6, warmup_epochs=1)
    q0 = jax.device_get(v["quant"])
    q1 = sched.step(q0, 3)
    jax.tree_util.tree_map(
        lambda a, b: (np.testing.assert_equal(np.shape(a), np.shape(b)),
                      np.testing.assert_equal(str(np.asarray(a).dtype),
                                              str(np.asarray(b).dtype))),
        q0, q1)
    # and the encoder still applies with the updated collection
    y = scanned.apply({**v, "quant": q1}, x)
    assert np.all(np.isfinite(np.asarray(y)))


def test_scanned_checkpoint_torch_export_round_trip():
    """A scanned text encoder exports to the reference's per-layer torch
    naming and re-imports equal to its unstacked params."""
    from atq_tpu.nn.transformer import normalize_text_encoder_layout
    from atq_tpu.utils.torch_interop import (
        export_text_encoder_params,
        import_text_encoder_state_dict,
    )

    _, scanned = _encoders()
    x, _ = _tokens()
    v = scanned.init(jax.random.PRNGKey(6), x)
    sd = export_text_encoder_params(
        v["params"], v["quant"], v.get("constants", {}),
        num_layers=LAYERS)
    assert "layers.0.linear1.weight" in sd
    p2, q2, c2 = import_text_encoder_state_dict(sd, num_layers=LAYERS)
    p_un, q_un, _ = normalize_text_encoder_layout(
        dict(v["params"]), dict(v["quant"]), LAYERS)
    for i in range(LAYERS):
        np.testing.assert_array_equal(
            np.asarray(p2[f"layers_{i}"]["linear1"]["weight"]),
            np.asarray(p_un[f"layers_{i}"]["linear1"]["weight"]))
        np.testing.assert_array_equal(
            np.asarray(q2[f"layers_{i}"]["linear1"]["precision_mask"],
                       dtype=np.float32),
            np.asarray(q_un[f"layers_{i}"]["linear1"]["precision_mask"],
                       dtype=np.float32))


def test_reinit_matches_unrolled_scale():
    """--reinit_model under --scan_layers draws the same xavier bound as
    the unrolled layout (the leading layer axis is not a fan dim)."""
    from atq_tpu.train.retrieval import reinit_params

    unrolled, scanned = _encoders()
    x, _ = _tokens()
    v_u = unrolled.init(jax.random.PRNGKey(0), x)
    v_s = scanned.init(jax.random.PRNGKey(0), x)
    r_u = reinit_params(v_u["params"], jax.random.PRNGKey(1))
    r_s = reinit_params(v_s["params"], jax.random.PRNGKey(1))
    w_u = np.asarray(r_u["layers_0"]["linear1"]["weight"])
    w_s = np.asarray(r_s["layers"]["scan"]["layer"]["linear1"]["weight"])
    # uniform(-b, b): max|w| estimates b; the bounds must agree.
    np.testing.assert_allclose(np.abs(w_s).max(), np.abs(w_u).max(),
                               rtol=0.05)
    # gates/alphas keep their init under reinit (ndim rule)
    np.testing.assert_allclose(
        np.asarray(r_s["layers"]["scan"]["layer"]["gate"]), 0.8, atol=1e-6)


def test_normalize_checkpoint_converts_ema():
    """normalize_checkpoint unstacks params, quant, AND ema_params."""
    from atq_tpu.nn.transformer import (
        is_scanned_text_layout,
        normalize_checkpoint,
    )

    _, scanned = _encoders()
    x, _ = _tokens()
    v = scanned.init(jax.random.PRNGKey(8), x)
    te = {"layers": v["params"]["layers"]}
    te_q = {"layers": v["quant"]["layers"]}
    ckpt = {"params": {"text_encoder": te},
            "quant": {"text_encoder": te_q},
            "ema_params": {"text_encoder":
                           jax.tree_util.tree_map(jnp.copy, te)}}
    out, was_scanned = normalize_checkpoint(ckpt, verbose=False)
    assert was_scanned
    for col in ("params", "quant", "ema_params"):
        sub = out[col]["text_encoder"]
        assert not is_scanned_text_layout(sub)
        assert f"layers_{LAYERS - 1}" in sub
    # input untouched
    assert is_scanned_text_layout(ckpt["params"]["text_encoder"])


def test_gradcache_composes_with_scan_layers():
    """GradCache accumulation (two-pass, lax.scan microbatches) runs on a
    text_scan_layers model and produces a finite loss + updated params."""
    import optax

    from atq_tpu.losses.contrastive import (
        ContrastiveLearningManager,
        HardNegativeMiningInfoNCE,
    )
    from atq_tpu.models.retrieval import ATQMultimodalRetrieval
    from atq_tpu.train.retrieval import (
        RetrievalConfig,
        build_retrieval_train_step,
    )

    model = ATQMultimodalRetrieval(vocab_size=60, embed_dim=32,
                                   hidden_dim=64, use_residual=True,
                                   max_seq_length=8,
                                   text_scan_layers=True)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                   jnp.zeros((2, 8), jnp.int32), jnp.asarray([4, 4]))
    cfg = RetrievalConfig(batch_size=8, image_size=32, embed_dim=32,
                          hidden_dim=64, use_residual=True,
                          max_seq_length=8, grad_accum_steps=2,
                          scan_layers=True)
    tx = optax.sgd(0.1)
    crit = HardNegativeMiningInfoNCE()
    mgr = ContrastiveLearningManager(criterion=crit)
    state = {"params": v["params"], "quant": v.get("quant", {}),
             "constants": v.get("constants", {}),
             "batch_stats": v.get("batch_stats", {}),
             "opt_state": tx.init(v["params"]),
             "step": jnp.asarray(0, jnp.int32)}
    step = jax.jit(build_retrieval_train_step(model, tx, crit, mgr, cfg))
    rng = np.random.RandomState(0)
    batch = (jnp.asarray(rng.randn(8, 32, 32, 3), jnp.float32),
             jnp.asarray(rng.randint(0, 60, (8, 8)), jnp.int32),
             jnp.full((8,), 6, jnp.int32))
    w0 = state["params"]["text_encoder"]["layers"]["scan"]["layer"][
        "linear1"]["weight"]
    state, loss = step(state, batch, jnp.float32(0.07), jnp.int32(0),
                       jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    w1 = state["params"]["text_encoder"]["layers"]["scan"]["layer"][
        "linear1"]["weight"]
    assert float(jnp.max(jnp.abs(w1 - w0))) >= 0.0  # shape preserved
    assert w1.shape == w0.shape
