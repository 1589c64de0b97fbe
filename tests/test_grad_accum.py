"""Gradient accumulation: the lax.scan microbatch step must equal a
hand-rolled N-forward/backward oracle (same rng folds, same pre-update
teacher) followed by one averaged optimizer update.

The classifier accumulation is the torch-style semantics (per-microbatch
BN stats and dropout); the retrieval GradCache variant is covered in
test_grad_cache.py (full-negative-pool equivalence).
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np
import optax

from atq_tpu.models.image_classifier import (
    ATQImageClassifier,
    BaselineCNNClassifier,
)
from atq_tpu.train.classifier import (
    ClassifierConfig,
    _cross_entropy,
    _kd_loss,
    _l1_penalty,
    build_train_step,
    make_optimizer,
)

pytestmark = pytest.mark.slow  # model-compile-heavy


def _tiny_setup(accum, distill=True, use_l1=True):
    cfg = ClassifierConfig(
        use_rpb=True, distill=distill, use_l1=use_l1, batch_size=8,
        grad_accum_steps=accum, device_augment=False, epochs=2,
    )
    atq_model = ATQImageClassifier(use_rpb=True, sparsity_target=0.3,
                                   hidden_size=16)
    base_model = BaselineCNNClassifier(hidden_size=16)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, 28, 28, 1), jnp.float32)
    atq_vars = atq_model.init(rng, sample)
    base_vars = base_model.init(jax.random.fold_in(rng, 1), sample)
    atq_tx = make_optimizer(cfg, steps_per_epoch=4)
    base_tx = make_optimizer(cfg, steps_per_epoch=4, clip=False)
    state = {
        "atq_params": atq_vars["params"],
        "quant": atq_vars.get("quant", {}),
        "atq_batch_stats": atq_vars.get("batch_stats", {}),
        "atq_opt_state": atq_tx.init(atq_vars["params"]),
        "base_params": base_vars["params"],
        "base_batch_stats": base_vars.get("batch_stats", {}),
        "base_opt_state": base_tx.init(base_vars["params"]),
        "step": jnp.asarray(0, jnp.int32),
    }
    return cfg, atq_model, base_model, atq_tx, base_tx, state


def _batch(n=8):
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.randn(n, 28, 28, 1).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 10, n))
    return images, labels


def test_accum_matches_manual_microbatch_oracle():
    """grad_accum_steps=2 == two explicit microbatch grad computations
    (same rng folds, both from pre-update params) averaged into ONE
    update. Gradients are extracted through an SGD(1.0) param delta —
    comparing Adam-updated params instead would amplify fp-reassociation
    noise on near-zero-gradient leaves (conv bias feeding BN) into ±lr
    sign flips."""
    accum = 2
    cfg, atq_model, base_model, _, _, state = _tiny_setup(accum)
    atq_tx = optax.sgd(1.0)
    base_tx = optax.sgd(1.0)
    state["atq_opt_state"] = atq_tx.init(state["atq_params"])
    state["base_opt_state"] = base_tx.init(state["base_params"])
    images, labels = _batch(8)
    step_fn = jax.jit(
        build_train_step(atq_model, base_model, atq_tx, base_tx, cfg))
    rng = jax.random.PRNGKey(7)
    got_state, got_metrics = step_fn(state, (images, labels), 0.3,
                                     1e-5, rng)
    got_bg = jax.tree_util.tree_map(
        lambda old, new: old - new,
        state["base_params"], got_state["base_params"])
    got_ag = jax.tree_util.tree_map(
        lambda old, new: old - new,
        state["atq_params"], got_state["atq_params"])

    # --- oracle: explicit python loop over the two microbatches ---
    drop_rng = jax.random.fold_in(rng, state["step"])
    micro = 8 // accum
    base_stats = state["base_batch_stats"]
    atq_stats = state["atq_batch_stats"]
    base_acc = jax.tree_util.tree_map(jnp.zeros_like, state["base_params"])
    atq_acc = jax.tree_util.tree_map(jnp.zeros_like, state["atq_params"])
    for i in range(accum):
        im = images[i * micro:(i + 1) * micro]
        lb = labels[i * micro:(i + 1) * micro]
        rng_m = jax.random.fold_in(drop_rng, i)

        def base_loss_fn(p, stats=base_stats, im=im, lb=lb, rng_m=rng_m):
            logits, mutated = base_model.apply(
                {"params": p, "batch_stats": stats}, im, train=True,
                rngs={"dropout": rng_m}, mutable=["batch_stats"])
            return _cross_entropy(logits, lb), (logits, mutated)

        (_, (base_logits, base_mut)), bg = jax.value_and_grad(
            base_loss_fn, has_aux=True)(state["base_params"])
        base_stats = base_mut["batch_stats"]

        def atq_loss_fn(p, stats=atq_stats, im=im, lb=lb, rng_m=rng_m,
                        base_logits=base_logits):
            logits, mutated = atq_model.apply(
                {"params": p, "quant": state["quant"],
                 "batch_stats": stats}, im, train=True,
                rngs={"dropout": rng_m}, mutable=["batch_stats"])
            loss = _cross_entropy(logits, lb)
            loss = 0.7 * loss + 0.3 * _kd_loss(
                logits, jax.lax.stop_gradient(base_logits))
            loss = loss + 1e-5 * _l1_penalty(p)
            return loss, (logits, mutated)

        (_, (_, atq_mut)), ag = jax.value_and_grad(
            atq_loss_fn, has_aux=True)(state["atq_params"])
        atq_stats = atq_mut["batch_stats"]
        base_acc = jax.tree_util.tree_map(
            lambda a, g: a + g / accum, base_acc, bg)
        atq_acc = jax.tree_util.tree_map(
            lambda a, g: a + g / accum, atq_acc, ag)

    def assert_grads_close(got, want):
        # Per-leaf tolerance scaled by the leaf's gradient magnitude:
        # the scan and the python loop reassociate float sums.
        def check(g, w):
            scale = 1.0 + float(jnp.max(jnp.abs(w)))
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=1e-4 * scale, rtol=0)
        jax.tree_util.tree_map(check, got, want)

    assert_grads_close(got_bg, base_acc)
    assert_grads_close(got_ag, atq_acc)
    # BN stats advanced through both microbatches sequentially
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        got_state["base_batch_stats"], base_stats)
    assert int(got_metrics["count"]) == 8
    assert int(got_state["step"]) == 1


def test_accum_one_returns_plain_step():
    """grad_accum_steps=1 must return the historical unaccumulated step
    (trajectory-parity tests depend on its exact rng folds)."""
    cfg, atq_model, base_model, atq_tx, base_tx, state = _tiny_setup(1)
    fn = build_train_step(atq_model, base_model, atq_tx, base_tx, cfg)
    assert fn.__name__ == "train_step"


def test_accum_rejects_indivisible_batch():
    cfg, atq_model, base_model, atq_tx, base_tx, state = _tiny_setup(3)
    images, labels = _batch(8)
    step_fn = build_train_step(atq_model, base_model, atq_tx, base_tx, cfg)
    with pytest.raises(ValueError, match="not divisible"):
        step_fn(state, (images, labels), 0.3, 1e-5, jax.random.PRNGKey(0))


# --------------------- retrieval GradCache ---------------------------------


def _retrieval_setup(accum):
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
                                   max_seq_length=8)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                   jnp.zeros((2, 8), jnp.int32), jnp.asarray([4, 4]))
    cfg = RetrievalConfig(batch_size=8, image_size=32, embed_dim=32,
                          hidden_dim=64, use_residual=True,
                          max_seq_length=8, grad_accum_steps=accum)
    tx = optax.sgd(1.0)
    crit = HardNegativeMiningInfoNCE()
    mgr = ContrastiveLearningManager(criterion=crit)
    state = {"params": v["params"], "quant": v.get("quant", {}),
             "constants": v.get("constants", {}),
             "batch_stats": v.get("batch_stats", {}),
             "opt_state": tx.init(v["params"]),
             "step": jnp.asarray(0, jnp.int32)}
    step = build_retrieval_train_step(model, tx, crit, mgr, cfg)
    return model, crit, cfg, state, step


def _retrieval_batch(n=8):
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.randn(n, 32, 32, 3).astype(np.float32))
    txt = jnp.asarray(rng.randint(0, 60, (n, 8)).astype(np.int32))
    ln = jnp.asarray(np.full(n, 6, np.int32))
    return img, txt, ln


def test_gradcache_matches_full_pool_oracle():
    """GradCache accumulation == autodiff through 'embed each microbatch
    sequentially, concatenate, loss over the FULL similarity matrix'.
    This is the property naive accumulation breaks: the negative pool
    stays the whole batch while activations are per-microbatch."""
    accum = 2
    model, crit, cfg, state, step_fn = _retrieval_setup(accum)
    img, txt, ln = _retrieval_batch(8)
    rng = jax.random.PRNGKey(9)
    temperature = jnp.float32(0.07)
    kind = jnp.int32(0)
    got_state, got_loss = jax.jit(step_fn)(
        state, (img, txt, ln), temperature, kind, rng)
    got_grads = jax.tree_util.tree_map(
        lambda old, new: old - new, state["params"], got_state["params"])

    # --- oracle: differentiate the whole two-microbatch program ---------
    step_rng = jax.random.fold_in(rng, state["step"])
    micro = 8 // accum

    def oracle_loss(params):
        from atq_tpu.losses.contrastive import curriculum_weights_traced
        from atq_tpu.models.fusion import l2_normalize

        stats = state["batch_stats"]
        ies, tes = [], []
        for i in range(accum):
            rng_m = jax.random.fold_in(step_rng, i)
            (ie, te), mutated = model.apply(
                {"params": params, "quant": state["quant"],
                 "constants": state["constants"], "batch_stats": stats},
                img[i * micro:(i + 1) * micro],
                txt[i * micro:(i + 1) * micro],
                ln[i * micro:(i + 1) * micro],
                return_embeddings=True, train=True,
                rngs={"dropout": rng_m}, mutable=["batch_stats"])
            stats = mutated["batch_stats"]
            ies.append(ie.astype(jnp.float32))
            tes.append(te.astype(jnp.float32))
        ie = jnp.concatenate(ies)
        te = jnp.concatenate(tes)
        similarity = jnp.matmul(l2_normalize(ie, axis=1),
                                l2_normalize(te, axis=1).T)
        weights = curriculum_weights_traced(similarity, kind)
        return crit(ie, te, weights, temperature=temperature)

    # Jit the oracle: eager (op-by-op) conv/BatchNorm gradients on CPU
    # differ from the compiled program's at ~1e-6 in the forward, which
    # batch-4 BatchNorm statistics amplify to percent-level conv-kernel
    # gradient differences in the deep trunk. Compiled-vs-compiled, the
    # two programs agree to ~1e-6 everywhere.
    want_loss, want_grads = jax.jit(jax.value_and_grad(oracle_loss))(
        state["params"])

    assert abs(float(got_loss) - float(want_loss)) < 1e-5

    def check(g, w):
        scale = 1.0 + float(jnp.max(jnp.abs(w)))
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-4 * scale, rtol=0)

    jax.tree_util.tree_map(check, got_grads, want_grads)
    # batch_stats advanced through both microbatches (pass-1 threading)
    assert int(got_state["step"]) == 1


def test_gradcache_negative_pool_is_full_batch():
    """The loss the GradCache step reports must see all 8 samples as
    mutual negatives — it must NOT equal the mean of two 4-sample-pool
    losses on the same embeddings."""
    accum = 2
    model, crit, cfg, state, step_fn = _retrieval_setup(accum)
    img, txt, ln = _retrieval_batch(8)
    rng = jax.random.PRNGKey(9)
    _, got_loss = jax.jit(step_fn)(
        state, (img, txt, ln), jnp.float32(0.07), jnp.int32(0), rng)

    from atq_tpu.losses.contrastive import curriculum_weights_traced
    from atq_tpu.models.fusion import l2_normalize

    step_rng = jax.random.fold_in(rng, state["step"])
    micro_losses = []
    stats = state["batch_stats"]
    embs = []
    for i in range(accum):
        rng_m = jax.random.fold_in(step_rng, i)
        (ie, te), mutated = model.apply(
            {"params": state["params"], "quant": state["quant"],
             "constants": state["constants"], "batch_stats": stats},
            img[i * 4:(i + 1) * 4], txt[i * 4:(i + 1) * 4],
            ln[i * 4:(i + 1) * 4], return_embeddings=True, train=True,
            rngs={"dropout": rng_m}, mutable=["batch_stats"])
        stats = mutated["batch_stats"]
        embs.append((ie, te))
        sim = jnp.matmul(l2_normalize(ie, axis=1),
                         l2_normalize(te, axis=1).T)
        w = curriculum_weights_traced(sim, jnp.int32(0))
        micro_losses.append(float(crit(ie, te, w,
                                       temperature=jnp.float32(0.07))))
    micro_mean = sum(micro_losses) / accum
    # 8-way pools have more negatives -> a different (higher) loss than
    # the 4-way mean. If these matched, accumulation silently shrank the
    # pool.
    assert abs(float(got_loss) - micro_mean) > 1e-3


def test_gradcache_dp_mesh_matches_single_device():
    """GradCache under data parallelism: the accumulated step on an
    8-way 'data'-sharded batch equals the same step on one device —
    the microbatch reshape and two lax.scan passes must survive GSPMD
    partitioning unchanged.

    Uses the multi-positive loss (also covering GradCache's image_ids
    plumbing): the hard-negative criterion top-k's a near-tied 8x8
    similarity matrix, so cross-compilation float noise flips mining
    picks and makes single-vs-multi-device gradients incomparable at any
    meaningful tolerance — the smooth loss keeps the comparison sharp."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from atq_tpu.losses.contrastive import (
        ContrastiveLearningManager,
        HardNegativeMiningInfoNCE,
    )
    from atq_tpu.models.retrieval import ATQMultimodalRetrieval
    from atq_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from atq_tpu.train.retrieval import (
        RetrievalConfig,
        build_retrieval_train_step,
    )

    model = ATQMultimodalRetrieval(vocab_size=60, embed_dim=32,
                                   hidden_dim=64, use_residual=True,
                                   max_seq_length=8)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                   jnp.zeros((2, 8), jnp.int32), jnp.asarray([4, 4]))
    cfg = RetrievalConfig(batch_size=8, image_size=32, embed_dim=32,
                          hidden_dim=64, use_residual=True,
                          max_seq_length=8, grad_accum_steps=2,
                          use_multi_positive=True)
    tx = optax.sgd(1e-2)
    crit = HardNegativeMiningInfoNCE()
    mgr = ContrastiveLearningManager(criterion=crit)
    state = {"params": v["params"], "quant": v.get("quant", {}),
             "constants": v.get("constants", {}),
             "batch_stats": v.get("batch_stats", {}),
             "opt_state": tx.init(v["params"]),
             "step": jnp.asarray(0, jnp.int32)}
    step = jax.jit(build_retrieval_train_step(model, tx, crit, mgr, cfg))

    img, txt, ln = _retrieval_batch(8)
    image_ids = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3], jnp.int32)
    rng = jax.random.PRNGKey(9)

    outs = []
    for mesh in (make_mesh(dp=1, devices=jax.devices()[:1]),
                 make_mesh(dp=8)):
        s = replicate(state, mesh)
        b = shard_batch((img, txt, ln, image_ids), mesh)
        new_state, loss = step(s, b, jnp.float32(0.07), jnp.int32(0), rng)
        outs.append((float(loss), jax.device_get(new_state["params"])))

    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5)
    # Param comparison with a bounded-outlier budget: batch-4 BatchNorm
    # statistics amplify cross-device reduction reassociation (~1e-6)
    # into a long tail of conv-kernel gradient deltas — most elements
    # agree to <1e-3 at sgd(1e-2), a ~0.05% tail reaches percent level
    # (1/sigma^3 terms on near-constant quantized activations). A
    # structural bug (shrunken pool, misaligned microbatches, dropped
    # cotangents) perturbs a large FRACTION of elements, which is what
    # the budget bounds; the exact-pool property itself is asserted
    # loss-side above and in test_gradcache_negative_pool_is_full_batch.
    total = bad = 0
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][1]),
                    jax.tree_util.tree_leaves(outs[1][1])):
        d = np.abs(np.asarray(a) - np.asarray(b))
        total += d.size
        bad += int(np.sum(d > 2e-3))
        assert float(d.max()) < 0.1, float(d.max())
    assert bad / total < 2e-3, f"{bad}/{total} elements differ > 2e-3"


def test_gradcache_distill_scales_like_plain_blend():
    """The reference's distillation term is a faithful no-op (KL of the
    similarity matrix against its own detached softmax: zero value, zero
    gradient — train_multimodal.py:504-524), so with baseline embeddings
    the GradCache loss must equal (1-distill_weight) x the no-baseline
    loss and the parameter update must scale the same way."""
    accum = 2
    model, crit, cfg, state, step_fn = _retrieval_setup(accum)
    img, txt, ln = _retrieval_batch(8)
    rng = jax.random.PRNGKey(9)
    step = jax.jit(step_fn)

    s0, loss0 = step(state, (img, txt, ln), jnp.float32(0.07),
                     jnp.int32(0), rng)
    base = (jnp.asarray(np.random.RandomState(1).randn(8, 32),
                        np.float32),
            jnp.asarray(np.random.RandomState(2).randn(8, 32),
                        np.float32))
    s1, loss1 = step(state, (img, txt, ln), jnp.float32(0.07),
                     jnp.int32(0), rng, base)

    w = cfg.distill_weight
    np.testing.assert_allclose(float(loss1), (1 - w) * float(loss0),
                               rtol=1e-5)
    for p0, pa, pb in zip(jax.tree_util.tree_leaves(state["params"]),
                          jax.tree_util.tree_leaves(s0["params"]),
                          jax.tree_util.tree_leaves(s1["params"])):
        d_plain = np.asarray(pa) - np.asarray(p0)
        d_blend = np.asarray(pb) - np.asarray(p0)
        scale = 1.0 + float(np.max(np.abs(d_plain)))
        np.testing.assert_allclose(d_blend, (1 - w) * d_plain,
                                   atol=1e-4 * scale, rtol=0)


def test_gradcache_moe_aux_matches_oracle():
    """GradCache with MoE experts: the pass-2 direct aux-gradient path
    (aux_scale * moe_aux_weight * mean-per-microbatch * 1/n) must equal
    autodiff through 'embed microbatches, contrastive over the pool,
    plus moe_aux_weight * mean of the microbatch aux losses'."""
    from atq_tpu.losses.contrastive import (
        ContrastiveLearningManager,
        HardNegativeMiningInfoNCE,
        curriculum_weights_traced,
    )
    from atq_tpu.models.fusion import l2_normalize
    from atq_tpu.models.retrieval import ATQMultimodalRetrieval
    from atq_tpu.train.retrieval import (
        RetrievalConfig,
        build_retrieval_train_step,
    )

    accum = 2
    model = ATQMultimodalRetrieval(vocab_size=60, embed_dim=32,
                                   hidden_dim=64, use_residual=True,
                                   max_seq_length=8, text_moe_experts=2)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                   jnp.zeros((2, 8), jnp.int32), jnp.asarray([4, 4]))
    cfg = RetrievalConfig(batch_size=8, image_size=32, embed_dim=32,
                          hidden_dim=64, use_residual=True,
                          max_seq_length=8, grad_accum_steps=accum,
                          moe_experts=2)
    tx = optax.sgd(1.0)
    crit = HardNegativeMiningInfoNCE()
    mgr = ContrastiveLearningManager(criterion=crit)
    state = {"params": v["params"], "quant": v.get("quant", {}),
             "constants": v.get("constants", {}),
             "batch_stats": v.get("batch_stats", {}),
             "opt_state": tx.init(v["params"]),
             "step": jnp.asarray(0, jnp.int32)}
    step_fn = build_retrieval_train_step(model, tx, crit, mgr, cfg)
    img, txt, ln = _retrieval_batch(8)
    rng = jax.random.PRNGKey(9)
    temperature = jnp.float32(0.07)
    kind = jnp.int32(0)
    got_state, got_loss = jax.jit(step_fn)(
        state, (img, txt, ln), temperature, kind, rng)
    got_grads = jax.tree_util.tree_map(
        lambda old, new: old - new, state["params"], got_state["params"])

    step_rng = jax.random.fold_in(rng, state["step"])
    micro = 8 // accum

    def oracle_loss(params):
        stats = state["batch_stats"]
        ies, tes, auxs = [], [], []
        for i in range(accum):
            rng_m = jax.random.fold_in(step_rng, i)
            (ie, te), mutated = model.apply(
                {"params": params, "quant": state["quant"],
                 "constants": state["constants"], "batch_stats": stats},
                img[i * micro:(i + 1) * micro],
                txt[i * micro:(i + 1) * micro],
                ln[i * micro:(i + 1) * micro],
                return_embeddings=True, train=True,
                rngs={"dropout": rng_m},
                mutable=["batch_stats", "intermediates"])
            stats = mutated["batch_stats"]
            ies.append(ie.astype(jnp.float32))
            tes.append(te.astype(jnp.float32))
            aux_leaves = jax.tree_util.tree_leaves(
                mutated.get("intermediates", {}))
            auxs.append(sum(jnp.mean(a) for a in aux_leaves)
                        / len(aux_leaves))
        ie = jnp.concatenate(ies)
        te = jnp.concatenate(tes)
        similarity = jnp.matmul(l2_normalize(ie, axis=1),
                                l2_normalize(te, axis=1).T)
        weights = curriculum_weights_traced(similarity, kind)
        loss = crit(ie, te, weights, temperature=temperature)
        return loss + cfg.moe_aux_weight * (sum(auxs) / accum)

    want_loss, want_grads = jax.jit(jax.value_and_grad(oracle_loss))(
        state["params"])

    assert abs(float(got_loss) - float(want_loss)) < 1e-5

    def check(g, w):
        scale = 1.0 + float(jnp.max(jnp.abs(w)))
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-4 * scale, rtol=0)

    jax.tree_util.tree_map(check, got_grads, want_grads)


def test_gradcache_amp_fsdp_smoke():
    """The production combo — bf16 AMP model, FSDP-sharded state, and
    GradCache accumulation — must compile and produce a finite loss in
    one jitted step on the 8-device mesh."""
    from atq_tpu.losses.contrastive import (
        ContrastiveLearningManager,
        HardNegativeMiningInfoNCE,
    )
    from atq_tpu.models.retrieval import ATQMultimodalRetrieval
    from atq_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
        shard_state_fsdp,
    )
    from atq_tpu.train.retrieval import (
        RetrievalConfig,
        build_retrieval_train_step,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = ATQMultimodalRetrieval(vocab_size=60, embed_dim=32,
                                   hidden_dim=64, use_residual=True,
                                   max_seq_length=8,
                                   compute_dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                   jnp.zeros((2, 8), jnp.int32), jnp.asarray([4, 4]))
    cfg = RetrievalConfig(batch_size=16, image_size=32, embed_dim=32,
                          hidden_dim=64, use_residual=True,
                          max_seq_length=8, grad_accum_steps=2,
                          use_amp=True, fsdp=True, dp=8)
    tx = optax.adamw(1e-4)
    crit = HardNegativeMiningInfoNCE()
    mgr = ContrastiveLearningManager(criterion=crit)
    mesh = make_mesh(dp=8)
    state = shard_state_fsdp({
        "params": v["params"], "quant": v.get("quant", {}),
        "constants": v.get("constants", {}),
        "batch_stats": v.get("batch_stats", {}),
        "opt_state": tx.init(v["params"]),
        "step": jnp.asarray(0, jnp.int32),
    }, mesh, min_size=1024)
    step = jax.jit(build_retrieval_train_step(model, tx, crit, mgr, cfg))
    img, txt, ln = _retrieval_batch(16)
    new_state, loss = step(state, shard_batch((img, txt, ln), mesh),
                           jnp.float32(0.07), jnp.int32(0),
                           jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    assert int(new_state["step"]) == 1
