"""Shared benchmark step builders.

One canonical construction of the config-5 retrieval training step
(BASELINE.json; the hot loop it replaces is the reference's
train_multimodal.py:451-619), used by run_all.py, mfu_attack.py and the
env-var A/B harnesses — so a config tweak cannot silently leave the
harnesses benchmarking different programs. bench.py (the driver-run
round-end artifact) intentionally keeps its own self-contained copy.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_retrieval_step(batch, image_size=160, use_amp=False, vocab=3000,
                         grad_accum_steps=1):
    """Build the jitted config-5 retrieval train step on the default
    platform. Returns ``(jitted_step, step_fn, state, args)`` where
    ``step_fn(state)`` advances one step with device-resident constants
    (per-call host scalars would dominate sub-ms steps over the axon
    tunnel) and ``args`` are the concrete call args for FLOP analysis."""
    import jax
    import jax.numpy as jnp

    from atq_tpu.losses.contrastive import (
        ContrastiveLearningManager,
        HardNegativeMiningInfoNCE,
    )
    from atq_tpu.models.retrieval import ATQMultimodalRetrieval
    from atq_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from atq_tpu.train.retrieval import (
        RetrievalConfig,
        build_retrieval_train_step,
        make_retrieval_optimizer,
    )

    cfg = RetrievalConfig(batch_size=batch, image_size=image_size,
                          embed_dim=192, hidden_dim=384, use_residual=True,
                          gradual_quant=True, use_amp=use_amp,
                          grad_accum_steps=grad_accum_steps)
    model = ATQMultimodalRetrieval(vocab_size=vocab, embed_dim=192,
                                   hidden_dim=384, use_residual=True,
                                   max_seq_length=50,
                                   compute_dtype=(jnp.bfloat16 if use_amp
                                                  else None))
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((2, image_size, image_size, 3)),
                   jnp.zeros((2, 50), jnp.int32), jnp.asarray([5, 5]))
    tx = make_retrieval_optimizer(cfg, 100)
    crit = HardNegativeMiningInfoNCE()
    mgr = ContrastiveLearningManager(criterion=crit)
    mesh = make_mesh()
    state = replicate({
        "params": v["params"], "quant": v.get("quant", {}),
        "constants": v.get("constants", {}),
        "batch_stats": v.get("batch_stats", {}),
        "opt_state": tx.init(v["params"]),
        "step": jnp.asarray(0, jnp.int32),
    }, mesh)
    step = jax.jit(build_retrieval_train_step(model, tx, crit, mgr, cfg),
                   donate_argnums=(0,))
    rngd = np.random.RandomState(0)
    batch_data = shard_batch(
        (rngd.randn(batch, image_size, image_size, 3).astype(np.float32),
         rngd.randint(0, vocab, (batch, 50)).astype(np.int32),
         np.full(batch, 20, np.int32)), mesh,
    )
    temp = jnp.float32(0.07)
    stage = jnp.int32(0)
    key = jax.random.PRNGKey(1)

    def step_fn(state, *args):
        return step(state, batch_data, temp, stage, key)

    return step, step_fn, state, (batch_data, temp, stage, key)
