#!/usr/bin/env python
"""Reproduce the round-3 memory-scaling measurements (BENCHMARKS.md):

1. GradCache accumulation: XLA `memory_analysis()` of the flagship
   retrieval train step — plain batch-64 vs the 8-microbatch GradCache
   step with the same 64-sample negative pool.
2. FSDP (ZeRO-3): per-device state bytes of the flagship retrieval
   training state (params + masks + adam moments + EMA) replicated vs
   `shard_state_fsdp` on a dp=8 mesh.

Runs on the 8-device virtual CPU mesh (byte accounting is
backend-independent; the GSPMD partitioning path is the same as TPU).

    python benchmarks/memory_report.py
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()

import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import json

import jax.numpy as jnp
import numpy as np

from atq_tpu.losses.contrastive import (
    ContrastiveLearningManager,
    HardNegativeMiningInfoNCE,
)
from atq_tpu.models.retrieval import ATQMultimodalRetrieval
from atq_tpu.parallel.mesh import make_mesh, replicate, shard_state_fsdp
from atq_tpu.train.retrieval import (
    RetrievalConfig,
    build_retrieval_train_step,
    make_retrieval_optimizer,
)

MB = 2.0 ** 20


def _flagship(batch, image, seq, accum):
    model = ATQMultimodalRetrieval(vocab_size=1000, embed_dim=192,
                                   hidden_dim=384, use_residual=True,
                                   max_seq_length=seq)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, image, image, 3)),
                   jnp.zeros((2, seq), jnp.int32), jnp.asarray([5, 5]))
    cfg = RetrievalConfig(batch_size=batch, image_size=image,
                          embed_dim=192, hidden_dim=384,
                          use_residual=True, max_seq_length=seq,
                          grad_accum_steps=accum)
    tx = make_retrieval_optimizer(cfg, 100)
    state = {"params": v["params"], "quant": v.get("quant", {}),
             "constants": v.get("constants", {}),
             "batch_stats": v.get("batch_stats", {}),
             "opt_state": tx.init(v["params"]),
             "step": jnp.asarray(0, jnp.int32)}
    return model, cfg, tx, state


def gradcache_memory(batch=64, image=96, seq=50):
    out = {}
    crit = HardNegativeMiningInfoNCE()
    mgr = ContrastiveLearningManager(criterion=crit)
    img = jnp.zeros((batch, image, image, 3), jnp.float32)
    txt = jnp.zeros((batch, seq), jnp.int32)
    ln = jnp.full((batch,), 20, jnp.int32)
    for accum in (1, 8):
        model, cfg, tx, state = _flagship(batch, image, seq, accum)
        step = jax.jit(build_retrieval_train_step(model, tx, crit, mgr,
                                                  cfg))
        compiled = step.lower(state, (img, txt, ln), jnp.float32(0.07),
                              jnp.int32(0),
                              jax.random.PRNGKey(1)).compile()
        ma = compiled.memory_analysis()
        out[f"accum{accum}_temp_mb"] = round(ma.temp_size_in_bytes / MB, 1)
    out["temp_ratio"] = round(out["accum1_temp_mb"]
                              / out["accum8_temp_mb"], 1)
    return out


def fsdp_memory():
    model, cfg, tx, state = _flagship(64, 96, 50, 1)
    state["ema_params"] = jax.tree_util.tree_map(jnp.copy, state["params"])
    mesh = make_mesh(dp=8)
    dev0 = jax.devices()[0]

    def dev0_mb(tree):
        total = 0
        for leaf in jax.tree_util.tree_leaves(tree):
            for s in getattr(leaf, "addressable_shards", []):
                if s.device == dev0:
                    total += s.data.nbytes
        return round(total / MB, 1)

    rep = dev0_mb(replicate(state, mesh))
    shd = dev0_mb(shard_state_fsdp(state, mesh))
    return {"replicated_mb_per_device": rep,
            "fsdp_mb_per_device": shd,
            "state_ratio": round(rep / shd, 1)}


if __name__ == "__main__":
    report = {"fsdp": fsdp_memory(), "gradcache": gradcache_memory()}
    print(json.dumps(report, indent=2))
