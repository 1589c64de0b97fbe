"""Flickr8k image-text retrieval training pipeline.

Re-implements the reference driver
/root/reference/train_multimodal.py:244-819 as jitted steps over a device
mesh. Semantics preserved:

- HardNegativeMiningInfoNCE + curriculum manager with per-epoch temperature
  annealing (the scheduled temperature is passed into the jitted step as a
  traced scalar — no recompilation);
- GradualQuantizationScheduler (--gradual_quant) or the model's own
  set_epoch cascade. Quirk kept: without --gradual_quant, the cascade's only
  *effective* ramps are text_projector / image_projector (every encoder was
  constructed with its initial sparsity as its target, so its internal ramp
  is constant — multimodal_classifier.py:121-209);
- the distillation branch computes KL between a similarity matrix and its
  own detached softmax (train_multimodal.py:504-524) — mathematically zero
  with zero gradient; reproduced faithfully rather than 'fixed';
- EMA model (decay 0.999), warmup-cosine LR (floor 0.05), AdamW/SGD/Adam
  with betas (0.9, 0.98);
- checkpoint formats: best_model / best_ema_model / final_model, periodic
  full checkpoint dicts, training_history.json, final_report.json.

TPU-native: --use_amp maps to bfloat16 compute (the TPU-native mixed
precision) instead of torch.cuda.amp; the reference's OOM-catch/skip-batch
and empty_cache() workarounds have no TPU analog and are intentionally
omitted (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from atq_tpu.core.schedules import (
    GradualQuantizationScheduler,
    epoch_progress,
    set_quant_sparsity,
)
from atq_tpu.losses.contrastive import (
    ContrastiveLearningManager,
    HardNegativeMiningInfoNCE,
)
from atq_tpu.models.retrieval import ATQMultimodalRetrieval, get_model_size_info
from atq_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_state_tp,
    shard_tree_tp,
)
from atq_tpu.train.classifier import _save_checkpoint, load_checkpoint
from atq_tpu.train.retrieval_metrics import compute_retrieval_metrics
from atq_tpu.train.schedules_lr import warmup_cosine_schedule


@dataclasses.dataclass
class RetrievalConfig:
    """Typed config backing the train_multimodal.py argparse surface
    (reference train_multimodal.py:822-872)."""

    seed: int = 42
    use_cuda: bool = False
    device: str = "tpu"
    output_dir: str = "./outputs/retrieval"
    verbose: bool = False
    num_workers: int = 2
    batch_size: int = 16
    max_seq_length: int = 50
    image_size: int = 160
    embed_dim: int = 192
    hidden_dim: int = 384
    vision_sparsity: float = 0.3
    text_sparsity: float = 0.2
    use_residual: bool = False
    reinit_model: bool = False
    gradual_quant: bool = False
    warmup_epochs: int = 2
    epochs: int = 10
    learning_rate: float = 5e-5
    weight_decay: float = 1e-4
    optimizer: str = "adamw"
    clip_grad: bool = False
    modality_dropout: float = 0.1
    checkpoint_freq: int = 2
    contrastive_reg: float = 0.02
    use_amp: bool = False
    use_ema: bool = False
    train_baseline: bool = False
    distill: bool = False
    distill_weight: float = 0.3
    grad_checkpointing: bool = False  # reference parses-but-ignores this
    # (train_multimodal.py:870); here it enables real jax.checkpoint
    # rematerialization of the encoder forward (documented extension)
    # Framework extensions:
    data_dir: str = "./data/flickr8k"
    grad_mode: str = "parity"
    dp: Optional[int] = None
    tp: int = 1  # tensor parallelism over the 'model' mesh axis: the
    # transformer FFN projections (and their precision masks + adam
    # moments) shard their out-features; GSPMD inserts the collectives
    tensorboard_dir: Optional[str] = None  # opt-in TensorBoard scalars
    # (the JSON artifacts stay the schema-compatible source of truth)
    fsdp: bool = False  # ZeRO-3-style fully-sharded data parallelism:
    # every large state leaf (weights, masks, adam moments, EMA) shards
    # over 'data'; GSPMD all-gathers weights per layer use and
    # reduce-scatters grads. Composes with tp (2-D weight sharding).
    synthetic_images: int = 400
    resume: bool = False            # resume from the latest Orbax state
    profile_dir: Optional[str] = None  # jax.profiler trace output
    vocab_file: Optional[str] = None   # recorded-vocab escape hatch
    imagenet_weights: Optional[str] = None  # torchvision .pth for the
    # pretrained ResNet backbone (reference multimodal_classifier.py:28-39)
    device_preprocess: bool = True  # uint8 transfer; normalize/flip on-device
    use_multi_positive: bool = False  # MultiPositiveInfoNCE over the 5
    # captions/image (the reference defines the loss but never wires it)
    moe_experts: int = 0  # >0: ternary-expert MoE FFN in the text encoder
    scan_layers: bool = False  # nn.scan text stack (ScannedTernaryStack)
    attn_impl: str = "einsum"  # 'fused': single-block Pallas attention
    # (EP capability; adds the load-balance aux loss below)
    moe_aux_weight: float = 0.01
    grad_accum_steps: int = 1  # >1: GradCache-style two-pass accumulation.
    # Naive microbatch accumulation would shrink the contrastive negative
    # pool to the microbatch; instead the step (1) embeds every microbatch
    # without gradients (lax.scan — activations freed per microbatch),
    # (2) computes the FULL-batch contrastive loss and its gradient wrt
    # the concatenated embeddings, (3) re-encodes each microbatch
    # injecting its cotangent slice, accumulating parameter gradients.
    # Gradients equal the "embed microbatches sequentially, loss over the
    # concatenated pool" program exactly, at microbatch activation memory.


def _aux_mean(mutated):
    """Mean of the sown MoE load-balance aux losses (0.0 when none)."""
    aux_losses = jax.tree_util.tree_leaves(mutated.get("intermediates", {}))
    if not aux_losses:
        return jnp.asarray(0.0, jnp.float32)
    return sum(jnp.mean(a) for a in aux_losses) / len(aux_losses)


def pool_loss(img_emb, txt_emb, aux_mean, temperature, curriculum_kind,
              baseline_embeds, image_ids, cfg, criterion):
    """Full-pool retrieval loss given f32 embeddings: curriculum-weighted
    hard-negative InfoNCE (or multi-positive InfoNCE over the image-id
    positive mask), the MoE aux term, and the reference's distillation
    blend (train_multimodal.py:504-524 — KL of a similarity matrix
    against its own detached softmax, exactly zero with zero gradient;
    kept faithful). ONE implementation shared by the plain train step and
    the GradCache loss head so the two accumulation modes cannot
    silently diverge."""
    from atq_tpu.models.fusion import l2_normalize

    from atq_tpu.losses.contrastive import curriculum_weights_traced

    if cfg.use_multi_positive:
        from atq_tpu.losses.contrastive import MultiPositiveInfoNCE

        positive_mask = (image_ids[:, None]
                         == image_ids[None, :]).astype(jnp.float32)
        mp = MultiPositiveInfoNCE(lambda_reg=cfg.contrastive_reg)
        loss = mp(img_emb, txt_emb, positive_mask,
                  temperature=temperature)
    else:
        similarity = jnp.matmul(l2_normalize(img_emb, axis=1),
                                l2_normalize(txt_emb, axis=1).T)
        weights = curriculum_weights_traced(similarity, curriculum_kind)
        loss = criterion(img_emb, txt_emb, weights,
                         temperature=temperature)
    if cfg.moe_experts > 0:
        loss = loss + cfg.moe_aux_weight * aux_mean
    if baseline_embeds is not None:
        base_img, base_txt = baseline_embeds
        temp = 3.0
        img_sim = jnp.matmul(img_emb, base_img.T) / temp
        txt_sim = jnp.matmul(txt_emb, base_txt.T) / temp

        def _kl_self(sim):
            target = jax.nn.softmax(jax.lax.stop_gradient(sim), axis=1)
            log_t = jax.nn.log_softmax(jax.lax.stop_gradient(sim),
                                       axis=1)
            log_s = jax.nn.log_softmax(sim, axis=1)
            return jnp.mean(
                jnp.sum(target * (log_t - log_s), axis=1)
            ) * temp ** 2

        distill_loss = (_kl_self(img_sim) + _kl_self(txt_sim)) / 2
        loss = ((1 - cfg.distill_weight) * loss
                + cfg.distill_weight * distill_loss)
    return loss


def reinit_params(params, rng):
    """--reinit_model initialization (train_multimodal.py:292-307):
    embedding -> N(0, 0.02); >=2-D weights -> xavier_uniform(gain=0.8);
    other 1-D weights -> N(0, 0.02); biases -> 0. LayerNorm scales and
    gates/alphas/scalars are left untouched (torch walks 'weight'/'bias'
    names; those params are named neither)."""
    leaves = jax.tree_util.tree_leaves_with_path(params)
    new = {}

    def set_in(tree, path_keys, value):
        node = tree
        for k in path_keys[:-1]:
            node = node.setdefault(k, {})
        node[path_keys[-1]] = value

    for i, (path, leaf) in enumerate(leaves):
        keys = [str(getattr(p, "key", p)) for p in path]
        name = keys[-1]
        key_rng = jax.random.fold_in(rng, i)
        if name == "embedding":
            value = 0.02 * jax.random.normal(key_rng, leaf.shape, leaf.dtype)
        elif name in ("weight", "kernel") and leaf.ndim >= 2:
            fan_in = leaf.shape[-1]
            fan_out = int(np.prod(leaf.shape[:-1]))
            if name == "weight" and leaf.ndim == 3 and "scan" in keys:
                # Scanned stack: the leading axis is the layer count,
                # not a fan dimension — each layer is (out, in).
                fan_out = leaf.shape[-2]
            if name == "kernel" and leaf.ndim > 2:  # conv HWIO
                rf = int(np.prod(leaf.shape[:-2]))
                fan_in = leaf.shape[-2] * rf
                fan_out = leaf.shape[-1] * rf
            bound = 0.8 * np.sqrt(6.0 / (fan_in + fan_out))
            value = jax.random.uniform(key_rng, leaf.shape, leaf.dtype,
                                       -bound, bound)
        elif name in ("weight", "kernel"):
            value = 0.02 * jax.random.normal(key_rng, leaf.shape, leaf.dtype)
        elif name == "bias":
            value = jnp.zeros_like(leaf)
        else:
            value = leaf
        set_in(new, keys, value)
    return new


def retrieval_sparsity_plan(cfg: RetrievalConfig) -> Dict[str, tuple]:
    """The model's effective set_epoch ramps (see module docstring quirk)."""
    return {
        "text_projector": (min(0.1, cfg.text_sparsity), cfg.text_sparsity),
        "image_projector": (min(0.1, cfg.vision_sparsity),
                            cfg.vision_sparsity),
    }


def make_retrieval_optimizer(cfg: RetrievalConfig, steps_per_epoch: int):
    total_steps = cfg.epochs * steps_per_epoch
    schedule = warmup_cosine_schedule(
        cfg.learning_rate, int(total_steps * 0.1), total_steps,
        min_factor=0.05,
    )
    chain = []
    if cfg.clip_grad:
        chain.append(optax.clip_by_global_norm(1.0))
    if cfg.optimizer == "adamw":
        chain.append(optax.adamw(schedule, b1=0.9, b2=0.98,
                                 weight_decay=cfg.weight_decay))
    elif cfg.optimizer == "sgd":
        chain.append(optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(schedule, momentum=0.9),
        ))
    else:
        chain.append(optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.98),
            optax.scale_by_learning_rate(schedule),
        ))
    return optax.chain(*chain)


def build_retrieval_train_step(model, tx, criterion, cl_manager,
                               cfg: RetrievalConfig):
    """One jitted step: embeddings -> curriculum-weighted hard-negative
    InfoNCE -> update (+ EMA). The curriculum stage enters as a TRACED
    weighting-rule scalar (losses/contrastive.py:curriculum_kind) so stage
    transitions never recompile. When distillation is on, the
    step also receives the baseline's embeddings and reproduces the
    reference's distillation term (train_multimodal.py:504-524) — which is
    KL between a similarity matrix and its own detached softmax, i.e.
    exactly zero with zero gradient; kept faithful rather than 'fixed'."""

    def train_step(state, batch, temperature, curriculum_kind, rng,
                   baseline_embeds=None):
        if cfg.use_multi_positive:
            images, captions, lengths, image_ids = batch
        else:
            images, captions, lengths = batch
        drop_rng = jax.random.fold_in(rng, state["step"])
        if images.dtype == jnp.uint8:
            from atq_tpu.data.augment import random_hflip
            from atq_tpu.data.flickr8k import IMAGENET_MEAN, IMAGENET_STD

            images = (images.astype(jnp.float32) / 255.0
                      - IMAGENET_MEAN) / IMAGENET_STD
            images = random_hflip(images,
                                  jax.random.fold_in(drop_rng, 2))

        def loss_fn(p):
            # AMP note: under cfg.use_amp the MODEL carries
            # compute_dtype=bfloat16 (torch-autocast semantics,
            # train_multimodal.py:484-489): master params, quantizer
            # sort/threshold, and norms stay f32; effective weights and
            # activations cast to bf16 at each matmul/conv, which also
            # keeps the f32 Pallas order-statistic kernel on the
            # threshold path. (A blanket bf16 param-tree cast — the old
            # approach — ran the weight sorts in bf16, which is neither
            # faithful to autocast nor fast.)
            apply_images = images
            mutable = ["batch_stats"]
            if cfg.moe_experts > 0:
                mutable = ["batch_stats", "intermediates"]

            def _forward(p_, imgs_, captions_, lengths_, rng_):
                return model.apply(
                    {"params": p_, "quant": state["quant"],
                     "constants": state.get("constants", {}),
                     "batch_stats": state["batch_stats"]},
                    imgs_, captions_, lengths_, return_embeddings=True,
                    train=True, rngs={"dropout": rng_},
                    mutable=mutable,
                )

            if cfg.grad_checkpointing:
                # The reference parses --grad_checkpointing but never uses
                # it (train_multimodal.py:870). Here it is wired to real
                # rematerialization: jax.checkpoint discards the encoder's
                # intermediate activations after the forward pass and
                # recomputes them during the backward pass, trading FLOPs
                # for HBM — the TPU analog of torch.utils.checkpoint.
                # Gradients are bitwise-identical to the unremat path
                # (same ops, same dropout rng) — tested in
                # tests/test_train_steps.py. The policy keeps the tiny
                # tagged dequantized weights so backward reuses them
                # instead of re-running quantize per matmul use.
                from atq_tpu.nn.layers import quantized_weight_policy

                _forward = jax.checkpoint(
                    _forward, policy=quantized_weight_policy())

            (img_emb, txt_emb), mutated = _forward(
                p, apply_images, captions, lengths, drop_rng)
            loss = pool_loss(
                img_emb.astype(jnp.float32),
                txt_emb.astype(jnp.float32),
                _aux_mean(mutated), temperature, curriculum_kind,
                baseline_embeds,
                image_ids if cfg.use_multi_positive else None,
                cfg, criterion,
            )
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)

        new_state = {
            **state,
            "params": params,
            "opt_state": opt_state,
            "batch_stats": mutated["batch_stats"],
            "step": state["step"] + 1,
        }  # sown intermediates (moe aux) are consumed in-loss, not kept
        if cfg.use_ema:
            decay = 0.999
            new_state["ema_params"] = jax.tree_util.tree_map(
                lambda e, p: e * decay + p * (1 - decay),
                state["ema_params"], params,
            )
        return new_state, loss

    n_accum = max(1, int(getattr(cfg, "grad_accum_steps", 1)))
    if n_accum == 1:
        return train_step

    # ---- GradCache two-pass accumulation (cfg.grad_accum_steps > 1) ----
    # Contrastive losses couple every sample to every other through the
    # similarity matrix, so per-microbatch losses would shrink the
    # negative pool. The two-pass scheme keeps the FULL pool: gradient
    # d(loss)/d(params) = sum_i J_i^T @ d(loss)/d(emb_i), where J_i is the
    # encoder Jacobian of microbatch i — each term is one re-encoded
    # microbatch forward/backward with the embedding cotangent injected
    # through a dot-product surrogate. (Gao et al., "Scaling Deep
    # Contrastive Learning Batch Size under Memory Limited Setup".)

    def _preprocess(images, drop_rng):
        if images.dtype == jnp.uint8:
            from atq_tpu.data.augment import random_hflip
            from atq_tpu.data.flickr8k import IMAGENET_MEAN, IMAGENET_STD

            images = (images.astype(jnp.float32) / 255.0
                      - IMAGENET_MEAN) / IMAGENET_STD
            images = random_hflip(images,
                                  jax.random.fold_in(drop_rng, 2))
        return images

    def _forward(params, quant, constants, stats, imgs, captions,
                 lengths, rng):
        mutable = ["batch_stats"]
        if cfg.moe_experts > 0:
            mutable = ["batch_stats", "intermediates"]

        def fwd(p_, imgs_, captions_, lengths_, rng_):
            return model.apply(
                {"params": p_, "quant": quant, "constants": constants,
                 "batch_stats": stats},
                imgs_, captions_, lengths_, return_embeddings=True,
                train=True, rngs={"dropout": rng_}, mutable=mutable,
            )

        if cfg.grad_checkpointing:
            from atq_tpu.nn.layers import quantized_weight_policy

            fwd = jax.checkpoint(fwd, policy=quantized_weight_policy())
        return fwd(params, imgs, captions, lengths, rng)

    def gradcache_train_step(state, batch, temperature, curriculum_kind,
                             rng, baseline_embeds=None):
        if cfg.use_multi_positive:
            images, captions, lengths, image_ids = batch
        else:
            images, captions, lengths = batch
        total = images.shape[0]
        if total % n_accum:
            raise ValueError(
                f"batch size {total} not divisible by "
                f"grad_accum_steps {n_accum}"
            )
        micro = total // n_accum
        imgs_m = images.reshape(n_accum, micro, *images.shape[1:])
        caps_m = captions.reshape(n_accum, micro, *captions.shape[1:])
        lens_m = lengths.reshape(n_accum, micro)
        step_rng = jax.random.fold_in(rng, state["step"])
        quant = state["quant"]
        constants = state.get("constants", {})
        params = state["params"]

        # -- pass 1: embed every microbatch, no gradients ----------------
        def embed_micro(stats, xs):
            im, cap, ln, idx = xs
            rng_m = jax.random.fold_in(step_rng, idx)
            im = _preprocess(im, rng_m)
            (ie, te), mutated = _forward(params, quant, constants, stats,
                                         im, cap, ln, rng_m)
            return mutated["batch_stats"], (
                ie.astype(jnp.float32), te.astype(jnp.float32),
                _aux_mean(mutated))

        final_stats, (img_m, txt_m, aux_m) = jax.lax.scan(
            embed_micro, state["batch_stats"],
            (imgs_m, caps_m, lens_m, jnp.arange(n_accum)))
        img_emb = img_m.reshape(total, -1)
        txt_emb = txt_m.reshape(total, -1)
        aux_mean = jnp.mean(aux_m)
        has_baseline = baseline_embeds is not None
        aux_scale = ((1.0 - cfg.distill_weight) if has_baseline else 1.0)

        # -- full-pool loss and its gradient wrt the embeddings ----------
        def loss_head(embs):
            ie, te = embs
            return pool_loss(
                ie, te, aux_mean, temperature, curriculum_kind,
                baseline_embeds,
                image_ids if cfg.use_multi_positive else None,
                cfg, criterion,
            )

        loss, (cot_img, cot_txt) = jax.value_and_grad(loss_head)(
            (img_emb, txt_emb))
        cot_img_m = cot_img.reshape(n_accum, micro, -1)
        cot_txt_m = cot_txt.reshape(n_accum, micro, -1)

        # -- pass 2: re-encode each microbatch, inject its cotangent -----
        inv_n = 1.0 / n_accum

        def grad_micro(carry, xs):
            stats, gacc = carry
            im, cap, ln, idx, ci, ct = xs
            rng_m = jax.random.fold_in(step_rng, idx)
            im = _preprocess(im, rng_m)

            def surrogate(p):
                (ie, te), mutated = _forward(p, quant, constants, stats,
                                             im, cap, ln, rng_m)
                s = (jnp.vdot(ie.astype(jnp.float32), ci)
                     + jnp.vdot(te.astype(jnp.float32), ct))
                if cfg.moe_experts > 0:
                    # The aux loss reaches params directly (not through
                    # the embeddings); mean-of-means over microbatches,
                    # scaled like the plain step's blended loss.
                    s = s + (aux_scale * cfg.moe_aux_weight
                             * _aux_mean(mutated) * inv_n)
                return s, mutated

            (_, mutated), g = jax.value_and_grad(
                surrogate, has_aux=True)(params)
            gacc = jax.tree_util.tree_map(lambda a, b: a + b, gacc, g)
            return (mutated["batch_stats"], gacc), None

        (_, grads), _ = jax.lax.scan(
            grad_micro,
            (state["batch_stats"],
             jax.tree_util.tree_map(jnp.zeros_like, params)),
            (imgs_m, caps_m, lens_m, jnp.arange(n_accum),
             cot_img_m, cot_txt_m))

        updates, opt_state = tx.update(grads, state["opt_state"], params)
        new_params = optax.apply_updates(params, updates)
        new_state = {
            **state,
            "params": new_params,
            "opt_state": opt_state,
            "batch_stats": final_stats,
            "step": state["step"] + 1,
        }
        if cfg.use_ema:
            decay = 0.999
            new_state["ema_params"] = jax.tree_util.tree_map(
                lambda e, p: e * decay + p * (1 - decay),
                state["ema_params"], new_params,
            )
        return new_state, loss

    return gradcache_train_step


def build_baseline_train_step(baseline_model, baseline_tx, criterion):
    """FP baseline co-training step (train_multimodal.py:468-480): one
    contrastive update, returning the post-update eval-mode embeddings for
    distillation."""

    def step(bstate, batch, temperature, rng):
        images, captions, lengths = batch
        if images.dtype == jnp.uint8:
            # Same device-side preprocessing the ATQ step applies — the
            # reference baseline consumes the identical (normalized,
            # flipped) train loader output (train_multimodal.py:468-480).
            from atq_tpu.data.augment import random_hflip
            from atq_tpu.data.flickr8k import IMAGENET_MEAN, IMAGENET_STD

            images = (images.astype(jnp.float32) / 255.0
                      - IMAGENET_MEAN) / IMAGENET_STD
            images = random_hflip(images, rng)

        def loss_fn(p):
            (img, txt), mutated = baseline_model.apply(
                {"params": p, "batch_stats": bstate["batch_stats"]},
                images, captions, lengths, return_embeddings=True,
                train=True, mutable=["batch_stats"],
            )
            return criterion(img, txt, temperature=temperature), mutated

        (loss, mutated), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(bstate["params"])
        updates, opt_state = baseline_tx.update(grads, bstate["opt_state"],
                                                bstate["params"])
        params = optax.apply_updates(bstate["params"], updates)
        new_bstate = {
            "params": params,
            "batch_stats": mutated["batch_stats"],
            "opt_state": opt_state,
        }
        embeds = baseline_model.apply(
            {"params": params, "batch_stats": mutated["batch_stats"]},
            images, captions, lengths, return_embeddings=True, train=False,
        )
        return new_bstate, loss, embeds

    return step


def build_embed_fn(model, packed=None, int8=None):
    """Returns an ALREADY-JITTED ``embed(state, batch, use_ema=False)``.

    ``packed`` (exported 2-bit serving collection, with jit-static
    ``StaticShape`` leaves) and ``int8`` (the int8-trunk collection,
    serve/int8_trunk.py) are committed to the device once here and then
    passed as jit ARGUMENTS on every call. Do NOT re-wrap the result in
    ``jax.jit``: an outer trace would capture the weight trees by
    closure and embed them into the program as literal constants —
    exactly the constant-laden-executable shape the packed-serving
    crash investigation moved away from (serve/packed_model.py
    StaticShape docstring)."""
    packed = jax.device_put(packed) if packed else None
    int8 = jax.device_put(int8) if int8 else None

    def _embed(packed, int8, state, batch, use_ema: bool = False):
        images, captions, lengths = batch
        if images.dtype == jnp.uint8:
            from atq_tpu.data.flickr8k import IMAGENET_MEAN, IMAGENET_STD

            images = (images.astype(jnp.float32) / 255.0
                      - IMAGENET_MEAN) / IMAGENET_STD
        params = state["ema_params"] if use_ema else state["params"]
        variables = {"params": params, "quant": state["quant"],
                     "constants": state.get("constants", {}),
                     "batch_stats": state["batch_stats"]}
        if packed:
            variables["packed"] = packed
        if int8:
            variables["int8"] = int8
        return model.apply(
            variables,
            images, captions, lengths, return_embeddings=True, train=False,
        )

    jitted = jax.jit(_embed, static_argnames=("use_ema",))

    def embed(state, batch, use_ema: bool = False):
        return jitted(packed, int8, state, batch, use_ema)

    return embed


def evaluate_model(embed_fn, state, loader, topk=(1, 5, 10),
                   use_ema: bool = False):
    """Batched embedding extraction -> full similarity matrix -> R@K
    (reference train_multimodal.py:197-241)."""
    all_img, all_txt = [], []
    for batch in loader:
        img, txt = embed_fn(state, batch, use_ema)
        all_img.append(jax.device_get(img))
        all_txt.append(jax.device_get(txt))
    all_img = np.concatenate(all_img, axis=0)
    all_txt = np.concatenate(all_txt, axis=0)
    similarity = all_img @ all_txt.T
    metrics = compute_retrieval_metrics(similarity, topk=list(topk))
    # Extra diagnostics: the parity protocol's duplicated image gallery
    # forces text_to_image_R@1 to 0 (see train/retrieval_metrics.py);
    # the *_dedup numbers are the standard unique-gallery t2i recalls.
    from atq_tpu.train.retrieval_metrics import (
        compute_retrieval_metrics_dedup,
    )

    metrics.update(compute_retrieval_metrics_dedup(all_img, all_txt,
                                                   topk=list(topk)))
    return metrics


def train_retrieval(cfg: RetrievalConfig, loaders=None, verbose=True):
    from atq_tpu.data.flickr8k import prepare_flickr8k_dataloaders

    os.makedirs(cfg.output_dir, exist_ok=True)
    np.random.seed(cfg.seed)

    if loaders is None:
        loaders = prepare_flickr8k_dataloaders(
            batch_size=cfg.batch_size, image_size=cfg.image_size,
            max_length=cfg.max_seq_length, tokenize_captions=True,
            num_workers=cfg.num_workers, root_dir=cfg.data_dir,
            synthetic_images=cfg.synthetic_images,
            vocab_file=cfg.vocab_file,
            raw_uint8=cfg.device_preprocess,
            with_image_ids=cfg.use_multi_positive,
        )
    train_loader, val_loader, test_loader, vocab_size, word_to_idx = loaders
    # Persist the vocabulary next to the checkpoints so later evaluation /
    # fine-tuning runs can force the identical token ids.
    from atq_tpu.data.flickr8k import save_vocab_file

    save_vocab_file(word_to_idx, os.path.join(cfg.output_dir, "vocab.json"))

    model = ATQMultimodalRetrieval(
        vocab_size=vocab_size, embed_dim=cfg.embed_dim,
        hidden_dim=cfg.hidden_dim, vision_threshold=cfg.vision_sparsity,
        text_threshold=cfg.text_sparsity, use_residual=cfg.use_residual,
        grad_mode=cfg.grad_mode, max_seq_length=cfg.max_seq_length,
        text_moe_experts=cfg.moe_experts,
        text_scan_layers=cfg.scan_layers,
        text_attn_impl=cfg.attn_impl,
        # --use_amp with torch-autocast semantics: f32 master params and
        # quantizer thresholds; matmuls/convs compute in bf16.
        compute_dtype=jnp.bfloat16 if cfg.use_amp else None,
    )

    rng = jax.random.PRNGKey(cfg.seed)
    sample_img = jnp.zeros((2, cfg.image_size, cfg.image_size, 3),
                           jnp.float32)
    sample_txt = jnp.zeros((2, cfg.max_seq_length), jnp.int32)
    sample_len = jnp.asarray([5, 5], jnp.int32)
    variables = model.init(rng, sample_img, sample_txt, sample_len)
    params = variables["params"]
    if cfg.imagenet_weights:
        # Pretrained torchvision backbone (reference
        # multimodal_classifier.py:28-39). Grafted BEFORE reinit to mirror
        # the reference's order — its --reinit_model walks named_parameters
        # and xavier-clobbers the pretrained backbone too
        # (train_multimodal.py:293-312), a quirk we preserve.
        from atq_tpu.models.resnet import load_imagenet_weights

        bb_params, bb_stats = load_imagenet_weights(
            cfg.imagenet_weights, arch="resnet18")
        params = dict(params)
        params["image_encoder"] = dict(params["image_encoder"])
        params["image_encoder"]["base_model"] = bb_params
        bs = dict(variables.get("batch_stats", {}))
        bs["image_encoder"] = dict(bs.get("image_encoder", {}))
        bs["image_encoder"]["base_model"] = bb_stats
        variables = dict(variables)
        variables["batch_stats"] = bs
        if verbose:
            print(f"Loaded IMAGENET1K backbone from {cfg.imagenet_weights}")
        if cfg.reinit_model and verbose:
            print("WARNING: --reinit_model re-initializes the pretrained "
                  "backbone too (reference parity quirk)")
    if cfg.reinit_model:
        if verbose:
            print("Reinitializing model weights...")
        params = reinit_params(params, jax.random.fold_in(rng, 99))

    model_info = get_model_size_info(params, use_rpb=cfg.use_residual)
    if verbose:
        print("Model information:")
        for k, v in model_info.items():
            print(f"  {k}: {v:,}" if isinstance(v, int) else f"  {k}: {v:.2f}")

    criterion = HardNegativeMiningInfoNCE(
        temperature=0.07, lambda_reg=cfg.contrastive_reg,
        hard_negative_weight=0.5, temperature_schedule=True,
    )
    cl_manager = ContrastiveLearningManager(criterion=criterion,
                                            similarity_threshold=0.7)

    quant_scheduler = None
    if cfg.gradual_quant:
        quant_scheduler = GradualQuantizationScheduler(
            cfg.epochs, vision_sparsity=cfg.vision_sparsity,
            text_sparsity=cfg.text_sparsity,
            warmup_epochs=cfg.warmup_epochs, verbose=cfg.verbose,
        )
    sparsity_plan = retrieval_sparsity_plan(cfg)

    steps_per_epoch = max(1, len(train_loader))
    tx = make_retrieval_optimizer(cfg, steps_per_epoch)

    baseline_model = baseline_state = baseline_step = None
    if cfg.train_baseline:
        from atq_tpu.models.baseline_retrieval import BaselineRetrievalModel

        if verbose:
            print("Creating baseline retrieval model...")
        baseline_model = BaselineRetrievalModel(
            vocab_size=vocab_size, embed_dim=cfg.embed_dim,
            hidden_dim=cfg.hidden_dim,
        )
        bvars = baseline_model.init(jax.random.fold_in(rng, 5), sample_img,
                                    sample_txt, sample_len)
        # The reference always uses AdamW for the baseline
        # (train_multimodal.py:383-388).
        baseline_tx = optax.adamw(cfg.learning_rate,
                                  weight_decay=cfg.weight_decay)
        baseline_state = {
            "params": bvars["params"],
            "batch_stats": bvars.get("batch_stats", {}),
            "opt_state": baseline_tx.init(bvars["params"]),
        }
        baseline_step = jax.jit(
            build_baseline_train_step(baseline_model, baseline_tx,
                                      criterion)
        )

    mesh = make_mesh(dp=cfg.dp, tp=cfg.tp)
    state = {
        "params": params,
        "quant": variables.get("quant", {}),
        "constants": variables.get("constants", {}),
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": tx.init(params),
        "step": jnp.asarray(0, jnp.int32),
    }
    if cfg.use_ema:
        state["ema_params"] = jax.tree_util.tree_map(jnp.copy, params)

    def _place_state(s):
        if cfg.fsdp:
            from atq_tpu.parallel.mesh import shard_state_fsdp

            return shard_state_fsdp(s, mesh, tp=cfg.tp)
        if cfg.tp > 1:
            return shard_state_tp(s, mesh, cfg.tp)
        return replicate(s, mesh)

    def _place_tree(tree):
        """Placement for a standalone params-shaped tree (quant updates,
        best-checkpoint reload) consistent with :func:`_place_state`."""
        if cfg.fsdp:
            from atq_tpu.parallel.mesh import shard_state_fsdp

            return shard_state_fsdp({"params": tree}, mesh,
                                    tp=cfg.tp)["params"]
        if cfg.tp > 1:
            return shard_tree_tp(tree, mesh, cfg.tp)[0]
        return replicate(tree, mesh)

    state = _place_state(state)

    train_step = jax.jit(
        build_retrieval_train_step(model, tx, criterion, cl_manager, cfg),
        donate_argnums=(0,),
    )
    embed_fn = build_embed_fn(model)  # already jitted

    best_val_r1 = 0.0
    train_losses, val_metrics_history, pairs_per_sec_hist = [], [], []
    step_rng = jax.random.PRNGKey(cfg.seed + 7)

    # Resume support (absent in the reference — its checkpoints are only
    # reloaded for final eval; SURVEY.md §5).
    from atq_tpu.train.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    orbax_dir = os.path.join(cfg.output_dir, "orbax")
    start_epoch = 0
    if cfg.resume:
        try:
            host_state, done_epochs = restore_train_state(
                orbax_dir, jax.device_get(state)
            )
            # Re-shard on restore: blanket replicate would silently drop
            # the TP/FSDP placement (weights, masks, adam moments)
            # established at init.
            state = _place_state(host_state)
            start_epoch = done_epochs
            if verbose:
                print(f"Resumed from {orbax_dir} at epoch {start_epoch}")
        except FileNotFoundError:
            if verbose:
                print("No checkpoint to resume from; starting fresh")

    # Re-opened per epoch write: no handle to leak if training dies mid-epoch.
    metrics_path = os.path.join(cfg.output_dir, "metrics.jsonl")
    from atq_tpu.utils.tb import MetricsWriter

    tb = MetricsWriter(cfg.tensorboard_dir)

    if cfg.profile_dir:
        jax.profiler.start_trace(cfg.profile_dir)

    for epoch in range(start_epoch, cfg.epochs):
        criterion.set_epoch(epoch, cfg.epochs)
        cl_manager.set_epoch(epoch, cfg.epochs)
        temperature = criterion.get_current_temperature()

        quant_host = jax.device_get(state["quant"])
        if quant_scheduler is not None:
            quant_host = quant_scheduler.step(quant_host, epoch,
                                              sparsity_plan)
        else:
            quant_host = set_quant_sparsity(
                quant_host, sparsity_plan, epoch_progress(epoch, cfg.epochs)
            )
        state["quant"] = _place_tree(quant_host)

        epoch_loss, n_batches, n_pairs = 0.0, 0, 0
        t0 = time.time()
        from atq_tpu.data.prefetch import PrefetchLoader

        # Epoch-constant scalars go to the device ONCE per epoch; creating
        # them per batch would add host->device transfers to every step.
        temperature_dev = jnp.float32(temperature)
        curriculum_dev = jnp.int32(cl_manager.curriculum_kind())
        for batch in PrefetchLoader(train_loader):
            batch = shard_batch(batch, mesh)
            baseline_embeds = None
            if baseline_step is not None:
                baseline_state, _bloss, embeds = baseline_step(
                    baseline_state, batch[:3], temperature_dev,
                    jax.random.fold_in(step_rng, n_batches),
                )
                if cfg.distill:
                    baseline_embeds = embeds
            state, loss = train_step(state, batch,
                                     temperature_dev,
                                     curriculum_dev,
                                     step_rng, baseline_embeds)
            # Accumulate on-device; per-batch device_get would sync.
            epoch_loss = loss if n_batches == 0 else epoch_loss + loss
            n_batches += 1
            n_pairs += int(batch[0].shape[0])
        jax.block_until_ready(state["params"])
        epoch_loss = float(jax.device_get(epoch_loss))
        epoch_time = time.time() - t0
        pairs_per_sec = n_pairs / max(epoch_time, 1e-9)
        pairs_per_sec_hist.append(pairs_per_sec)

        train_loss = epoch_loss / max(1, n_batches)
        train_losses.append(train_loss)

        val_metrics = evaluate_model(embed_fn, state, val_loader,
                                     use_ema=cfg.use_ema)
        val_metrics_history.append(val_metrics)
        if verbose:
            print(f"Epoch {epoch + 1}/{cfg.epochs} - {epoch_time:.1f}s "
                  f"({pairs_per_sec:.1f} pairs/s):")
            print(f"  Train Loss: {train_loss:.4f}")
            for k in (1, 5, 10):
                print(f"  Validation R@{k}: "
                      f"{val_metrics[f'mean_R@{k}']:.2f}%")

        if val_metrics["mean_R@1"] > best_val_r1:
            best_val_r1 = val_metrics["mean_R@1"]
            if verbose:
                print(f"  New best model with validation R@1: "
                      f"{best_val_r1:.2f}%")
            _save_checkpoint(
                jax.device_get({"params": state["params"],
                                "quant": state["quant"],
                                "constants": state.get("constants", {}),
                                "batch_stats": state["batch_stats"]}),
                os.path.join(cfg.output_dir, "best_model.npz"),
            )
            if cfg.use_ema:
                _save_checkpoint(
                    jax.device_get({"params": state["ema_params"],
                                    "quant": state["quant"],
                                    "constants": state.get("constants", {}),
                                    "batch_stats": state["batch_stats"]}),
                    os.path.join(cfg.output_dir, "best_ema_model.npz"),
                )

        epoch_metrics = {
            "train_loss": float(train_loss),
            "pairs_per_sec": float(pairs_per_sec),
            **{k: float(v) for k, v in val_metrics.items()},
        }
        with open(metrics_path, "a") as metrics_log:
            metrics_log.write(json.dumps(
                {"epoch": epoch + 1, **epoch_metrics}) + "\n")
        tb.scalars(epoch + 1, epoch_metrics, prefix="retrieval/")
        tb.flush()

        if cfg.profile_dir and epoch == start_epoch:
            jax.profiler.stop_trace()

        if (epoch + 1) % cfg.checkpoint_freq == 0 or (epoch + 1) == cfg.epochs:
            save_train_state(orbax_dir, epoch + 1, state)
            ckpt_path = os.path.join(cfg.output_dir,
                                     f"checkpoint_epoch_{epoch + 1}.npz")
            _save_checkpoint(
                jax.device_get({
                    "epoch": np.asarray(epoch + 1),
                    "model_state_dict": {"params": state["params"],
                                         "quant": state["quant"],
                                         "batch_stats": state["batch_stats"]},
                    "optimizer_state_dict": state["opt_state"],
                    "best_val_r1": np.asarray(best_val_r1),
                }), ckpt_path,
            )
            if verbose:
                print(f"  Saved checkpoint to {ckpt_path}")

    _save_checkpoint(
        jax.device_get({"params": state["params"], "quant": state["quant"],
                        "constants": state.get("constants", {}),
                        "batch_stats": state["batch_stats"]}),
        os.path.join(cfg.output_dir, "final_model.npz"),
    )

    history = {
        "train_losses": [float(x) for x in train_losses],
        "val_metrics": [{k: float(v) for k, v in m.items()}
                        for m in val_metrics_history],
    }
    with open(os.path.join(cfg.output_dir, "training_history.json"),
              "w") as f:
        json.dump(history, f, indent=4)

    _plot_training_curves(train_losses, val_metrics_history, cfg.output_dir)

    # Final eval with the best checkpoint (fallback chain mirrors
    # train_multimodal.py:723-741).
    best_path = os.path.join(cfg.output_dir, "best_model.npz")
    if os.path.exists(best_path):
        best = load_checkpoint(best_path)

        state["params"] = _place_tree(best["params"])
        state["quant"] = _place_tree(best["quant"])
        state["constants"] = replicate(best.get("constants", {}), mesh)
        state["batch_stats"] = replicate(best.get("batch_stats", {}), mesh)
        if verbose:
            print(f"Loaded best model from {best_path}")
    test_metrics = evaluate_model(embed_fn, state, test_loader,
                                  use_ema=False)

    # Single-sample inference latency, on the device_get-synced timer:
    # block_until_ready can return early on remote-dispatch backends
    # (utils/timing.py), so published latencies use sec_per_call.
    from atq_tpu.utils.timing import sec_per_call

    one = (np.zeros((1, cfg.image_size, cfg.image_size, 3), np.float32),
           np.zeros((1, cfg.max_seq_length), np.int32),
           np.asarray([5], np.int32))
    atq_time_ms = sec_per_call(lambda: embed_fn(state, one)) * 1000.0

    baseline_time_ms = None
    if cfg.train_baseline and baseline_model is not None:
        bembed = jax.jit(
            lambda bstate, b: baseline_model.apply(
                {"params": bstate["params"],
                 "batch_stats": bstate["batch_stats"]},
                b[0], b[1], b[2], return_embeddings=True, train=False,
            )
        )
        baseline_time_ms = sec_per_call(
            lambda: bembed(baseline_state, one)) * 1000.0

    report = {
        "best_val_r1": float(best_val_r1),
        "test_metrics": {k: float(v) for k, v in test_metrics.items()},
        "atq_inference_time_ms": float(atq_time_ms),
        "baseline_inference_time_ms": (float(baseline_time_ms)
                                       if baseline_time_ms else None),
        "speed_ratio": (float(baseline_time_ms / atq_time_ms)
                        if baseline_time_ms and atq_time_ms > 0 else None),
        "model_size_mb": float(model_info["estimated_memory_usage_MB"]),
        "parameters": int(model_info["total_parameters"]),
        "pairs_per_sec": float(np.mean(pairs_per_sec_hist[1:])
                               if len(pairs_per_sec_hist) > 1
                               else pairs_per_sec_hist[0]),
        "training_args": dataclasses.asdict(cfg),
    }
    with open(os.path.join(cfg.output_dir, "final_report.json"), "w") as f:
        json.dump(report, f, indent=4)

    if verbose:
        print("=" * 50)
        print("TRAINING COMPLETE")
        print(f"Best validation R@1: {best_val_r1:.2f}%")
        for k in (1, 5, 10):
            print(f"  Test R@{k}: {test_metrics[f'mean_R@{k}']:.2f}%")
        print(f"  ATQ inference time: {atq_time_ms:.2f} ms per sample")
    from atq_tpu.train.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()  # async Orbax saves must commit before exit
    tb.close()
    return state, history, report


def _plot_training_curves(train_losses, val_metrics_history, output_dir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(15, 10))
    plt.subplot(2, 2, 1)
    plt.plot(train_losses)
    plt.title("Training Loss")
    plt.xlabel("Epoch")
    plt.ylabel("Loss")
    plt.grid(True)

    plt.subplot(2, 2, 2)
    for k in (1, 5, 10):
        plt.plot([m[f"mean_R@{k}"] for m in val_metrics_history],
                 label=f"R@{k}")
    plt.title("Validation Retrieval Performance")
    plt.xlabel("Epoch")
    plt.ylabel("Recall (%)")
    plt.legend()
    plt.grid(True)

    plt.subplot(2, 2, 3)
    plt.plot([m["image_to_text_R@1"] for m in val_metrics_history],
             label="Image→Text")
    plt.plot([m["text_to_image_R@1"] for m in val_metrics_history],
             label="Text→Image")
    plt.title("R@1 by Direction")
    plt.xlabel("Epoch")
    plt.ylabel("Recall@1 (%)")
    plt.legend()
    plt.grid(True)

    plt.tight_layout()
    plt.savefig(os.path.join(output_dir, "training_curves.png"))
    plt.close()
