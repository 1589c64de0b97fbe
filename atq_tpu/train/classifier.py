"""Classification training pipeline (Fashion-MNIST / MNIST).

Re-implements the reference driver /root/reference/train.py:16-409 as a
single jitted train step over a device mesh:

- the ATQ model and the full-precision baseline teacher are co-trained in
  ONE compiled step (the reference runs two separate fwd/bwd per batch);
- progressive sparsity ``0.05 + (target - 0.05) * min(1, e / (0.7 E))``
  (train.py:138) is a host-side scalar written into the 'quant' collection
  every epoch — values only, no recompilation;
- knowledge distillation: T=4, loss = 0.7 CE + 0.3 KD (train.py:174-192);
- progressive L1 with weight ``l1_factor * min(1, e / (0.5 E))``
  (train.py:144, :194-203) over non-BN weight matrices;
- optional per-step warmup-cosine LR (floor 0.1) or per-epoch StepLR
  (gamma 0.5, step epochs//4);
- optional global-norm gradient clipping at 1.0.

Data parallelism: batches are sharded over the mesh 'data' axis; parameters
are replicated; XLA GSPMD inserts the gradient all-reduce. The same step
runs on 1 chip or a slice.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from atq_tpu.core.quantize import adaptive_ternary_quantization
from atq_tpu.models.image_classifier import (
    ATQImageClassifier,
    BaselineCNNClassifier,
)
from atq_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from atq_tpu.train.schedules_lr import (
    step_lr_schedule,
    warmup_cosine_schedule,
)


@dataclasses.dataclass
class ClassifierConfig:
    """Typed config backing the train.py argparse surface flag-for-flag
    (reference train.py:411-429)."""

    dataset: str = "fashion_mnist"
    batch_size: int = 256
    learning_rate: float = 1e-3
    epochs: int = 20
    use_rpb: bool = False
    distill: bool = False
    sparsity: float = 0.3
    wider_layers: bool = False
    use_cosine_lr: bool = False
    l1_factor: float = 1e-5
    use_l1: bool = False
    clip_grad: bool = False
    bit_packing: bool = False
    # Framework extensions (not in the reference surface):
    data_dir: str = "./data"
    checkpoint_dir: str = "checkpoints"
    plots_dir: str = "plots"
    grad_mode: str = "parity"
    seed: int = 0
    dp: Optional[int] = None  # data-parallel size; None = all devices
    fsdp: bool = False  # ZeRO-3-style fully-sharded data parallelism:
    # large state leaves (weights, masks, adam moments) shard over 'data'
    tensorboard_dir: Optional[str] = None  # opt-in TensorBoard scalars
    tp: int = 1  # tensor parallelism: classifier projections sharded
    # over 'model' (weights + precision masks + adam moments)
    resume: bool = False
    profile_dir: Optional[str] = None
    orbax_freq: int = 5  # epochs between full-state Orbax saves
    device_augment: bool = True  # run train-time augmentation on-device
    grad_accum_steps: int = 1  # >1: split each batch into N microbatches
    # inside the jitted step (lax.scan), average their gradients, apply ONE
    # optimizer update — large effective batches at microbatch activation
    # memory. Exact mean-of-means for the CE/KD/L1 losses; BN batch stats
    # and dropout/augment rng are per-microbatch (torch-accumulation
    # semantics).


def _l1_penalty(params) -> jax.Array:
    """L1 over every torch parameter whose name contains 'weight'
    (train.py:194-203). The reference also filters `'bn' not in name`,
    but that filter never fires: its BatchNorms live at Sequential
    indices ('features.1.weight'), so BN/LN scales ARE regularized.
    Here torch '.weight' maps to leaves named weight (quantized linears,
    (out,in) layout), kernel (conv/dense), or scale (BN/LN)."""
    total = jnp.asarray(0.0, jnp.float32)
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = [getattr(p, "key", str(p)) for p in path]
        if str(keys[-1]) in ("weight", "kernel", "scale"):
            total = total + jnp.sum(jnp.abs(leaf))
    return total


def _set_all_sparsity(quant, value: float):
    """Push one sparsity value into every layer that has the knob —
    the reference's `for m in modules: if hasattr(m,'sparsity_target')`
    walk (train.py:146-149)."""
    def update(node):
        if isinstance(node, dict):
            return {
                k: (jnp.asarray(value, jnp.float32)
                    if k == "sparsity_target" else update(v))
                for k, v in node.items()
            }
        return node

    return update(quant)


def _cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def _kd_loss(student_logits, teacher_logits, temperature: float = 4.0):
    """KL(softmax(teacher/T) || softmax(student/T)) * T^2, batchmean
    (train.py:176-189)."""
    t = jax.nn.softmax(teacher_logits / temperature, axis=-1)
    log_s = jax.nn.log_softmax(student_logits / temperature, axis=-1)
    log_t = jax.nn.log_softmax(teacher_logits / temperature, axis=-1)
    return jnp.mean(jnp.sum(t * (log_t - log_s), axis=-1)) * temperature ** 2


def ternary_latent_decay_mask(params, quant, grad_mode: str):
    """Weight-decay mask: False for latent TernaryLinear weights in parity
    mode. In the reference those weights receive NO gradient at all
    (atq/layers.py:35-43, SURVEY §2.1 quirk), so torch Adam — which skips
    grad-None params entirely — never applies weight decay to them either.
    Blanket optax.add_decayed_weights would shrink them (moving the
    quantizer threshold and alpha) where the reference leaves them frozen.
    RPB weights keep decay: their masked-gradient tensors are real, so
    torch decays the full matrix."""
    def walk(p, q):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict):
                out[k] = walk(v, q.get(k, {}) if isinstance(q, dict)
                              else {})
            else:
                is_latent = (
                    k == "weight" and "alpha" in p
                    and grad_mode == "parity"
                    and not (isinstance(q, dict) and "precision_mask" in q)
                )
                out[k] = not is_latent
        return out

    return walk(params, quant or {})


def make_optimizer(cfg: ClassifierConfig, steps_per_epoch: int,
                   weight_decay: float = 0.0, decay_mask=None,
                   clip=None):
    """``clip=None`` follows cfg.clip_grad; the BASELINE optimizer must
    pass ``clip=False`` — the reference clips only the ATQ model's
    gradients (train.py:209-211 clips model.parameters(); the baseline
    optimizer at :163-167 never clips)."""
    if cfg.use_cosine_lr:
        total_steps = steps_per_epoch * cfg.epochs
        schedule = warmup_cosine_schedule(cfg.learning_rate,
                                          total_steps // 10, total_steps)
    else:
        schedule = step_lr_schedule(cfg.learning_rate, steps_per_epoch,
                                    cfg.epochs // 4)
    chain = []
    if cfg.clip_grad if clip is None else clip:
        chain.append(optax.clip_by_global_norm(1.0))
    if weight_decay:
        # torch Adam's weight_decay adds an L2 term to the gradient BEFORE
        # the moment updates (train.py:66-70) — not decoupled AdamW.
        decay = optax.add_decayed_weights(weight_decay)
        if decay_mask is not None:
            decay = optax.masked(decay, decay_mask)
        chain.append(decay)
    chain.append(optax.adam(schedule))
    return optax.chain(*chain)


def build_train_step(atq_model, base_model, atq_tx, base_tx,
                     cfg: ClassifierConfig):
    """One compiled step training BOTH models (teacher first, then student
    with optional distillation from the teacher's pre-update logits).

    With ``cfg.grad_accum_steps > 1`` the returned step splits the batch
    into that many microbatches inside the compiled program (lax.scan),
    averages their gradients, and applies ONE optimizer update per model —
    the effective batch trains at microbatch activation memory. Loss terms
    are exact means-of-means (equal microbatch sizes); BatchNorm statistics
    and dropout/augment randomness are per-microbatch, matching what a
    torch user gets from N separate forward/backwards per optimizer step.
    """

    def _normalize_augment(images, aug_rng):
        """Device-side normalize + augment for raw uint8 loader batches
        (identical math to the unaccumulated path below)."""
        from atq_tpu.data.augment import classifier_augment
        from atq_tpu.data.mnist import FASHION_STATS, MNIST_STATS

        mean, std = (FASHION_STATS if cfg.dataset == "fashion_mnist"
                     else MNIST_STATS)
        images = (images.astype(jnp.float32) / 255.0 - mean) / std
        return classifier_augment(
            images, aug_rng, flip=cfg.dataset == "fashion_mnist"
        )

    def train_step(state: Dict[str, Any], batch, sparsity_unused,
                   l1_weight, rng):
        images, labels = batch
        drop_rng = jax.random.fold_in(rng, state["step"])
        if cfg.device_augment and images.dtype == jnp.uint8:
            # Only raw uint8 loader output gets the device-side normalize +
            # augment; caller-supplied float batches are already normalized
            # (re-normalizing them would silently corrupt training).
            images = _normalize_augment(images,
                                        jax.random.fold_in(drop_rng, 1))

        # --- baseline (teacher) ---
        def base_loss_fn(p):
            logits, mutated = base_model.apply(
                {"params": p, "batch_stats": state["base_batch_stats"]},
                images, train=True, rngs={"dropout": drop_rng},
                mutable=["batch_stats"],
            )
            return _cross_entropy(logits, labels), (logits, mutated)

        (base_loss, (base_logits, base_mut)), base_grads = (
            jax.value_and_grad(base_loss_fn, has_aux=True)(
                state["base_params"]
            )
        )
        base_updates, base_opt_state = base_tx.update(
            base_grads, state["base_opt_state"], state["base_params"]
        )
        base_params = optax.apply_updates(state["base_params"], base_updates)

        # --- ATQ (student) ---
        def atq_loss_fn(p):
            logits, mutated = atq_model.apply(
                {"params": p, "quant": state["quant"],
                 "batch_stats": state["atq_batch_stats"]},
                images, train=True, rngs={"dropout": drop_rng},
                mutable=["batch_stats"],
            )
            loss = _cross_entropy(logits, labels)
            if cfg.distill:
                loss = 0.7 * loss + 0.3 * _kd_loss(
                    logits, jax.lax.stop_gradient(base_logits)
                )
            if cfg.use_l1:
                loss = loss + l1_weight * _l1_penalty(p)
            return loss, (logits, mutated)

        (atq_loss, (atq_logits, atq_mut)), atq_grads = (
            jax.value_and_grad(atq_loss_fn, has_aux=True)(
                state["atq_params"]
            )
        )
        atq_updates, atq_opt_state = atq_tx.update(
            atq_grads, state["atq_opt_state"], state["atq_params"]
        )
        atq_params = optax.apply_updates(state["atq_params"], atq_updates)

        new_state = {
            **state,
            "base_params": base_params,
            "base_opt_state": base_opt_state,
            "base_batch_stats": base_mut["batch_stats"],
            "atq_params": atq_params,
            "atq_opt_state": atq_opt_state,
            "atq_batch_stats": atq_mut["batch_stats"],
            "step": state["step"] + 1,
        }
        metrics = {
            "loss": atq_loss,
            "base_loss": base_loss,
            "atq_correct": jnp.sum(jnp.argmax(atq_logits, -1) == labels),
            "base_correct": jnp.sum(jnp.argmax(base_logits, -1) == labels),
            "count": jnp.asarray(labels.shape[0], jnp.int32),
        }
        return new_state, metrics

    n_accum = max(1, int(getattr(cfg, "grad_accum_steps", 1)))
    if n_accum == 1:
        return train_step

    def _micro_grads(base_params, atq_params, base_stats, atq_stats,
                     quant, images, labels, l1_weight, drop_rng):
        """Gradients + mutated stats + metrics for ONE microbatch, from
        the given (pre-update) params — the same math as one unaccumulated
        step minus the optimizer updates."""
        if cfg.device_augment and images.dtype == jnp.uint8:
            images = _normalize_augment(images,
                                        jax.random.fold_in(drop_rng, 1))

        def base_loss_fn(p):
            logits, mutated = base_model.apply(
                {"params": p, "batch_stats": base_stats},
                images, train=True, rngs={"dropout": drop_rng},
                mutable=["batch_stats"],
            )
            return _cross_entropy(logits, labels), (logits, mutated)

        (base_loss, (base_logits, base_mut)), base_grads = (
            jax.value_and_grad(base_loss_fn, has_aux=True)(base_params)
        )

        def atq_loss_fn(p):
            logits, mutated = atq_model.apply(
                {"params": p, "quant": quant, "batch_stats": atq_stats},
                images, train=True, rngs={"dropout": drop_rng},
                mutable=["batch_stats"],
            )
            loss = _cross_entropy(logits, labels)
            if cfg.distill:
                loss = 0.7 * loss + 0.3 * _kd_loss(
                    logits, jax.lax.stop_gradient(base_logits)
                )
            if cfg.use_l1:
                loss = loss + l1_weight * _l1_penalty(p)
            return loss, (logits, mutated)

        (atq_loss, (atq_logits, atq_mut)), atq_grads = (
            jax.value_and_grad(atq_loss_fn, has_aux=True)(atq_params)
        )
        metrics = {
            "loss": atq_loss,
            "base_loss": base_loss,
            "atq_correct": jnp.sum(
                jnp.argmax(atq_logits, -1) == labels).astype(jnp.int32),
            "base_correct": jnp.sum(
                jnp.argmax(base_logits, -1) == labels).astype(jnp.int32),
        }
        return (base_grads, atq_grads, base_mut["batch_stats"],
                atq_mut["batch_stats"], metrics)

    def accum_train_step(state: Dict[str, Any], batch, sparsity_unused,
                         l1_weight, rng):
        images, labels = batch
        total = images.shape[0]
        if total % n_accum:
            raise ValueError(
                f"batch size {total} not divisible by "
                f"grad_accum_steps {n_accum}"
            )
        micro = total // n_accum
        imgs = images.reshape(n_accum, micro, *images.shape[1:])
        lbls = labels.reshape(n_accum, micro)
        drop_rng = jax.random.fold_in(rng, state["step"])
        inv_n = 1.0 / n_accum

        def micro_step(carry, xs):
            base_stats, atq_stats, base_acc, atq_acc, msum = carry
            im, lb, idx = xs
            rng_m = jax.random.fold_in(drop_rng, idx)
            base_g, atq_g, base_stats, atq_stats, m = _micro_grads(
                state["base_params"], state["atq_params"], base_stats,
                atq_stats, state["quant"], im, lb, l1_weight, rng_m,
            )
            base_acc = jax.tree_util.tree_map(
                lambda a, g: a + g * inv_n, base_acc, base_g)
            atq_acc = jax.tree_util.tree_map(
                lambda a, g: a + g * inv_n, atq_acc, atq_g)
            msum = {
                "loss": msum["loss"] + m["loss"] * inv_n,
                "base_loss": msum["base_loss"] + m["base_loss"] * inv_n,
                "atq_correct": msum["atq_correct"] + m["atq_correct"],
                "base_correct": msum["base_correct"] + m["base_correct"],
            }
            return (base_stats, atq_stats, base_acc, atq_acc, msum), None

        carry0 = (
            state["base_batch_stats"],
            state["atq_batch_stats"],
            jax.tree_util.tree_map(jnp.zeros_like, state["base_params"]),
            jax.tree_util.tree_map(jnp.zeros_like, state["atq_params"]),
            {"loss": jnp.asarray(0.0, jnp.float32),
             "base_loss": jnp.asarray(0.0, jnp.float32),
             "atq_correct": jnp.asarray(0, jnp.int32),
             "base_correct": jnp.asarray(0, jnp.int32)},
        )
        (base_stats, atq_stats, base_grads, atq_grads, msum), _ = (
            jax.lax.scan(micro_step, carry0,
                         (imgs, lbls, jnp.arange(n_accum)))
        )

        base_updates, base_opt_state = base_tx.update(
            base_grads, state["base_opt_state"], state["base_params"]
        )
        base_params = optax.apply_updates(state["base_params"],
                                          base_updates)
        atq_updates, atq_opt_state = atq_tx.update(
            atq_grads, state["atq_opt_state"], state["atq_params"]
        )
        atq_params = optax.apply_updates(state["atq_params"], atq_updates)

        new_state = {
            **state,
            "base_params": base_params,
            "base_opt_state": base_opt_state,
            "base_batch_stats": base_stats,
            "atq_params": atq_params,
            "atq_opt_state": atq_opt_state,
            "atq_batch_stats": atq_stats,
            "step": state["step"] + 1,
        }
        metrics = {**msum,
                   "count": jnp.asarray(total, jnp.int32)}
        return new_state, metrics

    return accum_train_step


def build_eval_step(model, params_key: str, stats_key: str,
                    packed=None):
    """Returns an ALREADY-JITTED ``eval_step(state, batch)``.

    ``packed`` (an exported 2-bit serving collection, with jit-static
    StaticShape leaves) is committed to the device once and passed as a
    jit ARGUMENT on every call — not closed over, which would embed every
    weight byte into the executable as literal constants (see
    serve/packed_model.py StaticShape). Do not re-wrap in jax.jit."""
    packed = jax.device_put(packed) if packed else None

    def _eval_step(packed, state, batch):
        images, labels = batch
        variables = {"params": state[params_key],
                     "quant": state.get("quant", {}),
                     "batch_stats": state[stats_key]}
        if packed:
            variables["packed"] = packed
        logits = model.apply(variables, images, train=False)
        return {
            "loss": _cross_entropy(logits, labels)
            * jnp.asarray(labels.shape[0], jnp.float32),
            "correct": jnp.sum(jnp.argmax(logits, -1) == labels),
            "count": jnp.asarray(labels.shape[0], jnp.int32),
        }

    jitted = jax.jit(_eval_step)

    def eval_step(state, batch):
        return jitted(packed, state, batch)

    return eval_step


def _run_eval(eval_fn, state, loader):
    totals = {"loss": 0.0, "correct": 0, "count": 0}
    for batch in loader:
        m = jax.device_get(eval_fn(state, batch))
        for k in totals:
            totals[k] += float(m[k])
    acc = 100.0 * totals["correct"] / max(1, totals["count"])
    return acc, totals["loss"] / max(1, totals["count"])


def train_classifier(cfg: ClassifierConfig, loaders=None, verbose=True):
    """Full training run; returns (final_state, results dict)."""
    from atq_tpu.data.mnist import get_fashion_mnist_data, get_mnist_data

    if loaders is None:
        if cfg.dataset == "mnist":
            loaders = get_mnist_data(cfg.batch_size, cfg.data_dir,
                                     subset_fraction=1.0)
        elif cfg.dataset == "fashion_mnist":
            loaders = get_fashion_mnist_data(cfg.batch_size, cfg.data_dir,
                                             subset_fraction=1.0)
        else:
            raise ValueError(f"Unknown dataset: {cfg.dataset}")
    train_loader, val_loader, test_loader = loaders
    if cfg.device_augment and hasattr(train_loader, "raw"):
        # Augmentation AND normalization move inside the jitted step
        # (data/augment.py); the host only gathers uint8 batches.
        train_loader.augment = False
        train_loader.raw = True

    hidden_size = 256 if cfg.wider_layers else 128
    atq_model = ATQImageClassifier(
        num_classes=10, input_channels=1, use_rpb=cfg.use_rpb,
        sparsity_target=cfg.sparsity, hidden_size=hidden_size,
        grad_mode=cfg.grad_mode,
    )
    base_model = BaselineCNNClassifier(hidden_size=hidden_size)

    rng = jax.random.PRNGKey(cfg.seed)
    sample = jnp.zeros((2, 28, 28, 1), jnp.float32)
    atq_vars = atq_model.init(rng, sample)
    base_vars = base_model.init(jax.random.fold_in(rng, 1), sample)

    steps_per_epoch = len(train_loader)
    atq_tx = make_optimizer(
        cfg, steps_per_epoch, weight_decay=1e-4,
        decay_mask=ternary_latent_decay_mask(
            atq_vars["params"], atq_vars.get("quant", {}), cfg.grad_mode),
    )
    base_tx = make_optimizer(cfg, steps_per_epoch, clip=False)

    mesh = make_mesh(dp=cfg.dp, tp=cfg.tp)
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
    def _place_state(s):
        if cfg.fsdp:
            from atq_tpu.parallel.mesh import shard_state_fsdp

            return shard_state_fsdp(
                s, mesh, tp=cfg.tp,
                layer_names=("classifier_0", "classifier_3"),
                param_keys=("atq_params", "quant", "base_params"),
            )
        if cfg.tp > 1:
            from atq_tpu.parallel.mesh import shard_state_tp

            return shard_state_tp(
                s, mesh, cfg.tp,
                layer_names=("classifier_0", "classifier_3"),
                param_keys=("atq_params", "quant", "base_params"),
            )
        return replicate(s, mesh)

    def _place_quant(tree):
        if cfg.fsdp:
            from atq_tpu.parallel.mesh import shard_state_fsdp

            return shard_state_fsdp(
                {"quant": tree}, mesh, tp=cfg.tp,
                layer_names=("classifier_0", "classifier_3"),
                param_keys=("quant",),
            )["quant"]
        if cfg.tp > 1:
            from atq_tpu.parallel.mesh import shard_tree_tp

            return shard_tree_tp(
                tree, mesh, cfg.tp,
                layer_names=("classifier_0", "classifier_3"))[0]
        return replicate(tree, mesh)

    state = _place_state(state)

    train_step = jax.jit(
        build_train_step(atq_model, base_model, atq_tx, base_tx, cfg),
        donate_argnums=(0,),
    )
    atq_eval = build_eval_step(atq_model, "atq_params",
                               "atq_batch_stats")  # already jitted
    base_eval = build_eval_step(base_model, "base_params",
                                "base_batch_stats")

    initial_sparsity, final_sparsity = 0.05, cfg.sparsity
    best_val_acc = 0.0
    results = {
        "train_accuracies": [], "val_accuracies": [],
        "sparsity_schedule": [], "imgs_per_sec": [],
    }
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    best_params = None

    from atq_tpu.train.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    orbax_dir = os.path.join(cfg.checkpoint_dir,
                             f"orbax_{cfg.dataset}")
    start_epoch = 0
    if cfg.resume:
        try:
            host_state, start_epoch = restore_train_state(
                orbax_dir, jax.device_get(state)
            )
            # Re-shard on restore — blanket replicate would silently drop
            # the TP placement established at init.
            state = _place_state(host_state)
            if verbose:
                print(f"Resumed from {orbax_dir} at epoch {start_epoch}")
        except FileNotFoundError:
            if verbose:
                print("No checkpoint to resume from; starting fresh")

    if cfg.profile_dir:
        jax.profiler.start_trace(cfg.profile_dir)

    from atq_tpu.utils.tb import MetricsWriter

    tb = MetricsWriter(cfg.tensorboard_dir)
    step_rng = jax.random.PRNGKey(cfg.seed + 17)
    for epoch in range(start_epoch, cfg.epochs):
        current_sparsity = initial_sparsity + (
            final_sparsity - initial_sparsity
        ) * min(1.0, epoch / (cfg.epochs * 0.7))
        results["sparsity_schedule"].append(current_sparsity)
        l1_weight = cfg.l1_factor * min(1.0, epoch / (cfg.epochs * 0.5))

        if cfg.use_rpb:
            state["quant"] = _set_all_sparsity(
                jax.device_get(state["quant"]), current_sparsity
            )
            # Placement-preserving re-upload (replicate here would drop
            # the TP/FSDP sharding of the precision masks each epoch).
            state["quant"] = _place_quant(state["quant"])

        t0 = time.time()
        n_batches = 0
        metric_acc = None
        from atq_tpu.data.prefetch import PrefetchLoader

        # Epoch-constant scalars go to the device ONCE per epoch; passing
        # the Python floats straight into the jitted step would commit a
        # fresh scalar array (a host->device transfer) on every batch.
        sparsity_dev = jnp.float32(current_sparsity)
        l1_dev = jnp.float32(l1_weight)
        for batch in PrefetchLoader(train_loader):
            batch = shard_batch(batch, mesh)
            state, metrics = train_step(
                state, batch, sparsity_dev, l1_dev, step_rng
            )
            n_batches += 1
            # Accumulate on-device; a per-batch device_get would force a
            # host sync every step and serialize the pipeline.
            metric_acc = (metrics if metric_acc is None else
                          jax.tree_util.tree_map(jnp.add, metric_acc,
                                                 metrics))
        jax.block_until_ready(state["atq_params"])
        m = jax.device_get(metric_acc)
        totals = {"atq_correct": int(m["atq_correct"]),
                  "base_correct": int(m["base_correct"]),
                  "count": int(m["count"]), "loss": float(m["loss"])}
        epoch_time = time.time() - t0
        imgs_per_sec = totals["count"] / max(epoch_time, 1e-9)
        results["imgs_per_sec"].append(imgs_per_sec)

        train_acc = 100.0 * totals["atq_correct"] / max(1, totals["count"])
        base_acc = 100.0 * totals["base_correct"] / max(1, totals["count"])
        results["train_accuracies"].append(train_acc)

        val_acc, _ = _run_eval(atq_eval, state, val_loader)
        results["val_accuracies"].append(val_acc)
        tb.scalars(epoch + 1, {
            "train_acc": train_acc, "base_acc": base_acc,
            "val_acc": val_acc,
            "loss": totals["loss"] / max(1, n_batches),
            "sparsity": current_sparsity,
            "imgs_per_sec": imgs_per_sec,
        }, prefix="classifier/")
        tb.flush()
        if verbose:
            print(f"Epoch {epoch + 1}/{cfg.epochs} | ATQ {train_acc:.1f}% | "
                  f"Base {base_acc:.1f}% | "
                  f"Loss {totals['loss'] / max(1, n_batches):.3f} | "
                  f"Val {val_acc:.1f}% | Sparsity {current_sparsity:.2f} | "
                  f"{imgs_per_sec:.0f} imgs/s | {epoch_time:.1f}s")

        # Ternary weight-distribution report every 5 epochs (train.py:273-295)
        if cfg.use_rpb and (epoch + 1) % 5 == 0 and verbose:
            params = jax.device_get(state["atq_params"])
            quant = jax.device_get(state["quant"])
            layer_p = params["classifier_0"]
            layer_q = quant["classifier_0"]
            w_t, _ = adaptive_ternary_quantization(
                layer_p["weight"], alpha=layer_p["alpha"],
                sparsity_target=layer_q["sparsity_target"],
            )
            total = w_t.size
            print("Weight distribution: "
                  f"-1: {100 * float(jnp.sum(w_t == -1)) / total:.1f}% | "
                  f"0: {100 * float(jnp.sum(w_t == 0)) / total:.1f}% | "
                  f"+1: {100 * float(jnp.sum(w_t == 1)) / total:.1f}%")

        if cfg.profile_dir and epoch == start_epoch:
            jax.profiler.stop_trace()

        if (epoch + 1) % cfg.orbax_freq == 0 or (epoch + 1) == cfg.epochs:
            save_train_state(orbax_dir, epoch + 1, state)

        if val_acc > best_val_acc:
            best_val_acc = val_acc
            best_params = jax.device_get(
                {"params": state["atq_params"], "quant": state["quant"],
                 "batch_stats": state["atq_batch_stats"]}
            )
            _save_checkpoint(best_params, os.path.join(
                cfg.checkpoint_dir, f"atq_model_{cfg.dataset}.npz"
            ))
            if verbose:
                print(f"Model saved with accuracy: {best_val_acc:.1f}%")

    test_acc, _ = _run_eval(atq_eval, state, test_loader)
    base_test_acc, _ = _run_eval(base_eval, state, test_loader)
    results.update({
        "test_acc": test_acc,
        "baseline_test_acc": base_test_acc,
        "best_val_acc": best_val_acc,
        "mean_imgs_per_sec": float(np.mean(results["imgs_per_sec"][1:])
                                   if len(results["imgs_per_sec"]) > 1
                                   else results["imgs_per_sec"][0]),
    })
    if verbose:
        print(f"ATQ Test Accuracy: {test_acc:.1f}%")
        print(f"Baseline Test Accuracy: {base_test_acc:.1f}%")

    # Efficiency comparison (reference train.py:356-370).
    from atq_tpu.utils.metrics import (
        count_parameters,
        measure_inference_time,
        measure_model_memory,
    )

    one = jnp.ones((1, 28, 28, 1), jnp.float32)
    atq_infer = jax.jit(lambda s, x: atq_model.apply(
        {"params": s["atq_params"], "quant": s.get("quant", {}),
         "batch_stats": s["atq_batch_stats"]}, x, train=False))
    base_infer = jax.jit(lambda s, x: base_model.apply(
        {"params": s["base_params"],
         "batch_stats": s["base_batch_stats"]}, x, train=False))
    atq_time = measure_inference_time(lambda x: atq_infer(state, x), one)
    base_time = measure_inference_time(lambda x: base_infer(state, x), one)
    atq_params_n = count_parameters(jax.device_get(state["atq_params"]))
    base_params_n = count_parameters(jax.device_get(state["base_params"]))
    atq_mem = measure_model_memory(jax.device_get(state["atq_params"]))
    base_mem = measure_model_memory(jax.device_get(state["base_params"]))
    results.update({
        "atq_inference_ms": atq_time, "baseline_inference_ms": base_time,
        "atq_params": atq_params_n, "baseline_params": base_params_n,
        "atq_memory_mb": atq_mem, "baseline_memory_mb": base_mem,
    })
    if verbose:
        print("\nEfficiency Comparison:")
        print(f"ATQ Model: {atq_params_n:,} params | {atq_mem:.2f} MB | "
              f"{atq_time:.2f} ms | {test_acc:.1f}%")
        print(f"Baseline: {base_params_n:,} params | {base_mem:.2f} MB | "
              f"{base_time:.2f} ms | {base_test_acc:.1f}%")
        print(f"Ratios: Params {base_params_n / max(1, atq_params_n):.2f}x"
              f" | Memory {base_mem / max(1e-9, atq_mem):.2f}x | "
              f"Speed {base_time / max(1e-9, atq_time):.2f}x | "
              f"Acc Delta {test_acc - base_test_acc:.1f}%")
    from atq_tpu.train.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()  # async Orbax saves must commit before exit
    tb.close()
    return state, results


def _save_checkpoint(tree, path: str):
    """Flat .npz checkpoint. Dict keys become '/'-joined paths; arbitrary
    pytree nodes (optax namedtuples, tuples) are handled via jax key paths."""
    flat = {}
    for key_path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if leaf is None:
            continue
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in key_path
        )
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)


def load_checkpoint(path: str, template=None):
    """Load a .npz checkpoint.

    Without a template, rebuilds a nested dict keyed by path segments
    (enough for params / quant / batch_stats). With a template pytree
    (e.g. ``tx.init(params)``), restores the exact structure by matching
    key paths — use this to resume optimizer state.
    """
    data = np.load(path)
    if template is not None:
        by_path = {}
        for key_path, _leaf in jax.tree_util.tree_leaves_with_path(template):
            name = "/".join(
                str(getattr(p, "key",
                            getattr(p, "idx", getattr(p, "name", p))))
                for p in key_path
            )
            by_path[name] = None
        leaves = []
        for key_path, leaf in jax.tree_util.tree_leaves_with_path(template):
            name = "/".join(
                str(getattr(p, "key",
                            getattr(p, "idx", getattr(p, "name", p))))
                for p in key_path
            )
            leaves.append(jnp.asarray(data[name])
                          if name in data.files else leaf)
        treedef = jax.tree_util.tree_structure(template)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    tree: dict = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return tree
