"""N-step training-trajectory equivalence vs the actual PyTorch reference.

The strongest end-to-end parity evidence producible on a zero-egress box:
identical init (reference torch model imported via utils/torch_interop),
identical synthetic batches, the reference's own training-loop semantics
(/root/reference/train.py:130-227, executed here on torch-CPU with the
reference's imported modules as the oracle) stepped side by side with this
framework's single jitted co-trained step (atq_tpu/train/classifier.py),
asserting per-step loss trajectories agree within float tolerance.

Dropout is zeroed on both sides (torch masks and JAX masks can't match);
everything else — co-trained FP teacher, KD (T=4, 0.7/0.3), L1 incl. the
reference's BN-scales-included quirk, grad clipping, Adam + weight decay,
epoch-0 sparsity 0.05 — runs exactly as the reference loop does.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

N_STEPS = 20
BATCH = 32
LR = 1e-3
HIDDEN = 128
SPARSITY_EPOCH0 = 0.05  # train.py:137: 0.05 + Δ·min(1, 0/(0.7E))


def _make_batches(seed=0, n=N_STEPS):
    rng = np.random.RandomState(seed)
    return [
        (rng.randn(BATCH, 1, 28, 28).astype(np.float32),
         rng.randint(0, 10, size=BATCH).astype(np.int64))
        for _ in range(n)
    ]


def _zero_dropout(module):
    for m in module.modules():
        if isinstance(m, tnn.Dropout):
            m.p = 0.0


def _build_reference_models(use_rpb):
    """Reference ATQ model + the co-trained FP baseline
    (train.py:29-59), torch-CPU."""
    import importlib.util

    # Load the module file directly — the reference models/__init__.py
    # imports torchvision (absent here) transitively.
    sys.path.insert(0, "/root/reference")
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_image_classifier_traj",
            "/root/reference/models/image_classifier.py",
        )
        ref_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_mod)
        TorchATQ = ref_mod.ATQImageClassifier
    finally:
        sys.path.remove("/root/reference")
    torch.manual_seed(0)
    model = TorchATQ(num_classes=10, input_channels=1, use_rpb=use_rpb,
                     sparsity_target=0.3, hidden_size=HIDDEN)
    baseline = tnn.Sequential(
        tnn.Conv2d(1, 32, kernel_size=3, stride=1, padding=1),
        tnn.BatchNorm2d(32), tnn.ReLU(),
        tnn.MaxPool2d(kernel_size=2, stride=2),
        tnn.Conv2d(32, 64, kernel_size=3, stride=1, padding=1),
        tnn.BatchNorm2d(64), tnn.ReLU(),
        tnn.MaxPool2d(kernel_size=2, stride=2),
        tnn.Flatten(),
        tnn.Linear(64 * 7 * 7, HIDDEN), tnn.ReLU(), tnn.Dropout(0.3),
        tnn.Linear(HIDDEN, 10),
    )
    _zero_dropout(model)
    _zero_dropout(baseline)
    return model, baseline


def _torch_step(model, baseline, opt, bopt, images, labels, *,
                distill, l1_weight, clip):
    """One iteration of the reference loop, train.py:158-217."""
    criterion = tnn.CrossEntropyLoss()
    images = torch.from_numpy(images)
    labels = torch.from_numpy(labels)

    bopt.zero_grad()
    baseline_outputs = baseline(images)
    baseline_loss = criterion(baseline_outputs, labels)
    baseline_loss.backward()
    bopt.step()

    loss = _torch_atq_step(model, opt, images, labels, baseline_outputs,
                           distill=distill, l1_weight=l1_weight, clip=clip)
    return loss, float(baseline_loss.item()), baseline_outputs.detach()


def _torch_atq_step(model, opt, images, labels, baseline_outputs, *,
                    distill, l1_weight, clip):
    """The ATQ half of the reference iteration (train.py:168-217),
    reusable against recorded teacher logits for the perturbed run."""
    criterion = tnn.CrossEntropyLoss()
    opt.zero_grad()
    atq_outputs = model(images)
    loss = criterion(atq_outputs, labels)
    if distill:  # train.py:174-192
        temperature = 4.0
        with torch.no_grad():
            teacher_logits = baseline_outputs / temperature
        student_logits = atq_outputs / temperature
        distill_loss = tnn.KLDivLoss(reduction="batchmean")(
            tF.log_softmax(student_logits, dim=1),
            tF.softmax(teacher_logits, dim=1),
        ) * (temperature ** 2)
        loss = 0.7 * loss + 0.3 * distill_loss
    if l1_weight:  # train.py:194-203
        l1_reg = 0
        for name, param in model.named_parameters():
            if "weight" in name and "bn" not in name:
                l1_reg = l1_reg + torch.sum(torch.abs(param))
        loss = loss + l1_weight * l1_reg
    loss.backward()
    if clip:
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
    opt.step()
    return float(loss.item())


def _import_baseline_params(baseline):
    """Map the reference baseline Sequential's state_dict onto
    models.image_classifier.BaselineCNNClassifier's tree (NHWC)."""
    from atq_tpu.utils.torch_interop import _chw_to_hwc_columns

    # .copy(): see the aliasing note in test_classifier_trajectory_parity.
    sd = {k: v.detach().numpy().copy()
          for k, v in baseline.state_dict().items()}
    params = {
        "features": {
            "conv1": {"kernel": sd["0.weight"].transpose(2, 3, 1, 0),
                      "bias": sd["0.bias"]},
            "bn1": {"scale": sd["1.weight"], "bias": sd["1.bias"]},
            "conv2": {"kernel": sd["4.weight"].transpose(2, 3, 1, 0),
                      "bias": sd["4.bias"]},
            "bn2": {"scale": sd["5.weight"], "bias": sd["5.bias"]},
        },
        "fc1": {"kernel": _chw_to_hwc_columns(sd["9.weight"], 64, 7, 7).T,
                "bias": sd["9.bias"]},
        "fc2": {"kernel": sd["12.weight"].T, "bias": sd["12.bias"]},
    }
    stats = {
        "features": {
            "bn1": {"mean": sd["1.running_mean"],
                    "var": sd["1.running_var"]},
            "bn2": {"mean": sd["5.running_mean"],
                    "var": sd["5.running_var"]},
        }
    }
    to_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return to_jnp(params), to_jnp(stats)


def _perturbed_copy(model, eps=1e-6, seed=123):
    """Deep copy with every parameter nudged by eps·|p| — measures the
    reference's own trajectory sensitivity to float-level noise. The ATQ
    head's logits are O(1000) at init (alpha starts at 1.0 on ±1 ternary
    weights, reference atq/layers.py:27-33), so CE is saturated and the
    loss trajectory is chaotic; the achievable cross-framework tolerance
    is the oracle's own perturbation envelope, not a fixed epsilon."""
    import copy

    clone = copy.deepcopy(model)
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in clone.parameters():
            noise = torch.randint(0, 2, p.shape, generator=g,
                                  dtype=torch.float32) * 2.0 - 1.0
            p.add_(eps * p.abs() * noise)
    return clone


@pytest.mark.slow
@pytest.mark.parametrize(
    "use_rpb,distill,use_l1,clip,cosine",
    [
        # the README recipe shape (readme.md:110)
        (True, True, True, False, False),
        (True, False, False, True, False),
        # frozen-ternary TernaryLinear path
        (False, False, False, False, False),
        # per-step warmup-cosine LR (train.py:77-106, stepped per batch)
        (True, False, False, False, True),
    ],
)
def test_classifier_trajectory_parity(use_rpb, distill, use_l1, clip,
                                      cosine):
    from atq_tpu.models.image_classifier import (
        ATQImageClassifier,
        BaselineCNNClassifier,
    )
    from atq_tpu.train.classifier import (
        ClassifierConfig,
        _set_all_sparsity,
        build_train_step,
        make_optimizer,
        ternary_latent_decay_mask,
    )
    from atq_tpu.utils.torch_interop import import_classifier_state_dict

    l1_weight = 2e-5 if use_l1 else 0.0  # fixed, exercised from step 0

    # --- reference (torch-CPU) ---
    t_model, t_base = _build_reference_models(use_rpb)
    for m in t_model.modules():  # train.py:146-149, epoch 0
        if hasattr(m, "sparsity_target"):
            m.sparsity_target = SPARSITY_EPOCH0
    t_opt = torch.optim.Adam(t_model.parameters(), lr=LR,
                             weight_decay=1e-4)  # train.py:66-75
    t_bopt = torch.optim.Adam(t_base.parameters(), lr=LR)
    # Sensitivity oracle: same reference loop from an eps-perturbed init.
    p_model = _perturbed_copy(t_model)
    p_opt = torch.optim.Adam(p_model.parameters(), lr=LR,
                             weight_decay=1e-4)

    STEPS_PER_EPOCH = 10  # schedule bookkeeping; 20 steps = warmup region
    scheds = []
    if cosine:  # train.py:77-106: LambdaLR stepped per batch
        import math as _math

        total_steps = STEPS_PER_EPOCH * 20
        warmup_steps = total_steps // 10

        def lr_lambda(step):
            if step < warmup_steps:
                return float(step) / float(max(1, warmup_steps))
            progress = float(step - warmup_steps) / float(
                max(1, total_steps - warmup_steps))
            return max(0.1, 0.5 * (1.0 + _math.cos(_math.pi * progress)))

        scheds = [torch.optim.lr_scheduler.LambdaLR(o, lr_lambda)
                  for o in (t_opt, t_bopt, p_opt)]

    # --- this framework, identical init via interop ---
    # .copy() is load-bearing: .numpy() shares storage with the live torch
    # params, and jnp.asarray on CPU can alias that buffer zero-copy — the
    # torch optimizer's in-place step() would then mutate OUR params.
    sd = {k: v.detach().numpy().copy()
          for k, v in t_model.state_dict().items()}
    params, quant, stats = import_classifier_state_dict(
        sd, use_rpb=use_rpb, hidden_size=HIDDEN)
    quant = _set_all_sparsity(quant, SPARSITY_EPOCH0)
    base_params, base_stats = _import_baseline_params(t_base)

    cfg = ClassifierConfig(
        use_rpb=use_rpb, distill=distill, use_l1=use_l1, clip_grad=clip,
        epochs=20, learning_rate=LR, device_augment=False,
        use_cosine_lr=cosine,
    )
    atq_model = ATQImageClassifier(
        num_classes=10, input_channels=1, use_rpb=use_rpb,
        sparsity_target=0.3, hidden_size=HIDDEN, dropout_rate=0.0)
    base_model = BaselineCNNClassifier(hidden_size=HIDDEN, dropout_rate=0.0)
    atq_tx = make_optimizer(
        cfg, steps_per_epoch=STEPS_PER_EPOCH, weight_decay=1e-4,
        decay_mask=ternary_latent_decay_mask(params, quant, "parity"))
    base_tx = make_optimizer(cfg, steps_per_epoch=STEPS_PER_EPOCH,
                             clip=False)

    state = {
        "atq_params": params,
        "quant": quant,
        "atq_batch_stats": stats,
        "atq_opt_state": atq_tx.init(params),
        "base_params": base_params,
        "base_batch_stats": base_stats,
        "base_opt_state": base_tx.init(base_params),
        "step": jnp.asarray(0, jnp.int32),
    }
    train_step = jax.jit(
        build_train_step(atq_model, base_model, atq_tx, base_tx, cfg))
    rng = jax.random.PRNGKey(0)  # dropout rate is 0; rng is inert
    l1_dev = jnp.float32(l1_weight)
    sparsity_dev = jnp.float32(SPARSITY_EPOCH0)

    torch_losses, torch_base_losses, pert_losses = [], [], []
    jax_losses, jax_base_losses = [], []
    for images, labels in _make_batches():
        tl, tb, teacher_logits = _torch_step(
            t_model, t_base, t_opt, t_bopt, images, labels,
            distill=distill, l1_weight=l1_weight, clip=clip)
        torch_losses.append(tl)
        torch_base_losses.append(tb)
        pert_losses.append(_torch_atq_step(
            p_model, p_opt, torch.from_numpy(images),
            torch.from_numpy(labels), teacher_logits,
            distill=distill, l1_weight=l1_weight, clip=clip))
        for sched in scheds:  # per-step LR update (train.py:214-217)
            sched.step()
        batch = (jnp.asarray(images.transpose(0, 2, 3, 1)),
                 jnp.asarray(labels.astype(np.int32)))
        state, metrics = train_step(state, batch, sparsity_dev, l1_dev, rng)
        m = jax.device_get(metrics)
        jax_losses.append(float(m["loss"]))
        jax_base_losses.append(float(m["base_loss"]))

    torch_losses = np.asarray(torch_losses)
    jax_losses = np.asarray(jax_losses)
    torch_base = np.asarray(torch_base_losses)
    jax_base = np.asarray(jax_base_losses)
    pert_losses = np.asarray(pert_losses)

    scale = np.maximum(np.abs(torch_losses), 1.0)
    delta = np.abs(jax_losses - torch_losses)
    # Step 0 has seen no drift: the forwards run on identical weights, so
    # only fp32 reassociation separates them. Tight absolute bar.
    assert delta[0] / scale[0] < 5e-5, (
        f"step-0 loss mismatch: {jax_losses[0]} vs {torch_losses[0]}")
    # Later steps: the ATQ head's saturated CE makes the trajectory
    # chaotic, so the achievable tolerance is the reference's OWN
    # sensitivity to an eps-perturbed init (growing envelope), plus a
    # 1e-3·|loss| floor — unlike the one-shot init perturbation, the
    # torch-vs-XLA fp32 reassociation noise re-injects at EVERY step, so
    # early steps can exceed the (still-tiny) envelope before it grows.
    envelope = np.maximum.accumulate(np.abs(pert_losses - torch_losses))
    budget = 10.0 * np.maximum(envelope, 1e-6 * scale) + 1e-3 * scale
    assert (delta <= budget).all(), (
        f"trajectory outside the reference's perturbation envelope:\n"
        f"delta={delta}\nbudget={budget}")
    # The FP baseline's CE is unsaturated — it must track tightly.
    rel_base = np.abs(jax_base - torch_base) / np.maximum(
        np.abs(torch_base), 1.0)
    assert rel_base.max() < 2e-3, (
        f"baseline trajectory diverged: per-step rel deltas {rel_base}")
    # and the trajectories must actually be *trajectories* — training moved.
    assert torch_losses[-1] != torch_losses[0]


# ---------------------------------------------------------------------------
# Retrieval workload trajectory parity (train_multimodal.py:432-619)
# ---------------------------------------------------------------------------


def _install_torchvision_stub():
    """Minimal torchvision.models stub: a standard torch ResNet-18 (He et
    al. 2015) with torchvision's child ordering, random-init. IMAGENET
    weights are unavailable on this zero-egress box and irrelevant here:
    trajectory EQUIVALENCE compares two frameworks from the SAME imported
    init, whatever that init is. Installed into sys.modules so the
    reference's ``import torchvision.models`` (multimodal_classifier.py:10)
    resolves."""
    import types

    if "torchvision" in sys.modules:
        return
    n = tnn

    class _BasicBlock(n.Module):
        def __init__(self, cin, cout, stride=1, downsample=None):
            super().__init__()
            self.conv1 = n.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = n.BatchNorm2d(cout)
            self.relu = n.ReLU(inplace=True)
            self.conv2 = n.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = n.BatchNorm2d(cout)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class _ResNet(n.Module):
        def __init__(self, layers, width=64):
            super().__init__()
            self._inplanes = width
            self.conv1 = n.Conv2d(3, width, 7, 2, 3, bias=False)
            self.bn1 = n.BatchNorm2d(width)
            self.relu = n.ReLU(inplace=True)
            self.maxpool = n.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(width, layers[0], 1)
            self.layer2 = self._make_layer(width * 2, layers[1], 2)
            self.layer3 = self._make_layer(width * 4, layers[2], 2)
            self.layer4 = self._make_layer(width * 8, layers[3], 2)
            self.avgpool = n.AdaptiveAvgPool2d((1, 1))
            self.fc = n.Linear(width * 8, 1000)

        def _make_layer(self, planes, blocks, stride):
            downsample = None
            if stride != 1 or self._inplanes != planes:
                downsample = n.Sequential(
                    n.Conv2d(self._inplanes, planes, 1, stride, bias=False),
                    n.BatchNorm2d(planes))
            layers = [_BasicBlock(self._inplanes, planes, stride,
                                  downsample)]
            self._inplanes = planes
            for _ in range(1, blocks):
                layers.append(_BasicBlock(planes, planes))
            return n.Sequential(*layers)

        def forward(self, x):  # unused (reference strips the FC)
            raise NotImplementedError

    stub = types.ModuleType("torchvision")
    models_mod = types.ModuleType("torchvision.models")

    class _Weights:  # accepted and ignored — no network on this box
        IMAGENET1K_V1 = "IMAGENET1K_V1"

    models_mod.ResNet18_Weights = _Weights
    models_mod.ResNet50_Weights = _Weights
    models_mod.resnet18 = lambda weights=None: _ResNet([2, 2, 2, 2])
    stub.models = models_mod
    sys.modules["torchvision"] = stub
    sys.modules["torchvision.models"] = models_mod


@pytest.fixture(scope="module")
def ref_retrieval_stack():
    """The reference retrieval model + losses, imported as a package (the
    relative imports in models/multimodal_classifier.py need package
    context) with torchvision stubbed."""
    _install_torchvision_stub()
    sys.path.insert(0, "/root/reference")
    added = []
    try:
        import models.multimodal_classifier as mc
        import utils.enhanced_contrastive as ec

        added = [m for m in sys.modules
                 if m.split(".")[0] in ("models", "utils", "atq")]
        yield mc, ec
    finally:
        sys.path.remove("/root/reference")
        for m in list(sys.modules):
            if m.split(".")[0] in ("models", "utils", "atq",
                                   "torchvision"):
                del sys.modules[m]


@pytest.mark.slow
@pytest.mark.parametrize("gradual_quant,use_ema", [
    (False, False),          # the core loop (round-3 coverage)
    (True, False),           # --gradual_quant scheduler push per epoch
    (False, True),           # --use_ema shadow-weight update per step
])
def test_retrieval_trajectory_parity(ref_retrieval_stack, gradual_quant,
                                     use_ema):
    """15-step / 3-epoch loss-trajectory equivalence for the retrieval
    workload: the reference loop (train_multimodal.py:432-619 —
    curriculum-weighted hard-negative InfoNCE, AdamW b2=0.98, per-step
    warmup-cosine LR) on torch-CPU vs this framework's jitted step, from
    identical imported init and identical synthetic batches, dropout
    zeroed both sides. Parametrized over the scheduler and EMA branches
    (VERDICT r3 next-step #7): with ``gradual_quant`` both sides push
    their GradualQuantizationScheduler at every epoch boundary
    (train_multimodal.py:441-446), and with ``use_ema`` both maintain the
    decay-0.999 shadow weights (:419-428, :587-589) — compared leaf by
    leaf at the end, since EMA never feeds back into training."""
    mc, ec = ref_retrieval_stack

    from atq_tpu.losses.contrastive import (
        ContrastiveLearningManager,
        HardNegativeMiningInfoNCE,
    )
    from atq_tpu.models.retrieval import ATQMultimodalRetrieval
    from atq_tpu.train.retrieval import (
        RetrievalConfig,
        build_retrieval_train_step,
        make_retrieval_optimizer,
        retrieval_sparsity_plan,
    )
    from atq_tpu.utils.torch_interop import import_retrieval_state_dict

    B, V, D, H, L, IMG = 8, 80, 48, 96, 14, 64
    EPOCHS, LR_, STEPS_PER_EPOCH = 3, 5e-5, 5  # 15 steps total

    torch.manual_seed(0)
    t_model = mc.ATQMultimodalRetrieval(
        vocab_size=V, embed_dim=D, hidden_dim=H, use_residual=True)
    _zero_dropout(t_model)
    t_model.train()
    t_opt = torch.optim.AdamW(t_model.parameters(), lr=LR_,
                              weight_decay=1e-4, betas=(0.9, 0.98))
    total_steps = EPOCHS * STEPS_PER_EPOCH
    warmup_steps = int(total_steps * 0.1)
    import math as _math

    def lr_lambda(step):  # train_multimodal.py:394-403
        if step < warmup_steps:
            return float(step) / float(max(1, warmup_steps))
        progress = float(step - warmup_steps) / float(
            max(1, total_steps - warmup_steps))
        return max(0.05, 0.5 * (1.0 + _math.cos(_math.pi * progress)))

    t_sched = torch.optim.lr_scheduler.LambdaLR(t_opt, lr_lambda)
    t_crit = ec.HardNegativeMiningInfoNCE(
        temperature=0.07, lambda_reg=0.02, hard_negative_weight=0.5,
        temperature_schedule=True)
    t_mgr = ec.ContrastiveLearningManager(
        model=t_model, criterion=t_crit, similarity_threshold=0.7)

    t_quant_sched = None
    if gradual_quant:  # train_multimodal.py:349-357
        import atq.mixed_precision_atq as rmpa

        t_quant_sched = rmpa.GradualQuantizationScheduler(
            t_model, EPOCHS, vision_sparsity=0.3, text_sparsity=0.2,
            warmup_epochs=1)

    t_ema_model = None
    if use_ema:  # train_multimodal.py:419-428
        import copy as _copy

        t_ema_model = _copy.deepcopy(t_model)

    def _update_ema(model, ema_model, decay=0.999):
        # train_multimodal.py:424-428
        with torch.no_grad():
            for param, ema_param in zip(model.parameters(),
                                        ema_model.parameters()):
                ema_param.data.mul_(decay).add_(param.data,
                                                alpha=1 - decay)

    # --- ours, identical init ---
    sd = {k: v.detach().numpy().copy()
          for k, v in t_model.state_dict().items()}
    params, quant, constants, stats = import_retrieval_state_dict(
        sd, vision_sparsity=0.3, text_sparsity=0.2)
    model = ATQMultimodalRetrieval(
        vocab_size=V, embed_dim=D, hidden_dim=H, use_residual=True,
        max_seq_length=50, dropout=0.0)
    cfg = RetrievalConfig(
        epochs=EPOCHS, learning_rate=LR_, weight_decay=1e-4,
        optimizer="adamw", use_residual=True, embed_dim=D, hidden_dim=H,
        modality_dropout=0.0, contrastive_reg=0.02, batch_size=B,
        gradual_quant=gradual_quant, use_ema=use_ema,
        warmup_epochs=1, vision_sparsity=0.3, text_sparsity=0.2)
    tx = make_retrieval_optimizer(cfg, STEPS_PER_EPOCH)
    criterion = HardNegativeMiningInfoNCE(
        temperature=0.07, lambda_reg=0.02, hard_negative_weight=0.5,
        temperature_schedule=True)
    cl_manager = ContrastiveLearningManager(
        criterion=criterion, similarity_threshold=0.7)

    j_quant_sched, sparsity_plan = None, None
    if gradual_quant:
        from atq_tpu.core.schedules import GradualQuantizationScheduler

        j_quant_sched = GradualQuantizationScheduler(
            total_epochs=EPOCHS, vision_sparsity=0.3, text_sparsity=0.2,
            warmup_epochs=1)
        sparsity_plan = retrieval_sparsity_plan(cfg)

    state = {
        "params": params, "quant": quant, "constants": constants,
        "batch_stats": stats, "opt_state": tx.init(params),
        "step": jnp.asarray(0, jnp.int32),
    }
    if use_ema:
        state["ema_params"] = jax.tree_util.tree_map(jnp.copy, params)
    train_step = jax.jit(
        build_retrieval_train_step(model, tx, criterion, cl_manager, cfg))
    rng = jax.random.PRNGKey(0)  # dropout is 0; rng is inert

    rng_np = np.random.RandomState(7)
    t_losses, j_losses = [], []
    for epoch in range(EPOCHS):
        # epoch-boundary updates, both sides (train_multimodal.py:437-446)
        t_crit.set_epoch(epoch, EPOCHS)
        t_mgr.set_epoch(epoch, EPOCHS)
        criterion.set_epoch(epoch, EPOCHS)
        cl_manager.set_epoch(epoch, EPOCHS)
        temperature = jnp.float32(criterion.get_current_temperature())
        curriculum = jnp.int32(cl_manager.curriculum_kind())
        if gradual_quant:
            t_quant_sched.step(epoch)
            quant_host = jax.device_get(state["quant"])
            state["quant"] = jax.tree_util.tree_map(
                jnp.asarray,
                j_quant_sched.step(quant_host, epoch, sparsity_plan))

        for _ in range(STEPS_PER_EPOCH):
            images = rng_np.randn(B, 3, IMG, IMG).astype(np.float32)
            captions = rng_np.randint(1, V, size=(B, L)).astype(np.int64)
            lengths = rng_np.randint(3, L + 1, size=(B,)).astype(np.int64)

            # reference iteration (train_multimodal.py:542-609, no-AMP)
            t_opt.zero_grad()
            img_emb, txt_emb = t_model(
                torch.from_numpy(images), torch.from_numpy(captions),
                torch.from_numpy(lengths), return_embeddings=True)
            loss = t_mgr.compute_loss(img_emb, txt_emb)
            loss.backward()
            t_opt.step()
            t_sched.step()
            if use_ema:
                _update_ema(t_model, t_ema_model)
            t_losses.append(float(loss.item()))

            batch = (jnp.asarray(images.transpose(0, 2, 3, 1)),
                     jnp.asarray(captions.astype(np.int32)),
                     jnp.asarray(lengths.astype(np.int32)))
            state, j_loss = train_step(state, batch, temperature,
                                       curriculum, rng)
            j_losses.append(float(j_loss))

    t_losses = np.asarray(t_losses)
    j_losses = np.asarray(j_losses)
    rel = np.abs(j_losses - t_losses) / np.maximum(np.abs(t_losses), 1.0)
    # The contrastive loss is O(1) and unsaturated (similarities are
    # L2-normalized), so there is no chaotic amplifier — but fp32
    # reassociation noise (ResNet18 + 4 transformer layers, Adam b2=0.98)
    # re-injects every step and compounds geometrically. The 15-step
    # schedule (warmup 1, cosine over 15) moves parameters faster per
    # step than round 3's 36-step schedule, so the measured drift is
    # ~3e-4 by step 3, ~1.3e-3 by step 5, ~5e-3 by step 15. Tiered bars:
    # tight early (proves the step is the same computation), bounded
    # late (proves no divergence beyond float drift). In the
    # gradual_quant case the epoch-2 sparsity push visibly jumps the
    # loss (~3.4 -> ~9.9); the late bar holding across that jump is the
    # schedule-parity evidence — a mismatched ternary pattern would
    # diverge by orders of magnitude, not 5e-3.
    assert rel[:4].max() < 1e-3, (
        f"retrieval trajectory diverged early:\n torch={t_losses}\n"
        f" jax={j_losses}\n rel={rel}")
    assert rel[:8].max() < 5e-3, (
        f"retrieval trajectory diverged mid-run:\n torch={t_losses}\n"
        f" jax={j_losses}\n rel={rel}")
    assert rel.max() < 3e-2, (
        f"retrieval trajectory diverged:\n torch={t_losses}\n"
        f" jax={j_losses}\n rel={rel}")
    assert t_losses[0] != t_losses[-1]  # training actually moved
    if gradual_quant:
        # The sparsity push must actually have happened (the final-epoch
        # plateau quantizes at full sparsity and lifts the loss).
        assert t_losses[-3:].mean() > 1.5 * t_losses[:3].mean()

    if use_ema:
        # The shadow weights are pure bookkeeping (never fed back), so
        # they must agree to float-drift tolerance leaf by leaf. Import
        # the torch EMA model's state through the same converter and
        # compare against our ema_params tree.
        ema_sd = {k: v.detach().numpy().copy()
                  for k, v in t_ema_model.state_dict().items()}
        t_ema_params, _, _, _ = import_retrieval_state_dict(
            ema_sd, vision_sparsity=0.3, text_sparsity=0.2)
        j_ema = jax.device_get(state["ema_params"])
        flat_t = jax.tree_util.tree_leaves_with_path(t_ema_params)
        flat_j = dict(jax.tree_util.tree_leaves_with_path(j_ema))
        assert len(flat_t) == len(flat_j)
        worst = 0.0
        for path, t_leaf in flat_t:
            j_leaf = np.asarray(flat_j[path])
            t_leaf = np.asarray(t_leaf)
            scale = np.maximum(np.abs(t_leaf), 1e-3)
            worst = max(worst, float(
                (np.abs(j_leaf - t_leaf) / scale).max()))
        assert worst < 5e-3, f"EMA params diverged: worst rel {worst}"
