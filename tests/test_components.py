"""Coverage for the secondary API surfaces: mixed-precision layers,
baseline retrieval model, text utilities, generic multimodal dataset,
metrics utilities, and LR schedules."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu.nn.mixed_precision import (

    EnhancedATQTransformerLayer,
    PrecisionControlledLinear,
)

pytestmark = pytest.mark.slow  # model-compile-heavy; excluded from the fast gate


def test_precision_controlled_linear():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 16).astype(np.float32))
    layer = PrecisionControlledLinear(features=8, importance=2.0,
                                      base_sparsity=0.3)
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    assert out.shape == (4, 8)
    # importance 2.0 -> sparsity max(0.1, 0.3/2) = 0.15
    sp = float(variables["quant"]["linear"]["sparsity_target"])
    assert abs(sp - 0.15) < 1e-6


def test_enhanced_transformer_layer():
    x = jnp.asarray(
        np.random.RandomState(1).randn(2, 6, 32).astype(np.float32)
    )
    layer = EnhancedATQTransformerLayer(embed_dim=32, num_heads=4,
                                        dim_feedforward=64, layer_idx=2,
                                        total_layers=4)
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    assert out.shape == x.shape


def test_baseline_retrieval_padding_invariance():
    from atq_tpu.models.baseline_retrieval import BaselineRetrievalModel

    m = BaselineRetrievalModel(vocab_size=50, embed_dim=16, hidden_dim=24)
    img = jnp.asarray(np.random.RandomState(2).randn(2, 32, 32, 3),
                      jnp.float32)
    txt = jnp.asarray(np.random.RandomState(3).randint(0, 50, (2, 10)))
    lengths = jnp.asarray([4, 10])
    v = m.init(jax.random.PRNGKey(0), img, txt, lengths)
    te = m.apply(v, img, txt, lengths, return_embeddings=True)[1]
    txt2 = txt.at[0, 5:].set(7)  # mutate padding only
    te2 = m.apply(v, img, txt2, lengths, return_embeddings=True)[1]
    np.testing.assert_allclose(np.asarray(te), np.asarray(te2), atol=1e-6)


def test_text_utils():
    from atq_tpu.data.text_utils import (
        build_vocabulary,
        clean_text,
        create_embedding_matrix,
        tokenize_texts,
    )

    texts = ["a dog runs fast", "a dog jumps", "the cat runs",
             "dog dog dog"]
    vocab = build_vocabulary(texts, min_freq=2)
    assert vocab["<PAD>"] == 0 and vocab["<UNK>"] == 1
    assert "dog" in vocab and "runs" in vocab
    assert "cat" not in vocab  # freq 1 < 2

    cleaned = clean_text("The dog, quickly, ran over 42 fences!")
    assert "42" not in cleaned and "," not in cleaned
    assert "the" not in cleaned.split()  # stopword removed

    ids, lengths = tokenize_texts(["a dog runs"], vocab, max_length=5)
    assert ids.shape == (1, 5)
    assert lengths == [3]
    assert ids[0, 1] == vocab["dog"]

    emb = create_embedding_matrix(vocab, embedding_dim=8)
    assert emb.shape == (len(vocab), 8)
    np.testing.assert_array_equal(emb[0], 0.0)  # PAD row zeroed


def test_multimodal_dataset(tmp_path):
    from PIL import Image

    from atq_tpu.data.multimodal_dataset import MultimodalDataset

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (8, 8), (255, 0, 0)).save(img_dir / "a.png")
    items = [{"image": "a.png", "text": "hello world", "label": 1}]
    json_path = tmp_path / "data.json"
    json_path.write_text(json.dumps(items))

    vocab = {"<PAD>": 0, "<UNK>": 1, "hello": 2}
    ds = MultimodalDataset(str(img_dir), str(json_path), vocab=vocab,
                           max_length=4)
    assert len(ds) == 1
    item = ds[0]
    assert item["image"].shape == (8, 8, 3)
    np.testing.assert_array_equal(item["text"], [2, 1, 0, 0])
    assert item["text_length"] == 2
    assert int(item["label"]) == 1


def test_metrics_utils():
    from atq_tpu.utils.metrics import (
        accuracy,
        confusion_matrix,
        count_parameters,
        measure_model_memory,
    )

    params = {"a": jnp.ones((3, 4)), "b": {"c": jnp.ones((5,))}}
    assert count_parameters(params) == 17
    assert abs(measure_model_memory(params) - 17 * 4 / 2**20) < 1e-9

    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = jnp.asarray([1, 2])
    top1, top2 = accuracy(logits, labels, topk=(1, 2))
    assert top1 == 50.0 and top2 == 50.0

    cm = confusion_matrix(np.asarray([0, 1, 1]), np.asarray([0, 1, 0]))
    assert cm[0, 0] == 1 and cm[1, 1] == 1 and cm[0, 1] == 1


def test_lr_schedules():
    from atq_tpu.train.schedules_lr import (
        step_lr_schedule,
        warmup_cosine_schedule,
    )

    sched = warmup_cosine_schedule(1.0, warmup_steps=10, total_steps=100)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(5)) - 0.5) < 1e-6
    assert abs(float(sched(10)) - 1.0) < 1e-6
    assert float(sched(100)) >= 0.1  # floor

    step = step_lr_schedule(1.0, steps_per_epoch=10, step_size=5)
    assert float(step(0)) == 1.0
    assert float(step(49)) == 1.0     # epoch 4
    assert float(step(50)) == 0.5     # epoch 5
    assert float(step(100)) == 0.25   # epoch 10


def test_amp_train_step_runs():
    """--use_amp bf16 path compiles and produces finite loss/updates."""
    import jax.numpy as jnp
    import numpy as np

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
                          use_residual=True, use_amp=True)
    model = ATQMultimodalRetrieval(vocab_size=40, embed_dim=32,
                                   hidden_dim=64, use_residual=True,
                                   max_seq_length=8)
    rng = jax.random.PRNGKey(0)
    v = model.init(rng, jnp.zeros((2, 32, 32, 3)),
                   jnp.zeros((2, 8), jnp.int32), jnp.asarray([4, 4]))
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
    state, loss = step(state, batch, jnp.float32(0.07), jnp.int32(0),
                       jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # master params stay f32
    assert state["params"]["temperature"].dtype == jnp.float32


def test_grad_checkpointing_matches_unremat_step():
    """--grad_checkpointing (jax.checkpoint rematerialization of the
    encoder forward) must not change the math: one train step from the
    same state produces the same loss and the same updated params as the
    un-rematerialized step. The reference parses this flag but never uses
    it (train_multimodal.py:870); we wire it to real remat."""
    import jax.numpy as jnp
    import numpy as np

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

    model = ATQMultimodalRetrieval(vocab_size=40, embed_dim=32,
                                   hidden_dim=64, use_residual=True,
                                   max_seq_length=8)
    rng = jax.random.PRNGKey(0)
    v = model.init(rng, jnp.zeros((2, 32, 32, 3)),
                   jnp.zeros((2, 8), jnp.int32), jnp.asarray([4, 4]))
    rngd = np.random.RandomState(0)
    batch = (rngd.randn(4, 32, 32, 3).astype(np.float32),
             rngd.randint(0, 40, (4, 8)).astype(np.int32),
             np.full(4, 6, np.int32))

    losses, params_out = [], []
    for remat in (False, True):
        cfg = RetrievalConfig(batch_size=4, image_size=32, embed_dim=32,
                              hidden_dim=64, max_seq_length=8,
                              use_residual=True, grad_checkpointing=remat)
        tx = make_retrieval_optimizer(cfg, 10)
        crit = HardNegativeMiningInfoNCE(temperature_schedule=False)
        mgr = ContrastiveLearningManager(criterion=crit)
        state = {"params": v["params"], "quant": v.get("quant", {}),
                 "constants": v.get("constants", {}),
                 "batch_stats": v.get("batch_stats", {}),
                 "opt_state": tx.init(v["params"]),
                 "step": jnp.asarray(0, jnp.int32)}
        step = jax.jit(build_retrieval_train_step(model, tx, crit, mgr,
                                                  cfg))
        state, loss = step(state, batch, jnp.float32(0.07), jnp.int32(0),
                           jax.random.PRNGKey(1))
        losses.append(float(loss))
        params_out.append(state["params"])

    assert np.isfinite(losses[0])
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(params_out[0])
    flat1 = jax.tree_util.tree_leaves(params_out[1])
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_device_rotation_matches_host_rotation():
    """The on-device bilinear rotate must equal the host-side numpy analog
    (atq_tpu.data.mnist._rotate_batch) that mirrors torchvision
    RandomRotation semantics — same angles, same pixels."""
    from atq_tpu.data.augment import _rotate_bilinear
    from atq_tpu.data.mnist import _rotate_batch

    rng = np.random.RandomState(0)
    imgs = rng.rand(6, 28, 28).astype(np.float32)
    angles = np.array([-5, -2.5, 0, 1, 3, 5], np.float32)
    host = _rotate_batch(imgs, angles)
    dev = _rotate_bilinear(jnp.asarray(imgs[..., None]),
                           jnp.deg2rad(jnp.asarray(angles)))[..., 0]
    np.testing.assert_allclose(host, np.asarray(dev), atol=1e-5)


def test_device_augmentation():
    from atq_tpu.data.augment import classifier_augment, random_rotate

    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(
        np.random.RandomState(0).rand(4, 28, 28, 1).astype(np.float32)
    )
    out = classifier_augment(images, rng, flip=True)
    assert out.shape == images.shape
    assert np.all(np.isfinite(np.asarray(out)))
    # rotation changes pixels but preserves overall energy approximately
    rot = random_rotate(images, rng, 5.0)
    assert not np.allclose(np.asarray(rot), np.asarray(images))
    assert abs(float(jnp.mean(rot)) - float(jnp.mean(images))) < 0.05
    # zero rotation is identity
    rot0 = random_rotate(images, rng, 0.0)
    np.testing.assert_allclose(np.asarray(rot0), np.asarray(images),
                               atol=1e-5)


def test_prefetch_loader():
    from atq_tpu.data.prefetch import PrefetchLoader

    batches = [np.full((2,), i) for i in range(7)]
    out = list(PrefetchLoader(batches, depth=2))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(b, batches[i])

    # errors in the producer propagate to the consumer
    def bad():
        yield 1
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(PrefetchLoader(bad()))


def test_visualize_flickr8k_samples(tmp_path):
    from atq_tpu.data.flickr8k import (
        Flickr8kDataset,
        Flickr8kLoader,
        visualize_flickr8k_samples,
    )

    ds = Flickr8kDataset(root_dir=str(tmp_path / "missing"), split="train",
                         image_size=32, max_length=10, synthetic_images=20)
    loader = Flickr8kLoader(ds, batch_size=4)
    out = tmp_path / "samples.png"
    visualize_flickr8k_samples(loader, num_samples=2,
                               idx_to_word=ds.idx_to_word,
                               out_path=str(out))
    assert out.exists()


def test_force_platform_from_argv(monkeypatch):
    """--device cpu must pin JAX_PLATFORMS before backend init; the
    reference-compat values (cuda/mps) and tpu leave the default
    TPU-first resolution untouched (plugin platform names vary)."""
    import os

    from atq_tpu.utils.platform import force_platform_from_argv

    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    force_platform_from_argv(argv=["--device", "mps"])
    assert "JAX_PLATFORMS" not in os.environ
    force_platform_from_argv(argv=["--device", "tpu"])
    assert "JAX_PLATFORMS" not in os.environ
    force_platform_from_argv(argv=["--epochs", "1"])
    assert "JAX_PLATFORMS" not in os.environ
    force_platform_from_argv(argv=["--device=cpu"])
    assert os.environ["JAX_PLATFORMS"] == "cpu"
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    force_platform_from_argv(argv=["--device", "cpu"])
    assert os.environ["JAX_PLATFORMS"] == "cpu"


def test_metrics_writer_tensorboard(tmp_path):
    """Opt-in TensorBoard writer: real event file when a backend exists,
    silent no-op without a logdir, non-numeric values skipped."""
    from atq_tpu.utils.tb import MetricsWriter

    noop = MetricsWriter(None)
    assert not noop.active
    noop.scalars(1, {"x": 1.0})  # must not raise
    noop.close()

    logdir = str(tmp_path / "tb")
    w = MetricsWriter(logdir)
    if not w.active:  # no tensorboard backend in this env
        return
    w.scalars(1, {"loss": 2.5, "acc": 10.0, "skip_me": "nan-string"},
              prefix="t/")
    w.scalars(2, {"loss": 1.5})
    w.close()
    import glob
    import os

    files = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    assert files and os.path.getsize(files[0]) > 0


def test_force_platform_accepts_argparse_abbreviations(monkeypatch):
    """argparse allows unambiguous prefix abbreviations of --device; the
    pre-init platform forcing must see them too."""
    import os

    from atq_tpu.utils.platform import force_platform_from_argv

    for form in (["--devic", "cpu"], ["--devi=cpu"], ["--device", "cpu"]):
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
        force_platform_from_argv(argv=form)
        assert os.environ.get("JAX_PLATFORMS") == "cpu", form
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    # too-short / unrelated tokens never match
    for form in (["--d", "cpu"], ["--distill"], ["--data_dir", "cpu"]):
        force_platform_from_argv(argv=form)
        assert "JAX_PLATFORMS" not in os.environ, form
