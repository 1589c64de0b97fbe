"""AOT serving exports (atq_tpu/serve/aot.py): jax.export round-trips.

The reference deploys Python (pickled nn.Modules); the TPU-native
deployable is the compiled program. These tests assert the exported
artifact (a) matches the live jitted function bitwise, (b) survives a
save/load round-trip with NO model code in scope, and (c) drops in front
of the micro-batching BatchServer unchanged.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atq_tpu.serve.aot import AOTServing, export_serving, load_serving


def _mlp_fn():
    rng = np.random.RandomState(0)
    w1 = jnp.asarray(rng.randn(16, 32).astype(np.float32))
    w2 = jnp.asarray(rng.randn(32, 8).astype(np.float32))

    def fn(x):
        return jnp.tanh(x @ w1) @ w2

    return jax.jit(fn)


def test_poly_export_matches_and_roundtrips(tmp_path):
    fn = _mlp_fn()
    x4 = np.random.RandomState(1).randn(4, 16).astype(np.float32)
    aot = export_serving(fn, (x4,))
    assert aot.batch_polymorphic
    np.testing.assert_array_equal(np.asarray(aot(x4)),
                                  np.asarray(fn(x4)))
    # Polymorphic: a batch size never seen at export time.
    x7 = np.random.RandomState(2).randn(7, 16).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(aot(x7)),
                                  np.asarray(fn(x7)))

    path = aot.save(str(tmp_path / "mlp"))
    assert os.path.exists(os.path.join(path, "manifest.json"))
    loaded = load_serving(path)
    assert loaded.batch_polymorphic
    np.testing.assert_array_equal(np.asarray(loaded(x7)),
                                  np.asarray(fn(x7)))


def test_bucketed_export_pads_and_slices(tmp_path):
    fn = _mlp_fn()
    x = np.random.RandomState(3).randn(8, 16).astype(np.float32)
    aot = export_serving(fn, (x,), batch_polymorphic=False,
                         buckets=(4, 8))
    assert not aot.batch_polymorphic
    # batch 3 pads up to bucket 4, slices back to 3
    x3 = x[:3]
    np.testing.assert_array_equal(np.asarray(aot(x3)),
                                  np.asarray(fn(x3)))
    # exact bucket hit
    np.testing.assert_array_equal(np.asarray(aot(x)), np.asarray(fn(x)))
    with pytest.raises(ValueError):
        aot(np.zeros((9, 16), np.float32))

    loaded = load_serving(aot.save(str(tmp_path / "bucketed")))
    np.testing.assert_array_equal(np.asarray(loaded(x3)),
                                  np.asarray(fn(x3)))


def test_multi_arg_and_tuple_output():
    rng = np.random.RandomState(4)
    w = jnp.asarray(rng.randn(16, 8).astype(np.float32))

    def fn(x, lengths):
        h = x @ w
        return h, h.sum(-1) * lengths.astype(jnp.float32)

    x = rng.randn(5, 16).astype(np.float32)
    ln = np.arange(5, dtype=np.int32)
    aot = export_serving(jax.jit(fn), (x, ln))
    got = aot(x, ln)
    want = fn(jnp.asarray(x), jnp.asarray(ln))
    assert isinstance(got, tuple) and len(got) == 2
    for g, w_ in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))


def test_bucketed_tuple_output_slices_every_leaf():
    rng = np.random.RandomState(6)
    w = jnp.asarray(rng.randn(16, 8).astype(np.float32))

    def fn(x):
        h = x @ w
        return h, h.sum(-1)

    x = rng.randn(6, 16).astype(np.float32)
    aot = export_serving(jax.jit(fn), (x,), batch_polymorphic=False,
                         buckets=(8,))
    got = aot(x)
    want = fn(jnp.asarray(x))
    for g, w_ in zip(got, want):
        assert np.shape(g)[0] == 6
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))


def test_aot_fronts_batch_server():
    from atq_tpu.serve.engine import BatchServer

    fn = _mlp_fn()
    x = np.random.RandomState(5).randn(4, 16).astype(np.float32)
    aot = export_serving(fn, (x,))
    with BatchServer(aot, max_batch=8, max_wait_ms=1.0) as server:
        futs = [server.submit(x[i]) for i in range(4)]
        for i, f in enumerate(futs):
            np.testing.assert_array_equal(np.asarray(f.result(timeout=30)),
                                          np.asarray(fn(x))[i])


def test_manifest_format_guard(tmp_path):
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "manifest.json").write_text(json.dumps({"format": "other"}))
    with pytest.raises(ValueError):
        AOTServing.load(str(bad))


@pytest.mark.slow
def test_serve_cli_aot_export_then_load(tmp_path):
    """serve.py --aot: first run exports the serving program, second run
    serves from the artifact without tracing the model; predictions
    agree."""
    import serve
    from atq_tpu.train.classifier import load_checkpoint
    from evaluate import resolve_grad_mode

    ckpt_path = os.path.join(os.path.dirname(__file__), "..",
                             "checkpoints", "atq_model_fashion_mnist.npz")
    if not os.path.exists(ckpt_path):
        pytest.skip("bundled classifier checkpoint not present")
    argv = ["--task", "classification", "--checkpoint", ckpt_path,
            "--use-rpb", "--aot", str(tmp_path / "aot"),
            "--max_wait_ms", "1"]
    args = serve.build_parser().parse_args(argv)
    ckpt = load_checkpoint(ckpt_path)
    grad_mode = resolve_grad_mode("auto", ckpt["params"])

    img = {"image": np.random.RandomState(0).rand(28, 28).tolist(),
           "normalize": True}
    routes, servers = serve.build_classifier_routes(args, ckpt, grad_mode)
    try:
        first = routes["/predict"](img)
    finally:
        for s in servers:
            s.stop()
    assert os.path.exists(tmp_path / "aot" / "predict" / "manifest.json")

    routes2, servers2 = serve.build_classifier_routes(args, ckpt, grad_mode)
    try:
        second = routes2["/predict"](img)
    finally:
        for s in servers2:
            s.stop()
    np.testing.assert_allclose(first["logits"], second["logits"],
                               rtol=1e-6)
    assert first["class"] == second["class"]


@pytest.mark.slow
def test_classifier_export_roundtrip(tmp_path):
    """The real flagship forward exports, reloads, and matches."""
    from atq_tpu.models.image_classifier import ATQImageClassifier

    model = ATQImageClassifier(use_rpb=True, hidden_size=128)
    x = np.random.RandomState(0).randn(4, 28, 28, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    fwd = jax.jit(lambda im: model.apply(variables, im, train=False))
    aot = export_serving(fwd, (x,))
    loaded = load_serving(aot.save(str(tmp_path / "clf")))
    x6 = np.random.RandomState(1).randn(6, 28, 28, 1).astype(np.float32)
    if loaded.batch_polymorphic:
        np.testing.assert_allclose(np.asarray(loaded(x6)),
                                   np.asarray(fwd(x6)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded(x)),
                               np.asarray(fwd(x)), rtol=1e-6)
