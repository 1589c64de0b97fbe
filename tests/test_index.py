"""EmbeddingIndex: device-side top-k search over a persistent corpus.

The reference's retrieval protocol scores a full corpus-by-corpus
similarity matrix on the host (train_multimodal.py:197-241); the index
is the serving-side inverse — one query against a device-resident
corpus (atq_tpu/serve/index.py). Checked against brute-force numpy.
"""

import numpy as np
import pytest

from atq_tpu.serve.http import make_search_routes
from atq_tpu.serve.index import EmbeddingIndex, _next_pow2


def _unit_rows(rng, n, d):
    x = rng.randn(n, d).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_search_matches_numpy_brute_force():
    rng = np.random.RandomState(0)
    corpus = _unit_rows(rng, 37, 16)
    idx = EmbeddingIndex(dim=16, capacity=8)  # forces growth too
    idx.add([f"item{i}" for i in range(37)], corpus)

    queries = _unit_rows(rng, 5, 16)
    ids, scores = idx.search(queries, k=4)
    want = corpus @ queries.T  # (37, 5)
    for qi in range(5):
        order = np.argsort(-want[:, qi])[:4]
        assert ids[qi] == [f"item{j}" for j in order]
        np.testing.assert_allclose(scores[qi], want[order, qi], rtol=1e-5)


def test_capacity_grows_in_pow2_tiers():
    idx = EmbeddingIndex(dim=4, capacity=2)
    rng = np.random.RandomState(1)
    idx.add(["a", "b"], _unit_rows(rng, 2, 4))
    assert idx.capacity == 2
    idx.add(["c"], _unit_rows(rng, 1, 4))
    assert idx.capacity == 4 and len(idx) == 3
    idx.add([f"x{i}" for i in range(10)], _unit_rows(rng, 10, 4))
    assert idx.capacity == _next_pow2(13) == 16 and len(idx) == 13
    # Padding slots never appear in results even with k == capacity.
    ids, scores = idx.search(_unit_rows(rng, 1, 4), k=16)
    assert len(ids[0]) == 13 and np.all(np.isfinite(scores))


def test_k_clamps_to_corpus_size_and_single_query_squeezes():
    rng = np.random.RandomState(2)
    idx = EmbeddingIndex(dim=8)
    idx.add(["only", "two"], _unit_rows(rng, 2, 8))
    ids, scores = idx.search(_unit_rows(rng, 1, 8)[0], k=10)
    assert isinstance(ids, list) and len(ids) == 2  # squeezed, clamped
    assert scores.shape == (2,)
    assert set(ids) == {"only", "two"}


def test_empty_index_raises_and_bad_shapes_raise():
    idx = EmbeddingIndex(dim=8)
    with pytest.raises(ValueError, match="empty"):
        idx.search(np.zeros(8, np.float32))
    with pytest.raises(ValueError, match="embeddings"):
        idx.add(["a"], np.zeros((1, 7), np.float32))
    with pytest.raises(ValueError, match="queries"):
        idx.add(["a"], np.zeros((1, 8), np.float32))
        idx.search(np.zeros((1, 7), np.float32))


def test_save_load_round_trip(tmp_path):
    rng = np.random.RandomState(3)
    corpus = _unit_rows(rng, 9, 12)
    idx = EmbeddingIndex(dim=12)
    idx.add([f"i{i}" for i in range(9)], corpus)
    p = str(tmp_path / "index.npz")
    idx.save(p)
    idx2 = EmbeddingIndex.load(p)
    assert len(idx2) == 9 and idx2.dim == 12
    q = _unit_rows(rng, 2, 12)
    ids1, s1 = idx.search(q, k=3)
    ids2, s2 = idx2.search(q, k=3)
    assert ids1 == ids2
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_normalize_flag():
    idx = EmbeddingIndex(dim=4)
    idx.add(["long"], np.asarray([[10.0, 0, 0, 0]]), normalize=True)
    ids, scores = idx.search(np.asarray([3.0, 0, 0, 0]), k=1,
                             normalize=True)
    np.testing.assert_allclose(scores, [1.0], rtol=1e-6)


def test_search_routes_over_fake_embedders():
    """/index/add + /search wired over the embed routes (fake encoders:
    embedding = first-3-pixel signature / one-hot-ish token hash)."""
    def fake_embed_image(payload):
        img = np.asarray(payload["image"], np.float32)
        v = np.asarray([img.mean(), img.max(), 1.0], np.float32)
        return {"embedding": (v / np.linalg.norm(v)).tolist()}

    def fake_embed_text(payload):
        h = float(len(payload.get("text", ""))) or float(
            sum(payload.get("tokens", [])))
        v = np.asarray([h, 1.0, 0.0], np.float32)
        return {"embedding": (v / np.linalg.norm(v)).tolist()}

    embed_routes = {"/embed_image": fake_embed_image,
                    "/embed_text": fake_embed_text}
    index = EmbeddingIndex(dim=3)
    routes = make_search_routes(index, embed_routes)

    img = np.zeros((4, 4, 3), np.float32)
    assert routes["/index/add"]({"id": "dark", "image": img.tolist()}
                                )["count"] == 1
    assert routes["/index/add"]({"id": "bright",
                                 "image": (img + 1).tolist()})["count"] == 2
    out = routes["/search"]({"image": (img + 0.9).tolist(), "k": 2})
    assert [r["id"] for r in out["results"]] == ["bright", "dark"]
    assert out["count"] == 2
    # text query hits the text embedder and still searches the corpus
    out = routes["/search"]({"text": "hi", "k": 1})
    assert len(out["results"]) == 1
    with pytest.raises(ValueError, match="'id'"):
        routes["/index/add"]({"image": img.tolist()})
    with pytest.raises(ValueError, match="image"):
        routes["/search"]({"k": 1})


def test_sharded_search_matches_single_device():
    """Corpus rows sharded over the 8-device 'data' axis; per-shard
    top-k + all-gather merge must equal the dense single-device search
    (atq_tpu/serve/index.py:_sharded_search_fn)."""
    from atq_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(5)
    corpus = _unit_rows(rng, 100, 16)  # capacity tier 128 = 8 * 16 rows
    idx = EmbeddingIndex(dim=16)
    idx.add([f"c{i}" for i in range(100)], corpus)
    q = _unit_rows(rng, 4, 16)

    ids_dense, s_dense = idx.search(q, k=7)
    mesh = make_mesh()  # all 8 virtual CPU devices on 'data'
    ids_shard, s_shard = idx.search(q, k=7, mesh=mesh)
    assert ids_shard == ids_dense
    np.testing.assert_allclose(s_shard, s_dense, rtol=1e-5)

    # Adds invalidate the sharded commit too: grow past the tier and
    # re-search (capacity 256 still divides 8).
    idx.add([f"x{i}" for i in range(60)], _unit_rows(rng, 60, 16))
    ids_dense2, s_dense2 = idx.search(q, k=7)
    ids_shard2, s_shard2 = idx.search(q, k=7, mesh=mesh)
    assert ids_shard2 == ids_dense2
    np.testing.assert_allclose(s_shard2, s_dense2, rtol=1e-5)


def test_int8_index_matches_exact_scores():
    """int8 device corpus: scores within per-row quantization error of
    the exact f32 search, identical top-k ids on a separated corpus, and
    the device copy actually 4x smaller."""
    rng = np.random.RandomState(3)
    corpus = _unit_rows(rng, 64, 32)
    q = _unit_rows(rng, 5, 32)

    exact = EmbeddingIndex(dim=32, quantize="none")
    quant = EmbeddingIndex(dim=32, quantize="int8")
    ids = [f"i{i}" for i in range(64)]
    exact.add(ids, corpus)
    quant.add(ids, corpus)

    ids_e, s_e = exact.search(q, k=5)
    ids_q, s_q = quant.search(q, k=5)
    # per-row symmetric int8 on unit-norm rows: |err| <= dim * (s/2) with
    # s = max|row|/127 -> well under 2e-2 for these shapes. Score
    # perturbation can swap near-tied neighbors inside the top-k (that's
    # the accepted quantized-index tradeoff), so assert the top-1 and the
    # top-k SET, not the exact order.
    np.testing.assert_allclose(s_q, s_e, atol=2e-2)
    for row_q, row_e in zip(ids_q, ids_e):
        assert row_q[0] == row_e[0]
        assert set(row_q) == set(row_e)

    c8, scales = quant._device_corpus
    assert c8.dtype == np.int8 and c8.nbytes * 4 == corpus.nbytes * (
        quant.capacity // 64)
    deq_err = np.max(np.abs(
        np.asarray(c8, np.float32) * np.asarray(scales)[:, None]
        - quant._embs))
    assert deq_err < 1e-2  # host master stays exact f32; device ~int8


def test_int8_index_add_recommits_and_load_flag(tmp_path):
    rng = np.random.RandomState(4)
    idx = EmbeddingIndex(dim=16, quantize="int8")
    idx.add(["a", "b"], _unit_rows(rng, 2, 16))
    idx.search(_unit_rows(rng, 1, 16)[0], k=1)
    assert idx._device_corpus is not None
    idx.add(["c"], _unit_rows(rng, 1, 16))
    assert idx._device_corpus is None  # dirty -> requantized on next search
    ids, _ = idx.search(_unit_rows(rng, 1, 16)[0], k=3)
    assert sorted(ids) == ["a", "b", "c"]

    path = str(tmp_path / "idx.npz")
    idx.save(path)
    loaded = EmbeddingIndex.load(path, quantize="int8")
    assert loaded.quantize == "int8"
    # save() persists the f32 master, so reloading loses nothing
    np.testing.assert_array_equal(loaded._embs[:3], idx._embs[:3])


def test_int8_sharded_search_matches_dense_int8():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from atq_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=8)
    rng = np.random.RandomState(9)
    idx = EmbeddingIndex(dim=16, capacity=32, quantize="int8")
    idx.add([f"x{i}" for i in range(30)], _unit_rows(rng, 30, 16))
    q = _unit_rows(rng, 3, 16)
    ids_d, s_d = idx.search(q, k=4)
    ids_s, s_s = idx.search(q, k=4, mesh=mesh)
    assert ids_s == ids_d
    np.testing.assert_allclose(s_s, s_d, rtol=1e-5, atol=1e-6)


def test_search_routes_over_int8_index():
    """The HTTP route layer is agnostic to the corpus dtype: the same
    /index/add + /search flow works over an int8 device corpus (the
    serve.py --index_int8 configuration)."""
    def fake_embed_image(payload):
        img = np.asarray(payload["image"], np.float32)
        v = np.asarray([img.mean(), img.max(), 1.0], np.float32)
        return {"embedding": (v / np.linalg.norm(v)).tolist()}

    embed_routes = {"/embed_image": fake_embed_image}
    index = EmbeddingIndex(dim=3, quantize="int8")
    routes = make_search_routes(index, embed_routes)

    img = np.zeros((4, 4, 3), np.float32)
    assert routes["/index/add"]({"id": "dark", "image": img.tolist()}
                                )["count"] == 1
    assert routes["/index/add"]({"id": "bright",
                                 "image": (img + 1).tolist()})["count"] == 2
    out = routes["/search"]({"image": (img + 0.9).tolist(), "k": 2})
    assert [r["id"] for r in out["results"]] == ["bright", "dark"]
    c8, _ = index._device_corpus
    assert c8.dtype == np.int8
