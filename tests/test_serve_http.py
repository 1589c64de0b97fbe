"""HTTP serving front: routes, batching integration, tokenization.

Uses lightweight fake forwards (the engine + packed model are tested
against real models elsewhere) so these tests cover the HTTP transport,
payload validation, vocab tokenization, and the concurrent-request ->
batched-dispatch path without paying model compiles.
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from atq_tpu.serve.engine import BatchServer
from atq_tpu.serve.http import (
    make_classifier_routes,
    make_http_server,
    make_retrieval_routes,
    start_in_thread,
)


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return json.loads(r.read())


@pytest.fixture()
def classifier_server():
    def fwd(x):  # (B, 28, 28, 1) -> (B, 10): mean-pixel-dependent logits
        base = x.mean(axis=(1, 2, 3))
        return base[:, None] * np.arange(10, dtype=np.float32)[None, :]

    srv = BatchServer(fwd, max_batch=8, max_wait_ms=5)
    httpd = make_http_server(make_classifier_routes(srv), port=0,
                             stats_fn=lambda: {"s": srv.stats})
    start_in_thread(httpd)
    try:
        yield httpd.server_address[1], srv
    finally:
        httpd.shutdown()
        srv.stop()


def test_predict_and_healthz(classifier_server):
    port, srv = classifier_server
    img = np.ones((28, 28), np.float32)
    out = _post(port, "/predict", {"image": img.tolist()})
    assert out["class"] == 9  # positive mean -> largest logit at index 9
    assert len(out["logits"]) == 10
    np.testing.assert_allclose(sum(out["probs"]), 1.0, rtol=1e-5)
    # normalize shifts the mean negative for a zero image -> class 0
    out0 = _post(port, "/predict",
                 {"image": np.zeros((28, 28)).tolist(), "normalize": True})
    assert out0["class"] == 0
    health = _get(port, "/healthz")
    assert health["ok"] and health["stats"]["s"]["requests"] >= 2


def test_bad_payload_and_unknown_route(classifier_server):
    port, _ = classifier_server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/predict", {"image": [[[[1.0]]]]})  # 4-D: invalid
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/nope", {})
    assert e.value.code == 404


def test_concurrent_requests_batch_together(classifier_server):
    port, srv = classifier_server
    img = np.ones((28, 28), np.float32).tolist()
    results, threads = [], []

    def one():
        results.append(_post(port, "/predict", {"image": img}))

    before = srv.stats["requests"]
    for _ in range(16):
        threads.append(threading.Thread(target=one))
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert len(results) == 16
    served = srv.stats["requests"] - before
    batches = srv.stats["batches"]
    assert served == 16
    # micro-batching actually happened: fewer dispatches than requests
    assert batches < srv.stats["requests"]


def test_retrieval_text_tokenization_route():
    from atq_tpu.data.flickr8k import END, PAD, START

    captured = {}

    def txt_fwd(tokens, lengths):  # (B, L), (B,) -> (B, 4)
        captured["tokens"] = np.asarray(tokens)
        captured["lengths"] = np.asarray(lengths)
        return np.ones((tokens.shape[0], 4), np.float32)

    def img_fwd(images):
        return np.ones((images.shape[0], 4), np.float32)

    vocab = {"<PAD>": 0, "<UNK>": 1, "<START>": 2, "<END>": 3,
             "a": 4, "dog": 5, "runs": 6}
    img_srv = BatchServer(img_fwd, max_batch=4, max_wait_ms=2)
    txt_srv = BatchServer(txt_fwd, max_batch=4, max_wait_ms=2)
    httpd = make_http_server(
        make_retrieval_routes(img_srv, txt_srv, word_to_idx=vocab,
                              max_length=10), port=0)
    start_in_thread(httpd)
    port = httpd.server_address[1]
    try:
        out = _post(port, "/embed_text", {"text": "A dog runs!"})
        assert out["length"] == 5  # START a dog runs END
        row = captured["tokens"][0]
        assert list(row[:5]) == [START, vocab["a"], vocab["dog"],
                                 vocab["runs"], END]
        assert all(v == PAD for v in row[5:])
        # unknown words -> UNK, raw token ids also accepted
        out2 = _post(port, "/embed_text", {"tokens": [2, 9, 3]})
        assert out2["length"] == 3
        emb = _post(port, "/embed_image",
                    {"image": np.zeros((8, 8, 3)).tolist(),
                     "normalize": True})
        assert len(emb["embedding"]) == 4
    finally:
        httpd.shutdown()
        img_srv.stop()
        txt_srv.stop()


def test_text_without_vocab_is_400():
    txt_srv = BatchServer(lambda t, l: np.ones((t.shape[0], 2),
                                               np.float32),
                          max_batch=2, max_wait_ms=2)
    img_srv = BatchServer(lambda x: np.ones((x.shape[0], 2), np.float32),
                          max_batch=2, max_wait_ms=2)
    httpd = make_http_server(
        make_retrieval_routes(img_srv, txt_srv, word_to_idx=None,
                              max_length=8), port=0)
    start_in_thread(httpd)
    port = httpd.server_address[1]
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(port, "/embed_text", {"text": "hello"})
        assert e.value.code == 400
    finally:
        httpd.shutdown()
        txt_srv.stop()
        img_srv.stop()
