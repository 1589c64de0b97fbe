#!/usr/bin/env python
"""Composed serving profile (round-5 ask #6): int8 trunk + 2-bit text stack.

Rounds 2-4 measured the int8 trunk and the packed ternary planes as
separate stories; this harness measures the COMPOSED deployment — the
whole image tower + every quantized projection serving from integer /
2-bit weights — end to end: encode image + encode text + index lookup,
at serving batches 1/8/32/64, against the dense eval path, with
embedding drift pinned.

Configs: dense | int8 (trunk only, serve.py's default) | composed
(int8 trunk + packed ATQ layers, serve.py ``--packed``).
Writes incrementally to --out (default benchmarks/r5/composed_serving.json).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from atq_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

BATCHES = (1, 8, 32, 64)
IMAGE_SIZE = 160
SEQ = 50
VOCAB = 3000
INDEX_ROWS = 8192


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "r5",
        "composed_serving.json"))
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from atq_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from atq_tpu.models.retrieval import ATQMultimodalRetrieval
    from atq_tpu.serve.index import EmbeddingIndex
    from atq_tpu.serve.int8_trunk import export_int8_collection
    from atq_tpu.serve.packed_model import export_packed_collection
    from atq_tpu.train.retrieval import build_embed_fn
    from atq_tpu.utils.timing import sec_per_call

    model = ATQMultimodalRetrieval(
        vocab_size=VOCAB, embed_dim=192, hidden_dim=384, use_residual=True,
        max_seq_length=SEQ)
    rng = jax.random.PRNGKey(0)
    v = model.init(rng, jnp.zeros((2, IMAGE_SIZE, IMAGE_SIZE, 3)),
                   jnp.zeros((2, SEQ), jnp.int32), jnp.asarray([5, 5]))
    state = {"params": v["params"], "quant": v.get("quant", {}),
             "constants": v.get("constants", {}),
             "batch_stats": v.get("batch_stats", {}),
             "ema_params": v["params"]}

    packed = export_packed_collection(v["params"], v.get("quant"))
    int8 = export_int8_collection(v["params"], v.get("batch_stats", {}))

    embeds = {
        "dense": build_embed_fn(model),
        "int8": build_embed_fn(model, int8=int8),
        "composed": build_embed_fn(model, packed=packed, int8=int8),
    }

    # Pre-built index (the serving corpus side), queried by image embs.
    rngd = np.random.RandomState(0)
    index = EmbeddingIndex(dim=192, capacity=INDEX_ROWS)
    corpus = rngd.randn(INDEX_ROWS, 192).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    index.add([str(i) for i in range(INDEX_ROWS)], corpus)

    results = {"what": "composed retrieval serving: encode image + encode "
                       "text + index top-5 lookup",
               "index_rows": INDEX_ROWS, "image_size": IMAGE_SIZE,
               "ts": time.strftime("%Y-%m-%d %H:%M:%S"), "rows": []}

    def flush():
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    # Drift: composed vs dense embeddings on one fixed batch.
    def batch_of(n):
        return (jnp.asarray(rngd.randn(n, IMAGE_SIZE, IMAGE_SIZE, 3)
                            .astype(np.float32)),
                jnp.asarray(rngd.randint(0, VOCAB, (n, SEQ)), jnp.int32),
                jnp.full((n,), 20, jnp.int32))

    probe = batch_of(32)
    img_d, txt_d = (np.asarray(x) for x in embeds["dense"](state, probe))
    for name in ("int8", "composed"):
        img_q, txt_q = (np.asarray(x) for x in embeds[name](state, probe))

        def drift(a, b):
            a = a / np.linalg.norm(a, axis=1, keepdims=True)
            b = b / np.linalg.norm(b, axis=1, keepdims=True)
            return float(1.0 - np.mean(np.sum(a * b, axis=1)))

        results[f"drift_{name}_image"] = drift(img_d, img_q)
        results[f"drift_{name}_text"] = drift(txt_d, txt_q)
    flush()

    for batch in BATCHES:
        data = batch_of(batch)
        for name in embeds:
            # index.search device_gets internally; time the encode with
            # the windowed protocol and the search as one timed call.
            dt = sec_per_call(lambda: embeds[name](state, data),
                              warmup=2, iters=max(4, args.iters // 2),
                              windows=3)
            t0 = time.time()
            img, _ = embeds[name](state, data)
            ids, scores = index.search(np.asarray(img), k=5)
            search_ms = (time.time() - t0) * 1000 - dt * 1000
            row = {"config": name, "batch": batch,
                   "encode_ms_per_batch": dt * 1000,
                   "encode_ms_per_sample": dt * 1000 / batch,
                   "index_top5_ms": max(search_ms, 0.0),
                   "topk_per_query": len(ids[0])}
            print(row, flush=True)
            results["rows"].append(row)
            flush()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
