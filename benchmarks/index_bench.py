#!/usr/bin/env python
"""Embedding-index search throughput on the real chip.

Measures /search's device work (atq_tpu/serve/index.py): one
``(B, dim) @ (capacity, dim)ᵀ`` MXU matmul + ``lax.top_k`` over a
device-resident corpus, across corpus sizes and query batch sizes.
Reports queries/sec and per-query latency; the corpus stays resident
between calls (the serving steady state).

Usage: ``python benchmarks/index_bench.py [--dim 192] [--k 10]
[--out benchmarks/index_bench.json]``
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from atq_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def measure(index, queries, k, iters=30):
    """(api_sec, device_sec): end-to-end ``search()`` latency — which
    includes the mandatory device_get of ids/scores and therefore a full
    dispatch→fetch roundtrip per call (~27 ms over the axon tunnel,
    BENCHMARKS.md methodology) — and the slope-timed device program
    alone, the number that survives on a non-tunneled TPU."""
    import jax
    import jax.numpy as jnp

    from atq_tpu.utils.timing import sec_per_call

    index.search(queries, k=k)  # compile + commit
    t0 = time.time()
    for _ in range(iters):
        ids, scores = index.search(queries, k=k)
    api = (time.time() - t0) / iters
    del ids, scores
    # Device work alone: call the cached jitted program on the resident
    # corpus with device-committed args (one sync per timing window).
    fn = index._search_fn(index._capacity, max(1, min(k, len(index))))
    corpus = index._device_corpus
    qd = jax.device_put(jnp.asarray(queries, jnp.float32))
    nd = jax.device_put(jnp.int32(len(index)))
    device = sec_per_call(fn, corpus, qd, nd, warmup=2, iters=iters)
    return api, device


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=192)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", type=str,
                    default=os.path.join(os.path.dirname(
                        os.path.abspath(__file__)), "index_bench.json"))
    ap.add_argument("--corpus-sizes", type=int, nargs="+",
                    default=[10_000, 100_000, 1_000_000])
    ap.add_argument("--query-batches", type=int, nargs="+",
                    default=[1, 32, 256])
    ap.add_argument("--int8", action="store_true",
                    help="bench the int8 device corpus (4x less HBM; "
                         "bf16-input f32-accumulate scoring)")
    args = ap.parse_args()

    from atq_tpu.serve.index import EmbeddingIndex

    rng = np.random.RandomState(0)
    rows = []
    for corpus_n in args.corpus_sizes:
        corpus = rng.randn(corpus_n, args.dim).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        index = EmbeddingIndex(dim=args.dim, capacity=corpus_n,
                               quantize="int8" if args.int8 else "none")
        index.add([str(i) for i in range(corpus_n)], corpus)
        for qb in args.query_batches:
            q = rng.randn(qb, args.dim).astype(np.float32)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            api, device = measure(index, q, args.k)
            row = {"corpus": corpus_n, "query_batch": qb,
                   "quantize": index.quantize,
                   "api_ms_per_call": api * 1000,
                   "device_ms_per_call": device * 1000,
                   "queries_per_sec_api": qb / api,
                   "queries_per_sec_device": qb / device}
            print(row, flush=True)
            rows.append(row)
        del index, corpus
        with open(args.out, "w") as f:  # incremental: crash keeps rows
            json.dump({"dim": args.dim, "k": args.k, "rows": rows}, f,
                      indent=1)


if __name__ == "__main__":
    main()
