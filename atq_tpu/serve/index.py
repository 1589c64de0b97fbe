"""Device-resident embedding index: corpus-side retrieval serving.

Completes the retrieval deployment story. The reference's protocol
scores a full corpus-by-corpus similarity matrix on the host at eval
time (/root/reference/train_multimodal.py:197-241,:23-90); serving needs
the inverse — one query against a persistent corpus of embeddings.

TPU-first design:

- The corpus lives on device as ONE ``(capacity, dim)`` matrix whose
  capacity is padded to a power of two, so XLA compiles one search
  program per capacity tier (and per static ``k``) instead of one per
  added item — steady-state serving never recompiles.
- Scoring is a single MXU matmul ``queries @ corpusᵀ`` plus
  ``jax.lax.top_k``; empty tail slots are masked to ``-inf`` with a
  traced valid-count scalar before the top-k, so adds that don't cross
  a capacity tier reuse the compiled program.
- Embeddings from the retrieval model are L2-normalized
  (models/retrieval.py encode_*), so the dot product IS the cosine
  retrieval score used throughout training and eval.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class EmbeddingIndex:
    """In-memory embedding index with device-side top-k search.

    Thread-safe for the serving pattern (HTTP handler threads calling
    ``add``/``search`` concurrently): mutation of the host buffer and
    the device commit happen under one lock.
    """

    def __init__(self, dim: int, capacity: int = 1024,
                 quantize: str = "none"):
        if dim <= 0:
            raise ValueError(f"dim must be positive, got {dim}")
        if quantize not in ("none", "int8"):
            raise ValueError(f"quantize must be 'none' or 'int8', "
                             f"got {quantize!r}")
        self.dim = int(dim)
        self.quantize = quantize  # device-corpus dtype; host master is f32
        self._capacity = _next_pow2(max(1, capacity))
        self._embs = np.zeros((self._capacity, self.dim), np.float32)
        # int8 mirror filled incrementally at add() time (per-row scales
        # never change once written), so a re-commit after an add never
        # re-quantizes the whole corpus under the lock.
        if quantize == "int8":
            self._q8 = np.zeros((self._capacity, self.dim), np.int8)
            self._scales = np.zeros((self._capacity,), np.float32)
        self._ids: List[str] = []
        self._device_corpus = None  # committed jnp array(s), None = dirty
        self._lock = threading.RLock()
        self._search_cache: Dict[Tuple[int, int], object] = {}

    def __len__(self) -> int:
        return len(self._ids)

    @property
    def capacity(self) -> int:
        return self._capacity

    # -- mutation ---------------------------------------------------------

    def add(self, ids: Sequence[str], embeddings: np.ndarray,
            normalize: bool = False) -> int:
        """Append ``len(ids)`` rows; returns the new item count.

        ``embeddings``: ``(n, dim)`` (or ``(dim,)`` with a single id).
        With ``normalize`` rows are L2-normalized first (embeddings from
        the model's encode_* are already unit-norm)."""
        embs = np.asarray(embeddings, np.float32)
        if embs.ndim == 1:
            embs = embs[None, :]
        if isinstance(ids, str):
            ids = [ids]
        ids = [str(i) for i in ids]
        if embs.shape != (len(ids), self.dim):
            raise ValueError(f"expected ({len(ids)}, {self.dim}) "
                             f"embeddings, got {embs.shape}")
        if normalize:
            norms = np.linalg.norm(embs, axis=1, keepdims=True)
            embs = embs / np.maximum(norms, 1e-12)
        with self._lock:
            n0, n1 = len(self._ids), len(self._ids) + len(ids)
            if n1 > self._capacity:
                new_cap = _next_pow2(n1)
                grown = np.zeros((new_cap, self.dim), np.float32)
                grown[:n0] = self._embs[:n0]
                self._embs = grown
                if self.quantize == "int8":
                    q8 = np.zeros((new_cap, self.dim), np.int8)
                    q8[:n0] = self._q8[:n0]
                    scales = np.zeros((new_cap,), np.float32)
                    scales[:n0] = self._scales[:n0]
                    self._q8, self._scales = q8, scales
                self._capacity = new_cap
            self._embs[n0:n1] = embs
            if self.quantize == "int8":
                self._q8[n0:n1], self._scales[n0:n1] = \
                    self._quantize_rows(embs)
            self._ids.extend(ids)
            # Re-commit lazily on next search (both placements).
            self._device_corpus = None
            self._sharded_corpus = None
            return n1

    # -- int8 device quantization ------------------------------------------

    def _quantize_rows(self, embs: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Per-row symmetric int8: ``row ~= q * scale`` with
        ``scale = max|row| / 127``. The host master stays f32 (adds and
        saves are exact); only the DEVICE copy is int8, cutting corpus
        HBM 4x — the lever that matters for large corpora. Scores are
        computed as bf16-input / f32-accumulate matmuls on the int8
        planes (int8 values are exact in bf16) scaled per corpus row."""
        scales = np.max(np.abs(embs), axis=1) / 127.0
        safe = np.maximum(scales, 1e-12)
        q = np.clip(np.rint(embs / safe[:, None]), -127, 127)
        return q.astype(np.int8), scales.astype(np.float32)

    # -- search -----------------------------------------------------------

    def _search_fn(self, capacity: int, k: int):
        """One jitted program per (capacity tier, static k)."""
        key = (capacity, k, self.quantize)
        fn = self._search_cache.get(key)
        if fn is None:
            import jax
            import jax.numpy as jnp

            if self.quantize == "int8":
                def search(corpus, queries, n_valid):
                    c8, scales = corpus
                    scores = jax.lax.dot_general(
                        queries.astype(jnp.bfloat16),
                        c8.astype(jnp.bfloat16),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * scales[None, :]
                    slot = jnp.arange(c8.shape[0])[None, :]
                    scores = jnp.where(slot < n_valid, scores, -jnp.inf)
                    return jax.lax.top_k(scores, k)
            else:
                def search(corpus, queries, n_valid):
                    scores = queries @ corpus.T  # (B, capacity), MXU
                    slot = jnp.arange(corpus.shape[0])[None, :]
                    scores = jnp.where(slot < n_valid, scores, -jnp.inf)
                    return jax.lax.top_k(scores, k)

            fn = jax.jit(search)
            self._search_cache[key] = fn
        return fn

    def _sharded_search_fn(self, capacity: int, k: int, mesh,
                           axis: str = "data"):
        """Distributed top-k over a row-sharded corpus: each device
        scores and top-k's its own ``capacity / n_dev`` corpus rows
        (one local MXU matmul), then the per-shard candidates are
        all-gathered and reduced — the collective moves ``n_dev * k``
        candidates per query instead of the full score row."""
        key = ("sharded", capacity, k, id(mesh), self.quantize)
        fn = self._search_cache.get(key)
        if fn is None:
            import jax
            import jax.numpy as jnp
            from jax import shard_map
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = mesh.shape[axis]
            local_cap = capacity // n_dev
            k_local = min(k, local_cap)
            quantized = self.quantize == "int8"

            def local_search(corpus, queries, n_valid):
                # corpus: (local_cap, dim) shard (+ per-row scales when
                # int8); queries replicated
                i = jax.lax.axis_index(axis)
                if quantized:
                    c8, scales = corpus
                    scores = jax.lax.dot_general(
                        queries.astype(jnp.bfloat16),
                        c8.astype(jnp.bfloat16),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * scales[None, :]
                else:
                    scores = queries @ corpus.T
                slot = i * local_cap + jnp.arange(local_cap)[None, :]
                scores = jnp.where(slot < n_valid, scores, -jnp.inf)
                v, idx = jax.lax.top_k(scores, k_local)
                gidx = i * local_cap + idx
                v_all = jax.lax.all_gather(v, axis, axis=1, tiled=True)
                g_all = jax.lax.all_gather(gidx, axis, axis=1, tiled=True)
                vf, sel = jax.lax.top_k(v_all, k)
                return vf, jnp.take_along_axis(g_all, sel, axis=1)

            corpus_spec = ((P(axis, None), P(axis)) if quantized
                           else P(axis, None))
            mapped = shard_map(
                local_search, mesh=mesh,
                in_specs=(corpus_spec, P(None, None), P()),
                out_specs=(P(None, None), P(None, None)),
                check_vma=False,
            )
            jitted = jax.jit(mapped)
            if quantized:
                corpus_sharding = (NamedSharding(mesh, P(axis, None)),
                                   NamedSharding(mesh, P(axis)))
            else:
                corpus_sharding = NamedSharding(mesh, P(axis, None))
            fn = (jitted, corpus_sharding)
            self._search_cache[key] = fn
        return fn

    def search(self, queries: np.ndarray, k: int = 5,
               normalize: bool = False, mesh=None
               ) -> Tuple[List[List[str]], np.ndarray]:
        """Top-``k`` corpus items per query by dot-product score.

        ``queries``: ``(B, dim)`` or ``(dim,)``. Returns
        ``(ids, scores)`` — ids as a list of per-query lists, scores as
        ``(B, k_eff)`` with ``k_eff = min(k, len(self))``.

        With ``mesh`` (a Mesh with a ``'data'`` axis whose size divides
        the capacity tier) the corpus rows are sharded across devices
        and searched with per-shard top-k + all-gather merge — corpora
        larger than one chip's HBM scale across the mesh."""
        q = np.asarray(queries, np.float32)
        squeeze = q.ndim == 1
        if squeeze:
            q = q[None, :]
        if q.ndim != 2 or q.shape[1] != self.dim:
            raise ValueError(f"queries must be (B, {self.dim}), "
                             f"got {q.shape}")
        if normalize:
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True),
                               1e-12)
        import jax
        import jax.numpy as jnp

        use_mesh = (mesh is not None
                    and self._capacity % mesh.shape["data"] == 0)
        with self._lock:
            n = len(self._ids)
            if n == 0:
                raise ValueError("index is empty")
            ids = list(self._ids)
            capacity = self._capacity
            def host_corpus():  # already materialized; no work per commit
                if self.quantize == "int8":
                    return (self._q8, self._scales)
                return self._embs

            if use_mesh:
                cached = getattr(self, "_sharded_corpus", None)
                if cached is None or cached[0] is not mesh:
                    k_probe = self._sharded_search_fn(capacity, 1, mesh)
                    corpus = jax.tree_util.tree_map(
                        jax.device_put, host_corpus(), k_probe[1])
                    self._sharded_corpus = (mesh, corpus)
                corpus = self._sharded_corpus[1]
            else:
                if self._device_corpus is None:
                    self._device_corpus = jax.tree_util.tree_map(
                        jnp.asarray, host_corpus())
                corpus = self._device_corpus
        k_eff = max(1, min(int(k), n))
        # Static k for top_k: compile per (capacity, k_eff); the traced
        # n keeps same-tier adds off the compile path.
        if use_mesh:
            fn, _ = self._sharded_search_fn(capacity, k_eff, mesh)
        else:
            fn = self._search_fn(capacity, k_eff)
        scores, idx = fn(corpus, jnp.asarray(q), jnp.int32(n))
        scores = np.asarray(jax.device_get(scores))
        idx = np.asarray(jax.device_get(idx))
        out_ids = [[ids[j] for j in row] for row in idx]
        if squeeze:
            return out_ids[0], scores[0]
        return out_ids, scores

    # -- persistence ------------------------------------------------------

    def save(self, path: str) -> None:
        with self._lock:
            n = len(self._ids)
            np.savez_compressed(path, ids=np.asarray(self._ids, object),
                                embeddings=self._embs[:n])

    @classmethod
    def load(cls, path: str, capacity: Optional[int] = None,
             quantize: str = "none") -> "EmbeddingIndex":
        data = np.load(path, allow_pickle=True)
        embs = np.asarray(data["embeddings"], np.float32)
        ids = [str(i) for i in data["ids"]]
        idx = cls(dim=embs.shape[1] if embs.size else 1,
                  capacity=capacity or max(1, len(ids)),
                  quantize=quantize)
        if ids:
            idx.add(ids, embs)
        return idx
