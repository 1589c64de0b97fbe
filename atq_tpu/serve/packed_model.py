"""Packed serving path: run trained ATQ models from 2-bit weights.

The reference motivates bit-packing with edge deployment but can only
simulate it (atq/bit_packing.py:148-176 unpacks in Python before every
matmul). Here the trained quantized layers are exported ONCE into the
kernel-native planar 2-bit layout plus a sparse full-precision correction,
and inference runs the Pallas packed matmul directly from those planes:

    w_mixed = w_t * alpha * (1 - mask) + w * mask
            = w_t * alpha + mask * (w - w_t * alpha)
    y = packed_matmul(x, packed(w_t), alpha) + x @ correction.T + bias

``correction = mask * (w - w_t * alpha)`` has only precision_ratio (5-25%)
nonzeros, so it is stored SPARSE in padded per-row (ELL) form: ``corr_idx``
(N, C) uint16 column indices + ``corr_val`` (N, C) bf16 values, with C =
the max per-row nonzero count. The correction term is computed as a narrow
gathered-dense contraction ``einsum('mnc,nc->mn', x[:, idx], vals)`` — at
serving batch sizes the gather is tiny and the products accumulate in f32.

Total weight bytes per layer: K*N/4 (2-bit planes) + ~4*p*K*N sparse
correction (p = precision_ratio) vs 4*K*N dense f32 — ≈8.9x end-to-end at
p=0.05 (vs 1.75x when the correction was stored dense). A dense-correction
path (one fused Pallas kernel, ops/ternary_matmul.py:packed_ternary_matmul_rpb)
remains available via ``pack_quantized_layer(..., sparse_correction=False)``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from atq_tpu.core.packing import pack_planar, pack_planar32
from atq_tpu.core.quantize import adaptive_ternary_quantization
from atq_tpu.ops.ternary_matmul import packed_ternary_matmul

import dataclasses


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class StaticShape:
    """Hashable, jit-STATIC (N, K) logical weight shape inside a packed
    entry. Registered static so a whole packed collection can be passed
    as a jit ARGUMENT — the plane/correction arrays trace as normal
    device buffers while the shape stays a Python constant (it sizes the
    Pallas grid and the unpack, which must not be traced).

    Why arguments and not closures: a closed-over array is embedded in
    the compiled program as a literal constant. Serving programs built
    that way carry every weight byte inside the executable — compile
    requests bloat (a 680 MB HLO was rejected by this runtime's remote
    compiler in round 3), the buffers bypass the normal device-allocator
    path, and the program can't share weight buffers across shapes. All
    serving entry points now thread weights as arguments, matching the
    training paths (which were always argument-passing and have never
    crashed the worker).

    Behaves like the (n, k) tuple it replaces so every consumer keeps
    indexing/unpacking it."""

    nk: tuple

    def __iter__(self):
        return iter(self.nk)

    def __getitem__(self, i):
        return self.nk[i]

    def __len__(self):
        return len(self.nk)


def _pack32() -> bool:
    """ATQ_PACK32=1 stores the planes as int32 words (16 values/word,
    core/packing.py:pack_planar32) and the ELL indices as int32 — the
    native-lane serving variant introduced while chasing the
    nondeterministic packed-serving worker crash (uint8/uint16 device
    buffers are the emulated narrow-lane path on TPU). Same 2 bits per
    weight; read at export time."""
    import os

    return os.environ.get("ATQ_PACK32", "0") == "1"


def _sparse_ell(correction: np.ndarray):
    """Hybrid ELL+COO sparse form of the correction matrix.

    ELL part: per-row column indices + values padded to the MEAN per-row
    nonzero count (padding points at column 0 with value 0.0). Rows denser
    than the mean spill their excess entries into a tiny COO list — the
    global top-k mask's per-row counts are binomial, so the spill is ~0.5%
    of entries while mean-width padding keeps the ELL arrays ~25% smaller
    than max-width padding (what pushes end-to-end compression past 8x)."""
    n, k = correction.shape
    nnz_per_row = (correction != 0).sum(axis=1)
    total_nnz = int(nnz_per_row.sum())
    if total_nnz == 0:
        return None
    c = max(1, int(round(total_nnz / n)))
    # Single native C pass (csrc/atq_native.cpp:atq_sparse_ell) or the
    # vectorized numpy fallback — either way no per-row Python loop, so
    # export cost stays flat as layers grow.
    from atq_tpu.native import sparse_ell

    idx, val, coo_row, coo_col, coo_val = sparse_ell(correction, c)
    if _pack32():
        idx_dtype = row_dtype = np.int32
    else:
        idx_dtype = np.uint16 if k <= np.iinfo(np.uint16).max else np.int32
        row_dtype = np.uint16 if n <= np.iinfo(np.uint16).max else np.int32
    out = {
        "corr_idx": jnp.asarray(idx.astype(idx_dtype)),
        "corr_val": jnp.asarray(val, jnp.bfloat16),
    }
    if coo_row.size:
        out["coo_row"] = jnp.asarray(coo_row.astype(row_dtype))
        out["coo_col"] = jnp.asarray(coo_col.astype(idx_dtype))
        out["coo_val"] = jnp.asarray(coo_val, jnp.bfloat16)
    return out


import contextlib


@contextlib.contextmanager
def _host_cpu():
    """Context placing export math on the CPU backend: packing is
    host-side prep, and eager dispatch on a remote TPU backend pays a
    compile+roundtrip per primitive (minutes for a full model export).
    Also disables the Pallas gates (they key off the PROCESS backend,
    which stays 'tpu', but the ops here run on the CPU device)."""
    import os

    prev = os.environ.get("ATQ_NO_PALLAS")
    os.environ["ATQ_NO_PALLAS"] = "1"
    # Probe for the CPU backend OUTSIDE the yield: wrapping the yield in
    # try/except would swallow RuntimeErrors raised by the caller's body
    # (they propagate into the generator at the yield point) and then
    # trip contextlib's "generator didn't stop after throw()".
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:  # no cpu backend registered
        cpu = None
    try:
        if cpu is None:
            yield
        else:
            with jax.default_device(cpu):
                yield
    finally:
        if prev is None:
            os.environ.pop("ATQ_NO_PALLAS", None)
        else:
            os.environ["ATQ_NO_PALLAS"] = prev


def pack_quantized_layer(params: Dict, quant: Optional[Dict] = None,
                         sparse_correction: bool = True) -> Dict:
    """Export one TernaryLinear/RPB layer's params into serving form.
    All math runs on the host CPU backend (see :func:`_host_cpu`)."""
    with _host_cpu():
        return _pack_quantized_layer(params, quant, sparse_correction)


def _pack_quantized_layer(params: Dict, quant: Optional[Dict],
                          sparse_correction: bool) -> Dict:
    weight = np.asarray(params["weight"])
    alpha = params["alpha"]
    sparsity = (quant or {}).get("sparsity_target", 0.3)
    is_ttq = "wp" in params and "wn" in params
    w_t, a = adaptive_ternary_quantization(
        jnp.asarray(weight), alpha=jnp.asarray(alpha),
        sparsity_target=sparsity,
    )
    packed = pack_planar32(w_t) if _pack32() else pack_planar(w_t)
    entry = {
        "packed": packed,
        "alpha": jnp.asarray(a).reshape(()),
        "shape": StaticShape(tuple(int(d) for d in weight.shape)),
    }
    if is_ttq:
        # TTQ layers carry asymmetric scales (nn/layers.py grad_mode='ttq',
        # effective weight wp·[w>t] − wn·[w<−t]): the ternary PATTERN is
        # the same threshold rule the symmetric quantizer uses, so the
        # planes above are reused; the kernel applies the two scales at
        # decode (ops/ternary_matmul.py alpha_neg).
        entry["alpha"] = jnp.asarray(params["wp"], jnp.float32).reshape(())
        entry["alpha_neg"] = jnp.asarray(params["wn"],
                                         jnp.float32).reshape(())
    if "bias" in params:
        entry["bias"] = jnp.asarray(params["bias"])
    mask = (quant or {}).get("precision_mask")
    if mask is not None:
        w_t_np = np.asarray(w_t)
        if is_ttq:
            wp = float(entry["alpha"])
            wn = float(entry["alpha_neg"])
            w_q = wp * np.maximum(w_t_np, 0.0) + wn * np.minimum(w_t_np, 0.0)
        else:
            w_q = w_t_np * float(jnp.asarray(a).reshape(()))
        correction = np.asarray(mask) * (weight - w_q)
        # bf16-round the stored values so sparse and dense paths serve the
        # exact same numbers.
        correction = np.asarray(
            jnp.asarray(correction, jnp.bfloat16).astype(jnp.float32))
        if sparse_correction:
            ell = _sparse_ell(correction)
            if ell is not None:
                entry.update(ell)
        else:
            entry["correction"] = jnp.asarray(correction, jnp.bfloat16)
    return entry


def packed_linear_apply(entry: Dict, x: jax.Array) -> jax.Array:
    """Forward through a packed layer.

    Sparse (default) RPB correction: Pallas packed ternary matmul + a
    narrow gathered-dense contraction over the per-row nonzeros. Dense
    correction entries instead run ONE fused Pallas kernel (ternary dots +
    correction dot accumulate in the same VMEM tile)."""
    n, k = entry["shape"]
    alpha_neg = entry.get("alpha_neg")  # TTQ asymmetric scale, else None
    is_p32 = entry["packed"].dtype == jnp.int32  # pack_planar32 layout
    if "correction" in entry and alpha_neg is None and not is_p32:
        from atq_tpu.ops.ternary_matmul import packed_ternary_matmul_rpb

        y = packed_ternary_matmul_rpb(x, entry["packed"],
                                      entry["correction"], (n, k),
                                      alpha=entry["alpha"])
    else:
        y = packed_ternary_matmul(x, entry["packed"], (n, k),
                                  alpha=entry["alpha"],
                                  layout="planar32" if is_p32 else "planar",
                                  alpha_neg=alpha_neg)
        if "correction" in entry:  # dense correction (TTQ or planar32)
            y = y + jnp.matmul(x.astype(jnp.float32),
                               entry["correction"].astype(jnp.float32).T
                               ).astype(y.dtype)
        if "corr_idx" in entry:
            gathered = jnp.take(x, entry["corr_idx"].astype(jnp.int32),
                                axis=-1)  # (m, N, C)
            vals = entry["corr_val"].astype(jnp.float32)
            y = y + jnp.einsum("mnc,nc->mn", gathered.astype(jnp.float32),
                               vals).astype(y.dtype)
        if "coo_row" in entry:
            contrib = (x[:, entry["coo_col"].astype(jnp.int32)]
                       .astype(jnp.float32)
                       * entry["coo_val"].astype(jnp.float32))  # (m, nnz)
            spill = jax.ops.segment_sum(
                contrib.T, entry["coo_row"].astype(jnp.int32),
                num_segments=n)  # (N, m)
            y = y + spill.T.astype(y.dtype)
    if "bias" in entry:
        y = y + entry["bias"]
    return y


def pack_quantized_params(params: Dict, quant: Dict,
                          layer_names) -> Dict[str, Dict]:
    """Pack a set of quantized layers by name from a model's pytrees."""
    return {
        name: pack_quantized_layer(params[name], quant.get(name))
        for name in layer_names
    }


class PackedClassifier:
    """Serving wrapper for ATQImageClassifier: FP conv features + packed
    ternary classifier head (the reference's deployment target)."""

    def __init__(self, params: Dict, quant: Dict, batch_stats: Dict,
                 use_rpb: bool = True, hidden_size: int = 128):
        from atq_tpu.models.image_classifier import ATQImageClassifier

        self._model = ATQImageClassifier(use_rpb=use_rpb,
                                         hidden_size=hidden_size)
        # Weights are committed to the device ONCE and passed as jit
        # ARGUMENTS on every call — not closed over. Closure capture
        # embeds every weight byte into the executable as literal
        # constants (see StaticShape docstring); argument passing keeps
        # the program weight-free and the buffers on the normal
        # device-allocator path, exactly like the (stable) training
        # steps.
        self._features_vars = jax.device_put({
            "params": params["features"],
            "batch_stats": batch_stats["features"],
        })
        self.packed = jax.device_put(pack_quantized_params(
            params, quant, ["classifier_0", "classifier_3"]
        ))
        self._apply = jax.jit(self._forward)

    @staticmethod
    def _forward(features_vars, packed, x):
        from atq_tpu.models.image_classifier import _ConvFeatures

        features = _ConvFeatures().apply(features_vars, x, train=False)
        h = packed_linear_apply(packed["classifier_0"], features)
        h = jax.nn.relu(h)
        return packed_linear_apply(packed["classifier_3"], h)

    def __call__(self, x):
        return self._apply(self._features_vars, self.packed, x)

    def memory_footprint_bytes(self) -> Dict[str, int]:
        """Serving weight bytes: packed planes + corrections + bias."""
        total = 0
        for entry in self.packed.values():
            total += entry["packed"].size * entry["packed"].dtype.itemsize
            if "correction" in entry:
                total += entry["correction"].size * 2
            if "corr_idx" in entry:
                total += entry["corr_idx"].size * entry["corr_idx"].dtype.itemsize
                total += entry["corr_val"].size * 2
            if "coo_row" in entry:
                total += entry["coo_row"].size * entry["coo_row"].dtype.itemsize
                total += entry["coo_col"].size * entry["coo_col"].dtype.itemsize
                total += entry["coo_val"].size * 2
            if "bias" in entry:
                total += entry["bias"].size * 4
        dense = sum(int(np.prod(tuple(e["shape"]))) * 4
                    for e in self.packed.values())
        return {"packed_bytes": int(total), "dense_fp32_bytes": int(dense)}


def export_packed_collection(params: Dict, quant: Optional[Dict] = None,
                             sparse_correction: bool = True) -> Dict:
    """Export EVERY quantized layer in a model's param tree to serving form.

    Walks ``params`` for subtrees shaped like TernaryLinear /
    ResidualPrecisionBoostLinear ({'weight' (2-D), 'alpha', ...}) and mirrors
    them as ``{..., layer: {'entry': <packed entry>}}``. The result is a
    drop-in ``'packed'`` variable collection: quantized layers detect it and
    serve straight from the 2-bit planes + sparse correction while every
    other module (convs, norms, embeddings) runs its normal eval path::

        packed = export_packed_collection(variables["params"],
                                          variables.get("quant"))
        model.apply({**variables, "packed": packed}, x, ..., train=False)

    Works for ANY model built from the framework's quantized layers — the
    flagship retrieval model included — not just the classifier wrapper.
    """
    quant = quant or {}

    def walk(p_node, q_node):
        if not isinstance(p_node, dict):
            return None
        if ("weight" in p_node and "alpha" in p_node
                and getattr(p_node["weight"], "ndim", 0) == 2):
            return {"entry": pack_quantized_layer(
                p_node, q_node if isinstance(q_node, dict) else None,
                sparse_correction=sparse_correction)}
        out = {}
        for k, v in p_node.items():
            sub = walk(v, q_node.get(k, {}) if isinstance(q_node, dict)
                       else {})
            if sub:
                out[k] = sub
        return out or None

    return walk(params, quant) or {}


def packed_collection_bytes(packed: Dict) -> int:
    """Total serving weight bytes in an exported 'packed' collection."""
    total = 0

    def walk(node):
        nonlocal total
        if isinstance(node, dict):
            if "packed" in node and "shape" in node:
                total += node["packed"].size * node["packed"].dtype.itemsize
                if "correction" in node:
                    total += node["correction"].size * 2
                for k2 in ("corr_idx", "corr_col", "coo_row", "coo_col"):
                    if k2 in node:
                        total += node[k2].size * node[k2].dtype.itemsize
                for k2 in ("corr_val", "coo_val"):
                    if k2 in node:
                        total += node[k2].size * 2
                if "bias" in node:
                    total += node["bias"].size * 4
            else:
                for v in node.values():
                    walk(v)

    walk(packed)
    return total
