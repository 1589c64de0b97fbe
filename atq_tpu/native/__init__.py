"""ctypes bindings for the native host-side kernels (csrc/atq_native.cpp).

Build with ``make -C csrc`` (or the library is built on first use if a
compiler is available). All entry points fall back to numpy when the
shared library is missing, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libatq_native.so")
_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.isdir(_CSRC):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.atq_pack_ternary.restype = ctypes.c_int
    lib.atq_pack_ternary.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.atq_unpack_ternary.restype = None
    lib.atq_unpack_ternary.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.atq_pack_planar.restype = ctypes.c_int
    lib.atq_pack_planar.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.atq_ternarize.restype = ctypes.c_int64
    lib.atq_ternarize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_float, ctypes.POINTER(ctypes.c_double),
    ]
    lib.atq_sparse_ell.restype = ctypes.c_int64
    lib.atq_sparse_ell.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def pack_ternary(values: np.ndarray) -> np.ndarray:
    """Flat reference-format 2-bit packing of a float32 ternary array."""
    flat = np.ascontiguousarray(values, dtype=np.float32).reshape(-1)
    out = np.zeros((flat.size + 3) // 4, dtype=np.uint8)
    lib = _load()
    if lib is None:
        mapped = (flat + 1).astype(np.uint8)
        pad = (-flat.size) % 4
        if pad:
            mapped = np.concatenate([mapped, np.zeros(pad, np.uint8)])
        q = mapped.reshape(-1, 4)
        return (q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4)
                | (q[:, 3] << 6)).astype(np.uint8)
    rc = lib.atq_pack_ternary(_fptr(flat), _u8ptr(out), flat.size)
    if rc != 0:
        raise ValueError("Input must contain only ternary values (-1, 0, 1)")
    return out


def unpack_ternary(packed: np.ndarray, n: int,
                   shape=None) -> np.ndarray:
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    out = np.empty(n, dtype=np.float32)
    lib = _load()
    if lib is None:
        vals = (packed[:, None] >> np.asarray([0, 2, 4, 6], np.uint8)) & 0x3
        out = vals.reshape(-1)[:n].astype(np.float32) - 1.0
    else:
        lib.atq_unpack_ternary(_u8ptr(packed), _fptr(out), n)
    return out.reshape(shape) if shape is not None else out


def pack_planar(values: np.ndarray, k_align: int = 512) -> np.ndarray:
    """Planar packing (kernel layout) of a 2-D float32 ternary matrix."""
    values = np.ascontiguousarray(values, dtype=np.float32)
    rows, cols = values.shape
    k_padded = cols + ((-cols) % k_align)
    out = np.zeros((rows, k_padded // 4), dtype=np.uint8)
    lib = _load()
    if lib is None:
        from atq_tpu.core.packing import pack_planar as jnp_pack_planar

        return np.asarray(jnp_pack_planar(values, k_align))
    rc = lib.atq_pack_planar(_fptr(values), _u8ptr(out), rows, cols,
                             k_padded)
    if rc != 0:
        raise ValueError("Input must contain only ternary values (-1, 0, 1)")
    return out


def ternarize(weights: np.ndarray, threshold: float):
    """Threshold-ternarize on the host; returns (w_t, nnz, dot) where dot =
    sum(w * w_t) for the optimal-alpha formula."""
    flat = np.ascontiguousarray(weights, dtype=np.float32).reshape(-1)
    out = np.empty_like(flat)
    lib = _load()
    if lib is None:
        out = np.where(flat > threshold, 1.0,
                       np.where(flat < -threshold, -1.0, 0.0)).astype(
            np.float32)
        nnz = int(np.sum(out != 0))
        dot = float(np.sum(flat * out))
    else:
        acc = ctypes.c_double(0.0)
        nnz = int(lib.atq_ternarize(_fptr(flat), _fptr(out), flat.size,
                                    ctypes.c_float(threshold),
                                    ctypes.byref(acc)))
        dot = acc.value
    return out.reshape(weights.shape), nnz, dot


def _i32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def sparse_ell(correction: np.ndarray, c: int):
    """Hybrid ELL+COO arrays for a sparse correction matrix.

    Returns ``(idx (n,c) int32, val (n,c) f32, coo_row, coo_col, coo_val)``
    — the first ``c`` nonzeros per row in column order in the ELL part,
    the spill in the COO triple. Native single pass when the library is
    present; fully vectorized numpy otherwise (no per-row Python loop).
    """
    correction = np.ascontiguousarray(correction, dtype=np.float32)
    n, k = correction.shape
    nnz_per_row = np.count_nonzero(correction, axis=1)
    spill_total = int(np.maximum(nnz_per_row - c, 0).sum())
    idx = np.zeros((n, c), np.int32)
    val = np.zeros((n, c), np.float32)
    lib = _load()
    if lib is not None:
        coo_row = np.empty(spill_total, np.int32)
        coo_col = np.empty(spill_total, np.int32)
        coo_val = np.empty(spill_total, np.float32)
        wrote = int(lib.atq_sparse_ell(
            _fptr(correction), n, k, c, _i32ptr(idx), _fptr(val),
            _i32ptr(coo_row), _i32ptr(coo_col), _fptr(coo_val)))
        assert wrote == spill_total, (wrote, spill_total)
        return idx, val, coo_row, coo_col, coo_val
    rows, cols = np.nonzero(correction)  # row-major order
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(nnz_per_row, out=starts[1:])
    pos = np.arange(rows.size) - starts[rows]  # position within its row
    ell = pos < c
    idx[rows[ell], pos[ell]] = cols[ell]
    val[rows[ell], pos[ell]] = correction[rows[ell], cols[ell]]
    sp = ~ell
    return (idx, val, rows[sp].astype(np.int32),
            cols[sp].astype(np.int32),
            correction[rows[sp], cols[sp]].astype(np.float32))
