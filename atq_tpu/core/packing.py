"""2-bit ternary weight packing (vectorized, TPU-friendly).

Re-implements the reference's bit-packing format
(`/root/reference/atq/bit_packing.py:4-176`) without its per-element Python
loops (bit_packing.py:60-69, :108-119 — O(n) interpreter-bound there, pure
lane-wise int ops here).

Format (identical to the reference):
- encoding: -1 -> 00, 0 -> 01, +1 -> 10 (2 bits per value)
- 4 values per byte, value i occupies bits [2*(i%4), 2*(i%4)+1] of byte i//4
- packed dict: {"packed_weights": uint8[ceil(n/4)], "original_shape": tuple,
  "metadata": {"num_values": n, "encoding": {0: -1, 1: 0, 2: 1}}}

The reference's `fast_ternary_matmul` unpacks then matmuls and is explicitly
a simulation ("for actual speed gains, this would need native implementation",
bit_packing.py:152-154). The native implementation here is the Pallas kernel
in atq_tpu/ops/ternary_matmul.py, which computes directly from the packed
planes; `fast_ternary_matmul` below keeps the reference's API and routes to
it when shapes allow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class TernaryBitPacking:
    """Pack/unpack ternary weights into the 2-bit reference format."""

    @staticmethod
    def pack_ternary_weights(ternary_weights) -> dict:
        """Pack a {-1, 0, +1} tensor into uint8 planes (4 values/byte)."""
        ternary_weights = jnp.asarray(ternary_weights)
        # Validate ternary-only input (reference: bit_packing.py:36-39).
        # Done host-side on concrete values only; inside jit we skip it.
        if not isinstance(ternary_weights, jax.core.Tracer):
            host = np.asarray(ternary_weights)
            if not np.all(np.isin(host, (-1.0, 0.0, 1.0))):
                raise ValueError(
                    "Input must contain only ternary values (-1, 0, 1)"
                )

        original_shape = tuple(ternary_weights.shape)
        flat = ternary_weights.reshape(-1)
        num_values = flat.size

        # Map [-1, 0, 1] -> [0, 1, 2]
        mapped = (flat + 1).astype(jnp.uint8)

        packed_size = (num_values + 3) // 4
        pad = packed_size * 4 - num_values
        if pad:
            # Padding with 0 (= encoded -1) matches the reference, whose
            # zero-initialized trailing bits decode as 0b00 -> -1; they are
            # ignored on unpack because num_values is recorded.
            mapped = jnp.concatenate([mapped, jnp.zeros((pad,), jnp.uint8)])

        quads = mapped.reshape(packed_size, 4)
        shifts = jnp.asarray([0, 2, 4, 6], dtype=jnp.uint8)
        packed = jnp.bitwise_or.reduce(
            quads << shifts, axis=1
        ).astype(jnp.uint8)

        return {
            "packed_weights": packed,
            "original_shape": original_shape,
            "metadata": {
                "num_values": num_values,
                "encoding": {0: -1, 1: 0, 2: 1},
            },
        }

    @staticmethod
    def unpack_ternary_weights(packed_data: dict, dtype=jnp.float32):
        """Inverse of :meth:`pack_ternary_weights`."""
        packed = jnp.asarray(packed_data["packed_weights"])
        original_shape = packed_data["original_shape"]
        num_values = packed_data["metadata"]["num_values"]

        shifts = jnp.asarray([0, 2, 4, 6], dtype=jnp.uint8)
        vals = (packed[:, None] >> shifts) & jnp.uint8(0x3)
        flat = vals.reshape(-1)[:num_values]
        # [0, 1, 2] -> [-1, 0, 1]
        return (flat.astype(dtype) - 1.0).reshape(original_shape)

    @staticmethod
    def compute_memory_savings(original_tensor) -> dict:
        """Theoretical savings of 2-bit packing vs float32
        (reference: bit_packing.py:121-146)."""
        n = int(np.prod(np.shape(original_tensor)))
        original_bytes = n * 4
        packed_bytes = (n * 2 + 7) // 8
        return {
            "original_bytes": original_bytes,
            "packed_bytes": packed_bytes,
            "compression_ratio": original_bytes / packed_bytes,
            "memory_reduction": 1.0 - (packed_bytes / original_bytes),
        }

    @staticmethod
    def fast_ternary_matmul(packed_data: dict, input_tensor, alpha=1.0):
        """``input @ unpack(W)^T * alpha`` from packed planes.

        Mirrors the reference API (bit_packing.py:148-176). Routes to the
        Pallas TPU kernel when the shapes are kernel-eligible; otherwise
        unpacks and uses an XLA matmul (still fully on-device and fused —
        unlike the reference's interpreter-bound simulation).
        """
        input_tensor = jnp.asarray(input_tensor)
        from atq_tpu.ops.ternary_matmul import (
            packed_ternary_matmul, pallas_eligible,
        )

        original_shape = packed_data["original_shape"]
        if (
            len(original_shape) == 2
            and input_tensor.ndim == 2
            and pallas_eligible(input_tensor.shape, original_shape)
        ):
            return packed_ternary_matmul(
                input_tensor,
                packed_data["packed_weights"],
                original_shape,
                alpha,
                layout="flat",
            )

        weights = TernaryBitPacking.unpack_ternary_weights(
            packed_data, dtype=input_tensor.dtype
        )
        return jnp.matmul(input_tensor, weights.T) * alpha


def pack_rows(ternary_weights: jax.Array) -> jax.Array:
    """Pack a 2-D ternary (out, in) matrix row-wise into uint8 lanes.

    Unlike the flat reference format, this keeps the row structure
    (out, ceil(in/4)) so a matmul kernel can tile over output rows while
    DMA-ing contiguous packed K-slabs. Used by the Pallas kernel path.
    """
    out_features, in_features = ternary_weights.shape
    k_pad = (-in_features) % 4
    w = ternary_weights
    if k_pad:
        w = jnp.pad(w, ((0, 0), (0, k_pad)), constant_values=0.0)
    mapped = (w + 1).astype(jnp.uint8).reshape(out_features, -1, 4)
    shifts = jnp.asarray([0, 2, 4, 6], dtype=jnp.uint8)
    return jnp.bitwise_or.reduce(mapped << shifts, axis=2).astype(jnp.uint8)


def unpack_rows(packed: jax.Array, in_features: int, dtype=jnp.float32):
    """Inverse of :func:`pack_rows`."""
    shifts = jnp.asarray([0, 2, 4, 6], dtype=jnp.uint8)
    vals = (packed[:, :, None] >> shifts) & jnp.uint8(0x3)
    flat = vals.reshape(packed.shape[0], -1)[:, :in_features]
    return flat.astype(dtype) - 1.0


def pack_planar(ternary_weights: jax.Array, k_align: int = 512) -> jax.Array:
    """Planar 2-bit packing for the Pallas TPU kernel.

    The K axis is zero-padded to a multiple of ``k_align`` (so K/4 is a
    whole number of 128-lane vectors) and split into 4 contiguous quarters;
    byte b of a row holds quarter values (Q0[b], Q1[b], Q2[b], Q3[b]) in
    bit fields (0-1, 2-3, 4-5, 6-7). Decoding field s therefore yields a
    CONTIGUOUS (N, K/4) block — no interleaving, so the kernel needs only
    shifts, masks, and static slices (all Mosaic-supported lane ops).
    """
    out_features, in_features = ternary_weights.shape
    k_pad = (-in_features) % k_align
    w = ternary_weights
    if k_pad:
        w = jnp.pad(w, ((0, 0), (0, k_pad)), constant_values=0.0)
    kq = w.shape[1] // 4
    quarters = (w + 1).astype(jnp.uint8).reshape(out_features, 4, kq)
    return (quarters[:, 0]
            | (quarters[:, 1] << 2)
            | (quarters[:, 2] << 4)
            | (quarters[:, 3] << 6)).astype(jnp.uint8)


def unpack_planar(packed: jax.Array, in_features: int, dtype=jnp.float32):
    """Inverse of :func:`pack_planar` (drops the K padding)."""
    shifts = jnp.asarray([0, 2, 4, 6], dtype=jnp.uint8)
    quarters = (packed[:, None, :] >> shifts[None, :, None]) & jnp.uint8(0x3)
    full = quarters.reshape(packed.shape[0], -1)
    return full[:, :in_features].astype(dtype) - 1.0


def pack_planar32(ternary_weights: jax.Array,
                  k_align: int = 2048) -> jax.Array:
    """Planar 2-bit packing into int32 lanes (16 values per word).

    Same bits-per-weight as :func:`pack_planar`, but the storage word is
    int32 — the TPU's native lane width. Sub-32-bit vector ops (the uint8
    shift/mask decode) run on an emulated narrow-lane path in both Mosaic
    and XLA; packing into int32 keeps every decode op on the native path.
    Added while chasing the nondeterministic packed-serving worker crash
    (benchmarks/config4_soak.py): the uint8 planes + uint16 indices were
    the only exotic-dtype device buffers in the program.

    Layout: K is zero-padded to a multiple of ``k_align`` and split into
    16 contiguous sixteenths; bit field f (bits 2f..2f+1) of word j holds
    sixteenth f's value at offset j. Decoding field f yields a CONTIGUOUS
    (N, K/16) block, so a kernel contracts it against the matching
    contiguous x slab — shifts/masks/static slices only, like the uint8
    planar layout.
    """
    out_features, in_features = ternary_weights.shape
    k_pad = (-in_features) % k_align
    w = ternary_weights
    if k_pad:
        w = jnp.pad(w, ((0, 0), (0, k_pad)), constant_values=0.0)
    k16 = w.shape[1] // 16
    fields = (w + 1).astype(jnp.int32).reshape(out_features, 16, k16)
    shifts = jnp.arange(16, dtype=jnp.int32) * 2
    return jnp.bitwise_or.reduce(fields << shifts[None, :, None],
                                 axis=1).astype(jnp.int32)


# Encoded all-zeros word for padding rows of a planar32 matrix: every
# 2-bit field = 0b01 (the encoding of 0).
PLANAR32_ZERO_WORD = int(np.int32(0x55555555))


def unpack_planar32(packed: jax.Array, in_features: int,
                    dtype=jnp.float32):
    """Inverse of :func:`pack_planar32` (drops the K padding)."""
    shifts = jnp.arange(16, dtype=jnp.int32) * 2
    fields = (packed[:, None, :] >> shifts[None, :, None]) & jnp.int32(0x3)
    full = fields.reshape(packed.shape[0], -1)
    return full[:, :in_features].astype(dtype) - 1.0
