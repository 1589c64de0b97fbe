"""On-device train-time augmentation as batched jnp ops.

The reference applies torchvision transforms per item on the host
(``/root/reference/train.py:61-76``: RandomRotation(5) + RandomHorizontalFlip
for Fashion-MNIST; ``/root/reference/data/multimodal_data.py:141-149``:
RandomHorizontalFlip for Flickr8k). On a low-core host those per-item
transforms starve the chip (~100 ms/batch vs ~1 ms device step), so the
TPU-native pipeline transfers raw uint8 and performs the same augmentations
inside the jitted train step: every op here is shape-static, batched over
``(B, H, W, C)``, and fuses into the step under XLA.

Semantics match the host-side numpy analog (`atq_tpu.data.mnist._rotate_batch`):
bilinear sampling about the image center with zero fill outside the source
frame, angles drawn uniformly from ``[-max_deg, +max_deg]``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["random_rotate", "random_hflip", "classifier_augment"]


def _rotate_bilinear(images: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rotate each NHWC image by its own angle (radians), bilinear, zero-fill.

    At ``theta == 0`` the sampling grid lands exactly on the source pixels, so
    the op is an exact identity — callers rely on that for the no-augment case.
    """
    b, h, w, _ = images.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32) - cy,
        jnp.arange(w, dtype=jnp.float32) - cx,
        indexing="ij",
    )
    cos = jnp.cos(theta)[:, None, None]
    sin = jnp.sin(theta)[:, None, None]
    # Inverse-rotate output coords into the source frame (per-sample grid).
    src_x = cos * xx + sin * yy + cx
    src_y = -sin * xx + cos * yy + cy
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = (src_x - x0)[..., None]
    fy = (src_y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        flat = images.reshape(b, h * w, -1)
        lin = (yc * w + xc).reshape(b, h * w)
        return jnp.take_along_axis(flat, lin[..., None], axis=1).reshape(
            b, h, w, -1
        )

    out = (
        gather(y0i, x0i) * (1 - fx) * (1 - fy)
        + gather(y0i, x0i + 1) * fx * (1 - fy)
        + gather(y0i + 1, x0i) * (1 - fx) * fy
        + gather(y0i + 1, x0i + 1) * fx * fy
    )
    oob = (
        (src_x < 0) | (src_x > w - 1) | (src_y < 0) | (src_y > h - 1)
    )[..., None]
    return jnp.where(oob, 0.0, out)


def random_rotate(images: jnp.ndarray, rng: jax.Array,
                  max_deg: float = 5.0) -> jnp.ndarray:
    """Per-sample random rotation in ``[-max_deg, +max_deg]`` degrees
    (device analog of torchvision ``RandomRotation(max_deg)``,
    ``/root/reference/train.py:63``)."""
    b = images.shape[0]
    theta = jnp.deg2rad(
        jax.random.uniform(rng, (b,), minval=-max_deg, maxval=max_deg)
    )
    return _rotate_bilinear(images, theta)


def random_hflip(images: jnp.ndarray, rng: jax.Array,
                 p: float = 0.5) -> jnp.ndarray:
    """Per-sample horizontal flip with probability ``p`` (device analog of
    torchvision ``RandomHorizontalFlip``,
    ``/root/reference/data/multimodal_data.py:144``)."""
    b = images.shape[0]
    flips = jax.random.bernoulli(rng, p, (b,))
    return jnp.where(flips[:, None, None, None], images[:, :, ::-1, :],
                     images)


def classifier_augment(images: jnp.ndarray, rng: jax.Array, *,
                       flip: bool = True,
                       max_deg: float = 5.0) -> jnp.ndarray:
    """The classifier train-time augmentation pipeline, on device.

    Mirrors the reference's Fashion-MNIST transform stack
    (``/root/reference/train.py:61-67``): RandomRotation(5) then
    RandomHorizontalFlip (flips only for Fashion-MNIST — MNIST digits are
    chirality-sensitive, matching the reference's per-dataset transforms).
    """
    rot_rng, flip_rng = jax.random.split(rng)
    images = random_rotate(images, rot_rng, max_deg)
    if flip:
        images = random_hflip(images, flip_rng)
    return images
