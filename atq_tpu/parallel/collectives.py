"""Explicit collectives for shard_map-style training steps.

The one true cross-device collective in this workload (SURVEY.md §2.6): the
in-batch contrastive similarity matrix needs the GLOBAL batch as its
negative pool, so per-device embedding shards must be all-gathered over ICI
before ``img @ txt.T`` (reference computes it single-device at
utils/enhanced_contrastive.py:85, models/multimodal_classifier.py:265).

Under plain jit+GSPMD these collectives are inserted automatically; these
helpers are for explicit shard_map steps and for tests that pin the
communication pattern.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def all_gather_embeddings(embeddings, axis_name: str = "data"):
    """Gather per-device embedding shards into the global batch along the
    leading axis (tiled all_gather over the mesh axis)."""
    return jax.lax.all_gather(embeddings, axis_name, axis=0, tiled=True)


def psum_grads(grads, axis_name: str = "data"):
    """Sum-reduce gradients across the data-parallel axis."""
    return jax.lax.psum(grads, axis_name)


def pmean_metrics(metrics, axis_name: str = "data"):
    return jax.lax.pmean(metrics, axis_name)


def global_contrastive_similarity(image_embeddings, text_embeddings,
                                  temperature, axis_name: str = "data"):
    """Local shards -> global similarity matrix (inside shard_map).

    Each device gathers both modality embeddings and computes the full
    matrix; rows are identical across devices so the loss is computed
    redundantly but communication is one all_gather per modality (the
    embeddings are tiny: batch x embed_dim).
    """
    img = all_gather_embeddings(image_embeddings, axis_name)
    txt = all_gather_embeddings(text_embeddings, axis_name)
    return jnp.matmul(img, txt.T) / temperature
