"""Retrieval metrics (Recall@K, both directions).

Reference: /root/reference/train_multimodal.py:23-90. Protocol quirks kept
for metric parity: each (image, caption) pair is its own identity (5 caption
rows per image in the eval set, diagonal = positive), and ranks use the
1e-6 tie-breaking epsilon: rank_i = #{ scores >= target - 1e-6 } computed
after lowering the target's own score.

KNOWN PROTOCOL ARTIFACT — text_to_image_R@1 is structurally 0: the image
gallery holds one row per (image, caption) PAIR, so every image's embedding
appears 5 times (identical rows). For any text, the 4 duplicate rows of its
positive image tie with the target score exactly; only the target's own
entry gets the 1e-6 decrement, so the duplicates are all counted and the
t2i rank is always >= 4 -> R@1 == 0 no matter how good the embeddings are
(R@5 is the first meaningful t2i recall). Verified against the reference
implementation as an oracle in tests/test_retrieval_metrics_protocol.py:
the reference returns t2i R@1 = 0.0 on a duplicated gallery with
near-perfect embeddings too. :func:`compute_retrieval_metrics_dedup` adds
the standard deduplicated-gallery t2i metrics as extra diagnostics.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def compute_retrieval_metrics(similarity: np.ndarray,
                              topk: List[int] = (1, 5, 10)) -> Dict:
    similarity = np.asarray(similarity)
    n_images, n_texts = similarity.shape
    metrics: Dict[str, float] = {}

    # Image-to-text: for row i the positive is column i.
    n = min(n_images, n_texts)
    diag = np.diagonal(similarity)[:n]

    sim_rows = similarity[:n].copy()
    rows = np.arange(n)
    sim_rows[rows, rows] -= 1e-6
    i2t_ranks = np.sum(sim_rows >= diag[:, None], axis=1)

    sim_cols = similarity[:, :n].T.copy()
    sim_cols[rows, rows] -= 1e-6
    t2i_ranks = np.sum(sim_cols >= diag[:, None], axis=1)

    for k in topk:
        i2t = 100.0 * np.mean(i2t_ranks <= k) if n else 0.0
        t2i = 100.0 * np.mean(t2i_ranks <= k) if n else 0.0
        metrics[f"image_to_text_R@{k}"] = float(i2t)
        metrics[f"text_to_image_R@{k}"] = float(t2i)
        metrics[f"mean_R@{k}"] = float((i2t + t2i) / 2)
    return metrics


def compute_retrieval_metrics_dedup(all_img: np.ndarray,
                                    all_txt: np.ndarray,
                                    topk: List[int] = (1, 5, 10)) -> Dict:
    """Deduplicated-gallery t2i Recall@K (standard Flickr/COCO protocol).

    The parity metric above inherits the reference's duplicated image
    gallery, which forces t2i R@1 to 0 (see module docstring). Here the
    gallery keeps one row per UNIQUE image embedding (duplicates detected
    by exact row equality — eval transforms are deterministic, so the 5
    pair-rows of an image are bitwise identical), and a text's rank counts
    strictly-better unique images, +1. Emitted as ``*_dedup`` diagnostics
    alongside the parity numbers.
    """
    all_img = np.asarray(all_img)
    all_txt = np.asarray(all_txt)
    uniq, owner = np.unique(all_img, axis=0, return_inverse=True)
    sims = all_txt @ uniq.T  # (n_texts, n_unique_images)
    n = min(all_img.shape[0], all_txt.shape[0])
    target = sims[np.arange(n), owner[:n]]
    ranks = 1 + np.sum(sims[:n] > target[:, None] + 1e-6, axis=1)
    return {
        f"text_to_image_R@{k}_dedup":
            float(100.0 * np.mean(ranks <= k)) if n else 0.0
        for k in topk
    }
