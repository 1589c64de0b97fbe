"""Retrieval metrics (Recall@K, both directions).

Reference: /root/reference/train_multimodal.py:23-90. Protocol quirks kept
for metric parity: each (image, caption) pair is its own identity (5 caption
rows per image in the eval set, diagonal = positive), and ranks use the
1e-6 tie-breaking epsilon: rank_i = #{ scores >= target - 1e-6 } computed
after lowering the target's own score.
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
