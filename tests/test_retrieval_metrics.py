"""Golden parity for the retrieval R@K protocol vs the reference's
compute_retrieval_metrics (/root/reference/train_multimodal.py:23-90),
including the 1e-6 rank-tie epsilon and tied-score behavior."""

import sys

import numpy as np
import pytest

from atq_tpu.train.retrieval_metrics import compute_retrieval_metrics


@pytest.fixture(scope="module")
def ref_metrics():
    sys.path.insert(0, "/root/reference")
    # train_multimodal imports heavy deps at module import; pull just the
    # function by loading the module file in an isolated namespace is
    # overkill — importing works because torch et al. are installed, but
    # torchvision is not, and train_multimodal imports it transitively.
    # Instead, re-derive the oracle with torch directly below.
    sys.path.remove("/root/reference")
    import torch

    def oracle(similarity, topk=(1, 5, 10)):
        similarity = torch.tensor(similarity)
        metrics = {}
        i2t_ranks = []
        for i in range(similarity.size(0)):
            sim_scores = similarity[i].clone()
            if i < len(sim_scores):
                target_score = sim_scores[i].clone()
                sim_scores[i] -= 1e-6
                i2t_ranks.append(
                    (sim_scores >= target_score).sum().item()
                )
        t2i_ranks = []
        for i in range(similarity.size(1)):
            sim_scores = similarity[:, i].clone()
            if i < len(sim_scores):
                target_score = sim_scores[i].clone()
                sim_scores[i] -= 1e-6
                t2i_ranks.append(
                    (sim_scores >= target_score).sum().item()
                )
        for k in topk:
            i2t = (100 * sum(1 for r in i2t_ranks if r <= k)
                   / len(i2t_ranks)) if i2t_ranks else 0.0
            t2i = (100 * sum(1 for r in t2i_ranks if r <= k)
                   / len(t2i_ranks)) if t2i_ranks else 0.0
            metrics[f"image_to_text_R@{k}"] = i2t
            metrics[f"text_to_image_R@{k}"] = t2i
            metrics[f"mean_R@{k}"] = (i2t + t2i) / 2
        return metrics

    return oracle


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_metrics_parity_random(ref_metrics, seed):
    rng = np.random.RandomState(seed)
    sim = rng.randn(40, 40).astype(np.float32)
    ours = compute_retrieval_metrics(sim)
    theirs = ref_metrics(sim)
    for k, v in theirs.items():
        assert abs(ours[k] - v) < 1e-9, k


def test_metrics_parity_with_ties(ref_metrics):
    """Tied scores exercise the 1e-6 epsilon rule."""
    rng = np.random.RandomState(3)
    sim = rng.randint(0, 3, (20, 20)).astype(np.float32)  # many exact ties
    ours = compute_retrieval_metrics(sim)
    theirs = ref_metrics(sim)
    for k, v in theirs.items():
        assert abs(ours[k] - v) < 1e-9, k


def test_perfect_retrieval():
    sim = np.eye(10, dtype=np.float32)
    m = compute_retrieval_metrics(sim)
    assert m["mean_R@1"] == 100.0
