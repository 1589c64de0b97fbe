"""Root-cause pin for text_to_image_R@1 == 0 (VERDICT round-1 weak #3).

The eval protocol (reference train_multimodal.py:197-241) embeds one row
per (image, caption) pair, so every image appears 5x in the t2i gallery
with bitwise-identical embeddings. The rank rule counts score ties
(only the target's own entry gets the 1e-6 decrement), so a text's rank is
always >= #duplicates-1 and t2i R@1 is structurally zero — in the REFERENCE
implementation as well, which these tests run as an oracle.
"""

import numpy as np
import pytest

from atq_tpu.train.retrieval_metrics import (
    compute_retrieval_metrics,
    compute_retrieval_metrics_dedup,
)


def _reference_metrics(similarity):
    torch = pytest.importorskip("torch")
    src = open("/root/reference/train_multimodal.py").read()
    start = src.index("def compute_retrieval_metrics")
    end = src.index("\ndef ", start + 10)
    ns = {}
    exec(src[start:end], {"torch": torch}, ns)  # reference as oracle
    return ns["compute_retrieval_metrics"](torch.tensor(similarity))


def _duplicated_gallery(seed=0, n_img=4, dup=5, dim=8):
    rng = np.random.RandomState(seed)
    img = rng.randn(n_img, dim).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)  # dot == cosine
    all_img = np.repeat(img, dup, axis=0)
    # texts nearly perfectly aligned with their own image
    all_txt = all_img + 0.01 * rng.randn(n_img * dup, dim).astype(np.float32)
    return all_img, all_txt


def test_t2i_r1_is_structurally_zero_in_reference_and_ours():
    all_img, all_txt = _duplicated_gallery()
    sim = all_img @ all_txt.T

    ref = _reference_metrics(sim)
    got = compute_retrieval_metrics(sim)

    # The reference itself returns exactly 0 despite near-perfect
    # embeddings — duplicated-gallery ties, not an embedding bug.
    assert ref["text_to_image_R@1"] == 0.0
    assert got["text_to_image_R@1"] == 0.0
    # ...while R@5 (past the 4 duplicates) is healthy in both.
    assert ref["text_to_image_R@5"] >= 70.0
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=1e-9, err_msg=k)


def test_t2i_r1_nonzero_without_duplicates():
    rng = np.random.RandomState(1)
    all_img = rng.randn(20, 8).astype(np.float32)
    all_txt = all_img + 0.01 * rng.randn(20, 8).astype(np.float32)
    sim = all_img @ all_txt.T

    ref = _reference_metrics(sim)
    got = compute_retrieval_metrics(sim)
    assert got["text_to_image_R@1"] > 50.0
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=1e-9, err_msg=k)


def test_dedup_metric_recovers_t2i_r1():
    """The *_dedup diagnostic collapses duplicate gallery rows and reports
    the real t2i quality the parity protocol hides."""
    all_img, all_txt = _duplicated_gallery()
    dedup = compute_retrieval_metrics_dedup(all_img, all_txt)
    assert dedup["text_to_image_R@1_dedup"] > 90.0

    # Hand-built case: 2 images x 2 captions, text 0 nearest img B => miss.
    img = np.asarray([[1.0, 0.0], [0.0, 1.0]], np.float32)
    all_img = np.repeat(img, 2, axis=0)
    all_txt = np.asarray([[0.1, 0.9],   # pair of image A but nearer B
                          [0.9, 0.1],   # pair of image A, nearest A
                          [0.0, 1.0],   # image B, nearest B
                          [0.2, 0.8]],  # image B, nearest B
                         np.float32)
    dedup = compute_retrieval_metrics_dedup(all_img, all_txt)
    assert dedup["text_to_image_R@1_dedup"] == 75.0
    assert dedup["text_to_image_R@5_dedup"] == 100.0
