"""Contrastive losses for image-text retrieval (pure JAX, fully vectorized).

- :class:`HardNegativeMiningInfoNCE` <- /root/reference/utils/enhanced_contrastive.py:8-162
- :class:`MultiPositiveInfoNCE`      <- /root/reference/utils/enhanced_contrastive.py:165-266
  (the reference computes it with per-row Python loops, :210-252; here it is
  one masked log-softmax — same math, one XLA fusion)
- :class:`ContrastiveLearningManager` <- /root/reference/utils/enhanced_contrastive.py:269-417

Semantic quirks preserved exactly:
- cosine-annealed temperature from 2x base to 0.5x base over the first 70%
  of epochs (:47-62);
- hard negatives = top ``hardest_mining_ratio`` off-diagonal similarities
  per row AND per column, up-weighted by (1 + hard_negative_weight) (:97-140);
- the entropy "regularizer" is ADDED with +lambda in
  HardNegativeMiningInfoNCE (:147-156) — despite the "prevent collapse"
  intent it *penalizes* entropy — while MultiPositiveInfoNCE uses -lambda
  (:254-261). Both signs reproduced as-is.

Data-parallel note: under a sharded batch the similarity matrix must cover
the GLOBAL batch for the negative pool to match single-device semantics —
see atq_tpu/parallel (all_gather of embeddings before calling these).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from atq_tpu.models.fusion import l2_normalize


def _entropy_of_rows(similarity):
    p = jax.nn.softmax(similarity, axis=1)
    logp = jax.nn.log_softmax(similarity, axis=1)
    return -jnp.mean(jnp.sum(p * logp, axis=1))


def _cross_entropy_diag(logits):
    """CE against the diagonal labels (in-batch identity matching)."""
    logp = jax.nn.log_softmax(logits, axis=1)
    return -jnp.mean(jnp.diagonal(logp))


class HardNegativeMiningInfoNCE:
    """Bidirectional InfoNCE over the in-batch similarity matrix with hard
    negative up-weighting, temperature annealing, and the (sign-quirky)
    entropy term."""

    def __init__(self, temperature: float = 0.07, lambda_reg: float = 0.02,
                 hard_negative_weight: float = 0.5,
                 hardest_mining_ratio: float = 0.5,
                 temperature_schedule: bool = True):
        self.temperature = temperature
        self.base_temperature = temperature
        self.lambda_reg = lambda_reg
        self.hard_negative_weight = hard_negative_weight
        self.hardest_mining_ratio = hardest_mining_ratio
        self.temperature_schedule = temperature_schedule
        self.current_epoch = 0
        self.total_epochs = 1

    def set_epoch(self, current_epoch: int, total_epochs: int):
        self.current_epoch = current_epoch
        self.total_epochs = total_epochs

    def get_current_temperature(self) -> float:
        """Host-side per-epoch scalar (pass into the jitted step as data)."""
        if not self.temperature_schedule:
            return self.temperature
        progress = min(1.0, self.current_epoch / (self.total_epochs * 0.7))
        max_temp = self.base_temperature * 2.0
        min_temp = self.base_temperature * 0.5
        temperature = max_temp - (max_temp - min_temp) * (
            1 - math.cos(progress * math.pi)
        ) / 2
        return max(min(temperature, max_temp), min_temp)

    def __call__(self, image_embeddings, text_embeddings,
                 weights: Optional[jax.Array] = None,
                 temperature: Optional[jax.Array] = None):
        """Compute the loss. ``temperature`` may be passed explicitly (e.g.
        a traced per-epoch scalar inside jit); defaults to the scheduled
        host-side value."""
        if temperature is None:
            temperature = self.get_current_temperature()

        image_embeddings = l2_normalize(image_embeddings, axis=1)
        text_embeddings = l2_normalize(text_embeddings, axis=1)
        similarity = jnp.matmul(image_embeddings,
                                text_embeddings.T) / temperature

        batch_size = similarity.shape[0]
        eye = jnp.eye(batch_size, dtype=similarity.dtype)
        neg_mask = 1.0 - eye

        # Hard negative mining (stop-gradient region, matching the
        # reference's no_grad block, enhanced_contrastive.py:97-126).
        sim_ng = jax.lax.stop_gradient(similarity)
        k = max(1, int(batch_size * self.hardest_mining_ratio))

        masked_i2t = jnp.where(eye > 0, -jnp.inf, sim_ng)
        _, idx_i2t = jax.lax.top_k(masked_i2t, k)          # per image row
        hard_img = jnp.zeros_like(sim_ng)
        rows = jnp.arange(batch_size)[:, None]
        hard_img = hard_img.at[rows, idx_i2t].set(1.0)

        masked_t2i = jnp.where(eye > 0, -jnp.inf, sim_ng.T)
        _, idx_t2i = jax.lax.top_k(masked_t2i, k)          # per text row
        hard_txt = jnp.zeros_like(sim_ng)
        hard_txt = hard_txt.at[idx_t2i, rows].set(1.0)     # transposed fill

        hard_neg_mask = ((hard_img + hard_txt) > 0).astype(
            similarity.dtype) * neg_mask
        easy_neg_mask = neg_mask - hard_neg_mask

        pos_weights = (weights if weights is not None
                       else jnp.ones((batch_size,), similarity.dtype))
        pos_weights = pos_weights.reshape(-1, 1)

        neg_weights = (easy_neg_mask
                       + hard_neg_mask * (1.0 + self.hard_negative_weight))
        weighted_similarity = (similarity * eye * pos_weights
                               + similarity * neg_weights)

        image_loss = _cross_entropy_diag(weighted_similarity)
        text_loss = _cross_entropy_diag(weighted_similarity.T)

        img_entropy = _entropy_of_rows(similarity)
        txt_entropy = _entropy_of_rows(similarity.T)
        # Sign quirk: +lambda penalizes entropy here (reference :147-156).
        regularity_loss = self.lambda_reg * (img_entropy + txt_entropy) / 2

        return (image_loss + text_loss) / 2 + regularity_loss


class MultiPositiveInfoNCE:
    """InfoNCE with a uniform target distribution over each anchor's
    positive set (e.g. 5 captions per image)."""

    def __init__(self, temperature: float = 0.07, lambda_reg: float = 0.02):
        self.temperature = temperature
        self.lambda_reg = lambda_reg

    def __call__(self, image_embeddings, text_embeddings, positive_mask,
                 temperature=None):
        if temperature is None:
            temperature = self.temperature
        image_embeddings = l2_normalize(image_embeddings, axis=1)
        text_embeddings = l2_normalize(text_embeddings, axis=1)
        similarity = jnp.matmul(image_embeddings,
                                text_embeddings.T) / temperature
        batch_size = similarity.shape[0]
        positive_mask = positive_mask.astype(similarity.dtype)

        # Uniform target over each row's positives; all-zero rows contribute
        # nothing (the reference skips them but still divides by batch_size,
        # enhanced_contrastive.py:215-233 — same result).
        row_counts = jnp.sum(positive_mask, axis=1, keepdims=True)
        row_target = jnp.where(row_counts > 0,
                               positive_mask / jnp.maximum(row_counts, 1.0),
                               0.0)
        i2t = -jnp.sum(row_target * jax.nn.log_softmax(similarity, axis=1))
        i2t = i2t / batch_size

        col_counts = jnp.sum(positive_mask, axis=0, keepdims=True)
        col_target = jnp.where(col_counts > 0,
                               positive_mask / jnp.maximum(col_counts, 1.0),
                               0.0)
        t2i = -jnp.sum(col_target * jax.nn.log_softmax(similarity, axis=0))
        t2i = t2i / batch_size

        img_entropy = _entropy_of_rows(similarity)
        txt_entropy = _entropy_of_rows(similarity.T)
        # Opposite sign from HardNegativeMiningInfoNCE (reference :254-261).
        regularity_loss = -self.lambda_reg * (img_entropy + txt_entropy) / 2

        return (i2t + t2i) / 2 + regularity_loss


class ContrastiveLearningManager:
    """Curriculum weighting + hard-example mining around a criterion.

    Reference: enhanced_contrastive.py:269-417. Three curriculum stages by
    epoch progress: early weights easy positives sigmoid(10*sim), final
    weights hard positives 1 - sigmoid(10*sim - 5), middle uniform.
    """

    def __init__(self, criterion, similarity_threshold: float = 0.8,
                 mining_freq: int = 50, curriculum_steps: int = 3):
        self.criterion = criterion
        self.similarity_threshold = similarity_threshold
        self.mining_freq = mining_freq
        self.curriculum_steps = curriculum_steps
        self.steps = 0
        self.mined_examples: list = []
        self.epoch = 0
        self.total_epochs = 0
        self.curriculum_stage = 0

    def set_epoch(self, epoch: int, total_epochs: int):
        self.epoch = epoch
        self.total_epochs = total_epochs
        progress = epoch / total_epochs
        self.curriculum_stage = min(self.curriculum_steps - 1,
                                    int(progress * self.curriculum_steps))

    def get_curriculum_weight(self, similarity):
        pos_similarities = jnp.diagonal(similarity)
        if self.curriculum_stage == 0:
            return jax.nn.sigmoid(pos_similarities * 10)
        if self.curriculum_stage == self.curriculum_steps - 1:
            return 1 - jax.nn.sigmoid(pos_similarities * 10 - 5)
        return jnp.ones_like(pos_similarities)

    def curriculum_kind(self) -> int:
        """Collapse the stage to its weighting rule: 0 = easy-positive
        (first stage), 2 = hard-positive (final stage), 1 = uniform
        (everything between). Pass this as a TRACED scalar into jitted
        steps so stage transitions don't recompile."""
        if self.curriculum_stage == 0:
            return 0
        if self.curriculum_stage == self.curriculum_steps - 1:
            return 2
        return 1

    def mine_hard_examples(self, embed_fn, batches, max_examples: int = 1000):
        """Scan batches for positives with similarity below threshold.

        ``embed_fn(batch) -> (image_embeddings, text_embeddings)`` is the
        caller's (jitted, eval-mode) embedding function; ``batches`` is any
        iterable of batches. Returns mined flat example indices."""
        hard_examples = []
        for batch_idx, batch in enumerate(batches):
            if len(hard_examples) >= max_examples:
                break
            image_embeddings, text_embeddings = embed_fn(batch)
            image_embeddings = l2_normalize(image_embeddings, axis=1)
            text_embeddings = l2_normalize(text_embeddings, axis=1)
            pos = jnp.sum(image_embeddings * text_embeddings, axis=1)
            batch_n = pos.shape[0]
            hard = jnp.nonzero(pos < self.similarity_threshold)[0]
            for idx in list(jax.device_get(hard)):
                if len(hard_examples) < max_examples:
                    hard_examples.append(batch_idx * batch_n + int(idx))
        self.mined_examples = hard_examples
        return hard_examples

    def compute_loss(self, image_embeddings, text_embeddings,
                     similarity=None, temperature=None):
        self.steps += 1
        if similarity is None:
            similarity = jnp.matmul(
                l2_normalize(image_embeddings, axis=1),
                l2_normalize(text_embeddings, axis=1).T,
            )
        weights = self.get_curriculum_weight(similarity)
        return self.criterion(image_embeddings, text_embeddings, weights,
                              temperature=temperature)


def curriculum_weights_traced(similarity, kind):
    """Traced-stage version of the curriculum weighting (kind in {0,1,2},
    see :meth:`ContrastiveLearningManager.curriculum_kind`) — lets the
    jitted train step survive stage transitions without recompiling."""
    pos = jnp.diagonal(similarity)
    return jax.lax.switch(
        jnp.clip(kind, 0, 2),
        [
            lambda p: jax.nn.sigmoid(p * 10),
            lambda p: jnp.ones_like(p),
            lambda p: 1 - jax.nn.sigmoid(p * 10 - 5),
        ],
        pos,
    )
