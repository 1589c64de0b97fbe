"""Mixed-precision allocation + gradual quantization schedules.

Re-implements /root/reference/atq/mixed_precision_atq.py as *host-side pure
functions over the 'quant' variable collection*: the schedule computes a new
pytree of per-layer sparsity scalars each epoch and the trainer feeds it into
the jitted step as data — no attribute mutation, no recompilation (the
reference mutates module attributes in update_model_quantization,
mixed_precision_atq.py:130-145).

Reproduced verbatim:
- keyword importance heuristics (critical/medium/low keyword lists and the
  2.0 / 1.5 / 0.8 scores, mixed_precision_atq.py:29-46)
- precision_ratio = min(0.25, base * importance) (:48-62)
- sparsity = max(0.1, base / importance) (:64-79)
- per-epoch progress = min(1, epoch / (0.8 * total)) with
  initial = min(0.1, final) (:107-110)
- 'vision' classification iff the literal substring 'image' appears in the
  layer path (:130-137)
- the 3-phase warmup / linear-ramp / plateau schedule tables (:174-205)

Layer paths in the quant collection mirror the reference's module names
(e.g. ``text_encoder/layers_0/self_attn/q_proj``) so the keyword heuristics
classify layers identically.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp

CRITICAL_KEYWORDS = ("fusion", "cross_attention", "projector", "final")
MEDIUM_KEYWORDS = ("attention", "embed", "pool")
LOW_KEYWORDS = ("intermediate", "ffn", "conv")


class MixedPrecisionATQ:
    """Importance-driven precision/sparsity allocation (host-side)."""

    @staticmethod
    def get_layer_importance(layer_name: str,
                             default_importance: float = 1.0) -> float:
        if any(k in layer_name for k in CRITICAL_KEYWORDS):
            return 2.0
        if any(k in layer_name for k in MEDIUM_KEYWORDS):
            return 1.5
        if any(k in layer_name for k in LOW_KEYWORDS):
            return 0.8
        return default_importance

    @staticmethod
    def get_precision_ratio(importance: float, base_ratio: float = 0.05,
                            max_ratio: float = 0.25) -> float:
        return min(max_ratio, base_ratio * importance)

    @staticmethod
    def get_sparsity_target(importance: float, base_sparsity: float = 0.3,
                            min_sparsity: float = 0.1) -> float:
        return max(min_sparsity, base_sparsity / importance)

    @classmethod
    def calculate_quantization_params(
        cls, layer_name: str, epoch: int, total_epochs: int,
        target_sparsity: float, initial_ratio: float = 0.05,
    ) -> Tuple[float, float]:
        importance = cls.get_layer_importance(layer_name)
        precision_ratio = cls.get_precision_ratio(importance,
                                                  base_ratio=initial_ratio)
        final_sparsity = cls.get_sparsity_target(importance,
                                                 base_sparsity=target_sparsity)
        progress = min(1.0, epoch / (total_epochs * 0.8))
        initial_sparsity = min(0.1, final_sparsity)
        current_sparsity = initial_sparsity + progress * (
            final_sparsity - initial_sparsity
        )
        return precision_ratio, current_sparsity

    @classmethod
    def update_model_quantization(
        cls, quant: Dict[str, Any], epoch: int, total_epochs: int,
        vision_threshold: float = 0.3, text_threshold: float = 0.2,
    ) -> Dict[str, Any]:
        """Return a new 'quant' collection with every RPB layer's
        sparsity_target recomputed from layer importance + progress.

        A layer is classified 'vision' iff 'image' appears in its path —
        the reference's exact (quirky) rule (mixed_precision_atq.py:133).
        """
        flat = _flatten_quant(quant)
        updates = {}
        for path, leaf_name, value in flat:
            if leaf_name != "sparsity_target":
                continue
            threshold = vision_threshold if "image" in path else text_threshold
            _, current_sparsity = cls.calculate_quantization_params(
                path, epoch, total_epochs, threshold
            )
            updates[(path, leaf_name)] = jnp.asarray(current_sparsity,
                                                     jnp.float32)
        return _apply_updates(quant, updates)


def _flatten_quant(quant) -> List[Tuple[str, str, Any]]:
    """Flatten the quant collection into (module_path, leaf_name, value)
    triples, with '/'-joined paths mirroring reference module names."""
    out = []

    def walk(node, path):
        if isinstance(node, dict):
            for key, child in node.items():
                if isinstance(child, dict):
                    walk(child, path + (key,))
                else:
                    out.append(("/".join(path), key, child))
        else:  # pragma: no cover
            raise TypeError(f"unexpected quant node: {type(node)}")

    walk(quant, ())
    return out


def _apply_updates(quant, updates: Dict[Tuple[str, str], Any]):
    def walk(node, path):
        new = {}
        for key, child in node.items():
            if isinstance(child, dict):
                new[key] = walk(child, path + (key,))
            else:
                val = updates.get(("/".join(path), key))
                if val is None:
                    new[key] = child
                else:
                    # Preserve the existing leaf's shape/dtype: scanned
                    # stacks (ScannedTernaryStack) carry per-layer quant
                    # leaves with a leading L axis — replacing them with
                    # a scalar would break nn.scan's axis-0 slicing.
                    child_shape = jnp.shape(child)
                    child_dtype = getattr(child, "dtype", jnp.float32)
                    new[key] = jnp.broadcast_to(
                        jnp.asarray(val, child_dtype), child_shape)
        return new

    return walk(quant, ())


def set_quant_sparsity(quant, plan: Dict[str, Tuple[float, float]],
                       progress_ratio: float):
    """The model-internal sparsity cascade (`model.set_epoch` /
    `update_sparsity` in the reference, e.g. multimodal_classifier.py:177-209):
    every planned layer ramps ``initial + progress * (target - initial)``.

    ``plan`` maps 'quant'-collection module paths to (initial, target).
    Unplanned layers keep their current value.
    """
    updates = {}
    for path, (initial, target) in plan.items():
        current = initial + progress_ratio * (target - initial)
        updates[(path, "sparsity_target")] = jnp.asarray(current, jnp.float32)
    return _apply_updates(quant, updates)


def epoch_progress(epoch: int, total_epochs: int) -> float:
    """min(1, epoch / (0.8 * total)) — the reference's universal progress
    rule (multimodal_classifier.py:184-186, mixed_precision_atq.py:107-110)."""
    return min(1.0, epoch / (total_epochs * 0.8))


class GradualQuantizationScheduler:
    """3-phase per-epoch sparsity schedule (warmup / linear ramp / plateau).

    Reference: mixed_precision_atq.py:148-235. Operates functionally: call
    :meth:`step` with the current quant collection (and optionally the
    model's sparsity plan) and use the returned collection for the epoch.
    """

    def __init__(self, total_epochs: int, vision_sparsity: float = 0.3,
                 text_sparsity: float = 0.2, warmup_epochs: int = 5,
                 final_epochs: int | None = None, verbose: bool = False):
        self.total_epochs = total_epochs
        self.vision_sparsity = vision_sparsity
        self.text_sparsity = text_sparsity
        self.warmup_epochs = warmup_epochs
        self.final_epochs = final_epochs or max(2, int(total_epochs * 0.2))
        self.verbose = verbose
        self.initial_vision_sparsity = 0.05
        self.initial_text_sparsity = 0.05
        self.vision_sparsity_schedule = self._create_schedule(
            self.initial_vision_sparsity, self.vision_sparsity
        )
        self.text_sparsity_schedule = self._create_schedule(
            self.initial_text_sparsity, self.text_sparsity
        )

    def _create_schedule(self, initial_value: float,
                         final_value: float) -> List[float]:
        schedule = [initial_value] * self.warmup_epochs
        gradual = self.total_epochs - self.warmup_epochs - self.final_epochs
        for i in range(gradual):
            progress = (i + 1) / gradual
            schedule.append(initial_value + progress * (final_value -
                                                        initial_value))
        schedule.extend([final_value] * self.final_epochs)
        return schedule

    def scheduled_values(self, epoch: int) -> Tuple[float, float]:
        if epoch >= len(self.vision_sparsity_schedule):
            return self.vision_sparsity, self.text_sparsity
        return (self.vision_sparsity_schedule[epoch],
                self.text_sparsity_schedule[epoch])

    def step(self, quant, epoch: int,
             sparsity_plan: Dict[str, Tuple[float, float]] | None = None):
        """Return the quant collection for this epoch.

        Mirrors the reference order of operations: the model's own set_epoch
        cascade runs first (mixed_precision_atq.py:127-128), then the
        importance-driven walk overwrites every RPB layer (:130-145)."""
        vision, text = self.scheduled_values(epoch)
        if sparsity_plan:
            quant = set_quant_sparsity(
                quant, sparsity_plan, epoch_progress(epoch, self.total_epochs)
            )
        quant = MixedPrecisionATQ.update_model_quantization(
            quant, epoch, self.total_epochs,
            vision_threshold=vision, text_threshold=text,
        )
        if self.verbose:
            print(f"Epoch {epoch + 1}: Vision sparsity = {vision:.3f}, "
                  f"Text sparsity = {text:.3f}")
        return quant
