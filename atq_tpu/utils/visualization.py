"""Visualization utilities.

Reference: /root/reference/utils/visualization.py. Operates on param
pytrees. The ternary pie chart intentionally recomputes the threshold with
the CLASSIC ``0.05 * mean|w|`` method (visualization.py:59-62), not the
sparsity-targeted quantizer, so the plot can disagree with training-time
sparsity — a reference quirk preserved (and documented here instead of
silently fixed).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from atq_tpu.utils.metrics import (
    count_parameters,
    measure_inference_time,
    measure_model_memory,
)


def _named_weights(params):
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = [str(getattr(p, "key", p)) for p in path]
        name = ".".join(keys)
        if keys[-1] in ("weight", "kernel") and not any(
            "bn" in k for k in keys
        ):
            yield name, np.asarray(leaf)


def plot_weight_distribution(params, layer_name: str | None = None,
                             out_path: str | None = None):
    """Histogram of weight values per layer (visualization.py:6-37)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    weights = {
        name: w.ravel() for name, w in _named_weights(params)
        if layer_name is None or layer_name in name
    }
    if not weights:
        print("No weights found with the specified layer name.")
        return
    plt.figure(figsize=(12, 8))
    for i, (name, w) in enumerate(weights.items()):
        plt.subplot(len(weights), 1, i + 1)
        plt.hist(w, bins=100)
        plt.title(f"Weight Distribution: {name}")
        plt.xlabel("Weight Value")
        plt.ylabel("Count")
    plt.tight_layout()
    if out_path:
        plt.savefig(out_path)
    plt.close()


def visualize_ternary_weights(params, layer_name: str,
                              out_path: str | None = None):
    """Pie chart of the {-1, 0, +1} distribution using the classic
    threshold (see module docstring quirk)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    weight = None
    for name, w in _named_weights(params):
        if layer_name in name:
            weight = w
            break
    if weight is None:
        print(f"Layer {layer_name} not found.")
        return

    threshold = 0.05 * np.mean(np.abs(weight))
    ternary = np.zeros_like(weight)
    ternary[weight > threshold] = 1
    ternary[weight < -threshold] = -1

    neg = int(np.sum(ternary == -1))
    zero = int(np.sum(ternary == 0))
    pos = int(np.sum(ternary == 1))
    total = ternary.size

    plt.figure(figsize=(10, 6))
    plt.pie([neg, zero, pos], labels=["-1", "0", "+1"], autopct="%1.1f%%",
            colors=["red", "gray", "blue"])
    plt.title(f"Ternary Weight Distribution for {layer_name}")
    if out_path:
        plt.savefig(out_path)
    plt.close()

    print(f"Layer: {layer_name}")
    print(f"Total weights: {total}")
    print(f"-1: {neg} ({neg / total * 100:.2f}%)")
    print(f" 0: {zero} ({zero / total * 100:.2f}%)")
    print(f"+1: {pos} ({pos / total * 100:.2f}%)")


def compare_model_efficiency(models: Dict[str, dict], input_size,
                             out_path: str | None = None):
    """Params / memory / latency table + bar chart across models
    (visualization.py:89-138). Each entry:
    {"params": pytree, "apply_fn": jitted callable, "inputs": args}."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    metric_fns = {
        "Parameters (M)": lambda m: count_parameters(m["params"]) / 1e6,
        "Memory (MB)": lambda m: measure_model_memory(m["params"]),
        "Inference Time (ms)": lambda m: measure_inference_time(
            m["apply_fn"], m["inputs"]
        ),
    }
    results = {
        name: {mn: fn(model) for mn, fn in metric_fns.items()}
        for name, model in models.items()
    }

    plt.figure(figsize=(15, 5))
    for i, metric_name in enumerate(metric_fns):
        plt.subplot(1, 3, i + 1)
        values = [results[n][metric_name] for n in models]
        plt.bar(list(models.keys()), values)
        plt.title(metric_name)
        plt.xticks(rotation=45)
    plt.tight_layout()
    if out_path:
        plt.savefig(out_path)
    plt.close()

    header = ("Model".ljust(20) + " | "
              + " | ".join(m.ljust(15) for m in metric_fns))
    print("-" * len(header))
    print(header)
    print("-" * len(header))
    for name in models:
        row = name.ljust(20) + " | " + " | ".join(
            f"{results[name][m]:.4f}".ljust(15) for m in metric_fns
        )
        print(row)
    print("-" * len(header))
    return results
