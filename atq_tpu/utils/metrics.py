"""Model metrics utilities (JAX).

Reference: /root/reference/utils/metrics.py. Functional equivalents over
param pytrees / jitted apply functions instead of nn.Module instances.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def count_parameters(params) -> int:
    """Total trainable parameter count (metrics.py:5-7)."""
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))


def measure_model_memory(params) -> float:
    """Parameter memory in MB (metrics.py:9-19)."""
    total = sum(x.size * x.dtype.itemsize
                for x in jax.tree_util.tree_leaves(params))
    return total / (1024 * 1024)


def measure_inference_time(apply_fn: Callable, inputs, num_runs: int = 50,
                           warmup: int = 5) -> float:
    """Average wall-clock per call in ms after warmup (metrics.py:21-57).
    ``apply_fn`` should already be jitted; inputs may be a tuple/list of
    positional args or a single array.

    Timing rides utils/timing.sec_per_call: on remote-dispatch backends
    ``block_until_ready`` can return before the device finishes (see
    utils/timing.py module docstring), so the window is synced via a
    ``device_get`` of a result-dependent slice and the measured
    dispatch->fetch roundtrip floor is subtracted."""
    from atq_tpu.utils.timing import sec_per_call

    args = inputs if isinstance(inputs, (list, tuple)) else (inputs,)
    return sec_per_call(apply_fn, *args, warmup=warmup,
                        iters=num_runs) * 1000.0


def estimate_flops(params, input_size, model=None) -> int:
    """Rough forward-FLOP estimate from parameter shapes (the reference
    hooks Conv2d/Linear modules, metrics.py:59-107; here we derive the same
    counts from the param tree: each (out, in) matrix costs B*out*in, each
    conv kernel costs B*H*W*kh*kw*cin*cout with the output spatial size
    approximated by the input's)."""
    if len(input_size) == 3:
        c, h, w = input_size
    else:
        h = w = 1
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = str(getattr(path[-1], "key", path[-1]))
        if name == "weight" and leaf.ndim == 2:
            total += int(leaf.shape[0] * leaf.shape[1])
        elif name == "kernel" and leaf.ndim == 4:
            kh, kw, cin, cout = leaf.shape
            total += int(h * w * kh * kw * cin * cout)
        elif name == "kernel" and leaf.ndim == 2:
            total += int(leaf.shape[0] * leaf.shape[1])
    return total


def accuracy(output, target, topk: Sequence[int] = (1,)):
    """Top-k accuracies in percent (metrics.py:109-133)."""
    output = jnp.asarray(output)
    target = jnp.asarray(target)
    maxk = max(topk)
    batch_size = target.shape[0]
    _, pred = jax.lax.top_k(output, maxk)       # (B, maxk)
    correct = pred == target[:, None]
    return [
        float(jnp.sum(correct[:, :k]) * 100.0 / batch_size) for k in topk
    ]


def confusion_matrix(preds, labels, num_classes: int | None = None
                     ) -> np.ndarray:
    """Confusion matrix [true, pred] (metrics.py:135-154)."""
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    if num_classes is None:
        num_classes = int(max(preds.max(), labels.max())) + 1
    conf = np.zeros((num_classes, num_classes), dtype=np.int64)
    np.add.at(conf, (labels, preds), 1)
    return conf
