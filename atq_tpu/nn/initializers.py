"""Initializers matching the PyTorch defaults the reference relies on.

The reference initializes quantized layers with
``nn.init.kaiming_uniform_(weight, a=math.sqrt(5))`` and bias with
``uniform(-1/sqrt(fan_in), 1/sqrt(fan_in))`` (atq/layers.py:27-33,
atq/precision_boost.py:37-47). Weight layout is torch's (out_features,
in_features); fan_in is the second dimension.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_uniform_torch(a: float = math.sqrt(5)):
    """torch.nn.init.kaiming_uniform_ for (out, in)-shaped weights.

    gain = sqrt(2 / (1 + a^2)); bound = gain * sqrt(3 / fan_in).
    With a = sqrt(5) this reduces to bound = 1 / sqrt(fan_in) — torch's
    nn.Linear default.
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[-1]
        gain = math.sqrt(2.0 / (1.0 + a * a))
        bound = gain * math.sqrt(3.0 / fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def bias_uniform_torch(fan_in: int):
    """torch nn.Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_gain(gain: float = 0.8):
    """torch xavier_uniform_ with gain — the reference's re-init for
    quantized networks (train_multimodal.py:299-301, text_encoder.py:343-349)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[-1], shape[-2] if len(shape) >= 2 else shape[-1]
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_std(std: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init
