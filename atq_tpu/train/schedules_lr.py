"""Learning-rate schedules matching the reference drivers.

- warmup + cosine with a floor: /root/reference/train.py:77-99 and
  train_multimodal.py:389-399 (floors 0.1 and 0.05 respectively)
- StepLR: /root/reference/train.py:108-120 (gamma 0.5, step epochs//4)
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_schedule(base_lr: float, warmup_steps: int,
                           total_steps: int, min_factor: float = 0.1):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, total_steps - warmup_steps
        )
        cosine = jnp.maximum(
            min_factor, 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        )
        factor = jnp.where(step < warmup_steps, warmup, cosine)
        return base_lr * factor

    return schedule


def step_lr_schedule(base_lr: float, steps_per_epoch: int, step_size: int,
                     gamma: float = 0.5):
    step_size = max(1, step_size)

    def schedule(step):
        epoch = jnp.asarray(step, jnp.int32) // max(1, steps_per_epoch)
        return base_lr * gamma ** (epoch // step_size).astype(jnp.float32)

    return schedule
