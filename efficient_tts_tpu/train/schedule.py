"""Learning-rate schedules.

`warmup_lr` is the reference `WarmupLR`
(`/root/reference/nntts/schedulers/warmup_lr.py:44-51`):
    lr(step) = base_lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5)
peaking exactly at `base_lr` when step == warmup_steps. The reference
steps its scheduler after each optimizer step starting from step 1;
optax passes a 0-based count, hence the +1.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_lr(base_lr: float, warmup_steps: int = 25000):
    def schedule(count):
        step = jnp.asarray(count, jnp.float32) + 1.0
        w = jnp.asarray(warmup_steps, jnp.float32)
        return base_lr * (w**0.5) * jnp.minimum(step**-0.5, step * w**-1.5)

    return schedule


def exponential_decay_per_epoch(base_lr: float, gamma: float, steps_per_epoch: int):
    """HiFi-GAN's ExponentialLR(gamma=0.999) stepped per epoch."""

    def schedule(count):
        epoch = jnp.asarray(count, jnp.float32) // steps_per_epoch
        return base_lr * jnp.power(gamma, epoch)

    return schedule
