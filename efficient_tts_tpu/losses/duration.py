"""Log-domain duration MSE (counterpart of
`/root/reference/nntts/losses/duration_loss.py:27-46`; the reference's
`LogMSELoss` is an identical duplicate and is intentionally not mirrored).
Used by the standalone DurationModel trainer."""

from __future__ import annotations

import jax.numpy as jnp


def duration_mse_loss(
    outputs: jnp.ndarray,
    targets: jnp.ndarray,
    mask: jnp.ndarray,
    offset: float = 1.0,
) -> jnp.ndarray:
    """MSE(outputs, log(targets + offset)) over valid positions.

    outputs are log-domain predictions [B, T]; targets are linear-domain
    durations [B, T]; mask [B, T] True on valid steps.
    """
    log_t = jnp.log(targets.astype(jnp.float32) + offset)
    err = jnp.square(outputs - log_t)
    maskf = mask.astype(err.dtype)
    return jnp.sum(err * maskf) / jnp.maximum(jnp.sum(maskf), 1.0)
