"""LSGAN + feature-matching losses for HiFi-GAN training.

Counterpart of `/root/reference/nntts/vocoders/hifigan_model.py:271-302`
(`feature_loss` x2 L1 on feature maps, LSGAN `discriminator_loss` /
`generator_loss`). Defined in the reference but never wired to a trainer;
here they drive `train/hifigan_trainer.py`.
"""

from __future__ import annotations

import jax.numpy as jnp


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    """Sum of L1 distances over all discriminator feature maps, x2."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            # reduce in f32 so bf16 compute_dtype towers keep exact sums
            loss += jnp.mean(jnp.abs(rl.astype(jnp.float32) - gl.astype(jnp.float32)))
    return loss * 2.0


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    """LSGAN: real -> 1, fake -> 0. Returns (loss, r_losses, g_losses)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        r_loss = jnp.mean(jnp.square(1.0 - dr.astype(jnp.float32)))
        g_loss = jnp.mean(jnp.square(dg.astype(jnp.float32)))
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    """LSGAN generator objective: fake -> 1."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean(jnp.square(1.0 - dg.astype(jnp.float32)))
        gen_losses.append(l)
        loss += l
    return loss, gen_losses
