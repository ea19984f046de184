"""Residual conv blocks -- the EFTS-CNN workhorse.

Counterpart of `ResConv1d`/`ResConvBlock`
(`/root/reference/nntts/layers/efts_modules.py:19-116`): each layer is
x + dropout(leaky_relu(conv_k5(x))), convs weight-normed by default.

TPU design: channels-last [B, T, C]; each k=5x512x512 conv is one MXU
matmul of shape [B*T, 5*512]x[5*512, 512] after im2col -- XLA does this
tiling automatically for NWC convs. The whole block stays fused in one
XLA computation; a Pallas fused variant lives in
`efficient_tts_tpu/ops/` for the cases XLA leaves on the table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from efficient_tts_tpu.nn.layers import (
    conv1d,
    conv1d_init,
    dropout,
    leaky_relu,
    maybe_wn_kernel,
    weight_norm_init,
)


def res_conv_block_init(
    key,
    num_layers: int,
    n_channels: int = 512,
    k_size: int = 5,
    use_weight_norm: bool = True,
    dtype=jnp.float32,
) -> dict:
    keys = jax.random.split(key, num_layers)
    layers = []
    for i in range(num_layers):
        p = conv1d_init(keys[i], n_channels, n_channels, k_size, dtype)
        if use_weight_norm:
            p = weight_norm_init(p)
        layers.append(p)
    return {"layers": layers}


def res_conv_block(
    params: dict,
    x: jnp.ndarray,
    negative_slope: float = 0.1,
    dropout_rate: float = 0.0,
    rng=None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """[B, T, C] -> [B, T, C]."""
    for i, layer in enumerate(params["layers"]):
        kern = maybe_wn_kernel(layer)
        h = leaky_relu(conv1d(kern, x), negative_slope)
        if not deterministic and dropout_rate > 0.0:
            rng, sub = jax.random.split(rng)
            h = dropout(sub, h, dropout_rate, deterministic=False)
        x = x + h
    return x
