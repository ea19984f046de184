"""Transformer encoder blocks (EFTS-Transformer variant building blocks).

Counterparts of `/root/reference/nntts/layers/encoder_layer.py:12-83`
(pre/post-norm self-attention + feed-forward with residuals),
`multi_layer_conv.py:10-85` (MultiLayeredConv1d FFT block),
`positionwise_feed_forward.py:10-27`, and `repeat.py:13-30`.
The reference's assembled `TransformerBlock` is import-broken
(`transformer_block.py:14`); this stack is functional and tested.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from efficient_tts_tpu.nn.attention import (
    multi_head_attention,
    multi_head_attention_init,
)
from efficient_tts_tpu.nn.layers import (
    conv1d,
    conv1d_init,
    dropout,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)


def positionwise_ff_init(key, idim: int, hidden: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "w1": linear_init(k1, idim, hidden, dtype),
        "w2": linear_init(k2, hidden, idim, dtype),
    }


def positionwise_ff(params, x, dropout_rate=0.0, rng=None, deterministic=True):
    h = jax.nn.relu(linear(params["w1"], x))
    if not deterministic and dropout_rate > 0:
        h = dropout(rng, h, dropout_rate, deterministic=False)
    return linear(params["w2"], h)


def multi_layered_conv1d_init(
    key, in_ch: int, hidden: int, kernel_size: int = 3, dtype=jnp.float32
) -> dict:
    """Two-conv FFT block used by FastSpeech (`multi_layer_conv.py:10-60`)."""
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv1d_init(k1, in_ch, hidden, kernel_size, dtype),
        "conv2": conv1d_init(k2, hidden, in_ch, kernel_size, dtype),
    }


def multi_layered_conv1d(params, x, dropout_rate=0.0, rng=None, deterministic=True):
    h = jax.nn.relu(conv1d(params["conv1"], x))
    if not deterministic and dropout_rate > 0:
        h = dropout(rng, h, dropout_rate, deterministic=False)
    return conv1d(params["conv2"], h)


def encoder_layer_init(
    key,
    n_feat: int,
    n_head: int,
    ff_hidden: int,
    use_conv_ff: bool = True,
    kernel_size: int = 3,
    dtype=jnp.float32,
) -> dict:
    keys = jax.random.split(key, 4)
    ff = (
        multi_layered_conv1d_init(keys[1], n_feat, ff_hidden, kernel_size, dtype)
        if use_conv_ff
        else positionwise_ff_init(keys[1], n_feat, ff_hidden, dtype)
    )
    return {
        "self_attn": multi_head_attention_init(keys[0], n_head, n_feat, dtype),
        "ff": ff,
        "norm1": layer_norm_init(n_feat, dtype),
        "norm2": layer_norm_init(n_feat, dtype),
    }


def encoder_layer(
    params: dict,
    x: jnp.ndarray,
    n_head: int,
    mask: jnp.ndarray | None = None,
    use_conv_ff: bool = True,
    normalize_before: bool = True,
    dropout_rate: float = 0.0,
    rng=None,
    deterministic: bool = True,
    attn_impl: str = "xla",
) -> jnp.ndarray:
    """One pre/post-norm self-attention + FF layer (`encoder_layer.py:12-83`)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r1, r2, r3, r4 = jax.random.split(rng, 4)

    residual = x
    h = layer_norm(params["norm1"], x) if normalize_before else x
    h = multi_head_attention(
        params["self_attn"], h, h, h, n_head, mask=mask,
        dropout_rate=dropout_rate, rng=r1, deterministic=deterministic,
        impl=attn_impl,
    )
    if not deterministic and dropout_rate > 0:
        h = dropout(r2, h, dropout_rate, deterministic=False)
    x = residual + h
    if not normalize_before:
        x = layer_norm(params["norm1"], x)

    residual = x
    h = layer_norm(params["norm2"], x) if normalize_before else x
    ff = multi_layered_conv1d if use_conv_ff else positionwise_ff
    h = ff(params["ff"], h, dropout_rate, r3, deterministic)
    if not deterministic and dropout_rate > 0:
        h = dropout(r4, h, dropout_rate, deterministic=False)
    x = residual + h
    if not normalize_before:
        x = layer_norm(params["norm2"], x)
    return x


def transformer_block_init(
    key,
    num_layers: int,
    n_feat: int,
    n_head: int,
    ff_hidden: int,
    use_conv_ff: bool = True,
    kernel_size: int = 3,
    dtype=jnp.float32,
) -> dict:
    """Stack of encoder layers + final norm (the working counterpart of the
    reference's broken `transformer_block.py:28`)."""
    keys = jax.random.split(key, num_layers)
    return {
        "layers": [
            encoder_layer_init(k, n_feat, n_head, ff_hidden, use_conv_ff, kernel_size, dtype)
            for k in keys
        ],
        "final_norm": layer_norm_init(n_feat, dtype),
    }


def transformer_block(
    params: dict,
    x: jnp.ndarray,
    n_head: int,
    mask: jnp.ndarray | None = None,
    use_conv_ff: bool = True,
    normalize_before: bool = True,
    dropout_rate: float = 0.0,
    rng=None,
    deterministic: bool = True,
    attn_impl: str = "xla",
) -> jnp.ndarray:
    if rng is None:
        rng = jax.random.PRNGKey(0)
    for i, layer in enumerate(params["layers"]):
        rng, sub = jax.random.split(rng)
        x = encoder_layer(
            layer, x, n_head, mask, use_conv_ff, normalize_before,
            dropout_rate, sub, deterministic, attn_impl,
        )
    if normalize_before:
        x = layer_norm(params["final_norm"], x)
    return x
