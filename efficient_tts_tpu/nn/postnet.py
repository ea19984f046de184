"""Tacotron2-style postnet (counterpart of
`/root/reference/nntts/layers/taco2_postnet.py:11-78`): 5 conv layers
(k=5) with batch-norm + tanh, refining the mel prediction. Batch norm is
carried as explicit {mean, var} state updated outside jit or frozen at
inference (functional form)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from efficient_tts_tpu.nn.layers import conv1d, conv1d_init, dropout


def postnet_init(
    key,
    odim: int = 80,
    n_layers: int = 5,
    n_chans: int = 512,
    n_filts: int = 5,
    dtype=jnp.float32,
) -> dict:
    keys = jax.random.split(key, n_layers)
    convs = []
    norms = []
    for i in range(n_layers):
        ichans = odim if i == 0 else n_chans
        ochans = odim if i == n_layers - 1 else n_chans
        convs.append(conv1d_init(keys[i], ichans, ochans, n_filts, dtype))
        norms.append(
            {
                "scale": jnp.ones((ochans,), dtype),
                "bias": jnp.zeros((ochans,), dtype),
                "mean": jnp.zeros((ochans,), dtype),
                "var": jnp.ones((ochans,), dtype),
            }
        )
    return {"convs": convs, "norms": norms}


def _batch_norm(norm: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    inv = jax.lax.rsqrt(norm["var"] + eps)
    return (x - norm["mean"]) * inv * norm["scale"] + norm["bias"]


def postnet(
    params: dict,
    x: jnp.ndarray,
    dropout_rate: float = 0.5,
    rng=None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """x [B, T, odim] -> residual refinement [B, T, odim]."""
    n = len(params["convs"])
    for i, (conv_p, norm) in enumerate(zip(params["convs"], params["norms"])):
        x = conv1d(conv_p, x)
        x = _batch_norm(norm, x)
        if i != n - 1:
            x = jnp.tanh(x)
        if not deterministic and dropout_rate > 0:
            rng, sub = jax.random.split(rng)
            x = dropout(sub, x, dropout_rate, deterministic=False)
    return x
