"""FastSpeech-style duration predictor.

Counterpart of `/root/reference/nntts/layers/duration_predictor.py:13-114`:
n_layers x [conv k=3 -> ReLU -> LayerNorm(channel) -> dropout] -> Linear->1.
Training output is log-domain durations; inference converts to linear
domain via exp(x) - offset clamped at 0 (`duration_predictor.py:78-83`).

Channels-last throughout; LayerNorm normalizes the channel (last) axis,
equivalent to the reference's LayerNorm(dim=1) on [B, C, T] tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from efficient_tts_tpu.nn.layers import (
    conv1d,
    conv1d_init,
    dropout,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)


def duration_predictor_init(
    key,
    idim: int,
    n_layers: int = 2,
    n_chans: int = 384,
    kernel_size: int = 3,
    dtype=jnp.float32,
    num_spks: int | None = None,
    spk_embed_dim: int | None = None,
    spk_embed_integration_type: str = "add",
) -> dict:
    keys = jax.random.split(key, n_layers + 3)
    convs = []
    norms = []
    for i in range(n_layers):
        # reference uses n_chans for every layer incl. the first
        # (duration_predictor.py:57: in_chans = n_chans)
        convs.append(conv1d_init(keys[i], n_chans, n_chans, kernel_size, dtype))
        norms.append(layer_norm_init(n_chans, dtype))
    params = {
        "convs": convs,
        "norms": norms,
        "out": linear_init(keys[-1], n_chans, 1, dtype),
    }
    if spk_embed_dim is not None:
        # speaker integration (duration_predictor.py:45-53,116-138)
        assert num_spks is not None, "num_spks has to be set."
        from efficient_tts_tpu.nn.layers import embedding_init

        params["spk_embedding"] = embedding_init(keys[-2], num_spks, spk_embed_dim, dtype)
        proj_in = spk_embed_dim if spk_embed_integration_type == "add" else idim + spk_embed_dim
        params["spk_projection"] = linear_init(keys[-3], proj_in, n_chans, dtype)
    return params


def _integrate_spk(params: dict, x: jnp.ndarray, spkids, integration: str) -> jnp.ndarray:
    """Add or concat a normalized speaker embedding
    (duration_predictor.py:116-138)."""
    from efficient_tts_tpu.nn.layers import embedding as embed_lookup

    emb = embed_lookup(params["spk_embedding"], spkids)  # [B, E]
    emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    if integration == "add":
        return x + linear(params["spk_projection"], emb)[:, None, :]
    if integration == "concat":
        tiled = jnp.broadcast_to(emb[:, None, :], (x.shape[0], x.shape[1], emb.shape[-1]))
        return linear(params["spk_projection"], jnp.concatenate([x, tiled], axis=-1))
    raise NotImplementedError("support only add or concat.")


def _backbone(
    params: dict,
    x: jnp.ndarray,
    dropout_rate: float,
    rng,
    deterministic: bool,
) -> jnp.ndarray:
    for conv_p, norm_p in zip(params["convs"], params["norms"]):
        x = jax.nn.relu(conv1d(conv_p, x))
        x = layer_norm(norm_p, x)
        if not deterministic and dropout_rate > 0.0:
            rng, sub = jax.random.split(rng)
            x = dropout(sub, x, dropout_rate, deterministic=False)
    return jnp.squeeze(linear(params["out"], x), -1)  # [B, T]


def duration_predictor(
    params: dict,
    x: jnp.ndarray,
    pad_mask: jnp.ndarray | None = None,
    dropout_rate: float = 0.1,
    rng=None,
    deterministic: bool = True,
    spkids=None,
    spk_embed_integration_type: str = "add",
) -> jnp.ndarray:
    """Training forward: [B, T, C] -> log-domain durations [B, T]."""
    if spkids is not None:
        x = _integrate_spk(params, x, spkids, spk_embed_integration_type)
    d = _backbone(params, x, dropout_rate, rng, deterministic)
    if pad_mask is not None:
        d = jnp.where(pad_mask, 0.0, d)
    return d


def duration_predictor_infer(
    params: dict,
    x: jnp.ndarray,
    pad_mask: jnp.ndarray | None = None,
    offset: float = 1.0,
    to_round: bool = False,
    spkids=None,
    spk_embed_integration_type: str = "add",
) -> jnp.ndarray:
    """Inference: linear-domain durations, clamp(exp(x) - offset, 0)."""
    if spkids is not None:
        x = _integrate_spk(params, x, spkids, spk_embed_integration_type)
    d = _backbone(params, x, 0.0, None, True)
    d = jnp.clip(jnp.exp(d) - offset, min=0.0)
    if to_round:
        d = jnp.round(d)
    if pad_mask is not None:
        d = jnp.where(pad_mask, 0.0, d)
    return d
