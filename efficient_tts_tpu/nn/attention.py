"""Multi-head attention and positional encodings.

Counterparts of `/root/reference/nntts/layers/attention.py:16-70`
(ESPnet-style MultiHeadedAttention) and `embedding.py:24-108`
(PositionalEncoding / ScaledPositionalEncoding), for the EFTS-Transformer
model variant. Note: the reference's transformer stack is import-broken
(`transformer_block.py:14` imports a nonexistent `Conv1dLinear`); this
implementation is complete and tested.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from efficient_tts_tpu.nn.layers import dropout, linear, linear_init


def multi_head_attention_init(key, n_head: int, n_feat: int, dtype=jnp.float32) -> dict:
    assert n_feat % n_head == 0
    keys = jax.random.split(key, 4)
    return {
        "q": linear_init(keys[0], n_feat, n_feat, dtype),
        "k": linear_init(keys[1], n_feat, n_feat, dtype),
        "v": linear_init(keys[2], n_feat, n_feat, dtype),
        "out": linear_init(keys[3], n_feat, n_feat, dtype),
    }


def _flash_eligible(tq: int, tk: int, mask, dropout_rate, deterministic) -> bool:
    """The Pallas TPU flash kernel needs 128-divisible sequence blocks,
    self-attention-shaped inputs, and (at most) a key-padding mask; it
    has no attention-prob dropout."""
    if tq != tk or tq % 128 != 0:
        return False
    if not deterministic and dropout_rate > 0:
        return False
    return mask is None or (mask.ndim == 3 and mask.shape[1] == 1)


def _flash_attention(q, k, v, mask, dk: int):
    """Fused blockwise attention (jax.experimental.pallas TPU kernel,
    custom VJP): the [B, H, T, T] score tensor never reaches HBM.
    Key-padding masks map to flash segment ids (pad=0, valid=1); pad
    queries attend only pad keys, so no padding leaks into valid rows."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    seg = None
    if mask is not None:
        ids = mask[:, 0, :].astype(jnp.int32)  # [B, Tk], 1=valid
        seg = SegmentIds(q=ids, kv=ids)
    return flash_attention(
        q, k, v, segment_ids=seg, sm_scale=1.0 / float(np.sqrt(dk))
    )


def multi_head_attention(
    params: dict,
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    n_head: int,
    mask: jnp.ndarray | None = None,
    dropout_rate: float = 0.0,
    rng=None,
    deterministic: bool = True,
    impl: str = "xla",
) -> jnp.ndarray:
    """query [B, Tq, D], key/value [B, Tk, D], mask [B, 1|Tq, Tk] True=valid.

    `impl="flash"` routes eligible self-attention calls through the
    fused Pallas TPU kernel (blockwise, no HBM score tensor); ineligible
    shapes/masks fall back to the XLA path below. `impl="auto"` = flash
    on TPU, XLA elsewhere.
    """
    b, tq, d = query.shape
    tk = key.shape[1]
    dk = d // n_head

    def heads(x, p):
        return linear(p, x).reshape(b, -1, n_head, dk).transpose(0, 2, 1, 3)

    q = heads(query, params["q"])  # [B, H, Tq, dk]
    k = heads(key, params["k"])
    v = heads(value, params["v"])

    if impl == "auto":
        import jax as _jax

        impl = "flash" if _jax.default_backend() == "tpu" else "xla"
    if impl == "flash" and _flash_eligible(tq, tk, mask, dropout_rate, deterministic):
        ctx = _flash_attention(q, k, v, mask, dk)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, tq, d)
        return linear(params["out"], ctx)

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(dk))
    if mask is not None:
        m = mask[:, None, :, :] if mask.ndim == 3 else mask[:, None, None, :]
        scores = jnp.where(m, scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.where(m, attn, 0.0)
    else:
        attn = jax.nn.softmax(scores, axis=-1)
    if not deterministic and dropout_rate > 0:
        attn = dropout(rng, attn, dropout_rate, deterministic=False)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, tq, d)
    return linear(params["out"], ctx)


def positional_encoding(t: int, d: int, dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal table [T, D] (reference `embedding.py:24-62`)."""
    position = np.arange(t)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, d, 2).astype(np.float64) * -(np.log(10000.0) / d))
    pe = np.zeros((t, d))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return jnp.asarray(pe, dtype)


def add_positional_encoding(
    x: jnp.ndarray, scale: float | jnp.ndarray | None = None, xscale: float | None = None
) -> jnp.ndarray:
    """x [B, T, D] + PE. `xscale=sqrt(D)` reproduces PositionalEncoding;
    a learnable `scale` reproduces ScaledPositionalEncoding (`embedding.py:75-108`)."""
    t, d = x.shape[1], x.shape[2]
    pe = positional_encoding(t, d, x.dtype)
    if xscale is not None:
        x = x * xscale
    if scale is not None:
        pe = pe * scale
    return x + pe[None]
