"""Length regulator: repeat text states by per-token durations.

Counterpart of `/root/reference/nntts/layers/length_regulator.py:14-79`,
which loops over the batch in Python and repeat-interleaves on host.
TPU-native design: the expansion is a one-hot matmul built from cumulative
durations, fully vectorized and jit-compatible with a static output
length -- y[b, t] = x[b, i] where i = searchsorted(cumsum(d[b]), t).

(EFTS itself expands via the reconstructed alignment matrix instead
-- `efficient_tts.py:190-192` -- but the length regulator is part of the
layer inventory and serves FastSpeech-style external-duration models.)
"""

from __future__ import annotations

import jax.numpy as jnp


def length_regulator(
    x: jnp.ndarray,
    durations: jnp.ndarray,
    max_len: int,
    pad_value: float = 0.0,
) -> jnp.ndarray:
    """x [B, T1, C], durations [B, T1] (int) -> [B, max_len, C].

    Frame t maps to the token whose cumulative-duration interval contains
    t; frames beyond sum(durations) are `pad_value`.
    """
    cum = jnp.cumsum(durations, axis=1)  # [B, T1], end frame per token
    t = jnp.arange(max_len)[None, :, None]  # [1, max_len, 1]
    starts = jnp.concatenate(
        [jnp.zeros_like(cum[:, :1]), cum[:, :-1]], axis=1
    )[:, None, :]  # [B, 1, T1]
    ends = cum[:, None, :]
    # one-hot assignment [B, max_len, T1]
    assign = (t >= starts) & (t < ends)
    y = jnp.einsum("btk,bkc->btc", assign.astype(x.dtype), x)
    valid = jnp.any(assign, axis=-1, keepdims=True)
    return jnp.where(valid, y, pad_value)
