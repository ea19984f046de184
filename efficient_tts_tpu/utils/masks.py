"""Length-mask and padding utilities.

TPU-native counterpart of the reference mask helpers
(`/root/reference/nntts/utils/nets_utils.py:28-175`:
`make_non_pad_mask` / `make_pad_mask` / `pad_list`), redesigned for
static-shape XLA graphs: masks are built from a *static* padded length
plus a dynamic per-sequence length vector, so the same compiled graph
serves every batch of a bucket.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_len: int, dtype=jnp.bool_) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] mask, True on valid (non-pad) steps.

    Equivalent to the reference `make_non_pad_mask(lengths)` evaluated at a
    fixed padded width (`nets_utils.py:105-175`).
    """
    lengths = jnp.asarray(lengths)
    pos = jnp.arange(max_len, dtype=lengths.dtype)
    return (pos[None, :] < lengths[:, None]).astype(dtype)


def pad_mask(lengths: jnp.ndarray, max_len: int, dtype=jnp.bool_) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] mask, True on PAD steps.

    Equivalent to the reference `make_pad_mask` (`nets_utils.py:28-102`).
    """
    lengths = jnp.asarray(lengths)
    pos = jnp.arange(max_len, dtype=lengths.dtype)
    return (pos[None, :] >= lengths[:, None]).astype(dtype)


def pad_to(x: np.ndarray, length: int, axis: int = 0, value=0) -> np.ndarray:
    """Host-side: pad `x` with `value` along `axis` up to `length`."""
    if x.shape[axis] > length:
        raise ValueError(f"sequence of length {x.shape[axis]} > target {length}")
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, length - x.shape[axis])
    return np.pad(x, widths, mode="constant", constant_values=value)


def pad_list(xs, pad_value=0):
    """Host-side: stack variable-length numpy arrays, right-padded.

    Behavioral analog of the reference `pad_list` (`nets_utils.py:*`),
    operating on numpy (data pipeline runs on host, not device).
    """
    max_len = max(x.shape[0] for x in xs)
    return np.stack([pad_to(np.asarray(x), max_len, axis=0, value=pad_value) for x in xs])


def round_up(x: int, multiple: int) -> int:
    return -(-x // multiple) * multiple


def bucket_length(length: int, multiple: int = 32, min_len: int = 32) -> int:
    """Round a dynamic length up to a static bucket so jit caches stay warm.

    The reference synthesizes with a data-dependent mel length
    (`efficient_tts.py:358-363`, `round(e[-1]).item()`); under XLA we
    instead pad T2 to the nearest bucket and mask the tail, so each bucket
    compiles once.
    """
    return max(min_len, round_up(int(length), multiple))
