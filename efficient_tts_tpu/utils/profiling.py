"""Profiling and timing harness.

The reference's only perf instrumentation is an RTF print in the
inference CLI (`nntts/bin/inference.py:111-113,127-128`); here profiling
is first-class: jax.profiler trace capture around any callable, an
RTF/throughput meter, and a chain-timing helper that cancels fixed
host-readback latency (important on relay-attached TPUs where
block_until_ready can return early).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _readback(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def time_step(fn, *args, iters: int = 20, warmup: int = 2) -> float:
    """Seconds per call of `fn(*args)`, RTT-compensated.

    Times "enqueue k steps + one readback" for k in {2, 2+iters}; the
    difference cancels dispatch and readback constants.
    """
    for _ in range(warmup):
        _readback(fn(*args))

    def chain(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        _readback(out)
        return time.perf_counter() - t0

    t_small = chain(2)
    t_large = chain(2 + iters)
    return max((t_large - t_small) / iters, 1e-9)


class RTFMeter:
    """Accumulates synthesis wall-time vs produced audio seconds
    (the reference's per-utterance RTF accounting, batched)."""

    def __init__(self, sample_rate: int = 22050):
        self.sample_rate = sample_rate
        self.audio_seconds = 0.0
        self.wall_seconds = 0.0

    @contextlib.contextmanager
    def measure(self, n_samples: int):
        t0 = time.perf_counter()
        yield
        self.wall_seconds += time.perf_counter() - t0
        self.audio_seconds += n_samples / self.sample_rate

    @property
    def rtf(self) -> float:
        return self.wall_seconds / max(self.audio_seconds, 1e-9)

    @property
    def throughput(self) -> float:
        """Audio seconds synthesized per wall second."""
        return self.audio_seconds / max(self.wall_seconds, 1e-9)

    def __repr__(self):
        return f"RTFMeter(rtf={self.rtf:.4f}, audio_s/s={self.throughput:.1f})"
