"""Whole-generator timing under candidate MRF strategy tables.

Standalone per-conv timings (bench_mrf_variants.py) are noisy through
the relay and miss XLA's in-context fusion, so the table is chosen by
timing the full jitted generator per candidate.

Run on TPU:  python scripts/bench_mrf_whole.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from efficient_tts_tpu.models import hifigan as hg
from efficient_tts_tpu.nn.layers import fold_weight_norm


def time_fn(run, tail, k_small=2, k_large=12, reps=3):
    def chain(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = run()
        float(tail(out))
        return time.perf_counter() - t0

    estimates = []
    for _ in range(reps):
        estimates.append(
            max((chain(k_large) - chain(k_small)) / (k_large - k_small), 1e-9)
        )
    return sorted(estimates)[len(estimates) // 2]


def main():
    cfg = hg.HiFiGANConfig()
    params = fold_weight_norm(hg.init_generator(jax.random.PRNGKey(1), cfg))
    b, t2 = 16, 512
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, t2, cfg.num_mels)),
        jnp.bfloat16,
    )

    def table(d):
        return lambda ch, k, dil: d.get((ch, k, dil), "packed")

    candidates = {
        "all-packed": table({}),
        "k11d1-plain": table({(64, 11, 1): "plain", (32, 11, 1): "plain"}),
        "stage2-plain": table({(64, k, d): "plain" for k in (3, 7, 11) for d in (1, 3, 5)}),
        "stage3-plain": table({(32, k, d): "plain" for k in (3, 7, 11) for d in (1, 3, 5)}),
        "k11-plain": table({(ch, 11, d): "plain" for ch in (32, 64) for d in (1, 3, 5)}),
        "phase-d5": table({(ch, k, 5): "phase" for ch in (32, 64) for k in (3, 7, 11)}),
    }
    tail = jax.jit(lambda w: w[0, -1])
    audio_s = b * t2 * cfg.hop_size / cfg.sampling_rate
    for name, strat in candidates.items():
        fn = jax.jit(
            lambda m, s=strat: hg.generator(
                params, m, cfg, compute_dtype=jnp.bfloat16, mrf_strategy=s
            )
        )
        float(tail(fn(mel)))
        dt = time_fn(lambda: fn(mel), tail)
        print(f"{name:14s} {dt*1e3:7.2f} ms   {audio_s/dt:7.0f} audio-s/s")


if __name__ == "__main__":
    main()
