"""GAN vocoder train-step timing on TPU at the reference config's shape
(segment 8192 samples = 32 mel frames, batch 16).

Run on TPU:  python scripts/bench_gan_step.py [f32|bf16] ...
(no args = bench all modes)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from efficient_tts_tpu.utils.jax_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
import optax

from efficient_tts_tpu.models.hifigan import HiFiGANConfig
from efficient_tts_tpu.train.hifigan_train_step import (
    init_gan_state,
    make_gan_train_step,
)


def time_fn(run, tail, k_small=2, k_large=10, reps=3):
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


def bench_mode(name, compute_dtype):
    B, SEG = 16, 8192
    F = SEG // 256
    cfg = HiFiGANConfig()
    tx = optax.adam(2e-4, b1=0.8, b2=0.99)
    state = init_gan_state(jax.random.PRNGKey(0), cfg, tx, tx)
    step = jax.jit(
        make_gan_train_step(cfg, tx, tx, compute_dtype=compute_dtype),
        donate_argnums=0,
    )
    rng = np.random.RandomState(0)
    batch = {
        "mel": jnp.asarray(rng.randn(B, F, cfg.num_mels), jnp.float32),
        "audio": jnp.asarray(
            np.tanh(rng.randn(B, SEG)).astype(np.float32) * 0.5
        ),
        "mel_loss": jnp.asarray(rng.randn(B, F, cfg.num_mels), jnp.float32),
    }

    state, metrics = step(state, batch)

    holder = {"state": state}

    def run():
        s, m = step(holder["state"], batch)
        holder["state"] = s
        return m

    t = time_fn(run, lambda m: m["g_loss"])
    utts = B / t
    print(
        f"GAN train step [{name}] B={B} seg={SEG}: {t*1e3:.1f} ms "
        f"({utts:.0f} segments/s/chip)"
    )


def main():
    modes = sys.argv[1:] or ["f32", "bf16"]
    for m in modes:
        bench_mode(m, jnp.bfloat16 if m == "bf16" else None)


if __name__ == "__main__":
    main()
