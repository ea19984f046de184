"""EFTS-CNN train-step timing: f32 vs bf16 compute, device-resident batch.

Run on TPU:  python scripts/bench_train_step.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from efficient_tts_tpu.models import efficient_tts as efts
from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
from efficient_tts_tpu.train.efts_train_step import make_train_step


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


def main():
    B, T1, T2 = 32, 128, 896
    rng = np.random.RandomState(0)
    batch = {
        "text": jnp.asarray(rng.randint(1, 75, (B, T1)), jnp.int32),
        "text_lengths": jnp.full((B,), T1, jnp.int32),
        "mel": jnp.asarray(rng.randn(B, T2, 80), jnp.float32),
        "mel_lengths": jnp.full((B,), T2, jnp.int32),
    }
    tx = optax.adam(1e-3)
    key = jax.random.PRNGKey(0)
    for dtype in (None, "bfloat16"):
        cfg = EftsCNNConfig(
            num_symbols=76, dropout_rate=0.0, use_masking=True, compute_dtype=dtype
        )
        params = efts.init(jax.random.PRNGKey(0), cfg)
        state = {"params": params, "opt_state": tx.init(params), "step": jnp.zeros((), jnp.int32)}
        step = jax.jit(make_train_step(cfg, tx), donate_argnums=0)
        state, m = step(state, batch, key)
        holder = {"s": state}

        def run():
            s, m = step(holder["s"], batch, key)
            holder["s"] = s
            return m

        t = time_fn(run, lambda m: m["loss"])
        print(
            f"compute_dtype={dtype or 'float32':9s}: {t*1e3:6.2f} ms/step "
            f"({B/t:7.0f} utts/s/chip)"
        )


if __name__ == "__main__":
    main()
