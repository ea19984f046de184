"""Whole-step GAN timing across MSD grouped-conv gradient lowerings.

Round-3 follow-up to the round-2 lowering study (PERF.md): that study
swapped the FORWARD lowering and let autodiff derive both gradients from
it — all choices landed at ~88 ms. The new `vjp:<igrad>,<wgrad>` impls
(`hifigan._grouped_conv1d_custom_grads`) decouple the two gradient
directions; this times the production `make_gan_train_step` for chosen
(D-update impl, G-update impl) pairs in-context.

Run: python scripts/bench_gan_impls.py [combo ...]
  combo = "<d_impl>/<g_impl>", default sweep:
    fgc/fgc (baseline), vjp:bgc,tap/fgc, vjp:bgc,dense/fgc,
    vjp:fgc,tap/fgc, best-d/vjp:bgc,fgc
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

from efficient_tts_tpu.models.hifigan import HiFiGANConfig
from efficient_tts_tpu.train.hifigan_train_step import (
    init_gan_state,
    make_gan_train_step,
)
from efficient_tts_tpu.utils.jax_cache import enable_persistent_compilation_cache


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


def bench_combo(d_impl, g_impl, compute_dtype=jnp.bfloat16):
    B, SEG = 16, 8192
    F = SEG // 256
    cfg = HiFiGANConfig()
    tx = optax.adam(2e-4, b1=0.8, b2=0.99)
    state = init_gan_state(jax.random.PRNGKey(0), cfg, tx, tx)
    step = jax.jit(
        make_gan_train_step(
            cfg, tx, tx, compute_dtype=compute_dtype,
            msd_grouped_impl=(d_impl, g_impl),
        ),
        donate_argnums=0,
    )
    rng = np.random.RandomState(0)
    batch = {
        "mel": jnp.asarray(rng.randn(B, F, cfg.num_mels), jnp.float32),
        "audio": jnp.asarray(np.tanh(rng.randn(B, SEG)).astype(np.float32) * 0.5),
        "mel_loss": jnp.asarray(rng.randn(B, F, cfg.num_mels), jnp.float32),
    }
    state, _ = step(state, batch)
    holder = {"s": state}

    def run():
        s, m = step(holder["s"], batch)
        holder["s"] = s
        return m

    t = time_fn(run, lambda m: m["g_loss"])
    print(f"D={d_impl:16s} G={g_impl:16s}: {t*1e3:7.1f} ms "
          f"({B/t:.0f} segments/s/chip)", flush=True)
    return t


def main():
    enable_persistent_compilation_cache()
    combos = [c.split("/") for c in sys.argv[1:]] or [
        ("fgc", "fgc"),
        ("vjp:bgc,tap", "fgc"),
        ("vjp:bgc,dense", "fgc"),
        ("vjp:fgc,tap", "fgc"),
        ("fgc", "vjp:bgc,fgc"),
    ]
    for d_impl, g_impl in combos:
        bench_combo(d_impl, g_impl)


if __name__ == "__main__":
    main()
