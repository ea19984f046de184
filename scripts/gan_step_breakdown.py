"""In-context decomposition of the GAN vocoder train step (bf16, B=16,
segment 8192) by timing jitted ABLATED steps, not isolated sub-graphs.

Round-2's isolated component timings (PERF.md "GAN vocoder train step")
mis-attributed cost: fgc/bgc/dense grouped-conv lowerings all landed at
~88 ms whole-step, so the k=41 kernel-gradients may not be the
in-context bottleneck. This script ablates the step itself:

  full        : D update + G update (production step)
  no_d_update : G update only (D params frozen, but same G graph)
  no_g_adv    : D update + G update with mel-L1 loss only (no disc
                towers in the G backward)
  gen_only    : generator fwd+bwd+adam on the mel loss only
  d_only      : D update only

Each ablation keeps optimizer updates and state threading so XLA sees a
realistic program. Differences between ablations attribute wall time to
the removed piece *as scheduled in context*.

Run: python scripts/gan_step_breakdown.py [bf16|f32]
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

from efficient_tts_tpu.dsp.mel import MelConfig, mel_spectrogram
from efficient_tts_tpu.losses.gan import (
    discriminator_loss,
    feature_loss,
    generator_loss,
)
from efficient_tts_tpu.models import hifigan as hg
from efficient_tts_tpu.models.hifigan import HiFiGANConfig
from efficient_tts_tpu.train.hifigan_train_step import init_gan_state


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


def make_ablated_step(
    voc_cfg,
    gen_tx,
    disc_tx,
    mel_cfg,
    compute_dtype,
    *,
    d_update=True,
    g_update=True,
    g_adv=True,
    d_towers=("mpd", "msd"),
    g_towers=("mpd", "msd"),
):
    mel_loss_weight = 45.0

    def d_loss_fn(d_params, y, y_hat):
        loss = jnp.zeros(())
        if "mpd" in d_towers:
            mpd_r, mpd_g, _, _ = hg.mpd_forward(
                d_params["mpd"], y, y_hat, compute_dtype=compute_dtype, fused=True
            )
            loss += discriminator_loss(mpd_r, mpd_g)[0]
        if "msd" in d_towers:
            msd_r, msd_g, _, _ = hg.msd_forward(
                d_params["msd"], y, y_hat, compute_dtype=compute_dtype, fused=True
            )
            loss += discriminator_loss(msd_r, msd_g)[0]
        return loss

    def g_loss_fn(g_params, d_params, mel_in, y, mel_target):
        y_hat = hg.generator(g_params, mel_in, voc_cfg, compute_dtype=compute_dtype)
        mel_hat = jnp.swapaxes(mel_spectrogram(y_hat, mel_cfg), 1, 2)
        loss = jnp.mean(jnp.abs(mel_hat - mel_target)) * mel_loss_weight
        if g_adv:
            if "mpd" in g_towers:
                mpd_r, mpd_g, fmap_r_p, fmap_g_p = hg.mpd_forward(
                    d_params["mpd"], y, y_hat, compute_dtype=compute_dtype
                )
                loss = (
                    loss
                    + feature_loss(fmap_r_p, fmap_g_p)
                    + generator_loss(mpd_g)[0]
                )
            if "msd" in g_towers:
                msd_r, msd_g, fmap_r_s, fmap_g_s = hg.msd_forward(
                    d_params["msd"], y, y_hat, compute_dtype=compute_dtype
                )
                loss = (
                    loss
                    + feature_loss(fmap_r_s, fmap_g_s)
                    + generator_loss(msd_g)[0]
                )
        return loss

    @jax.jit
    def step(state, batch):
        mel_in, y, mel_target = batch["mel"], batch["audio"], batch["mel_loss"]
        disc_params = dict(state["disc"]["params"])
        disc_params["msd"] = hg.msd_power_iteration(disc_params["msd"])
        state = {
            **state,
            "disc": {"params": disc_params, "opt_state": state["disc"]["opt_state"]},
        }
        if d_update:
            y_hat = jax.lax.stop_gradient(
                hg.generator(
                    state["gen"]["params"], mel_in, voc_cfg,
                    compute_dtype=compute_dtype,
                )
            )
            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
                state["disc"]["params"], y, y_hat
            )
            d_updates, d_opt = disc_tx.update(
                d_grads, state["disc"]["opt_state"], state["disc"]["params"]
            )
            d_params = optax.apply_updates(state["disc"]["params"], d_updates)
        else:
            d_loss = jnp.zeros(())
            d_params = state["disc"]["params"]
            d_opt = state["disc"]["opt_state"]
        if g_update:
            g_loss, g_grads = jax.value_and_grad(g_loss_fn)(
                state["gen"]["params"], d_params, mel_in, y, mel_target
            )
            g_updates, g_opt = gen_tx.update(
                g_grads, state["gen"]["opt_state"], state["gen"]["params"]
            )
            g_params = optax.apply_updates(state["gen"]["params"], g_updates)
        else:
            g_loss = jnp.zeros(())
            g_params = state["gen"]["params"]
            g_opt = state["gen"]["opt_state"]
        new_state = {
            "gen": {"params": g_params, "opt_state": g_opt},
            "disc": {"params": d_params, "opt_state": d_opt},
            "step": state["step"] + 1,
        }
        return new_state, d_loss + g_loss

    return step


def main():
    mode = (sys.argv[1:] or ["bf16"])[0]
    compute_dtype = jnp.bfloat16 if mode == "bf16" else None
    B, SEG = 16, 8192
    F = SEG // 256
    cfg = HiFiGANConfig()
    mel_cfg = MelConfig()
    tx = optax.adam(2e-4, b1=0.8, b2=0.99)
    rng = np.random.RandomState(0)
    batch = {
        "mel": jnp.asarray(rng.randn(B, F, cfg.num_mels), jnp.float32),
        "audio": jnp.asarray(np.tanh(rng.randn(B, SEG)).astype(np.float32) * 0.5),
        "mel_loss": jnp.asarray(rng.randn(B, F, cfg.num_mels), jnp.float32),
    }
    ablations = {
        "full": dict(),
        "d_only": dict(g_update=False),
        "no_d_update": dict(d_update=False),
        "no_g_adv": dict(g_adv=False),
        "gen_only": dict(d_update=False, g_adv=False),
        "d_only_mpd": dict(g_update=False, d_towers=("mpd",)),
        "d_only_msd": dict(g_update=False, d_towers=("msd",)),
        "g_adv_mpd": dict(d_update=False, g_towers=("mpd",)),
        "g_adv_msd": dict(d_update=False, g_towers=("msd",)),
    }
    times = {}
    for name, kw in ablations.items():
        state = init_gan_state(jax.random.PRNGKey(0), cfg, tx, tx)
        step = make_ablated_step(cfg, tx, tx, mel_cfg, compute_dtype, **kw)
        state, _ = step(state, batch)  # compile
        holder = {"s": state}

        def run():
            s, l = step(holder["s"], batch)
            holder["s"] = s
            return l

        t = time_fn(run, lambda l: l)
        times[name] = t * 1e3
        print(f"{name:12s}: {t*1e3:7.1f} ms")
    print()
    print(f"D update (full - no_d_update)      : {times['full']-times['no_d_update']:7.1f} ms")
    print(f"G adv towers (full - no_g_adv)     : {times['full']-times['no_g_adv']:7.1f} ms")
    print(f"gen+mel core (gen_only)            : {times['gen_only']:7.1f} ms")
    print(f"sum check d_only+no_d_update       : {times['d_only']+times['no_d_update']:7.1f} ms vs full {times['full']:7.1f}")


if __name__ == "__main__":
    main()
