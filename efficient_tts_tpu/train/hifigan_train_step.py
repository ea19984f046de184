"""HiFi-GAN adversarial training step (generator + MPD + MSD).

The reference ships the discriminators and GAN losses
(`hifigan_model.py:148-302`) and the segment dataset (`meldataset.py:96-178`)
but no vocoder trainer (SURVEY.md §2.5); this module supplies it,
following the official HiFi-GAN recipe the reference's config encodes
(`HiFiGAN_LJ_V1/config.json`: Adam lr 2e-4 betas (0.8, 0.99), LSGAN,
segment 8192, mel-L1 weight 45, feature-matching x2):

  D step: LSGAN real/fake on (y, stop_grad(G(mel))) for MPD + MSD
  G step: 45 * L1(mel(G(mel)), mel_target) + feature matching + LSGAN

One jitted XLA graph runs D update then G update; both optimizers'
states live in a single train-state pytree. The mel-of-generated-audio
reuses the canonical jit DSP (`dsp/mel.py`), so the whole GAN step is a
single compiled program -- no host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from efficient_tts_tpu.dsp.mel import MelConfig, loss_mel_config, mel_spectrogram
from efficient_tts_tpu.losses.gan import (
    discriminator_loss,
    feature_loss,
    generator_loss,
)
from efficient_tts_tpu.losses.stft_loss import multi_resolution_stft_loss
from efficient_tts_tpu.models import hifigan as hg
from efficient_tts_tpu.models.hifigan import HiFiGANConfig


# Production grouped-conv lowering defaults for the MSD, chosen by
# whole-step timing on v5e (see `make_gan_train_step` docstring and
# PERF.md "MSD grouped-conv lowering study"); exactness is
# impl-independent.
MSD_D_UPDATE_IMPL = "fgc"
MSD_G_UPDATE_IMPL = "fgc"


def init_gan_state(
    key, voc_cfg: HiFiGANConfig, gen_tx, disc_tx, ema_decay: float | None = None
) -> dict:
    kg, kp, ks = jax.random.split(key, 3)
    gen = hg.init_generator(kg, voc_cfg)
    mpd = hg.init_mpd(kp)
    msd = hg.init_msd(ks)
    state = {
        "gen": {"params": gen, "opt_state": gen_tx.init(gen)},
        "disc": {
            "params": {"mpd": mpd, "msd": msd},
            "opt_state": disc_tx.init({"mpd": mpd, "msd": msd}),
        },
        "step": jnp.zeros((), jnp.int32),
    }
    if ema_decay is not None:
        # EMA of generator weights for eval/serving (smoother than the raw
        # GAN iterate; standard vocoder-training hardening — not in the
        # reference, which ships no vocoder trainer at all)
        state["ema"] = gen
    return state


def ema_generator_params(state: dict) -> dict:
    """Serving/eval generator params: the EMA copy when tracked."""
    return state.get("ema", state["gen"]["params"])


def shard_gan_state(
    key, voc_cfg: HiFiGANConfig, gen_tx, disc_tx, mesh,
    ema_decay: float | None = None,
) -> dict:
    """Init a GAN train state placed on a ('data','model') mesh:
    generator channel-sharded over 'model' (the BASELINE north star —
    shard the HiFi-GAN generator when it exceeds one chip's HBM),
    discriminators + their optimizer replicated (they are ~1/6 the
    generator's footprint and carry spectral-norm u/v power-iteration
    state that must see full kernels). Optimizer moments are created
    from the *placed* params so `zeros_like` inherits the shardings —
    the same recipe as `efts_train_step.shard_state`."""
    from efficient_tts_tpu.parallel.sharding import param_sharding, replicated

    kg, kp, ks = jax.random.split(key, 3)
    gen = hg.init_generator(kg, voc_cfg)
    gen = jax.tree_util.tree_map(
        jax.device_put, gen, param_sharding(gen, mesh)
    )
    rep = replicated(mesh)
    disc = jax.device_put(
        {"mpd": hg.init_mpd(kp), "msd": hg.init_msd(ks)}, rep
    )
    state = {
        "gen": {"params": gen, "opt_state": gen_tx.init(gen)},
        "disc": {"params": disc, "opt_state": disc_tx.init(disc)},
        "step": jax.device_put(jnp.zeros((), jnp.int32), rep),
    }
    if ema_decay is not None:
        state["ema"] = gen
    return state


def make_gan_train_step(
    voc_cfg: HiFiGANConfig,
    gen_tx,
    disc_tx,
    mel_cfg: MelConfig = MelConfig(),
    mel_loss_weight: float = 45.0,
    use_stft_loss: bool = False,
    stft_loss_weight: float = 1.0,
    ema_decay: float | None = None,
    compute_dtype=None,
    msd_grouped_impl=("auto", "auto"),
    fmax_loss: float | None = None,
):
    """Returns train_step(state, batch) -> (state, metrics).

    batch: {"mel": [B, F, n_mels] (generator input),
            "audio": [B, S] ground-truth segment,
            "mel_loss": [B, F, n_mels] mel-loss target (fmax_loss DSP)}.

    `fmax_loss` is the official `fmax_for_loss` (None = full-band): the
    mel of the generated audio is computed with `loss_mel_config` so it
    shares the filterbank of the dataset's `mel_loss` target — see
    `dsp.mel.loss_mel_config` for why mismatched filterbanks here are
    a correctness bug, not a knob.

    `compute_dtype=jnp.bfloat16` runs generator + discriminator conv
    towers in bf16 (params, optimizer states, loss reductions, and the
    mel DSP stay f32). The D step fuses real/fake into one [2B]
    discriminator pass (exact; see `hg.mpd_forward`).

    `msd_grouped_impl`: (D-update impl, G-update impl) grouped-conv
    lowering for the MSD towers (`hg._grouped_conv1d`; all choices are
    numerically the same op). Isolated-conv timings favor block-diagonal
    dense for the grouped kernel-gradient (D update) and group-to-batch
    for input gradients (G update), but whole-step measurement on v5e
    shows fgc/bgc within noise (88.2-88.6 ms at B=16 bf16) and dense
    losing (97 ms) — the isolated wins are absorbed by XLA fusion across
    the step. "auto" therefore keeps the direct feature_group_count
    lowering; the knob and the exactness tests remain for other
    hardware/shape regimes (PERF.md).
    """
    d_impl, g_impl = msd_grouped_impl
    if d_impl == "auto":
        d_impl = MSD_D_UPDATE_IMPL
    if g_impl == "auto":
        g_impl = MSD_G_UPDATE_IMPL
    loss_cfg = loss_mel_config(mel_cfg, fmax_loss)

    def d_loss_fn(d_params, y, y_hat):
        mpd_r, mpd_g, _, _ = hg.mpd_forward(
            d_params["mpd"], y, y_hat, compute_dtype=compute_dtype, fused=True
        )
        loss_mpd, _, _ = discriminator_loss(mpd_r, mpd_g)
        msd_r, msd_g, _, _ = hg.msd_forward(
            d_params["msd"],
            y,
            y_hat,
            compute_dtype=compute_dtype,
            fused=True,
            grouped_impl=d_impl,
        )
        loss_msd, _, _ = discriminator_loss(msd_r, msd_g)
        return loss_mpd + loss_msd, (loss_mpd, loss_msd)

    def g_loss_fn(g_params, d_params, mel_in, y, mel_target):
        y_hat = hg.generator(g_params, mel_in, voc_cfg, compute_dtype=compute_dtype)
        mel_hat = jnp.swapaxes(mel_spectrogram(y_hat, loss_cfg), 1, 2)
        loss_mel = jnp.mean(jnp.abs(mel_hat - mel_target)) * mel_loss_weight

        mpd_r, mpd_g, fmap_r_p, fmap_g_p = hg.mpd_forward(
            d_params["mpd"], y, y_hat, compute_dtype=compute_dtype
        )
        msd_r, msd_g, fmap_r_s, fmap_g_s = hg.msd_forward(
            d_params["msd"],
            y,
            y_hat,
            compute_dtype=compute_dtype,
            grouped_impl=g_impl,
        )
        loss_fm = feature_loss(fmap_r_p, fmap_g_p) + feature_loss(fmap_r_s, fmap_g_s)
        adv_p, _ = generator_loss(mpd_g)
        adv_s, _ = generator_loss(msd_g)
        loss = loss_mel + loss_fm + adv_p + adv_s
        aux = {"mel_l1": loss_mel / mel_loss_weight, "fm": loss_fm,
               "adv": adv_p + adv_s}
        if use_stft_loss:
            sc, mag = multi_resolution_stft_loss(y_hat, y)
            loss = loss + stft_loss_weight * (sc + mag)
            aux["stft_sc"] = sc
            aux["stft_mag"] = mag
        return loss, (y_hat, aux)

    @jax.jit
    def train_step(state, batch):
        mel_in = batch["mel"]
        y = batch["audio"]
        mel_target = batch["mel_loss"]

        # advance spectral-norm power iteration (torch does this inside the
        # training forward; functionally it's explicit per-step state)
        disc_params = dict(state["disc"]["params"])
        disc_params["msd"] = hg.msd_power_iteration(disc_params["msd"])
        state = {
            **state,
            "disc": {"params": disc_params, "opt_state": state["disc"]["opt_state"]},
        }

        # --- discriminator update (fake detached) ---
        y_hat = jax.lax.stop_gradient(
            hg.generator(
                state["gen"]["params"], mel_in, voc_cfg, compute_dtype=compute_dtype
            )
        )
        (d_loss, (l_mpd, l_msd)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state["disc"]["params"], y, y_hat)
        d_updates, d_opt = disc_tx.update(
            d_grads, state["disc"]["opt_state"], state["disc"]["params"]
        )
        d_params = optax.apply_updates(state["disc"]["params"], d_updates)

        # --- generator update (against the updated discriminators) ---
        (g_loss, (_, aux)), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state["gen"]["params"], d_params, mel_in, y, mel_target
        )
        g_updates, g_opt = gen_tx.update(
            g_grads, state["gen"]["opt_state"], state["gen"]["params"]
        )
        g_params = optax.apply_updates(state["gen"]["params"], g_updates)

        new_state = {
            "gen": {"params": g_params, "opt_state": g_opt},
            "disc": {"params": d_params, "opt_state": d_opt},
            "step": state["step"] + 1,
        }
        if ema_decay is not None:
            new_state["ema"] = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                state["ema"],
                g_params,
            )
        metrics = {
            "d_loss": d_loss,
            "d_mpd": l_mpd,
            "d_msd": l_msd,
            "g_loss": g_loss,
            **aux,
        }
        return new_state, metrics

    # pinned by tests: the filterbank of the generated-audio mel must be
    # the dataset's loss filterbank (see `loss_mel_config`)
    train_step.loss_mel_cfg = loss_cfg
    return train_step


def make_gan_eval_step(
    voc_cfg: HiFiGANConfig,
    mel_cfg: MelConfig = MelConfig(),
    fmax_loss: float | None = None,
):
    """Validation metric: mel-spectrogram L1 of generated vs ground truth
    (the official HiFi-GAN recipe's val metric; the reference ships no
    vocoder trainer at all). The hypothesis mel uses the SAME
    `loss_mel_config` filterbank as the dataset's `mel_loss` target."""
    loss_cfg = loss_mel_config(mel_cfg, fmax_loss)

    @jax.jit
    def eval_step(gen_params, batch):
        y_hat = hg.generator(gen_params, batch["mel"], voc_cfg)
        mel_hat = jnp.swapaxes(mel_spectrogram(y_hat, loss_cfg), 1, 2)
        return {"mel_l1": jnp.mean(jnp.abs(mel_hat - batch["mel_loss"]))}

    eval_step.loss_mel_cfg = loss_cfg
    return eval_step
