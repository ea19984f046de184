"""GAN train-step tests: one jitted D+G update on a tiny segment."""

import numpy as np
import jax
import jax.numpy as jnp

from efficient_tts_tpu.dsp.mel import MelConfig, mel_spectrogram_np
from efficient_tts_tpu.models.hifigan import HiFiGANConfig
from efficient_tts_tpu.train.hifigan_train_step import (
    init_gan_state,
    make_gan_train_step,
)
from efficient_tts_tpu.train.optim import hifigan_adam

VOC_CFG = HiFiGANConfig(
    upsample_rates=(8, 8, 2, 2),
    upsample_kernel_sizes=(16, 16, 4, 4),
    upsample_initial_channel=64,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
    segment_size=2048,
)


def _batch(b=2, segment=2048):
    rng = np.random.default_rng(0)
    t = np.arange(segment) / 22050.0
    audio = 0.5 * np.sin(2 * np.pi * 220 * t)[None, :] * np.ones((b, 1))
    audio = (audio + 0.01 * rng.standard_normal((b, segment))).astype(np.float32)
    mel = np.stack([mel_spectrogram_np(a, MelConfig()).T for a in audio])
    return {"mel": mel, "audio": audio, "mel_loss": mel.copy()}


def test_gan_step_runs_and_updates():
    gen_tx = hifigan_adam(lr=2e-4)
    disc_tx = hifigan_adam(lr=2e-4)
    state = init_gan_state(jax.random.PRNGKey(0), VOC_CFG, gen_tx, disc_tx)
    step = make_gan_train_step(VOC_CFG, gen_tx, disc_tx)

    batch = _batch()
    g0 = jax.tree_util.tree_leaves(state["gen"]["params"])[0].copy()
    d0 = jax.tree_util.tree_leaves(state["disc"]["params"])[0].copy()

    state, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert int(state["step"]) == 1

    g1 = jax.tree_util.tree_leaves(state["gen"]["params"])[0]
    d1 = jax.tree_util.tree_leaves(state["disc"]["params"])[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_spectral_norm_state_advances():
    """The u/v power-iteration buffers must persist across jitted steps."""
    gen_tx = hifigan_adam(lr=2e-4)
    disc_tx = hifigan_adam(lr=2e-4)
    state = init_gan_state(jax.random.PRNGKey(0), VOC_CFG, gen_tx, disc_tx)
    step = make_gan_train_step(VOC_CFG, gen_tx, disc_tx)
    batch = _batch()
    u0 = np.asarray(state["disc"]["params"]["msd"]["discriminators"][0]["convs"][0]["u"])
    state, _ = step(state, batch)
    u1 = np.asarray(state["disc"]["params"]["msd"]["discriminators"][0]["convs"][0]["u"])
    assert not np.allclose(u0, u1)
    state, _ = step(state, batch)
    u2 = np.asarray(state["disc"]["params"]["msd"]["discriminators"][0]["convs"][0]["u"])
    assert not np.allclose(u1, u2)
    # u converges toward the top singular vector: successive updates shrink
    assert np.linalg.norm(u2 - u1) < np.linalg.norm(u1 - u0) * 2.0


def test_gan_mel_loss_decreases():
    gen_tx = hifigan_adam(lr=2e-4)
    disc_tx = hifigan_adam(lr=2e-4)
    state = init_gan_state(jax.random.PRNGKey(0), VOC_CFG, gen_tx, disc_tx)
    step = make_gan_train_step(VOC_CFG, gen_tx, disc_tx)
    batch = _batch()
    first = None
    for _ in range(5):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["mel_l1"])
    assert float(metrics["mel_l1"]) < first


def test_gan_with_stft_loss():
    gen_tx = hifigan_adam(lr=2e-4)
    disc_tx = hifigan_adam(lr=2e-4)
    state = init_gan_state(jax.random.PRNGKey(0), VOC_CFG, gen_tx, disc_tx)
    step = make_gan_train_step(VOC_CFG, gen_tx, disc_tx, use_stft_loss=True)
    state, metrics = step(state, _batch())
    assert np.isfinite(float(metrics["stft_sc"]))
    assert np.isfinite(float(metrics["stft_mag"]))


def test_generator_output_matches_segment():
    """segment_size / hop frames of mel must reproduce segment_size samples."""
    import efficient_tts_tpu.models.hifigan as hg

    params = hg.init_generator(jax.random.PRNGKey(0), VOC_CFG)
    mel = np.zeros((1, 8, 80), np.float32)
    wav = hg.generator(params, mel, VOC_CFG)
    assert wav.shape == (1, 8 * VOC_CFG.total_upsampling)
    assert VOC_CFG.total_upsampling == 256
