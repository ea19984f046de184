"""GAN train-step tests: one jitted D+G update on a tiny segment."""

import numpy as np
import jax
import jax.numpy as jnp

from efficient_tts_tpu.dsp.mel import MelConfig, loss_mel_config, mel_spectrogram_np
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
    # loss target through the official fmax_for_loss=None (full-band)
    # filterbank, matching MelAudioSegmentDataset and the train step
    loss_cfg = loss_mel_config(MelConfig(), None)
    mel_loss = np.stack([mel_spectrogram_np(a, loss_cfg).T for a in audio])
    return {"mel": mel, "audio": audio, "mel_loss": mel_loss}


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


def test_gan_dp_tp_matches_dp():
    """One GAN step with the generator channel-sharded over 'model' must
    match the dp-only (replicated-params) step numerically — the
    training-side pin for the north star's sharded-generator story
    (dryrun covers execution; this covers numerics)."""
    from jax.sharding import Mesh

    from efficient_tts_tpu.parallel.mesh import make_mesh
    from efficient_tts_tpu.train.hifigan_train_step import shard_gan_state

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs >=4 virtual devices")
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    gen_tx = hifigan_adam(lr=2e-4)
    disc_tx = hifigan_adam(lr=2e-4)
    step = make_gan_train_step(VOC_CFG, gen_tx, disc_tx)
    batch = _batch(b=2)

    dp_state = init_gan_state(jax.random.PRNGKey(0), VOC_CFG, gen_tx, disc_tx)
    dp_state, dp_metrics = step(dp_state, batch)

    tp_state = shard_gan_state(jax.random.PRNGKey(0), VOC_CFG, gen_tx, disc_tx, mesh)
    # verify the generator really is sharded over 'model'
    from efficient_tts_tpu.parallel.mesh import MODEL_AXIS

    sharded_leaves = [
        leaf for leaf in jax.tree_util.tree_leaves(tp_state["gen"]["params"])
        if MODEL_AXIS in getattr(leaf.sharding, "spec", ())
    ]
    assert sharded_leaves, "no generator leaf was channel-sharded"
    from efficient_tts_tpu.train.efts_train_step import shard_batch

    tp_state, tp_metrics = step(tp_state, shard_batch(dict(batch), mesh))

    for k in ("d_loss", "g_loss", "mel_l1"):
        np.testing.assert_allclose(
            float(dp_metrics[k]), float(tp_metrics[k]), rtol=2e-4, atol=2e-5,
        )
    # updated generator params agree (reduction order differs across
    # shardings -> loose float32 tolerance)
    for a, b in zip(
        jax.tree_util.tree_leaves(dp_state["gen"]["params"]),
        jax.tree_util.tree_leaves(tp_state["gen"]["params"]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(jax.device_get(b)), rtol=1e-2, atol=5e-4
        )


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


def test_ema_tracks_generator():
    """EMA state follows ema*d + params*(1-d) and feeds eval/serving."""
    from efficient_tts_tpu.train.hifigan_train_step import ema_generator_params

    decay = 0.9
    gen_tx = hifigan_adam(lr=2e-4)
    disc_tx = hifigan_adam(lr=2e-4)
    state = init_gan_state(
        jax.random.PRNGKey(0), VOC_CFG, gen_tx, disc_tx, ema_decay=decay
    )
    step = make_gan_train_step(VOC_CFG, gen_tx, disc_tx, ema_decay=decay)

    # at init the EMA equals the raw params
    e0 = jax.tree_util.tree_leaves(state["ema"])[0]
    p0 = jax.tree_util.tree_leaves(state["gen"]["params"])[0]
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(p0))

    batch = _batch()
    prev_ema = state["ema"]
    state, _ = step(state, batch)
    expect = jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1 - decay), prev_ema, state["gen"]["params"]
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(expect), jax.tree_util.tree_leaves(state["ema"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-10)
    # serving params resolve to the EMA copy when tracked
    assert ema_generator_params(state) is state["ema"]
    # after a step, EMA differs from the raw iterate
    e1 = jax.tree_util.tree_leaves(state["ema"])[0]
    p1 = jax.tree_util.tree_leaves(state["gen"]["params"])[0]
    assert not np.allclose(np.asarray(e1), np.asarray(p1))


def test_ema_checkpoint_roundtrip(tmp_path):
    from efficient_tts_tpu.train import checkpoint as ckpt

    gen_tx = hifigan_adam(lr=2e-4)
    disc_tx = hifigan_adam(lr=2e-4)
    state = init_gan_state(
        jax.random.PRNGKey(0), VOC_CFG, gen_tx, disc_tx, ema_decay=0.99
    )
    step = make_gan_train_step(VOC_CFG, gen_tx, disc_tx, ema_decay=0.99)
    state, _ = step(state, _batch())
    path = ckpt.save_checkpoint(str(tmp_path), state)
    restored = ckpt.load_checkpoint(path, jax.tree_util.tree_map(np.zeros_like, state))
    for a, b in zip(
        jax.tree_util.tree_leaves(state["ema"]),
        jax.tree_util.tree_leaves(restored["ema"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_resume_reconciliation(tmp_path):
    """Resuming across an --ema_decay change must not die on an orbax
    structure mismatch: EMA-in-checkpoint/no-tracking drops it with a
    warning; tracking/no-EMA-in-checkpoint seeds it from the restored
    generator."""
    from efficient_tts_tpu.train.hifigan_trainer import HiFiGANTrainer

    gen_tx = hifigan_adam(lr=2e-4)
    disc_tx = hifigan_adam(lr=2e-4)

    def trainer_for(state):
        return HiFiGANTrainer(
            train_step=None, state=state, train_iter=None,
            outdir=str(tmp_path / "out"),
        )

    from efficient_tts_tpu.train import checkpoint as ckpt

    # checkpoint WITH ema
    s_ema = init_gan_state(jax.random.PRNGKey(0), VOC_CFG, gen_tx, disc_tx,
                           ema_decay=0.9)
    step = make_gan_train_step(VOC_CFG, gen_tx, disc_tx, ema_decay=0.9)
    s_ema, _ = step(s_ema, _batch())
    p_ema = ckpt.save_checkpoint(str(tmp_path / "a"), s_ema)

    # resume it without tracking -> ema dropped, rest restored
    t = trainer_for(init_gan_state(jax.random.PRNGKey(1), VOC_CFG, gen_tx, disc_tx))
    t.load(p_ema)
    assert "ema" not in t.state
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(t.state["gen"]["params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(s_ema["gen"]["params"])[0]),
    )

    # checkpoint WITHOUT ema
    s_plain = init_gan_state(jax.random.PRNGKey(2), VOC_CFG, gen_tx, disc_tx)
    p_plain = ckpt.save_checkpoint(str(tmp_path / "b"), s_plain)

    # resume it with tracking -> ema seeded from restored generator
    t2 = trainer_for(
        init_gan_state(jax.random.PRNGKey(3), VOC_CFG, gen_tx, disc_tx,
                       ema_decay=0.9)
    )
    t2.load(p_plain)
    assert "ema" in t2.state
    for a, b in zip(
        jax.tree_util.tree_leaves(t2.state["ema"]),
        jax.tree_util.tree_leaves(t2.state["gen"]["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_discriminator_forward_matches_pairwise():
    """fused=True [2B]-concat forward is numerically identical (f32)."""
    from efficient_tts_tpu.models import hifigan as hg

    key = jax.random.PRNGKey(3)
    mpd = hg.init_mpd(key)
    msd = hg.init_msd(jax.random.PRNGKey(4))
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((2, 2048)), jnp.float32)
    y_hat = jnp.asarray(rng.standard_normal((2, 2048)), jnp.float32)

    def close(a, b):
        # XLA may pick different conv algorithms at batch 2B vs B; allow
        # reassociation-level noise relative to the tensor's scale
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5 * scale)

    for fwd, params in ((hg.mpd_forward, mpd), (hg.msd_forward, msd)):
        r0, g0, fr0, fg0 = fwd(params, y, y_hat)
        r1, g1, fr1, fg1 = fwd(params, y, y_hat, fused=True)
        for a, b in zip(r0 + g0, r1 + g1):
            close(a, b)
        for da, db in zip(fr0 + fg0, fr1 + fg1):
            for a, b in zip(da, db):
                close(a, b)


def test_fused_d_gradients_match_pairwise():
    """D-step gradients are unchanged by the fused real/fake concat."""
    from efficient_tts_tpu.losses.gan import discriminator_loss
    from efficient_tts_tpu.models import hifigan as hg

    mpd = hg.init_mpd(jax.random.PRNGKey(5))
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((2, 1024)), jnp.float32)
    y_hat = jnp.asarray(rng.standard_normal((2, 1024)), jnp.float32)

    def loss(params, fused):
        r, g, _, _ = hg.mpd_forward(params, y, y_hat, fused=fused)
        return discriminator_loss(r, g)[0]

    g_pair = jax.grad(lambda p: loss(p, False))(mpd)
    g_fused = jax.grad(lambda p: loss(p, True))(mpd)
    for a, b in zip(jax.tree_util.tree_leaves(g_pair), jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_gan_step_bf16_compute():
    """bf16 compute towers: finite metrics, close to the f32 step's losses."""
    gen_tx = hifigan_adam(lr=2e-4)
    disc_tx = hifigan_adam(lr=2e-4)
    batch = _batch()

    state32 = init_gan_state(jax.random.PRNGKey(0), VOC_CFG, gen_tx, disc_tx)
    step32 = make_gan_train_step(VOC_CFG, gen_tx, disc_tx)
    _, m32 = step32(state32, batch)

    state16 = init_gan_state(jax.random.PRNGKey(0), VOC_CFG, gen_tx, disc_tx)
    step16 = make_gan_train_step(VOC_CFG, gen_tx, disc_tx, compute_dtype=jnp.bfloat16)
    state16, m16 = step16(state16, batch)

    for k in ("d_loss", "g_loss", "mel_l1"):
        a, b = float(m32[k]), float(m16[k])
        assert np.isfinite(b), k
        assert abs(a - b) / max(abs(a), 1e-6) < 0.15, (k, a, b)
    # params stay f32
    for leaf in jax.tree_util.tree_leaves(state16["gen"]["params"]):
        assert leaf.dtype == jnp.float32
