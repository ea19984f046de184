"""End-to-end synthesis pipeline tests (host bucket selection, masking)."""

import numpy as np
import jax

from efficient_tts_tpu.models import efficient_tts as efts
from efficient_tts_tpu.models import hifigan as hg
from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
from efficient_tts_tpu.models.hifigan import HiFiGANConfig
from efficient_tts_tpu.nn.layers import fold_weight_norm
from efficient_tts_tpu.pipeline import predict_lengths, synthesize, synthesize_fixed

EFTS_CFG = EftsCNNConfig(
    num_symbols=40,
    symbol_embedding_dim=32,
    n_channels=32,
    n_text_encoder_layer=1,
    n_mel_encoder_layer=1,
    n_decoder_layer=1,
    dropout_rate=0.0,
    use_masking=True,
)
VOC_CFG = HiFiGANConfig(
    upsample_rates=(8, 8, 2, 2),
    upsample_kernel_sizes=(16, 16, 4, 4),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),),
)


def _params():
    return (
        fold_weight_norm(efts.init(jax.random.PRNGKey(0), EFTS_CFG)),
        fold_weight_norm(hg.init_generator(jax.random.PRNGKey(1), VOC_CFG)),
    )


def test_synthesize_buckets_and_lengths():
    efts_params, voc_params = _params()
    rng = np.random.default_rng(0)
    text = np.zeros((2, 24), np.int32)
    t1s = np.array([24, 16], np.int32)
    for i, t1 in enumerate(t1s):
        text[i, :t1] = rng.integers(1, 40, size=t1)

    wav, wav_lengths = synthesize(
        efts_params, voc_params, text, t1s, EFTS_CFG, VOC_CFG, bucket_multiple=32
    )
    assert wav.shape[0] == 2
    assert wav.shape[1] % (32 * 256) == 0  # bucketed
    pred = np.asarray(predict_lengths(efts_params, text, t1s, EFTS_CFG))
    for i in range(2):
        expect = min(max(int(pred[i]), 1), wav.shape[1] // 256) * 256
        assert wav_lengths[i] == expect
        # tail beyond the utterance is silent
        assert np.abs(wav[i, wav_lengths[i]:]).max() == 0.0


def test_synthesize_fixed_bucket_invariance():
    """The same utterance decoded at two bucket sizes must agree on the
    overlapping (valid) region — the static bucket is purely padding."""
    efts_params, voc_params = _params()
    rng = np.random.default_rng(1)
    text = rng.integers(1, 40, size=(1, 16)).astype(np.int32)
    t1s = np.array([16], np.int32)
    wav_a, len_a, _ = synthesize_fixed(
        efts_params, voc_params, text, t1s, EFTS_CFG, VOC_CFG, 64
    )
    wav_b, len_b, _ = synthesize_fixed(
        efts_params, voc_params, text, t1s, EFTS_CFG, VOC_CFG, 96
    )
    n = int(min(np.asarray(len_a)[0], np.asarray(len_b)[0]))
    assert n > 0
    np.testing.assert_allclose(
        np.asarray(wav_a)[0, :n], np.asarray(wav_b)[0, :n], atol=1e-4
    )


def test_synthesize_data_parallel_mesh():
    """Data-parallel synthesis over the 8-device mesh equals single-device."""
    from efficient_tts_tpu.parallel.mesh import make_mesh

    efts_params, voc_params = _params()
    rng = np.random.default_rng(2)
    text = rng.integers(1, 40, size=(8, 16)).astype(np.int32)
    t1s = np.full((8,), 16, np.int32)
    mesh = make_mesh(model=1)
    wav_mesh, len_mesh = synthesize(
        efts_params, voc_params, text, t1s, EFTS_CFG, VOC_CFG, mesh=mesh
    )
    wav_one, len_one = synthesize(
        efts_params, voc_params, text, t1s, EFTS_CFG, VOC_CFG
    )
    np.testing.assert_array_equal(len_mesh, len_one)
    np.testing.assert_allclose(wav_mesh, wav_one, atol=1e-5)


def test_gan_state_checkpoint_roundtrip(tmp_path):
    from efficient_tts_tpu.train import checkpoint as ckpt
    from efficient_tts_tpu.train.hifigan_train_step import init_gan_state
    from efficient_tts_tpu.train.optim import hifigan_adam

    gen_tx = hifigan_adam()
    disc_tx = hifigan_adam()
    state = init_gan_state(jax.random.PRNGKey(0), VOC_CFG, gen_tx, disc_tx)
    path = ckpt.save_checkpoint(str(tmp_path), state, step=0)
    template = init_gan_state(jax.random.PRNGKey(9), VOC_CFG, gen_tx, disc_tx)
    restored = ckpt.load_checkpoint(path, template)
    a = jax.tree_util.tree_leaves(state["gen"]["params"])
    b = jax.tree_util.tree_leaves(restored["gen"]["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_duration_correction_flag():
    """Opt-in analytic truncation correction (VALIDATION.md 2a): lengthens
    every utterance by exactly sqrt(2/pi) * e_last/((T1-1) sqrt(2 sigma_e))
    frames at the last valid position; default off is bit-unchanged."""
    import jax.numpy as jnp

    from efficient_tts_tpu.models import efficient_tts as m
    from efficient_tts_tpu.ops.alignment import boundary_truncation_correction

    efts_params, voc_params = _params()
    rng = np.random.default_rng(1)
    text = np.zeros((2, 24), np.int32)
    t1s = np.array([24, 16], np.int32)
    for i, t1 in enumerate(t1s):
        text[i, :t1] = rng.integers(1, 40, size=t1)

    e, _, _ = m.infer_durations(efts_params, EFTS_CFG, jnp.asarray(text), jnp.asarray(t1s))
    e_np = np.asarray(e)
    e_corr = np.asarray(
        boundary_truncation_correction(e, jnp.asarray(t1s), EFTS_CFG.sigma_e)
    )
    for i, t1 in enumerate(t1s):
        last = e_np[i, t1 - 1]
        tau = last / ((t1 - 1) * np.sqrt(2.0 * EFTS_CFG.sigma_e))
        shift = tau * np.sqrt(2.0 / np.pi)
        # untouched before the last valid token, shifted from it onward
        np.testing.assert_allclose(e_corr[i, : t1 - 1], e_np[i, : t1 - 1])
        np.testing.assert_allclose(
            e_corr[i, t1 - 1 :], e_np[i, t1 - 1 :] + shift, rtol=1e-5
        )
        assert shift > 0

    pred_off = np.asarray(predict_lengths(efts_params, text, t1s, EFTS_CFG))
    pred_off2 = np.asarray(
        predict_lengths(efts_params, text, t1s, EFTS_CFG, duration_correction=False)
    )
    pred_on = np.asarray(
        predict_lengths(efts_params, text, t1s, EFTS_CFG, duration_correction=True)
    )
    np.testing.assert_array_equal(pred_off, pred_off2)  # default = off
    assert (pred_on >= pred_off).all() and (pred_on > pred_off).any()

    # full jitted path accepts the flag and produces longer audio
    wav_on, len_on = synthesize(
        efts_params, voc_params, text, t1s, EFTS_CFG, VOC_CFG,
        bucket_multiple=32, duration_correction=True,
    )
    wav_off, len_off = synthesize(
        efts_params, voc_params, text, t1s, EFTS_CFG, VOC_CFG, bucket_multiple=32
    )
    assert (len_on >= len_off).all()


def test_duration_correction_validity_gate():
    """The correction is gated on its own validity model (round-4): the
    analytic shift applies only where it exceeds rel_threshold of the
    predicted length. Relative bias is sqrt(2/pi)/((T1-1) sqrt(2 sigma_e)),
    so short rows shift and long rows are a no-op at the same threshold."""
    import jax.numpy as jnp

    from efficient_tts_tpu.ops.alignment import boundary_truncation_correction

    B, T1 = 2, 120
    t1s = np.array([12, 120], np.int32)  # rel bias ~7.3% vs ~0.7% (sigma_e=.5)
    e = np.tile(np.linspace(1.0, 600.0, T1, dtype=np.float32), (B, 1))
    out = np.asarray(boundary_truncation_correction(
        jnp.asarray(e), jnp.asarray(t1s), 0.5, rel_threshold=0.02
    ))
    # short row: shifted at/after its last valid token
    assert out[0, t1s[0] - 1] > e[0, t1s[0] - 1]
    # long row: below the gate -> bit-identical
    np.testing.assert_array_equal(out[1], e[1])
    # rel_threshold=0 = unconditional (round-3 behavior): both rows shift
    out0 = np.asarray(boundary_truncation_correction(
        jnp.asarray(e), jnp.asarray(t1s), 0.5, rel_threshold=0.0
    ))
    assert (out0[0, t1s[0] - 1] > e[0, t1s[0] - 1]
            and out0[1, t1s[1] - 1] > e[1, t1s[1] - 1])

    # pipeline threading: float threshold is accepted as the static flag
    efts_params, voc_params = _params()
    rng = np.random.default_rng(1)
    text = np.zeros((2, 24), np.int32)
    tls = np.array([24, 16], np.int32)
    for i, t1 in enumerate(tls):
        text[i, :t1] = rng.integers(1, 40, size=t1)
    # threshold 1.0 (100% of length) can never trigger -> equals off
    off = np.asarray(predict_lengths(efts_params, text, tls, EFTS_CFG))
    gated_out = np.asarray(predict_lengths(
        efts_params, text, tls, EFTS_CFG, duration_correction=1.0
    ))
    np.testing.assert_array_equal(off, gated_out)
    # True = gated at 2%: these short rows (~3.5%/5.3% bias) still shift
    on = np.asarray(predict_lengths(
        efts_params, text, tls, EFTS_CFG, duration_correction=True
    ))
    assert (on >= off).all() and (on > off).any()
