"""fastspeech_loss normalization-mode tests.

"frame" is the reference's masked global mean
(`/root/reference/nntts/losses/fastspeech_loss.py:55-63` —
masked_select + mean, so an utterance's weight is its frame count);
"utterance" gives every valid utterance equal weight (the VALIDATION
§3e short-utterance treatment).
"""

import numpy as np
import jax.numpy as jnp

from efficient_tts_tpu.losses.fastspeech import fastspeech_loss


def _ragged_batch(rng, lens_t2=(6, 2), lens_t1=(4, 2), n_mels=3):
    b, t2, t1 = len(lens_t2), max(lens_t2), max(lens_t1)
    mel_pred = rng.standard_normal((b, t2, n_mels)).astype(np.float32)
    mel_tgt = rng.standard_normal((b, t2, n_mels)).astype(np.float32)
    dur_pred = rng.standard_normal((b, t1)).astype(np.float32)
    dur_tgt = rng.standard_normal((b, t1)).astype(np.float32)
    mel_mask = np.zeros((b, t2), bool)
    text_mask = np.zeros((b, t1), bool)
    for i, (l2, l1) in enumerate(zip(lens_t2, lens_t1)):
        mel_mask[i, :l2] = True
        text_mask[i, :l1] = True
    return mel_pred, mel_tgt, dur_pred, dur_tgt, text_mask, mel_mask


def test_frame_mode_matches_masked_select_mean():
    rng = np.random.default_rng(0)
    mp, mt, dp, dt, tm, mm = _ragged_batch(rng)
    mel_loss, dur_loss = fastspeech_loss(
        jnp.asarray(mp), jnp.asarray(mt), jnp.asarray(dp), jnp.asarray(dt),
        jnp.asarray(tm), jnp.asarray(mm), loss_normalize="frame",
    )
    # oracle: numpy masked-select mean (the torch reference semantics)
    want_mel = np.mean(((mp - mt) ** 2)[mm])
    want_dur = np.mean(np.abs(dp - dt)[tm])
    np.testing.assert_allclose(float(mel_loss), want_mel, rtol=1e-6)
    np.testing.assert_allclose(float(dur_loss), want_dur, rtol=1e-6)


def test_utterance_mode_weights_utterances_equally():
    rng = np.random.default_rng(1)
    mp, mt, dp, dt, tm, mm = _ragged_batch(rng, lens_t2=(8, 2), lens_t1=(5, 2))
    mel_loss, dur_loss = fastspeech_loss(
        jnp.asarray(mp), jnp.asarray(mt), jnp.asarray(dp), jnp.asarray(dt),
        jnp.asarray(tm), jnp.asarray(mm), loss_normalize="utterance",
    )
    per_mel = [np.mean(((mp[i] - mt[i]) ** 2)[mm[i]]) for i in range(2)]
    per_dur = [np.mean(np.abs(dp[i] - dt[i])[tm[i]]) for i in range(2)]
    np.testing.assert_allclose(float(mel_loss), np.mean(per_mel), rtol=1e-6)
    np.testing.assert_allclose(float(dur_loss), np.mean(per_dur), rtol=1e-6)


def test_utterance_mode_ignores_ghost_rows():
    """All-padding rows (ragged grad-accumulation bucket fill) must not
    dilute the utterance mean."""
    rng = np.random.default_rng(2)
    mp, mt, dp, dt, tm, mm = _ragged_batch(rng, lens_t2=(6, 4), lens_t1=(4, 3))
    # make row 1 a ghost: zero-extent masks
    tm[1, :] = False
    mm[1, :] = False
    mel_loss, dur_loss = fastspeech_loss(
        jnp.asarray(mp), jnp.asarray(mt), jnp.asarray(dp), jnp.asarray(dt),
        jnp.asarray(tm), jnp.asarray(mm), loss_normalize="utterance",
    )
    want_mel = np.mean(((mp[0] - mt[0]) ** 2)[mm[0]])
    want_dur = np.mean(np.abs(dp[0] - dt[0])[tm[0]])
    np.testing.assert_allclose(float(mel_loss), want_mel, rtol=1e-6)
    np.testing.assert_allclose(float(dur_loss), want_dur, rtol=1e-6)


def test_modes_agree_on_uniform_lengths():
    """With equal lengths the two normalizations are identical."""
    rng = np.random.default_rng(3)
    mp, mt, dp, dt, tm, mm = _ragged_batch(rng, lens_t2=(5, 5), lens_t1=(3, 3))
    a = fastspeech_loss(
        jnp.asarray(mp), jnp.asarray(mt), jnp.asarray(dp), jnp.asarray(dt),
        jnp.asarray(tm), jnp.asarray(mm), loss_normalize="frame",
    )
    b = fastspeech_loss(
        jnp.asarray(mp), jnp.asarray(mt), jnp.asarray(dp), jnp.asarray(dt),
        jnp.asarray(tm), jnp.asarray(mm), loss_normalize="utterance",
    )
    np.testing.assert_allclose(float(a[0]), float(b[0]), rtol=1e-6)
    np.testing.assert_allclose(float(a[1]), float(b[1]), rtol=1e-6)


def test_config_knob_reaches_model_loss():
    """The YAML knob must actually change the training loss."""
    import jax

    from efficient_tts_tpu.models import efficient_tts as m

    cfg_f = m.EftsCNNConfig(
        num_symbols=10, n_channels=16, symbol_embedding_dim=16,
        n_text_encoder_layer=1, n_mel_encoder_layer=1, n_decoder_layer=1,
        dropout_rate=0.0, use_masking=True,
    )
    cfg_u = m.EftsCNNConfig(**{**cfg_f.__dict__, "loss_normalize": "utterance"})
    params = m.init(jax.random.PRNGKey(0), cfg_f)
    rng = np.random.default_rng(4)
    text = jnp.asarray(rng.integers(1, 10, (2, 6)), jnp.int32)
    text_lengths = jnp.asarray([6, 3], jnp.int32)
    speech = jnp.asarray(rng.standard_normal((2, 20, 80)), jnp.float32)
    speech_lengths = jnp.asarray([20, 8], jnp.int32)
    out_f = m.forward(params, cfg_f, text, text_lengths, speech, speech_lengths,
                      rng=jax.random.PRNGKey(1), deterministic=True)
    out_u = m.forward(params, cfg_u, text, text_lengths, speech, speech_lengths,
                      rng=jax.random.PRNGKey(1), deterministic=True)
    assert float(out_f["mel_loss"]) != float(out_u["mel_loss"])
