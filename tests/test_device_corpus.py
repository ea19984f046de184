"""Device-resident vocoder corpus tests (`data/device_corpus.py`).

Covers: load parity with the host dataset's normalization, on-device
crop + mel parity against the numpy DSP, crop bounds for short wavs,
the fused (state, corpus) GAN step, and the loss-filterbank regression
pin (the train/eval steps must share the dataset's `loss_mel_config`
filterbank — round-4's vocoder trained against a mismatched filterbank
with a measured 0.76 irreducible L1 bias).
"""

import numpy as np
import jax
import pytest
from scipy.io.wavfile import write as wav_write

from efficient_tts_tpu.data import device_corpus as dc
from efficient_tts_tpu.data.dataset import MelAudioSegmentDataset
from efficient_tts_tpu.dsp.mel import MelConfig, loss_mel_config, mel_spectrogram_np

SEG = 2048


@pytest.fixture(scope="module")
def wav_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc_corpus")
    rng = np.random.default_rng(7)
    paths = []
    for i, n in enumerate([SEG, 3 * SEG + 123, SEG // 2]):  # exact, long, short
        t = np.arange(n) / 22050.0
        a = 0.4 * np.sin(2 * np.pi * (150 + 60 * i) * t)
        a = a + 0.05 * rng.standard_normal(n)
        pcm = (np.clip(a, -1, 1) * 32767).astype(np.int16)
        p = root / f"w{i}.wav"
        wav_write(p, 22050, pcm)
        paths.append(str(p))
    return paths


def test_load_corpus_normalization_matches_host_dataset(wav_files):
    corpus = dc.load_corpus(wav_files, segment_size=SEG)
    assert corpus["wav"].shape[0] == 3
    assert corpus["wav"].shape[1] % 1024 == 0
    ds = MelAudioSegmentDataset(wav_files, segment_size=SEG, shuffle=False)
    for i in range(3):
        host = ds._load_audio(i)
        np.testing.assert_allclose(
            corpus["wav"][i, : len(host)], host, rtol=0, atol=1e-7
        )
        assert corpus["len"][i] == len(host)
        # padding beyond the wav is exactly zero (crop-tail semantics)
        assert np.all(corpus["wav"][i, len(host):] == 0)


def test_device_crops_in_bounds_and_mel_parity(wav_files):
    corpus = jax.device_put(dc.load_corpus(wav_files, segment_size=SEG))
    batch_fn = jax.jit(dc.make_device_batch_fn(8, segment_size=SEG))
    lens = np.asarray(corpus["len"])
    wavs = np.asarray(corpus["wav"])
    for step in (0, 1, 17):
        batch = jax.device_get(batch_fn(corpus, step))
        assert batch["audio"].shape == (8, SEG)
        for b in range(8):
            seg = batch["audio"][b]
            # locate the crop in the corpus (unique enough on noise)
            cand = [
                (i, s)
                for i in range(3)
                for s in range(0, wavs.shape[1] - SEG + 1)
                if abs(wavs[i, s] - seg[0]) < 1e-9
                and np.array_equal(wavs[i, s : s + SEG], seg)
            ]
            assert cand, "crop not found in corpus"
            i, s = cand[0]
            # crop start within [0, max(len-SEG, 0)]
            assert s <= max(int(lens[i]) - SEG, 0)
            # mel parity vs the numpy DSP of the same segment
            np.testing.assert_allclose(
                batch["mel"][b],
                mel_spectrogram_np(seg, MelConfig()).T,
                rtol=1e-4, atol=2e-4,
            )
            np.testing.assert_allclose(
                batch["mel_loss"][b],
                mel_spectrogram_np(seg, loss_mel_config(MelConfig(), None)).T,
                rtol=1e-4, atol=2e-4,
            )


def test_short_wav_crops_are_zero_padded(wav_files):
    """A wav shorter than one segment always yields (wav + zero tail),
    matching the reference's np.pad path (meldataset.py:141-147)."""
    short = [wav_files[2]]
    corpus = jax.device_put(dc.load_corpus(short, segment_size=SEG))
    batch_fn = jax.jit(dc.make_device_batch_fn(4, segment_size=SEG))
    batch = jax.device_get(batch_fn(corpus, 3))
    wav = np.asarray(corpus["wav"])[0]
    n = int(np.asarray(corpus["len"])[0])
    for b in range(4):
        np.testing.assert_array_equal(batch["audio"][b][:n], wav[:n])
        assert np.all(batch["audio"][b][n:] == 0)


def test_crop_stream_is_step_deterministic(wav_files):
    """Resume safety: the crop stream is a pure function of the step
    counter, so a restarted run continues identically."""
    corpus = jax.device_put(dc.load_corpus(wav_files, segment_size=SEG))
    batch_fn = jax.jit(dc.make_device_batch_fn(4, segment_size=SEG))
    a = jax.device_get(batch_fn(corpus, 5))
    b = jax.device_get(batch_fn(corpus, 5))
    c = jax.device_get(batch_fn(corpus, 6))
    np.testing.assert_array_equal(a["audio"], b["audio"])
    assert not np.array_equal(a["audio"], c["audio"])


def test_fused_device_gan_step_runs():
    from efficient_tts_tpu.train.hifigan_train_step import (
        init_gan_state,
        make_gan_train_step,
    )
    from efficient_tts_tpu.train.optim import hifigan_adam
    from tests.test_hifigan_training import VOC_CFG

    rng = np.random.default_rng(0)
    corpus = jax.device_put({
        "wav": rng.standard_normal((2, 4096)).astype(np.float32) * 0.1,
        "len": np.asarray([4096, 3000], np.int32),
    })
    gen_tx = hifigan_adam(lr=2e-4)
    disc_tx = hifigan_adam(lr=2e-4)
    state = init_gan_state(jax.random.PRNGKey(0), VOC_CFG, gen_tx, disc_tx)
    inner = make_gan_train_step(VOC_CFG, gen_tx, disc_tx)
    batch_fn = dc.make_device_batch_fn(2, segment_size=VOC_CFG.segment_size)
    step = dc.make_device_gan_train_step(inner, batch_fn)
    state, metrics = step(state, corpus)
    state, metrics = step(state, corpus)
    assert int(state["step"]) == 2
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_loss_filterbank_shared_with_dataset(wav_files):
    """Regression pin for the round-4 filterbank-mismatch bug: the
    train/eval steps' generated-audio mel must use the exact config the
    dataset computes `mel_loss` with (official fmax_for_loss
    semantics)."""
    from efficient_tts_tpu.train.hifigan_train_step import (
        make_gan_eval_step,
        make_gan_train_step,
    )
    from efficient_tts_tpu.train.optim import hifigan_adam
    from tests.test_hifigan_training import VOC_CFG

    ds = MelAudioSegmentDataset(wav_files, segment_size=SEG, shuffle=False)
    tx = hifigan_adam(lr=2e-4)
    step = make_gan_train_step(VOC_CFG, tx, tx)
    ev = make_gan_eval_step(VOC_CFG)
    assert step.loss_mel_cfg == ds.loss_config
    assert ev.loss_mel_cfg == ds.loss_config
    # and the shared config is full-band (fmax None), not the banded
    # inference config
    assert step.loss_mel_cfg.fmax is None
    # the device batcher shares it too
    bf = dc.make_device_batch_fn(2, segment_size=SEG)
    # (make_device_batch_fn internally uses loss_mel_config; verified by
    # the mel parity test above — here we just pin the helper itself)
    assert loss_mel_config(MelConfig(), None).fmax is None
    assert loss_mel_config(MelConfig(), 8000.0) == MelConfig()
