"""DSP parity tests.

The canonical mel definition is `meldataset.py:49-82` in the reference:
reflect pad (n_fft-hop)/2, torch.stft center=False with periodic Hann,
sqrt(power + 1e-9), Slaney mel basis, log(clamp(1e-5)). Here a torch
oracle is built from that documented spec and our jnp/numpy paths must
match it to float32 tolerance.
"""

import numpy as np
import pytest
import torch

from efficient_tts_tpu.dsp import (
    MelConfig,
    hann_window,
    mel_filterbank,
    mel_spectrogram,
    mel_spectrogram_np,
    num_frames,
)

CFG = MelConfig()


def _torch_mel_oracle(y: np.ndarray) -> np.ndarray:
    """Torch implementation of the documented reference DSP spec."""
    yt = torch.from_numpy(y.astype(np.float32))[None]
    pad = (CFG.n_fft - CFG.hop_size) // 2
    yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        yt,
        CFG.n_fft,
        hop_length=CFG.hop_size,
        win_length=CFG.win_size,
        window=torch.hann_window(CFG.win_size),
        center=False,
        onesided=True,
        return_complex=True,
    )
    mag = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-9)
    basis = torch.from_numpy(
        mel_filterbank(CFG.sample_rate, CFG.n_fft, CFG.num_mels, CFG.fmin, CFG.fmax)
    )
    mel = basis @ mag
    return torch.log(torch.clamp(mel, min=1e-5))[0].numpy()


@pytest.fixture(scope="module")
def wave():
    rng = np.random.default_rng(0)
    t = np.arange(22050) / 22050.0
    y = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.standard_normal(t.shape)
    return np.clip(y, -1.0, 1.0).astype(np.float32)


def test_hann_window_matches_torch():
    ours = hann_window(1024)
    theirs = torch.hann_window(1024).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_filterbank_shape_and_structure():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has support, and peak bins increase monotonically
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) > 0).all()
    assert fb.sum() > 0


def test_mel_np_matches_torch_oracle(wave):
    ours = mel_spectrogram_np(wave)
    oracle = _torch_mel_oracle(wave)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=2e-4, rtol=1e-4)


def test_mel_jax_matches_np(wave):
    jax_mel = np.asarray(mel_spectrogram(wave[None], CFG))[0]
    np_mel = mel_spectrogram_np(wave)
    assert jax_mel.shape == np_mel.shape
    np.testing.assert_allclose(jax_mel, np_mel, atol=5e-4, rtol=1e-4)


def test_num_frames_matches_actual(wave):
    mel = mel_spectrogram_np(wave)
    assert mel.shape[1] == num_frames(len(wave), CFG)
    for n in [8192, 10000, 22050, 100000]:
        y = np.zeros(n, dtype=np.float32)
        assert mel_spectrogram_np(y).shape[1] == num_frames(n, CFG)


def test_mel_batched(wave):
    batch = np.stack([wave, np.roll(wave, 1000)])
    out = np.asarray(mel_spectrogram(batch, CFG))
    assert out.shape[0] == 2
    single = np.asarray(mel_spectrogram(wave[None], CFG))[0]
    np.testing.assert_allclose(out[0], single, atol=1e-5)
