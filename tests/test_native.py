"""Native C++ DSP library tests (skipped when g++ unavailable)."""

import numpy as np
import pytest
from scipy.io.wavfile import write as wav_write

from efficient_tts_tpu import native
from efficient_tts_tpu.dsp.mel import MelConfig, mel_spectrogram_np

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.fixture(scope="module")
def wav(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    t = np.arange(30000) / 22050.0
    y = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    path = root / "test.wav"
    wav_write(str(path), 22050, (y * 32767).astype(np.int16))
    return str(path), y


def test_decode_wav(wav):
    path, y = wav
    out, sr = native.decode_wav(path)
    assert sr == 22050
    assert len(out) == len(y)
    # PCM16 quantization + 32767-vs-32768 scale convention
    np.testing.assert_allclose(out, y, atol=1e-4)


def test_native_mel_matches_numpy(wav):
    _, y = wav
    ref = mel_spectrogram_np(y, MelConfig())
    got = native.mel_spectrogram(y)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=1e-3)


def test_native_mel_speed(wav):
    """Native path should not be slower than numpy (typically much faster)."""
    import time

    _, y = wav
    native.mel_spectrogram(y)  # warm (build/plan)
    t0 = time.perf_counter()
    for _ in range(5):
        native.mel_spectrogram(y)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        mel_spectrogram_np(y)
    t_np = time.perf_counter() - t0
    assert t_native < t_np * 2.0
