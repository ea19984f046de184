"""Multi-resolution STFT loss.

Counterpart of `/root/reference/nntts/losses/stft_loss.py:12-156`
(ParallelWaveGAN lineage): per-resolution spectral-convergence +
log-magnitude L1, averaged over fft sizes [1024, 2048, 512] with hops
[120, 240, 50] and Hann windows [600, 1200, 240]. The reference never
wires it into a trainer; here it is available to the HiFi-GAN trainer as
an optional auxiliary loss.

The reference's `stft()` uses torch defaults center=True with reflect
padding; reproduced here with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

from efficient_tts_tpu.dsp.filters import hann_window


def _stft_magnitude(x: jnp.ndarray, fft_size: int, hop: int, win_length: int) -> jnp.ndarray:
    """[B, T] -> [B, frames, fft_size//2+1] magnitude, centered STFT.

    Matches torch.stft defaults (center=True, reflect pad fft_size//2),
    magnitude clamped at 1e-7 (`stft_loss.py:32`).
    """
    pad = fft_size // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n = x.shape[-1]
    f = 1 + (n - fft_size) // hop
    starts = jnp.arange(f) * hop
    idx = starts[:, None] + jnp.arange(fft_size)[None, :]
    frames = x[:, idx]  # [B, F, fft]
    win = jnp.asarray(hann_window(win_length))
    if win_length < fft_size:
        lpad = (fft_size - win_length) // 2
        win = jnp.pad(win, (lpad, fft_size - win_length - lpad))
    spec = jnp.fft.rfft(frames * win[None, None, :], n=fft_size, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.sqrt(jnp.clip(power, min=1e-7))


def stft_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    fft_size: int = 1024,
    hop: int = 120,
    win_length: int = 600,
):
    """Single-resolution (spectral_convergence, log_magnitude) pair."""
    x_mag = _stft_magnitude(x, fft_size, hop, win_length)
    y_mag = _stft_magnitude(y, fft_size, hop, win_length)
    sc = jnp.linalg.norm(y_mag - x_mag) / jnp.maximum(jnp.linalg.norm(y_mag), 1e-12)
    mag = jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))
    return sc, mag


DEFAULT_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def multi_resolution_stft_loss(
    x: jnp.ndarray, y: jnp.ndarray, resolutions=DEFAULT_RESOLUTIONS
):
    """Returns (sc_loss, mag_loss) averaged across resolutions
    (`stft_loss.py:109-156`)."""
    sc_total, mag_total = 0.0, 0.0
    for fft_size, hop, win in resolutions:
        sc, mag = stft_loss(x, y, fft_size, hop, win)
        sc_total += sc
        mag_total += mag
    n = len(resolutions)
    return sc_total / n, mag_total / n
