"""ctypes bindings for the native host DSP library (mel_native.cc).

Auto-builds `libeftsnative.so` with g++ on first use (cached); every
entry point has a pure-numpy fallback (`dsp/mel.py`), so the framework
works without a compiler. `available()` reports whether the fast path is
active.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libeftsnative.so")
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_DIR, "mel_native.cc")
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-ffast-math", "-fPIC", "-shared",
             "-std=c++17", "-o", _LIB_PATH, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        log.info("native build unavailable: %s", e)
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        os.path.join(_DIR, "mel_native.cc")
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        log.info("native load failed: %s", e)
        return None
    lib.efts_decode_wav.restype = ctypes.c_int64
    lib.efts_decode_wav.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.efts_mel_spectrogram.restype = ctypes.c_int64
    lib.efts_mel_spectrogram.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_wav(path: str):
    """Returns (float32 samples scaled to [-1, 1] for PCM16, sample_rate)
    or None if the native path is unavailable or the file unsupported."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        buf = f.read()
    max_out = len(buf) // 2 + 16
    out = np.empty(max_out, np.float32)
    sr = ctypes.c_int32(0)
    n = lib.efts_decode_wav(
        buf, len(buf),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_out,
        ctypes.byref(sr),
    )
    if n < 0:
        return None
    return out[:n].copy(), int(sr.value)


def mel_spectrogram(wav: np.ndarray, cfg=None) -> np.ndarray | None:
    """[T] float32 -> [n_mels, frames] log-mel, or None if unavailable.

    Matches `dsp/mel.py:mel_spectrogram_np` numerics (same window/basis)."""
    from efficient_tts_tpu.dsp.filters import hann_window, mel_filterbank
    from efficient_tts_tpu.dsp.mel import MelConfig, num_frames

    lib = _load()
    if lib is None:
        return None
    if cfg is None:
        cfg = MelConfig()
    wav = np.ascontiguousarray(wav, np.float32)
    win = hann_window(cfg.win_size)
    if cfg.win_size < cfg.n_fft:
        lpad = (cfg.n_fft - cfg.win_size) // 2
        win = np.pad(win, (lpad, cfg.n_fft - cfg.win_size - lpad))
    win = np.ascontiguousarray(win, np.float32)
    basis = np.ascontiguousarray(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax),
        np.float32,
    )
    frames = num_frames(len(wav), cfg)
    out = np.empty((cfg.num_mels, max(frames, 1)), np.float32)
    got = lib.efts_mel_spectrogram(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav),
        win.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        basis.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cfg.n_fft, cfg.hop_size, cfg.num_mels,
        np.float32(cfg.mag_eps), np.float32(cfg.clip_val),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if got < 0:
        return None
    return out[:, :got]
