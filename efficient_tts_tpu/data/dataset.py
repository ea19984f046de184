"""Host-side datasets: filelists -> (text ids, mel) / vocoder segments.

Counterpart of `/root/reference/nntts/datasets/taco2_data.py` (TextMelLoader)
and `meldataset.py:96-178` (MelDataset). Runs entirely on host numpy --
the device only ever sees padded, bucketed batches.

Behavioral contracts preserved:
  * filelist lines are `wavpath|text`, shuffled once with seed 1234
    (`taco2_data.py:43-44`);
  * wavs are re-based onto `wav_path` by basename and scaled by
    1/32768 (`taco2_data.py:69-72`);
  * mel is computed on the fly with the canonical HiFi-GAN DSP
    (`mel_spectrogram_np`, matching `meldataset.py:49-82`);
  * phone mode maps whitespace phones through the vocab file
    (`taco2_data.py:80-84`); char mode uses `text_to_sequence`.
"""

from __future__ import annotations

import os
import random

import numpy as np

from efficient_tts_tpu.dsp.mel import MelConfig, mel_spectrogram_np
from efficient_tts_tpu.text import load_phone_vocab, phones_to_sequence, text_to_sequence


def load_filepaths_and_text(filename: str, split: str = "|") -> list:
    with open(filename, encoding="utf-8") as f:
        return [line.strip().split(split) for line in f if line.strip()]


def load_wav(path: str) -> tuple:
    """Read a PCM wav -> (float array raw, sample_rate) via scipy."""
    from scipy.io.wavfile import read

    sr, data = read(path)
    return data, sr


def load_wav_float(path: str) -> tuple:
    """Read a wav -> (float32 in [-1, 1], sample_rate), preferring the
    native C++ decoder (`native/mel_native.cc`) with a scipy fallback."""
    from efficient_tts_tpu import native

    decoded = native.decode_wav(path)
    if decoded is not None:
        return decoded
    data, sr = load_wav(path)
    if data.dtype == np.int16:
        return data.astype(np.float32) / 32768.0, sr
    return data.astype(np.float32), sr


class TextMelDataset:
    """LJ-style text+mel dataset with on-the-fly mel extraction."""

    # __getitem__ is a pure function of the index: the whole-corpus-batch
    # fast path in `loader.infinite_loader` may cache one collated epoch.
    deterministic_items = True

    def __init__(
        self,
        meta_file: str,
        text_cleaners=("english_cleaners",),
        max_wav_value: float = 32768.0,
        sampling_rate: int = 22050,
        wav_path: str | None = None,
        use_phnseq: bool = False,
        phnset_path: str | None = None,
        mel_config: MelConfig = MelConfig(),
        mel_cache_dir: str | None = None,
        mel_memory_cache_mb: float = 0.0,
        seed: int = 1234,
    ):
        self.items = load_filepaths_and_text(meta_file)
        self.text_cleaners = list(text_cleaners)
        self.max_wav_value = max_wav_value
        self.sampling_rate = sampling_rate
        self.wav_path = wav_path
        self.use_phnseq = use_phnseq
        self.mel_config = mel_config
        self.mel_cache_dir = mel_cache_dir
        if use_phnseq:
            if phnset_path is None:
                raise ValueError(
                    "phnset_path is required when use_phnseq=True"
                )
            self.phn2idx = load_phone_vocab(phnset_path)
        rnd = random.Random(seed)
        rnd.shuffle(self.items)
        if mel_cache_dir:
            os.makedirs(mel_cache_dir, exist_ok=True)
        # Optional bounded in-memory mel cache: on small-corpus /
        # overfit runs an epoch is a handful of batches, so the epoch
        # loop otherwise re-reads (or re-extracts) every mel each epoch
        # on the host's critical path. First-come-first-kept up to the
        # byte budget; 0 disables (the default — LJ-scale mels at full
        # residency would be ~GBs).
        self._mem_budget = int(mel_memory_cache_mb * (1 << 20))
        self._mem_cache: dict = {}
        self._mem_bytes = 0

    def __len__(self) -> int:
        return len(self.items)

    def get_text(self, text: str) -> np.ndarray:
        if self.use_phnseq:
            ids = phones_to_sequence(text, self.phn2idx)
        else:
            ids = text_to_sequence(text, self.text_cleaners)
        return np.asarray(ids, dtype=np.int32)

    def _resolve_wav(self, audiopath: str) -> str:
        if self.wav_path:
            return os.path.join(self.wav_path, os.path.basename(audiopath))
        return audiopath

    def get_mel(self, audiopath: str) -> np.ndarray:
        """[T2, num_mels] log-mel (channels-last for the device path)."""
        path = self._resolve_wav(audiopath)
        mem = self._mem_cache.get(path)
        if mem is not None:
            return mem
        cache = None
        if self.mel_cache_dir:
            base = os.path.splitext(os.path.basename(path))[0]
            cache = os.path.join(self.mel_cache_dir, base + ".mel.npy")
            if os.path.exists(cache):
                return self._mem_put(path, np.load(cache))
        from efficient_tts_tpu import native

        decoded = native.decode_wav(path)
        if decoded is not None:
            audio, sr = decoded
        else:
            raw, sr = load_wav(path)
            audio = raw.astype(np.float32) / self.max_wav_value
        if sr != self.sampling_rate:
            raise ValueError(f"{path}: {sr} Hz != target {self.sampling_rate} Hz")
        mel_native = native.mel_spectrogram(audio, self.mel_config)
        if mel_native is not None:
            mel = mel_native.T  # [T2, n_mels]
        else:
            mel = mel_spectrogram_np(audio, self.mel_config).T
        if cache:
            np.save(cache, mel)
        return self._mem_put(path, mel)

    def _mem_put(self, path: str, mel: np.ndarray) -> np.ndarray:
        if self._mem_bytes + mel.nbytes <= self._mem_budget:
            self._mem_cache[path] = mel
            self._mem_bytes += mel.nbytes
        return mel

    def approx_length(self, index: int) -> float:
        """Cheap mel-length proxy (wav byte size) for length-bucketed
        batching -- no audio decode needed."""
        try:
            return float(os.path.getsize(self._resolve_wav(self.items[index][0])))
        except OSError:
            return 0.0

    def __getitem__(self, index: int) -> tuple:
        audiopath, text = self.items[index][0], self.items[index][1]
        return self.get_text(text), self.get_mel(audiopath)


class MelAudioSegmentDataset:
    """HiFi-GAN vocoder dataset: random fixed-size waveform segments + mels.

    Counterpart of `meldataset.py:96-178` (the non-fine-tuning path):
    peak-normalize to 0.95, crop/pad `segment_size` samples, return
    (mel [F, n_mels], audio [segment_size], mel_loss [F, n_mels]).
    """

    def __init__(
        self,
        files: list,
        segment_size: int = 8192,
        sampling_rate: int = 22050,
        mel_config: MelConfig = MelConfig(),
        fmax_loss: float | None = None,
        max_wav_value: float = 32768.0,
        seed: int = 1234,
        split: bool = True,
        shuffle: bool = True,
        fine_tuning: bool = False,
        base_mels_path: str | None = None,
    ):
        self.files = list(files)
        if shuffle:
            random.Random(seed).shuffle(self.files)
        self.segment_size = segment_size
        self.sampling_rate = sampling_rate
        self.mel_config = mel_config
        from efficient_tts_tpu.dsp.mel import loss_mel_config

        self.loss_config = loss_mel_config(mel_config, fmax_loss)
        self.max_wav_value = max_wav_value
        self.split = split
        self.fine_tuning = fine_tuning
        self.base_mels_path = base_mels_path
        if fine_tuning and not base_mels_path:
            raise ValueError("fine_tuning requires base_mels_path (GTA mels)")
        self._rng = random.Random(seed)
        # Random segment crops make __getitem__ stochastic when split=True:
        # the whole-corpus-batch cache in `loader.infinite_loader` would
        # freeze every crop at its epoch-0 position for the entire run
        # (the reference re-crops every epoch, `meldataset.py:141-147`).
        self.deterministic_items = not split

    def __len__(self) -> int:
        return len(self.files)

    def _load_audio(self, index: int) -> np.ndarray:
        audio, sr = load_wav(self.files[index])
        if sr != self.sampling_rate:
            raise ValueError(f"{self.files[index]}: {sr} != {self.sampling_rate}")
        audio = audio.astype(np.float32) / self.max_wav_value
        if not self.fine_tuning:
            peak = np.abs(audio).max()
            if peak > 0:
                audio = audio / peak * 0.95
        return audio

    def __getitem__(self, index: int) -> tuple:
        audio = self._load_audio(index)
        hop = self.mel_config.hop_size
        if self.fine_tuning:
            # GTA fine-tuning (`meldataset.py:152-169`): generator input is
            # the model-predicted mel; the loss target stays ground truth.
            base = os.path.splitext(os.path.basename(self.files[index]))[0]
            mel = np.load(os.path.join(self.base_mels_path, base + ".npy"))
            mel = mel.T  # stored [n_mels, T2] -> [T2, n_mels]
            if self.split:
                frames_per_seg = -(-self.segment_size // hop)
                if (
                    len(audio) >= self.segment_size
                    and mel.shape[0] > frames_per_seg
                ):
                    start = self._rng.randint(0, mel.shape[0] - frames_per_seg - 1)
                    mel = mel[start : start + frames_per_seg]
                    audio = audio[start * hop : (start + frames_per_seg) * hop]
                else:
                    mel = np.pad(
                        mel, ((0, max(0, frames_per_seg - mel.shape[0])), (0, 0))
                    )[:frames_per_seg]
                    audio = np.pad(
                        audio, (0, max(0, self.segment_size - len(audio)))
                    )[: self.segment_size]
        else:
            if self.split:
                if len(audio) >= self.segment_size:
                    start = self._rng.randint(0, len(audio) - self.segment_size)
                    audio = audio[start : start + self.segment_size]
                else:
                    audio = np.pad(audio, (0, self.segment_size - len(audio)))
            mel = mel_spectrogram_np(audio, self.mel_config).T
        mel_loss = mel_spectrogram_np(audio, self.loss_config).T
        return mel, audio, mel_loss
