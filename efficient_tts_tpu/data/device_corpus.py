"""Device-resident vocoder corpus: upload the wav corpus to HBM once,
then do random segment cropping + mel extraction ON DEVICE inside the
jitted GAN step.

Why this exists (round-4 postmortem): the host segment pipeline
(`MelAudioSegmentDataset` + `collate_mel_audio`, mirroring the
reference's `meldataset.py:96-178`) uploads a fresh ~0.9 MB batch every
step because random crops defeat the whole-corpus identity cache in
`loader.infinite_loader`. Some remote-device transports (the axon
relay used in this environment) leak host memory proportional to bytes
transferred (~2x), which grew the trainer to ~51 GB RSS by ~27k steps
and wedged it (GC thrash, frozen step log) — the round-4 long run
survived only behind a kill-and-restart watchdog. Moving batch
assembly into the XLA program makes the steady-state loop do ZERO
host->device data motion: the corpus is placed once, the per-step
randomness comes from a counter-derived PRNG key, and the crops + both
mel spectrograms (generator input and loss target) are computed on
device next to the MXU that consumes them.

Sampling semantics vs the host path (reference `meldataset.py:141-147`):
  * crop start ~ Uniform[0, len - segment] per wav, identical to the
    reference; wavs shorter than one segment are zero-padded at the
    tail (the corpus tensor is zero beyond each wav's length, so a
    clamped crop picks up the same zeros `np.pad` would).
  * wav selection is i.i.d. uniform per batch slot, not an epoch
    permutation without replacement. For GAN segment training these
    distributions match to first order (every wav equally likely every
    step); the i.i.d. form is what a counter-indexed PRNG can express
    without carrying host epoch state.
  * peak normalization to 0.95 happens on host at load time, exactly as
    `MelAudioSegmentDataset._load_audio` (reference `meldataset.py:124`).

The GTA fine-tuning path (precomputed ragged mels from files) stays on
the host pipeline — its inputs are per-wav ragged [T2, 80] arrays that
do not pack into one rectangular device tensor economically.
"""

from __future__ import annotations

import logging

import numpy as np

from efficient_tts_tpu.dsp.mel import MelConfig, loss_mel_config

log = logging.getLogger(__name__)


def load_corpus(
    files: list,
    sampling_rate: int = 22050,
    max_wav_value: float = 32768.0,
    segment_size: int = 8192,
) -> dict:
    """Read + normalize every wav; return {"wav": [N, L] f32, "len": [N] i32}.

    L is max(len, segment_size) rounded up to a multiple of 1024 so
    minor corpus edits don't force a recompile of the train step.
    """
    from efficient_tts_tpu.data.dataset import load_wav

    wavs = []
    for path in files:
        audio, sr = load_wav(path)
        if sr != sampling_rate:
            raise ValueError(f"{path}: {sr} != {sampling_rate}")
        audio = audio.astype(np.float32) / max_wav_value
        peak = np.abs(audio).max()
        if peak > 0:
            audio = audio / peak * 0.95
        wavs.append(audio)
    longest = max(max(len(w) for w in wavs), segment_size)
    width = -(-longest // 1024) * 1024
    out = np.zeros((len(wavs), width), np.float32)
    for i, w in enumerate(wavs):
        out[i, : len(w)] = w
    return {"wav": out, "len": np.asarray([len(w) for w in wavs], np.int32)}


def corpus_nbytes(files: list) -> int:
    """Padded device-tensor size estimate without decoding audio."""
    import os

    sizes = [os.path.getsize(f) for f in files]
    longest = max(sizes) // 2  # int16 samples
    return len(files) * longest * 4


def make_device_batch_fn(
    batch_size: int,
    segment_size: int = 8192,
    mel_cfg: MelConfig = MelConfig(),
    fmax_loss: float | None = None,
    seed: int = 1234,
):
    """Returns batch_fn(corpus, step) -> {"mel", "audio", "mel_loss"}.

    Pure/jittable: randomness is derived from `fold_in(seed_key, step)`,
    so a resumed run continues the exact crop stream (no host RNG state
    to checkpoint).
    """
    import jax
    import jax.numpy as jnp

    from efficient_tts_tpu.dsp.mel import mel_spectrogram

    loss_cfg = loss_mel_config(mel_cfg, fmax_loss)

    def batch_fn(corpus, step):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
        k_idx, k_off = jax.random.split(key)
        n = corpus["wav"].shape[0]
        idx = jax.random.randint(k_idx, (batch_size,), 0, n)
        max_start = jnp.maximum(corpus["len"][idx] - segment_size, 0)
        u = jax.random.uniform(k_off, (batch_size,))
        start = jnp.minimum(
            jnp.floor(u * (max_start + 1).astype(jnp.float32)).astype(jnp.int32),
            max_start,
        )
        seg = jax.vmap(
            lambda w, s: jax.lax.dynamic_slice(w, (s,), (segment_size,))
        )(corpus["wav"][idx], start)
        mel = jnp.swapaxes(mel_spectrogram(seg, mel_cfg), 1, 2)
        if loss_cfg == mel_cfg:
            mel_loss = mel
        else:
            mel_loss = jnp.swapaxes(mel_spectrogram(seg, loss_cfg), 1, 2)
        return {"mel": mel, "audio": seg, "mel_loss": mel_loss}

    return batch_fn


def make_device_gan_train_step(train_step, batch_fn):
    """Fuse on-device batch assembly with the GAN step: one XLA program,
    signature (state, corpus) -> (state, metrics). `corpus` is the
    device-resident dict from `load_corpus` (placed once by the caller);
    the crop stream is indexed by state["step"]."""
    import jax

    @jax.jit
    def device_step(state, corpus):
        batch = batch_fn(corpus, state["step"])
        return train_step(state, batch)

    return device_step
