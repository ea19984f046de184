"""Batch collation with static-shape bucketing.

Counterpart of `TextMelCollate` (`taco2_data.py:95-139`): sort by text
length descending, zero-pad text and mel. TPU refinement: padded lengths
are rounded up to bucket multiples so the jitted train step compiles for
a small, fixed set of shapes instead of one shape per batch (the
reference pads to the batch max, which under XLA would recompile
constantly -- SURVEY.md §5 long-context entry).
"""

from __future__ import annotations

import numpy as np

from efficient_tts_tpu.utils.masks import round_up


def collate_text_mel(
    batch: list,
    text_bucket: int = 16,
    mel_bucket: int = 64,
    fixed_text_len: int | None = None,
    fixed_mel_len: int | None = None,
    sort: bool = True,
) -> dict:
    """[(text ids [T1], mel [T2, n_mels])] -> padded dict batch.

    With `fixed_*_len` the batch pads to exactly those lengths (single
    compiled shape); otherwise lengths round up to the bucket multiple.
    `sort=False` preserves input order (needed when rows map back to
    utterance ids, e.g. GTA extraction).
    """
    if sort:
        order = np.argsort([-len(x[0]) for x in batch], kind="stable")
        batch = [batch[i] for i in order]

    text_lengths = np.asarray([len(x[0]) for x in batch], np.int32)
    mel_lengths = np.asarray([x[1].shape[0] for x in batch], np.int32)
    n_mels = batch[0][1].shape[1]

    t1 = fixed_text_len or round_up(int(text_lengths.max()), text_bucket)
    t2 = fixed_mel_len or round_up(int(mel_lengths.max()), mel_bucket)
    if int(text_lengths.max()) > t1 or int(mel_lengths.max()) > t2:
        raise ValueError("fixed length smaller than batch max")

    b = len(batch)
    text = np.zeros((b, t1), np.int32)
    mel = np.zeros((b, t2, n_mels), np.float32)
    for i, (t, m) in enumerate(batch):
        text[i, : len(t)] = t
        mel[i, : m.shape[0]] = m
    return {
        "text": text,
        "text_lengths": text_lengths,
        "mel": mel,
        "mel_lengths": mel_lengths,
    }


def collate_text_mel_durations(
    batch: list,
    text_bucket: int = 16,
    mel_bucket: int = 64,
    n_frames_per_step: int = 1,
) -> dict:
    """External-duration batches: [(text [T1], durations [T1], mel [T2, M],
    spkid)] -> padded dict. `TTSCollate` analog (`collate_fn.py:7-59`):
    durations are zero-padded to T1 and the last real duration of a row is
    bumped so sum(durations) equals that row's recorded mel length
    (`collate_fn.py:54-55`), keeping duration-expanded decoders aligned
    with the padded mel. Bucketed padding for static XLA shapes."""
    text_lengths = np.asarray([len(x[0]) for x in batch], np.int32)
    mel_lengths = np.asarray([x[2].shape[0] for x in batch], np.int32)
    n_mels = batch[0][2].shape[1]

    t1 = round_up(int(text_lengths.max()), text_bucket)
    t2_real = int(mel_lengths.max())
    if t2_real % n_frames_per_step:
        t2_real += n_frames_per_step - t2_real % n_frames_per_step
        mel_lengths[int(np.argmax(mel_lengths))] = t2_real
    t2 = round_up(t2_real, mel_bucket)

    b = len(batch)
    text = np.zeros((b, t1), np.int32)
    durations = np.zeros((b, t1), np.int32)
    mel = np.zeros((b, t2, n_mels), np.float32)
    spkids = np.zeros((b,), np.int32)
    for i, (t, dur, m, spk) in enumerate(batch):
        text[i, : len(t)] = t
        d = np.asarray(dur, np.int64).copy()
        short = int(mel_lengths[i]) - int(d.sum())
        if short > 0:
            d[-1] += short
        durations[i, : len(d)] = d
        mel[i, : m.shape[0]] = m
        spkids[i] = int(spk)
    return {
        "text": text,
        "text_lengths": text_lengths,
        "durations": durations,
        "mel": mel,
        "mel_lengths": mel_lengths,
        "spkids": spkids,
    }


def collate_duration_model(batch: list, bucket: int = 16) -> dict:
    """DurationModel batches: [(ppg [T, D], durations [T], spkid)] ->
    padded dict (`CommonDurationModelCollate`, `collate_fn.py:62-98`)."""
    lengths = np.asarray([x[0].shape[0] for x in batch], np.int32)
    t = round_up(int(lengths.max()), bucket)
    b = len(batch)
    dim = batch[0][0].shape[1]
    ppg = np.zeros((b, t, dim), np.float32)
    durations = np.zeros((b, t), np.int32)
    spkids = np.zeros((b,), np.int32)
    for i, (p, dur, spk) in enumerate(batch):
        n = p.shape[0]
        ppg[i, :n] = p
        durations[i, :n] = np.asarray(dur)[:n]
        spkids[i] = int(spk)
    return {"ppg": ppg, "lengths": lengths, "durations": durations,
            "spkids": spkids}


def collate_mel_audio(batch: list) -> dict:
    """Vocoder segments: [(mel [F, M], audio [S], mel_loss [F, M])] ->
    stacked dict (all segments share the fixed size)."""
    return {
        "mel": np.stack([x[0] for x in batch]).astype(np.float32),
        "audio": np.stack([x[1] for x in batch]).astype(np.float32),
        "mel_loss": np.stack([x[2] for x in batch]).astype(np.float32),
    }
