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


def collate_mel_audio(batch: list) -> dict:
    """Vocoder segments: [(mel [F, M], audio [S], mel_loss [F, M])] ->
    stacked dict (all segments share the fixed size)."""
    return {
        "mel": np.stack([x[0] for x in batch]).astype(np.float32),
        "audio": np.stack([x[1] for x in batch]).astype(np.float32),
        "mel_loss": np.stack([x[2] for x in batch]).astype(np.float32),
    }
