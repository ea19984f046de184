"""Data pipeline tests: dataset, collate bucketing, loader sharding."""

import os

import numpy as np
import pytest
from scipy.io.wavfile import write as wav_write

from efficient_tts_tpu.data.collate import collate_mel_audio, collate_text_mel
from efficient_tts_tpu.data.dataset import MelAudioSegmentDataset, TextMelDataset
from efficient_tts_tpu.data.loader import data_loader, infinite_loader
from efficient_tts_tpu.dsp.mel import MelConfig, num_frames

PHONES = ["!", "HH", "AH0", "L", "OW1", "W", "ER1", "D", "sp"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    wavdir = root / "wavs"
    wavdir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(6):
        n = 22050 + i * 3000
        t = np.arange(n) / 22050.0
        y = (0.3 * np.sin(2 * np.pi * (200 + 20 * i) * t)).astype(np.float32)
        pcm = (y * 32767).astype(np.int16)
        path = wavdir / f"utt{i}.wav"
        wav_write(str(path), 22050, pcm)
        phones = " ".join(rng.choice(PHONES[1:], size=5 + i))
        lines.append(f"DUMMY/utt{i}.wav|{phones}")
    filelist = root / "train.txt"
    filelist.write_text("\n".join(lines) + "\n")
    phnset = root / "phnset.txt"
    phnset.write_text("\n".join(PHONES) + "\n")
    return {
        "root": root,
        "filelist": str(filelist),
        "phnset": str(phnset),
        "wavdir": str(wavdir),
    }


def test_dataset_phone_mode(corpus):
    ds = TextMelDataset(
        corpus["filelist"],
        wav_path=corpus["wavdir"],
        use_phnseq=True,
        phnset_path=corpus["phnset"],
    )
    assert len(ds) == 6
    text, mel = ds[0]
    assert text.dtype == np.int32 and text.ndim == 1
    assert mel.ndim == 2 and mel.shape[1] == 80
    # mel length consistent with the DSP frame count of some source wav
    lengths = {num_frames(22050 + i * 3000, MelConfig()) for i in range(6)}
    assert mel.shape[0] in lengths


def test_dataset_mel_cache(corpus, tmp_path):
    cache = str(tmp_path / "melcache")
    ds = TextMelDataset(
        corpus["filelist"],
        wav_path=corpus["wavdir"],
        use_phnseq=True,
        phnset_path=corpus["phnset"],
        mel_cache_dir=cache,
    )
    _, mel1 = ds[0]
    assert len(os.listdir(cache)) >= 1
    _, mel2 = ds[0]
    np.testing.assert_array_equal(mel1, mel2)


def test_dataset_mel_memory_cache(corpus):
    ds = TextMelDataset(
        corpus["filelist"],
        wav_path=corpus["wavdir"],
        use_phnseq=True,
        phnset_path=corpus["phnset"],
        mel_memory_cache_mb=64.0,
    )
    _, mel1 = ds[0]
    assert len(ds._mem_cache) == 1 and ds._mem_bytes == mel1.nbytes
    _, mel2 = ds[0]
    assert mel2 is mel1  # served from memory, no re-extraction
    # budget respected: a tiny budget keeps nothing
    tiny = TextMelDataset(
        corpus["filelist"],
        wav_path=corpus["wavdir"],
        use_phnseq=True,
        phnset_path=corpus["phnset"],
        mel_memory_cache_mb=1e-6,
    )
    tiny[0]
    assert not tiny._mem_cache
    # default is off
    off = TextMelDataset(
        corpus["filelist"],
        wav_path=corpus["wavdir"],
        use_phnseq=True,
        phnset_path=corpus["phnset"],
    )
    off[0]
    assert not off._mem_cache


def test_collate_bucketing(corpus):
    ds = TextMelDataset(
        corpus["filelist"],
        wav_path=corpus["wavdir"],
        use_phnseq=True,
        phnset_path=corpus["phnset"],
    )
    batch = collate_text_mel([ds[i] for i in range(4)], text_bucket=16, mel_bucket=64)
    assert batch["text"].shape[1] % 16 == 0
    assert batch["mel"].shape[1] % 64 == 0
    assert batch["mel"].shape[2] == 80
    # sorted by text length descending (reference contract)
    assert (np.diff(batch["text_lengths"]) <= 0).all()
    # padded region is zero
    for i in range(4):
        assert (batch["text"][i, batch["text_lengths"][i] :] == 0).all()


def test_loader_sharding(corpus):
    ds = TextMelDataset(
        corpus["filelist"],
        wav_path=corpus["wavdir"],
        use_phnseq=True,
        phnset_path=corpus["phnset"],
    )
    collate = lambda b: collate_text_mel(b)
    all_batches = list(data_loader(ds, 2, collate, shuffle=True, seed=1))
    assert len(all_batches) == 3
    shard0 = list(data_loader(ds, 1, collate, shuffle=True, seed=1, shard_id=0, num_shards=2))
    shard1 = list(data_loader(ds, 1, collate, shuffle=True, seed=1, shard_id=1, num_shards=2))
    assert len(shard0) == len(shard1) == 3

    it = infinite_loader(ds, 2, collate, seed=1)
    epochs = [next(it)[0] for _ in range(7)]
    assert epochs[0] == 0 and epochs[-1] >= 2


def test_length_bucketed_batching(corpus):
    ds = TextMelDataset(
        corpus["filelist"],
        wav_path=corpus["wavdir"],
        use_phnseq=True,
        phnset_path=corpus["phnset"],
    )
    collate = lambda b: collate_text_mel(b)
    batches = list(
        data_loader(ds, 2, collate, shuffle=True, seed=3, length_fn=ds.approx_length)
    )
    assert len(batches) == 3
    # within-batch mel length spread should be smaller than the corpus spread
    all_lens = [ds.approx_length(i) for i in range(len(ds))]
    corpus_spread = max(all_lens) - min(all_lens)
    for b in batches:
        spread = int(b["mel_lengths"].max()) - int(b["mel_lengths"].min())
        # wav sizes step by 3000 samples -> neighbors differ by ~12 frames
        assert spread * 256 <= corpus_spread  # grouped neighbors
    # epoch coverage preserved
    seen = sum(b["text"].shape[0] for b in batches)
    assert seen == 6


def test_vocoder_segment_dataset(corpus):
    files = [os.path.join(corpus["wavdir"], f"utt{i}.wav") for i in range(6)]
    ds = MelAudioSegmentDataset(files, segment_size=8192)
    mel, audio, mel_loss = ds[0]
    assert audio.shape == (8192,)
    assert mel.shape == (num_frames(8192), 80)
    assert mel_loss.shape == mel.shape
    batch = collate_mel_audio([ds[i] for i in range(3)])
    assert batch["audio"].shape == (3, 8192)
    assert batch["mel"].shape[0] == 3


def test_infinite_loader_whole_corpus_batch_is_cached(corpus):
    """One-batch epochs (batch_size == corpus size) must yield the SAME
    collated object every epoch: downstream placement caches by identity
    so the batch is uploaded to the device once per run, not per step."""
    ds = TextMelDataset(
        corpus["filelist"],
        wav_path=corpus["wavdir"],
        use_phnseq=True,
        phnset_path=corpus["phnset"],
    )
    collate = lambda items: collate_text_mel(items, text_bucket=8, mel_bucket=32)
    it = infinite_loader(ds, len(ds), collate, length_fn=ds.approx_length)
    e0, b0 = next(it)
    e1, b1 = next(it)
    assert b1 is b0 and (e0, e1) == (0, 1)
    assert b0["text"].shape[0] == len(ds)
    # smaller batches must NOT be cached (epochs reshuffle compositions)
    it2 = infinite_loader(ds, 2, collate, length_fn=ds.approx_length)
    _, c0 = next(it2)
    _, c1 = next(it2)
    assert c1 is not c0


def test_infinite_loader_never_caches_stochastic_datasets(corpus):
    """Vocoder segment datasets draw a fresh random crop per access
    (`meldataset.py:141-147`); the whole-corpus-batch cache must not
    freeze epoch-0's crops for the whole run (ADVICE r2 high)."""
    files = [os.path.join(corpus["wavdir"], f"utt{i}.wav") for i in range(6)]
    ds = MelAudioSegmentDataset(files, segment_size=8192)
    assert ds.deterministic_items is False
    it = infinite_loader(ds, len(ds), collate_mel_audio)
    _, b0 = next(it)
    _, b1 = next(it)
    assert b1 is not b0
    assert not np.array_equal(b0["audio"], b1["audio"])  # re-cropped
    # split=False (whole utterances, e.g. eval) is deterministic again
    ds_eval = MelAudioSegmentDataset(files, segment_size=8192, split=False)
    assert ds_eval.deterministic_items is True


def test_background_prefetch_identity_and_errors(corpus):
    """The cross-epoch prefetcher preserves object identity of repeated
    whole-corpus batches (the placement cache keys on it) and propagates
    iterator exceptions to the consumer."""
    from efficient_tts_tpu.data.loader import background_prefetch

    ds = TextMelDataset(
        corpus["filelist"],
        wav_path=corpus["wavdir"],
        use_phnseq=True,
        phnset_path=corpus["phnset"],
    )
    collate = lambda items: collate_text_mel(items, text_bucket=8, mel_bucket=32)
    it = background_prefetch(infinite_loader(ds, len(ds), collate))
    _, b0 = next(it)
    _, b1 = next(it)
    assert b1 is b0  # identity preserved through the queue

    def boom():
        yield 1
        raise RuntimeError("collate failed")

    it2 = background_prefetch(boom())
    assert next(it2) == 1
    with pytest.raises(RuntimeError, match="collate failed"):
        next(it2)

    # finite iterators terminate cleanly
    assert list(background_prefetch(iter([1, 2, 3]))) == [1, 2, 3]
