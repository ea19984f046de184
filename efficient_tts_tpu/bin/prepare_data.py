"""Offline data preparation CLI.

Counterpart of the reference's recipe preprocessing
(`egs/lj/local/data.sh`, `prepare_features.py:43-78`,
`prepare_scps.py:23-30`): split a filelist into train/dev/test, and
optionally pre-extract mel features in parallel to a cache directory
(the online loader picks the cache up automatically via
`TextMelDataset(mel_cache_dir=...)`).

    python -m efficient_tts_tpu.bin.prepare_data \
        --filelist all.txt --outdir data/ --wav_path wavs/ \
        --dev 100 --test 500 [--extract_mels --mel_cache_dir mels/]
"""

from __future__ import annotations

import argparse
import logging
import os
from concurrent.futures import ProcessPoolExecutor


def get_parser():
    p = argparse.ArgumentParser(description="Prepare filelists and mel caches")
    p.add_argument("--filelist", required=True, help="full corpus filelist (path|text)")
    p.add_argument("--outdir", required=True)
    p.add_argument("--wav_path", default=None)
    p.add_argument("--dev", type=int, default=100)
    p.add_argument("--test", type=int, default=500)
    p.add_argument("--extract_mels", action="store_true")
    p.add_argument("--mel_cache_dir", default=None)
    p.add_argument("--num_workers", type=int, default=8)
    return p


def _extract_one(args):
    path, wav_path, cache_dir = args
    import numpy as np

    from efficient_tts_tpu import native
    from efficient_tts_tpu.data.dataset import load_wav_float
    from efficient_tts_tpu.dsp.mel import mel_spectrogram_np

    wav_file = (
        os.path.join(wav_path, os.path.basename(path)) if wav_path else path
    )
    base = os.path.splitext(os.path.basename(wav_file))[0]
    out = os.path.join(cache_dir, base + ".mel.npy")
    if os.path.exists(out):
        return base
    audio, _sr = load_wav_float(wav_file)
    mel = native.mel_spectrogram(audio)
    if mel is None:
        mel = mel_spectrogram_np(audio)
    np.save(out, mel.T.astype(np.float32))
    return base


def main(argv=None):
    args = get_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    os.makedirs(args.outdir, exist_ok=True)

    with open(args.filelist, encoding="utf-8") as f:
        lines = [line.rstrip("\n") for line in f if line.strip()]

    n = len(lines)
    n_test, n_dev = args.test, args.dev
    splits = {
        "test": lines[:n_test],
        "dev": lines[n_test : n_test + n_dev],
        "train": lines[n_test + n_dev :],
    }
    for name, chunk in splits.items():
        path = os.path.join(args.outdir, f"{name}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n".join(chunk) + ("\n" if chunk else ""))
        logging.info("%s: %d utterances -> %s", name, len(chunk), path)

    if args.extract_mels:
        cache = args.mel_cache_dir or os.path.join(args.outdir, "mels")
        os.makedirs(cache, exist_ok=True)
        jobs = [
            (line.split("|")[0], args.wav_path, cache) for line in lines
        ]
        with ProcessPoolExecutor(max_workers=args.num_workers) as ex:
            done = list(ex.map(_extract_one, jobs))
        logging.info("extracted %d mels -> %s", len(done), cache)
    logging.info("total %d utterances prepared", n)


if __name__ == "__main__":
    main()
