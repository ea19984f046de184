"""Golden-file comparison harness vs the reference's committed sample wavs.

The reference's de-facto capability proof is its committed synthesized
audio (`/root/reference/egs/lj/checkpoint-320000steps/*.wav`,
`README.md:7-9`). This harness compares a directory of wavs synthesized
by OUR pipeline (e.g. the output of `python -m efficient_tts_tpu.bin.inference`)
against those golden wavs, utterance-by-utterance, with objective
metrics:

  * MCD (mel-cepstral distortion, dB): DCT cepstra (c1..c13) of the
    canonical log-mel, DTW-aligned — the standard TTS objective metric;
  * mel-SD: mean per-frame L2 distance of DTW-aligned log-mels;
  * duration error: |T_hyp - T_ref| / T_ref in mel frames.

Matching is by utterance id prefix (`LJxxx-yyyy*`). Prints a table and
one JSON summary line.

Usage:
  python scripts/golden_compare.py --hyp_dir exp/micro/synth \\
      [--ref_dir /root/reference/egs/lj/checkpoint-320000steps] \\
      [--json_out exp/micro/golden.json]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np

from efficient_tts_tpu.data.dataset import load_wav_float
from efficient_tts_tpu.dsp.mel import MelConfig, mel_spectrogram_np


def logmel(path: str) -> np.ndarray:
    audio, sr = load_wav_float(path)
    assert sr == 22050, (path, sr)
    return np.asarray(mel_spectrogram_np(audio, MelConfig())).T  # [T, 80]


def dct_cepstra(mel: np.ndarray, n: int = 13) -> np.ndarray:
    """DCT-II cepstra c1..cn of log-mel frames [T, M] -> [T, n]."""
    t, m = mel.shape
    k = np.arange(1, n + 1)[None, :]  # skip c0 (energy)
    basis = np.cos(np.pi * k * (2 * np.arange(m)[:, None] + 1) / (2 * m))
    return mel @ basis * np.sqrt(2.0 / m)


def dtw_path(a: np.ndarray, b: np.ndarray) -> tuple:
    """DTW alignment (L2 frame distance); returns (path_i, path_j)."""
    ta, tb = len(a), len(b)
    d = np.sqrt(
        np.maximum(
            (a * a).sum(1)[:, None] + (b * b).sum(1)[None, :] - 2 * a @ b.T,
            0.0,
        )
    )
    acc = np.full((ta + 1, tb + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, ta + 1):
        m = np.minimum(acc[i - 1, 1:], acc[i - 1, :-1])
        # roll the row-local dependency with a cumulative pass
        row = acc[i]
        prev = acc[i, 0]
        di = d[i - 1]
        for j in range(1, tb + 1):
            best = min(m[j - 1], prev)
            prev = di[j - 1] + best
            row[j] = prev
    # backtrack
    i, j = ta, tb
    pi, pj = [], []
    while i > 0 and j > 0:
        pi.append(i - 1)
        pj.append(j - 1)
        steps = (acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1])
        k = int(np.argmin(steps))
        if k == 0:
            i, j = i - 1, j - 1
        elif k == 1:
            i -= 1
        else:
            j -= 1
    return np.array(pi[::-1]), np.array(pj[::-1])


def compare_pair(hyp_wav: str, ref_wav: str) -> dict:
    mh, mr = logmel(hyp_wav), logmel(ref_wav)
    ch, cr = dct_cepstra(mh), dct_cepstra(mr)
    pi, pj = dtw_path(ch, cr)
    mcd = float(
        (10.0 / np.log(10.0))
        * np.mean(np.sqrt(2.0 * ((ch[pi] - cr[pj]) ** 2).sum(axis=1)))
    )
    mel_sd = float(np.mean(np.linalg.norm(mh[pi] - mr[pj], axis=1)))
    dur_err = float(abs(len(mh) - len(mr)) / len(mr))
    return {
        "mcd_db": mcd,
        "mel_sd": mel_sd,
        "dur_err": dur_err,
        "t_hyp": len(mh),
        "t_ref": len(mr),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hyp_dir", required=True)
    ap.add_argument(
        "--ref_dir", default="/root/reference/egs/lj/checkpoint-320000steps"
    )
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()

    refs = {}
    for p in glob.glob(os.path.join(args.ref_dir, "*.wav")):
        utt = os.path.basename(p).split("_")[0]
        refs[utt] = p

    rows = []
    for p in sorted(glob.glob(os.path.join(args.hyp_dir, "*.wav"))):
        utt = os.path.basename(p).split("_")[0].split(".")[0]
        if utt not in refs:
            print(f"skip {os.path.basename(p)} (no golden match)")
            continue
        r = compare_pair(p, refs[utt])
        r["utt"] = utt
        rows.append(r)
        print(
            f"{utt}: MCD={r['mcd_db']:6.2f} dB  mel-SD={r['mel_sd']:6.2f}  "
            f"dur_err={r['dur_err']:5.1%}  (T {r['t_hyp']} vs {r['t_ref']})"
        )

    if not rows:
        raise SystemExit("no matched utterances")
    summary = {
        "n": len(rows),
        "mcd_db_mean": float(np.mean([r["mcd_db"] for r in rows])),
        "mel_sd_mean": float(np.mean([r["mel_sd"] for r in rows])),
        "dur_err_mean": float(np.mean([r["dur_err"] for r in rows])),
    }
    print(json.dumps(summary))
    if args.json_out:
        os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
        with open(args.json_out, "w") as f:
            json.dump({"summary": summary, "utterances": rows}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
