"""Vocoder GAN learning sanity check on a synthetic harmonic corpus.

Trains the full HiFi-GAN V1 (generator + MPD + MSD, the trainer the
reference never shipped — SURVEY.md §2.5) on synthetic multi-harmonic
waveforms and tracks the eval mel-L1 of generated audio on held-out
signals. Convergence of mel-L1 plus rising waveform correlation is the
numerical stand-in for "the vocoder learns to vocode" without the
(unmounted) LJSpeech corpus.

Run on TPU: python scripts/vocoder_convergence.py [--steps 2000]

`--corpus real` trains on the real 22.05 kHz speech renditions the
reference commits (built by `scripts/make_micro_corpus.py`; ~200 s of
audio), holding out 2 utterances for eval — real-audio convergence
evidence (copy-synthesis), not just synthetic harmonics.

PASS criterion (asserted, exit code): the held-out mel-L1 of the EMA
generator must drop to <= `--pass_ratio` (default 0.5) of its first
evaluation, and the final evaluation must be within 10% of the best seen
(no divergence at the end).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from efficient_tts_tpu.dsp.mel import MelConfig, mel_spectrogram_np
from efficient_tts_tpu.models import hifigan as hg
from efficient_tts_tpu.models.hifigan import HiFiGANConfig
from efficient_tts_tpu.train.hifigan_train_step import (
    ema_generator_params,
    init_gan_state,
    make_gan_eval_step,
    make_gan_train_step,
)
from efficient_tts_tpu.train.optim import hifigan_adam

SR = 22050


def harmonic_wave(rng, n_samples: int) -> np.ndarray:
    """Multi-harmonic signal with a wandering f0 and amplitude envelope —
    crudely voice-like, rich enough that the discriminators have texture
    to judge."""
    f0 = rng.uniform(110, 330)
    drift = np.cumsum(rng.standard_normal(n_samples) * 0.3) / SR
    t = np.arange(n_samples) / SR
    phase = 2 * np.pi * np.cumsum(np.full(n_samples, f0) * (1 + 0.02 * drift)) / SR
    x = np.zeros(n_samples)
    for h in range(1, 7):
        x += rng.uniform(0.2, 1.0) / h * np.sin(h * phase + rng.uniform(0, 6.28))
    env = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * rng.uniform(1, 4) * t))
    x = x * env + 0.01 * rng.standard_normal(n_samples)
    return (0.8 * x / np.max(np.abs(x))).astype(np.float32)


def segments(rng, waves, mel_cfg, batch, segment):
    hop = mel_cfg.hop_size
    mel_frames = segment // hop
    mels = np.zeros((batch, mel_frames, 80), np.float32)
    audio = np.zeros((batch, segment), np.float32)
    for i in range(batch):
        w = waves[rng.integers(0, len(waves))]
        s = rng.integers(0, len(w) - segment)
        seg = w[s : s + segment]
        audio[i] = seg
        mels[i] = mel_spectrogram_np(seg, mel_cfg).T[:mel_frames]
    return {"mel": mels, "audio": audio, "mel_loss": mels.copy()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--eval_every", type=int, default=200)
    ap.add_argument("--out", default="vocoder_convergence.json")
    ap.add_argument("--compute_dtype", default=None, choices=["bfloat16"],
                    help="bf16 conv towers (validates mixed-precision GAN training)")
    ap.add_argument("--corpus", default="synthetic", choices=["synthetic", "real"])
    ap.add_argument("--real_dir", default="exp/micro_corpus/wavs",
                    help="wav dir for --corpus real (make_micro_corpus.py)")
    ap.add_argument("--pass_ratio", type=float, default=0.5)
    args = ap.parse_args()

    voc_cfg = HiFiGANConfig()
    mel_cfg = MelConfig()
    rng = np.random.default_rng(0)
    if args.corpus == "real":
        import glob

        from efficient_tts_tpu.data.dataset import load_wav_float

        paths = sorted(glob.glob(os.path.join(args.real_dir, "*.wav")))
        if not paths:
            raise SystemExit(
                f"no wavs in {args.real_dir} — run scripts/make_micro_corpus.py"
            )
        # hold out every rendition of 2 utterances for eval
        held = ("LJ043-0016", "LJ045-0096")
        train_waves, eval_waves = [], []
        for p in paths:
            w, sr = load_wav_float(p)
            assert sr == SR, (p, sr)
            (eval_waves if os.path.basename(p).startswith(held) else
             train_waves).append(w)
        print(f"real corpus: {len(train_waves)} train / {len(eval_waves)} "
              f"eval wavs ({sum(len(w) for w in train_waves)/SR:.0f}s train)")
    else:
        train_waves = [harmonic_wave(rng, SR * 2) for _ in range(24)]
        eval_waves = [harmonic_wave(rng, SR * 2) for _ in range(4)]
    eval_batch = segments(rng, eval_waves, mel_cfg, 8, voc_cfg.segment_size)

    gen_tx = hifigan_adam()
    disc_tx = hifigan_adam()
    state = init_gan_state(
        jax.random.PRNGKey(0), voc_cfg, gen_tx, disc_tx, ema_decay=0.999
    )
    cdt = jnp.bfloat16 if args.compute_dtype == "bfloat16" else None
    step = make_gan_train_step(voc_cfg, gen_tx, disc_tx, ema_decay=0.999,
                               compute_dtype=cdt)
    eval_step = make_gan_eval_step(voc_cfg, mel_cfg)

    history = []
    t0 = time.time()
    for i in range(1, args.steps + 1):
        batch = segments(rng, train_waves, mel_cfg, args.batch,
                         voc_cfg.segment_size)
        state, metrics = step(state, batch)
        if i % args.eval_every == 0 or i == 1:
            ev = eval_step(ema_generator_params(state), eval_batch)
            row = {
                "step": i,
                "eval_mel_l1": float(ev["mel_l1"]),
                "train_mel_l1": float(metrics["mel_l1"]),
                "d_loss": float(metrics["d_loss"]),
                "g_loss": float(metrics["g_loss"]),
                "wall_s": round(time.time() - t0, 1),
            }
            history.append(row)
            print(row, flush=True)

    # waveform-level check on one eval segment (EMA generator)
    y_hat = np.asarray(
        hg.generator(ema_generator_params(state), eval_batch["mel"][:1], voc_cfg)
    )[0]
    y = eval_batch["audio"][0]
    corr = float(np.corrcoef(y, y_hat[: len(y)])[0, 1])

    first = history[0]["eval_mel_l1"]
    final = history[-1]["eval_mel_l1"]
    best = min(h["eval_mel_l1"] for h in history)
    ok = final <= args.pass_ratio * first and final <= 1.10 * best
    result = {
        "corpus": args.corpus,
        "compute_dtype": args.compute_dtype or "float32",
        "history": history,
        "final_waveform_corr": corr,
        "eval_mel_l1_first": first,
        "eval_mel_l1_final": final,
        "eval_mel_l1_best": best,
        "pass": ok,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("waveform corr (eval, EMA generator):", corr)
    print(f"eval mel-L1 {first:.3f} -> {final:.3f} (best {best:.3f})")
    print("wrote", args.out)
    print("VOCODER CONVERGENCE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
