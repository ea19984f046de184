"""Copy-synthesis control for the golden comparison: ground-truth mels
through OUR vocoder only.

Decomposes the end-to-end golden MCD (`scripts/golden_compare.py`) into
acoustic-model vs vocoder contributions: each golden wav
(`/root/reference/egs/lj/checkpoint-320000steps/*.wav`, the reference's
committed capability proof) is analyzed with our DSP (`dsp/mel.py`,
torch.stft-oracle-tested) and re-synthesized by our HiFi-GAN generator.
The resulting wavs score ONLY the vocoder: if their MCD vs the goldens
matches the full-pipeline MCD, the acoustic model is not the bottleneck.

Usage:
  python scripts/copy_synthesis.py --vocoder_checkpoint exp/micro_hifigan/checkpoint-12000steps \
      [--ref_dir /root/reference/egs/lj/checkpoint-320000steps] \
      [--outdir exp/micro_efts/copysynth]
  python scripts/golden_compare.py --hyp_dir exp/micro_efts/copysynth
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocoder_checkpoint", required=True)
    ap.add_argument(
        "--ref_dir", default="/root/reference/egs/lj/checkpoint-320000steps"
    )
    ap.add_argument("--outdir", default="exp/micro_efts/copysynth")
    ap.add_argument("--bucket", type=int, default=64, help="mel-frame bucket")
    ap.add_argument(
        "--peak_normalize", action="store_true",
        help="peak-normalize (0.95/|x|max) the golden wav before mel "
        "analysis, matching the vocoder TRAINING input distribution "
        "(`MelAudioSegmentDataset._load_audio`); diagnoses train/test "
        "level mismatch in the copy-synthesis score",
    )
    args = ap.parse_args()

    import jax.numpy as jnp
    from scipy.io.wavfile import write as wav_write

    from efficient_tts_tpu.bin.inference import _load_vocoder
    from efficient_tts_tpu.data.dataset import load_wav_float
    from efficient_tts_tpu.dsp.mel import MelConfig, mel_spectrogram_np
    from efficient_tts_tpu.models import hifigan as hg
    from efficient_tts_tpu.models.hifigan import HiFiGANConfig

    from efficient_tts_tpu.utils.jax_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    voc_cfg = HiFiGANConfig()
    voc_params = _load_vocoder(args.vocoder_checkpoint, voc_cfg)
    os.makedirs(args.outdir, exist_ok=True)
    mel_cfg = MelConfig()

    mels = {}
    gains = {}
    for p in sorted(glob.glob(os.path.join(args.ref_dir, "*.wav"))):
        audio, sr = load_wav_float(p)
        assert sr == mel_cfg.sample_rate, (p, sr)
        name = os.path.splitext(os.path.basename(p))[0].split("_")[0]
        gains[name] = 1.0
        if args.peak_normalize:
            peak = float(np.abs(audio).max())
            if peak > 0:
                audio = audio / peak * 0.95
                # undo on the output so the score vs the UN-normalized
                # golden stays level-matched
                gains[name] = peak / 0.95
        mels[name] = mel_spectrogram_np(audio, mel_cfg).T  # [T, 80]
    # one padded shape for every utterance -> one XLA compile
    t_max = max(m.shape[0] for m in mels.values())
    t_pad = t_max + ((-t_max) % args.bucket)
    for name, mel in mels.items():
        t = mel.shape[0]
        mel_in = np.pad(mel, ((0, t_pad - t), (0, 0)))[None]  # [1, T', 80]
        wav = hg.generator(
            voc_params, jnp.asarray(mel_in), voc_cfg,
            compute_dtype=jnp.bfloat16, pack_small_channels=True,
            mrf_impl="auto",
        )
        wav = np.asarray(wav)[0, : t * mel_cfg.hop_size] * gains[name]
        out = os.path.join(args.outdir, f"{name}_copysynth.wav")
        pcm = (np.clip(wav, -1, 1) * 32767).astype(np.int16)
        wav_write(out, sr, pcm)
        print(f"{name}: {t} frames -> {len(pcm)} samples")
    print(f"copy-synthesis wavs in {args.outdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
