"""Build a real-audio micro-corpus from the reference's committed sample wavs.

LJSpeech itself is not obtainable in this environment (zero egress, no
mounted corpus), but the reference repo commits 30 real 22.05 kHz PCM_16
LJ renditions (10 texts x {130k, 295k, 320k}-step models,
`/root/reference/egs/lj/checkpoint-*steps/`,
`current-gen-waves-130000steps/`) plus 20 DataBaker Mandarin wavs. Those
give ~200 s of real speech audio whose transcripts are present in the
shipped filelists — enough to close the capability loop end-to-end on
REAL audio: train the acoustic model + vocoder through the actual recipe
CLIs, then compare synthesized utterances against the reference's golden
wavs (`scripts/golden_compare.py`).

Usage: python scripts/make_micro_corpus.py [--out exp/micro_corpus]

Produces:
  <out>/wavs/LJxxx-yyyy[__{130k,295k}].wav   (symlinks into the mount)
  <out>/train_filelist.txt   30 lines  `wavs/<name>.wav|<phnseq>`
  <out>/dev_filelist.txt     10 lines  (320k renditions only)
  <out>/micro_lj.yaml        training config sized for the tiny corpus
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

REF = "/root/reference/egs/lj"
SAMPLE_DIRS = {
    "": f"{REF}/checkpoint-320000steps",        # canonical rendition
    "__295k": f"{REF}/checkpoint-295000steps",  # extra renditions of the
    "__130k": f"{REF}/current-gen-waves-130000steps",  # same 10 texts
}
FILELISTS = [
    f"{REF}/data/nv_taco2_filelists/ljs_audio_phnseq_test_filelist.txt",
    f"{REF}/data/nv_taco2_filelists/ljs_audio_phnseq_val_filelist.txt",
    f"{REF}/data/nv_taco2_filelists/ljs_audio_phnseq_train_filelist.txt",
]
PHNSET = f"{REF}/data/nv_taco2_filelists/g2p_en_phnset.txt"

CONFIG = """\
# EFTS-CNN on the real-audio micro-corpus (30 renditions of 10 LJ texts).
# Derived from configs/lj_efts_cnn_phnseq.yaml; batch/bucket/warmup sized
# for a 30-utterance overfit run.
dataset_type: "TextMelDataset"
dataset_params:
  wav_path: "{wav_dir}"
  use_phnseq: true
  phnset_path: "{phnset}"
  mel_cache_dir: "{mel_cache}"   # 2-CPU host: never recompute mels
  mel_memory_cache_mb: 64        # whole corpus resident: one epoch = one batch

model_name: "EfficientTTSCNN"
model_params:
  num_symbols: 76
  dropout_rate: 0.0
  use_masking: true
  sigma: 0.01

# B=30 = the whole corpus per step (alignment discovery needs the
# gradient averaging the reference gets from B=128; B=16 with a fast
# warmup collapses to the predict-the-average fixed point — uniform
# attention, imv == 0 — measured at 5k steps)
batch_size: 30
text_bucket: 16
mel_bucket: 64

optimizer_type: "Adam"
optimizer_params:
  lr: 1.0e-3
  betas: [0.9, 0.99]
  eps: 1.0e-9
  weight_decay: 1.0e-5
  amsgrad: true
grad_norm: 1.0
scheduler_type: "WarmupLR"
scheduler_params:
  warmup_steps: 4000   # reference value; a 1000-step ramp collapses alignment

mesh:
  data: null
  model: 1

train_max_steps: 20000
save_interval_steps: 5000
eval_interval_steps: 1000
log_interval_steps: 200
"""

# Same data/optimizer/interval settings, transformer acoustic model
# (configs/lj_efts_transformer_phnseq.yaml widths) — the round-3/4
# capability + quality-inversion investigation runs.
TRANSFORMER_MODEL = """\
model_name: "EfficientTTSTransformer"
model_params:
  num_symbols: 76
  n_channels: 384
  n_heads: 4
  ff_hidden: 1536
  n_text_encoder_layer: 4
  n_mel_encoder_layer: 2
  n_decoder_layer: 4
  dropout_rate: 0.0
  use_masking: true
  sigma: 0.01
"""


def load_transcripts() -> dict:
    """utt id -> phnseq transcript, from the shipped filelists."""
    t = {}
    for fl in FILELISTS:
        with open(fl, encoding="utf-8") as f:
            for line in f:
                path, text = line.strip().split("|", 1)
                utt = os.path.splitext(os.path.basename(path))[0]
                t.setdefault(utt, text)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="exp/micro_corpus")
    args = ap.parse_args()

    wav_dir = os.path.join(args.out, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    transcripts = load_transcripts()

    train_lines, dev_lines = [], []
    for suffix, d in SAMPLE_DIRS.items():
        for name in sorted(os.listdir(d)):
            if not name.endswith(".wav"):
                continue
            utt = name.split("_")[0]  # LJ016-0117_320000steps.wav
            if utt not in transcripts:
                raise SystemExit(f"no transcript for {utt}")
            link = os.path.join(wav_dir, f"{utt}{suffix}.wav")
            if os.path.lexists(link):
                os.remove(link)
            os.symlink(os.path.join(d, name), link)
            line = f"wavs/{utt}{suffix}.wav|{transcripts[utt]}"
            train_lines.append(line)
            if suffix == "":
                dev_lines.append(line)

    with open(os.path.join(args.out, "train_filelist.txt"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(os.path.join(args.out, "dev_filelist.txt"), "w") as f:
        f.write("\n".join(dev_lines) + "\n")
    cnn_cfg = CONFIG.format(
        wav_dir=os.path.abspath(wav_dir),
        phnset=PHNSET,
        mel_cache=os.path.abspath(os.path.join(args.out, "mel_cache")),
    )
    with open(os.path.join(args.out, "micro_lj.yaml"), "w") as f:
        f.write(cnn_cfg)
    cnn_model = cnn_cfg[cnn_cfg.index("model_name"):cnn_cfg.index("\n\n", cnn_cfg.index("model_name"))]
    with open(os.path.join(args.out, "micro_lj_transformer.yaml"), "w") as f:
        f.write(cnn_cfg.replace(cnn_model, TRANSFORMER_MODEL.rstrip("\n")))
    print(
        f"micro corpus at {args.out}: {len(train_lines)} train / "
        f"{len(dev_lines)} dev utterances"
    )


if __name__ == "__main__":
    main()
