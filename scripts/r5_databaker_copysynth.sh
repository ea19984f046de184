#!/usr/bin/env bash
# DataBaker cross-speaker/cross-language vocoder generalization row
# (round-4 verdict item 5): copy-synthesize the reference's 20 committed
# DataBaker wavs (Mandarin, female speaker) through OUR LJ-micro-trained
# vocoder and score against those same files — the wav-domain analog of
# the reference's shared-LJ-vocoder DataBaker release
# (/root/reference/egs/DataBaker/checkpoint-330000steps_LJ_vocoder/,
# README.md:7 "exactly the same setting as LJSpeech", shared vocoder).
# Runs on CPU so it can score while the TPU trains.
# Usage: r5_databaker_copysynth.sh <vocoder_checkpoint> [json_suffix]
set -uo pipefail
cd "$(dirname "$0")/.."
ck=${1:?vocoder checkpoint dir required}
sfx=${2:-$(basename "$ck" | sed 's/checkpoint-\([0-9]*\)000steps/voc\1k/')}
ref=/root/reference/egs/DataBaker/checkpoint-330000steps_LJ_vocoder
mkdir -p results/r5

JAX_PLATFORMS=cpu python scripts/copy_synthesis.py \
    --vocoder_checkpoint "$ck" --ref_dir "$ref" \
    --outdir exp/copysynth_databaker_${sfx} || exit 1
JAX_PLATFORMS=cpu python scripts/golden_compare.py \
    --hyp_dir exp/copysynth_databaker_${sfx} --ref_dir "$ref" \
    --json_out results/r5/golden_databaker_copysynth_${sfx}.json | tail -2 || exit 1
