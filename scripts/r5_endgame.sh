#!/usr/bin/env bash
# Round-5 endgame scoring: all wav-domain rows through the SAME final
# vocoder, against the reference's committed 320k goldens, using the
# production CLIs. Runs after the long vocoder run stops.
#   row 1: full pipeline, EFTS-CNN@20k  (+ CLI cold/warm attribution)
#   row 2: full pipeline, EFTS-Transformer(utterance-norm)@20k
#   row 3: GT-duration control (predicted mels + teacher-forced durations)
#   row 4: copy-synthesis bound (GT mels)
#   row 5: DataBaker cross-speaker/language vocoder generalization
# Usage: r5_endgame.sh <vocoder_checkpoint> [suffix] [JAX_PLATFORMS]
set -uo pipefail
cd "$(dirname "$0")/.."
voc=${1:?vocoder checkpoint required}
sfx=${2:-final}
plat=${3:-}   # set to "cpu" to score CPU-side while the chip is busy
[ -n "$plat" ] && export JAX_PLATFORMS=$plat
cnn=exp/micro_efts/checkpoint-20000steps
tf=exp/micro_tf_utt/checkpoint-20000steps
mkdir -p results/r5 results/audio_r5

echo "== row 1: full pipeline CNN (with timing attribution) =="
python -m efficient_tts_tpu.bin.inference \
    --test_fid_scp exp/micro_corpus/dev_filelist.txt \
    --checkpoint $cnn --vocoder_checkpoint $voc \
    --outdir exp/gen_cnn_${sfx} --repeats 2 \
    --timing_json results/r5/inference_timing_${sfx}.json || exit 1
python scripts/golden_compare.py --hyp_dir exp/gen_cnn_${sfx} \
    --json_out results/r5/golden_micro_cnn20k_${sfx}.json | tail -2 || exit 1

echo "== row 2: full pipeline TF-utterance =="
python -m efficient_tts_tpu.bin.inference \
    --test_fid_scp exp/micro_corpus/dev_filelist.txt \
    --checkpoint $tf --vocoder_checkpoint $voc \
    --outdir exp/gen_tf_utt_${sfx} || exit 1
python scripts/golden_compare.py --hyp_dir exp/gen_tf_utt_${sfx} \
    --json_out results/r5/golden_micro_tf_utt20k_${sfx}.json | tail -2 || exit 1

echo "== row 3: GT-duration control =="
python scripts/acoustic_controls.py --checkpoint $cnn \
    --dev_fid_scp exp/micro_corpus/dev_filelist.txt \
    --vocoder_checkpoint $voc --synth_outdir exp/gen_gtdur_${sfx} \
    --json_out results/r5/acoustic_controls_cnn20k_${sfx}.json | tail -2 || exit 1
python scripts/golden_compare.py --hyp_dir exp/gen_gtdur_${sfx} \
    --json_out results/r5/golden_gtdur_${sfx}.json | tail -2 || exit 1

echo "== row 4: copy-synthesis bound =="
python scripts/copy_synthesis.py --vocoder_checkpoint $voc \
    --outdir exp/copysynth_${sfx} || exit 1
python scripts/golden_compare.py --hyp_dir exp/copysynth_${sfx} \
    --json_out results/r5/golden_copysynth_${sfx}.json | tail -2 || exit 1

echo "== row 5: DataBaker generalization =="
bash scripts/r5_databaker_copysynth.sh "$voc" ${sfx} || exit 1

echo "== commit audio artifacts with hashes =="
cp exp/gen_cnn_${sfx}/*.wav results/audio_r5/ 2>/dev/null
( cd results/audio_r5 && sha256sum *.wav > SHA256SUMS ) || true
echo "== endgame done =="
