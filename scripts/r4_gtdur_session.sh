#!/usr/bin/env bash
# Round-4 continuation: rebuild the micro loop (exp/ does not survive
# driver sessions) just far enough to measure the one row the round-4
# endgame window lost to SIGTERM — the wav-domain GT-duration control
# row (round-3 verdict item 1b). All comparison rows are re-scored at
# the SAME vocoder checkpoint so the attribution is internally valid:
#   gtdur   predicted mels + teacher-forced durations -> vocoder
#   copysy  GT mels -> vocoder (copy-synthesis bound)
#   pred    full production inference (predicted durations)
# Vocoder stops at 14k steps: the attribution needs a shared vocoder,
# not the best one (the 60k trajectory is already committed,
# results/r4/copysynth_{20000,40000,60000}.json).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p results/r4
voc_steps=${1:-14000}

echo "== stage 0: corpus =="
python scripts/make_micro_corpus.py --out exp/micro_corpus || exit 1

echo "== stage 1: EFTS-CNN 20k =="
python -m efficient_tts_tpu.bin.train \
    --config exp/micro_corpus/micro_lj.yaml \
    --train_fid_scp exp/micro_corpus/train_filelist.txt \
    --dev_fid_scp exp/micro_corpus/dev_filelist.txt \
    --outdir exp/micro_efts \
    --set train_max_steps=20000 > results/r4/gtdur_efts_train.log 2>&1 \
  || { tail -5 results/r4/gtdur_efts_train.log; exit 1; }
tail -3 results/r4/gtdur_efts_train.log

echo "== stage 2: HiFi-GAN ${voc_steps} (lr fix from step 0) =="
ls exp/micro_corpus/wavs/*.wav > exp/micro_corpus/train_wavs.txt
python -m efficient_tts_tpu.bin.train_vocoder \
    --wav_scp exp/micro_corpus/train_wavs.txt \
    --outdir exp/micro_hifigan \
    --batch_size 16 --compute_dtype bfloat16 \
    --train_max_steps ${voc_steps} --ema_decay 0.999 \
    --lr_decay_steps 1000 > results/r4/gtdur_voc_train.log 2>&1 \
  || { tail -5 results/r4/gtdur_voc_train.log; exit 1; }

# Pin the scoring vocoder to the checkpoint this script just trained —
# exp/ may hold residue from longer runs, and scoring a different
# checkpoint would silently break the shared-vocoder invariant.
voc=exp/micro_hifigan/checkpoint-${voc_steps}steps
[ -d "$voc" ] || { echo "missing $voc (trained checkpoint not found)"; exit 1; }
sfx=voc$((voc_steps / 1000))k
efts=exp/micro_efts/checkpoint-20000steps
echo "== scoring at voc=$voc (suffix $sfx) =="

echo "== row 1: GT-duration control (the missing row) =="
python scripts/acoustic_controls.py --checkpoint $efts \
    --dev_fid_scp exp/micro_corpus/dev_filelist.txt \
    --vocoder_checkpoint $voc --synth_outdir exp/gen_gtdur \
    --json_out results/r4/acoustic_controls_cnn20k_${sfx}.json | tail -2 || exit 1
python scripts/golden_compare.py --hyp_dir exp/gen_gtdur \
    --json_out results/r4/golden_gtdur_${sfx}.json | tail -2 || exit 1

echo "== row 2: copy-synthesis bound at the same vocoder =="
python scripts/copy_synthesis.py --vocoder_checkpoint $voc \
    --outdir exp/copysynth_${sfx} || exit 1
python scripts/golden_compare.py --hyp_dir exp/copysynth_${sfx} \
    --json_out results/r4/golden_copysynth_${sfx}.json | tail -2 || exit 1

echo "== row 3: full pipeline (predicted durations), same vocoder =="
python -m efficient_tts_tpu.bin.inference \
    --test_fid_scp exp/micro_corpus/dev_filelist.txt \
    --checkpoint $efts --vocoder_checkpoint $voc \
    --outdir exp/gen_cnn_${sfx} || exit 1
python scripts/golden_compare.py --hyp_dir exp/gen_cnn_${sfx} \
    --json_out results/r4/golden_micro_cnn20k_${sfx}.json | tail -2 || exit 1

echo "== done =="
