#!/usr/bin/env bash
# Round-5 chip campaign, one serial chip pipeline:
#   1. EFTS-CNN 20k          (final-table acoustic model)
#   2. EFTS-Transformer 20k with loss_normalize=utterance
#      (the VALIDATION §3e short-utterance treatment, verdict item 3)
#   3. long HiFi-GAN run (device-resident corpus, leak-fixed,
#      full-band loss filterbank) until <deadline> or <max_steps>
# Probes run from a separate CPU-side loop (r5_probe_loop.sh).
# Usage: r5_campaign.sh <voc_max_steps> <deadline_HH:MM>
set -uo pipefail
cd "$(dirname "$0")/.."
max_steps=${1:-200000}
deadline=${2:-13:10}
mkdir -p results/r5

[ -d exp/micro_corpus/wavs ] || python scripts/make_micro_corpus.py --out exp/micro_corpus || exit 1
ls exp/micro_corpus/wavs/*.wav > exp/micro_corpus/train_wavs.txt

if [ ! -d exp/micro_efts/checkpoint-20000steps ]; then
    echo "== EFTS-CNN 20k ($(date +%H:%M:%S)) =="
    python -m efficient_tts_tpu.bin.train \
        --config exp/micro_corpus/micro_lj.yaml \
        --train_fid_scp exp/micro_corpus/train_filelist.txt \
        --dev_fid_scp exp/micro_corpus/dev_filelist.txt \
        --outdir exp/micro_efts \
        --set train_max_steps=20000 > results/r5/efts_train.log 2>&1 \
      || { tail -5 results/r5/efts_train.log; exit 1; }
    tail -2 results/r5/efts_train.log
fi

if [ ! -d exp/micro_tf_utt/checkpoint-20000steps ]; then
    echo "== EFTS-Transformer 20k, loss_normalize=utterance ($(date +%H:%M:%S)) =="
    python -m efficient_tts_tpu.bin.train \
        --config exp/micro_corpus/micro_lj_transformer.yaml \
        --train_fid_scp exp/micro_corpus/train_filelist.txt \
        --dev_fid_scp exp/micro_corpus/dev_filelist.txt \
        --outdir exp/micro_tf_utt \
        --set train_max_steps=20000 \
        --set model_params.loss_normalize=utterance \
        > results/r5/tf_utt_train.log 2>&1 \
      || { tail -5 results/r5/tf_utt_train.log; exit 1; }
    tail -2 results/r5/tf_utt_train.log
fi

echo "== long vocoder run to ${max_steps} (deadline ${deadline}, $(date +%H:%M:%S)) =="
deadline_epoch=$(date -d "today $deadline" +%s)
[ "$deadline_epoch" -lt "$(date +%s)" ] && deadline_epoch=$((deadline_epoch + 86400))

python -m efficient_tts_tpu.bin.train_vocoder \
    --wav_scp exp/micro_corpus/train_wavs.txt \
    --outdir exp/micro_hifigan \
    --batch_size 16 --compute_dtype bfloat16 \
    --train_max_steps ${max_steps} --ema_decay 0.999 \
    --lr_decay_steps 1000 --save_interval_steps 10000 \
    --device_corpus on >> results/r5/voc_train.log 2>&1 &
pid=$!
echo "[campaign] vocoder trainer pid=$pid"

while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    if [ "$(date +%s)" -ge "$deadline_epoch" ]; then
        echo "[campaign] deadline: stopping trainer (SIGINT -> save)"
        kill -INT "$pid" 2>/dev/null
        for _ in $(seq 1 30); do kill -0 "$pid" 2>/dev/null || break; sleep 10; done
        kill -9 "$pid" 2>/dev/null
        break
    fi
done
wait "$pid" 2>/dev/null
echo "[campaign] done at $(date +%H:%M:%S); checkpoints:"
ls -d exp/micro_hifigan/checkpoint-*steps 2>/dev/null | tail -3
