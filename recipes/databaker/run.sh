#!/usr/bin/env bash
# DataBaker (Mandarin) recipe: same experiment setting as LJSpeech with the
# Mandarin phone inventory and the shared LJ vocoder (reference README.md:7;
# /root/reference/egs/DataBaker ships only output samples).
set -euo pipefail

stage=0
stop_stage=2
db_root=/path/to/DataBaker            # BZNSYP: Wave/ + pronunciation labels
datadir=data
expdir=exp/databaker_efts_cnn
lj_vocoder=../lj/exp/lj_hifigan       # shared LJ vocoder
config=../../efficient_tts_tpu/configs/databaker_efts_cnn.yaml

. ../cmd.sh
. ../parse_options.sh

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
    echo "=== stage 0: data preparation (pinyin -> phone tokens) ==="
    mkdir -p ${datadir}
    ${cmd} python -m efficient_tts_tpu.bin.prepare_databaker \
        --db_root ${db_root} --outdir ${datadir}
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
    echo "=== stage 1: EFTS-CNN training ==="
    ${cmd} python -m efficient_tts_tpu.bin.train \
        --config ${config} \
        --train_fid_scp ${datadir}/train.txt \
        --dev_fid_scp ${datadir}/dev.txt \
        --outdir ${expdir}
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
    echo "=== stage 2: synthesis with the shared LJ vocoder ==="
    last_ckpt=$(ls -d ${expdir}/checkpoint-*steps | sort -t- -k2 -n | tail -1)
    ${cmd} python -m efficient_tts_tpu.bin.inference \
        --test_fid_scp ${datadir}/test.txt \
        --checkpoint ${last_ckpt} \
        --outdir ${expdir}/generated
fi
