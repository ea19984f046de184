#!/usr/bin/env bash
# LJSpeech recipe: EFTS-CNN (phone input) + HiFi-GAN on TPU.
# Counterpart of the reference recipe driver (/root/reference/egs/lj/run.sh):
# same staged structure, no per-GPU launcher -- one process drives all
# local chips through the mesh; multi-host adds --coordinator flags.
#
# Usage: ./run.sh --stage 0 --stop_stage 3
set -euo pipefail

stage=0
stop_stage=3
db_root=/path/to/LJSpeech-1.1          # contains wavs/ and metadata.csv
datadir=data
expdir=exp/lj_efts_cnn
vocdir=exp/lj_hifigan
# char-level config runs directly from metadata.csv text; switch to
# lj_efts_cnn_phnseq.yaml when pre-g2p'd phone filelists are available
# (reference recipe mode, egs/lj/data/nv_taco2_filelists)
config=../../efficient_tts_tpu/configs/lj_efts_cnn_char.yaml

. ../cmd.sh
. ../parse_options.sh

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
    echo "=== stage 0: data preparation ==="
    mkdir -p ${datadir}
    # metadata.csv (id|raw|normalized) -> filelist (wav|normalized text)
    awk -F'|' -v root="${db_root}" '{print root"/wavs/"$1".wav|"$3}' \
        ${db_root}/metadata.csv > ${datadir}/all.txt
    ${cmd} python -m efficient_tts_tpu.bin.prepare_data \
        --filelist ${datadir}/all.txt --outdir ${datadir} \
        --wav_path ${db_root}/wavs --dev 100 --test 500
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
    echo "=== stage 2: HiFi-GAN vocoder training ==="
    cut -d'|' -f1 ${datadir}/train.txt > ${datadir}/train_wavs.txt
    ${cmd} python -m efficient_tts_tpu.bin.train_vocoder \
        --wav_scp ${datadir}/train_wavs.txt \
        --outdir ${vocdir}
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
    echo "=== stage 3: synthesis ==="
    last_ckpt=$(ls -d ${expdir}/checkpoint-*steps | sort -t- -k2 -n | tail -1)
    ${cmd} python -m efficient_tts_tpu.bin.inference \
        --test_fid_scp ${datadir}/test.txt \
        --checkpoint ${last_ckpt} \
        --outdir ${expdir}/generated
fi
