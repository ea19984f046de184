#!/usr/bin/env bash
# Decode-only driver — counterpart of the reference's `egs/lj/test.sh`
# (stage-3-only decoding against a chosen or latest checkpoint).
#
# Usage: ./test.sh [--checkpoint PATH] [--expdir DIR] [--test_fid_scp LIST]
set -euo pipefail

datadir=data
expdir=exp/lj_efts_cnn
vocdir=exp/lj_hifigan
checkpoint=""            # empty -> latest checkpoint-*steps in expdir
voc_checkpoint=""        # optional trained vocoder checkpoint
test_fid_scp=""          # empty -> ${datadir}/test.txt
num_utts=10              # the reference decodes the first 10 test utts

. ../cmd.sh
. ../parse_options.sh

[ -z "${test_fid_scp}" ] && test_fid_scp=${datadir}/test.txt
if [ -z "${checkpoint}" ]; then
    checkpoint=$(ls -d ${expdir}/checkpoint-*steps | sort -t- -k2 -n | tail -1)
fi
outdir="${expdir}/wav/$(basename "${checkpoint}")"

voc_args=()
if [ -n "${voc_checkpoint}" ]; then
    voc_args=(--vocoder_checkpoint "${voc_checkpoint}")
elif ls -d ${vocdir}/checkpoint-*steps >/dev/null 2>&1; then
    voc_args=(--vocoder_checkpoint "$(ls -d ${vocdir}/checkpoint-*steps | sort -t- -k2 -n | tail -1)")
fi

${cmd} python -m efficient_tts_tpu.bin.inference \
    --test_fid_scp "${test_fid_scp}" \
    --checkpoint "${checkpoint}" \
    --outdir "${outdir}" \
    --num_utts "${num_utts}" \
    "${voc_args[@]}"

echo "Successfully finished decoding -> ${outdir}"
