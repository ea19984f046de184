#!/usr/bin/env bash
# Tiny smoke-training run (counterpart of /root/reference/egs/lj/debug.sh):
# a few steps on a handful of utterances to validate the full stack.
set -euo pipefail
datadir=${1:-data}
python - <<'EOF'
import yaml
cfg = yaml.safe_load(open("../../efficient_tts_tpu/configs/lj_efts_cnn_phnseq.yaml"))
cfg.update(train_max_steps=20, save_interval_steps=20, eval_interval_steps=10,
           log_interval_steps=5, batch_size=4)
yaml.safe_dump(cfg, open("/tmp/efts_debug.yaml", "w"))
EOF
python -m efficient_tts_tpu.bin.train \
    --config /tmp/efts_debug.yaml \
    --train_fid_scp ${datadir}/dev.txt \
    --outdir exp/debug
