#!/usr/bin/env bash
# Round-5 copy-synthesis probe loop: as the long vocoder run (on the
# TPU) drops checkpoint-{N}steps every --save_interval_steps, score
# each probe point ON CPU (JAX_PLATFORMS=cpu) so the quality curve is
# measured concurrently with training instead of after it. Writes
# results/r5/copysynth_{N}.json; stops after target_steps is scored or
# the deadline passes.
# Usage: r5_probe_loop.sh <voc_outdir> <probe_interval> <target_steps> <deadline_HH:MM>
set -uo pipefail
cd "$(dirname "$0")/.."
outdir=${1:-exp/micro_hifigan}
interval=${2:-20000}
target=${3:-200000}
deadline=${4:-23:00}
mkdir -p results/r5

deadline_epoch=$(date -d "today $deadline" +%s)
[ "$deadline_epoch" -lt "$(date +%s)" ] && deadline_epoch=$((deadline_epoch + 86400))

next=$interval
while [ "$next" -le "$target" ] && [ "$(date +%s)" -lt "$deadline_epoch" ]; do
    ck=${outdir}/checkpoint-${next}steps
    if [ -d "$ck" ] && [ -z "$(find "$ck" -mmin -0.2 2>/dev/null)" ]; then
        echo "== probe $next ($(date +%H:%M:%S)) =="
        JAX_PLATFORMS=cpu python scripts/copy_synthesis.py \
            --vocoder_checkpoint "$ck" \
            --outdir exp/copysynth_probe >> results/r5/probe_loop.log 2>&1 \
        && JAX_PLATFORMS=cpu python scripts/golden_compare.py \
            --hyp_dir exp/copysynth_probe \
            --json_out results/r5/copysynth_${next}.json 2>&1 | tail -1
        next=$((next + interval))
    else
        sleep 60
    fi
done
echo "== probe loop done (last target $next) =="
