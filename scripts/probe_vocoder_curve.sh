#!/usr/bin/env bash
# Copy-synthesis MCD probes of a RUNNING vocoder training, on CPU so the
# chip keeps training (round-3 verdict item 1a: probe every 20k steps).
# Usage: scripts/probe_vocoder_curve.sh <vocdir> <probe_every> [outprefix]
set -u
vocdir=${1:-exp/micro_hifigan}
every=${2:-20000}
prefix=${3:-results/r4/copysynth}
probed=""
while true; do
    for ck in $(ls -d ${vocdir}/checkpoint-*steps 2>/dev/null | sort -t- -k2 -n); do
        step=$(basename "$ck" | sed 's/checkpoint-\([0-9]*\)steps/\1/')
        [ $((step % every)) -ne 0 ] && continue
        case " $probed " in *" $step "*) continue;; esac
        # a checkpoint dir may still be mid-async-save; require the
        # orbax metadata file before reading
        [ -f "$ck/_CHECKPOINT_METADATA" ] || continue
        echo "[probe] step $step ($(date +%H:%M:%S))"
        JAX_PLATFORMS=cpu python scripts/copy_synthesis.py \
            --vocoder_checkpoint "$ck" --outdir "exp/probe_cs/${step}" \
            > /dev/null 2>&1 \
        && python scripts/golden_compare.py \
            --hyp_dir "exp/probe_cs/${step}" \
            --json_out "${prefix}_${step}.json" 2>&1 | tail -1 \
        && probed="$probed $step" \
        && rm -rf "exp/probe_cs/${step}"
    done
    # stop when training has ended and every eligible checkpoint is done
    if ! pgrep -f "bin.train_vocoder" > /dev/null 2>&1; then
        sleep 30
        remaining=$(ls -d ${vocdir}/checkpoint-*steps 2>/dev/null | wc -l)
        all_done=1
        for ck in $(ls -d ${vocdir}/checkpoint-*steps 2>/dev/null); do
            step=$(basename "$ck" | sed 's/checkpoint-\([0-9]*\)steps/\1/')
            [ $((step % every)) -ne 0 ] && continue
            case " $probed " in *" $step "*) ;; *) all_done=0;; esac
        done
        [ "$all_done" = 1 ] && break
    fi
    sleep 120
done
echo "[probe] done: $probed"
