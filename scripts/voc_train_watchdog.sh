#!/usr/bin/env bash
# Run vocoder training under a log-stall watchdog: the round-4 long run
# wedged after ~27k steps (host RSS grew to ~51 GB, step log frozen,
# 90% CPU — a host-side leak/GC-thrash under the relay client). The
# trainer auto-resumes from the latest outdir checkpoint, so the
# watchdog kills (exact PID) and restarts whenever the log stops
# advancing for >stall_s seconds, until target steps or the deadline.
# Usage: voc_train_watchdog.sh <outdir> <max_steps> <deadline_HH:MM> <log>
set -u
outdir=${1:-exp/micro_hifigan}
max_steps=${2:-150000}
deadline=${3:-23:30}
log=${4:-results/r4/voc_train.log}
stall_s=300

deadline_epoch=$(date -d "today $deadline" +%s)
[ "$deadline_epoch" -lt "$(date +%s)" ] && deadline_epoch=$((deadline_epoch + 86400))

latest_step() {
    ls -d ${outdir}/checkpoint-*steps 2>/dev/null \
        | sed 's/.*checkpoint-\([0-9]*\)steps/\1/' | sort -n | tail -1
}

pid=""
start() {
    python -m efficient_tts_tpu.bin.train_vocoder \
        --wav_scp exp/micro_corpus/train_wavs.txt --outdir ${outdir} \
        --batch_size 16 --compute_dtype bfloat16 \
        --train_max_steps ${max_steps} --ema_decay 0.999 \
        --lr_decay_steps 1000 >> ${log} 2>&1 &
    pid=$!
    echo "[watchdog] started trainer pid=$pid from step $(latest_step) ($(date +%H:%M:%S))"
}

start
while true; do
    sleep 60
    now=$(date +%s)
    step=$(latest_step); step=${step:-0}
    if [ "$step" -ge "$max_steps" ] || [ "$now" -ge "$deadline_epoch" ]; then
        echo "[watchdog] stopping: step=$step deadline=$(date -d @$deadline_epoch +%H:%M)"
        kill "$pid" 2>/dev/null
        # give the Ctrl-C-style save a moment, then hard-kill
        for _ in 1 2 3 4 5 6 7 8 9 10 11 12; do
            kill -0 "$pid" 2>/dev/null || break
            sleep 10
        done
        kill -9 "$pid" 2>/dev/null
        break
    fi
    if ! kill -0 "$pid" 2>/dev/null; then
        echo "[watchdog] trainer exited; restarting"
        start
        continue
    fi
    age=$(( now - $(stat -c %Y "$log") ))
    if [ "$age" -gt "$stall_s" ]; then
        echo "[watchdog] log stalled ${age}s at step $step: restarting pid=$pid"
        kill "$pid" 2>/dev/null; sleep 10
        kill -9 "$pid" 2>/dev/null; sleep 5
        start
    fi
done
echo "[watchdog] done at step $(latest_step)"
