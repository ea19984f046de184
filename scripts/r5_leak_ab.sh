#!/usr/bin/env bash
# Round-5 leak A/B: reproduce the round-4 vocoder-trainer host leak on
# the HOST segment pipeline, then show the device-resident corpus path
# (data/device_corpus.py) holds flat RSS at the same step count.
# The trainer now logs `rss N.NN GB` on every interval line, so the
# evidence is the slope of that series in each log.
# Usage: r5_leak_ab.sh [steps_per_arm=600]
set -uo pipefail
cd "$(dirname "$0")/.."
steps=${1:-600}
mkdir -p results/r5

[ -d exp/micro_corpus/wavs ] || python scripts/make_micro_corpus.py --out exp/micro_corpus || exit 1
ls exp/micro_corpus/wavs/*.wav > exp/micro_corpus/train_wavs.txt

run_arm() { # name device_corpus_mode
    local name=$1 mode=$2
    rm -rf exp/leak_ab_$name
    echo "== arm $name (device_corpus=$mode, $steps steps) =="
    timeout 2400 python -m efficient_tts_tpu.bin.train_vocoder \
        --wav_scp exp/micro_corpus/train_wavs.txt \
        --outdir exp/leak_ab_$name \
        --batch_size 16 --compute_dtype bfloat16 \
        --train_max_steps $steps --ema_decay 0.999 \
        --lr_decay_steps 1000 --device_corpus $mode \
        > results/r5/leak_ab_$name.log 2>&1 || { tail -5 results/r5/leak_ab_$name.log; return 1; }
    grep -oE "step [0-9]+: .*rss [0-9.]+ GB" results/r5/leak_ab_$name.log | tail -20
}

run_arm host off || exit 1
run_arm device on || exit 1

python - <<'EOF'
import json, re
out = {}
for arm in ("host", "device"):
    rows = []
    for line in open(f"results/r5/leak_ab_{arm}.log"):
        m = re.search(r"step (\d+): .*?([\d.]+) steps/s, rss ([\d.]+) GB", line)
        if m:
            rows.append((int(m[1]), float(m[2]), float(m[3])))
    if len(rows) >= 2:
        (s0, _, r0), (s1, sps, r1) = rows[0], rows[-1]
        out[arm] = {
            "steps": [s0, s1],
            "rss_gb": [r0, r1],
            "leak_mb_per_step": (r1 - r0) * 1024 / max(s1 - s0, 1),
            "steps_per_s": sps,
        }
json.dump(out, open("results/r5/leak_ab.json", "w"), indent=1)
print(json.dumps(out, indent=1))
EOF
