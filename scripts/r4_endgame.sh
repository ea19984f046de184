#!/usr/bin/env bash
# Round-4 endgame chip window: rescore the full quality table with the
# final vocoder, run the wav-domain GT-duration control row, synthesize
# + stage the committed audio artifacts, re-run the autotuner on
# hardware, and re-measure the low-QPS serving rows warm.
# Run from the repo root AFTER vocoder training ends.
set -uo pipefail
cd "$(dirname "$0")/.."

voc=$(ls -d exp/micro_hifigan/checkpoint-*steps | sort -t- -k2 -n | tail -1)
efts=exp/micro_efts/checkpoint-20000steps
tf=exp/micro_tf/checkpoint-20000steps
echo "== endgame: voc=$voc"

# 1. full pipeline: CNN + final vocoder
python -m efficient_tts_tpu.bin.inference \
    --test_fid_scp exp/micro_corpus/dev_filelist.txt \
    --checkpoint $efts --vocoder_checkpoint $voc \
    --outdir exp/gen_cnn_final \
 && python scripts/golden_compare.py --hyp_dir exp/gen_cnn_final \
    --json_out results/r4/golden_micro_cnn20k_vocfinal.json | tail -2

# 2. full pipeline: transformer + final vocoder
python -m efficient_tts_tpu.bin.inference \
    --test_fid_scp exp/micro_corpus/dev_filelist.txt \
    --checkpoint $tf --vocoder_checkpoint $voc \
    --outdir exp/gen_tf_final \
 && python scripts/golden_compare.py --hyp_dir exp/gen_tf_final \
    --json_out results/r4/golden_micro_tf20k_vocfinal.json | tail -2

# 3. copy-synthesis bound at the final checkpoint (on-chip; the probe
#    loop produced the CPU trajectory)
python scripts/copy_synthesis.py --vocoder_checkpoint $voc \
    --outdir exp/copysynth_final \
 && python scripts/golden_compare.py --hyp_dir exp/copysynth_final \
    --json_out results/r4/golden_copysynth_vocfinal.json | tail -2

# 4. wav-domain GT-duration control row (verdict 1b): predicted mel +
#    teacher-forced durations through the final vocoder
python scripts/acoustic_controls.py --checkpoint $efts \
    --dev_fid_scp exp/micro_corpus/dev_filelist.txt \
    --vocoder_checkpoint $voc --synth_outdir exp/gen_gtdur \
    --json_out results/r4/acoustic_controls_cnn20k_final.json | tail -2 \
 && python scripts/golden_compare.py --hyp_dir exp/gen_gtdur \
    --json_out results/r4/golden_gtdur_vocfinal.json | tail -2

# 4b. transformer mel-domain controls (verdict item 4 comparison row)
python scripts/acoustic_controls.py --checkpoint $tf \
    --dev_fid_scp exp/micro_corpus/dev_filelist.txt \
    --json_out results/r4/acoustic_controls_tf20k.json | tail -2

# 5. committed audio artifacts (verdict item 6)
mkdir -p results/audio_r4
cp exp/gen_cnn_final/*.wav results/audio_r4/
( echo "# Round-4 audio manifest ($(date -u +%FT%TZ))";
  echo "efts_checkpoint: $efts";
  echo "vocoder_checkpoint: $voc";
  echo "synthesis: bin/inference (production CLI), defaults";
  echo "score_with: python scripts/golden_compare.py --hyp_dir results/audio_r4";
  echo; echo "## sha256";
  sha256sum results/audio_r4/*.wav exp/micro_efts/config.yml \
      "$efts/manifest.ocdbt" "$voc/manifest.ocdbt" 2>/dev/null
) > results/audio_r4/MANIFEST.txt

# 6. autotuner on hardware with the whole-pipeline objective (verdict 3)
timeout 1800 python scripts/autotune_serving.py --rounds 1 \
    > results/r4/autotune.log 2>&1; tail -3 results/r4/autotune.log

# 7. warm low-QPS serving rows (the sorted run's 8-QPS row was a
#    cold-cache artifact)
timeout 1800 python scripts/bench_serving_load.py --qps 4,8,16,32 \
    --seconds 15 --json_out results/r4/serving_load_warm.json \
    > results/r4/serving_load_warm.log 2>&1; tail -4 results/r4/serving_load_warm.log

# 8. final driver bench
python bench.py | tail -1
