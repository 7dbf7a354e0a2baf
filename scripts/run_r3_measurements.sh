#!/bin/bash
# Round-3 measurement batch: every number BASELINE.md records, captured
# sequentially in one run (TPU steps are single processes that exit
# cleanly — a killed TPU process wedges the chip grant for ~10 min).
# SKIP_SIMS=1 skips data generation + the CPU-side ATE/scaling harnesses
# (for re-measuring just the chip numbers).
cd "$(dirname "$0")/.."
mkdir -p out/r3 out/sims
LOG=out/r3/batch.log
step() { echo "=== $1 ($(date +%T)) ===" | tee -a "$LOG"; }

flagship() {  # flagship <tag> [extra args...]
  local tag=$1; shift
  TIMEFORMAT="real %R s"
  { time python -m ceres_slam_tpu.apps.dataset_vo_sun \
      out/sims/triangle200.csv out/sims/triangle200_sun_ref.csv \
      out/sims/triangle200_sun_dir_gtsun0.csv \
      --window 2 --dtype float32 "$@" \
      > "out/r3/triangle200_$tag.log" 2>&1 ; } 2> "out/r3/triangle200_$tag.time"
  for f in triangle200_poses triangle200_gtsun0_poses; do
    cp "out/sims/$f.csv" "out/r3/${f}_$tag.csv"
  done
  for pass in poses gtsun0_poses; do
    JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
      "out/r3/triangle200_${pass}_$tag.csv" out/sims/triangle200_gt_poses.csv \
      --label "triangle200 $pass $tag" >> out/r3/flagship_ate.txt 2>&1
  done
}

if [ -z "$SKIP_SIMS" ]; then
step "sim data"
for kind in triangle square penta; do
  JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.make_sim out/sims \
    --kind $kind --num-states 200 --sun-noise 0 10 20 30 >> "$LOG" 2>&1
done
fi

step "bench.py headline (TPU + CPU probe)"
python bench.py > out/r3/bench_headline.json 2> out/r3/bench_headline.err

step "scale sweep TPU (S/XL/XXL PCG + dogleg-vs-LM window)"
python scripts/bench_xl.py --segsum > out/r3/bench_xl_tpu.jsonl 2> out/r3/bench_xl_tpu.err

step "scale sweep CPU"
JAX_PLATFORMS=cpu python scripts/bench_xl.py \
  > out/r3/bench_xl_cpu.jsonl 2> out/r3/bench_xl_cpu.err

step "flagship triangle200 TPU f32 dogleg (both passes, timed)"
flagship tpu_dogleg

step "flagship triangle200 TPU f32 LM strategy (both passes, timed)"
flagship tpu_lm --strategy lm

if [ -z "$SKIP_SIMS" ]; then
step "ba_all_sims full ATE table (CPU f64, reference configuration)"
JAX_PLATFORMS=cpu DATA_DIR=out/sims bash scripts/ba_all_sims.sh \
  > out/r3/ba_all_sims.log 2>&1

step "distributed scaling harness (8 virtual CPU devices)"
python scripts/bench_scaling.py > out/r3/bench_scaling.jsonl 2>> "$LOG"
fi

step "done"
