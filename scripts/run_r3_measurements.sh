#!/bin/bash
# Round-3 measurement batch: every number BASELINE.md records, captured
# sequentially in one run (TPU steps are single processes that exit
# cleanly — a killed TPU process wedges the chip grant for ~10 min).
cd "$(dirname "$0")/.."
mkdir -p out/r3 out/sims
LOG=out/r3/batch.log
step() { echo "=== $1 ($(date +%T)) ===" | tee -a "$LOG"; }

step "sim data"
for kind in triangle square penta; do
  JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.make_sim out/sims \
    --kind $kind --num-states 200 --sun-noise 0 10 20 30 >> "$LOG" 2>&1
done

step "bench.py headline (TPU + CPU probe)"
python bench.py > out/r3/bench_headline.json 2> out/r3/bench_headline.err

step "scale sweep TPU (S/XL/XXL PCG + dogleg-vs-LM window)"
python scripts/bench_xl.py > out/r3/bench_xl_tpu.jsonl 2> out/r3/bench_xl_tpu.err

step "scale sweep CPU"
JAX_PLATFORMS=cpu python scripts/bench_xl.py \
  > out/r3/bench_xl_cpu.jsonl 2> out/r3/bench_xl_cpu.err

step "flagship triangle200 TPU f32 dogleg (both passes, timed)"
/usr/bin/time -o out/r3/triangle200_tpu_dogleg.time \
  python -m ceres_slam_tpu.apps.dataset_vo_sun \
    out/sims/triangle200.csv out/sims/triangle200_sun_ref.csv \
    out/sims/triangle200_sun_dir_gtsun0.csv \
    --window 2 --dtype float32 \
    > out/r3/triangle200_tpu_dogleg.log 2>&1
for f in triangle200_poses triangle200_gtsun0_poses; do
  cp out/sims/$f.csv out/r3/${f}_tpu_dogleg.csv; done
JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
  out/r3/triangle200_poses_tpu_dogleg.csv out/sims/triangle200_gt_poses.csv \
  --label "triangle200 vo-only tpu-f32-dogleg" >> out/r3/flagship_ate.txt 2>&1
JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
  out/r3/triangle200_gtsun0_poses_tpu_dogleg.csv out/sims/triangle200_gt_poses.csv \
  --label "triangle200 gtsun0 tpu-f32-dogleg" >> out/r3/flagship_ate.txt 2>&1

step "flagship triangle200 TPU f32 LM strategy (both passes, timed)"
/usr/bin/time -o out/r3/triangle200_tpu_lm.time \
  python -m ceres_slam_tpu.apps.dataset_vo_sun \
    out/sims/triangle200.csv out/sims/triangle200_sun_ref.csv \
    out/sims/triangle200_sun_dir_gtsun0.csv \
    --window 2 --dtype float32 --strategy lm \
    > out/r3/triangle200_tpu_lm.log 2>&1
for f in triangle200_poses triangle200_gtsun0_poses; do
  cp out/sims/$f.csv out/r3/${f}_tpu_lm.csv; done
JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
  out/r3/triangle200_poses_tpu_lm.csv out/sims/triangle200_gt_poses.csv \
  --label "triangle200 vo-only tpu-f32-lm" >> out/r3/flagship_ate.txt 2>&1
JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
  out/r3/triangle200_gtsun0_poses_tpu_lm.csv out/sims/triangle200_gt_poses.csv \
  --label "triangle200 gtsun0 tpu-f32-lm" >> out/r3/flagship_ate.txt 2>&1

step "ba_all_sims full ATE table (CPU f64, reference configuration)"
JAX_PLATFORMS=cpu DATA_DIR=out/sims bash scripts/ba_all_sims.sh \
  > out/r3/ba_all_sims.log 2>&1

step "distributed scaling harness (8 virtual CPU devices)"
python scripts/bench_scaling.py > out/r3/bench_scaling.jsonl 2>> "$LOG"

step "done"
