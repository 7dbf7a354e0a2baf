#!/bin/bash
# Round-5 measurement batch. Every TPU step is ONE python process that
# exits cleanly — a killed TPU process wedges the single-chip grant for
# ~10 min, so nothing here is run under timeout/kill. Steps run strictly
# sequentially (CPU contention distorts both CPU timings and the TPU
# host-side phases).
cd "$(dirname "$0")/.."
mkdir -p out/r5
LOG=out/r5/batch.log
step() { echo "=== $1 ($(date +%T)) ===" | tee -a "$LOG"; }
# timed <outfile> <cmd...>: record wall seconds in the r4 artifact format
timed() { local out="$1"; shift; local t0=$SECONDS; "$@"; local rc=$?;
          echo "real $((SECONDS - t0)) s" > "$out"; return $rc; }

SIMS=out/sims
KITTI=out/kitti
PHONG=out/phong

# ---------------- TPU phase ----------------

step "bench.py headline capture B (A ran separately; two captures = variance check)"
python bench.py > out/r5/bench_headline_b.json 2> out/r5/bench_headline_b.err

step "scale sweep TPU (S/XL/XXL x {jacobi,banded,segsum} + window strategies + phong + photometric gather/pallas)"
python scripts/bench_xl.py --segsum > out/r5/bench_xl_tpu.jsonl 2> out/r5/bench_xl_tpu.err

step "flagship triangle200 TPU f32 (cold)"
timed out/r5/triangle200_tpu_cold.time \
  python -m ceres_slam_tpu.apps.dataset_vo_sun \
    $SIMS/triangle200.csv $SIMS/triangle200_sun_ref.csv \
    $SIMS/triangle200_sun_dir_gtsun0.csv --window 2 --dtype float32 \
    > out/r5/triangle200_tpu_cold.log 2>&1

step "flagship triangle200 TPU f32 (warm 1)"
timed out/r5/triangle200_tpu_warm1.time \
  python -m ceres_slam_tpu.apps.dataset_vo_sun \
    $SIMS/triangle200.csv $SIMS/triangle200_sun_ref.csv \
    $SIMS/triangle200_sun_dir_gtsun0.csv --window 2 --dtype float32 \
    > out/r5/triangle200_tpu_warm1.log 2>&1

step "flagship triangle200 TPU f32 (warm 2)"
timed out/r5/triangle200_tpu_warm2.time \
  python -m ceres_slam_tpu.apps.dataset_vo_sun \
    $SIMS/triangle200.csv $SIMS/triangle200_sun_ref.csv \
    $SIMS/triangle200_sun_dir_gtsun0.csv --window 2 --dtype float32 \
    > out/r5/triangle200_tpu_warm2.log 2>&1

step "flagship ATE (TPU f32 outputs)"
{ JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
    $SIMS/triangle200_poses.csv $SIMS/triangle200_gt_poses.csv \
    --label "triangle200 vo-only tpu-f32"
  JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
    $SIMS/triangle200_gtsun0_poses.csv $SIMS/triangle200_gt_poses.csv \
    --label "triangle200 gtsun0 tpu-f32"; } > out/r5/flagship_ate_tpu.txt 2>&1

step "batched grid: whole ba_all_sims as ONE vmapped scan (TPU f32)"
timed out/r5/ba_all_sims_batch.time \
  env BATCH=1 BATCH_DTYPE=float32 DATA_DIR=$SIMS \
  bash scripts/ba_all_sims.sh > out/r5/ba_all_sims_batch.log 2>&1

step "KITTI-shaped kitti1100 flagship TPU f32 (cold)"
timed out/r5/kitti1100_tpu_cold.time \
  python -m ceres_slam_tpu.apps.dataset_vo_sun \
    $KITTI/kitti1100.csv $KITTI/kitti1100_sun_ref.csv \
    $KITTI/kitti1100_sun_dir_gtsun0.csv --window 2 --dtype float32 \
    > out/r5/kitti1100_tpu_cold.log 2>&1

step "KITTI-shaped kitti1100 flagship TPU f32 (warm)"
timed out/r5/kitti1100_tpu_warm.time \
  python -m ceres_slam_tpu.apps.dataset_vo_sun \
    $KITTI/kitti1100.csv $KITTI/kitti1100_sun_ref.csv \
    $KITTI/kitti1100_sun_dir_gtsun0.csv --window 2 --dtype float32 \
    > out/r5/kitti1100_tpu_warm.log 2>&1

step "KITTI ATE (TPU f32)"
{ JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
    $KITTI/kitti1100_poses.csv $KITTI/kitti1100_gt_poses.csv \
    --label "kitti1100 vo-only tpu-f32"
  JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
    $KITTI/kitti1100_gtsun0_poses.csv $KITTI/kitti1100_gt_poses.csv \
    --label "kitti1100 gtsun0 tpu-f32"; } > out/r5/kitti_ate_tpu.txt 2>&1

step "Phong BA app-level TPU f32: full batch --multistage"
timed out/r5/phong200_tpu_multistage.time \
  python -m ceres_slam_tpu.apps.dataset_ba_phong out/phong/phong200.csv \
    --multistage --dtype float32 \
    > out/r5/phong200_tpu_multistage.log 2>&1
JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
  $PHONG/phong200_poses.csv $PHONG/phong200_gt_poses.csv \
  --label "phong200 multistage tpu-f32" > out/r5/phong_ate_tpu.txt 2>&1

step "Phong BA app-level TPU f32: --window 10"
timed out/r5/phong200_tpu_window.time \
  python -m ceres_slam_tpu.apps.dataset_ba_phong out/phong/phong200.csv \
    --window 10 --dtype float32 \
    > out/r5/phong200_tpu_window.log 2>&1
JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
  $PHONG/phong200_poses.csv $PHONG/phong200_gt_poses.csv \
  --label "phong200 window10 tpu-f32" >> out/r5/phong_ate_tpu.txt 2>&1

step "dense stereo end-to-end TPU (SGM front end -> photometric alignment)"
timed out/r5/dense_stereo_tpu.time \
  python -m ceres_slam_tpu.apps.dense_stereo --height 240 --width 320 \
    > out/r5/dense_stereo_tpu.log 2>&1

step "fused in-scan Pallas window kernel: single-run scan, CSTPU_SCAN_FUSED=1 (last TPU step: a remote-compile failure here cannot disturb the captures above)"
timed out/r5/triangle200_tpu_fused.time \
  env CSTPU_SCAN_FUSED=1 python -m ceres_slam_tpu.apps.dataset_vo_sun \
    $SIMS/triangle200.csv $SIMS/triangle200_sun_ref.csv \
    $SIMS/triangle200_sun_dir_gtsun0.csv --window 2 --dtype float32 \
    --sun-only \
    > out/r5/triangle200_tpu_fused.log 2>&1

# ---------------- CPU phase ----------------

step "flagship triangle200 CPU f64 (reference configuration)"
timed out/r5/triangle200_cpu_f64.time \
  env JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.dataset_vo_sun \
    $SIMS/triangle200.csv $SIMS/triangle200_sun_ref.csv \
    $SIMS/triangle200_sun_dir_gtsun0.csv --window 2 \
    > out/r5/triangle200_cpu_f64.log 2>&1
{ JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
    $SIMS/triangle200_poses.csv $SIMS/triangle200_gt_poses.csv \
    --label "triangle200 vo-only cpu-f64"
  JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
    $SIMS/triangle200_gtsun0_poses.csv $SIMS/triangle200_gt_poses.csv \
    --label "triangle200 gtsun0 cpu-f64"; } > out/r5/flagship_ate_cpu.txt 2>&1

step "scale sweep CPU"
JAX_PLATFORMS=cpu python scripts/bench_xl.py \
  > out/r5/bench_xl_cpu.jsonl 2> out/r5/bench_xl_cpu.err

step "ba_all_sims sequential CPU reference harness"
timed out/r5/ba_all_sims_cpu.time \
  env JAX_PLATFORMS=cpu DATA_DIR=$SIMS bash scripts/ba_all_sims.sh \
    > out/r5/ba_all_sims_cpu.log 2>&1

step "kitti1100 CPU f64"
timed out/r5/kitti1100_cpu_f64.time \
  env JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.dataset_vo_sun \
    $KITTI/kitti1100.csv $KITTI/kitti1100_sun_ref.csv \
    $KITTI/kitti1100_sun_dir_gtsun0.csv --window 2 \
    > out/r5/kitti1100_cpu_f64.log 2>&1
{ JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
    $KITTI/kitti1100_poses.csv $KITTI/kitti1100_gt_poses.csv \
    --label "kitti1100 vo-only cpu-f64"
  JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
    $KITTI/kitti1100_gtsun0_poses.csv $KITTI/kitti1100_gt_poses.csv \
    --label "kitti1100 gtsun0 cpu-f64"; } > out/r5/kitti_ate_cpu.txt 2>&1

step "Phong BA app-level CPU f64 --multistage"
timed out/r5/phong200_cpu_multistage.time \
  env JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.dataset_ba_phong \
    out/phong/phong200.csv --multistage \
    > out/r5/phong200_cpu_multistage.log 2>&1
JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
  $PHONG/phong200_poses.csv $PHONG/phong200_gt_poses.csv \
  --label "phong200 multistage cpu-f64" > out/r5/phong_ate_cpu.txt 2>&1

step "done"
