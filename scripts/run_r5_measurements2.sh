#!/bin/bash
# Round-5 measurement batch #2: re-captures invalidated by (a) the
# matvec-kernel policy fix (TPU sweep banded rows), (b) CPU-sweep
# contamination by concurrent diagnostics, (c) the dense_stereo x64
# kernel fix, (d) the chain-length-aware f32 tolerance (kitti). Same
# rules as batch #1: strictly sequential, clean-exit TPU processes.
cd "$(dirname "$0")/.."
mkdir -p out/r5
LOG=out/r5/batch2.log
step() { echo "=== $1 ($(date +%T)) ===" | tee -a "$LOG"; }
timed() { local out="$1"; shift; local t0=$SECONDS; "$@"; local rc=$?;
          echo "real $((SECONDS - t0)) s" > "$out"; return $rc; }

SIMS=out/sims
KITTI=out/kitti

step "scale sweep TPU v2 (post kernel-policy fix)"
python scripts/bench_xl.py --segsum > out/r5/bench_xl_tpu_v2.jsonl \
  2> out/r5/bench_xl_tpu_v2.err

step "kitti1100 flagship TPU f32 v2 (chain-length-aware tolerance)"
timed out/r5/kitti1100_tpu_v2.time \
  python -m ceres_slam_tpu.apps.dataset_vo_sun \
    $KITTI/kitti1100.csv $KITTI/kitti1100_sun_ref.csv \
    $KITTI/kitti1100_sun_dir_gtsun0.csv --window 2 --dtype float32 \
    > out/r5/kitti1100_tpu_v2.log 2>&1

step "KITTI ATE v2 (TPU f32)"
{ JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
    $KITTI/kitti1100_poses.csv $KITTI/kitti1100_gt_poses.csv \
    --label "kitti1100 vo-only tpu-f32 v2"
  JAX_PLATFORMS=cpu python -m ceres_slam_tpu.apps.evaluate \
    $KITTI/kitti1100_gtsun0_poses.csv $KITTI/kitti1100_gt_poses.csv \
    --label "kitti1100 gtsun0 tpu-f32 v2"; } > out/r5/kitti_ate_tpu_v2.txt 2>&1

step "dense stereo end-to-end TPU v2 (post x64 kernel fix)"
timed out/r5/dense_stereo_tpu_v2.time \
  python -m ceres_slam_tpu.apps.dense_stereo --height 240 --width 320 \
    > out/r5/dense_stereo_tpu_v2.log 2>&1

step "XXL phase profile TPU (committed attribution artifact)"
python scripts/profile_xxl.py > out/r5/profile_xxl_tpu_v2.json \
  2> out/r5/profile_xxl_tpu_v2.err

step "scale sweep CPU v2 (clean; nothing else may run)"
JAX_PLATFORMS=cpu python scripts/bench_xl.py \
  > out/r5/bench_xl_cpu_v2.jsonl 2> out/r5/bench_xl_cpu_v2.err

step "done"
