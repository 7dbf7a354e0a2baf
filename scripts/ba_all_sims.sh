#!/bin/bash
# Port of /root/reference/scripts/ba_all_sims.sh: sim sequences
# triangle200/square200/penta200 x ground-truth-sun noise levels
# {0,10,20,30} deg, window 2 (reference :6-26).
#
# The reference assumes pre-made data files; this harness generates them
# first (the repo ships no data) and evaluates ATE against ground truth.
set -e
cd "$(dirname "$0")/.."

DATA_DIR=${DATA_DIR:-out/sims}
WINDOW=${WINDOW:-2}
NUM_STATES=${NUM_STATES:-200}

# BATCH=1: the whole grid (3 sequences x {VO + 4 sun configs} = 15
# independent chains) as ONE vmapped device scan — one compile, one
# upload, all runs in ~the wall time of the longest chain (the chip is
# >95% idle on a single latency-bound chain). Identical outputs to the
# sequential loop below (tests/test_scan_pipeline.py batch tests).
if [ -n "$BATCH" ]; then
    for seq in triangle square penta; do
        name="${seq}${NUM_STATES}"
        if [ ! -f "$DATA_DIR/${name}.csv" ]; then
            python -m ceres_slam_tpu.apps.make_sim "$DATA_DIR" --kind "$seq" \
                --num-states "$NUM_STATES" --sun-noise 0 10 20 30
        fi
    done
    python -m ceres_slam_tpu.apps.dataset_vo_sun_batch \
        --sims "$DATA_DIR" --num-states "$NUM_STATES" --window "$WINDOW" \
        ${BATCH_DTYPE:+--dtype "$BATCH_DTYPE"}
    for seq in triangle square penta; do
        name="${seq}${NUM_STATES}"
        for noise in 0 10 20 30; do
            python -m ceres_slam_tpu.apps.evaluate \
                "$DATA_DIR/${name}_gtsun${noise}_poses.csv" \
                "$DATA_DIR/${name}_gt_poses.csv" \
                --label "$name gtsun$noise"
        done
        python -m ceres_slam_tpu.apps.evaluate \
            "$DATA_DIR/${name}_poses.csv" \
            "$DATA_DIR/${name}_gt_poses.csv" \
            --label "$name vo-only"
    done
    exit 0
fi

for seq in triangle square penta; do
    name="${seq}${NUM_STATES}"
    if [ ! -f "$DATA_DIR/${name}.csv" ]; then
        python -m ceres_slam_tpu.apps.make_sim "$DATA_DIR" --kind "$seq" \
            --num-states "$NUM_STATES" --sun-noise 0 10 20 30
    fi
    first=1
    for noise in 0 10 20 30; do
        echo "=== $name gtsun$noise ==="
        # VO-only pass once per sequence; --sun-only after, like the
        # reference (ba_all_sims.sh:46-50)
        extra=""
        if [ "$first" = 1 ]; then first=0; else extra="--sun-only"; fi
        python -m ceres_slam_tpu.apps.dataset_vo_sun \
            "$DATA_DIR/${name}.csv" \
            "$DATA_DIR/${name}_sun_ref.csv" \
            "$DATA_DIR/${name}_sun_dir_gtsun${noise}.csv" \
            --window "$WINDOW" $extra
        python -m ceres_slam_tpu.apps.evaluate \
            "$DATA_DIR/${name}_gtsun${noise}_poses.csv" \
            "$DATA_DIR/${name}_gt_poses.csv" \
            --label "$name gtsun$noise"
    done
    python -m ceres_slam_tpu.apps.evaluate \
        "$DATA_DIR/${name}_poses.csv" \
        "$DATA_DIR/${name}_gt_poses.csv" \
        --label "$name vo-only"
done
