#!/bin/bash
# Port of /root/reference/scripts/ba_all_iser.sh: the 5 ISER KITTI raw
# drives, each run over the viso2 / viso2_newprior / viso2_cnn / viso2_gt
# track variants (reference ba_all_iser.sh:9-39). Window 2.
#
# Requires KITTI CSV exports at $DATA_DIR:
#   <drive>_viso2[<variant>].csv (+ matching _sun_ref/_sun_dir files for
#   the sun-aided variants).
set -e
cd "$(dirname "$0")/.."

DATA_DIR=${DATA_DIR:?set DATA_DIR to the KITTI CSV directory}
WINDOW=${WINDOW:-2}

DRIVES=(2011_09_26_drive_0019_sync 2011_09_26_drive_0039_sync
        2011_09_30_drive_0018_sync 2011_09_30_drive_0020_sync
        2011_10_03_drive_0027_sync)

for drive in "${DRIVES[@]}"; do
    for variant in "" _newprior _cnn _gt; do
        track="$DATA_DIR/${drive}_viso2${variant}.csv"
        [ -f "$track" ] || continue
        base="${track%.csv}"
        echo "=== $drive viso2${variant} ==="
        if [ -f "${base}_sun_ref.csv" ] && [ -f "${base}_sun_dir.csv" ]; then
            python -m ceres_slam_tpu.apps.dataset_vo_sun \
                "$track" "${base}_sun_ref.csv" "${base}_sun_dir.csv" \
                --window "$WINDOW"
        else
            python -m ceres_slam_tpu.apps.dataset_vo "$track" --window "$WINDOW"
        fi
    done
done
