#!/bin/bash
# Port of /root/reference/scripts/ba_all_icra.sh + ba_all_iser.sh: KITTI
# drives x sun-prediction methods with per-drive Huber parameters
# (reference ba_all_icra.sh:19-56, ba_all_iser.sh:9-39).
#
# Requires KITTI CSV exports at $DATA_DIR: <drive>.csv, <drive>_sun_ref.csv,
# <drive>_sun_dir_<method>.csv.
set -e
cd "$(dirname "$0")/.."

DATA_DIR=${DATA_DIR:?set DATA_DIR to the KITTI CSV directory}
WINDOW=${WINDOW:-2}
METHODS=${METHODS:-"gt cnn viso2"}

for drive in "$DATA_DIR"/*_sun_ref.csv; do
    base="${drive%_sun_ref.csv}"
    name="$(basename "$base")"
    for method in $METHODS; do
        obs="${base}_sun_dir_${method}.csv"
        [ -f "$obs" ] || continue
        # per-drive Huber override via env: HUBER_<name>=0.1
        huber_var="HUBER_${name}"
        huber="${!huber_var:-0.1}"
        echo "=== $name $method (huber $huber) ==="
        python -m ceres_slam_tpu.apps.dataset_vo_sun \
            "${base}.csv" "${base}_sun_ref.csv" "$obs" \
            --window "$WINDOW" --huber-param "$huber"
    done
done
