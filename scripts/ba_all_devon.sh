#!/bin/bash
# Port of /root/reference/scripts/ba_all_devon.sh: Devon Island traverses
# c00-c10 x sun sources {sensor, lalonde, lalondevo, starscnn}, Huber 1.345
# (reference :34-58, :86).
#
# Requires the Devon Island CSV exports at $DATA_DIR (not shipped with
# either repo): <c>.csv, <c>_sun_ref.csv, <c>_sun_dir_<method>.csv.
set -e
cd "$(dirname "$0")/.."

DATA_DIR=${DATA_DIR:?set DATA_DIR to the Devon Island CSV directory}
WINDOW=${WINDOW:-2}
HUBER=${HUBER:-1.345}
AZ_THRESH=${AZ_THRESH:-30}
ZEN_THRESH=${ZEN_THRESH:-30}

for c in c00 c01 c02 c03 c04 c05 c06 c07 c08 c09 c10; do
    for method in sensor lalonde lalondevo starscnn; do
        obs="$DATA_DIR/${c}_sun_dir_${method}.csv"
        [ -f "$obs" ] || continue
        echo "=== $c $method ==="
        python -m ceres_slam_tpu.apps.dataset_vo_sun \
            "$DATA_DIR/${c}.csv" "$DATA_DIR/${c}_sun_ref.csv" "$obs" \
            --window "$WINDOW" --huber-param "$HUBER" \
            --az-err-thresh "$AZ_THRESH" --zen-err-thresh "$ZEN_THRESH"
    done
done
