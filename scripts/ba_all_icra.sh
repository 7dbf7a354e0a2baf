#!/bin/bash
# Port of /root/reference/scripts/ba_all_icra.sh: the 10 ICRA KITTI raw
# drives x 8 sun-prediction methods with the reference's per-drive Huber
# parameters (reference ba_all_icra.sh:19-73). Window 2, both VO-only and
# VO+sun passes come from the driver itself.
#
# Requires KITTI CSV exports at $DATA_DIR:
#   <date>_drive_<id>.csv, <date>_drive_<id>_sun_ref.csv,
#   <date>_drive_<id>_sun_dir_<method>.csv
set -e
cd "$(dirname "$0")/.."

DATA_DIR=${DATA_DIR:?set DATA_DIR to the KITTI CSV directory}
WINDOW=${WINDOW:-2}

DATES=(2011_10_03 2011_10_03 2011_10_03 2011_09_30 2011_09_30
       2011_09_30 2011_09_30 2011_09_30 2011_09_30 2011_09_30)
DRIVES=(0027 0042 0034 0016 0018 0020 0027 0028 0033 0034)
HUBER_PARAMS=(0.1 0.1 1.0 0.1 1.0 0.1 1.0 1.0 1.0 0.1)
METHODS=(gtsun0 gtsun10 gtsun20 gtsun30 starscnn suncnn lalonde lalondevo)

for ((i = 0; i < ${#DRIVES[@]}; ++i)); do
    base="$DATA_DIR/${DATES[i]}_drive_${DRIVES[i]}"
    [ -f "${base}.csv" ] || continue
    first_method=1
    for method in "${METHODS[@]}"; do
        obs="${base}_sun_dir_${method}.csv"
        [ -f "$obs" ] || continue
        # GT-sun runs use no robust loss; predicted-sun runs use the
        # per-drive Huber parameter (reference :45-56, :107-113).
        case "$method" in
            gtsun*) huber=0 ;;
            *) huber="${HUBER_PARAMS[i]}" ;;
        esac
        # The Lalonde predictions are UTC+1, so they are evaluated against
        # a timezone-shifted ephemeris file (reference :87-93). Staging
        # name: <base>_sun_ref_utc+1.csv (falls back if absent).
        ref="${base}_sun_ref.csv"
        case "$method" in
            lalonde*) [ -f "${base}_sun_ref_utc+1.csv" ] && ref="${base}_sun_ref_utc+1.csv" ;;
        esac
        # The VO-only pass is identical for every method; run it once per
        # drive and pass --sun-only afterwards (reference :96-100).
        extra=()
        [ "$first_method" = 1 ] || extra+=(--sun-only)
        first_method=0
        echo "=== ${DATES[i]}_drive_${DRIVES[i]} $method (huber $huber) ==="
        python -m ceres_slam_tpu.apps.dataset_vo_sun \
            "${base}.csv" "$ref" "$obs" \
            --window "$WINDOW" --huber-param "$huber" "${extra[@]}"
    done
done
