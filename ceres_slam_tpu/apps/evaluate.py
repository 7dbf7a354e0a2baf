"""Trajectory evaluation CLI.

The reference judged accuracy by externally comparing emitted
``*_poses.csv`` files against ground-truth files
(scripts/ba_all_iser.sh:33-39); this app performs that comparison
in-framework: ATE (camera-center RMSE) and rotation-error statistics.
"""

from __future__ import annotations


def main(argv=None):
    import argparse

    import numpy as np

    from ceres_slam_tpu.utils import csvio, metrics

    p = argparse.ArgumentParser(description="evaluate a trajectory against GT")
    p.add_argument("est_poses_csv")
    p.add_argument("gt_poses_csv")
    p.add_argument("--align", action="store_true", help="rigid-align before ATE")
    p.add_argument("--label", default="")
    args = p.parse_args(argv)

    est = csvio.read_poses_csv(args.est_poses_csv)
    gt = csvio.read_poses_csv(args.gt_poses_csv)
    n = min(len(est), len(gt))
    est, gt = est[:n], gt[:n]
    ate = metrics.ate_translation(est, gt, align=args.align)
    rot = metrics.rotation_error_deg(est, gt)
    label = f"[{args.label}] " if args.label else ""
    print(
        f"{label}ATE: {ate:.4f} m | rot err mean {np.mean(rot):.3f} deg, "
        f"max {np.max(rot):.3f} deg over {n} poses"
    )


if __name__ == "__main__":
    main()
