"""Sun-aided sliding-window VO driver (the flagship workload).

TPU-native counterpart of `/root/reference/tests/dataset_vo_sun.cpp`:

  dataset_vo_sun <track_file> <ref_sun_file> <obs_sun_file>
      [--window (2)] [--huber-param (0)]
      [--az-err-thresh (1000)] [--zen-err-thresh (1000)] [--sun-only]

Two passes (tests/dataset_vo_sun.cpp:265-312): VO-only (unless
--sun-only), emitting the VO trajectory named after the track file, then
VO+sun, emitting ``<track>_<sunmethod>_poses.csv`` where the sun method is
the last '_'-token of the obs-sun file stem (:314-321). Thresholds are
accepted in degrees and converted to radians (:228-239).
"""

from __future__ import annotations

import math
import os
import sys
import time as _time

_T_IMPORT = _time.perf_counter()


def _phase(label):
    if os.environ.get("CSTPU_TIMING"):
        print(f"  [t+{_time.perf_counter() - _T_IMPORT:6.1f}s] {label}",
              file=sys.stderr, flush=True)


def main(argv=None):
    from ceres_slam_tpu.apps import common
    from ceres_slam_tpu.apps.common import base_parser, print_reports, setup_jax

    p = base_parser("dataset_vo_sun: sun-aided sliding-window stereo VO")
    p.add_argument("track_file")
    p.add_argument("ref_sun_file")
    p.add_argument("obs_sun_file")
    p.add_argument("--window", type=int, default=2)
    p.add_argument("--huber-param", type=float, default=0.0)
    p.add_argument("--az-err-thresh", type=float, default=1000.0, help="degrees")
    p.add_argument("--zen-err-thresh", type=float, default=1000.0, help="degrees")
    p.add_argument("--sun-only", action="store_true")
    p.add_argument("--ftol", type=float, default=None,
                   help="override ftol/xtol (default: precision- and "
                        "chain-length-matched, common.solver_tolerance)")
    p.add_argument("--dtype", default="float64", choices=["float64", "float32"],
                   help="solver dtype (float32 = fast TPU mode)")
    p.add_argument("--strategy", default="dogleg", choices=["dogleg", "lm"],
                   help="trust-region strategy (reference: DOGLEG/"
                        "SUBSPACE_DOGLEG, tests/dataset_vo_sun.cpp:142-143)")
    p.add_argument("--checkpoint", default=None, metavar="PATH",
                   help="checkpoint-restart: persist the pass state every "
                        "--checkpoint-every windows (per-pass files "
                        "PATH.vo / PATH.sun); an interrupted run resumes "
                        "from the last checkpoint (capability the "
                        "reference lacks, SURVEY.md §5.4)")
    p.add_argument("--checkpoint-every", type=int, default=25,
                   metavar="N", help="windows between checkpoints")
    args = p.parse_args(argv)
    # x64 stays enabled even in f32 mode: the state/factor path runs in
    # f32 (fast TPU mode) while the window solver promotes only the tiny
    # Schur reduce/factorize/covariance chain to f64
    # (window._auto_schur_dtype) — the part the 1e-12 prior conditioning
    # (dataset_problem_sun.cpp:80) actually needs.
    _phase("argparse done")
    setup_jax(args.platform, x64=True)
    _phase("jax configured")

    from ceres_slam_tpu.problems.dataset import DatasetProblemSun
    from ceres_slam_tpu.solver.dense import SolveConfig

    az_thresh = args.az_err_thresh * math.pi / 180.0
    zen_thresh = args.zen_err_thresh * math.pi / 180.0
    dataset = DatasetProblemSun.read_csv(
        args.track_file, args.ref_sun_file, args.obs_sun_file
    )
    dataset.dtype = args.dtype
    _phase("dataset loaded")
    # use_nonmonotonic_steps = true (tests/dataset_vo_sun.cpp:141).
    # Tolerances are precision- AND chain-length-matched (see
    # common.solver_tolerance: long f32 chains accumulate per-window
    # early-stop plateaus into meters — kitti1100 r5 post-mortem).
    tol = args.ftol if args.ftol else common.solver_tolerance(
        args.dtype, dataset.num_states)
    config = SolveConfig(max_iters=args.max_iters, nonmonotonic=True,
                         ftol=tol, xtol=tol,
                         record_history=args.report == "full")
    print(
        f"Loaded {dataset.num_states} states, {dataset.num_points} points, "
        f"{dataset.state_ids.size} stereo obs, "
        f"{int(dataset.state_has_sun_obs.sum())} sun obs",
        file=sys.stderr,
    )

    def ckpt(tag):
        return f"{args.checkpoint}.{tag}" if args.checkpoint else None

    # Both passes are INDEPENDENT problems (each recomputes every pose
    # from the RANSAC chain off pose 0 and restarts the covariance chain
    # at the 1e-12 prior; pass 2 reads nothing pass 1 wrote) — so by
    # default they run CONCURRENTLY as one 2-run batched scan
    # (problems/batch_scan): one compile, one upload, ~half the device
    # time. Outputs are written in the reference's order and are
    # identical to the sequential path (tests/test_scan_pipeline.py
    # batch tests). Checkpointing or --sun-only falls back to the
    # sequential passes.
    if not args.sun_only and not args.checkpoint:
        from ceres_slam_tpu.problems import batch_scan, scan_pipeline
        from ceres_slam_tpu.utils import csvio

        runs = [
            batch_scan.RunSpec(dataset, use_sun=False),
            batch_scan.RunSpec(dataset, use_sun=True,
                               huber_param=args.huber_param,
                               az_err_thresh=az_thresh,
                               zen_err_thresh=zen_thresh),
        ]
        print("Computing VO without / with sun measurements (fused "
              "2-pass batch)", file=sys.stderr)
        try:
            results = batch_scan.solve_batch(
                runs, window=args.window, config=config,
                strategy=args.strategy, progress=True)
        except scan_pipeline.ScanReplicationError as e:
            print(f"  batch precompute diverged ({e}); sequential passes",
                  file=sys.stderr)
            results = None
        if results is not None:
            track_base = args.track_file.rsplit(".", 1)[0]
            csvio.write_poses_csv(track_base + "_poses.csv",
                                  results[0].poses)
            print_reports(results[0].summaries, args.report)
            print_reports(results[1].summaries, args.report)
            obs_base = args.obs_sun_file.rsplit(".", 1)[0]
            sun_method = obs_base.split("_")[-1]
            csvio.write_poses_csv(f"{track_base}_{sun_method}_poses.csv",
                                  results[1].poses)
            _phase("outputs written")
            return

    if not args.sun_only:
        print("Computing VO without sun measurements", file=sys.stderr)
        summaries = dataset.solve_sliding_window(
            window=args.window, use_sun=False, config=config, progress=True,
            strategy=args.strategy, checkpoint=ckpt("vo"),
            checkpoint_every=args.checkpoint_every,
        )
        print_reports(summaries, args.report)
        dataset.write_csv(args.track_file)

    print("Computing VO with sun measurements", file=sys.stderr)
    summaries = dataset.solve_sliding_window(
        window=args.window,
        use_sun=True,
        huber_param=args.huber_param,
        az_err_thresh=az_thresh,
        zen_err_thresh=zen_thresh,
        config=config,
        progress=True,
        strategy=args.strategy,
        checkpoint=ckpt("sun"),
        checkpoint_every=args.checkpoint_every,
    )
    print_reports(summaries, args.report)

    # Output name: <track>_<last '_'-token of obs sun file> (:314-321)
    track_base = args.track_file.rsplit(".", 1)[0]
    obs_base = args.obs_sun_file.rsplit(".", 1)[0]
    sun_method = obs_base.split("_")[-1]
    dataset.write_csv(f"{track_base}_{sun_method}.csv")


if __name__ == "__main__":
    main()
