"""Batched flagship harness: the whole `ba_all_sims`-style grid of
INDEPENDENT sliding-window runs solved concurrently on one chip.

The reference harness loops 3 sequences x sun configurations through
`dataset_vo_sun` sequentially (/root/reference/scripts/ba_all_sims.sh:
8-26); every run is independent, and a single chain leaves the chip >95%
idle (latency-bound window serialization). This driver stacks all runs
into ONE vmapped device scan (`problems.batch_scan`): one compile, one
upload, the grid solved in ~the wall time of the longest chain.

    dataset_vo_sun_batch --sims DATA_DIR [--num-states 200]
        [--window 2] [--dtype float32] ...
    dataset_vo_sun_batch --run TRACK,REF_SUN,OBS_SUN,MODE ...

``--sims`` builds the reference grid (per sequence: one VO-only run +
one sun run per sun file) and writes the same outputs the sequential
harness would: ``<track>_poses.csv`` and ``<track>_<method>_poses.csv``.
``--run`` adds an explicit run; MODE is ``vo`` or ``sun``.
"""

from __future__ import annotations

import glob
import os
import sys
import time


def main(argv=None):
    from ceres_slam_tpu.apps import common
    from ceres_slam_tpu.apps.common import base_parser, setup_jax

    p = base_parser("dataset_vo_sun_batch: batched independent VO+sun runs")
    p.add_argument("--sims", default=None, metavar="DATA_DIR",
                   help="build the ba_all_sims grid from this directory")
    p.add_argument("--num-states", type=int, default=200)
    p.add_argument("--sequences", nargs="*",
                   default=["triangle", "square", "penta"])
    p.add_argument("--run", action="append", default=[],
                   metavar="TRACK,REF,OBS,MODE",
                   help="explicit run (MODE: vo|sun); repeatable")
    p.add_argument("--window", type=int, default=2)
    p.add_argument("--huber-param", type=float, default=0.0)
    p.add_argument("--az-err-thresh", type=float, default=1000.0)
    p.add_argument("--zen-err-thresh", type=float, default=1000.0)
    p.add_argument("--dtype", default="float64",
                   choices=["float64", "float32"])
    p.add_argument("--strategy", default="dogleg", choices=["dogleg", "lm"])
    args = p.parse_args(argv)
    setup_jax(args.platform, x64=True)

    import math

    from ceres_slam_tpu.problems import batch_scan
    from ceres_slam_tpu.problems.dataset import DatasetProblemSun
    from ceres_slam_tpu.solver.dense import SolveConfig
    from ceres_slam_tpu.utils import csvio

    az = args.az_err_thresh * math.pi / 180.0
    zen = args.zen_err_thresh * math.pi / 180.0

    # (track, ref, obs, mode) tuples
    triples = []
    if args.sims:
        for seq in args.sequences:
            name = f"{seq}{args.num_states}"
            track = os.path.join(args.sims, f"{name}.csv")
            ref = os.path.join(args.sims, f"{name}_sun_ref.csv")
            if not os.path.exists(track):
                continue
            triples.append((track, ref, None, "vo"))
            for obs in sorted(glob.glob(
                    os.path.join(args.sims, f"{name}_sun_dir_*.csv"))):
                triples.append((track, ref, obs, "sun"))
    for spec in args.run:
        track, ref, obs, mode = spec.split(",")
        triples.append((track, ref, obs, mode))
    if not triples:
        p.error("no runs (use --sims or --run)")

    # one dataset per (track, obs-sun) file pair; VO runs share the
    # dataset of the first sun config (sun obs unused when use_sun=False)
    datasets = {}

    def load(track, ref, obs):
        key = (track, obs)
        if key not in datasets:
            datasets[key] = DatasetProblemSun.read_csv(track, ref, obs)
            datasets[key].dtype = args.dtype
        return datasets[key]

    runs, outs = [], []
    for track, ref, obs, mode in triples:
        if obs is None:  # VO run: any obs file of this track will do
            obs = next((t[2] for t in triples
                        if t[0] == track and t[2]), None)
            if obs is None:
                print(f"WARNING: skipping VO-only run for {track}: no "
                      f"sun-obs file found for it (the CSV reader needs "
                      f"one; <name>_poses.csv will NOT be written)",
                      file=sys.stderr)
                continue
        ds = load(track, ref, obs)
        if mode == "vo":
            runs.append(batch_scan.RunSpec(ds, use_sun=False))
            outs.append(track)
        else:
            runs.append(batch_scan.RunSpec(
                ds, use_sun=True, huber_param=args.huber_param,
                az_err_thresh=az, zen_err_thresh=zen))
            method = obs.rsplit(".", 1)[0].split("_")[-1]
            outs.append(f"{track.rsplit('.', 1)[0]}_{method}.csv")

    # sun-config datasets of one track share the identical RANSAC
    # precompute; run it once per track and copy the caches over
    by_track = {}
    for (track, _), ds in datasets.items():
        by_track.setdefault(track, []).append(ds)
    for group in by_track.values():
        group[0].precompute_pair_alignments()
        for other in group[1:]:
            other._pair_T = group[0]._pair_T
            other._pair_inliers = group[0]._pair_inliers
            other._pair_num_inliers = group[0]._pair_num_inliers

    # Degrade, don't die (reference posture, dataset_problem_sun.cpp:
    # 324-327): a dataset whose scan precompute diverges must not kill
    # the whole grid. Validate each dataset's statics up front (cached —
    # solve_batch reuses them), pull divergent runs out of the batch, and
    # solve those sequentially through solve_sliding_window, which
    # degrades to the host per-window loop internally.
    from ceres_slam_tpu.problems import scan_pipeline

    batch_runs, batch_outs, fallback = [], [], []
    for run, out in zip(runs, outs):
        try:
            scan_pipeline.host_statics_cached(run.ds, args.window)
        except scan_pipeline.ScanReplicationError as e:
            print(f"  scan precompute diverged for {out} ({e}); "
                  f"running it sequentially after the batch",
                  file=sys.stderr)
            fallback.append((run, out))
            continue
        batch_runs.append(run)
        batch_outs.append(out)

    print(f"Batch: {len(batch_runs)} runs ({len(datasets)} datasets), "
          f"window {args.window}"
          + (f" (+{len(fallback)} sequential fallbacks)" if fallback else ""),
          file=sys.stderr)
    # precision- and chain-length-matched (common.solver_tolerance)
    tol = common.solver_tolerance(
        args.dtype, max(r.ds.num_states for r in batch_runs)
        if batch_runs else 0)
    cfg = SolveConfig(max_iters=args.max_iters, nonmonotonic=True,
                      ftol=tol, xtol=tol)
    t0 = time.time()
    if batch_runs:
        results = batch_scan.solve_batch(
            batch_runs, window=args.window, config=cfg,
            strategy=args.strategy, progress=True)
        wall = time.time() - t0
        n_windows = sum(len(r.ok) for r in results)
        print(f"Batch solved: {wall:.1f}s wall, {n_windows} windows total "
              f"({n_windows / wall:.1f} windows/s aggregate)",
              file=sys.stderr)
        for (res, out) in zip(results, batch_outs):
            base = out.rsplit(".", 1)[0]
            csvio.write_poses_csv(base + "_poses.csv", res.poses)
            print(f"wrote {base}_poses.csv", file=sys.stderr)

    for run, out in fallback:
        ds = run.ds
        snap = (ds.poses.copy(), ds.pose_covars.copy(),
                ds.initialized_point.copy(), ds.map_points.copy())
        try:
            ds.solve_sliding_window(
                window=args.window, use_sun=run.use_sun,
                huber_param=run.huber_param,
                az_err_thresh=run.az_err_thresh,
                zen_err_thresh=run.zen_err_thresh,
                config=cfg, strategy=args.strategy, progress=True)
            base = out.rsplit(".", 1)[0]
            csvio.write_poses_csv(base + "_poses.csv", ds.poses)
            print(f"wrote {base}_poses.csv (sequential fallback)",
                  file=sys.stderr)
        finally:
            # runs share dataset objects; leave them as we found them
            ds.poses[:], ds.pose_covars[:] = snap[0], snap[1]
            ds.initialized_point[:], ds.map_points[:] = snap[2], snap[3]


if __name__ == "__main__":
    main()
