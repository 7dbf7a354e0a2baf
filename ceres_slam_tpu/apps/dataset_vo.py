"""Stereo VO / full-batch BA driver.

TPU-native counterpart of `/root/reference/tests/dataset_vo.cpp`:
``dataset_vo <input_file> [--window N=0]`` — window 0 means full batch
(:119-121). Reads the plain track CSV, runs the VO initial-guess +
windowed-BA pipeline with the first window pose held constant (:62), and
emits ``<base>_poses.csv`` / ``<base>_map.csv``.
"""

from __future__ import annotations

import sys


def main(argv=None):
    from ceres_slam_tpu.apps import common
    from ceres_slam_tpu.apps.common import base_parser, print_reports, setup_jax

    p = base_parser("dataset_vo: stereo VO / full-batch bundle adjustment")
    p.add_argument("input_file")
    p.add_argument("--window", type=int, default=0, help="0 = full batch")
    p.add_argument("--dtype", default="float64", choices=["float64", "float32"],
                   help="solver dtype (float32 = fast TPU mode)")
    # the reference's commented linear-solver switches (dataset_vo.cpp:65-74)
    p.add_argument("--linear-solver", default="auto",
                   choices=["auto", "dense", "window", "pcg"],
                   help="auto selects by problem size: dense at window "
                        "scale, scatter-free Schur to K<=128, PCG beyond")
    args = p.parse_args(argv)
    setup_jax(args.platform, x64=(args.dtype == "float64"))

    from ceres_slam_tpu.problems.dataset import DatasetProblem
    from ceres_slam_tpu.solver.dense import SolveConfig

    dataset = DatasetProblem.read_csv(args.input_file)
    dataset.dtype = args.dtype
    print(
        f"Loaded {dataset.num_states} states, {dataset.num_points} points, "
        f"{dataset.state_ids.size} observations",
        file=sys.stderr,
    )
    # reference minimizer config: LM with nonmonotonic steps
    # (tests/dataset_vo.cpp:69-72 — DOGLEG is commented out there)
    summaries = dataset.solve_full(
        window=args.window,
        # precision- and chain-length-matched tolerances
        # (common.solver_tolerance; window=0 full batch is a single
        # solve with no chain accumulation)
        config=SolveConfig(max_iters=args.max_iters, nonmonotonic=True,
                           ftol=common.solver_tolerance(
                               args.dtype,
                               dataset.num_states if args.window else 0),
                           xtol=common.solver_tolerance(
                               args.dtype,
                               dataset.num_states if args.window else 0),
                           record_history=args.report == "full"),
        linear_solver=args.linear_solver,
    )
    if args.report != "none":
        print_reports(summaries, args.report)
    else:
        for i, s in enumerate(summaries):
            print(
                f"window {i}: cost {float(s.initial_cost):.6e} -> "
                f"{float(s.final_cost):.6e} in {int(s.iterations)} iterations"
            )
    dataset.write_csv(args.input_file)


if __name__ == "__main__":
    main()
