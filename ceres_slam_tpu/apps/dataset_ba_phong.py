"""Phong-illumination BA driver.

TPU-native counterpart of `/root/reference/tests/dataset_ba_phong.cpp`:

  dataset_ba_phong <input> [--nolight] [--dirlight] [--multistage] [--window N]

Reads the Phong track CSV, runs the full-trajectory VO initial guess with
material/texture initialization, solves geometry + lighting (optionally
with the 3-stage schedule), and writes ``_poses.csv`` / ``_map.csv`` /
``_lights.csv``.
"""

from __future__ import annotations

import sys


def main(argv=None):
    from ceres_slam_tpu.apps.common import base_parser, print_reports, setup_jax

    p = base_parser("dataset_ba_phong: joint geometry + Phong lighting BA")
    p.add_argument("input_file")
    p.add_argument("--nolight", action="store_true", help="geometry only")
    p.add_argument("--dirlight", action="store_true", help="directional light model")
    p.add_argument("--multistage", action="store_true", help="3-stage solve schedule")
    p.add_argument("--window", type=int, default=0, help="0 = full batch")
    # the reference's (commented) solver switch, dataset_ba_phong.cpp:87:
    # SPARSE_NORMAL_CHOLESKY <-> our vertex-Schur elimination
    p.add_argument("--linear-solver", default="auto",
                   choices=["auto", "dense", "schur"],
                   help="auto picks schur past ~1k dof (full batch), "
                        "dense at window scale")
    p.add_argument("--dtype", default="float64",
                   choices=["float64", "float32"],
                   help="solver dtype (float32 = fast TPU mode; the "
                        "shade chain keeps its f64 promotions)")
    args = p.parse_args(argv)
    setup_jax(args.platform, x64=True)

    from ceres_slam_tpu.problems.dataset_phong import DatasetProblemPhong
    from ceres_slam_tpu.solver.lm import SolveConfig

    dataset = DatasetProblemPhong.read_csv(
        args.input_file, directional_light=args.dirlight
    )
    dataset.dtype = args.dtype
    print(
        f"Loaded {dataset.num_states} states, {dataset.num_vertices} vertices, "
        f"{dataset.num_materials} materials, {dataset.state_ids.size} observations",
        file=sys.stderr,
    )
    # Emit the VO initial guess before refinement
    # (tests/dataset_ba_phong.cpp:308-311).
    dataset.compute_initial_guess()
    base = args.input_file.rsplit(".", 1)[0]
    dataset.write_csv(base + "_initial.csv")
    dataset.reset_points()

    summaries = dataset.solve_full(
        window=args.window,
        use_light=not args.nolight,
        multistage=args.multistage,
        # ftol = Ceres' default function_tolerance (1e-6), which the
        # reference never overrides (dataset_ba_phong.cpp:79-91). The
        # framework-default 1e-9 is below f32 cost resolution, so f32
        # runs burned ~3x the iterations grinding a flat plateau
        # (38 vs 8 on the r5 chip record) for identical final cost/ATE.
        config=SolveConfig(max_iters=args.max_iters, ftol=1e-6,
                           record_history=args.report == "full"),
        linear_solver=args.linear_solver,
    )
    if args.report != "none":
        print_reports(summaries, args.report)
    else:
        for i, s in enumerate(summaries):
            print(
                f"stage {i}: cost {float(s.initial_cost):.6e} -> "
                f"{float(s.final_cost):.6e} in {int(s.iterations)} iterations"
            )
    dataset.write_csv(args.input_file)


if __name__ == "__main__":
    main()
