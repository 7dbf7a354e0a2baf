from ceres_slam_tpu.solver.lm import SolveConfig, SolveSummary, lm_solve  # noqa: F401
