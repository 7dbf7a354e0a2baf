"""Split fixed-per-call vs per-iteration cost of the fused window solver:
time the same problem at several max_iters budgets (ftol/gtol 0 so the
loop runs its budget unless a hard done-condition fires)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import bench
from ceres_slam_tpu.solver import lm, window


def main():
    problem, state = bench.build(jnp.float32)
    layout = window.build_window_layout(problem, bench.K, bench.J)
    interpret = jax.devices()[0].platform != "tpu"
    print("platform:", jax.devices()[0].platform)
    for iters in (1, 5, 10, 25, 50):
        cfg = lm.SolveConfig(max_iters=iters, ftol=0.0, gtol=0.0)
        sol, summary = window._solve_jit(layout, problem, state, cfg, True,
                                         interpret)
        ran = int(summary.iterations)
        _ = float(summary.final_cost)
        t0 = time.perf_counter()
        for _i in range(3):
            sol, summary = window._solve_jit(layout, problem, state, cfg,
                                             True, interpret)
        _ = float(summary.final_cost)
        dt = (time.perf_counter() - t0) / 3
        print(f"budget {iters:3d}: ran {ran:3d} iters, {dt*1e3:8.1f} ms/call,"
              f" {ran/dt:8.1f} it/s, final {float(summary.final_cost):.6g}")


if __name__ == "__main__":
    main()
