"""Head-to-head at bench.py's exact scale: current PCG fori-loop vs the
fused Pallas window solver vs the XLA window step. Decides what bench.py
ships."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import bench
from ceres_slam_tpu.solver import lm, window

REPS = 3
ITERS = bench.LOOP_ITERS  # 50


def timed(fn, *args):
    out = fn(*args)
    _ = float(out if not isinstance(out, tuple) else out[1].final_cost)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _ = float(out if not isinstance(out, tuple) else out[1].final_cost)
    return (time.perf_counter() - t0) / REPS


def main():
    problem, state = bench.build(jnp.float32)
    res = {"platform": jax.devices()[0].platform,
           "K": bench.K, "J": bench.J, "N": bench.N_OBS, "iters": ITERS}

    # genuinely PCG: the matrix-free Schur-PCG LM loop (scatter-free
    # gather tables on TPU), NOT the window solver bench.py headlines
    from ceres_slam_tpu.solver import pcg

    tables = None
    if jax.devices()[0].platform == "tpu":
        tables = pcg.build_obs_tables(
            problem.stereo.pose_idx, problem.stereo.point_idx,
            bench.K, bench.J)
    run_pcg = bench.pcg_loop_fn(tables)
    res["pcg_it_s"] = round(ITERS / timed(run_pcg, problem, state), 1)

    cfg = lm.SolveConfig(max_iters=ITERS, ftol=0.0, gtol=0.0)
    layout = window.build_window_layout(problem, bench.K, bench.J)

    # Mirror the production dispatch (window.py): Pallas compiled on TPU,
    # interpret mode elsewhere.
    interpret = jax.devices()[0].platform != "tpu"

    def run_fused():
        return window._solve_jit(layout, problem, state, cfg, True, interpret)

    sol, summary = run_fused()
    fused_iters = max(1, int(summary.iterations))
    res["fused_iters"] = fused_iters
    res["fused_final_cost"] = float(summary.final_cost)
    # Rate from the iterations the solver actually ran (it may terminate
    # early on its done conditions), not the configured budget.
    res["fused_it_s"] = round(fused_iters / timed(run_fused), 1)

    def run_xla():
        return window._solve_jit(layout, problem, state, cfg)

    sol, summary = run_xla()
    xla_iters = max(1, int(summary.iterations))
    res["xla_iters"] = xla_iters
    res["xla_final_cost"] = float(summary.final_cost)
    res["xla_it_s"] = round(xla_iters / timed(run_xla), 1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
