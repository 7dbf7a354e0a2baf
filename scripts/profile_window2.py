"""TPU timing: fused (Pallas) window solver vs XLA window step vs PCG."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from ceres_slam_tpu.solver import dense, lm, pcg, window

REPS = 3
ITERS = 100


def run(K, J, N):
    problem, state = ge._build_example(K=K, J=J, n_obs=N, dtype=jnp.float32, seed=7)
    res = {"K": K, "J": J, "N": N}
    cfg = lm.SolveConfig(max_iters=ITERS, ftol=0.0, gtol=0.0)

    def timeit(solve):
        sol, summary = solve()
        its = int(summary.iterations)
        _ = float(summary.final_cost)
        t0 = time.perf_counter()
        for _i in range(REPS):
            sol, summary = solve()
        _ = float(summary.final_cost)
        dt = (time.perf_counter() - t0) / REPS
        return its / dt, its, float(summary.final_cost)

    it_s, its, cost = timeit(lambda: window.solve_ba_window(problem, state, cfg, fused=True))
    res["fused_it_s"] = round(it_s, 1)
    res["fused_iters"] = its
    res["fused_cost"] = round(cost, 2)

    it_s, its, cost = timeit(lambda: window.solve_ba_window(problem, state, cfg, fused=False))
    res["xla_window_it_s"] = round(it_s, 1)

    it_s, its, cost = timeit(lambda: pcg.solve_ba_pcg(problem, state, cfg, max_cg_iters=50, cg_tol=1e-5))
    res["pcg_it_s"] = round(it_s, 1)
    res["pcg_cost"] = round(cost, 2)
    return res


def main():
    print(json.dumps({"platform": jax.devices()[0].platform}), flush=True)
    for K, J, N in [(64, 2048, 16384), (128, 4096, 32768)]:
        print(json.dumps(run(K, J, N)), flush=True)


if __name__ == "__main__":
    main()
