"""One-off profiling: where does the BA LM iteration spend time on TPU?

Compares at bench scale (K=64,J=2048,N=16k) and XL (K=256,J=8192,N=65k):
  - full LM iteration (pcg_step + retract + cost), segment-sum matvec
  - full LM iteration with gather-table matvec
  - isolated: build_obs_blocks only
  - isolated: 50 chained matvecs (segment vs gather)

All timing forces a scalar fetch; loops fused into one jit (axon relay).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from ceres_slam_tpu.solver import dense, pcg

REPS = 3


def timeit(fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out)) if hasattr(out, "dtype") else float(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _i in range(REPS):
        out = fn(*args)
    s = float(jnp.sum(out)) if hasattr(out, "dtype") else float(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / REPS, s


def profile(K, J, N):
    problem, state = ge._build_example(K=K, J=J, n_obs=N, dtype=jnp.float32, seed=7)
    lam = jnp.asarray(1e-4, jnp.float32)
    tables = pcg.build_obs_tables(
        np.asarray(problem.stereo.pose_idx), np.asarray(problem.stereo.point_idx), K, J
    )
    res = {"K": K, "J": J, "N": N,
           "table_shapes": [list(tables.by_point.shape), list(tables.by_pose.shape)]}

    LOOP = 20

    @jax.jit
    def lm_seg(problem, state):
        def body(_, carry):
            state, cost = carry
            dx, _, _ = pcg.pcg_step(problem, state, lam, max_cg_iters=50, cg_tol=1e-5)
            ns = dense._retract_state(problem, state, dx)
            return ns, dense.ba_cost(problem, ns)
        return jax.lax.fori_loop(0, LOOP, body, (state, dense.ba_cost(problem, state)))[1]

    @jax.jit
    def lm_gather(problem, state, tables):
        def body(_, carry):
            state, cost = carry
            dx, _, _ = pcg.pcg_step(problem, state, lam, max_cg_iters=50, cg_tol=1e-5,
                                    tables=tables)
            ns = dense._retract_state(problem, state, dx)
            return ns, dense.ba_cost(problem, ns)
        return jax.lax.fori_loop(0, LOOP, body, (state, dense.ba_cost(problem, state)))[1]

    @jax.jit
    def blocks_only(problem, state):
        def body(_, acc):
            b = pcg.build_obs_blocks(problem, state, lam)
            return acc + jnp.sum(b.gp)
        return jax.lax.fori_loop(0, LOOP, body, jnp.asarray(0.0, jnp.float32))

    b0 = pcg.build_obs_blocks(problem, state, lam)

    @jax.jit
    def mv_seg(b, v):
        def body(_, v):
            v = pcg.schur_matvec(b, v)
            return v / jnp.maximum(jnp.max(jnp.abs(v)), 1e-30)
        return jax.lax.fori_loop(0, 50 * LOOP, body, v)

    @jax.jit
    def mv_gather(b, t, v):
        def body(_, v):
            v = pcg.schur_matvec_gather(b, t, v)
            return v / jnp.maximum(jnp.max(jnp.abs(v)), 1e-30)
        return jax.lax.fori_loop(0, 50 * LOOP, body, v)

    v0 = jnp.ones((K, 6), jnp.float32)
    t, _ = timeit(lm_seg, problem, state)
    res["lm_seg_it_s"] = round(LOOP / t, 2)
    t, _ = timeit(lm_gather, problem, state, tables)
    res["lm_gather_it_s"] = round(LOOP / t, 2)
    t, _ = timeit(blocks_only, problem, state)
    res["build_blocks_ms"] = round(1e3 * t / LOOP, 3)
    t, _ = timeit(mv_seg, b0, v0)
    res["matvec_seg_us"] = round(1e6 * t / (50 * LOOP), 1)
    t, _ = timeit(mv_gather, b0, tables, v0)
    res["matvec_gather_us"] = round(1e6 * t / (50 * LOOP), 1)
    return res


def main():
    print(json.dumps({"platform": jax.devices()[0].platform}))
    for K, J, N in [(64, 2048, 16384), (256, 8192, 65536)]:
        print(json.dumps(profile(K, J, N)), flush=True)


if __name__ == "__main__":
    main()
