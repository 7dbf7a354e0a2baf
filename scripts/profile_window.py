"""Honest TPU timing: window solver LM iteration vs existing PCG path."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from ceres_slam_tpu.solver import dense, pcg, window

REPS = 3
LOOP = 100


def timeit(fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / (REPS * LOOP)


def run(K, J, N):
    problem, state = ge._build_example(K=K, J=J, n_obs=N, dtype=jnp.float32, seed=7)
    lam = jnp.asarray(1e-4, jnp.float32)
    layout = window.build_window_layout(problem, K, J)
    res = {"K": K, "J": J, "N": N, "O": layout.O}

    def lm_loop(step_fn, cost_problem):
        @jax.jit
        def runl(state):
            def body(_, carry):
                s, cost = carry
                dx, _, _ = step_fn(s, lam)
                ns = dense._retract_state(cost_problem, s, dx)
                return ns, dense.ba_cost(cost_problem, ns)
            return jax.lax.fori_loop(
                0, LOOP, body, (state, dense.ba_cost(cost_problem, state)))[1]
        return runl

    @jax.jit
    def empty(state):
        def body(_, carry):
            s, cost = carry
            return s, cost * (1.0 + 1e-12)
        return jax.lax.fori_loop(0, LOOP, body, (state, jnp.asarray(0.0, jnp.float32)))[1]

    base = timeit(empty, state)
    res["empty_us"] = round(1e6 * base, 1)

    t = timeit(lm_loop(lambda s, l: window.window_step(layout, s, l), problem), state)
    res["window_us"] = round(1e6 * t, 1)
    res["window_it_s"] = round(1.0 / t, 1)

    t = timeit(lm_loop(
        lambda s, l: pcg.pcg_step(problem, s, l, max_cg_iters=50, cg_tol=1e-5),
        problem), state)
    res["pcg_us"] = round(1e6 * t, 1)
    res["pcg_it_s"] = round(1.0 / t, 1)
    return res


def main():
    print(json.dumps({"platform": jax.devices()[0].platform}), flush=True)
    for K, J, N in [(64, 2048, 16384), (128, 4096, 32768), (256, 8192, 65536)]:
        print(json.dumps(run(K, J, N)), flush=True)


if __name__ == "__main__":
    main()
