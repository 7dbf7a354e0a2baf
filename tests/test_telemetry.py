"""Solver telemetry tests."""

import jax
import numpy as np

from ceres_slam_tpu.solver import dense, lm
from ceres_slam_tpu.utils import telemetry
from tests.test_solver import make_problem, perturb


def test_history_recording_and_reports():
    problem, gt, key = make_problem(jax.random.PRNGKey(20), noise_px=0.3)
    init = perturb(gt, key)
    step = lm.dense_cholesky_step(lambda s: dense.ba_normal_equations(problem, s))
    sol, summary = jax.jit(
        lambda s: lm.lm_solve(
            s,
            lm.SolveConfig(max_iters=20),
            lambda x: dense.ba_cost(problem, x),
            step,
            lambda x, dx: dense._retract_state(problem, x, dx),
            record_history=True,
        )
    )(init)
    n = int(summary.iterations)
    assert n > 0
    ch = np.asarray(summary.cost_history)
    assert np.all(np.isfinite(ch[:n]))
    assert np.all(np.isnan(ch[n:]))
    # cost history is non-increasing where accepted
    acc = np.asarray(summary.step_accepted)[:n]
    costs = ch[:n]
    assert costs[-1] <= costs[0]
    brief = telemetry.brief_report(summary)
    assert "final cost" in brief
    full = telemetry.full_report(summary)
    assert full.count("\n") >= n


def test_stopwatch():
    sw = telemetry.Stopwatch()
    with sw.section("a"):
        sum(range(1000))
    assert "a" in sw.report()


def test_window_loop_history():
    """record_history through the window solver's block-carrying loops
    (config.record_history -> SolveSummary histories), both strategies."""
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from ceres_slam_tpu.solver import window

    problem, state = ge._build_example(K=4, J=32, n_obs=128,
                                       dtype=jnp.float64, seed=5)
    for strategy in ("lm", "dogleg"):
        cfg = lm.SolveConfig(max_iters=15, record_history=True,
                             nonmonotonic=True)
        sol, summary = window.solve_ba_window(problem, state, cfg,
                                              strategy=strategy)
        n = int(summary.iterations)
        assert n > 0
        ch = np.asarray(summary.cost_history)
        assert np.all(np.isfinite(ch[:n])), strategy
        assert np.all(np.isnan(ch[n:])), strategy
        assert "final cost" in telemetry.brief_report(summary)
        assert telemetry.full_report(summary).count("\n") >= n
