"""Subspace-dogleg trust region (solver/dogleg.py) — the reference
flagship's minimizer (ceres::DOGLEG + SUBSPACE_DOGLEG + nonmonotonic
steps, tests/dataset_vo_sun.cpp:136-152).

Checks: the block H.v product matches the dense Hessian, the subspace
step returns the exact GN step when it fits the radius, and the dogleg
loop reaches the same minimum/covariance as the LM paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from ceres_slam_tpu.solver import dense, dogleg, lm, window


@pytest.fixture(scope="module")
def small_problem():
    return ge._build_example(K=8, J=64, n_obs=320, dtype=jnp.float64, seed=3)


def _dense_system(problem, state):
    H, g = dense.ba_normal_equations(problem, state)
    H, g = dense.apply_gauge_mask(problem, H, g)
    return H, g


def test_block_hvp_matches_dense(small_problem):
    problem, state = small_problem
    layout = window.build_window_layout(problem, 8, 64)
    b = window._xla_blocks(layout, state)
    Hpp_aux, _ = window._masked_aux_blocks(layout.problem, state, jnp.float64)
    Hpp_p, Hll_p = dogleg._pin_blocks(b.Hpp + Hpp_aux, b.Hll)

    H, _ = _dense_system(layout.problem, state)
    rng = np.random.default_rng(0)
    for _ in range(3):
        v = jnp.asarray(rng.normal(size=H.shape[0]))
        hv_ref = np.asarray(H @ v)
        hv = np.asarray(
            dogleg.block_hvp(Hpp_p, Hll_p, b.U_jo, layout.onehot_jok, v)
        )
        scale = np.abs(hv_ref).max()
        np.testing.assert_allclose(hv, hv_ref, atol=1e-9 * scale)


def test_subspace_step_interior_is_gn(small_problem):
    """With a huge radius the subspace minimizer IS the GN step (the GN
    step lies in span{g, dx_gn} and is the unconstrained model minimum)."""
    problem, state = small_problem
    H, g = _dense_system(problem, state)
    dx_gn = jnp.linalg.solve(H, -g)
    dx, pred = dogleg.subspace_step(
        g, dx_gn, lambda v: H @ v, jnp.asarray(1e12, jnp.float64)
    )
    scale = np.abs(np.asarray(dx_gn)).max()
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_gn), atol=1e-8 * scale)
    # predicted decrease of the GN step: -(g.dx + 0.5 dx H dx) = -0.5 g.dx
    np.testing.assert_allclose(
        float(pred), float(-0.5 * g @ dx_gn), rtol=1e-6
    )


def test_subspace_step_respects_radius(small_problem):
    problem, state = small_problem
    H, g = _dense_system(problem, state)
    dx_gn = jnp.linalg.solve(H, -g)
    radius = 0.1 * float(jnp.linalg.norm(dx_gn))
    dx, pred = dogleg.subspace_step(
        g, dx_gn, lambda v: H @ v, jnp.asarray(radius, jnp.float64)
    )
    assert float(jnp.linalg.norm(dx)) <= radius * (1 + 1e-9)
    assert float(pred) > 0.0
    # the boundary step must beat the scaled-Cauchy point on the model
    def model(d):
        return float(g @ d + 0.5 * d @ (H @ d))
    g_unit = g / jnp.linalg.norm(g)
    assert model(dx) <= model(-radius * g_unit) + 1e-12


def test_dogleg_reaches_dense_minimum(small_problem):
    problem, state = small_problem
    config = lm.SolveConfig(max_iters=100, nonmonotonic=True)
    sol_d, sum_d = dense.solve_ba(problem, state, lm.SolveConfig(max_iters=50))
    sol_w, sum_w = window.solve_ba_window(problem, state, config,
                                          strategy="dogleg")
    np.testing.assert_allclose(
        float(sum_w.final_cost), float(sum_d.final_cost), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sol_w.poses), np.asarray(sol_d.poses), atol=1e-5
    )


def test_dogleg_with_covariance_matches_dense(small_problem):
    problem, state = small_problem
    config = lm.SolveConfig(max_iters=100, nonmonotonic=True)
    sol_d, sum_d, cov_d = dense.solve_ba_with_covariance(
        problem, state, jnp.asarray(1), lm.SolveConfig(max_iters=50)
    )
    sol_w, sum_w, cov_w = window.solve_ba_window_with_covariance(
        problem, state, 1, config, strategy="dogleg"
    )
    np.testing.assert_allclose(
        float(sum_w.final_cost), float(sum_d.final_cost), rtol=1e-6
    )
    scale = np.abs(np.asarray(cov_d)).max()
    np.testing.assert_allclose(
        np.asarray(cov_w), np.asarray(cov_d), atol=1e-5 * scale
    )


def test_dogleg_fused_interpret(small_problem):
    """Dogleg over the fused (Pallas interpret) factor pass, f32."""
    problem, state = small_problem
    state32 = dense.BAState(
        poses=state.poses.astype(jnp.float32),
        points=state.points.astype(jnp.float32),
    )
    problem32 = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x,
        problem,
    )
    config = lm.SolveConfig(max_iters=60, nonmonotonic=True)
    sol_d, sum_d = dense.solve_ba(problem, state, lm.SolveConfig(max_iters=50))
    sol_f, sum_f = window.solve_ba_window(
        problem32, state32, config, fused=True, strategy="dogleg"
    )
    np.testing.assert_allclose(
        float(sum_f.final_cost), float(sum_d.final_cost), rtol=1e-3
    )
