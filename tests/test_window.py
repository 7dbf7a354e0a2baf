"""Scatter-free explicit-Schur window solver vs the reference paths.

Landmark elimination is algebraic, so window_step must produce the same
damped step as schur.schur_step (dense-W) and solving must reach the same
minimum as dense.solve_ba.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from ceres_slam_tpu.solver import dense, lm, pcg, schur, window


@pytest.fixture(scope="module")
def small_problem():
    return ge._build_example(K=8, J=64, n_obs=320, dtype=jnp.float64, seed=3)


def test_layout_preserves_cost(small_problem):
    problem, state = small_problem
    layout = window.build_window_layout(problem, 8, 64)
    c0 = dense.ba_cost(problem, state)
    c1 = dense.ba_cost(layout.problem, state)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), rtol=1e-12)


def test_step_matches_schur(small_problem):
    problem, state = small_problem
    layout = window.build_window_layout(problem, 8, 64)
    lam = jnp.asarray(1e-4, jnp.float64)

    blocks = dense.ba_block_normal_equations(problem, state)
    dx_ref, gn_ref, pred_ref = schur.schur_step(problem, blocks, lam)
    dx, gn, pred = window.window_step(layout, state, lam)

    scale = np.max(np.abs(np.asarray(dx_ref)))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-9 * scale)
    np.testing.assert_allclose(float(gn), float(gn_ref), rtol=1e-10)
    np.testing.assert_allclose(float(pred), float(pred_ref), rtol=1e-8)


def test_step_with_masks(small_problem):
    """Fixed poses and invalid points must be handled identically."""
    problem, state = small_problem
    fixed = jnp.zeros(8, bool).at[0].set(True)
    pv = jnp.ones(64, bool).at[5].set(False).at[63].set(False)
    problem = problem._replace(fixed_pose_mask=fixed, point_valid=pv)
    layout = window.build_window_layout(problem, 8, 64)
    lam = jnp.asarray(1e-3, jnp.float64)

    blocks = dense.ba_block_normal_equations(problem, state)
    dx_ref, _, _ = schur.schur_step(problem, blocks, lam)
    dx, _, _ = window.window_step(layout, state, lam)
    scale = np.max(np.abs(np.asarray(dx_ref)))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-9 * scale)
    # fixed pose and invalid points get zero steps
    assert np.allclose(np.asarray(dx[:6]), 0.0)


def test_solve_reaches_dense_minimum(small_problem):
    problem, state = small_problem
    config = lm.SolveConfig(max_iters=50)
    sol_d, sum_d = dense.solve_ba(problem, state, config)
    sol_w, sum_w = window.solve_ba_window(problem, state, config)
    np.testing.assert_allclose(
        float(sum_w.final_cost), float(sum_d.final_cost), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sol_w.poses), np.asarray(sol_d.poses), atol=1e-5
    )


def test_fused_blocks_match_xla(small_problem):
    """Pallas fused factor pass (interpret mode) == XLA block assembly."""
    problem, state = small_problem
    state32 = dense.BAState(
        poses=state.poses.astype(jnp.float32), points=state.points.astype(jnp.float32)
    )
    problem32 = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x,
        problem,
    )
    layout = window.build_window_layout(problem32, 8, 64)
    b = window._fused_blocks(layout, state32, interpret=True)

    blocks = dense.ba_block_normal_equations(problem32, state32)

    def close(a, ref, atol_scale):  # f32 accumulation-order noise scales
        a, ref = np.asarray(a), np.asarray(ref)  # with the summand magnitude
        np.testing.assert_allclose(a, ref, atol=atol_scale * np.abs(ref).max())

    close(b.Hpp, blocks.Hpp - dense.aux_pose_blocks(problem32, state32)[0], 1e-5)
    close(b.Hll, blocks.Hll, 1e-5)
    # gradients cancel (residuals are zero-mean noise) => looser tolerance
    close(b.gl, blocks.gl, 5e-3)
    close(b.gp, blocks.gp - dense.aux_pose_blocks(problem32, state32)[1], 5e-3)
    # stereo cost from the kernel == ba_cost minus aux
    c_full = dense.ba_cost(problem32, state32)
    c_aux = dense.ba_cost_aux(problem32, state32)
    np.testing.assert_allclose(
        float(b.stereo_cost), float(c_full - c_aux), rtol=1e-4
    )


def test_fused_solve_matches_dense(small_problem):
    """Fused (Pallas interpret) LM loop reaches the dense minimum (f32)."""
    problem, state = small_problem
    state32 = dense.BAState(
        poses=state.poses.astype(jnp.float32), points=state.points.astype(jnp.float32)
    )
    problem32 = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x,
        problem,
    )
    config = lm.SolveConfig(max_iters=40)
    sol_d, sum_d = dense.solve_ba(problem, state, config)  # f64 reference
    sol_f, sum_f = window.solve_ba_window(problem32, state32, config, fused=True)
    np.testing.assert_allclose(
        float(sum_f.final_cost), float(sum_d.final_cost), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(sol_f.poses), np.asarray(sol_d.poses), atol=5e-3
    )


def test_window_covariance_matches_dense(small_problem):
    """Schur-reduced pose marginal == dense H^{-1} block
    (ceres::Covariance::GetCovarianceBlockInTangentSpace parity)."""
    problem, state = small_problem
    layout = window.build_window_layout(problem, 8, 64)
    for k in (0, 1, 7):
        cov_ref = dense.pose_tangent_covariance(problem, state, jnp.asarray(k))
        cov = window.window_marginal_covariance(layout, state, jnp.asarray(k))
        scale = np.abs(np.asarray(cov_ref)).max()
        np.testing.assert_allclose(
            np.asarray(cov), np.asarray(cov_ref), atol=1e-9 * scale
        )


def test_solve_with_covariance_matches_dense(small_problem):
    """solve_ba_window_with_covariance == dense.solve_ba_with_covariance
    (same minimum, same extracted prior covariance)."""
    problem, state = small_problem
    config = lm.SolveConfig(max_iters=50)
    sol_d, sum_d, cov_d = dense.solve_ba_with_covariance(
        problem, state, jnp.asarray(1), config
    )
    sol_w, sum_w, cov_w = window.solve_ba_window_with_covariance(
        problem, state, 1, config
    )
    np.testing.assert_allclose(
        float(sum_w.final_cost), float(sum_d.final_cost), rtol=1e-6
    )
    scale = np.abs(np.asarray(cov_d)).max()
    np.testing.assert_allclose(
        np.asarray(cov_w), np.asarray(cov_d), atol=1e-6 * scale
    )


def test_fused_solve_with_covariance(small_problem):
    """Fused (Pallas interpret) solve+cov agrees with the f64 dense path."""
    problem, state = small_problem
    state32 = dense.BAState(
        poses=state.poses.astype(jnp.float32), points=state.points.astype(jnp.float32)
    )
    problem32 = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x,
        problem,
    )
    config = lm.SolveConfig(max_iters=40)
    _, _, cov_d = dense.solve_ba_with_covariance(
        problem, state, jnp.asarray(1), config
    )
    sol_f, sum_f, cov_f = window.solve_ba_window_with_covariance(
        problem32, state32, 1, config, fused=True
    )
    assert np.all(np.isfinite(np.asarray(cov_f)))
    scale = np.abs(np.asarray(cov_d)).max()
    np.testing.assert_allclose(
        np.asarray(cov_f), np.asarray(cov_d), atol=2e-3 * scale
    )


def test_step_matches_pcg(small_problem):
    problem, state = small_problem
    layout = window.build_window_layout(problem, 8, 64)
    lam = jnp.asarray(1e-4, jnp.float64)
    dx_ref, _, _ = pcg.pcg_step(problem, state, lam, max_cg_iters=2000, cg_tol=1e-14)
    dx, _, _ = window.window_step(layout, state, lam)
    scale = np.max(np.abs(np.asarray(dx_ref)))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-8 * scale)
