"""FactorGraph (ceres::Problem-style builder) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import lie
from ceres_slam_tpu.solver.graph import FactorGraph

CAM = StereoCamera.create(500.0, 500.0, 320.0, 240.0, 0.5)


def build_graph(noise=0.2, seed=0, n_points=30):
    rng = np.random.default_rng(seed)
    T0 = np.asarray(lie.se3_identity())
    T1 = np.asarray(lie.se3_exp(jnp.array([0.1, 0.0, -0.4, 0.02, 0.03, 0.01])))
    pts = rng.uniform([-4, -3, 5], [4, 3, 14], (n_points, 3))

    g = FactorGraph(CAM, default_stereo_var=(noise**2,) * 3)
    k0 = g.add_pose(T0, fixed=True)
    k1 = g.add_pose(np.asarray(lie.se3_retract(jnp.asarray(T1), 0.03 * jnp.ones(6))))
    ids = [g.add_point(p + rng.normal(0, 0.2, 3)) for p in pts]
    for T, k in [(T0, k0), (T1, k1)]:
        p_c = np.asarray(lie.se3_transform_point(jnp.asarray(T), jnp.asarray(pts)))
        uvd = np.asarray(CAM.project(jnp.asarray(p_c))) + rng.normal(0, noise, (n_points, 3))
        for j, o in zip(ids, uvd):
            g.add_stereo_obs(k, j, o)
    return g, T1, pts


@pytest.mark.parametrize("linear_solver", ["dense", "schur", "pcg"])
def test_solve_recovers_pose(linear_solver):
    g, T1, pts = build_graph()
    sol, summary = g.solve(linear_solver=linear_solver)
    err = lie.se3_log(
        lie.se3_compose(jnp.asarray(g.pose(1)), lie.se3_inverse(jnp.asarray(T1)))
    )
    assert float(jnp.max(jnp.abs(err))) < 0.01
    assert float(summary.final_cost) < float(summary.initial_cost)


def test_covariance_shrinks_with_more_observations():
    g1, *_ = build_graph(n_points=10, seed=1)
    g1.solve()
    c1 = np.trace(g1.covariance(1))
    g2, *_ = build_graph(n_points=60, seed=1)
    g2.solve()
    c2 = np.trace(g2.covariance(1))
    assert c2 < c1


def test_prior_and_constant_api():
    g, T1, pts = build_graph()
    g.set_pose_constant(0, False)
    g.add_pose_prior(0, g.pose(0), covariance=1e-8 * np.eye(6))
    sol, _ = g.solve()
    # prior holds pose 0 near identity
    err0 = lie.se3_log(jnp.asarray(g.pose(0)))
    assert float(jnp.max(jnp.abs(err0))) < 1e-3
