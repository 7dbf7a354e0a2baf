"""Pose-graph solver + blowup covariance-propagation validation."""

import jax
import jax.numpy as jnp
import numpy as np

from ceres_slam_tpu.ops import factors, lie
from ceres_slam_tpu.solver import lm, pose_graph


def test_relative_pose_chain_recovers_trajectory():
    # 5 poses, exact odometry measurements + prior on pose 0.
    K = 5
    xi_step = jnp.array([0.1, 0.02, -0.3, 0.02, 0.05, 0.01])
    gt = [lie.se3_identity()]
    for _ in range(K - 1):
        gt.append(lie.se3_compose(lie.se3_exp(xi_step), gt[-1]))
    gt = jnp.stack(gt)
    T_meas = lie.se3_exp(xi_step)  # T_2_1 for every consecutive pair

    rel = pose_graph.RelPoseFactors(
        idx1=jnp.arange(K - 1, dtype=jnp.int32),
        idx2=jnp.arange(1, K, dtype=jnp.int32),
        T_ref=jnp.tile(T_meas, (K - 1, 1)),
        stiffness=jnp.broadcast_to(10.0 * jnp.eye(6), (K - 1, 6, 6)),
        valid=jnp.ones(K - 1, bool),
    )
    priors = pose_graph.PriorFactors(
        idx=jnp.zeros(1, jnp.int32),
        T_ref=gt[:1],
        stiffness=1e3 * jnp.eye(6)[None],
        valid=jnp.ones(1, bool),
    )
    problem = pose_graph.PoseGraphProblem(
        rel=rel, priors=priors, fixed_pose_mask=jnp.zeros(K, bool)
    )
    init = lie.se3_retract(
        gt, 0.05 * jax.random.normal(jax.random.PRNGKey(0), (K, 6), dtype=jnp.float64)
    )
    sol, summary = pose_graph.solve_pose_graph(problem, init, lm.SolveConfig(max_iters=50))
    assert float(summary.final_cost) < 1e-12
    err = jax.vmap(lambda a, b: lie.se3_log(lie.se3_compose(a, lie.se3_inverse(b))))(
        sol, gt
    )
    assert float(jnp.max(jnp.abs(err))) < 1e-5


def test_blowup_covariance_matches_closed_form():
    """Port of tests/blowup_test.cpp:142-162 — solver tangent covariance vs
    Sigma_2 = Sigma_meas + Ad Sigma_1 Ad^T over a 60-step chain."""
    from ceres_slam_tpu.apps.blowup import run

    covs, manuals, rel_err = run(num_poses=60, verbose=False)
    assert rel_err.max() < 1e-6, f"max relative deviation {rel_err.max()}"
    # covariance grows along the chain (the 'blow-up')
    assert np.trace(covs[-1]) > np.trace(covs[0]) * 50
