"""Covariance blow-up experiment.

TPU-native counterpart of `/root/reference/tests/blowup_test.cpp`: chain
``num_poses`` relative-pose measurements (10 cm forward per step,
covariance 1e-3 I), solving each 2-pose window with a prior from the
previous step's covariance, and compare the solver's tangent covariance
against the closed-form propagation

    Sigma_2 = Sigma_meas + Ad(T_meas) Sigma_1 Ad(T_meas)^T
    (blowup_test.cpp:142-151)

Where the reference loops 1000 sequential Ceres solves, here the whole
chain runs as ONE jitted `lax.scan` — each step solves the tiny 12-dof
problem and extracts the covariance block on device.
"""

from __future__ import annotations


def run(num_poses: int = 1000, verbose: bool = True):
    import jax
    import jax.numpy as jnp

    from ceres_slam_tpu.ops import factors, lie
    from ceres_slam_tpu.solver import lm, pose_graph

    meas = lie.se3_make(
        jnp.array([0.1, 0.0, 0.0]), jnp.eye(3, dtype=jnp.float64)
    )  # 10 cm per timestep (blowup_test.cpp:33-38)
    meas_covar = 1e-3 * jnp.eye(6)
    meas_stiffness = factors.inv_sqrt_psd(meas_covar)
    Ad = lie.se3_adjoint(meas)

    def make_problem(T1, prior_stiffness):
        rel = pose_graph.RelPoseFactors(
            idx1=jnp.zeros(1, jnp.int32),
            idx2=jnp.ones(1, jnp.int32),
            T_ref=meas[None],
            stiffness=meas_stiffness[None],
            valid=jnp.ones(1, bool),
        )
        priors = pose_graph.PriorFactors(
            idx=jnp.zeros(1, jnp.int32),
            T_ref=T1[None],
            stiffness=prior_stiffness[None],
            valid=jnp.ones(1, bool),
        )
        return pose_graph.PoseGraphProblem(
            rel=rel, priors=priors, fixed_pose_mask=jnp.zeros(2, bool)
        )

    @jax.jit
    def chain(T0, covar0):
        def step(carry, _):
            T1, covar1 = carry
            prior_stiffness = factors.inv_sqrt_psd(covar1)
            problem = make_problem(T1, prior_stiffness)
            poses0 = jnp.stack([T1, T1])  # init k2 at k1 (blowup_test.cpp:61)
            poses, _ = pose_graph.solve_pose_graph(
                problem, poses0, lm.SolveConfig(max_iters=20)
            )
            covar2 = pose_graph.pose_graph_covariance(
                problem, poses, jnp.asarray(1)
            )
            manual2 = meas_covar + Ad @ covar1 @ Ad.T
            return (poses[1], covar2), (covar2, manual2)

        (_, covarN), (covs, manuals) = jax.lax.scan(
            step, (T0, covar0), None, length=num_poses - 1
        )
        return covs, manuals

    T0 = lie.se3_identity(dtype=jnp.float64)
    covar0 = 1e-12 * jnp.eye(6)
    covs, manuals = chain(T0, covar0)
    import numpy as np

    covs, manuals = np.asarray(covs), np.asarray(manuals)
    rel_err = np.abs(covs - manuals).max(axis=(1, 2)) / np.abs(manuals).max(axis=(1, 2))
    if verbose:
        print(f"Solver covariance for k={num_poses - 1}:\n{covs[-1]}")
        print(f"Manual covariance for k={num_poses - 1}:\n{manuals[-1]}")
        print(f"max relative deviation over chain: {rel_err.max():.3e}")
    return covs, manuals, rel_err


def main(argv=None):
    from ceres_slam_tpu.apps.common import base_parser, setup_jax

    p = base_parser("blowup: covariance propagation experiment")
    p.add_argument("--num-poses", type=int, default=1000)
    args = p.parse_args(argv)
    setup_jax(args.platform)
    run(args.num_poses)


if __name__ == "__main__":
    main()
