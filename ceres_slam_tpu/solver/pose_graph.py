"""Pose-graph optimization: priors + relative-pose factors over SE(3).

Covers the reference's PoseError/RelativePoseError factor family outside
of bundle adjustment (tests/blowup_test.cpp builds exactly this problem:
a chain of relative-pose measurements with a prior, solved per step with
tangent covariance extraction). Dense tangent assembly over [6K] dofs via
segment-sums, solved with the shared LM core.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ceres_slam_tpu.ops import factors, lie
from ceres_slam_tpu.solver import lm


class RelPoseFactors(NamedTuple):
    idx1: jnp.ndarray  # [N] int32 — pose T_1_0
    idx2: jnp.ndarray  # [N] int32 — pose T_2_0
    T_ref: jnp.ndarray  # [N, 12] measured T_2_1
    stiffness: jnp.ndarray  # [N, 6, 6]
    valid: jnp.ndarray  # [N] bool


class PriorFactors(NamedTuple):
    idx: jnp.ndarray  # [P] int32
    T_ref: jnp.ndarray  # [P, 12]
    stiffness: jnp.ndarray  # [P, 6, 6]
    valid: jnp.ndarray  # [P] bool


class PoseGraphProblem(NamedTuple):
    rel: RelPoseFactors
    priors: PriorFactors
    fixed_pose_mask: jnp.ndarray  # [K] bool


def _terms(problem: PoseGraphProblem, poses: jnp.ndarray):
    r_rel, J1, J2 = factors.relative_pose(
        poses[problem.rel.idx1],
        poses[problem.rel.idx2],
        problem.rel.T_ref,
        problem.rel.stiffness,
    )
    r_pr, J_pr = factors.pose_prior(
        poses[problem.priors.idx], problem.priors.T_ref, problem.priors.stiffness
    )
    return (r_rel, J1, J2), (r_pr, J_pr)


def pose_graph_cost(problem: PoseGraphProblem, poses: jnp.ndarray) -> jnp.ndarray:
    (r_rel, _, _), (r_pr, _) = _terms(problem, poses)
    dtype = poses.dtype
    c = jnp.sum(jnp.sum(r_rel**2, axis=-1) * problem.rel.valid.astype(dtype))
    c += jnp.sum(jnp.sum(r_pr**2, axis=-1) * problem.priors.valid.astype(dtype))
    return 0.5 * c


def pose_graph_normal_equations(problem: PoseGraphProblem, poses: jnp.ndarray):
    K = poses.shape[0]
    dtype = poses.dtype
    (r_rel, J1, J2), (r_pr, J_pr) = _terms(problem, poses)
    w_rel = problem.rel.valid.astype(dtype)
    w_pr = problem.priors.valid.astype(dtype)
    r_rel = r_rel * w_rel[:, None]
    J1 = J1 * w_rel[:, None, None]
    J2 = J2 * w_rel[:, None, None]
    r_pr = r_pr * w_pr[:, None]
    J_pr = J_pr * w_pr[:, None, None]

    seg = jax.ops.segment_sum
    i1, i2 = problem.rel.idx1, problem.rel.idx2
    Hd = seg(jnp.einsum("nri,nrj->nij", J1, J1), i1, num_segments=K)
    Hd += seg(jnp.einsum("nri,nrj->nij", J2, J2), i2, num_segments=K)
    Hd += seg(jnp.einsum("pri,prj->pij", J_pr, J_pr), problem.priors.idx, num_segments=K)
    W12 = jnp.einsum("nri,nrj->nij", J1, J2)  # off-diag blocks per factor
    g = seg(jnp.einsum("nri,nr->ni", J1, r_rel), i1, num_segments=K)
    g += seg(jnp.einsum("nri,nr->ni", J2, r_rel), i2, num_segments=K)
    g += seg(
        jnp.einsum("pri,pr->pi", J_pr, r_pr), problem.priors.idx, num_segments=K
    )

    H = jnp.zeros((6 * K, 6 * K), dtype)
    rows = 6 * jnp.arange(K)
    ar6 = jnp.arange(6)
    H = H.at[
        rows[:, None, None] + ar6[:, None], rows[:, None, None] + ar6[None, :]
    ].add(Hd)
    r1 = 6 * i1
    r2 = 6 * i2
    H = H.at[r1[:, None, None] + ar6[:, None], r2[:, None, None] + ar6[None, :]].add(W12)
    H = H.at[r2[:, None, None] + ar6[:, None], r1[:, None, None] + ar6[None, :]].add(
        jnp.swapaxes(W12, -1, -2)
    )

    free = jnp.repeat(~problem.fixed_pose_mask, 6).astype(dtype)
    H = H * free[:, None] * free[None, :]
    g = g.reshape(-1) * free
    diag = jnp.diagonal(H)
    H = H + jnp.diag(jnp.where(diag == 0.0, 1.0, 0.0))
    return H, g


@partial(jax.jit, static_argnames=("config",))
def solve_pose_graph(
    problem: PoseGraphProblem,
    poses0: jnp.ndarray,
    config: lm.SolveConfig = lm.SolveConfig(),
):
    cost_fn = lambda p: pose_graph_cost(problem, p)
    normal_eq = lambda p: pose_graph_normal_equations(problem, p)
    step = lm.dense_cholesky_step(normal_eq)

    def retract(poses, dx):
        K = poses.shape[0]
        d = dx.reshape(K, 6) * (~problem.fixed_pose_mask[:, None]).astype(dx.dtype)
        return lie.se3_retract(poses, d)

    return lm.lm_solve(poses0, config, cost_fn, step, retract)


@jax.jit
def pose_graph_covariance(
    problem: PoseGraphProblem, poses: jnp.ndarray, pose_idx: jnp.ndarray
) -> jnp.ndarray:
    """6x6 tangent marginal covariance of one pose at the solution."""
    from ceres_slam_tpu.solver.dense import _marginal_block

    H, _ = pose_graph_normal_equations(problem, poses)
    return _marginal_block(H, 6 * pose_idx)
