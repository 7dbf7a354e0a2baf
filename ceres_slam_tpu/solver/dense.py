"""Dense tangent-space Gauss-Newton assembly + jitted Levenberg-Marquardt.

This is the TPU-native replacement for the Ceres solver core the reference
delegates to (SURVEY.md §2.8): trust-region minimization
(`ceres::Solve` with LM/dogleg, tests/dataset_vo.cpp:65-74), the normal
equations built from autodiff residual blocks, the SE(3) local
parameterization (perturbations.hpp), gauge fixing
(`SetParameterBlockConstant`, dataset_vo.cpp:62), and tangent-space
covariance extraction (`ceres::Covariance::GetCovarianceBlockInTangentSpace`,
dataset_vo_sun.cpp:159-183).

Design: the state lives in minimal tangent coordinates only transiently —
each LM iteration assembles the dense tangent Hessian ``H [D, D]``
(D = 6K + 3J for stereo BA) by scatter-adding whitened block outer
products from the batched factor kernels, solves the damped system with
Cholesky, and retracts (`T <- exp(eps) T``, points ``p <- p + dp``). The
whole loop is one `lax.while_loop` inside jit: no per-iteration host
round trips, no dynamic shapes.

The dense path is intended for sliding windows and small/medium batch
problems (D up to a few thousand — KITTI-window scale); the Schur/PCG
path in `ceres_slam_tpu/solver/schur.py` covers large full-batch BA.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import factors, lie
from ceres_slam_tpu.solver import loss as loss_mod


# ---------------------------------------------------------------------------
# Problem containers (all pytrees; static shapes; validity via masks)
# ---------------------------------------------------------------------------


class StereoObs(NamedTuple):
    """Batched stereo reprojection observations.

    The reference stores obs in per-state index lists
    (dataset_problem.cpp:87-118); here the inverted index is replaced by
    flat gather indices, padded to a static size with ``valid = False``.
    """

    uvd: jnp.ndarray  # [N, 3]
    stiffness: jnp.ndarray  # [N, 3, 3]
    pose_idx: jnp.ndarray  # [N] int32 into poses
    point_idx: jnp.ndarray  # [N] int32 into points
    valid: jnp.ndarray  # [N] bool


class SunObs(NamedTuple):
    """Per-state sun-direction observations (dataset_problem_sun.cpp:139-175)."""

    dir_c: jnp.ndarray  # [K, 3] observed sun dir, camera frame (unit)
    dir_g: jnp.ndarray  # [K, 3] ephemeris sun dir, global frame (unit)
    stiffness: jnp.ndarray  # [K, 2, 2]
    valid: jnp.ndarray  # [K] bool — state_has_sun_obs


class PosePrior(NamedTuple):
    """Unary prior on one pose (tests/dataset_vo_sun.cpp:109-124)."""

    pose_idx: jnp.ndarray  # [] int32
    T_ref: jnp.ndarray  # [12]
    stiffness: jnp.ndarray  # [6, 6]
    valid: jnp.ndarray  # [] bool


class StereoBAProblem(NamedTuple):
    """Stereo (+ optional sun + optional prior) bundle-adjustment problem.

    Sun / prior terms are always present structurally (static pytree) and
    disabled via their validity masks — the jit-friendly equivalent of the
    reference conditionally calling problem.AddResidualBlock.
    """

    camera: StereoCamera
    stereo: StereoObs
    sun: SunObs
    prior: PosePrior
    fixed_pose_mask: jnp.ndarray  # [K] bool — gauge fixing
    point_valid: jnp.ndarray  # [J] bool — initialized_point[j]
    sun_huber: jnp.ndarray  # [] float; 0 => no robust loss
    az_err_thresh: jnp.ndarray  # [] float (radians)
    zen_err_thresh: jnp.ndarray  # [] float (radians)


class BAState(NamedTuple):
    poses: jnp.ndarray  # [K, 12]
    points: jnp.ndarray  # [J, 3]


# Solve configuration/summary shared with the generic LM core.
from ceres_slam_tpu.solver.lm import SolveConfig, SolveSummary  # noqa: E402


# ---------------------------------------------------------------------------
# Dense assembly helpers
# ---------------------------------------------------------------------------


def _scatter_H(H, row_base, col_base, B):
    """H[row_base+i, col_base+j] += B[..., i, j] for a batch of blocks."""
    dr, dc = B.shape[-2], B.shape[-1]
    rows = row_base[..., None, None] + jnp.arange(dr)[:, None]
    cols = col_base[..., None, None] + jnp.arange(dc)[None, :]
    return H.at[rows, cols].add(B)


def _scatter_g(g, row_base, v):
    d = v.shape[-1]
    rows = row_base[..., None] + jnp.arange(d)
    return g.at[rows].add(v)


def _accumulate(H, g, r, blocks, weight=None):
    """Accumulate one factor batch into (H, g).

    ``blocks`` is a list of (offset_array, J) pairs; r is the whitened
    residual. ``weight`` (optional, per-factor scalar) applies IRLS
    robust-loss scaling and validity masking to both r and J.
    """
    if weight is not None:
        r = r * weight[..., None]
        blocks = [(off, J * weight[..., None, None]) for off, J in blocks]
    for off_a, Ja in blocks:
        g = _scatter_g(g, off_a, jnp.einsum("...ri,...r->...i", Ja, r))
        for off_b, Jb in blocks:
            H = _scatter_H(H, off_a, off_b, jnp.einsum("...ri,...rj->...ij", Ja, Jb))
    return H, g


# ---------------------------------------------------------------------------
# Stereo(+sun+prior) BA: residuals, cost, assembly
# ---------------------------------------------------------------------------


def _stereo_terms(problem: StereoBAProblem, state: BAState):
    """Whitened residuals + Jacobians + validity for all three factor types."""
    p = problem
    T_obs = state.poses[p.stereo.pose_idx]
    pt_obs = state.points[p.stereo.point_idx]
    r_st, J_pose_st, J_pt_st = factors.stereo_reprojection(
        p.camera, T_obs, pt_obs, p.stereo.uvd, p.stereo.stiffness
    )
    stereo_valid = p.stereo.valid & p.point_valid[p.stereo.point_idx]

    r_sun, J_sun = factors.sun_sensor(
        state.poses,
        p.sun.dir_c,
        p.sun.dir_g,
        p.sun.stiffness,
        az_err_thresh=p.az_err_thresh,
        zen_err_thresh=p.zen_err_thresh,
    )
    # Robust loss on the sun residual block (tests/dataset_vo_sun.cpp:91-101)
    sq = jnp.sum(r_sun * r_sun, axis=-1)
    w_sun = jnp.where(p.sun_huber > 0.0, loss_mod.huber_weight(sq, jnp.maximum(p.sun_huber, 1e-30)), 1.0)
    sun_rho = jnp.where(p.sun_huber > 0.0, loss_mod.huber_rho(sq, jnp.maximum(p.sun_huber, 1e-30)), sq)

    r_pr, J_pr = factors.pose_prior(
        state.poses[p.prior.pose_idx], p.prior.T_ref, p.prior.stiffness
    )
    return (
        (r_st, J_pose_st, J_pt_st, stereo_valid),
        (r_sun, J_sun, w_sun, sun_rho, p.sun.valid),
        (r_pr, J_pr, p.prior.valid),
    )


def ba_cost(problem: StereoBAProblem, state: BAState) -> jnp.ndarray:
    """Total cost = 1/2 sum rho(|r|^2), matching Ceres's objective."""
    (r_st, _, _, v_st), (r_sun, _, _, rho_sun, v_sun), (r_pr, _, v_pr) = _stereo_terms(
        problem, state
    )
    c_st = jnp.sum(jnp.sum(r_st * r_st, axis=-1) * v_st)
    c_sun = jnp.sum(rho_sun * v_sun)
    c_pr = jnp.sum(r_pr * r_pr) * v_pr
    return 0.5 * (c_st + c_sun + c_pr)


def ba_cost_aux(problem: StereoBAProblem, state: BAState) -> jnp.ndarray:
    """Sun + prior cost only (the stereo term comes fused out of the
    window factor kernel in solver/window.py)."""
    p = problem
    r_sun, _ = factors.sun_sensor(
        state.poses, p.sun.dir_c, p.sun.dir_g, p.sun.stiffness,
        az_err_thresh=p.az_err_thresh, zen_err_thresh=p.zen_err_thresh,
    )
    sq = jnp.sum(r_sun * r_sun, axis=-1)
    rho_sun = jnp.where(
        p.sun_huber > 0.0,
        loss_mod.huber_rho(sq, jnp.maximum(p.sun_huber, 1e-30)),
        sq,
    )
    r_pr, _ = factors.pose_prior(
        state.poses[p.prior.pose_idx], p.prior.T_ref, p.prior.stiffness
    )
    dtype = state.poses.dtype
    return 0.5 * (
        jnp.sum(rho_sun * p.sun.valid.astype(dtype))
        + jnp.sum(r_pr * r_pr) * p.prior.valid.astype(dtype)
    )


class BlockNormalEq(NamedTuple):
    """Block-sparse Gauss-Newton system for BA.

    This IS the classic Schur structure: pose diagonal blocks B_k, landmark
    diagonal blocks C_j, and the pose-landmark coupling W. Built with
    segment-sums (TPU-friendly sorted reductions) instead of giant dense
    scatters; the dense solver materializes H from it, the Schur solver
    eliminates the landmarks from it directly.
    """

    Hpp: jnp.ndarray  # [K, 6, 6]
    Hll: jnp.ndarray  # [J, 3, 3]
    W: jnp.ndarray  # [K, J, 6, 3]
    gp: jnp.ndarray  # [K, 6]
    gl: jnp.ndarray  # [J, 3]


def stereo_block_contrib(
    camera: StereoCamera,
    stereo: StereoObs,
    point_valid: jnp.ndarray,
    state: BAState,
) -> BlockNormalEq:
    """Stereo-factor contribution in block form.

    Split out so the distributed path (`ceres_slam_tpu/parallel`) can
    shard_map it over observation shards and psum-reduce the partial
    blocks — each observation's contribution is independent, so the sum
    over shards is exact.
    """
    K = state.poses.shape[0]
    J = state.points.shape[0]
    dtype = state.poses.dtype

    T_obs = state.poses[stereo.pose_idx]
    pt_obs = state.points[stereo.point_idx]
    r, J_pose, J_pt = factors.stereo_reprojection(
        camera, T_obs, pt_obs, stereo.uvd, stereo.stiffness
    )
    valid = (stereo.valid & point_valid[stereo.point_idx]).astype(dtype)
    r = r * valid[:, None]
    J_pose = J_pose * valid[:, None, None]
    J_pt = J_pt * valid[:, None, None]

    seg = jax.ops.segment_sum
    Hpp = seg(
        jnp.einsum("nri,nrj->nij", J_pose, J_pose), stereo.pose_idx, num_segments=K
    )
    Hll = seg(
        jnp.einsum("nri,nrj->nij", J_pt, J_pt), stereo.point_idx, num_segments=J
    )
    pair_idx = stereo.pose_idx * J + stereo.point_idx
    W = seg(
        jnp.einsum("nri,nrj->nij", J_pose, J_pt), pair_idx, num_segments=K * J
    ).reshape(K, J, 6, 3)
    gp = seg(jnp.einsum("nri,nr->ni", J_pose, r), stereo.pose_idx, num_segments=K)
    gl = seg(jnp.einsum("nri,nr->ni", J_pt, r), stereo.point_idx, num_segments=J)
    return BlockNormalEq(Hpp, Hll, W, gp, gl)


def blocks_to_dense(blocks: BlockNormalEq):
    """Materialize the dense tangent H, g from the block system."""
    K, J = blocks.Hpp.shape[0], blocks.Hll.shape[0]
    D = 6 * K + 3 * J
    dtype = blocks.Hpp.dtype
    H = jnp.zeros((D, D), dtype)
    H = _scatter_H(H, 6 * jnp.arange(K), 6 * jnp.arange(K), blocks.Hpp)
    H = _scatter_H(H, 6 * K + 3 * jnp.arange(J), 6 * K + 3 * jnp.arange(J), blocks.Hll)
    W_dense = blocks.W.transpose(0, 2, 1, 3).reshape(6 * K, 3 * J)
    H = H.at[: 6 * K, 6 * K :].add(W_dense)
    H = H.at[6 * K :, : 6 * K].add(W_dense.T)
    g = jnp.concatenate([blocks.gp.reshape(-1), blocks.gl.reshape(-1)])
    return H, g


def aux_pose_blocks(problem: StereoBAProblem, state: BAState):
    """Sun + pose-prior contributions — they only touch the pose diagonal
    blocks, so they are returned as (Hpp_add [K,6,6], gp_add [K,6])."""
    p = problem
    K = state.poses.shape[0]
    dtype = state.poses.dtype

    r_sun, J_sun = factors.sun_sensor(
        state.poses,
        p.sun.dir_c,
        p.sun.dir_g,
        p.sun.stiffness,
        az_err_thresh=p.az_err_thresh,
        zen_err_thresh=p.zen_err_thresh,
    )
    sq = jnp.sum(r_sun * r_sun, axis=-1)
    w_sun = jnp.where(
        p.sun_huber > 0.0,
        loss_mod.huber_weight(sq, jnp.maximum(p.sun_huber, 1e-30)),
        1.0,
    )
    w = (w_sun * p.sun.valid.astype(dtype))[:, None]
    r_sun = r_sun * w
    J_sun = J_sun * w[..., None]
    Hpp = jnp.einsum("kri,krj->kij", J_sun, J_sun)
    gp = jnp.einsum("kri,kr->ki", J_sun, r_sun)

    r_pr, J_pr = factors.pose_prior(
        state.poses[p.prior.pose_idx], p.prior.T_ref, p.prior.stiffness
    )
    wp = p.prior.valid.astype(dtype)
    Hpp = Hpp.at[p.prior.pose_idx].add(wp * J_pr.T @ J_pr)
    gp = gp.at[p.prior.pose_idx].add(wp * (J_pr.T @ r_pr))
    return Hpp, gp


def ba_block_normal_equations(problem: StereoBAProblem, state: BAState) -> BlockNormalEq:
    """Full block-sparse Gauss-Newton system (stereo + sun + prior)."""
    blocks = stereo_block_contrib(
        problem.camera, problem.stereo, problem.point_valid, state
    )
    Hpp_aux, gp_aux = aux_pose_blocks(problem, state)
    return blocks._replace(Hpp=blocks.Hpp + Hpp_aux, gp=blocks.gp + gp_aux)


def apply_gauge_mask(problem: StereoBAProblem, H: jnp.ndarray, g: jnp.ndarray):
    """Constant-parameter masking: zero rows/cols, unit diagonal — the
    tangent equivalent of SetParameterBlockConstant (dataset_vo.cpp:62)."""
    dtype = H.dtype
    free = jnp.concatenate(
        [
            jnp.repeat(~problem.fixed_pose_mask, 6),
            jnp.repeat(problem.point_valid, 3),
        ]
    ).astype(dtype)
    H = H * free[:, None] * free[None, :]
    g = g * free
    # Unconstrained-but-free variables (e.g. a valid point with no valid
    # obs) would leave a zero diagonal; pin those too.
    diag = jnp.diagonal(H)
    H = H + jnp.diag(jnp.where(diag == 0.0, 1.0, 0.0))
    return H, g


def ba_normal_equations(problem: StereoBAProblem, state: BAState):
    """Assemble the dense tangent-space normal equations (H, g).

    Layout: pose k occupies rows [6k, 6k+6); point j rows [6K + 3j, ...).
    g is the gradient (H dx = -g solved later).
    """
    H, g = blocks_to_dense(ba_block_normal_equations(problem, state))
    return apply_gauge_mask(problem, H, g)


def _retract_state(problem: StereoBAProblem, state: BAState, dx: jnp.ndarray) -> BAState:
    K = state.poses.shape[0]
    J = state.points.shape[0]
    d_pose = dx[: 6 * K].reshape(K, 6)
    d_pt = dx[6 * K :].reshape(J, 3)
    d_pose = d_pose * (~problem.fixed_pose_mask[:, None]).astype(dx.dtype)
    d_pt = d_pt * problem.point_valid[:, None].astype(dx.dtype)
    return BAState(
        poses=lie.se3_retract(state.poses, d_pose),
        points=state.points + d_pt,
    )


# ---------------------------------------------------------------------------
# Levenberg-Marquardt trust-region loop (jitted)
# ---------------------------------------------------------------------------


def lm_minimize(
    problem: StereoBAProblem,
    state0: BAState,
    config: SolveConfig,
    normal_eq_fn=ba_normal_equations,
):
    """Levenberg-Marquardt core, parameterized over the normal-equations
    builder so the distributed path can substitute a shard_mapped one."""
    from ceres_slam_tpu.solver import lm as lm_mod

    step = lm_mod.dense_cholesky_step(lambda s: normal_eq_fn(problem, s))
    return lm_mod.lm_solve(
        state0,
        config,
        lambda s: ba_cost(problem, s),
        step,
        lambda s, dx: _retract_state(problem, s, dx),
    )


@partial(jax.jit, static_argnames=("config", "strategy"))
def solve_ba(
    problem: StereoBAProblem,
    state0: BAState,
    config: SolveConfig = SolveConfig(),
    strategy: str = "lm",
):
    """Minimize the BA cost with a trust-region method.

    Replaces `ceres::Solve` for this problem family. ``strategy`` selects
    Levenberg-Marquardt (default) or Powell dogleg (the reference's
    flagship setting, ceres::DOGLEG at tests/dataset_vo_sun.cpp:142-143);
    both run entirely on device via `lax.while_loop`.
    """
    if strategy == "dogleg":
        from ceres_slam_tpu.solver import lm as lm_mod

        return lm_mod.dogleg_solve(
            state0,
            config,
            lambda s: ba_cost(problem, s),
            lambda s: ba_normal_equations(problem, s),
            lambda s, dx: _retract_state(problem, s, dx),
        )
    return lm_minimize(problem, state0, config)


def _marginal_block(H: jnp.ndarray, base: jnp.ndarray, d: int = 6) -> jnp.ndarray:
    """``(H^{-1})[base:base+d, base:base+d]`` via Cholesky solve against a
    d-column unit RHS. H is SPD; avoids `jnp.linalg.inv`, whose LU
    lowering is f32-only on TPU."""
    D = H.shape[0]
    E = jax.lax.dynamic_update_slice(
        jnp.zeros((D, d), H.dtype), jnp.eye(d, dtype=H.dtype), (base, 0)
    )
    L, low = jax.scipy.linalg.cho_factor(H, lower=True)
    X = jax.scipy.linalg.cho_solve((L, low), E)
    return jax.lax.dynamic_slice(X, (base, 0), (d, d))


@partial(jax.jit, static_argnames=("config",))
def solve_ba_with_covariance(
    problem: StereoBAProblem,
    state0: BAState,
    pose_idx: jnp.ndarray,
    config: SolveConfig = SolveConfig(),
):
    """Fused window solve + tangent covariance extraction in ONE device
    call (the sliding-window pipeline is latency-bound per window; fusing
    halves the round trips)."""
    sol, summary = lm_minimize(problem, state0, config)
    H, _ = ba_normal_equations(problem, sol)
    cov = _marginal_block(H, 6 * pose_idx)
    return sol, summary, cov


@jax.jit
def pose_tangent_covariance(
    problem: StereoBAProblem, state: BAState, pose_idx: jnp.ndarray
) -> jnp.ndarray:
    """6x6 tangent-space marginal covariance of one pose.

    Replaces `ceres::Covariance::GetCovarianceBlockInTangentSpace`
    (tests/dataset_vo_sun.cpp:159-183): the marginal covariance is the
    corresponding 6x6 diagonal block of H^{-1} at the solution, H being
    the (gauge-fixed) Gauss-Newton Hessian in tangent coordinates.
    """
    H, _ = ba_normal_equations(problem, state)
    return _marginal_block(H, 6 * pose_idx)
