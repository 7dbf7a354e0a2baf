"""Matrix-free Schur-complement PCG for large-scale bundle adjustment.

The dense-W Schur solver (`ceres_slam_tpu/solver/schur.py`) materializes a
``[K, J, 6, 3]`` coupling tensor — fine for windows and medium batches,
quadratic-memory death for KITTI-scale full-batch BA (K ~ 10^3 poses,
J ~ 10^5 landmarks). This module never forms W: because each landmark is
observed at most once per frame in these datasets, the per-(pose,landmark)
coupling block IS the per-observation outer product
``U_n = J_pose(n)^T J_pt(n)``, and every product with the reduced camera
matrix

    S v = (B + lam D_B) v - U C^{-1} U^T v

is three observation-batched contractions plus segment-sums into the SMALL
[K] / [J] index spaces (gather pose entries of v, per-obs 6x3 matmuls,
scatter back) — exactly the memory-light structure that also distributes
with a psum over observation shards (SURVEY.md §5.7: per-shard Schur
contributions combined with collectives).

Solved with preconditioned conjugate gradients using the exact block-
Jacobi (block-diagonal of S) preconditioner: S_kk = B_k - sum_{n in k}
U_n C_j(n)^{-1} U_n^T, which is computable per-observation because cross
terms of distinct observations never hit the same (k,k) diagonal block.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ceres_slam_tpu.ops import factors, lie
from ceres_slam_tpu.solver import dense, lm
from ceres_slam_tpu.solver.schur import _inv3x3


class ObsBlocks(NamedTuple):
    """Per-observation Gauss-Newton quantities + small diagonal systems."""

    U: jnp.ndarray  # [N, 6, 3] per-obs pose-landmark coupling
    Hpp: jnp.ndarray  # [K, 6, 6] damped pose diagonal (masked)
    Cinv: jnp.ndarray  # [J, 3, 3] damped, inverted landmark diagonal
    gp: jnp.ndarray  # [K, 6]
    gl: jnp.ndarray  # [J, 3]
    Hll: jnp.ndarray  # [J, 3, 3] undamped (for predicted decrease)
    Hpp_undamped: jnp.ndarray  # [K, 6, 6]
    pose_idx: jnp.ndarray  # [N]
    point_idx: jnp.ndarray  # [N]


def build_obs_blocks(
    problem: dense.StereoBAProblem, state: dense.BAState, lam: jnp.ndarray,
    tables: "ObsTables | None" = None,
) -> ObsBlocks:
    p = problem
    K = state.poses.shape[0]
    J = state.points.shape[0]
    dtype = state.poses.dtype
    st = p.stereo

    r, J_pose, J_pt = factors.stereo_reprojection(
        p.camera, state.poses[st.pose_idx], state.points[st.point_idx], st.uvd, st.stiffness
    )
    valid = (st.valid & p.point_valid[st.point_idx]).astype(dtype)
    r = r * valid[:, None]
    J_pose = J_pose * valid[:, None, None]
    J_pt = J_pt * valid[:, None, None]

    U = jnp.einsum("nri,nrj->nij", J_pose, J_pt)
    if tables is not None:
        # scatter-free assembly: TPU scatters serialize; the gather tables
        # turn every segment reduction into dense gathers + einsums
        Hpp = _gather_sum_by_pose(
            tables, jnp.einsum("nri,nrj->nij", J_pose, J_pose))
        gp = _gather_sum_by_pose(tables, jnp.einsum("nri,nr->ni", J_pose, r))
        Hll = _gather_sum_by_point(
            tables, jnp.einsum("nri,nrj->nij", J_pt, J_pt))
        gl = _gather_sum_by_point(tables, jnp.einsum("nri,nr->ni", J_pt, r))
    else:
        seg = jax.ops.segment_sum
        Hpp = seg(jnp.einsum("nri,nrj->nij", J_pose, J_pose), st.pose_idx, num_segments=K)
        Hll = seg(jnp.einsum("nri,nrj->nij", J_pt, J_pt), st.point_idx, num_segments=J)
        gp = seg(jnp.einsum("nri,nr->ni", J_pose, r), st.pose_idx, num_segments=K)
        gl = seg(jnp.einsum("nri,nr->ni", J_pt, r), st.point_idx, num_segments=J)

    # sun + prior touch only pose blocks
    Hpp_aux, gp_aux = dense.aux_pose_blocks(problem, state)
    Hpp = Hpp + Hpp_aux
    gp = gp + gp_aux

    # gauge/validity masks at block level
    free_pose = (~p.fixed_pose_mask).astype(dtype)
    free_pt = p.point_valid.astype(dtype)
    Hpp = Hpp * free_pose[:, None, None]
    gp = gp * free_pose[:, None]
    Hll = Hll * free_pt[:, None, None]
    gl = gl * free_pt[:, None]
    U = U * free_pose[st.pose_idx, None, None] * free_pt[st.point_idx, None, None]

    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    dpp = jnp.einsum("kaa->ka", Hpp)
    Hpp = Hpp + eye6 * jnp.all(dpp == 0.0, axis=-1)[:, None, None].astype(dtype)
    dll = jnp.einsum("jaa->ja", Hll)
    Hll_pinned = Hll + eye3 * jnp.all(dll == 0.0, axis=-1)[:, None, None].astype(dtype)

    Hpp_d = Hpp + lam * jnp.einsum(
        "ka,ab->kab", jnp.clip(jnp.einsum("kaa->ka", Hpp), 1e-12, 1e32), eye6
    )
    C_d = Hll_pinned + lam * jnp.einsum(
        "ja,ab->jab", jnp.clip(jnp.einsum("jaa->ja", Hll_pinned), 1e-12, 1e32), eye3
    )
    return ObsBlocks(
        U=U,
        Hpp=Hpp_d,
        Cinv=_inv3x3(C_d),
        gp=gp,
        gl=gl,
        Hll=Hll_pinned,
        Hpp_undamped=Hpp,
        pose_idx=st.pose_idx,
        point_idx=st.point_idx,
    )


class ObsTables(NamedTuple):
    """Static gather tables: observations grouped by landmark and by pose.

    Converts the CG matvec's segment-sum scatters into dense gathers +
    einsums (TPU scatters serialize; gathers vectorize). Built once per
    problem structure on the host; padding entries point at obs 0 with
    weight 0."""

    by_point: jnp.ndarray  # [J, O_l] obs indices (padded)
    by_point_w: jnp.ndarray  # [J, O_l] 1/0 padding weights
    by_pose: jnp.ndarray  # [K, O_p]
    by_pose_w: jnp.ndarray  # [K, O_p]


def build_obs_tables(pose_idx, point_idx, K: int, J: int) -> ObsTables:
    """Host-side construction of the gather tables (numpy, one-time)."""
    import numpy as np

    pose_idx = np.asarray(pose_idx)
    point_idx = np.asarray(point_idx)
    N = pose_idx.shape[0]

    def group(ids, n):
        order = np.argsort(ids, kind="stable")
        sorted_ids = ids[order]
        counts = np.bincount(ids, minlength=n)
        O = max(1, int(counts.max()))
        table = np.zeros((n, O), np.int32)
        w = np.zeros((n, O), np.float32)
        starts = np.concatenate([[0], np.cumsum(counts)])
        for i in range(n):
            c = counts[i]
            table[i, :c] = order[starts[i] : starts[i] + c]
            w[i, :c] = 1.0
        return jnp.asarray(table), jnp.asarray(w)

    bp, bpw = group(point_idx, J)
    bk, bkw = group(pose_idx, K)
    return ObsTables(by_point=bp, by_point_w=bpw, by_pose=bk, by_pose_w=bkw)


def _gather_sum(table, w, per_obs):
    """Sum a per-observation array into bins via a gather table (scatter-
    free segment_sum). Trailing dims are FLATTENED before the gather: a
    [G, O, 6, 6] gather output tiles as (6 -> 8 sublanes, 6 -> 128 lanes)
    = 21x HBM padding on TPU, while the [G, O, 36] form pads 36 -> 128
    (3.5x) — the difference between a 1 GB and a 134 MB temp at XXL."""
    shape = per_obs.shape[1:]
    flat = per_obs.reshape(per_obs.shape[0], -1)
    g = flat[table]  # [G, O, F]
    out = jnp.einsum("gof,go->gf", g, w.astype(per_obs.dtype))
    return out.reshape((table.shape[0],) + shape)


def _gather_sum_by_point(t: ObsTables, per_obs: jnp.ndarray) -> jnp.ndarray:
    return _gather_sum(t.by_point, t.by_point_w, per_obs)


def _gather_sum_by_pose(t: ObsTables, per_obs: jnp.ndarray) -> jnp.ndarray:
    return _gather_sum(t.by_pose, t.by_pose_w, per_obs)


def make_schur_matvec_gather(b: ObsBlocks, t: ObsTables):
    """Build ``v -> S v`` with gather-table reductions (no scatters), in
    TPU-tiling-friendly MERGED layouts.

    Two layout rules drive the design (BASELINE.md bench-hygiene notes):

    1. Everything CG-loop-invariant — the [J,O_l]/[K,O_p] gathers of the
       coupling blocks U, weight folding, index translations — is
       materialized ONCE here, outside the lax.while_loop that calls the
       closure. Per CG iteration only the small [K,6]/[J,3] iterate
       vectors move.
    2. No tensor with a trailing 3/6 survives into the loop: a
       [J,O,6,3] gather output tiles as (6 -> 8 sublanes, 3 -> 128
       lanes) = 57x HBM padding (a 16 GB temp at XL — the r3 OOM).
       U is kept component-FLAT, ``U18[n, a*3+b] = U[n,a,b]``, so slot
       tensors are [G, O*18] (1.3x padding) and the 6x3-block
       contractions become one elementwise multiply + one skinny matmul
       against a static 0/1 component-selector.
    """
    dtype = b.U.dtype
    N = b.U.shape[0]
    J, O_l = t.by_point.shape
    K, O_p = t.by_pose.shape
    U18 = b.U.reshape(N, 18)  # component-flat, c = a*3 + b
    # hoisted slot tensors, padding weights folded in (padded slots -> 0)
    U_l = (U18[t.by_point] * t.by_point_w.astype(dtype)[..., None]
           ).reshape(J, O_l * 18)
    pose_of_l = b.pose_idx[t.by_point]  # [J, O_l]
    U_p = (U18[t.by_pose] * t.by_pose_w.astype(dtype)[..., None]
           ).reshape(K, O_p * 18)
    point_of_p = b.point_idx[t.by_pose]  # [K, O_p]
    # component selectors: Utv[j,b] = sum_{o,c} U_l*vE [j,o*18+c] M3[c,b]
    # (c % 3 == b), Uy[k,a] = sum_{o,c} U_p*yE [k,o*18+c] M6[c,a]
    # (c // 3 == a)
    c18 = jnp.arange(18)
    M3 = jnp.tile((c18[:, None] % 3 == jnp.arange(3)[None, :]
                   ).astype(dtype), (O_l, 1))  # [O_l*18, 3]
    M6 = jnp.tile((c18[:, None] // 3 == jnp.arange(6)[None, :]
                   ).astype(dtype), (O_p, 1))  # [O_p*18, 6]

    def matvec(v: jnp.ndarray) -> jnp.ndarray:
        vE = jnp.repeat(v, 3, axis=1)  # [K, 18], vE[k, c] = v[k, c//3]
        ve_l = vE[pose_of_l].reshape(J, O_l * 18)
        Utv = (U_l * ve_l) @ M3  # [J, 3]
        y = jnp.einsum("jab,jb->ja", b.Cinv, Utv)
        yE = jnp.tile(y, (1, 6))  # [J, 18], yE[j, c] = y[j, c%3]
        y_p = yE[point_of_p].reshape(K, O_p * 18)
        Uy = (U_p * y_p) @ M6  # [K, 6]
        return jnp.einsum("kab,kb->ka", b.Hpp, v) - Uy

    return matvec


def schur_matvec_gather(b: ObsBlocks, t: ObsTables, v: jnp.ndarray) -> jnp.ndarray:
    """``S v`` with gather-table reductions (single-shot convenience)."""
    return make_schur_matvec_gather(b, t)(v)


def schur_matvec(b: ObsBlocks, v: jnp.ndarray) -> jnp.ndarray:
    """``S v`` for v [K, 6], matrix-free over observations."""
    K = b.Hpp.shape[0]
    J = b.Cinv.shape[0]
    # U^T v: gather v at each obs's pose, contract, reduce per landmark.
    Utv = jax.ops.segment_sum(
        jnp.einsum("nij,ni->nj", b.U, v[b.pose_idx]), b.point_idx, num_segments=J
    )  # [J, 3]
    y = jnp.einsum("jab,jb->ja", b.Cinv, Utv)  # [J, 3]
    # U y: gather y at each obs's landmark, reduce per pose.
    Uy = jax.ops.segment_sum(
        jnp.einsum("nij,nj->ni", b.U, y[b.point_idx]), b.pose_idx, num_segments=K
    )  # [K, 6]
    return jnp.einsum("kab,kb->ka", b.Hpp, v) - Uy


def schur_diag_blocks(b: ObsBlocks, tables: "ObsTables | None" = None) -> jnp.ndarray:
    """Exact diagonal blocks ``S_kk`` for the block-Jacobi preconditioner."""
    K = b.Hpp.shape[0]
    per_obs = jnp.einsum("nij,njk,nlk->nil", b.U, b.Cinv[b.point_idx], b.U)
    if tables is not None:
        UCU = _gather_sum_by_pose(tables, per_obs)
    else:
        UCU = jax.ops.segment_sum(per_obs, b.pose_idx, num_segments=K)
    return b.Hpp - UCU


def _block_precond(S_diag: jnp.ndarray):
    """Cholesky-based inverse application of the [K,6,6] diagonal blocks."""
    chol = jnp.linalg.cholesky(S_diag)

    def apply(r: jnp.ndarray) -> jnp.ndarray:  # [K, 6]
        y = jax.scipy.linalg.solve_triangular(chol, r[..., None], lower=True)
        return jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(chol, -1, -2), y, lower=False
        )[..., 0]

    return apply


def pcg_solve(b: ObsBlocks, rhs: jnp.ndarray, max_iters: int, tol: float,
              tables: "ObsTables | None" = None):
    """Block-Jacobi preconditioned CG on the reduced camera system.
    With ``tables``, matvecs use gather-table reductions (no scatters)."""
    precond = _block_precond(schur_diag_blocks(b, tables))
    matvec = make_schur_matvec_gather(b, tables) if tables is not None \
        else (lambda v: schur_matvec(b, v))

    r0 = rhs
    z0 = precond(r0)
    p0 = z0
    x0 = jnp.zeros_like(rhs)
    rz0 = jnp.sum(r0 * z0)
    rhs_norm = jnp.sqrt(jnp.sum(rhs * rhs))

    def cond(carry):
        x, r, z, pv, rz, i = carry
        return (i < max_iters) & (jnp.sqrt(jnp.sum(r * r)) > tol * rhs_norm)

    def body(carry):
        x, r, z, pv, rz, i = carry
        Sp = matvec(pv)
        denom = jnp.sum(pv * Sp)
        alpha = rz / jnp.where(denom == 0.0, 1.0, denom)
        x = x + alpha * pv
        r = r - alpha * Sp
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(rz == 0.0, 1.0, rz)
        pv = z + beta * pv
        return (x, r, z, pv, rz_new, i + 1)

    x, r, _, _, _, iters = jax.lax.while_loop(
        cond, body, (x0, r0, z0, p0, rz0, jnp.asarray(0, jnp.int32))
    )
    return x, iters


def pcg_step(problem, state, lam, max_cg_iters: int = 100, cg_tol: float = 1e-6,
             tables: "ObsTables | None" = None):
    """One damped LM linear solve via Schur + PCG; returns
    (dx, grad_norm, pred_decrease) for the shared LM core. With ``tables``
    every segment reduction (assembly, rhs, back-substitution, predicted
    decrease, matvecs) is scatter-free."""
    b = build_obs_blocks(problem, state, lam, tables=tables)
    K = b.Hpp.shape[0]
    J = b.Cinv.shape[0]

    def sum_by_pose(per_obs):
        if tables is not None:
            return _gather_sum_by_pose(tables, per_obs)
        return jax.ops.segment_sum(per_obs, b.pose_idx, num_segments=K)

    def sum_by_point(per_obs):
        if tables is not None:
            return _gather_sum_by_point(tables, per_obs)
        return jax.ops.segment_sum(per_obs, b.point_idx, num_segments=J)

    # rhs = -(gp - U C^{-1} gl)
    y = jnp.einsum("jab,jb->ja", b.Cinv, b.gl)
    Uy = sum_by_pose(jnp.einsum("nij,nj->ni", b.U, y[b.point_idx]))
    rhs = -(b.gp - Uy)

    dp, _ = pcg_solve(b, rhs, max_cg_iters, cg_tol, tables=tables)

    # back-substitute landmarks: dl = -C^{-1}(gl + U^T dp)
    Utdp = sum_by_point(jnp.einsum("nij,ni->nj", b.U, dp[b.pose_idx]))
    dl = -jnp.einsum("jab,jb->ja", b.Cinv, b.gl + Utdp)

    dx = jnp.concatenate([dp.reshape(-1), dl.reshape(-1)])
    grad_norm = jnp.maximum(jnp.max(jnp.abs(b.gp)), jnp.max(jnp.abs(b.gl)))
    # predicted decrease with the undamped blocks
    Udl = sum_by_pose(jnp.einsum("nij,nj->ni", b.U, dl[b.point_idx]))
    g_dot_dx = jnp.sum(b.gp * dp) + jnp.sum(b.gl * dl)
    dxHdx = (
        jnp.einsum("ka,kab,kb->", dp, b.Hpp_undamped, dp)
        + 2.0 * jnp.sum(dp * Udl)
        + jnp.einsum("ja,jab,jb->", dl, b.Hll, dl)
    )
    pred = -(g_dot_dx + 0.5 * dxHdx)
    return dx, grad_norm, pred


@partial(jax.jit, static_argnames=("config", "max_cg_iters"))
def _solve_ba_pcg_jit(problem, state0, config, max_cg_iters, cg_tol, tables):
    return lm.lm_solve(
        state0,
        config,
        lambda s: dense.ba_cost(problem, s),
        lambda s, lam: pcg_step(problem, s, lam, max_cg_iters, cg_tol,
                                tables=tables),
        lambda s, dx: dense._retract_state(problem, s, dx),
    )


def solve_ba_pcg(
    problem: dense.StereoBAProblem,
    state0: dense.BAState,
    config: lm.SolveConfig = lm.SolveConfig(),
    max_cg_iters: int = 100,
    cg_tol: float = 1e-6,
    tables: "ObsTables | None" = None,
):
    """LM with the matrix-free Schur-PCG linear solver — the scalable path
    for full-batch BA (replaces Ceres ITERATIVE_SCHUR + SuiteSparse).

    On TPU the gather tables are built automatically (host-side, one-time
    per problem structure) so the whole solve is scatter-free; pass
    ``tables=False`` to force the segment-sum path."""
    if tables is None and jax.devices()[0].platform == "tpu":
        tables = build_obs_tables(
            problem.stereo.pose_idx, problem.stereo.point_idx,
            state0.poses.shape[0], state0.points.shape[0],
        )
    if tables is False:
        tables = None
    return _solve_ba_pcg_jit(problem, state0, config, max_cg_iters, cg_tol,
                             tables)
