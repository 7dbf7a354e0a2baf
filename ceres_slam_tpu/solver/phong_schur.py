"""Schur-eliminated linear solver for the Phong BA system.

The reference solves Phong BA with SPARSE_NORMAL_CHOLESKY
(tests/dataset_ba_phong.cpp:87): SuiteSparse exploits the fact that each
vertex's 6 dof (position + normal) couple only to the poses/material/
light of its own observations. The TPU-native equivalent eliminates each
vertex's 6x6 block in closed form (batched 6x6 Cholesky) and solves only
the reduced system over [poses | phong | textures | light]
(D_r = 6K + 4M + 3) — no [D, D] dense Hessian is ever materialized
(D = 6K + 6J + 4M + 3 with J >> K in full-batch mode,
dataset_ba_phong.cpp:314-327).

Assembly is batched: per-observation outer products reduced by
segment-sums keyed on (vertex, pose) / (vertex, material) pairs, the
Schur correction is ONE [6J, D_r]^T [6J, D_r] MXU matmul, and the whole
step runs inside the jitted LM while-loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ceres_slam_tpu.solver import lm
from ceres_slam_tpu.solver.dense import _accumulate
from ceres_slam_tpu.solver.phong import (
    PhongBAProblem,
    PhongState,
    _gathered_terms,
    _free_vector,
    phong_cost,
    phong_retract,
)

_HI = jax.lax.Precision.HIGHEST


def _reduced_offsets(K: int, M: int):
    off_ph = 6 * K
    off_tex = off_ph + 3 * M
    off_light = off_tex + M
    return off_ph, off_tex, off_light, off_light + 3


def _seg(data, ids, num):
    return jax.ops.segment_sum(data, ids, num_segments=num)


def phong_schur_blocks(
    problem: PhongBAProblem,
    state: PhongState,
    use_light: bool,
    directional: bool,
    freeze_geometry: bool,
):
    """Assemble the block normal equations WITHOUT the dense [D, D] H:

    returns ``(Hv [J,6,6], gv [J,6], W [J,6,Dr], Hr [Dr,Dr], gr [Dr])``
    where the per-vertex block is [position | normal] and the reduced
    vector is [6K poses | 3M phong | M tex | 3 light], free-mask applied
    (fixed dims zeroed; diagonal pinning happens in the step).
    """
    o = problem.obs
    K = state.poses.shape[0]
    J = state.points.shape[0]
    M = state.phong.shape[0]
    off_ph, off_tex, off_light, Dr = _reduced_offsets(K, M)
    dtype = state.poses.dtype
    N = o.uvd.shape[0]

    st, nr, it, valid = _gathered_terms(problem, state, directional)
    vk = o.vertex_idx * K + o.pose_idx  # (vertex, pose) pair id
    vm = o.vertex_idx * M + o.material_idx  # (vertex, material) pair id

    Hv = jnp.zeros((J, 6, 6), dtype)
    gv = jnp.zeros((J, 6), dtype)
    W_pose = jnp.zeros((J * K, 6, 6), dtype)  # vertex-dof x pose-tangent
    W_ph = jnp.zeros((J * M, 6, 3), dtype)
    W_tex = jnp.zeros((J * M, 6), dtype)
    W_light = jnp.zeros((J, 6, 3), dtype)
    Hr = jnp.zeros((Dr, Dr), dtype)
    gr = jnp.zeros((Dr,), dtype)

    def pad_rows(Jv3, rows):
        """[N, r, 3] vertex Jacobian -> [N, r, 6] at position/normal rows."""
        z = jnp.zeros_like(Jv3)
        return (jnp.concatenate([Jv3, z], axis=-1) if rows == "pos"
                else jnp.concatenate([z, Jv3], axis=-1))

    # --- stereo reprojection: pose + vertex position -----------------------
    r_st, Jp_st, Jpt_st = st
    w = valid
    Jv = pad_rows(Jpt_st, "pos") * w[:, None, None]
    r_w = r_st * w[:, None]
    Jp_w = Jp_st * w[:, None, None]
    Hv = Hv + _seg(jnp.einsum("nra,nrb->nab", Jv, Jv, precision=_HI),
                   o.vertex_idx, J)
    gv = gv + _seg(jnp.einsum("nra,nr->na", Jv, r_w, precision=_HI),
                   o.vertex_idx, J)
    W_pose = W_pose + _seg(
        jnp.einsum("nra,nrb->nab", Jv, Jp_w, precision=_HI), vk, J * K)
    Hr, gr = _accumulate(Hr, gr, r_st, [(6 * o.pose_idx, Jp_st)], weight=w)

    if use_light:
        # --- normal observation: pose + vertex normal ----------------------
        r_n, Jp_n, Jn_n = nr
        Jv = pad_rows(Jn_n, "nrm") * w[:, None, None]
        r_w = r_n * w[:, None]
        Jp_w = Jp_n * w[:, None, None]
        Hv = Hv + _seg(jnp.einsum("nra,nrb->nab", Jv, Jv, precision=_HI),
                       o.vertex_idx, J)
        gv = gv + _seg(jnp.einsum("nra,nr->na", Jv, r_w, precision=_HI),
                       o.vertex_idx, J)
        W_pose = W_pose + _seg(
            jnp.einsum("nra,nrb->nab", Jv, Jp_w, precision=_HI), vk, J * K)
        Hr, gr = _accumulate(Hr, gr, r_n, [(6 * o.pose_idx, Jp_n)], weight=w)

        # --- intensity: pose + vertex(pos,normal) + phong + tex + light ----
        r_i, Jp_i, Jpt_i, Jn_i, Jph_i, Jtex_i, Jl_i = it
        Jv = jnp.concatenate([Jpt_i, Jn_i], axis=-1) * w[:, None]  # [N, 6]
        r_w = r_i * w
        Hv = Hv + _seg(Jv[:, :, None] * Jv[:, None, :], o.vertex_idx, J)
        gv = gv + _seg(Jv * r_w[:, None], o.vertex_idx, J)
        W_pose = W_pose + _seg(
            Jv[:, :, None] * (Jp_i * w[:, None])[:, None, :], vk, J * K)
        W_ph = W_ph + _seg(
            Jv[:, :, None] * (Jph_i * w[:, None])[:, None, :], vm, J * M)
        W_tex = W_tex + _seg(Jv * (Jtex_i * w)[:, None], vm, J * M)
        W_light = W_light + _seg(
            Jv[:, :, None] * (Jl_i * w[:, None])[:, None, :], o.vertex_idx, J)
        zeros_off = jnp.zeros(N, jnp.int32)
        Hr, gr = _accumulate(
            Hr, gr, r_i[:, None],
            [
                (6 * o.pose_idx, Jp_i[:, None, :]),
                (off_ph + 3 * o.material_idx, Jph_i[:, None, :]),
                (off_tex + o.material_idx, Jtex_i[:, None, None]),
                (off_light + zeros_off, Jl_i[:, None, :]),
            ],
            weight=w,
        )

    W = jnp.concatenate(
        [
            W_pose.reshape(J, K, 6, 6).transpose(0, 2, 1, 3).reshape(J, 6, 6 * K),
            W_ph.reshape(J, M, 6, 3).transpose(0, 2, 1, 3).reshape(J, 6, 3 * M),
            W_tex.reshape(J, M, 6).transpose(0, 2, 1).reshape(J, 6, M),
            W_light,
        ],
        axis=-1,
    )

    # free-dim masking (same _free_vector as the dense path, split into the
    # vertex [J, 6] and reduced [Dr] parts)
    free = _free_vector(problem, state, use_light, freeze_geometry)
    off_pt = 6 * K
    free_pt = free[off_pt:off_pt + 3 * J].reshape(J, 3)
    free_n = free[off_pt + 3 * J:off_pt + 6 * J].reshape(J, 3)
    free_v = jnp.concatenate([free_pt, free_n], axis=-1).astype(dtype)  # [J,6]
    free_r = jnp.concatenate(
        [free[:off_pt], free[off_pt + 6 * J:]]).astype(dtype)  # [Dr]

    Hv = Hv * free_v[:, :, None] * free_v[:, None, :]
    gv = gv * free_v
    W = W * free_v[:, :, None] * free_r[None, None, :]
    Hr = Hr * free_r[:, None] * free_r[None, :]
    gr = gr * free_r
    return Hv, gv, W, Hr, gr


def _diag_embed(d):
    return d[..., :, None] * jnp.eye(d.shape[-1], dtype=d.dtype)


def phong_schur_step(
    problem: PhongBAProblem,
    use_light: bool,
    directional: bool,
    freeze_geometry: bool,
):
    """Returns an LM ``step_fn(state, lam) -> (dx, grad_norm, pred)`` that
    solves the damped normal equations by vertex-block Schur elimination.
    ``dx`` is in the full [D] layout of ``phong_retract``."""

    def step(state: PhongState, lam):
        K = state.poses.shape[0]
        J = state.points.shape[0]
        M = state.phong.shape[0]
        dtype = state.poses.dtype
        Hv, gv, W, Hr, gr = phong_schur_blocks(
            problem, state, use_light, directional, freeze_geometry
        )

        # LM damping on the block diagonals, then unit-pin zero diagonals
        dv = jnp.diagonal(Hv, axis1=-2, axis2=-1)
        Av = Hv + _diag_embed(lam * dv) + _diag_embed(
            jnp.where(dv == 0.0, jnp.ones_like(dv), jnp.zeros_like(dv)))
        dr = jnp.diagonal(Hr)
        Ar = Hr + jnp.diag(lam * dr) + jnp.diag(
            jnp.where(dr == 0.0, jnp.ones_like(dr), jnp.zeros_like(dr)))

        # eliminate the vertex blocks: X = Av^{-1} [W | gv]
        rhs = jnp.concatenate([W, gv[:, :, None]], axis=-1)
        X = jnp.linalg.solve(Av, rhs)
        Xw, xg = X[:, :, :-1], X[:, :, -1]

        S = Ar - jnp.einsum(
            "jad,jae->de", W, Xw, precision=_HI
        )
        g_s = gr - jnp.einsum("jad,ja->d", W, xg, precision=_HI)

        L, low = jax.scipy.linalg.cho_factor(S, lower=True)
        dxr = jax.scipy.linalg.cho_solve((L, low), -g_s)
        dxv = -(xg + jnp.einsum("jad,d->ja", Xw, dxr, precision=_HI))

        # predicted decrease of the UNDAMPED model (matches
        # lm.dense_cholesky_step semantics)
        Hdx_v = (jnp.einsum("jab,jb->ja", Hv, dxv, precision=_HI)
                 + jnp.einsum("jad,d->ja", W, dxr, precision=_HI))
        Hdx_r = (Hr @ dxr
                 + jnp.einsum("jad,ja->d", W, dxv, precision=_HI))
        gdx = jnp.sum(gv * dxv) + gr @ dxr
        pred = -(gdx + 0.5 * (jnp.sum(dxv * Hdx_v) + dxr @ Hdx_r))
        grad_norm = jnp.maximum(jnp.max(jnp.abs(gv)), jnp.max(jnp.abs(gr)))

        # reassemble the full-layout dx: [6K | 3J pos | 3J nrm | 3M | M | 3]
        dx = jnp.concatenate([
            dxr[: 6 * K],
            dxv[:, :3].reshape(-1),
            dxv[:, 3:].reshape(-1),
            dxr[6 * K:],
        ])
        return dx, grad_norm, pred

    return step


def solve_phong_ba_schur(
    problem: PhongBAProblem,
    state0: PhongState,
    config: lm.SolveConfig = lm.SolveConfig(),
    use_light: bool = True,
    directional: bool = False,
    freeze_geometry: bool = False,
):
    """One LM solve of the Phong BA problem via vertex-Schur elimination —
    same minimum as `phong.solve_phong_ba`, scalable past dense-D
    (the reference's SPARSE_NORMAL_CHOLESKY role)."""
    cost_fn = lambda s: phong_cost(problem, s, use_light, directional)
    step = phong_schur_step(problem, use_light, directional, freeze_geometry)
    retract = lambda s, dx: phong_retract(
        problem, s, dx, use_light, directional, freeze_geometry
    )
    return lm.lm_solve(state0, config, cost_fn, step, retract)


solve_phong_ba_schur_jit = jax.jit(
    solve_phong_ba_schur,
    static_argnames=("config", "use_light", "directional", "freeze_geometry"),
)
