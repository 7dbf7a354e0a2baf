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

Assembly comes in two forms. The original segment-sum path scatters
per-observation outer products into (vertex, pose) / (vertex, material)
pair buffers — O(J*K) zero-initialized scatter targets that dominate the
whole iteration on TPU (138.9 ms of a ~106 ms step at K=200/J=1000/32k
obs, r4 chip profile `out/r4/phong_prof.log`). The SLOTTED path
(`PhongLayout` + `build_phong_layout`) applies the stereo window
solver's scatter-free treatment: observations grouped per vertex into
static slots, pose/material couplings contracted through in-jit
one-hots (MXU matmuls), and the reduced pose blocks reduced by ONE
[K, N] one-hot matmul — no scatters anywhere. The Schur correction is
ONE [6J, D_r]^T [6J, D_r] MXU matmul, and the whole step runs inside
the jitted LM while-loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

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


class PhongLayout(NamedTuple):
    """Vertex-slot tables for the scatter-free assembly (host-built)."""

    slots: jnp.ndarray  # [J, O] obs index of slot o (vertex-grouped)
    slot_w: jnp.ndarray  # [J, O] 1/0 slot validity


def build_phong_layout(problem: PhongBAProblem, J: int,
                       O_pad: int | None = None) -> PhongLayout:
    """Host-side: group valid observations by vertex into static slots
    (the Phong counterpart of `window.build_window_layout`)."""
    o = problem.obs
    vid = np.asarray(o.vertex_idx)
    valid = np.asarray(o.valid)
    vrows = np.nonzero(valid)[0]
    order = vrows[np.argsort(vid[vrows], kind="stable")]
    counts = np.bincount(vid[vrows], minlength=J)
    O = max(1, int(counts.max()))
    if O_pad is not None:
        assert O <= O_pad, f"O_pad {O_pad} < required slots {O}"
        O = O_pad
    slots = np.zeros((J, O), np.int32)
    w = np.zeros((J, O), np.float32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for j in range(J):
        c = counts[j]
        slots[j, :c] = order[starts[j]: starts[j] + c]
        w[j, :c] = 1.0
    return PhongLayout(slots=jnp.asarray(slots), slot_w=jnp.asarray(w))


def _reduced_offsets(K: int, M: int):
    off_ph = 6 * K
    off_tex = off_ph + 3 * M
    off_light = off_tex + M
    return off_ph, off_tex, off_light, off_light + 3


def _seg(data, ids, num):
    return jax.ops.segment_sum(data, ids, num_segments=num)


def _pad_rows_mod(Jv3, rows):
    """[N, r, 3] vertex Jacobian -> [N, r, 6] at position/normal rows."""
    z = jnp.zeros_like(Jv3)
    return (jnp.concatenate([Jv3, z], axis=-1) if rows == "pos"
            else jnp.concatenate([z, Jv3], axis=-1))


def _mask_blocks(problem, state, use_light, freeze_geometry,
                 Hv, gv, W, Hr, gr):
    """Free-dim masking shared by both assembly paths."""
    K = state.poses.shape[0]
    J = state.points.shape[0]
    dtype = Hv.dtype
    free = _free_vector(problem, state, use_light, freeze_geometry)
    off_pt = 6 * K
    free_pt = free[off_pt:off_pt + 3 * J].reshape(J, 3)
    free_n = free[off_pt + 3 * J:off_pt + 6 * J].reshape(J, 3)
    free_v = jnp.concatenate([free_pt, free_n], axis=-1).astype(dtype)
    free_r = jnp.concatenate(
        [free[:off_pt], free[off_pt + 6 * J:]]).astype(dtype)
    Hv = Hv * free_v[:, :, None] * free_v[:, None, :]
    gv = gv * free_v
    W = W * free_v[:, :, None] * free_r[None, None, :]
    Hr = Hr * free_r[:, None] * free_r[None, :]
    gr = gr * free_r
    return Hv, gv, W, Hr, gr


def _slotted_blocks(problem, state, use_light, directional,
                    freeze_geometry, layout: PhongLayout):
    """Scatter-free assembly through the vertex-slot layout: every
    reduction is a gather + einsum / one-hot matmul (see module
    docstring; 138.9 ms -> MXU-bound at K=200/J=1000/32k obs)."""
    o = problem.obs
    K = state.poses.shape[0]
    J = state.points.shape[0]
    M = state.phong.shape[0]
    off_ph, off_tex, off_light, Dr = _reduced_offsets(K, M)
    dtype = state.poses.dtype
    N = o.uvd.shape[0]
    R = 4 * M + 3

    st, nr, it, valid = _gathered_terms(problem, state, directional)
    S = layout.slots
    w_s = layout.slot_w.astype(dtype) * valid[S]  # [J, O]
    ohK = (o.pose_idx[S][..., None]
           == jnp.arange(K)[None, None, :]).astype(dtype)  # [J, O, K]
    ohK_N = (o.pose_idx[:, None]
             == jnp.arange(K)[None, :]).astype(dtype)  # [N, K]
    ohM_N = (o.material_idx[:, None]
             == jnp.arange(M)[None, :]).astype(dtype)  # [N, M]
    wN = valid  # [N] 0/1 in dtype

    def slot3(x):  # [N, r, c] -> weighted [J, O, r, c]
        return x[S] * w_s[..., None, None]

    def pose_reduce(payload):  # [N, X] -> [K, X]
        return jnp.dot(ohK_N.T, payload, precision=_HI)

    # ------------- vertex side + vertex-pose coupling (slotted) --------
    r_st, Jp_st, Jpt_st = st
    Jv_s = slot3(_pad_rows_mod(Jpt_st, "pos"))
    Hv = jnp.einsum("jora,jorb->jab", Jv_s, Jv_s, precision=_HI)
    gv = jnp.einsum("jora,jor->ja", Jv_s, r_st[S] * w_s[..., None],
                    precision=_HI)
    tmp = jnp.einsum("jora,jorb->joab", Jv_s, slot3(Jp_st), precision=_HI)

    # ------------- reduced pose side (flat one-hot matmuls) ------------
    Jp_w = Jp_st * wN[:, None, None]
    Hpp = pose_reduce(jnp.einsum("nra,nrb->nab", Jp_w, Jp_w,
                                 precision=_HI).reshape(N, 36))
    gp = pose_reduce(jnp.einsum("nra,nr->na", Jp_w, r_st * wN[:, None],
                                precision=_HI))

    W_rest = jnp.zeros((J, 6, R), dtype)
    rest_H = jnp.zeros((R, R), dtype)
    rest_g = jnp.zeros((R,), dtype)
    cross = jnp.zeros((K, 6, R), dtype)
    if use_light:
        r_n, Jp_n, Jn_n = nr
        Jv_s = slot3(_pad_rows_mod(Jn_n, "nrm"))
        Hv = Hv + jnp.einsum("jora,jorb->jab", Jv_s, Jv_s, precision=_HI)
        gv = gv + jnp.einsum("jora,jor->ja", Jv_s,
                             r_n[S] * w_s[..., None], precision=_HI)
        tmp = tmp + jnp.einsum("jora,jorb->joab", Jv_s, slot3(Jp_n),
                               precision=_HI)
        Jpn_w = Jp_n * wN[:, None, None]
        Hpp = Hpp + pose_reduce(jnp.einsum(
            "nra,nrb->nab", Jpn_w, Jpn_w, precision=_HI).reshape(N, 36))
        gp = gp + pose_reduce(jnp.einsum(
            "nra,nr->na", Jpn_w, r_n * wN[:, None], precision=_HI))

        r_i, Jp_i, Jpt_i, Jn_i, Jph_i, Jtex_i, Jl_i = it
        Jv_i = jnp.concatenate([Jpt_i, Jn_i], axis=-1)  # [N, 6]
        Jv_is = Jv_i[S] * w_s[..., None]  # [J, O, 6]
        Hv = Hv + jnp.einsum("joa,job->jab", Jv_is, Jv_is, precision=_HI)
        gv = gv + jnp.einsum("joa,jo->ja", Jv_is, r_i[S] * w_s,
                             precision=_HI)
        tmp = tmp + jnp.einsum("joa,job->joab", Jv_is,
                               Jp_i[S] * w_s[..., None], precision=_HI)
        row_ph = (Jph_i[:, None, :] * ohM_N[:, :, None]).reshape(N, 3 * M)
        row_tex = Jtex_i[:, None] * ohM_N
        row_rest = jnp.concatenate([row_ph, row_tex, Jl_i], axis=-1)
        row_rest_w = row_rest * wN[:, None]  # [N, R]
        W_rest = jnp.einsum("joa,joc->jac", Jv_is,
                            row_rest[S] * w_s[..., None], precision=_HI)
        row_pose_w = Jp_i * wN[:, None]  # [N, 6]
        Hpp = Hpp + pose_reduce(
            (row_pose_w[:, :, None] * row_pose_w[:, None, :]
             ).reshape(N, 36))
        gp = gp + pose_reduce(row_pose_w * (r_i * wN)[:, None])
        cross = pose_reduce(
            (row_pose_w[:, :, None] * row_rest_w[:, None, :]
             ).reshape(N, 6 * R)).reshape(K, 6, R)
        rest_H = jnp.einsum("nc,nd->cd", row_rest_w, row_rest_w,
                            precision=_HI)
        rest_g = jnp.einsum("nc,n->c", row_rest_w, r_i * wN, precision=_HI)

    W_pose = jnp.einsum("joab,jok->jakb", tmp, ohK,
                        precision=_HI).reshape(J, 6, 6 * K)
    W = jnp.concatenate([W_pose, W_rest], axis=-1)

    # scatter-free block-diagonal embedding of the per-pose 6x6 blocks
    eyeK = jnp.eye(K, dtype=dtype)
    Hpp_dense = jnp.einsum("kab,kl->kalb", Hpp.reshape(K, 6, 6), eyeK
                           ).reshape(6 * K, 6 * K)
    cross_flat = cross.reshape(6 * K, R)
    Hr = jnp.concatenate([
        jnp.concatenate([Hpp_dense, cross_flat], axis=1),
        jnp.concatenate([cross_flat.T, rest_H], axis=1),
    ], axis=0)
    gr = jnp.concatenate([gp.reshape(-1), rest_g])
    return _mask_blocks(problem, state, use_light, freeze_geometry,
                        Hv, gv, W, Hr, gr)


def phong_schur_blocks(
    problem: PhongBAProblem,
    state: PhongState,
    use_light: bool,
    directional: bool,
    freeze_geometry: bool,
    layout: PhongLayout | None = None,
):
    if layout is not None:
        return _slotted_blocks(problem, state, use_light, directional,
                               freeze_geometry, layout)
    return _segment_blocks(problem, state, use_light, directional,
                           freeze_geometry)


def _segment_blocks(
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
    layout: PhongLayout | None = None,
):
    """Returns an LM ``step_fn(state, lam) -> (dx, grad_norm, pred)`` that
    solves the damped normal equations by vertex-block Schur elimination.
    ``dx`` is in the full [D] layout of ``phong_retract``. Pass a
    ``layout`` (built host-side with `build_phong_layout`) for the
    scatter-free assembly — the production TPU path."""

    def step(state: PhongState, lam):
        K = state.poses.shape[0]
        J = state.points.shape[0]
        M = state.phong.shape[0]
        dtype = state.poses.dtype
        Hv, gv, W, Hr, gr = phong_schur_blocks(
            problem, state, use_light, directional, freeze_geometry,
            layout=layout,
        )

        # LM damping on the block diagonals, then unit-pin zero diagonals
        dv = jnp.diagonal(Hv, axis1=-2, axis2=-1)
        Av = Hv + _diag_embed(lam * dv) + _diag_embed(
            jnp.where(dv == 0.0, jnp.ones_like(dv), jnp.zeros_like(dv)))
        dr = jnp.diagonal(Hr)
        Ar = Hr + jnp.diag(lam * dr) + jnp.diag(
            jnp.where(dr == 0.0, jnp.ones_like(dr), jnp.zeros_like(dr)))

        # eliminate the vertex blocks: X = Av^{-1} [W | gv] via batched
        # Cholesky + triangular solves — NOT jnp.linalg.solve: its LU
        # custom call supports only f32 on this TPU toolchain (r4:
        # 'Only F32 and C64 types are implemented in LuDecomposition'),
        # and Av is SPD by construction (damped + unit-pinned)
        rhs = jnp.concatenate([W, gv[:, :, None]], axis=-1)
        Lv = jnp.linalg.cholesky(Av)
        Y = jax.scipy.linalg.solve_triangular(Lv, rhs, lower=True)
        X = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(Lv, -1, -2), Y, lower=False)
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
    layout: PhongLayout | None = None,
):
    """One LM solve of the Phong BA problem via vertex-Schur elimination —
    same minimum as `phong.solve_phong_ba`, scalable past dense-D
    (the reference's SPARSE_NORMAL_CHOLESKY role). ``layout`` enables the
    scatter-free assembly (pass it when calling under jit; when this
    function runs eagerly it is built automatically)."""
    cost_fn = lambda s: phong_cost(problem, s, use_light, directional)
    step = phong_schur_step(problem, use_light, directional,
                            freeze_geometry, layout=layout)
    retract = lambda s, dx: phong_retract(
        problem, s, dx, use_light, directional, freeze_geometry
    )
    return lm.lm_solve(state0, config, cost_fn, step, retract)


_solve_phong_ba_schur_inner = jax.jit(
    solve_phong_ba_schur,
    static_argnames=("config", "use_light", "directional", "freeze_geometry"),
)


def solve_phong_ba_schur_jit(problem, state0, config=lm.SolveConfig(),
                             use_light=True, directional=False,
                             freeze_geometry=False):
    """Jitted entry that builds the scatter-free layout host-side first
    (the observation structure must be concrete)."""
    layout = build_phong_layout(problem, state0.points.shape[0])
    return _solve_phong_ba_schur_inner(
        problem, state0, config, use_light, directional, freeze_geometry,
        layout)
