"""Prototype: scatter-free BA linear solvers from a landmark-grouped
padded observation layout [J, O].

  A) explicit-S + dense Cholesky (window scale, K <= ~128)
  B) PCG whose matvec uses precomputed one-hot MXU matmuls (no gathers)

Checks dx against the existing segment-sum pcg_step, then times fused
LM-iteration loops.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import factors
from ceres_slam_tpu.solver import dense, pcg

REPS = 3


def timeit(fn, *args, n=1):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / (REPS * n)


def pad_problem(problem, state):
    """Reorder stereo obs into landmark-grouped padded [J*O] order."""
    st = problem.stereo
    K = state.poses.shape[0]
    J = state.points.shape[0]
    pose_idx = np.asarray(st.pose_idx)
    point_idx = np.asarray(st.point_idx)
    valid = np.asarray(st.valid)
    order = np.argsort(point_idx, kind="stable")
    counts = np.bincount(point_idx, minlength=J)
    O = max(1, int(counts.max()))
    slot = np.zeros((J, O), np.int64)
    w = np.zeros((J, O), bool)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for j in range(J):
        c = counts[j]
        slot[j, :c] = order[starts[j]: starts[j] + c]
        w[j, :c] = True
    flat = slot.reshape(-1)
    wf = w.reshape(-1)
    new_stereo = dense.StereoObs(
        uvd=jnp.asarray(np.asarray(st.uvd)[flat]),
        stiffness=jnp.asarray(np.asarray(st.stiffness)[flat]),
        pose_idx=jnp.asarray(np.where(wf, pose_idx[flat], 0).astype(np.int32)),
        point_idx=jnp.asarray(
            np.repeat(np.arange(J, dtype=np.int32), O)
        ),
        valid=jnp.asarray(wf & valid[flat]),
    )
    problem2 = problem._replace(stereo=new_stereo)
    onehot = jnp.asarray(
        (np.where(wf, pose_idx[flat], -1)[:, None]
         == np.arange(K)[None, :]).astype(np.float32)
    )  # [J*O, K]
    return problem2, onehot, O


def make_padded_step(problem, onehot, O, K, J, explicit_s):
    """Scatter-free damped LM step from the padded layout."""
    st = problem.stereo
    dtype = jnp.float32
    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    def step(state, lam, max_cg=50, tol=1e-5):
        r, J_pose, J_pt = factors.stereo_reprojection(
            problem.camera, state.poses[st.pose_idx], state.points[st.point_idx],
            st.uvd, st.stiffness,
        )
        v = (st.valid & problem.point_valid[st.point_idx]).astype(dtype)
        r = r * v[:, None]
        J_pose = J_pose * v[:, None, None]
        J_pt = J_pt * v[:, None, None]

        # landmark side: contiguous reshape-sums
        Hll = jnp.einsum("nri,nrj->nij", J_pt, J_pt).reshape(J, O, 3, 3).sum(1)
        gl = jnp.einsum("nri,nr->ni", J_pt, r).reshape(J, O, 3).sum(1)
        U = jnp.einsum("nri,nrj->nij", J_pose, J_pt)  # [JO,6,3]

        # pose side: one-hot MXU matmuls
        Hpp_c = jnp.einsum("nri,nrj->nij", J_pose, J_pose).reshape(-1, 36)
        Hpp = (onehot.T @ Hpp_c).reshape(K, 6, 6)
        gp_c = jnp.einsum("nri,nr->ni", J_pose, r)
        gp = onehot.T @ gp_c

        Hpp_aux, gp_aux = dense.aux_pose_blocks(problem, state)
        Hpp = Hpp + Hpp_aux
        gp = gp + gp_aux

        free_pose = (~problem.fixed_pose_mask).astype(dtype)
        free_pt = problem.point_valid.astype(dtype)
        Hpp = Hpp * free_pose[:, None, None]
        gp = gp * free_pose[:, None]
        Hll = Hll * free_pt[:, None, None]
        gl = gl * free_pt[:, None]
        U = U * free_pose[st.pose_idx, None, None] * free_pt[st.point_idx, None, None]

        dpp = jnp.einsum("kaa->ka", Hpp)
        Hpp = Hpp + eye6 * jnp.all(dpp == 0.0, axis=-1)[:, None, None].astype(dtype)
        dll = jnp.einsum("jaa->ja", Hll)
        Hll_p = Hll + eye3 * jnp.all(dll == 0.0, axis=-1)[:, None, None].astype(dtype)

        Hpp_d = Hpp + lam * jnp.einsum(
            "ka,ab->kab", jnp.clip(jnp.einsum("kaa->ka", Hpp), 1e-12, 1e32), eye6)
        C_d = Hll_p + lam * jnp.einsum(
            "ja,ab->jab", jnp.clip(jnp.einsum("jaa->ja", Hll_p), 1e-12, 1e32), eye3)
        Cinv = pcg._inv3x3(C_d)

        Ujo = U.reshape(J, O, 6, 3)
        if explicit_s:
            # W[j,k] = sum_o onehot U ; WC = W Cinv
            W = jnp.einsum("jok,joab->jkab", onehot.reshape(J, O, K), Ujo)
            WC = jnp.einsum("jkab,jbc->jkac", W, Cinv)
            Wf = W.transpose(1, 2, 0, 3).reshape(6 * K, 3 * J)
            WCf = WC.transpose(1, 2, 0, 3).reshape(6 * K, 3 * J)
            S = -jnp.dot(WCf, Wf.T, preferred_element_type=dtype)
            S = S.reshape(K, 6, K, 6)
            S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hpp_d)
            S = S.reshape(6 * K, 6 * K)
            rhs = -(gp.reshape(-1) - WCf @ gl.reshape(-1))
            L, low = jax.scipy.linalg.cho_factor(S, lower=True)
            dp = jax.scipy.linalg.cho_solve((L, low), rhs).reshape(K, 6)
            Wt_dp = (Wf.T @ dp.reshape(-1)).reshape(J, 3)
            dl = -jnp.einsum("jab,jb->ja", Cinv, gl + Wt_dp)
        else:
            # PCG with one-hot matvec
            def matvec(vv):
                vg = (onehot @ vv).reshape(J, O, 6)
                Utv = jnp.einsum("joab,joa->jb", Ujo, vg)
                y = jnp.einsum("jab,jb->ja", Cinv, Utv)
                wv = jnp.einsum("joab,jb->joa", Ujo, y).reshape(-1, 6)
                Uy = onehot.T @ wv
                return jnp.einsum("kab,kb->ka", Hpp_d, vv) - Uy

            # block-Jacobi: S_kk = Hpp_d - sum_n U Cinv U^T (one-hot)
            UCU_c = jnp.einsum(
                "nij,njk,nlk->nil", U, Cinv[st.point_idx], U).reshape(-1, 36)
            S_diag = Hpp_d - (onehot.T @ UCU_c).reshape(K, 6, 6)
            chol = jnp.linalg.cholesky(S_diag)
            Minv = jax.scipy.linalg.cho_solve(
                (chol, True), jnp.broadcast_to(eye6, (K, 6, 6)))

            def precond(rr):
                return jnp.einsum("kab,kb->ka", Minv, rr)

            y0 = jnp.einsum("jab,jb->ja", Cinv, gl)
            wv = jnp.einsum("joab,jb->joa", Ujo, y0).reshape(-1, 6)
            rhs = -(gp - onehot.T @ wv)

            r0 = rhs
            z0 = precond(r0)
            rz0 = jnp.sum(r0 * z0)
            rhs_n = jnp.sqrt(jnp.sum(rhs * rhs))

            def cond(c):
                x, rr, z, pv, rz, i = c
                return (i < max_cg) & (jnp.sqrt(jnp.sum(rr * rr)) > tol * rhs_n)

            def body(c):
                x, rr, z, pv, rz, i = c
                Sp = matvec(pv)
                den = jnp.sum(pv * Sp)
                alpha = rz / jnp.where(den == 0.0, 1.0, den)
                x = x + alpha * pv
                rr = rr - alpha * Sp
                z = precond(rr)
                rzn = jnp.sum(rr * z)
                beta = rzn / jnp.where(rz == 0.0, 1.0, rz)
                return (x, rr, z, z + beta * pv, rzn, i + 1)

            dp, *_ = jax.lax.while_loop(
                cond, body,
                (jnp.zeros_like(rhs), r0, z0, z0, rz0, jnp.asarray(0, jnp.int32)))
            vg = (onehot @ dp).reshape(J, O, 6)
            Utdp = jnp.einsum("joab,joa->jb", Ujo, vg)
            dl = -jnp.einsum("jab,jb->ja", Cinv, gl + Utdp)

        return jnp.concatenate([dp.reshape(-1), dl.reshape(-1)])

    return step


def run(K, J, N):
    problem, state = ge._build_example(K=K, J=J, n_obs=N, dtype=jnp.float32, seed=7)
    lam = jnp.asarray(1e-4, jnp.float32)
    res = {"K": K, "J": J, "N": N}

    problem_p, onehot, O = pad_problem(problem, state)
    res["O"] = O
    res["onehot_mb"] = round(onehot.size * 4 / 1e6, 1)

    # correctness: compare dx against existing segment pcg_step (tight tol CG)
    dx_ref, _, _ = pcg.pcg_step(problem, state, lam, max_cg_iters=500, cg_tol=1e-12)
    step_s = make_padded_step(problem_p, onehot, O, K, J, explicit_s=True)
    step_p = make_padded_step(problem_p, onehot, O, K, J, explicit_s=False)
    dx_s = step_s(state, lam)
    dx_p = step_p(state, lam, max_cg=500, tol=1e-12)
    scale = jnp.max(jnp.abs(dx_ref))
    res["dx_err_explicit"] = float(jnp.max(jnp.abs(dx_s - dx_ref)) / scale)
    res["dx_err_onehot_pcg"] = float(jnp.max(jnp.abs(dx_p - dx_ref)) / scale)

    # timing: fused LM loops
    LOOP = 20

    def lm_loop(step_fn, prob):
        @jax.jit
        def runl(state):
            def body(_, carry):
                s, cost = carry
                dx = step_fn(s, lam)
                ns = dense._retract_state(prob, s, dx)
                return ns, dense.ba_cost(prob, ns)
            return jax.lax.fori_loop(0, LOOP, body, (state, dense.ba_cost(prob, state)))[1]
        return runl

    t = timeit(lm_loop(lambda s, l: step_s(s, l), problem_p), state, n=LOOP)
    res["lm_explicitS_it_s"] = round(1.0 / t, 1)
    t = timeit(lm_loop(lambda s, l: step_p(s, l), problem_p), state, n=LOOP)
    res["lm_onehot_pcg_it_s"] = round(1.0 / t, 1)
    return res


def main():
    print(json.dumps({"platform": jax.devices()[0].platform}), flush=True)
    for K, J, N in [(64, 2048, 16384), (256, 8192, 65536)]:
        print(json.dumps(run(K, J, N)), flush=True)


if __name__ == "__main__":
    main()
