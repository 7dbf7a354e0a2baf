"""Stage-by-stage timing of the scatter-free explicit-S window solver."""
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
LOOP = 20


def timeit(fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / (REPS * LOOP)


def run(K, J, N):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "p3", os.path.join(os.path.dirname(__file__), "profile_pcg3.py"))
    p3 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(p3)

    problem, state = ge._build_example(K=K, J=J, n_obs=N, dtype=jnp.float32, seed=7)
    lam = jnp.asarray(1e-4, jnp.float32)
    problem_p, onehot, O = p3.pad_problem(problem, state)
    st = problem_p.stereo
    dtype = jnp.float32
    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    res = {"K": K, "J": J, "N": N, "O": O}

    def blocks(state):
        r, J_pose, J_pt = factors.stereo_reprojection(
            problem_p.camera, state.poses[st.pose_idx], state.points[st.point_idx],
            st.uvd, st.stiffness)
        v = (st.valid & problem_p.point_valid[st.point_idx]).astype(dtype)
        r = r * v[:, None]
        J_pose = J_pose * v[:, None, None]
        J_pt = J_pt * v[:, None, None]
        Hll = jnp.einsum("nri,nrj->nij", J_pt, J_pt).reshape(J, O, 3, 3).sum(1)
        gl = jnp.einsum("nri,nr->ni", J_pt, r).reshape(J, O, 3).sum(1)
        U = jnp.einsum("nri,nrj->nij", J_pose, J_pt)
        Hpp_c = jnp.einsum("nri,nrj->nij", J_pose, J_pose).reshape(-1, 36)
        Hpp = (onehot.T @ Hpp_c).reshape(K, 6, 6)
        gp = onehot.T @ jnp.einsum("nri,nr->ni", J_pose, r)
        Hpp_aux, gp_aux = dense.aux_pose_blocks(problem_p, state)
        Hpp = Hpp + Hpp_aux
        gp = gp + gp_aux
        dll = jnp.einsum("jaa->ja", Hll)
        Hll_p = Hll + eye3 * jnp.all(dll == 0.0, axis=-1)[:, None, None].astype(dtype)
        Hpp_d = Hpp + lam * jnp.einsum(
            "ka,ab->kab", jnp.clip(jnp.einsum("kaa->ka", Hpp), 1e-12, 1e32), eye6)
        C_d = Hll_p + lam * jnp.einsum(
            "ja,ab->jab", jnp.clip(jnp.einsum("jaa->ja", Hll_p), 1e-12, 1e32), eye3)
        Cinv = pcg._inv3x3(C_d)
        return U, Hpp_d, Cinv, gp, gl

    def w_build(state):
        U, Hpp_d, Cinv, gp, gl = blocks(state)
        Ujo = U.reshape(J, O, 6, 3)
        W = jnp.einsum("jok,joab->jkab", onehot.reshape(J, O, K), Ujo)
        WC = jnp.einsum("jkab,jbc->jkac", W, Cinv)
        Wf = W.transpose(1, 2, 0, 3).reshape(6 * K, 3 * J)
        WCf = WC.transpose(1, 2, 0, 3).reshape(6 * K, 3 * J)
        return Wf, WCf, Hpp_d, Cinv, gp, gl

    def s_build(state):
        Wf, WCf, Hpp_d, Cinv, gp, gl = w_build(state)
        S = -jnp.dot(WCf, Wf.T, preferred_element_type=dtype)
        S = S.reshape(K, 6, K, 6) + jnp.eye(K, dtype=dtype)[:, None, :, None] * \
            Hpp_d[:, :, None, :]
        return S.reshape(6 * K, 6 * K), Wf, WCf, Cinv, gp, gl

    def full_step(state):
        S, Wf, WCf, Cinv, gp, gl = s_build(state)
        rhs = -(gp.reshape(-1) - WCf @ gl.reshape(-1))
        L, low = jax.scipy.linalg.cho_factor(S, lower=True)
        dp = jax.scipy.linalg.cho_solve((L, low), rhs)
        Wt_dp = (Wf.T @ dp).reshape(J, 3)
        dl = -jnp.einsum("jab,jb->ja", Cinv, gl + Wt_dp)
        return jnp.concatenate([dp, dl.reshape(-1)])

    def loop(stage_fn, reduce_fn):
        @jax.jit
        def runl(state):
            def body(_, acc):
                return acc + reduce_fn(stage_fn(state))
            return jax.lax.fori_loop(0, LOOP, body, jnp.asarray(0.0, dtype))
        return runl

    res["blocks_ms"] = round(1e3 * timeit(
        loop(blocks, lambda o: jnp.sum(o[3])), state), 3)
    res["wbuild_ms"] = round(1e3 * timeit(
        loop(w_build, lambda o: jnp.sum(o[0][0])), state), 3)
    res["sbuild_ms"] = round(1e3 * timeit(
        loop(s_build, lambda o: jnp.sum(o[0][0])), state), 3)
    res["step_ms"] = round(1e3 * timeit(
        loop(full_step, lambda o: jnp.sum(o)), state), 3)

    # full LM iteration: step on padded problem, retract+cost on ORIGINAL
    @jax.jit
    def lm(state):
        def body(_, carry):
            s, cost = carry
            dx = full_step(s)
            ns = dense._retract_state(problem, s, dx)
            return ns, dense.ba_cost(problem, ns)
        return jax.lax.fori_loop(0, LOOP, body, (state, dense.ba_cost(problem, state)))[1]

    res["lm_it_s"] = round(1.0 / timeit(lm, state), 1)

    # retract+cost alone
    @jax.jit
    def rc(state):
        def body(_, carry):
            s, acc = carry
            ns = dense._retract_state(problem, s, jnp.zeros(6 * K + 3 * J, dtype))
            return ns, acc + dense.ba_cost(problem, ns)
        return jax.lax.fori_loop(0, LOOP, body, (state, jnp.asarray(0.0, dtype)))[1]
    res["retract_cost_ms"] = round(1e3 * timeit(rc, state), 3)
    return res


def main():
    print(json.dumps({"platform": jax.devices()[0].platform}), flush=True)
    for K, J, N in [(64, 2048, 16384), (128, 4096, 32768)]:
        print(json.dumps(run(K, J, N)), flush=True)


if __name__ == "__main__":
    main()
