"""Honest (state-chained) timing of LM-iteration pieces on TPU at K=64.

Every stage's input depends on the loop carry so XLA cannot hoist it.
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
from ceres_slam_tpu.ops import factors, lie
from ceres_slam_tpu.ops.pallas_kernels import stereo_factor_blocks
from ceres_slam_tpu.solver import dense, pcg

REPS = 3
LOOP = 300
K, J, N = 64, 2048, 16384


def timeit(fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / (REPS * LOOP)


def chained(stage):
    """Run `stage(state_perturbation_scalar) -> scalar` chained LOOP times."""
    @jax.jit
    def f(eps0):
        def body(_, eps):
            return stage(eps) * 1e-20 + eps * (1.0 + 1e-9)
        return jax.lax.fori_loop(0, LOOP, body, eps0)
    return f


def main():
    print(json.dumps({"platform": jax.devices()[0].platform}), flush=True)
    problem, state = ge._build_example(K=K, J=J, n_obs=N, dtype=jnp.float32, seed=7)
    lam = jnp.asarray(1e-4, jnp.float32)
    st = problem.stereo
    dtype = jnp.float32
    res = {}

    # relay-roundtrip baseline: empty chained loop, same REPS*LOOP
    def f_empty(eps):
        return eps * 1.0
    res["empty_us"] = round(1e6 * timeit(chained(f_empty), jnp.asarray(1.0, dtype)), 1)

    def perturbed(eps):
        return state._replace(poses=state.poses + eps * 0.0)

    # 1. XLA factor eval (r, Jpose, Jpt) on compact N
    def f_xla(eps):
        s = perturbed(eps)
        r, Jp, Jl = factors.stereo_reprojection(
            problem.camera, s.poses[st.pose_idx], s.points[st.point_idx],
            st.uvd, st.stiffness)
        return jnp.sum(r) + jnp.sum(Jp) + jnp.sum(Jl)
    res["factor_xla_us"] = round(1e6 * timeit(chained(f_xla), jnp.asarray(1.0, dtype)), 1)

    # 2. Pallas factor blocks on padded 16384 (already multiple of 512)
    def f_pal(eps):
        s = perturbed(eps)
        r, hpp, hll, u, gp, gl = stereo_factor_blocks(
            problem.camera, s.poses[st.pose_idx], s.points[st.point_idx],
            st.uvd, st.stiffness, st.valid)
        return jnp.sum(r) + jnp.sum(hpp) + jnp.sum(hll) + jnp.sum(u) + jnp.sum(gp) + jnp.sum(gl)
    res["factor_pallas_us"] = round(1e6 * timeit(chained(f_pal), jnp.asarray(1.0, dtype)), 1)

    # 3. aux pose blocks (sun + prior)
    def f_aux(eps):
        s = perturbed(eps)
        Hpp_aux, gp_aux = dense.aux_pose_blocks(problem, s)
        return jnp.sum(Hpp_aux) + jnp.sum(gp_aux)
    res["aux_blocks_us"] = round(1e6 * timeit(chained(f_aux), jnp.asarray(1.0, dtype)), 1)

    # 4. ba_cost
    def f_cost(eps):
        return dense.ba_cost(problem, perturbed(eps))
    res["ba_cost_us"] = round(1e6 * timeit(chained(f_cost), jnp.asarray(1.0, dtype)), 1)

    # 5. retract
    dx0 = jnp.ones((6 * K + 3 * J,), dtype) * 1e-9
    def f_retract(eps):
        s = dense._retract_state(problem, state, dx0 * eps)
        return jnp.sum(s.poses) + jnp.sum(s.points)
    res["retract_us"] = round(1e6 * timeit(chained(f_retract), jnp.asarray(1.0, dtype)), 1)

    # 6. chol 384 chained
    S0 = jnp.eye(384, dtype=dtype) * 4.0 + 0.01
    def f_chol(eps):
        A = S0 + eps * 1e-12
        L, low = jax.scipy.linalg.cho_factor(A, lower=True)
        x = jax.scipy.linalg.cho_solve((L, low), A[0])
        return jnp.sum(x)
    res["chol384_us"] = round(1e6 * timeit(chained(f_chol), jnp.asarray(1.0, dtype)), 1)

    # 7. W build: einsum jok,joc->jkc  (precomputed one-hot [J,O,K])
    rng = np.random.default_rng(0)
    O = 19
    onehot_jok = jnp.asarray(
        (rng.integers(0, K, (J, O, 1)) == np.arange(K)[None, None, :]).astype(np.float32))
    Ul = jnp.asarray(rng.normal(size=(J, O, 18)).astype(np.float32))
    def f_wbuild(eps):
        W = jnp.einsum("jok,joc->jkc", onehot_jok, Ul * (1.0 + eps * 1e-12))
        return jnp.sum(W)
    res["wbuild_einsum_us"] = round(1e6 * timeit(chained(f_wbuild), jnp.asarray(1.0, dtype)), 1)

    # 7b. W build as dot_general batched over J explicitly
    def f_wbuild2(eps):
        W = jax.lax.dot_general(
            onehot_jok, Ul * (1.0 + eps * 1e-12),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=dtype)  # [J,K,18]
        return jnp.sum(W)
    res["wbuild_dotgen_us"] = round(1e6 * timeit(chained(f_wbuild2), jnp.asarray(1.0, dtype)), 1)

    # 8. S assembly matmul [384 x 6144] @ [6144 x 384]
    Wf = jnp.asarray(rng.normal(size=(6 * K, 3 * J)).astype(np.float32))
    def f_s(eps):
        S = jnp.dot(Wf * (1.0 + eps * 1e-12), Wf.T, preferred_element_type=dtype)
        return jnp.sum(S)
    res["s_matmul_us"] = round(1e6 * timeit(chained(f_s), jnp.asarray(1.0, dtype)), 1)

    # 9. flat one-hot matmuls [JO,K]^T @ [JO,42]
    M = J * O
    onehot_flat = onehot_jok.reshape(M, K)
    contrib = jnp.asarray(rng.normal(size=(M, 42)).astype(np.float32))
    def f_oh(eps):
        out = jnp.dot(onehot_flat.T, contrib * (1.0 + eps * 1e-12),
                      preferred_element_type=dtype)
        return jnp.sum(out)
    res["onehot_reduce_us"] = round(1e6 * timeit(chained(f_oh), jnp.asarray(1.0, dtype)), 1)

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
