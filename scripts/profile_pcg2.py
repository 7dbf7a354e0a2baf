"""Profile candidate PCG matvec optimizations on TPU.

Variants, each as 1000 chained matvecs inside one jit:
  seg       — current segment-sum matvec (baseline)
  pregather — padded [J,O]/[K,P] layouts pre-gathered once, matvec = two
              row gathers + einsums (no scatters)
  pre+fused — same, with Cinv fused into the pose-side table at build
Also: batched cho_factor/solve vs explicit 6x6 inverse preconditioner
apply, and small dense Cholesky timing (explicit-S alternative).
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
from ceres_slam_tpu.solver import pcg

REPS = 3


def timeit(fn, *args, n=1):
    out = fn(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _i in range(REPS):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / (REPS * n)


def profile(K, J, N):
    problem, state = ge._build_example(K=K, J=J, n_obs=N, dtype=jnp.float32, seed=7)
    lam = jnp.asarray(1e-4, jnp.float32)
    t = pcg.build_obs_tables(
        np.asarray(problem.stereo.pose_idx), np.asarray(problem.stereo.point_idx), K, J
    )
    b = pcg.build_obs_blocks(problem, state, lam)
    res = {"K": K, "J": J, "N": N}
    MV = 200

    def chain(mv):
        def run(v):
            def body(_, v):
                v = mv(v)
                return v / jnp.maximum(jnp.max(jnp.abs(v)), 1e-30)
            return jax.lax.fori_loop(0, MV, body, v)
        return jax.jit(run)

    v0 = jnp.ones((K, 6), jnp.float32)

    # --- baseline: segment-sum matvec
    res["seg_us"] = round(1e6 * timeit(chain(lambda v: pcg.schur_matvec(b, v)), v0, n=MV), 1)

    # --- pregathered padded layout
    dtype = jnp.float32
    Ul = b.U[t.by_point] * t.by_point_w[..., None, None].astype(dtype)  # [J,O,6,3]
    pl = b.pose_idx[t.by_point]  # [J,O]
    Up = b.U[t.by_pose] * t.by_pose_w[..., None, None].astype(dtype)  # [K,P,6,3]
    ll = b.point_idx[t.by_pose]  # [K,P]
    UpC = jnp.einsum("koab,kobc->koac", Up, b.Cinv[ll])  # Cinv fused pose-side

    def mv_pre(v):
        vg = v[pl]  # [J,O,6]
        Utv = jnp.einsum("joab,joa->jb", Ul, vg)  # [J,3]
        y = jnp.einsum("jab,jb->ja", b.Cinv, Utv)
        yg = y[ll]  # [K,P,3]
        Uy = jnp.einsum("koab,kob->ka", Up, yg)
        return jnp.einsum("kab,kb->ka", b.Hpp, v) - Uy

    def mv_pre_fused(v):
        vg = v[pl]
        Utv = jnp.einsum("joab,joa->jb", Ul, vg)  # pre-Cinv
        ug = Utv[ll]  # [K,P,3]
        Uy = jnp.einsum("koab,kob->ka", UpC, ug)
        return jnp.einsum("kab,kb->ka", b.Hpp, v) - Uy

    res["pregather_us"] = round(1e6 * timeit(chain(mv_pre), v0, n=MV), 1)
    res["prefused_us"] = round(1e6 * timeit(chain(mv_pre_fused), v0, n=MV), 1)

    # flattened-contraction variants (single reduction dim, lane-friendlier)
    Ul_f = Ul.transpose(0, 3, 1, 2).reshape(J, 3, -1)  # [J,3,O*6]
    UpC_f = UpC.transpose(0, 2, 1, 3).reshape(K, 6, -1)  # [K,6,P*3]

    def mv_flat(v):
        vg = v[pl].reshape(J, -1)  # [J,O*6]
        Utv = jnp.einsum("jbc,jc->jb", Ul_f, vg)
        ug = Utv[ll].reshape(K, -1)  # [K,P*3]
        Uy = jnp.einsum("kbc,kc->kb", UpC_f, ug)
        return jnp.einsum("kab,kb->ka", b.Hpp, v) - Uy

    res["flat_us"] = round(1e6 * timeit(chain(mv_flat), v0, n=MV), 1)

    # --- preconditioner apply: triangular solves vs explicit inverse
    S_diag = pcg.schur_diag_blocks(b)
    chol = jnp.linalg.cholesky(S_diag)
    eye = jnp.broadcast_to(jnp.eye(6, dtype=dtype), (K, 6, 6))
    Minv = jax.scipy.linalg.cho_solve((chol, True), eye)

    def prec_tri(v):
        y = jax.scipy.linalg.solve_triangular(chol, v[..., None], lower=True)
        return jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(chol, -1, -2), y, lower=False)[..., 0]

    def prec_inv(v):
        return jnp.einsum("kab,kb->ka", Minv, v)

    res["prec_tri_us"] = round(1e6 * timeit(chain(prec_tri), v0, n=MV), 1)
    res["prec_inv_us"] = round(1e6 * timeit(chain(prec_inv), v0, n=MV), 1)

    # --- small dense Cholesky cost (explicit-S alternative)
    n = 6 * K
    A = jnp.eye(n, dtype=dtype) * 4.0 + 0.1 * jnp.ones((n, n), dtype)
    rhs = jnp.ones((n,), dtype)

    @jax.jit
    def chol_solve(A, rhs):
        def body(_, r):
            L, low = jax.scipy.linalg.cho_factor(A, lower=True)
            x = jax.scipy.linalg.cho_solve((L, low), r)
            return x / jnp.maximum(jnp.max(jnp.abs(x)), 1e-30)
        return jax.lax.fori_loop(0, 20, body, rhs)

    res["dense_chol_ms"] = round(1e3 * timeit(chol_solve, A, rhs, n=20), 3)

    # --- build cost of the pregathered tables (once per LM iteration)
    @jax.jit
    def build_tables(U, Cinv):
        Ul = U[t.by_point] * t.by_point_w[..., None, None].astype(dtype)
        Up = U[t.by_pose] * t.by_pose_w[..., None, None].astype(dtype)
        UpC = jnp.einsum("koab,kobc->koac", Up, Cinv[ll])
        return jnp.sum(Ul) + jnp.sum(UpC)

    res["pregather_build_us"] = round(1e6 * timeit(build_tables, b.U, b.Cinv), 1)
    return res


def main():
    print(json.dumps({"platform": jax.devices()[0].platform}), flush=True)
    for K, J, N in [(64, 2048, 16384), (256, 8192, 65536), (1024, 32768, 262144)]:
        print(json.dumps(profile(K, J, N)), flush=True)


if __name__ == "__main__":
    main()
