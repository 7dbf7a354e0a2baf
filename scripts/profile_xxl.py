"""Phase profile of one XXL full-batch Schur-PCG LM iteration.

VERDICT r4 item 2: the XXL scale (K=1024, J=32k, N=262k — a KITTI-drive
full batch) had the weakest TPU/CPU ratio of the sweep with no committed
attribution of where the iteration goes. This script times each phase of
the iteration IN ISOLATION (its own jit, scalar-fetch sync, median of
reps) so the dominant term is on record and the matvec-kernel fix can be
judged against a bytes-based roofline:

    assemble        build_obs_blocks: factor pass + Gram blocks
    precond_build   banded cyclic-reduction factorization of S's band
    precond_apply   one M^{-1} r application
    matvec_gather   one S v product, XLA gather-table path
    matvec_kernel   one S v product, lane-major Pallas one-hot kernel
    cg50            the full 50-iteration CG solve (production budget)
    pcg_step        the whole linear solve (assemble + precond + CG + backsub)
    lm_iter         pcg_step + retract + cost (the sweep's unit)

Output: one JSON line per phase. Run on TPU (default) or CPU.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCALE = os.environ.get("PROFILE_SCALE", "XXL")
SCALES = {"S": (64, 2048, 16384), "XL": (256, 8192, 65536),
          "XXL": (1024, 32768, 262144)}
REPS = int(os.environ.get("PROFILE_REPS", "7"))


def _med(f, *args):
    """Median wall seconds of f(*args) over REPS calls (first call —
    compile — excluded), forcing a scalar fetch each call."""
    import jax
    import jax.numpy as jnp

    def sync(r):
        leaves = [x for x in jax.tree_util.tree_leaves(r)
                  if hasattr(x, "dtype")]
        return float(jnp.sum(jnp.stack([jnp.sum(x.astype(jnp.float32))
                                        for x in leaves])))

    sync(f(*args))  # compile + warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        sync(f(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
    platform = jax.devices()[0].platform

    import bench
    from ceres_slam_tpu.solver import banded, dense, pcg

    K, J, N = SCALES[SCALE]
    bench.K, bench.J, bench.N_OBS = K, J, N
    problem, state = bench.build(jnp.float32)
    tables = pcg.build_obs_tables(
        problem.stereo.pose_idx, problem.stereo.point_idx, K, J)
    tracks = banded.build_track_info(
        problem.stereo.pose_idx, problem.stereo.point_idx, K, J)
    lam = jnp.asarray(1e-4, jnp.float32)

    out = {"scale": SCALE, "K": K, "J": J, "N": N, "platform": platform,
           "reps": REPS}

    b = jax.jit(lambda p, s: pcg.build_obs_blocks(p, s, lam,
                                                  tables=tables))(
        problem, state)
    out["assemble_ms"] = 1e3 * _med(
        jax.jit(lambda p, s: pcg.build_obs_blocks(p, s, lam,
                                                  tables=tables)),
        problem, state)

    # preconditioner: build (once per LM iteration) and one apply
    out["precond_build_ms"] = 1e3 * _med(
        jax.jit(lambda b: banded.make_banded_precond(b, tracks, K)(
            jnp.zeros((K, 6), jnp.float32))), b)
    r = jnp.ones((K, 6), jnp.float32)

    # matvec implementations, one product each
    mv_gather = pcg.make_schur_matvec_gather(b, tables)
    out["matvec_gather_ms"] = 1e3 * _med(jax.jit(mv_gather), r)
    if pcg._use_matvec_kernel(b, tables):
        mv_kernel = pcg.make_schur_matvec_kernel(b, tables)
        out["matvec_kernel_ms"] = 1e3 * _med(jax.jit(mv_kernel), r)
    # bytes-based roofline for one S v: the coupling term reads the
    # lane-major U panel twice (U^T v down, U y up) + Cinv once
    O_l = tables.by_point.shape[1]
    bytes_mv = (2 * J * O_l * 18 + J * 9 + K * 36) * 4
    out["matvec_bytes_mb"] = round(bytes_mv / 1e6, 1)
    out["matvec_roofline_ms_at_800gbs"] = round(bytes_mv / 800e9 * 1e3, 3)

    rhs = jnp.ones((K, 6), jnp.float32)
    out["cg50_ms"] = 1e3 * _med(
        jax.jit(lambda b, rhs: pcg.pcg_solve(
            b, rhs, 50, 1e-5, tables=tables,
            precond=banded.make_banded_precond(b, tracks, K))[0]), b, rhs)

    # CG convergence: iterations consumed (of 50) under each
    # preconditioner — the banded factorization's whole win is the early
    # exit, so a matvec whose numerics stall the residual shows up here
    y0 = jnp.einsum("jab,jb->ja", b.Cinv, b.gl)
    Uy0 = pcg._gather_sum_by_pose(tables, pcg.u18_vec(b.U18,
                                                      y0[b.point_idx]))
    rhs_real = -(b.gp - Uy0)
    for name, pre in (("banded",
                       banded.make_banded_precond(b, tracks, K)),
                      ("jacobi", None)):
        iters = jax.jit(lambda b, r, pre=pre: pcg.pcg_solve(
            b, r, 50, 1e-5, tables=tables, precond=pre)[1])(b, rhs_real)
        out[f"cg_iters_{name}"] = int(iters)

    out["pcg_step_ms"] = 1e3 * _med(
        jax.jit(lambda p, s: pcg.pcg_step(
            p, s, lam, max_cg_iters=50, cg_tol=1e-5, tables=tables,
            tracks=tracks)[0]), problem, state)

    def lm_iter(p, s):
        dx, _, _ = pcg.pcg_step(p, s, lam, max_cg_iters=50, cg_tol=1e-5,
                                tables=tables, tracks=tracks)
        ns = dense._retract_state(p, s, dx)
        return dense.ba_cost(p, ns)

    out["lm_iter_ms"] = 1e3 * _med(jax.jit(lm_iter), problem, state)
    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
