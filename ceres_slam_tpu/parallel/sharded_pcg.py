"""Distributed matrix-free Schur-PCG bundle adjustment.

The scalable multi-host configuration (BASELINE.json config #5): the
observation set is sharded across the mesh, each device keeps only its
shard's per-observation coupling blocks U_n resident, and every PCG
matvec reduces two SMALL vectors over the interconnect:

    U^T v : [J, 3]  (psum of per-shard segment-sums over landmarks)
    U y   : [K, 6]  (psum of per-shard segment-sums over poses)

— a few hundred KB per CG iteration instead of any Hessian-sized
traffic. The damped LM outer loop, preconditioner solve, and retraction
are replicated (tiny). This is the ring-reduce pattern SURVEY.md §5.7
calls for in distributed Schur assembly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ceres_slam_tpu.ops import factors
from ceres_slam_tpu.parallel.sharded_ba import _axes, shard_problem
from ceres_slam_tpu.solver import dense, lm, pcg
from ceres_slam_tpu.solver.schur import _inv3x3


def _local_obs_quantities(problem, state):
    """Per-shard observation quantities (runs inside shard_map)."""
    st = problem.stereo
    dtype = state.poses.dtype
    r, J_pose, J_pt = factors.stereo_reprojection(
        problem.camera, state.poses[st.pose_idx], state.points[st.point_idx],
        st.uvd, st.stiffness,
    )
    valid = (st.valid & problem.point_valid[st.point_idx]).astype(dtype)
    r = r * valid[:, None]
    J_pose = J_pose * valid[:, None, None]
    J_pt = J_pt * valid[:, None, None]
    free_pose = (~problem.fixed_pose_mask).astype(dtype)
    free_pt = problem.point_valid.astype(dtype)
    J_pose = J_pose * free_pose[st.pose_idx, None, None]
    J_pt = J_pt * free_pt[st.point_idx, None, None]
    U = jnp.einsum("nri,nrj->nij", J_pose, J_pt)
    return r, J_pose, J_pt, U, st.pose_idx, st.point_idx


def make_sharded_pcg_step(mesh, max_cg_iters: int = 100, cg_tol: float = 1e-6,
                          tracks=None, slot_idx=None):
    """Build the distributed damped-solve step for the shared LM core.

    ``tracks`` (a `banded.TrackInfo`) + ``slot_idx`` (its
    `banded.slot_scatter_index`, sharded with the observations) swap the
    block-Jacobi preconditioner for the banded block-cyclic-reduction
    factorization — the structure-exploiting SuiteSparse-role solve
    (solver/banded.py) kept under sharding: each shard scatters its local
    whitened coupling rows, ONE [J*L, 18] psum per LM iteration builds
    the per-landmark slot rows V, and the (small) super-tridiagonal
    factorization is replicated; the per-CG-iteration traffic is
    unchanged (two small psums)."""

    axes = _axes(mesh)

    def step(problem, state, lam, slot_idx=slot_idx):
        K = state.poses.shape[0]
        J = state.points.shape[0]
        dtype = state.poses.dtype
        if tracks is not None and slot_idx is None:
            raise ValueError("banded sharded PCG needs slot_idx "
                             "(banded.slot_scatter_index)")
        extra = (slot_idx,) if tracks is not None else ()
        extra_specs = (P(axes),) if tracks is not None else ()

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(
                jax.tree.map(lambda _: P(), problem)._replace(
                    stereo=jax.tree.map(lambda _: P(axes), problem.stereo)
                ),
                P(),
                P(),
            ) + extra_specs,
            out_specs=(P(), P(), P()),
        )
        def solve_shard(problem, state, lam, *extra):
            seg = jax.ops.segment_sum
            psum = lambda x: jax.lax.psum(x, axes)
            r, J_pose, J_pt, U, pose_idx, point_idx = _local_obs_quantities(
                problem, state
            )

            # block diagonals + gradients (psum-reduced once per LM iter)
            Hpp = psum(seg(jnp.einsum("nri,nrj->nij", J_pose, J_pose), pose_idx, num_segments=K))
            Hll = psum(seg(jnp.einsum("nri,nrj->nij", J_pt, J_pt), point_idx, num_segments=J))
            gp = psum(seg(jnp.einsum("nri,nr->ni", J_pose, r), pose_idx, num_segments=K))
            gl = psum(seg(jnp.einsum("nri,nr->ni", J_pt, r), point_idx, num_segments=J))

            # replicated aux terms (added after the psum: each device holds
            # the same values, no further reduction happens)
            Hpp_aux, gp_aux = dense.aux_pose_blocks(problem, state)
            free_pose = (~problem.fixed_pose_mask).astype(dtype)
            Hpp = (Hpp + Hpp_aux) * free_pose[:, None, None]
            gp = (gp + gp_aux) * free_pose[:, None]

            eye6 = jnp.eye(6, dtype=dtype)
            eye3 = jnp.eye(3, dtype=dtype)
            dpp = jnp.einsum("kaa->ka", Hpp)
            Hpp = Hpp + eye6 * jnp.all(dpp == 0.0, axis=-1)[:, None, None].astype(dtype)
            dll = jnp.einsum("jaa->ja", Hll)
            Hll_p = Hll + eye3 * jnp.all(dll == 0.0, axis=-1)[:, None, None].astype(dtype)

            Hpp_d = Hpp + lam * jnp.einsum(
                "ka,ab->kab", jnp.clip(jnp.einsum("kaa->ka", Hpp), 1e-12, 1e32), eye6
            )
            C_d = Hll_p + lam * jnp.einsum(
                "ja,ab->jab", jnp.clip(jnp.einsum("jaa->ja", Hll_p), 1e-12, 1e32), eye3
            )
            Cinv = _inv3x3(C_d)

            def matvec(v):  # v [K, 6] replicated
                Utv = psum(
                    seg(jnp.einsum("nij,ni->nj", U, v[pose_idx]), point_idx, num_segments=J)
                )
                y = jnp.einsum("jab,jb->ja", Cinv, Utv)
                Uy = psum(
                    seg(jnp.einsum("nij,nj->ni", U, y[point_idx]), pose_idx, num_segments=K)
                )
                return jnp.einsum("kab,kb->ka", Hpp_d, v) - Uy

            if tracks is not None:
                # banded preconditioner: scatter local whitened rows into
                # the per-landmark slot layout, ONE psum builds V, then
                # the replicated-small cyclic-reduction factorization
                from ceres_slam_tpu.solver import banded

                (slot_idx_local,) = extra
                Lc = jnp.linalg.cholesky(Cinv)  # [J, 3, 3] replicated
                UL = jnp.einsum("nab,nbc->nac", U, Lc[point_idx])
                V = psum(seg(UL.reshape(-1, 18), slot_idx_local,
                             num_segments=J * tracks.L + 1))
                V = V[: J * tracks.L].reshape(J, tracks.L * 18)
                D, E = banded.super_tridiag_from_V(V, Hpp_d, tracks)
                levels = banded.ctridiag_factor(D, E)
                m = 6 * tracks.L
                n_pad6 = tracks.n_super * tracks.L * 6

                def precond(rv):
                    rf = jnp.concatenate(
                        [rv.reshape(-1),
                         jnp.zeros(n_pad6 - 6 * K, dtype)])
                    x = banded.ctridiag_solve(
                        levels, rf.reshape(tracks.n_super, m))
                    return x.reshape(-1)[: 6 * K].reshape(K, 6)
            else:
                # exact block-Jacobi diag of S (psum of per-obs terms)
                UCU = psum(
                    seg(
                        jnp.einsum("nij,njk,nlk->nil", U, Cinv[point_idx], U),
                        pose_idx,
                        num_segments=K,
                    )
                )
                S_diag = Hpp_d - UCU
                chol = jnp.linalg.cholesky(S_diag)

                def precond(rv):
                    y = jax.scipy.linalg.solve_triangular(
                        chol, rv[..., None], lower=True)
                    return jax.scipy.linalg.solve_triangular(
                        jnp.swapaxes(chol, -1, -2), y, lower=False
                    )[..., 0]

            y0 = jnp.einsum("jab,jb->ja", Cinv, gl)
            Uy0 = psum(
                seg(jnp.einsum("nij,nj->ni", U, y0[point_idx]), pose_idx, num_segments=K)
            )
            rhs = -(gp - Uy0)

            # PCG (replicated state, distributed matvec)
            r0 = rhs
            z0 = precond(r0)
            rhs_norm = jnp.sqrt(jnp.sum(rhs * rhs))

            def cond(carry):
                x, rv, z, pv, rz, i = carry
                return (i < max_cg_iters) & (
                    jnp.sqrt(jnp.sum(rv * rv)) > cg_tol * rhs_norm
                )

            def body(carry):
                x, rv, z, pv, rz, i = carry
                Sp = matvec(pv)
                denom = jnp.sum(pv * Sp)
                alpha = rz / jnp.where(denom == 0.0, 1.0, denom)
                x = x + alpha * pv
                rv = rv - alpha * Sp
                z = precond(rv)
                rz_new = jnp.sum(rv * z)
                beta = rz_new / jnp.where(rz == 0.0, 1.0, rz)
                return (x, rv, z, z + beta * pv, rz_new, i + 1)

            dp, _, _, _, _, _ = jax.lax.while_loop(
                cond,
                body,
                (jnp.zeros_like(rhs), r0, z0, z0, jnp.sum(r0 * z0),
                 jnp.asarray(0, jnp.int32)),
            )

            Utdp = psum(
                seg(jnp.einsum("nij,ni->nj", U, dp[pose_idx]), point_idx, num_segments=J)
            )
            dl = -jnp.einsum("jab,jb->ja", Cinv, gl + Utdp)

            # predicted decrease (undamped blocks)
            Udl = psum(
                seg(jnp.einsum("nij,nj->ni", U, dl[point_idx]), pose_idx, num_segments=K)
            )
            g_dot_dx = jnp.sum(gp * dp) + jnp.sum(gl * dl)
            dxHdx = (
                jnp.einsum("ka,kab,kb->", dp, Hpp, dp)
                + 2.0 * jnp.sum(dp * Udl)
                + jnp.einsum("ja,jab,jb->", dl, Hll_p, dl)
            )
            pred = -(g_dot_dx + 0.5 * dxHdx)
            grad_norm = jnp.maximum(jnp.max(jnp.abs(gp)), jnp.max(jnp.abs(gl)))
            dx = jnp.concatenate([dp.reshape(-1), dl.reshape(-1)])
            return dx, grad_norm, pred

        return solve_shard(problem, state, lam, *extra)

    return step


def solve_ba_pcg_sharded(
    problem: dense.StereoBAProblem,
    state0: dense.BAState,
    mesh,
    config: lm.SolveConfig = lm.SolveConfig(),
    max_cg_iters: int = 100,
    cg_tol: float = 1e-6,
    precond: str = "jacobi",
):
    """Distributed LM + Schur-PCG solve; solution replicated on the mesh.

    ``precond``: 'jacobi' (exact block-Jacobi diagonal of S) or 'banded'
    (distributed block-cyclic-reduction over the banded part of S — the
    structure-exploiting solve for contiguous bounded tracks)."""
    import numpy as np

    tracks = slot_idx = None
    if precond == "banded":
        from ceres_slam_tpu.solver import banded

        st = problem.stereo
        tracks = banded.build_track_info(
            st.pose_idx, st.point_idx, state0.poses.shape[0],
            state0.points.shape[0],
            valid=st.valid & problem.point_valid[st.point_idx])
        # pad to the SAME multiple-of-mesh-size length shard_problem pads
        # the observation arrays to; pad rows route to the dump segment
        # (slot indices reference pre-pad positions, which padding at the
        # tail leaves unchanged)
        N = int(st.pose_idx.shape[0])
        n_dev = mesh.devices.size
        N_pad = ((N + n_dev - 1) // n_dev) * n_dev
        idx_np = banded.slot_scatter_index(tracks, N)
        dump = tracks.slot_w.shape[0] * tracks.L
        idx_np = np.concatenate(
            [idx_np, np.full(N_pad - N, dump, np.int32)])
        axes = _axes(mesh)
        slot_idx = jax.device_put(jnp.asarray(idx_np),
                                  NamedSharding(mesh, P(axes)))
    elif precond != "jacobi":
        raise ValueError(f"unknown preconditioner: {precond!r}")
    problem = shard_problem(problem, mesh)
    state0 = jax.device_put(state0, NamedSharding(mesh, P()))
    step = make_sharded_pcg_step(mesh, max_cg_iters, cg_tol,
                                 tracks=tracks, slot_idx=slot_idx)

    from ceres_slam_tpu.parallel.sharded_ba import make_sharded_cost

    cost = make_sharded_cost(mesh)

    @partial(jax.jit, static_argnames=("config",))
    def run(problem, state0, config):
        return lm.lm_solve(
            state0,
            config,
            lambda s: cost(problem, s),
            lambda s, lam: step(problem, s, lam),
            lambda s, dx: dense._retract_state(problem, s, dx),
        )

    return run(problem, state0, config)
