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
    """Per-observation Gauss-Newton quantities + small diagonal systems.

    ``U18`` is the component-FLAT coupling, ``U18[n, a*3 + c] =
    U[n, a, c]`` — the layout every TPU-hot contraction uses (a [N,6,3]
    tensor tiles as (6->8 sublanes, 3->128 lanes), 57x HBM padding; the
    flat form pads 18->128, and the 6x3-block algebra becomes elementwise
    multiplies + skinny matmuls against static selectors). ``U`` is only
    materialized on the segment-sum (CPU) path; the fused TPU path leaves
    it None."""

    U: jnp.ndarray | None  # [N, 6, 3] per-obs pose-landmark coupling
    U18: jnp.ndarray  # [N, 18] component-flat coupling
    Hpp: jnp.ndarray  # [K, 6, 6] damped pose diagonal (masked)
    Cinv: jnp.ndarray  # [J, 3, 3] damped, inverted landmark diagonal
    gp: jnp.ndarray  # [K, 6]
    gl: jnp.ndarray  # [J, 3]
    Hll: jnp.ndarray  # [J, 3, 3] undamped (for predicted decrease)
    Hpp_undamped: jnp.ndarray  # [K, 6, 6]
    pose_idx: jnp.ndarray  # [N]
    point_idx: jnp.ndarray  # [N]


# static component selectors for flat-U algebra
def _sel_m3(dtype):  # [18, 3]: c % 3 == b  (U^T v contraction)
    c = jnp.arange(18)
    return (c[:, None] % 3 == jnp.arange(3)[None, :]).astype(dtype)


def _sel_m6(dtype):  # [18, 6]: c // 3 == a  (U y contraction)
    c = jnp.arange(18)
    return (c[:, None] // 3 == jnp.arange(6)[None, :]).astype(dtype)


def u18_t_vec(U18, v6):
    """Per-obs ``U_n^T v_n`` from flat U: [N,18],[N,6] -> [N,3]."""
    return (U18 * jnp.repeat(v6, 3, axis=1)) @ _sel_m3(U18.dtype)


def u18_vec(U18, y3):
    """Per-obs ``U_n y_n`` from flat U: [N,18],[N,3] -> [N,6]."""
    return (U18 * jnp.tile(y3, (1, 6))) @ _sel_m6(U18.dtype)


def build_obs_blocks(
    problem: dense.StereoBAProblem, state: dense.BAState, lam: jnp.ndarray,
    tables: "ObsTables | None" = None, fused: bool | None = None,
) -> ObsBlocks:
    """Per-observation factor blocks + binned Gauss-Newton diagonals.

    ``fused=None`` auto-selects the lane-major Pallas factor kernel
    (`ops.pallas_kernels.stereo_factor_blocks`) on TPU f32 with gather
    tables: one VMEM-resident pass emits whitened residual/Gram blocks in
    component-flat layouts, replacing ~10 XLA ops whose [N,3,6]-shaped
    temps tile at <10% HBM efficiency (measured 58 ms -> the kernel path
    at XXL; the assembly was the single largest cost of a PCG iteration).
    """
    p = problem
    K = state.poses.shape[0]
    J = state.points.shape[0]
    dtype = state.poses.dtype
    st = p.stereo
    if fused is None:
        fused = (tables is not None and dtype == jnp.float32
                 and jax.devices()[0].platform == "tpu")

    valid_b = st.valid & p.point_valid[st.point_idx]
    if fused:
        from ceres_slam_tpu.ops import pallas_kernels as pk

        N = st.uvd.shape[0]
        pad = (-N) % pk.TILE

        def padN(x, val=0):
            if not pad:
                return x
            return jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], val, x.dtype)])

        pose_idx = padN(st.pose_idx)
        point_idx = padN(st.point_idx)
        _, hpp36, hll9, U18, gp6, gl3 = pk.stereo_factor_blocks(
            p.camera, state.poses[pose_idx], state.points[point_idx],
            padN(st.uvd), padN(st.stiffness), padN(valid_b), flat=True,
            interpret=jax.devices()[0].platform != "tpu")
        U = None
        Hpp = _gather_sum_by_pose(tables, hpp36).reshape(K, 6, 6)
        gp = _gather_sum_by_pose(tables, gp6)
        Hll = _gather_sum_by_point(tables, hll9).reshape(J, 3, 3)
        gl = _gather_sum_by_point(tables, gl3)
    else:
        pose_idx = st.pose_idx
        point_idx = st.point_idx
        # Invalid rows must contribute EXACT zeros, but their gathered
        # landmark can be garbage — an uninitialized point sits at the
        # origin, lands at z <= 0 in camera frame, and 1/z turns the
        # masked row into NaN*0 = NaN, which poisons every reduction
        # (caught by the KITTI-scale full-batch validation, r5: the CPU
        # pcg path rejected every LM step). Evaluate invalid rows
        # against a synthetic point 10 m ahead of their camera instead;
        # the Pallas factor kernel guards its depth internally.
        T_obs = state.poses[st.pose_idx]
        p_obs = state.points[st.point_idx]
        ahead = jnp.asarray([0.0, 0.0, 10.0], dtype)
        safe_pt = lie.se3_transform_point(
            lie.se3_inverse(T_obs), jnp.broadcast_to(ahead, p_obs.shape))
        p_obs = jnp.where(valid_b[:, None], p_obs, safe_pt)
        r, J_pose, J_pt = factors.stereo_reprojection(
            p.camera, T_obs, p_obs, st.uvd, st.stiffness
        )
        valid = valid_b.astype(dtype)
        r = r * valid[:, None]
        J_pose = J_pose * valid[:, None, None]
        J_pt = J_pt * valid[:, None, None]

        U = jnp.einsum("nri,nrj->nij", J_pose, J_pt)
        U18 = U.reshape(-1, 18)
        if tables is not None:
            # scatter-free assembly: TPU scatters serialize; the gather
            # tables turn every segment reduction into gathers + einsums
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
    u_mask = (free_pose[pose_idx] * free_pt[point_idx])[:, None]
    U18 = U18 * u_mask
    if U is not None:
        U = U18.reshape(-1, 6, 3)

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
        U18=U18,
        Hpp=Hpp_d,
        Cinv=_inv3x3(C_d),
        gp=gp,
        gl=gl,
        Hll=Hll_pinned,
        Hpp_undamped=Hpp,
        pose_idx=pose_idx,
        point_idx=point_idx,
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


def _use_matvec_kernel(b: ObsBlocks, t: ObsTables) -> bool:
    """Gate for the lane-major Pallas matvec kernel: TPU, f32, and the
    in-VMEM one-hot shapes within budget (K sublanes x TILE_J lanes)."""
    import os

    if os.environ.get("CSTPU_NO_MATVEC_KERNEL"):
        return False
    K = b.Hpp.shape[0]
    O_l = t.by_point.shape[1]
    # VMEM: each (j-tile, slot) grid step holds ONE one-hot + iota,
    # 2*K*TILE_J*4 bytes (4 MB at K=1024, TILE_J=512) against the 16 MB
    # scoped budget
    from ceres_slam_tpu.ops import pallas_kernels as pk

    vmem_onehot = 2 * K * pk.TILE_J * 4
    return (jax.devices()[0].platform == "tpu"
            and b.U18.dtype == jnp.float32
            and O_l * 18 <= 512 and vmem_onehot <= 9 * 2**20)


def make_schur_matvec_kernel(b: ObsBlocks, t: ObsTables,
                             interpret: bool = False):
    """``v -> S v`` via the lane-major Pallas kernel
    (`ops.pallas_kernels.schur_uy`): the coupling product's gathers in
    BOTH directions run as in-VMEM one-hot MXU contractions, J in lanes.
    The XLA gather-table path (below) materializes ~4 x 19 MB HBM temps
    and two 18-lane row gathers per CG iteration — measured ~3.4 ms at
    XXL vs a ~0.1 ms roofline; CG dominates the XXL LM iteration
    (results/r5/profile_xxl_tpu_v2.json). Hoisted work here happens once per LM
    iteration; per CG iteration only [6, K] vectors move."""
    from ceres_slam_tpu.ops import pallas_kernels as pk

    dtype = b.U18.dtype
    J, O_l = t.by_point.shape
    K = b.Hpp.shape[0]
    Jp = -(-J // pk.TILE_J) * pk.TILE_J

    def padJ(x, val=0):
        if Jp == J:
            return x
        return jnp.concatenate(
            [x, jnp.full((Jp - J,) + x.shape[1:], val, x.dtype)])

    # hoisted lane-major slot tensors (padding weights folded into U),
    # repacked ONCE into the kernel's sublane-divisible panels
    U_l = (b.U18[t.by_point] * t.by_point_w.astype(dtype)[..., None]
           ).reshape(J, O_l * 18)
    UT_l = padJ(U_l).T  # [O_l*18, Jp]
    pose_of_lT = padJ(b.pose_idx[t.by_point].astype(jnp.int32)).T
    cinvT = padJ(b.Cinv.reshape(J, 9)).T  # [9, Jp]
    UT24, pose8 = pk.pack_schur_uy_inputs(UT_l, pose_of_lT)

    def matvec(v: jnp.ndarray) -> jnp.ndarray:
        uy = pk.schur_uy_packed(UT24, pose8, cinvT, v.T.astype(dtype),
                                interpret=interpret)
        return jnp.einsum("kab,kb->ka", b.Hpp, v) - uy.T.astype(v.dtype)

    return matvec


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
    U18 = b.U18  # component-flat, c = a*3 + b
    dtype = U18.dtype
    J, O_l = t.by_point.shape
    K, O_p = t.by_pose.shape
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
    U = b.U if b.U is not None else b.U18.reshape(-1, 6, 3)
    # U^T v: gather v at each obs's pose, contract, reduce per landmark.
    Utv = jax.ops.segment_sum(
        jnp.einsum("nij,ni->nj", U, v[b.pose_idx]), b.point_idx, num_segments=J
    )  # [J, 3]
    y = jnp.einsum("jab,jb->ja", b.Cinv, Utv)  # [J, 3]
    # U y: gather y at each obs's landmark, reduce per pose.
    Uy = jax.ops.segment_sum(
        jnp.einsum("nij,nj->ni", U, y[b.point_idx]), b.pose_idx, num_segments=K
    )  # [K, 6]
    return jnp.einsum("kab,kb->ka", b.Hpp, v) - Uy


def whitened_u18(b: ObsBlocks) -> jnp.ndarray:
    """``UL = U @ chol(C^{-1})`` per obs, component-flat [N, 18] — so
    ``U C^{-1} U^T = UL UL^T``. All-flat algebra: both factors expand to
    the 54-long (a, c, d) index, multiply elementwise, contract c with a
    static selector (no [N,6,3]-shaped temp)."""
    Lc = jnp.linalg.cholesky(b.Cinv)  # [J, 3, 3]
    Lc9 = Lc.reshape(-1, 9)[b.point_idx]  # [N, 9]
    P = jnp.repeat(b.U18, 3, axis=1) * jnp.tile(Lc9, (1, 6))  # [N, 54]
    q = jnp.arange(54)
    sel = ((q // 9 * 3 + q % 3)[:, None]
           == jnp.arange(18)[None, :]).astype(b.U18.dtype)  # [54, 18]
    return P @ sel


def schur_diag_blocks(b: ObsBlocks, tables: "ObsTables | None" = None) -> jnp.ndarray:
    """Exact diagonal blocks ``S_kk`` for the block-Jacobi preconditioner.

    Flat algebra: per-obs ``(UL UL^T)[a, a']`` via a lane-permutation of
    the tiled UL and one skinny matmul — a [N,6,6]-shaped temp would tile
    at 21x HBM padding."""
    K = b.Hpp.shape[0]
    UL18 = whitened_u18(b)
    ULt = jnp.tile(UL18, (1, 6))  # [N, 108], q = 18a + 3a' + d -> UL[3a'+d]
    q = jnp.arange(108)
    perm = 18 * (q % 18 // 3) + 3 * (q // 18) + q % 3  # swap a <-> a'
    E1 = ULt[:, perm]  # q -> UL[3a + d]
    Msum = ((q // 18 * 6 + q % 18 // 3)[:, None]
            == jnp.arange(36)[None, :]).astype(UL18.dtype)  # sum over d
    T36 = (E1 * ULt) @ Msum  # [N, 36], m = a*6 + a'
    if tables is not None:
        UCU = _gather_sum_by_pose(tables, T36).reshape(K, 6, 6)
    else:
        UCU = jax.ops.segment_sum(
            T36, b.pose_idx, num_segments=K).reshape(K, 6, 6)
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
              tables: "ObsTables | None" = None, precond=None,
              kernel_ok: bool = True):
    """Preconditioned CG on the reduced camera system. Default
    preconditioner is exact block-Jacobi; pass ``precond`` (a callable
    r -> M^{-1} r, e.g. `banded.make_banded_precond`) to override.
    With ``tables``, matvecs use gather-table reductions (no scatters).

    ``kernel_ok``: whether the lane-major Pallas matvec kernel may be
    used. The kernel pays off when CG iterations dominate (block-Jacobi:
    XXL 5.66 -> 7.2 LM it/s, S 152 -> 260); with the banded
    cyclic-reduction preconditioner CG collapses to ~19 iterations and
    at K=1024 the kernel-in-LM-loop program runs 3.9x SLOWER end-to-end
    than the gather matvec (6.83 -> 1.77 it/s, r5 A/B on chip —
    isolated cg50 timings show the kernel faster, so the collapse is a
    whole-loop compilation pathology, not matvec cost). Callers with a
    non-Jacobi preconditioner pass False."""
    if precond is None:
        precond = _block_precond(schur_diag_blocks(b, tables))
    if tables is not None and kernel_ok and _use_matvec_kernel(b, tables):
        matvec = make_schur_matvec_kernel(b, tables)
    elif tables is not None:
        matvec = make_schur_matvec_gather(b, tables)
    else:
        matvec = lambda v: schur_matvec(b, v)

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
             tables: "ObsTables | None" = None, tracks=None,
             fused: bool | None = None):
    """One damped LM linear solve via Schur + PCG; returns
    (dx, grad_norm, pred_decrease) for the shared LM core. With ``tables``
    every segment reduction (assembly, rhs, back-substitution, predicted
    decrease, matvecs) is scatter-free. With ``tracks`` (a
    `banded.TrackInfo`) the preconditioner is the block-cyclic-reduction
    factorization of the banded part of S — exact when every track is
    contiguous, so CG collapses to a couple of iterations."""
    b = build_obs_blocks(problem, state, lam, tables=tables, fused=fused)
    K = b.Hpp.shape[0]
    J = b.Cinv.shape[0]
    precond = None
    if tracks is not None:
        from ceres_slam_tpu.solver import banded

        precond = banded.make_banded_precond(b, tracks, K)

    def sum_by_pose(per_obs):
        if tables is not None:
            return _gather_sum_by_pose(tables, per_obs)
        return jax.ops.segment_sum(per_obs, b.pose_idx, num_segments=K)

    def sum_by_point(per_obs):
        if tables is not None:
            return _gather_sum_by_point(tables, per_obs)
        return jax.ops.segment_sum(per_obs, b.point_idx, num_segments=J)

    # rhs = -(gp - U C^{-1} gl)   (flat-U algebra: see u18_vec)
    y = jnp.einsum("jab,jb->ja", b.Cinv, b.gl)
    Uy = sum_by_pose(u18_vec(b.U18, y[b.point_idx]))
    rhs = -(b.gp - Uy)

    dp, _ = pcg_solve(b, rhs, max_cg_iters, cg_tol, tables=tables,
                      precond=precond, kernel_ok=precond is None)

    # back-substitute landmarks: dl = -C^{-1}(gl + U^T dp)
    Utdp = sum_by_point(u18_t_vec(b.U18, dp[b.pose_idx]))
    dl = -jnp.einsum("jab,jb->ja", b.Cinv, b.gl + Utdp)

    dx = jnp.concatenate([dp.reshape(-1), dl.reshape(-1)])
    grad_norm = jnp.maximum(jnp.max(jnp.abs(b.gp)), jnp.max(jnp.abs(b.gl)))
    # predicted decrease with the undamped blocks
    Udl = sum_by_pose(u18_vec(b.U18, dl[b.point_idx]))
    g_dot_dx = jnp.sum(b.gp * dp) + jnp.sum(b.gl * dl)
    dxHdx = (
        jnp.einsum("ka,kab,kb->", dp, b.Hpp_undamped, dp)
        + 2.0 * jnp.sum(dp * Udl)
        + jnp.einsum("ja,jab,jb->", dl, b.Hll, dl)
    )
    pred = -(g_dot_dx + 0.5 * dxHdx)
    return dx, grad_norm, pred


@partial(jax.jit, static_argnames=("config", "max_cg_iters", "track_L"))
def _solve_ba_pcg_jit(problem, state0, config, max_cg_iters, cg_tol, tables,
                      track_arrays=None, track_L=None):
    tracks = None
    if track_arrays is not None:
        from ceres_slam_tpu.solver import banded

        tracks = banded.TrackInfo(*track_L, *track_arrays)
    return lm.lm_solve(
        state0,
        config,
        lambda s: dense.ba_cost(problem, s),
        lambda s, lam: pcg_step(problem, s, lam, max_cg_iters, cg_tol,
                                tables=tables, tracks=tracks),
        lambda s, dx: dense._retract_state(problem, s, dx),
    )


def solve_ba_pcg(
    problem: dense.StereoBAProblem,
    state0: dense.BAState,
    config: lm.SolveConfig = lm.SolveConfig(),
    max_cg_iters: int = 100,
    cg_tol: float = 1e-6,
    tables: "ObsTables | None" = None,
    precond: str = "auto",
):
    """LM with the matrix-free Schur-PCG linear solver — the scalable path
    for full-batch BA (replaces Ceres ITERATIVE_SCHUR + SuiteSparse).

    On TPU the gather tables are built automatically (host-side, one-time
    per problem structure) so the whole solve is scatter-free; pass
    ``tables=False`` to force the segment-sum path.

    ``precond``: 'jacobi' = exact block-Jacobi; 'banded' = block-cyclic-
    reduction factorization of the banded part of S (the SuiteSparse-role
    solver — see `solver/banded.py`); 'auto' = banded when >= 50% of
    landmarks form contiguous bounded tracks — it wins at every measured
    scale on both backends under the full-f32 matmul policy (r4 sweep,
    BASELINE.md: collapsing CG to 1-16 iterations saves more than the
    log-depth factorization costs)."""
    K = state0.poses.shape[0]
    J = state0.points.shape[0]
    if tables is None and jax.devices()[0].platform == "tpu":
        tables = build_obs_tables(
            problem.stereo.pose_idx, problem.stereo.point_idx, K, J)
    if tables is False:
        tables = None
    track_arrays = track_L = None
    if precond in ("banded", "auto"):
        from ceres_slam_tpu.solver import banded

        tracks = banded.build_track_info(
            problem.stereo.pose_idx, problem.stereo.point_idx, K, J,
            valid=problem.stereo.valid
            & problem.point_valid[problem.stereo.point_idx])
        # banded wins at every scale on both backends under the full-f32
        # matmul policy (r4 sweep: S 285 vs 152, XL 78 vs 53, XXL 6.8 vs
        # 5.7 it/s on TPU — fewer CG iterations means fewer
        # precision-taxed matvecs; CPU won with it since r3)
        if precond == "banded" or tracks.eligible_frac >= 0.5:
            track_L = (tracks.L, tracks.n_super)
            track_arrays = tuple(tracks[2:])
    return _solve_ba_pcg_jit(problem, state0, config, max_cg_iters, cg_tol,
                             tables, track_arrays, track_L)
