"""Banded Schur-complement preconditioner via block cyclic reduction.

The TPU-native counterpart of the sparse-Cholesky role SuiteSparse plays
for the reference (SPARSE_SCHUR / SPARSE_NORMAL_CHOLESKY,
/root/reference/tests/dataset_ba_phong.cpp:87, blowup_test.cpp:106):
exploit the SPARSITY STRUCTURE of odometry-style bundle adjustment
instead of iterating against it.

Key observation: when feature tracks are CONTIGUOUS and bounded (length
<= L frames — true of real trackers and of every reference dataset), a
landmark couples only poses within L-1 frames of each other, so the
reduced camera matrix

    S = Hpp_damped - U C^{-1} U^T

is block-BANDED with block bandwidth L-1. Grouping L consecutive poses
into super-blocks of size m = 6L makes S block-TRIDIAGONAL in
super-blocks, which block CYCLIC REDUCTION factorizes and solves in
log2(K/L) levels of BATCHED dense [m, m] Cholesky/triangular/matmul ops
— MXU-friendly, log-depth instead of the O(CG-iterations) serial chain
of Jacobi-preconditioned PCG.

Landmarks whose observations are not contiguous-and-bounded are simply
left OUT of the banded matrix (their -U C^{-1} U^T term is negative
semidefinite, so omitting it keeps the preconditioner SPD) and CG mops
up the difference; with every landmark eligible the "preconditioner" is
the exact inverse and CG converges in one iteration.

All hot tensors use component-FLAT merged layouts ([J, L*18] slot rows,
[K, maxJ, 144] start-pose groups) — see BASELINE.md bench-hygiene notes
on TPU tiling: a trailing dim of 3 pads 43x, a trailing dim of 144 pads
1.8x.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TrackInfo(NamedTuple):
    """Host-built static structure for the banded preconditioner.

    ``L``/``n_super`` are Python ints (static); arrays are device
    constants. Slot tables address landmarks' observations sorted by
    pose; ineligible landmarks carry zero weights throughout.

    Start-pose grouping is BUCKETED: landmarks sharing a start pose are
    split into bins of <= BIN_CAP so the per-bin Gram tensors scale with
    the mean group size, not the max (start-pose counts are skewed; an
    unbucketed table made a 5 GB padded temp at XXL).
    """

    L: int  # track-length bound (block bandwidth + 1)
    n_super: int  # number of super-blocks (ceil(K / L), padded even)
    slots: jnp.ndarray  # [J, L] obs index of slot o (pose-ascending)
    slot_w: jnp.ndarray  # [J, L] 1/0 slot validity (0 for ineligible j)
    start: jnp.ndarray  # [J] first pose of the track (0 for ineligible)
    by_bin: jnp.ndarray  # [B, BIN_CAP] landmark ids, bin -> one start pose
    by_bin_w: jnp.ndarray  # [B, BIN_CAP]
    start_bins: jnp.ndarray  # [K, R] bin ids of each start pose
    start_bins_w: jnp.ndarray  # [K, R]
    eligible_frac: float  # diagnostic: fraction of landmarks in the band


BIN_CAP = 32


def build_track_info(pose_idx, point_idx, K: int, J: int,
                     L: int | None = None, L_cap: int = 16,
                     valid=None) -> TrackInfo:
    """Analyze observation structure on the host (numpy, one-time).

    A landmark is ELIGIBLE iff its observed poses are distinct,
    consecutive integers (a contiguous track) of length <= L. ``L``
    defaults to the largest eligible track length (capped at ``L_cap``).

    ``valid`` (the solver's obs mask, ``stereo.valid & point_valid[...]``)
    excludes padding/masked observations from the structure analysis —
    without it, padded rows (typically index 0) can break the contiguity
    of real tracks or inflate landmark 0's count, silently degrading the
    preconditioner (correctness is unaffected: masked rows carry U18=0).
    """
    pose_idx = np.asarray(pose_idx)
    point_idx = np.asarray(point_idx)
    if valid is not None:
        keep = np.nonzero(np.asarray(valid))[0]
        # slot tables must address the ORIGINAL obs array: analyze the
        # filtered view, then map slot entries back through `keep`.
        info = build_track_info(pose_idx[keep], point_idx[keep], K, J,
                                L=L, L_cap=L_cap)
        slots = np.asarray(info.slots)
        mapped = keep[slots] * (np.asarray(info.slot_w) > 0)
        return info._replace(slots=jnp.asarray(mapped.astype(np.int32)))
    N = pose_idx.shape[0]

    # one composite sort: observations grouped by landmark, pose-ascending
    order = np.argsort(point_idx.astype(np.int64) * K + pose_idx,
                       kind="stable")
    ps = pose_idx[order]
    counts = np.bincount(point_idx, minlength=J)
    starts_csr = np.concatenate([[0], np.cumsum(counts)])
    nonempty = counts > 0

    # contiguity: within a landmark, consecutive sorted poses step by 1
    adj = np.ones(N, bool)
    if N > 1:
        same_j = point_idx[order][1:] == point_idx[order][:-1]
        adj[1:] = ~same_j | (ps[1:] == ps[:-1] + 1)
    # all-adjacent per landmark (reduceat is wrong for empty groups; mask)
    eligible = np.zeros(J, bool)
    if N:
        red = np.minimum.reduceat(adj, np.minimum(starts_csr[:-1], N - 1))
        eligible = nonempty & red
    start = np.zeros(J, np.int32)
    start[nonempty] = ps[starts_csr[:-1][nonempty]]
    lengths = counts
    if L is None:
        el = lengths[eligible]
        L = int(min(L_cap, el.max())) if el.size else 1
    eligible &= lengths <= L

    # slot table: slots[j, o] = sorted obs o of landmark j (o < counts_j)
    slots = np.zeros((J, L), np.int32)
    slot_w = np.zeros((J, L), np.float32)
    oo = np.arange(L)[None, :]
    valid_slot = eligible[:, None] & (oo < counts[:, None])
    idx = np.minimum(starts_csr[:-1][:, None] + oo, max(0, N - 1))
    slots[valid_slot] = order[idx[valid_slot]]
    slot_w[valid_slot] = 1.0

    # group eligible landmarks by start pose (same CSR trick), bucketed
    # into bins of <= BIN_CAP
    el_idx = np.nonzero(eligible)[0]
    s_order = el_idx[np.argsort(start[el_idx], kind="stable")]
    cnt_s = np.bincount(start[el_idx], minlength=K)
    s_csr = np.concatenate([[0], np.cumsum(cnt_s)])
    nbins_s = np.maximum(1, -(-cnt_s // BIN_CAP))  # >=1 bin per pose
    B = int(nbins_s.sum())
    R = int(nbins_s.max())
    by_bin = np.zeros((B, BIN_CAP), np.int32)
    by_bin_w = np.zeros((B, BIN_CAP), np.float32)
    start_bins = np.zeros((K, R), np.int32)
    start_bins_w = np.zeros((K, R), np.float32)
    bin_id = 0
    for s in range(K):
        c = int(cnt_s[s])
        base = s_csr[s]
        for rbin in range(int(nbins_s[s])):
            lo = rbin * BIN_CAP
            n_here = max(0, min(BIN_CAP, c - lo))
            if n_here:
                by_bin[bin_id, :n_here] = s_order[base + lo: base + lo + n_here]
                by_bin_w[bin_id, :n_here] = 1.0
            start_bins[s, rbin] = bin_id
            start_bins_w[s, rbin] = 1.0
            bin_id += 1

    n_super = -(-K // L)
    if n_super % 2 and n_super > 1:
        n_super += 1  # keep the first reduction level simple
    return TrackInfo(
        L=L, n_super=n_super,
        slots=jnp.asarray(slots), slot_w=jnp.asarray(slot_w),
        start=jnp.asarray(start),
        by_bin=jnp.asarray(by_bin), by_bin_w=jnp.asarray(by_bin_w),
        start_bins=jnp.asarray(start_bins),
        start_bins_w=jnp.asarray(start_bins_w),
        eligible_frac=float(eligible.mean() if J else 0.0),
    )


# ---------------------------------------------------------------------------
# banded matrix assembly (jit)
# ---------------------------------------------------------------------------


def slot_scatter_index(t: TrackInfo, N: int) -> np.ndarray:
    """Host: per-observation flat slot index ``j*L + o`` (or the dump row
    ``J*L`` for obs outside any eligible track) — the scatter-side dual
    of the ``slots`` gather table, used by the DISTRIBUTED preconditioner
    (each shard scatters its local whitened rows, one psum builds V)."""
    slots = np.asarray(t.slots)
    w = np.asarray(t.slot_w)
    J, L = slots.shape
    out = np.full(N, J * L, np.int32)
    jj, oo = np.nonzero(w > 0)
    out[slots[jj, oo]] = (jj * L + oo).astype(np.int32)
    return out


def build_super_tridiag(b, t: TrackInfo):
    """Assemble the super-block tridiagonal of the banded part of S.

    ``b`` is a `pcg.ObsBlocks` (damped Hpp [K,6,6], damped inverted
    landmark diagonal Cinv [J,3,3], per-obs coupling U [N,6,3]).
    Returns D [n_super, m, m], E [n_super-1, m, m] with m = 6L.
    """
    dtype = b.U18.dtype
    J = b.Cinv.shape[0]
    L = t.L

    # per-landmark whitened slot rows V_j [6L, 3]: slot o's U block times
    # Lc_j (C^{-1} = Lc Lc^T), stacked at rows 6o..6o+5, so the banded
    # part of -U C^{-1} U^T restricted to the track is -V_j V_j^T.
    # Whitening happens PER OBS before the slot gather so every gathered
    # tensor stays component-flat (BASELINE.md TPU-tiling notes).
    from ceres_slam_tpu.solver import pcg

    UL18 = pcg.whitened_u18(b)  # [N, 18]: U C^{-1} U^T = UL UL^T
    V = (UL18[t.slots] * t.slot_w.astype(dtype)[..., None]
         ).reshape(J, L * 18)  # flat rows, f = o*18 + a*3 + c
    return super_tridiag_from_V(V, b.Hpp, t)


def super_tridiag_from_V(V: jnp.ndarray, Hpp: jnp.ndarray, t: TrackInfo):
    """D/E assembly from the whitened per-landmark slot rows ``V``
    [J, L*18] and the damped pose diagonal ``Hpp`` [K, 6, 6] — the shared
    back half of `build_super_tridiag`, callable where V was built
    distributively (scatter + psum in `parallel.sharded_pcg`)."""
    dtype = V.dtype
    K = Hpp.shape[0]
    J = V.shape[0]
    L, n_super = t.L, t.n_super
    m = 6 * L

    # bucketed Gram: per bin, A = [members*3, m] whitened columns, then
    # M_bin = A^T A via one batched MXU matmul; bins sum into their
    # start pose through the small start_bins table. Flat-gather +
    # deinterleave keeps every temp at the ~mean group size.
    B = t.by_bin.shape[0]
    cap = t.by_bin.shape[1]
    Gf = (V[t.by_bin] * t.by_bin_w.astype(dtype)[..., None])  # [B, cap, L*18]
    A = Gf.reshape(B, cap, m, 3).transpose(0, 1, 3, 2).reshape(B, cap * 3, m)
    M_bin = jnp.einsum("bpu,bpv->buv", A, A)  # [B, m, m]
    Mb_flat = M_bin.reshape(B, m * m)
    M = jnp.einsum("krf,kr->kf", Mb_flat[t.start_bins],
                   t.start_bins_w.astype(dtype)).reshape(K, m, m)

    # embed each M_s (poses s..s+L-1) into the 2m-wide super window at
    # offset 6r, r = s mod L, then fold into D/E. Static per-r padding.
    pad_rows = n_super * L - K
    if pad_rows:
        M = jnp.concatenate(
            [M, jnp.zeros((pad_rows, m, m), dtype)], axis=0)
        Hpp = jnp.concatenate(
            [Hpp, jnp.broadcast_to(jnp.eye(6, dtype=dtype),
                                   (pad_rows, 6, 6))], axis=0)
    Mq = M.reshape(n_super, L, m, m)  # [q, r, m, m]
    # window accumulator [q, 2m, 2m]: sum_r Mq[q, r] at offset (6r, 6r)
    win = jnp.zeros((n_super, 2 * m, 2 * m), dtype)
    for r in range(L):
        pad = ((0, 0), (6 * r, m - 6 * r), (6 * r, m - 6 * r))
        win = win + jnp.pad(Mq[:, r], pad)

    D = -win[:, :m, :m]
    E = -win[:, :m, m:]
    # straddle: lower-right quadrant of window q belongs to D_{q+1}
    D = D.at[1:].add(-win[:-1, m:, m:])
    # pose-diagonal part of S (damped Hpp, incl. sun/prior aux blocks)
    Hq = Hpp.reshape(n_super, L, 6, 6)
    Ddiag = jnp.zeros((n_super, m, m), dtype)
    for r in range(L):
        Ddiag = Ddiag.at[:, 6 * r: 6 * r + 6, 6 * r: 6 * r + 6].set(Hq[:, r])
    D = D + Ddiag
    return D, (E[:-1] if n_super > 1 else E[:0])


# ---------------------------------------------------------------------------
# block cyclic reduction (jit)
# ---------------------------------------------------------------------------


def _chol_solve(ch, B):
    """Solve A X = B given ch = cholesky(A), batched over leading dims."""
    Y = jax.scipy.linalg.solve_triangular(ch, B, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(ch, -1, -2), Y, lower=False)


def ctridiag_factor(D, E):
    """Factor a SPD block-tridiagonal system by cyclic reduction.

    D [n, m, m] diagonal blocks, E [n-1, m, m] with row i carrying
    ``E[i] x_{i+1}`` (and row i+1 its transpose). Returns a list of
    per-level closures' data; pass to `ctridiag_solve`.
    """
    m = D.shape[-1]
    dtype = D.dtype
    levels = []
    while D.shape[0] > 1:
        n = D.shape[0]
        if n % 2:  # pad to even with an identity block (decoupled)
            D = jnp.concatenate([D, jnp.eye(m, dtype=dtype)[None]], axis=0)
            n += 1
        if E.shape[0] < n - 1:  # pad couplings with zeros
            E = jnp.concatenate(
                [E, jnp.zeros((n - 1 - E.shape[0], m, m), dtype)], axis=0)
        Dev, Dod = D[0::2], D[1::2]  # [n/2, m, m]
        E_eo = E[0::2]  # E_{2i}: even 2i -> odd 2i+1
        E_oe = E[1::2]  # E_{2i+1}: odd 2i+1 -> even 2i+2 (may be short)
        if E_oe.shape[0] < n // 2:
            E_oe = jnp.concatenate(
                [E_oe, jnp.zeros((n // 2 - E_oe.shape[0], m, m), dtype)],
                axis=0)
        ch = jnp.linalg.cholesky(Dod)
        Y1 = _chol_solve(ch, E_oe)  # D_od^{-1} E_{2i+1}
        Y2 = _chol_solve(ch, jnp.swapaxes(E_eo, -1, -2))  # D_od^{-1} E_{2i}^T
        # new diagonal over even indices
        t_right = jnp.einsum("iab,ibc->iac", E_eo, Y2)  # E_{2i} D^{-1} E^T
        t_left = jnp.einsum("iba,ibc->iac", E_oe, Y1)  # E^T_{2i-1} D^{-1} E
        Dnew = Dev - t_right
        Dnew = Dnew.at[1:].add(-t_left[:-1])
        Enew = -jnp.einsum("iab,ibc->iac", E_eo, Y1)[:-1]
        levels.append((ch, E_eo, E_oe, Y1, Y2))
        D, E = Dnew, Enew
    levels.append((jnp.linalg.cholesky(D), None, None, None, None))
    return levels


def ctridiag_solve(levels, b):
    """Solve using a `ctridiag_factor` result. b: [n, m]."""
    m = b.shape[-1]
    dtype = b.dtype
    # forward reduction: fold odd rows into even rows
    stack = []
    for ch, E_eo, E_oe, Y1, Y2 in levels[:-1]:
        n = b.shape[0]
        if n % 2:
            b = jnp.concatenate([b, jnp.zeros((1, m), dtype)], axis=0)
            n += 1
        b_ev, b_od = b[0::2], b[1::2]
        z = _chol_solve(ch, b_od[..., None])[..., 0]  # D_od^{-1} b_od
        bnew = b_ev - jnp.einsum("iab,ib->ia", E_eo, z)
        bnew = bnew.at[1:].add(-jnp.einsum("iba,ib->ia", E_oe, z)[:-1])
        stack.append(z)
        b = bnew
    ch_root = levels[-1][0]
    x = _chol_solve(ch_root, b[..., None])[..., 0]
    # back-substitution
    for (ch, E_eo, E_oe, Y1, Y2), z in zip(reversed(levels[:-1]),
                                           reversed(stack)):
        n2 = z.shape[0]
        x_ev = x
        if x_ev.shape[0] < n2:
            x_ev = jnp.concatenate(
                [x_ev, jnp.zeros((n2 - x_ev.shape[0], m), dtype)], axis=0)
        x_next = jnp.concatenate([x_ev[1:], jnp.zeros((1, m), dtype)], axis=0)
        x_od = z - jnp.einsum("iab,ib->ia", Y2, x_ev[:n2]) \
            - jnp.einsum("iab,ib->ia", Y1, x_next[:n2])
        out = jnp.zeros((2 * n2, m), dtype)
        out = out.at[0::2].set(x_ev[:n2]).at[1::2].set(x_od)
        x = out
    return x


def make_banded_precond(b, t: TrackInfo, K: int):
    """Factor the banded part of S; return ``apply(r) -> M^{-1} r``."""
    D, E = build_super_tridiag(b, t)
    levels = ctridiag_factor(D, E)
    m = 6 * t.L
    n_pad = t.n_super * t.L

    def apply(r: jnp.ndarray) -> jnp.ndarray:  # [K, 6]
        rf = r.reshape(-1)
        rf = jnp.concatenate(
            [rf, jnp.zeros(n_pad * 6 - rf.shape[0], r.dtype)])
        x = ctridiag_solve(levels, rf.reshape(t.n_super, m))
        return x.reshape(-1)[: K * 6].reshape(K, 6)

    return apply
