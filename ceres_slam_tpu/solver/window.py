"""Scatter-free explicit-Schur window solver (TPU latency-optimized).

The general PCG path (`ceres_slam_tpu/solver/pcg.py`) is matrix-free and
scales to full-batch BA, but on TPU its serial CG chain of small
gather/segment-sum ops is dispatch-latency-bound: profiling on the v5e
chip (scripts/profile_pcg*.py, profile_pieces.py) shows ~10-40us per XLA
fusion group and element-serial row gathers, leaving the chip >95% idle at
sliding-window scale. This module is the window-scale (K <= ~128 poses)
replacement, built on three measured facts:

  1. TPU scatters/gathers serialize, but ONE-HOT MXU MATMULS do the same
     index arithmetic at full throughput for small K.
  2. The reduced camera matrix S (6K x 6K <= 768 x 768) is small enough to
     materialize; a dense Cholesky solve on it costs ~0.1 ms.
  3. Observation structure is STATIC across LM iterations, so the
     landmark-grouped padded layout, its one-hot matrices, and all
     validity/gauge weights are built once on the host.

Layout: observations are reordered landmark-grouped and padded to
``[J, O]`` (O = max obs per landmark; invalid slots masked), making every
landmark-side reduction a contiguous reshape-sum and every pose-side
reduction a ``[M, K]`` one-hot matmul (M = J*O). The damped step is

    S = Hpp_d (block diag) - W C^{-1} W^T,   W by a batched one-hot
    contraction, dense Cholesky on S, landmarks back-substituted

-- the same algebra as solver/schur.py (Ceres SPARSE_SCHUR,
blowup_test.cpp:106) with zero scatters. Two implementations share it:

  * `window_step` — pure XLA, any dtype/backend (correctness reference,
    float64 CPU pipelines).
  * the fused path in `solve_ba_window` — the Pallas mega-kernel
    `ops.pallas_kernels.window_factor_blocks` evaluates the factor math,
    the pose gather (one-hot MXU), the pose-side Gram reduction AND the
    stereo cost in one pass; the LM loop is restructured so each
    iteration runs the kernel exactly once (the candidate state's factor
    pass doubles as its cost evaluation and, on acceptance, as the next
    iteration's normal equations).

Exact same minimum as the dense/Schur/PCG paths (landmark elimination is
algebraic); validated against them in tests/test_window.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ceres_slam_tpu.ops import factors
from ceres_slam_tpu.ops import pallas_kernels
from ceres_slam_tpu.solver import dense, dogleg, lm
from ceres_slam_tpu.solver.schur import _inv3x3


class WindowLayout(NamedTuple):
    """Static (host-built) landmark-grouped observation layout.

    ``problem`` is the input problem with its stereo observations
    reordered landmark-grouped and padded to ``M = J*O`` entries
    (``O`` = max obs per landmark; padding slots have valid=False and
    point at their landmark so reshape-sums stay correct). ``onehot`` is
    the ``[M, K]`` pose indicator (zero rows for padding). The lane-major
    fields feed the fused Pallas kernel; ``M_pad`` >= M is the TILE
    multiple the kernel runs on.
    """

    problem: dense.StereoBAProblem
    onehot: jnp.ndarray  # [M, K]
    O: int
    # --- fused-kernel statics (lane-major, padded to M_pad)
    onehotT: jnp.ndarray  # [K, M_pad]
    uvdT: jnp.ndarray  # [3, M_pad]
    stiffT: jnp.ndarray  # [9, M_pad]
    weightT: jnp.ndarray  # [1, M_pad]  valid & point_valid
    pose_freeT: jnp.ndarray  # [1, M_pad]  ~fixed_pose[pose_idx]
    onehot_jok: jnp.ndarray  # [J, O, K] (for the W contraction)


def build_window_layout(problem: dense.StereoBAProblem, K: int, J: int,
                        O_pad: int | None = None) -> WindowLayout:
    """Host-side: reorder stereo obs landmark-grouped, pad, build one-hots
    and static weights. Observation structure must be concrete (outside
    jit).

    Only VALID observations occupy slots: padding rows (valid=False,
    point_idx=0) must not count toward landmark 0's slot budget, or O —
    and with it every [J, O, *] shape — balloons to ~the pad size and
    varies per window. ``O_pad`` fixes the slot count to a static budget
    so every window of a sliding-window pass shares ONE compiled program
    (without it, a 200-state pass compiles ~200 programs and eventually
    exhausts the process's mmap budget — LLVM 'Cannot allocate memory').
    """
    st = problem.stereo
    pose_idx = np.asarray(st.pose_idx)
    point_idx = np.asarray(st.point_idx)
    valid = np.asarray(st.valid)
    dtype = np.asarray(st.uvd).dtype

    vrows = np.nonzero(valid)[0]
    order = vrows[np.argsort(point_idx[vrows], kind="stable")]
    counts = np.bincount(point_idx[vrows], minlength=J)
    O = max(1, int(counts.max()))
    if O_pad is not None:
        assert O <= O_pad, f"O_pad {O_pad} < required slots {O}"
        O = O_pad
    slot = np.zeros((J, O), np.int64)
    w = np.zeros((J, O), bool)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for j in range(J):
        c = counts[j]
        slot[j, :c] = order[starts[j] : starts[j] + c]
        w[j, :c] = True
    flat = slot.reshape(-1)
    wf = w.reshape(-1)
    M = J * O

    uvd = np.asarray(st.uvd)[flat]
    stiff = np.asarray(st.stiffness)[flat]
    p_idx = np.where(wf, pose_idx[flat], 0).astype(np.int32)
    v = wf & valid[flat]

    new_stereo = dense.StereoObs(
        uvd=jnp.asarray(uvd),
        stiffness=jnp.asarray(stiff),
        pose_idx=jnp.asarray(p_idx),
        point_idx=jnp.asarray(np.repeat(np.arange(J, dtype=np.int32), O)),
        valid=jnp.asarray(v),
    )
    onehot_np = (
        np.where(wf, pose_idx[flat], -1)[:, None] == np.arange(K)[None, :]
    ).astype(dtype)

    # fused-kernel statics, padded to a TILE multiple
    TILE = pallas_kernels.TILE
    M_pad = max(TILE, ((M + TILE - 1) // TILE) * TILE)
    point_valid = np.asarray(problem.point_valid)
    fixed_pose = np.asarray(problem.fixed_pose_mask)
    w_obs = (v & point_valid[np.repeat(np.arange(J), O)]).astype(dtype)
    wp_obs = (~fixed_pose[p_idx]).astype(dtype)

    def lane(x, rows):  # [M, rows] -> [rows, M_pad]
        out = np.zeros((rows, M_pad), dtype)
        out[:, :M] = x.reshape(M, rows).T
        return jnp.asarray(out)

    onehotT = np.zeros((K, M_pad), dtype)
    onehotT[:, :M] = onehot_np.T
    return WindowLayout(
        problem=problem._replace(stereo=new_stereo),
        onehot=jnp.asarray(onehot_np),
        O=O,
        onehotT=jnp.asarray(onehotT),
        uvdT=lane(uvd, 3),
        stiffT=lane(stiff.reshape(M, 9), 9),
        weightT=lane(w_obs[:, None], 1),
        pose_freeT=lane(wp_obs[:, None], 1),
        onehot_jok=jnp.asarray(onehot_np.reshape(J, O, K)),
    )


def _schur_reduce(Hpp, Hll, U_jo, onehot_jok, lam):
    """Pin empty diagonals, apply LM damping, eliminate the landmark
    blocks. Returns the reduced camera system and the pieces the solve /
    covariance paths share:

    ``(S [6K,6K], Cinv [J,3,3], Wf [6K,3J], WCf [6K,3J],
       Hpp_pinned, Hll_pinned)``.
    """
    K = Hpp.shape[0]
    J = Hll.shape[0]
    dtype = Hpp.dtype
    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    # pin empty diagonals (fixed poses / invalid points) to identity
    dpp = jnp.einsum("kaa->ka", Hpp)
    Hpp = Hpp + eye6 * jnp.all(dpp == 0.0, axis=-1)[:, None, None].astype(dtype)
    dll = jnp.einsum("jaa->ja", Hll)
    Hll_p = Hll + eye3 * jnp.all(dll == 0.0, axis=-1)[:, None, None].astype(dtype)

    # LM damping + closed-form landmark inversion
    Hpp_d = Hpp + lam * jnp.einsum(
        "ka,ab->kab", jnp.clip(jnp.einsum("kaa->ka", Hpp), 1e-12, 1e32), eye6)
    C_d = Hll_p + lam * jnp.einsum(
        "ja,ab->jab", jnp.clip(jnp.einsum("jaa->ja", Hll_p), 1e-12, 1e32), eye3)
    Cinv = _inv3x3(C_d)

    # UC[j,o,a,c] = sum_b U[j,o,a,b] Cinv[j,b,c] — hand-unrolled broadcast
    # (a batched-tiny einsum would materialize [J,O,6,3,3]).
    U4 = U_jo.reshape(J, -1, 6, 3)
    UC = sum(
        U4[..., b_, None] * Cinv[:, None, None, b_, :] for b_ in range(3)
    )  # [J, O, 6, 3]

    # W / WC via batched one-hot contraction over the O slots.
    # precision=HIGHEST throughout: the TPU MXU default rounds f32 inputs
    # to one bf16 pass — fatal for ill-conditioned reduced systems (the
    # flagship's 1e-12-prior chain spans ~12 orders of magnitude).
    HI = jax.lax.Precision.HIGHEST

    def contract(X):  # [J, O, 6, 3] -> [K*6, J*3]
        Wj = jax.lax.dot_general(
            onehot_jok, X.reshape(J, -1, 18),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=dtype,
            precision=HI,
        )  # [J, K, 18]
        return Wj.reshape(J, K, 6, 3).transpose(1, 2, 0, 3).reshape(6 * K, 3 * J)

    Wf = contract(U4)
    WCf = contract(UC)

    S = -jnp.dot(WCf, Wf.T, preferred_element_type=dtype, precision=HI)
    S = S.reshape(K, 6, K, 6) + jnp.eye(K, dtype=dtype)[:, None, :, None] * Hpp_d[:, :, None, :]
    S = S.reshape(6 * K, 6 * K)
    return S, Cinv, Wf, WCf, Hpp, Hll_p


def _equilibrated_cho(S):
    """Symmetric Jacobi equilibration + Cholesky: S spans ~8 orders of
    magnitude at KITTI scales, past float32 Cholesky's reach.
    D^-1/2 S D^-1/2 has unit diagonal (condition ~ its off-diagonal
    coupling only), so the factorization survives in f32; solutions are
    rescaled exactly. Returns ``(solve_fn, s)`` with
    ``solve_fn(b) = S^{-1} b`` (b may be a matrix of columns)."""
    d = jnp.diagonal(S)
    s = jax.lax.rsqrt(jnp.clip(d, 1e-30, jnp.inf))
    S_eq = S * (s[:, None] * s[None, :])
    L, low = jax.scipy.linalg.cho_factor(S_eq, lower=True)

    def solve(b):
        scaled = b * (s[:, None] if b.ndim == 2 else s)
        x = jax.scipy.linalg.cho_solve((L, low), scaled)
        return x * (s[:, None] if b.ndim == 2 else s)

    return solve, s


def pose_marginal_covariance(Hpp, Hll, U_jo, onehot_jok, pose_idx):
    """6x6 tangent marginal covariance of pose ``pose_idx`` from the
    block system — the Schur-reduced equivalent of
    `dense.pose_tangent_covariance` (ceres::Covariance::
    GetCovarianceBlockInTangentSpace, tests/dataset_vo_sun.cpp:159-183):
    for H = [[Hpp, W], [W^T, Hll]], the pose-block marginal of H^{-1} is
    (S^{-1})_{kk} with S the UNDAMPED reduced camera matrix."""
    K = Hpp.shape[0]
    dtype = Hpp.dtype
    S, *_ = _schur_reduce(Hpp, Hll, U_jo, onehot_jok, jnp.asarray(0.0, dtype))
    solve, _ = _equilibrated_cho(S)
    base = 6 * jnp.asarray(pose_idx, jnp.int32)
    zero = jnp.asarray(0, jnp.int32)
    E = jax.lax.dynamic_update_slice(
        jnp.zeros((6 * K, 6), dtype), jnp.eye(6, dtype=dtype), (base, zero)
    )
    X = solve(E)
    return jax.lax.dynamic_slice(X, (base, zero), (6, 6))


def _schur_solve(problem, Hpp, Hll, U_jo, gp, gl, onehot_jok, lam):
    """Shared scatter-free Schur elimination from block inputs.

    ``U_jo [J, O, 18]`` already carries validity/gauge masking. Returns
    (dx, grad_norm, pred_decrease)."""
    K = Hpp.shape[0]
    J = Hll.shape[0]
    HI = jax.lax.Precision.HIGHEST
    S, Cinv, Wf, WCf, Hpp, Hll_p = _schur_reduce(Hpp, Hll, U_jo, onehot_jok, lam)
    rhs = -(gp.reshape(-1) - jnp.dot(WCf, gl.reshape(-1), precision=HI))
    solve, _ = _equilibrated_cho(S)
    dp = solve(rhs)

    Wt_dp = jnp.dot(Wf.T, dp, precision=HI).reshape(J, 3)
    dl = -jnp.einsum("jab,jb->ja", Cinv, gl + Wt_dp, precision=HI)

    dx = jnp.concatenate([dp, dl.reshape(-1)])
    grad_norm = jnp.maximum(jnp.max(jnp.abs(gp)), jnp.max(jnp.abs(gl)))

    dp_r = dp.reshape(K, 6)
    g_dot_dx = jnp.sum(gp * dp_r) + jnp.sum(gl * dl)
    dxHdx = (
        jnp.einsum("ka,kab,kb->", dp_r, Hpp, dp_r, precision=HI)
        + 2.0 * jnp.dot(dp, jnp.dot(Wf, dl.reshape(-1), precision=HI),
                        precision=HI)
        + jnp.einsum("ja,jab,jb->", dl, Hll_p, dl, precision=HI)
    )
    pred = -(g_dot_dx + 0.5 * dxHdx)
    return dx, grad_norm, pred


class _FusedBlocks(NamedTuple):
    """Reduced block system from one factor pass (stereo contributions
    only — aux sun/prior blocks are added at solve time)."""

    Hpp: jnp.ndarray  # [K, 6, 6]
    Hll: jnp.ndarray  # [J, 3, 3]
    U_jo: jnp.ndarray  # [J, O, 18]
    gp: jnp.ndarray  # [K, 6]
    gl: jnp.ndarray  # [J, 3]
    stereo_cost: jnp.ndarray  # []


def _masked_aux_blocks(problem, state, dtype):
    """Sun + prior pose blocks with gauge masking applied."""
    Hpp_aux, gp_aux = dense.aux_pose_blocks(problem, state)
    free_pose = (~problem.fixed_pose_mask).astype(dtype)
    return Hpp_aux * free_pose[:, None, None], gp_aux * free_pose[:, None]


def _xla_blocks(layout: WindowLayout, state: dense.BAState):
    """Stereo block system from the landmark-grouped layout (pure XLA).

    Returns ``(Hpp [K,6,6], Hll [J,3,3], U_jo [J,O,18], gp [K,6],
    gl [J,3])`` — stereo contributions only (aux blocks added by the
    caller), with validity/gauge masking already applied."""
    problem = layout.problem
    st = problem.stereo
    K = state.poses.shape[0]
    J = state.points.shape[0]
    O = st.uvd.shape[0] // J  # static (layout.O may be traced under jit)
    dtype = state.poses.dtype
    onehot = layout.onehot.astype(dtype)

    # --- factor evaluation (whitened residuals + tangent Jacobians)
    r, J_pose, J_pt = factors.stereo_reprojection(
        problem.camera, state.poses[st.pose_idx], state.points[st.point_idx],
        st.uvd, st.stiffness,
    )
    v = (st.valid & problem.point_valid[st.point_idx]).astype(dtype)
    wp = (~problem.fixed_pose_mask[st.pose_idx]).astype(dtype)
    r = r * v[:, None]
    J_pose = J_pose * (v * wp)[:, None, None]
    J_pt = J_pt * v[:, None, None]

    # --- landmark side: contiguous reshape-sums (no segment scatter)
    HI = jax.lax.Precision.HIGHEST
    Hll = jnp.einsum("nri,nrj->nij", J_pt, J_pt,
                     precision=HI).reshape(J, O, 3, 3).sum(1)
    gl = jnp.einsum("nri,nr->ni", J_pt, r, precision=HI).reshape(J, O, 3).sum(1)
    U_jo = jnp.einsum("nri,nrj->nij", J_pose, J_pt,
                      precision=HI).reshape(J, O, 18)

    # --- pose side: one-hot MXU reductions (HIGHEST: see _schur_reduce)
    Hpp_c = jnp.einsum("nri,nrj->nij", J_pose, J_pose,
                       precision=HI).reshape(-1, 36)
    gp_c = jnp.einsum("nri,nr->ni", J_pose, r, precision=HI)
    pose_red = jnp.dot(onehot.T, jnp.concatenate([Hpp_c, gp_c], axis=1),
                       preferred_element_type=dtype,
                       precision=jax.lax.Precision.HIGHEST)  # [K, 42]
    Hpp = pose_red[:, :36].reshape(K, 6, 6)
    gp = pose_red[:, 36:]
    stereo_cost = 0.5 * jnp.sum(r * r)
    return _FusedBlocks(
        Hpp=Hpp, Hll=Hll, U_jo=U_jo, gp=gp, gl=gl, stereo_cost=stereo_cost
    )


def window_step(layout: WindowLayout, state: dense.BAState, lam: jnp.ndarray):
    """One damped LM linear solve, scatter-free (pure XLA — any backend).

    Returns ``(dx [6K+3J], grad_norm, pred_decrease)`` for the shared LM
    core — drop-in for `pcg.pcg_step` / `schur.schur_step`.
    """
    problem = layout.problem
    dtype = state.poses.dtype
    b = _xla_blocks(layout, state)
    Hpp_aux, gp_aux = _masked_aux_blocks(problem, state, dtype)
    return _schur_solve(
        problem, b.Hpp + Hpp_aux, b.Hll, b.U_jo, b.gp + gp_aux, b.gl,
        layout.onehot_jok.astype(dtype), lam,
    )


def window_marginal_covariance(
    layout: WindowLayout, state: dense.BAState, pose_idx
) -> jnp.ndarray:
    """6x6 tangent marginal covariance of one pose at ``state`` via the
    scatter-free block system (exact same value as
    `dense.pose_tangent_covariance`, computed without materializing H)."""
    dtype = state.poses.dtype
    b = _xla_blocks(layout, state)
    Hpp_aux, _ = _masked_aux_blocks(layout.problem, state, dtype)
    return pose_marginal_covariance(
        b.Hpp + Hpp_aux, b.Hll, b.U_jo, layout.onehot_jok.astype(dtype), pose_idx
    )


# ---------------------------------------------------------------------------
# Fused path: Pallas factor kernel + block-carrying LM loop
# ---------------------------------------------------------------------------


def _fused_blocks(layout: WindowLayout, state: dense.BAState,
                  interpret: bool) -> _FusedBlocks:
    """One Pallas factor pass -> reduced block system + stereo cost."""
    problem = layout.problem
    K = state.poses.shape[0]
    J = state.points.shape[0]
    M_pad = layout.onehotT.shape[1]
    O = layout.problem.stereo.uvd.shape[0] // J  # static
    dtype = jnp.float32

    # per-observation landmark positions: broadcast (landmark-grouped!)
    pT = jnp.broadcast_to(
        state.points.T.astype(dtype)[:, :, None], (3, J, O)
    ).reshape(3, J * O)
    pT = jnp.pad(pT, ((0, 0), (0, M_pad - J * O)))

    hll, u, gl, hppgp = pallas_kernels.window_factor_blocks(
        problem.camera,
        state.poses.T.astype(dtype),
        layout.onehotT,
        pT,
        layout.uvdT,
        layout.stiffT,
        layout.weightT,
        layout.pose_freeT,
        interpret=interpret,
    )
    M = J * O
    Hll = hll[:, :M].reshape(9, J, O).sum(-1).T.reshape(J, 3, 3)
    gl_r = gl[:, :M].reshape(3, J, O).sum(-1).T
    U_jo = u[:, :M].T.reshape(J, O, 18)
    Hpp = hppgp[:36].T.reshape(K, 6, 6)
    gp = hppgp[36:42].T
    return _FusedBlocks(Hpp=Hpp, Hll=Hll, U_jo=U_jo, gp=gp, gl=gl_r,
                        stereo_cost=jnp.sum(hppgp[42]))


def solve_ba_window(
    problem: dense.StereoBAProblem,
    state0: dense.BAState,
    config: lm.SolveConfig = lm.SolveConfig(),
    fused: bool | None = None,
    strategy: str = "lm",
    O_pad: int | None = None,
):
    """Trust-region solve with the scatter-free explicit-Schur window step.

    Builds the static landmark-grouped layout on the host (observation
    structure must be concrete), then runs the whole minimizer loop
    jitted. Intended for K <= ~128 (S is 6K x 6K dense); use
    `pcg.solve_ba_pcg` beyond that.

    ``fused=None`` auto-selects the Pallas mega-kernel path on TPU for
    float32 problems (the latency-optimized configuration: ONE factor
    kernel per iteration) and the pure-XLA step elsewhere.

    ``strategy`` selects the trust-region strategy: ``"lm"`` (Levenberg-
    Marquardt) or ``"dogleg"`` (SUBSPACE_DOGLEG, the reference flagship's
    configuration — tests/dataset_vo_sun.cpp:142-143).
    """
    K = state0.poses.shape[0]
    J = state0.points.shape[0]
    layout = build_window_layout(problem, K, J, O_pad=O_pad)
    if fused is None:
        fused = _use_fused(state0)
    interpret = jax.devices()[0].platform != "tpu"
    return _solve_jit(layout, problem, state0, config, fused, interpret, strategy)


def _use_fused(state0) -> bool:
    return (
        jax.devices()[0].platform == "tpu"
        and state0.poses.dtype == jnp.float32
    )


def solve_ba_window_with_covariance(
    problem: dense.StereoBAProblem,
    state0: dense.BAState,
    pose_idx,
    config: lm.SolveConfig = lm.SolveConfig(),
    fused: bool | None = None,
    strategy: str = "lm",
    O_pad: int | None = None,
):
    """Window solve + tangent marginal covariance of pose ``pose_idx`` in
    ONE device call — the sliding-window prior-chain engine
    (tests/dataset_vo_sun.cpp:159-183), built on the scatter-free Schur
    system instead of the dense H of `dense.solve_ba_with_covariance`
    (the reduced S is 6K x 6K = 12 x 12 at the flagship window size vs a
    dense [6K+3J]^2 factorization)."""
    K = state0.poses.shape[0]
    J = state0.points.shape[0]
    layout = build_window_layout(problem, K, J, O_pad=O_pad)
    pose_idx = jnp.asarray(pose_idx, jnp.int32)
    if fused is None:
        fused = _use_fused(state0)
    interpret = jax.devices()[0].platform != "tpu"
    return _solve_cov_jit(
        layout, problem, state0, pose_idx, config, fused, interpret, strategy
    )


def _auto_schur_dtype(state0) -> str:
    """Mixed-precision policy: the factor evaluation (the FLOPs) stays in
    the state dtype, but the Schur reduce/factorize/covariance — the
    ill-conditioned part of the flagship's 1e-12-prior chain
    (dataset_problem_sun.cpp:80) — is promoted to float64 whenever x64 is
    available. At window scale the promoted ops are a few thousand
    elements, so the cost is negligible even with emulated f64 on TPU."""
    if state0.poses.dtype == jnp.float32 and jax.config.jax_enable_x64:
        return "float64"
    return "state"


def _make_schur_solve(schur_dtype: str):
    """`_schur_solve` optionally promoted to f64 (inputs up, outputs back)."""
    if schur_dtype != "float64":
        return _schur_solve

    def solve(problem, Hpp, Hll, U_jo, gp, gl, onehot_jok, lam):
        out_dtype = Hpp.dtype
        f64 = jnp.float64
        dx, gn, pred = _schur_solve(
            problem, Hpp.astype(f64), Hll.astype(f64), U_jo.astype(f64),
            gp.astype(f64), gl.astype(f64), onehot_jok.astype(f64),
            lam.astype(f64),
        )
        return dx.astype(out_dtype), gn.astype(out_dtype), pred.astype(out_dtype)

    return solve


def _total_blocks_fn(layout, problem, fused: bool, interpret: bool):
    """``state -> (blocks, total_cost)``: one factor pass (Pallas fused or
    pure XLA) plus the cheap aux (sun/prior) cost terms."""
    if fused:
        def total(state):
            b = _fused_blocks(layout, state, interpret)
            return b, b.stereo_cost + dense.ba_cost_aux(problem, state).astype(
                jnp.float32
            )
    else:
        def total(state):
            b = _xla_blocks(layout, state)
            return b, b.stereo_cost + dense.ba_cost_aux(problem, state).astype(
                b.stereo_cost.dtype
            )
    return total


def _run_loop(layout, problem, state0, config, fused, interpret, strategy):
    total_blocks = _total_blocks_fn(layout, problem, fused, interpret)
    dtype = jnp.float32 if fused else state0.poses.dtype
    onehot_jok = layout.onehot_jok.astype(dtype)
    schur_solve = _make_schur_solve(_auto_schur_dtype(state0))
    if strategy == "dogleg":
        return dogleg.blocks_dogleg_loop(
            problem, state0, config, total_blocks, onehot_jok, schur_solve
        )
    if strategy != "lm":
        raise ValueError(f"unknown trust-region strategy: {strategy!r}")
    return blocks_lm_loop(
        problem, state0, config, total_blocks, onehot_jok, schur_solve
    )


@partial(jax.jit, static_argnames=("config", "fused", "interpret", "strategy"))
def _solve_jit(layout, problem, state0, config, fused=False, interpret=True,
               strategy="lm"):
    state, summary, _ = _run_loop(
        layout, problem, state0, config, fused, interpret, strategy
    )
    return state, summary


@partial(jax.jit, static_argnames=("config", "fused", "interpret", "strategy"))
def _solve_cov_jit(layout, problem, state0, pose_idx, config, fused=False,
                   interpret=True, strategy="lm"):
    """Minimizer loop + covariance from its final carried blocks (the
    accepted state's factor pass already produced them — the covariance
    costs one extra 12x12-scale Schur reduce, no factor re-evaluation)."""
    state, summary, blocks = _run_loop(
        layout, problem, state0, config, fused, interpret, strategy
    )
    out_dtype = state.poses.dtype
    # Covariance shares the Schur-chain promotion policy: the prior chain's
    # 1e-12-init covariance (dataset_problem_sun.cpp:80) loses all digits in
    # a f32 factorization, so extract the marginal in f64 when available.
    dtype = (jnp.float64 if _auto_schur_dtype(state0) == "float64"
             else out_dtype)
    Hpp_aux, _ = _masked_aux_blocks(problem, state, dtype)
    cov = pose_marginal_covariance(
        blocks.Hpp.astype(dtype) + Hpp_aux, blocks.Hll.astype(dtype),
        blocks.U_jo.astype(dtype), layout.onehot_jok.astype(dtype), pose_idx,
    )
    return state, summary, cov.astype(out_dtype)


def blocks_lm_loop(problem, state0, config, total_blocks, onehot_jok,
                   schur_solve=_schur_solve):
    """Block-carrying LM loop: ONE factor pass per iteration.

    ``total_blocks(state) -> (_FusedBlocks, total_cost)`` evaluates the
    factors once, yielding both the candidate's cost (accept test) and,
    on acceptance, the next iteration's normal equations — halving the
    per-iteration factor work relative to the generic lm_solve structure
    (which evaluates step and cost separately). Shared by the Pallas
    fused path and the scanned sliding-window pipeline. Returns
    ``(state, summary, blocks_at_state)``.
    """
    blocks0, cost0 = total_blocks(state0)
    dtype = cost0.dtype

    class Carry(NamedTuple):
        state: dense.BAState
        blocks: _FusedBlocks
        lam: jnp.ndarray
        cost: jnp.ndarray
        grad_norm: jnp.ndarray
        it: jnp.ndarray
        done: jnp.ndarray
        cost_buf: jnp.ndarray  # [window] recent accepted costs (nonmonotonic)
        best_state: dense.BAState
        best_blocks: _FusedBlocks
        best_cost: jnp.ndarray
        history: tuple

    def cond(c):
        return (~c.done) & (c.it < config.max_iters)

    def body(c):
        Hpp_aux, gp_aux = _masked_aux_blocks(problem, c.state, dtype)
        dx, grad_norm, pred = schur_solve(
            problem, c.blocks.Hpp + Hpp_aux, c.blocks.Hll, c.blocks.U_jo,
            c.blocks.gp + gp_aux, c.blocks.gl, onehot_jok, c.lam,
        )
        dx_ok = jnp.all(jnp.isfinite(dx))
        dx = jnp.where(dx_ok, dx, jnp.zeros_like(dx))
        new_state = dense._retract_state(problem, c.state, dx)
        new_blocks, new_cost = total_blocks(new_state)

        actual = c.cost - new_cost
        rho = actual / jnp.maximum(pred, 1e-30)
        accept_ref = jnp.max(c.cost_buf) if config.nonmonotonic else c.cost
        accept = jnp.isfinite(new_cost) & (new_cost < accept_ref)
        lam_down = c.lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(
            accept,
            jnp.maximum(lam_down, config.min_lambda),
            jnp.minimum(c.lam * 4.0, config.max_lambda),
        )
        state = jax.tree.map(
            lambda n, o: jnp.where(accept, n, o), new_state, c.state)
        blocks = jax.tree.map(
            lambda n, o: jnp.where(accept, n, o), new_blocks, c.blocks)
        cost = jnp.where(accept, new_cost, c.cost)
        cost_buf = jnp.where(
            accept,
            c.cost_buf.at[c.it % config.nonmonotonic_window].set(new_cost),
            c.cost_buf,
        )
        better = accept & (new_cost < c.best_cost)
        best_state = jax.tree.map(
            lambda n, o: jnp.where(better, n, o), new_state, c.best_state)
        best_blocks = jax.tree.map(
            lambda n, o: jnp.where(better, n, o), new_blocks, c.best_blocks)
        best_cost = jnp.where(better, new_cost, c.best_cost)
        # ftol fires only on a REAL (non-negative) decrease: under
        # nonmonotonic acceptance an accepted uphill step has actual < 0
        # and must not terminate the solve (Ceres tests |cost_change|).
        small = accept & (actual >= 0.0) & (
            actual <= config.ftol * jnp.maximum(c.cost, 1e-30))
        # failed linear solve (dx zeroed) is a rejected step, not convergence
        done = (
            small
            | (grad_norm <= config.gtol)
            | (dx_ok & (jnp.max(jnp.abs(dx)) <= 1e-14))
            | (c.lam >= config.max_lambda)
        )
        if config.run_full_budget:
            done = jnp.asarray(False)
        history = c.history
        if config.record_history:
            ch, lh, gh, ah = history
            history = (
                ch.at[c.it].set(cost),
                lh.at[c.it].set(lam),
                gh.at[c.it].set(grad_norm),
                ah.at[c.it].set(accept),
            )
        return Carry(state, blocks, lam, cost, grad_norm, c.it + 1, done,
                     cost_buf, best_state, best_blocks, best_cost, history)

    init = Carry(
        state=state0,
        blocks=blocks0,
        lam=jnp.asarray(config.init_lambda, dtype),
        cost=cost0,
        grad_norm=jnp.asarray(jnp.inf, dtype),
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        cost_buf=jnp.full((config.nonmonotonic_window,), cost0, dtype),
        best_state=state0,
        best_blocks=blocks0,
        best_cost=cost0,
        history=(
            (jnp.full((config.max_iters,), jnp.nan, dtype),) * 3
            + (jnp.zeros((config.max_iters,), bool),)
        ) if config.record_history else (),
    )
    out = jax.lax.while_loop(cond, body, init)
    # With nonmonotonic steps the final iterate can sit above the best
    # accepted one; return the best with ITS blocks (covariance must
    # linearize at the returned solution).
    final_state = out.best_state if config.nonmonotonic else out.state
    final_blocks = out.best_blocks if config.nonmonotonic else out.blocks
    final_cost = out.best_cost if config.nonmonotonic else out.cost
    hist = out.history if config.record_history else (None, None, None, None)
    summary = lm.SolveSummary(
        iterations=out.it,
        initial_cost=cost0,
        final_cost=final_cost,
        final_grad_norm=out.grad_norm,
        final_lambda=out.lam,
        cost_history=hist[0],
        lambda_history=hist[1],
        grad_norm_history=hist[2],
        step_accepted=hist[3],
    )
    return final_state, summary, final_blocks
