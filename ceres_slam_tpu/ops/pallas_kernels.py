"""Pallas TPU kernels for the hot factor ops.

The XLA path computes the stereo factor with arrays shaped ``[N, 3, 6]``
etc. — trailing dims of 3/6 occupy 128-wide vector lanes, wasting >90% of
the VPU. These kernels flip the layout: observations live in the LANE
dimension (``[d, N]`` tiles), every small-matrix row becomes a sublane,
and all per-observation math is pure elementwise vector work at full lane
occupancy. One fused kernel produces the whitened residual, both tangent
Jacobians, AND the per-observation Gram blocks (J^T J outer products and
gradient contributions) consumed by the block-sparse assembly — the
counterpart of the Ceres Jet evaluation + block accumulation
(SURVEY.md §3.4) in a single VMEM-resident pass.

Kernels run compiled on TPU and in interpreter mode elsewhere (tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512


def _mat(rows):
    """Helper: a small matrix as a list of lists of [..., N] vectors."""
    return rows


def _matmul(A, B, n, m, k):
    """C[n x k] = A[n x m] @ B[m x k] of lane-vectors."""
    return [
        [sum(A[i][l] * B[l][j] for l in range(m)) for j in range(k)]
        for i in range(n)
    ]


def _transpose(A, n, m):
    return [[A[i][j] for i in range(n)] for j in range(m)]


def _stereo_math(cam_ref, t, R, p, obs, S, w):
    """Shared lane-major stereo-factor math: whitened residual + tangent
    Jacobians from pose rows (t, R), point rows p, observation rows obs,
    stiffness rows S and validity weight w (all [..., N] lane vectors)."""
    fu = cam_ref[0, 0]
    fv = cam_ref[0, 1]
    cu = cam_ref[0, 2]
    cv = cam_ref[0, 3]
    b = cam_ref[0, 4]

    # p_c = R p + t. Guard the depth division: padding/invalid lanes can
    # carry z = 0 (zeroed poses), and 0 * inf = NaN would leak through the
    # validity mask.
    pc = [R[i][0] * p[0] + R[i][1] * p[1] + R[i][2] * p[2] + t[i] for i in range(3)]
    z_safe = jnp.where(pc[2] == 0.0, 1.0, pc[2])
    iz = 1.0 / z_safe
    iz2 = iz * iz

    pred = [fu * pc[0] * iz + cu, fv * pc[1] * iz + cv, fu * b * iz]
    zero = jnp.zeros_like(iz)

    # projection Jacobian (stereo_camera.hpp:86-108)
    Jproj = _mat([
        [fu * iz, zero, -fu * pc[0] * iz2],
        [zero, fv * iz, -fv * pc[1] * iz2],
        [zero, zero, -fu * b * iz2],
    ])
    # d p_c / d eps = [I | -pc^]  (left-perturbation tangent)
    Jpc = _mat([
        [1.0 + zero, zero, zero, zero, pc[2], -pc[1]],
        [zero, 1.0 + zero, zero, -pc[2], zero, pc[0]],
        [zero, zero, 1.0 + zero, pc[1], -pc[0], zero],
    ])

    J_pose = _matmul(Jproj, Jpc, 3, 3, 6)
    J_pt = _matmul(Jproj, R, 3, 3, 3)

    # whiten + validity mask
    res = [pred[i] - obs[i] for i in range(3)]
    rw = [w * sum(S[i][l] * res[l] for l in range(3)) for i in range(3)]
    Jw_pose = [[w * sum(S[i][l] * J_pose[l][j] for l in range(3)) for j in range(6)]
               for i in range(3)]
    Jw_pt = [[w * sum(S[i][l] * J_pt[l][j] for l in range(3)) for j in range(3)]
             for i in range(3)]
    return rw, Jw_pose, Jw_pt


def _stereo_kernel(cam_ref, T_ref, p_ref, uvd_ref, S_ref, valid_ref,
                   r_ref, hpp_ref, hll_ref, u_ref, gp_ref, gl_ref):
    t = [T_ref[i, :] for i in range(3)]
    R = [[T_ref[3 + 3 * i + j, :] for j in range(3)] for i in range(3)]
    p = [p_ref[i, :] for i in range(3)]
    obs = [uvd_ref[i, :] for i in range(3)]
    S = [[S_ref[3 * i + j, :] for j in range(3)] for i in range(3)]
    w = valid_ref[0, :]

    rw, Jw_pose, Jw_pt = _stereo_math(cam_ref, t, R, p, obs, S, w)

    JpT = _transpose(Jw_pose, 3, 6)  # 6 x 3
    Hpp = _matmul(JpT, Jw_pose, 6, 3, 6)
    Hll = _matmul(_transpose(Jw_pt, 3, 3), Jw_pt, 3, 3, 3)
    U = _matmul(JpT, Jw_pt, 6, 3, 3)

    for i in range(3):
        r_ref[i, :] = rw[i]
    for i in range(6):
        gp_ref[i, :] = sum(JpT[i][l] * rw[l] for l in range(3))
        for j in range(6):
            hpp_ref[6 * i + j, :] = Hpp[i][j]
        for j in range(3):
            u_ref[3 * i + j, :] = U[i][j]
    for i in range(3):
        gl_ref[i, :] = sum(Jw_pt[l][i] * rw[l] for l in range(3))
        for j in range(3):
            hll_ref[3 * i + j, :] = Hll[i][j]


@partial(jax.jit, static_argnames=("interpret", "flat"))
def stereo_factor_blocks(
    camera,
    T: jnp.ndarray,  # [N, 12] gathered poses
    p: jnp.ndarray,  # [N, 3] gathered points
    uvd: jnp.ndarray,  # [N, 3]
    stiffness: jnp.ndarray,  # [N, 3, 3]
    valid: jnp.ndarray,  # [N] bool
    interpret: bool = False,
    flat: bool = False,
):
    """Fused stereo-factor evaluation returning per-observation blocks.

    Returns (r [N,3], Hpp_c [N,6,6], Hll_c [N,3,3], U [N,6,3],
    gp_c [N,6], gl_c [N,3]), all already whitened and validity-masked.
    With ``flat=True`` the block outputs stay component-flat
    ([N,36]/[N,9]/[N,18]) — the layout the PCG assembly consumes (a
    trailing dim of 3/6 tiles at 21-57x HBM padding; flat pads <4x).
    N must be a multiple of TILE (pad upstream)."""
    N = T.shape[0]
    assert N % TILE == 0, f"N={N} must be a multiple of {TILE}"
    dtype = jnp.float32 if T.dtype == jnp.float32 else T.dtype

    cam = jnp.stack(
        [jnp.asarray(camera.fu, dtype), jnp.asarray(camera.fv, dtype),
         jnp.asarray(camera.cu, dtype), jnp.asarray(camera.cv, dtype),
         jnp.asarray(camera.b, dtype), jnp.zeros((), dtype), jnp.zeros((), dtype),
         jnp.zeros((), dtype)]
    )[None, :]

    T_t = T.astype(dtype).T  # [12, N]
    p_t = p.astype(dtype).T  # [3, N]
    uvd_t = uvd.astype(dtype).T  # [3, N]
    S_t = stiffness.astype(dtype).reshape(N, 9).T  # [9, N]
    v_t = valid.astype(dtype)[None, :]  # [1, N]

    grid = (N // TILE,)

    def spec(rows):
        return pl.BlockSpec((rows, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((3, N), dtype),   # r
        jax.ShapeDtypeStruct((36, N), dtype),  # Hpp
        jax.ShapeDtypeStruct((9, N), dtype),   # Hll
        jax.ShapeDtypeStruct((18, N), dtype),  # U
        jax.ShapeDtypeStruct((6, N), dtype),   # gp
        jax.ShapeDtypeStruct((3, N), dtype),   # gl
    )
    r, hpp, hll, u, gp, gl = pl.pallas_call(
        _stereo_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            spec(12), spec(3), spec(3), spec(9), spec(1),
        ],
        out_specs=(spec(3), spec(36), spec(9), spec(18), spec(6), spec(3)),
        out_shape=out_shapes,
        interpret=interpret,
    )(cam, T_t, p_t, uvd_t, S_t, v_t)

    if flat:
        return r.T, hpp.T, hll.T, u.T, gp.T, gl.T
    return (
        r.T,
        hpp.T.reshape(N, 6, 6),
        hll.T.reshape(N, 3, 3),
        u.T.reshape(N, 6, 3),
        gp.T,
        gl.T,
    )


# ---------------------------------------------------------------------------
# Fused window-BA kernel: pose gather (one-hot MXU), factor math, and the
# pose-side Gram reduction in ONE pass — the latency-critical op of the
# scatter-free window solver (solver/window.py). Replaces ~15 XLA fusion
# groups (gathers + batched-tiny einsums + segment reductions) whose
# dispatch overhead dominates at sliding-window scale.
# ---------------------------------------------------------------------------


def _window_math(cam_ref, posesT_ref, onehotT_ref, p_ref, uvd_ref, S_ref,
                 w_ref, wp_ref, hll_ref, u_ref, gl_ref):
    """Shared kernel body: writes the landmark-side refs, returns the
    pose-side reduction ``tile_red [43, K]`` for the caller to
    accumulate (gridded) or assign (single whole-block)."""
    dtype = posesT_ref.dtype

    # Gather the per-observation poses with an MXU one-hot matmul:
    # T_lanes [12, TILE] = posesT [12, K] @ onehot_tile [K, TILE].
    # precision=HIGHEST is REQUIRED: the TPU default rounds f32 matmul
    # inputs to one bf16 pass, and the camera-frame depth z = (R p + t)_z
    # downstream is a cancellation of large terms — bf16-rounded poses
    # make near-zero depths garbage and iz^2 amplifies them to ~1e20.
    # With a 0/1 one-hot and 3-pass f32 the gather is exact.
    T_lanes = jnp.dot(posesT_ref[:, :], onehotT_ref[:, :],
                      preferred_element_type=dtype,
                      precision=jax.lax.Precision.HIGHEST)
    t = [T_lanes[i_, :] for i_ in range(3)]
    R = [[T_lanes[3 + 3 * a + b_, :] for b_ in range(3)] for a in range(3)]
    p = [p_ref[i_, :] for i_ in range(3)]
    obs = [uvd_ref[i_, :] for i_ in range(3)]
    S = [[S_ref[3 * a + b_, :] for b_ in range(3)] for a in range(3)]
    w = w_ref[0, :]

    rw, Jw_pose, Jw_pt = _stereo_math(cam_ref, t, R, p, obs, S, w)

    # Gauge fixing: zero the pose Jacobian (NOT the residual — fixed-pose
    # observations still contribute cost, SetParameterBlockConstant
    # semantics, dataset_vo.cpp:62).
    wp = wp_ref[0, :]
    Jw_pose = [[wp * Jw_pose[a][b_] for b_ in range(6)] for a in range(3)]

    # Landmark-side per-observation outputs (reduced by contiguous
    # reshape-sums outside — landmark-grouped layout).
    JpT = _transpose(Jw_pose, 3, 6)  # 6 x 3
    Hll = _matmul(_transpose(Jw_pt, 3, 3), Jw_pt, 3, 3, 3)
    U = _matmul(JpT, Jw_pt, 6, 3, 3)
    for a in range(3):
        gl_ref[a, :] = sum(Jw_pt[l][a] * rw[l] for l in range(3))
        for b_ in range(3):
            hll_ref[3 * a + b_, :] = Hll[a][b_]
    for a in range(6):
        for b_ in range(3):
            u_ref[3 * a + b_, :] = U[a][b_]

    # Pose-side reduction to [43, K] via MXU: contrib rows are
    # (Hpp flat 36 | gp 6 | 0.5 r^2); accumulate across sequential grid
    # steps (each observation has exactly one 1 in its one-hot column, so
    # the cost row reduces to per-pose cost — summed to a scalar outside).
    Hpp = _matmul(JpT, Jw_pose, 6, 3, 6)
    gp = [sum(JpT[a][l] * rw[l] for l in range(3)) for a in range(6)]
    cost_lane = 0.5 * sum(rw[l] * rw[l] for l in range(3))
    contrib = jnp.stack(
        [Hpp[a][b_] for a in range(6) for b_ in range(6)] + gp + [cost_lane],
        axis=0,
    )  # [43, TILE]
    return jax.lax.dot_general(
        contrib, onehotT_ref[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGHEST,
    )  # [43, K]


def _window_kernel(cam_ref, posesT_ref, onehotT_ref, p_ref, uvd_ref, S_ref,
                   w_ref, wp_ref, hll_ref, u_ref, gl_ref, hppgp_ref):
    i = pl.program_id(0)
    tile_red = _window_math(cam_ref, posesT_ref, onehotT_ref, p_ref,
                            uvd_ref, S_ref, w_ref, wp_ref, hll_ref, u_ref,
                            gl_ref)

    @pl.when(i == 0)
    def _():
        hppgp_ref[:, :] = tile_red

    @pl.when(i > 0)
    def _():
        hppgp_ref[:, :] = hppgp_ref[:, :] + tile_red


def _window_kernel_single(cam_ref, posesT_ref, onehotT_ref, p_ref, uvd_ref,
                          S_ref, w_ref, wp_ref, hll_ref, u_ref, gl_ref,
                          hppgp_ref):
    """Gridless single whole-block variant: this toolchain's remote TPU
    compiler crashes on ANY gridded pallas_call inside lax.scan (even a
    trivial doubling kernel — results/r5/probe_pallas_scan.log) while
    whole-block calls compile, and the flagship window shapes fit one
    tile (M_pad == TILE). Same math, direct assignment."""
    hppgp_ref[:, :] = _window_math(
        cam_ref, posesT_ref, onehotT_ref, p_ref, uvd_ref, S_ref, w_ref,
        wp_ref, hll_ref, u_ref, gl_ref)


@partial(jax.jit, static_argnames=("interpret",))
def window_factor_blocks(
    camera,
    posesT: jnp.ndarray,  # [12, K] current poses, transposed
    onehotT: jnp.ndarray,  # [K, M] static pose one-hot (zero col = padding)
    p_obs: jnp.ndarray,  # [3, M] per-observation landmark (broadcast, lane-major)
    uvd: jnp.ndarray,  # [3, M]
    stiffness: jnp.ndarray,  # [9, M]
    weight: jnp.ndarray,  # [1, M] static validity weight (valid & point_valid)
    pose_free: jnp.ndarray,  # [1, M] static gauge weight (free_pose[pose_idx])
    interpret: bool = False,
):
    """Fused window-BA factor pass (landmark-grouped padded layout).

    Returns lane-major per-observation landmark blocks plus the fully
    reduced pose-side system and per-pose stereo cost:
      hll [9, M], u [18, M], gl [3, M], hppgp [43, K]
      (rows 0:36 = Hpp blocks flat, 36:42 = gp, 42 = 0.5 sum r^2 per pose).
    M must be a multiple of TILE; K <= 128 recommended (one lane tile).
    """
    K = posesT.shape[1]
    M = onehotT.shape[1]
    assert M % TILE == 0, f"M={M} must be a multiple of {TILE}"
    dtype = jnp.float32 if posesT.dtype != jnp.float64 else posesT.dtype

    cam = jnp.stack(
        [jnp.asarray(camera.fu, dtype), jnp.asarray(camera.fv, dtype),
         jnp.asarray(camera.cu, dtype), jnp.asarray(camera.cv, dtype),
         jnp.asarray(camera.b, dtype), jnp.zeros((), dtype), jnp.zeros((), dtype),
         jnp.zeros((), dtype)]
    )[None, :]

    out_shapes = (
        jax.ShapeDtypeStruct((9, M), dtype),    # hll
        jax.ShapeDtypeStruct((18, M), dtype),   # u
        jax.ShapeDtypeStruct((3, M), dtype),    # gl
        jax.ShapeDtypeStruct((43, K), dtype),   # hppgp+cost (accumulated)
    )
    if M == TILE:
        # gridless whole-block call: the ONLY pallas form the remote TPU
        # compiler accepts inside lax.scan (see _window_kernel_single) —
        # and the flagship sliding-window shapes always land here.
        vm = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _window_kernel_single,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vm] * 7,
            out_specs=(vm, vm, vm, vm),
            out_shape=out_shapes,
            interpret=interpret,
        )(cam, posesT.astype(dtype), onehotT.astype(dtype),
          p_obs.astype(dtype), uvd.astype(dtype), stiffness.astype(dtype),
          weight.astype(dtype), pose_free.astype(dtype))

    grid = (M // TILE,)

    def tiled(rows):
        return pl.BlockSpec((rows, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)

    def whole(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _window_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            whole(12, K),
            tiled(K),
            tiled(3), tiled(3), tiled(9), tiled(1), tiled(1),
        ],
        out_specs=(tiled(9), tiled(18), tiled(3), whole(43, K)),
        out_shape=out_shapes,
        interpret=interpret,
    )(cam, posesT.astype(dtype), onehotT.astype(dtype), p_obs.astype(dtype),
      uvd.astype(dtype), stiffness.astype(dtype), weight.astype(dtype),
      pose_free.astype(dtype))


# ---------------------------------------------------------------------------
# Bilinear image sampling for dense photometric alignment. The XLA gather
# path (ops/photometric._sample_bilinear) issues 4 scattered gathers per
# sampled image, which TPU lowers to serial dynamic-slice loops — measured
# BELOW host-CPU throughput at 68k pixels (BASELINE r4: 82 vs 110 it/s).
# This kernel keeps the image stack VMEM-resident across grid steps and
# turns the gather into two MXU one-hot contractions per tile: a row
# interpolation (Rw [TILE, H] @ img [H, W], where Rw carries the two
# bilinear row weights per pixel) followed by a lane reduction against the
# column-weight matrix. All C images (intensity + both gradients) are
# sampled at the same warped coordinates in one pass.
# Counterpart of the reference's per-pixel image reads in
# image_error.hpp:156-164 (which rounds to nearest; bilinear is this
# framework's default, ops/photometric.py:51).
# ---------------------------------------------------------------------------


def _bilinear_kernel(imgs_ref, ui_ref, vi_ref, fu_ref, fv_ref, out_ref):
    # Index/fraction arithmetic happens OUTSIDE the kernel (plain
    # elementwise XLA, fused for free): under x64 sessions Mosaic lowers
    # in-kernel float->int conversions through a 64-bit decomposition that
    # this toolchain cannot compile (bare astype(int32) -> remote HTTP
    # 500; jnp.clip -> infinite _convert_helper recursion at lowering).
    # The kernel therefore takes pre-split i32 indices + f32 fractions
    # and contains no dtype conversion at all.
    C, H, W = imgs_ref.shape
    ui = ui_ref[0, :]
    vi = vi_ref[0, :]
    fu = fu_ref[0, :]
    fv = fv_ref[0, :]

    n = ui.shape[0]
    ids_h = jax.lax.broadcasted_iota(jnp.int32, (n, H), 1)
    vcol, fvc = vi[:, None], fv[:, None]
    Rw = (jnp.where(ids_h == vcol, 1.0 - fvc, 0.0)
          + jnp.where(ids_h == vcol + 1, fvc, 0.0))
    ids_w = jax.lax.broadcasted_iota(jnp.int32, (n, W), 1)
    ucol, fuc = ui[:, None], fu[:, None]
    Cw = (jnp.where(ids_w == ucol, 1.0 - fuc, 0.0)
          + jnp.where(ids_w == ucol + 1, fuc, 0.0))
    for c in range(C):
        # precision=HIGHEST: the TPU f32 matmul default is one bf16 pass,
        # which would quantize the interpolation weights to 8-bit
        # mantissas; with exact weights the contraction reproduces the
        # gather formula to f32 rounding.
        rows = jnp.dot(Rw, imgs_ref[c],
                       preferred_element_type=imgs_ref.dtype,
                       precision=jax.lax.Precision.HIGHEST)
        out_ref[c, :] = jnp.sum(rows * Cw, axis=1)


def bilinear_sample_imgs(
    imgs: jnp.ndarray,  # [C, H, W] image stack (shared sample coords)
    u: jnp.ndarray,  # [N]
    v: jnp.ndarray,  # [N]
    interpret: bool = False,
) -> jnp.ndarray:
    """Sample C images at N (u, v) points -> [C, N] (f32).

    Out-of-bounds points return the clipped-border interpolation; callers
    mask them (the in-bounds predicate is pure elementwise XLA work).
    N is padded to the tile size internally."""
    C, H, W = imgs.shape
    N = u.shape[0]
    dtype = jnp.float32
    Np = -(-N // TILE) * TILE
    pad = Np - N
    u32 = u.astype(dtype)
    v32 = v.astype(dtype)
    # identical index/fraction arithmetic to ops/photometric.
    # _sample_bilinear (out-of-bounds lanes are clipped here and masked
    # by the caller, which owns the in-bounds test); computed OUTSIDE the
    # kernel — see _bilinear_kernel for why no conversion may live inside
    ui = jnp.clip(jnp.floor(u32).astype(jnp.int32), 0, W - 2)
    vi = jnp.clip(jnp.floor(v32).astype(jnp.int32), 0, H - 2)
    fu = u32 - ui.astype(dtype)
    fv = v32 - vi.astype(dtype)

    def tile1(x):
        return jnp.pad(x, (0, pad))[None, :]

    vec_spec = pl.BlockSpec((1, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _bilinear_kernel,
        grid=(Np // TILE,),
        in_specs=[
            pl.BlockSpec((C, H, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec_spec, vec_spec, vec_spec, vec_spec,
        ],
        out_specs=pl.BlockSpec((C, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, Np), dtype),
        interpret=interpret,
    )(imgs.astype(dtype), tile1(ui), tile1(vi), tile1(fu), tile1(fv))
    return out[:, :N]


# ---------------------------------------------------------------------------
# Schur-complement matvec kernel for the full-batch PCG path. The XLA
# gather-table matvec materializes four ~[J, O*18] HBM temps and two row
# gathers of 18-lane rows per CG iteration — measured ~3.4 ms at XXL
# (K=1024, J=32k, N=262k) against a ~0.1 ms roofline, and CG dominates
# the XXL LM iteration (results/r5/profile_xxl_tpu_v2.json). This kernel keeps
# everything lane-major (J in lanes), streams the hoisted coupling slots
# once, and does BOTH index translations (gather v by slot pose, reduce
# contributions by pose) as 0/1 one-hot MXU contractions built in-VMEM
# from the slot pose indices — no HBM temps, no scattered gathers.
#   Uy[a, k] = sum_j sum_o onehot[pose(j,o)=k] * (U_slot y_j)[a]
#   y_j = Cinv_j sum_o U_slot^T v_[pose(j,o)]
# Gridded pallas_call is fine here: PCG runs in a lax.while_loop (only
# lax.scan trips the remote-compiler bug, probe_pallas_scan_v2.log).
# ---------------------------------------------------------------------------

# landmarks per grid step of the matvec kernels. Each (j-tile, slot)
# step keeps exactly ONE one-hot [K, TILE_J] + iota live (~8 MB at
# K=1024, TILE_J=512, against the 16 MB scoped-VMEM budget); 128-lane
# tiles fit too but quadruple the grid-step count, and per-step overhead
# dominated the measured matvec (4096 steps ~ 4 ms, r5 profile v6).
TILE_J = 512


def _uy_phase1_kernel(UT_ref, pose_ref, vT_ref, utv_ref):
    # grid (j_tiles, O_l): one slot-row block per step, ONE one-hot live
    # at a time (the all-slots-at-once variants exceeded the 16 MB
    # scoped-VMEM budget, and Mosaic cannot lane-concatenate 1-D
    # vectors to merge slot one-hots — r5 chip logs). Blocks are
    # 24/8-row slot panels: sublane sizes must divide by 8.
    o = pl.program_id(1)
    dtype = UT_ref.dtype
    TJ = UT_ref.shape[1]
    K = vT_ref.shape[1]
    hi = jax.lax.Precision.HIGHEST
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, TJ), 0)
    oh = (iota_k == pose_ref[0, :][None, :]).astype(dtype)
    vg = jnp.dot(vT_ref[:, :], oh, preferred_element_type=dtype,
                 precision=hi)  # [6, TJ]
    zero = jnp.zeros((TJ,), dtype)
    part = jnp.stack(
        [sum(UT_ref[a * 3 + c, :] * vg[a, :] for a in range(6))
         for c in range(3)] + [zero] * 5, axis=0)  # [8, TJ]

    @pl.when(o == 0)
    def _():
        utv_ref[:, :] = part

    @pl.when(o > 0)
    def _():
        utv_ref[:, :] = utv_ref[:, :] + part


def _uy_phase2_kernel(UT_ref, pose_ref, yT_ref, out_ref):
    i = pl.program_id(0)
    o = pl.program_id(1)
    dtype = UT_ref.dtype
    TJ = UT_ref.shape[1]
    K = out_ref.shape[1]
    hi = jax.lax.Precision.HIGHEST
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, TJ), 0)
    oh = (iota_k == pose_ref[0, :][None, :]).astype(dtype)
    zero = jnp.zeros((TJ,), dtype)
    contrib = jnp.stack(
        [sum(UT_ref[a * 3 + c, :] * yT_ref[c, :] for c in range(3))
         for a in range(6)] + [zero] * 2, axis=0)  # [8, TJ]
    acc = jax.lax.dot_general(
        contrib, oh, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=dtype, precision=hi)  # [8, K]

    @pl.when((i == 0) & (o == 0))
    def _():
        out_ref[:, :] = acc

    @pl.when((i > 0) | (o > 0))
    def _():
        out_ref[:, :] = out_ref[:, :] + acc


def schur_uy(
    UT_l: jnp.ndarray,  # [O_l*18, Jp] lane-major hoisted slot couplings
    pose_of_lT: jnp.ndarray,  # [O_l, Jp] int32 slot pose indices
    cinvT: jnp.ndarray,  # [9, Jp] lane-major damped inverted landmark diag
    vT: jnp.ndarray,  # [6, K]
    interpret: bool = False,
) -> jnp.ndarray:
    """``Uy [6, K] = sum_j U_j Cinv_j U_j^T v`` (the coupling half of the
    Schur matvec), as two gridded kernels over (landmark tile, slot)
    with a tiny lane-major XLA step (y = Cinv Utv) between. Jp must be
    a multiple of TILE_J (pad slots with zero U rows upstream — padded
    slots contribute nothing regardless of their index entries).

    Slot panels are repacked to sublane-divisible row counts (24 U rows
    and 8 index rows per slot) because Pallas block sublane sizes must
    divide by 8; callers should cache the repacked forms via
    `pack_schur_uy_inputs` (once per LM iteration)."""
    UT24, pose8 = pack_schur_uy_inputs(UT_l, pose_of_lT)
    return schur_uy_packed(UT24, pose8, cinvT, vT, interpret=interpret)


def pack_schur_uy_inputs(UT_l: jnp.ndarray, pose_of_lT: jnp.ndarray):
    """Repack [O*18, Jp] couplings / [O, Jp] indices into 24- and 8-row
    slot panels (zero-padded) for `schur_uy_packed`."""
    OL18, Jp = UT_l.shape
    O_l = OL18 // 18
    dtype = jnp.float32
    U3 = UT_l.astype(dtype).reshape(O_l, 18, Jp)
    UT24 = jnp.concatenate(
        [U3, jnp.zeros((O_l, 6, Jp), dtype)], axis=1).reshape(O_l * 24, Jp)
    pose8 = jnp.concatenate(
        [pose_of_lT[:, None, :],
         jnp.zeros((O_l, 7, Jp), pose_of_lT.dtype)],
        axis=1).reshape(O_l * 8, Jp)
    return UT24, pose8


def schur_uy_packed(
    UT24: jnp.ndarray,  # [O_l*24, Jp]
    pose8: jnp.ndarray,  # [O_l*8, Jp] int32 (row o*8 carries the index)
    cinvT: jnp.ndarray,  # [9, Jp]
    vT: jnp.ndarray,  # [6, K]
    interpret: bool = False,
) -> jnp.ndarray:
    O_l = UT24.shape[0] // 24
    Jp = UT24.shape[1]
    K = vT.shape[1]
    assert Jp % TILE_J == 0, f"Jp={Jp} must be a multiple of {TILE_J}"
    dtype = jnp.float32
    grid = (Jp // TILE_J, O_l)

    utv = pl.pallas_call(
        _uy_phase1_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((24, TILE_J), lambda i, o: (o, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_J), lambda i, o: (o, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, K), lambda i, o: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TILE_J), lambda i, o: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Jp), dtype),
        interpret=interpret,
    )(UT24, pose8, vT.astype(dtype))

    # y = Cinv Utv, lane-major elementwise (XLA fuses this)
    c = cinvT.astype(dtype)
    yT = jnp.stack(
        [sum(c[b * 3 + cc, :] * utv[cc, :] for cc in range(3))
         for b in range(3)]
        + [jnp.zeros((Jp,), dtype)] * 5, axis=0)  # [8, Jp]

    out = pl.pallas_call(
        _uy_phase2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((24, TILE_J), lambda i, o: (o, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_J), lambda i, o: (o, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_J), lambda i, o: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, K), lambda i, o: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, K), dtype),
        interpret=interpret,
    )(UT24, pose8, yT)
    return out[:6]
