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


def _stereo_kernel(cam_ref, T_ref, p_ref, uvd_ref, S_ref, valid_ref,
                   r_ref, hpp_ref, hll_ref, u_ref, gp_ref, gl_ref):
    fu = cam_ref[0, 0]
    fv = cam_ref[0, 1]
    cu = cam_ref[0, 2]
    cv = cam_ref[0, 3]
    b = cam_ref[0, 4]

    t = [T_ref[i, :] for i in range(3)]
    R = [[T_ref[3 + 3 * i + j, :] for j in range(3)] for i in range(3)]
    p = [p_ref[i, :] for i in range(3)]
    obs = [uvd_ref[i, :] for i in range(3)]
    S = [[S_ref[3 * i + j, :] for j in range(3)] for i in range(3)]
    w = valid_ref[0, :]

    # p_c = R p + t
    pc = [R[i][0] * p[0] + R[i][1] * p[1] + R[i][2] * p[2] + t[i] for i in range(3)]
    iz = 1.0 / pc[2]
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


@partial(jax.jit, static_argnames=("interpret",))
def stereo_factor_blocks(
    camera,
    T: jnp.ndarray,  # [N, 12] gathered poses
    p: jnp.ndarray,  # [N, 3] gathered points
    uvd: jnp.ndarray,  # [N, 3]
    stiffness: jnp.ndarray,  # [N, 3, 3]
    valid: jnp.ndarray,  # [N] bool
    interpret: bool = False,
):
    """Fused stereo-factor evaluation returning per-observation blocks.

    Returns (r [N,3], Hpp_c [N,6,6], Hll_c [N,3,3], U [N,6,3],
    gp_c [N,6], gl_c [N,3]), all already whitened and validity-masked.
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

    return (
        r.T,
        hpp.T.reshape(N, 6, 6),
        hll.T.reshape(N, 3, 3),
        u.T.reshape(N, 6, 3),
        gp.T,
        gl.T,
    )
