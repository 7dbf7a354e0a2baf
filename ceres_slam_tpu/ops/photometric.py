"""Dense photometric (direct) image alignment ops.

TPU-native counterpart of `/root/reference/include/ceres_slam/image_error.hpp`
(the one factor with hand-coded analytic Jacobians in the reference,
ceres::SizedCostFunction at :15-18). Per pixel of the reference image:

  p_ref   = triangulate(u, v, d)          # d is an optimized parameter
  p_track = T * p_ref                     # T: track-from-ref pose
  (u',v') = project(p_track)[:2]
  r       = I_track(u', v') - I_ref(u, v)  (:156-164, NN interpolation)

with chain-rule Jacobians ``dr/dT = grad_I . dproj/dp . dp/dT`` (:74-100)
and out-of-bounds pixels contributing zero residual AND zero Jacobian
(:102-128). All pixels are evaluated in one batched kernel; image reads
are gathers on the flattened image.
"""

from __future__ import annotations

import jax.numpy as jnp

from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import lie


def image_gradients(img: jnp.ndarray):
    """Central-difference intensity gradients (the reference uses OpenCV
    Sobel on the tracking image, dense_stereo_test.cpp:83-90; central
    differences give the same 1/2-scaled stencil without the smoothing
    taps)."""
    gu = jnp.zeros_like(img)
    gv = jnp.zeros_like(img)
    gu = gu.at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gv = gv.at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    return gu, gv


def _sample_nn(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Nearest-neighbour image sampling with validity mask
    (image_error.hpp:156-164 rounds to the nearest pixel)."""
    h, w = img.shape
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
    ui_c = jnp.clip(ui, 0, w - 1)
    vi_c = jnp.clip(vi, 0, h - 1)
    vals = img[vi_c, ui_c]
    return jnp.where(inb, vals, 0.0), inb


def _sample_bilinear(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Bilinear image sampling with validity mask. The reference rounds to
    the nearest pixel (image_error.hpp:156-164); bilinear interpolation is
    a strict improvement for direct alignment (the residual becomes
    piecewise-smooth in the warp) and is the default here."""
    h, w = img.shape
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    inb = (u0 >= 0) & (u0 + 1 <= w - 1) & (v0 >= 0) & (v0 + 1 <= h - 1)
    ui = jnp.clip(u0.astype(jnp.int32), 0, w - 2)
    vi = jnp.clip(v0.astype(jnp.int32), 0, h - 2)
    fu_ = u - ui
    fv_ = v - vi
    i00 = img[vi, ui]
    i01 = img[vi, ui + 1]
    i10 = img[vi + 1, ui]
    i11 = img[vi + 1, ui + 1]
    vals = (
        i00 * (1 - fu_) * (1 - fv_)
        + i01 * fu_ * (1 - fv_)
        + i10 * (1 - fu_) * fv_
        + i11 * fu_ * fv_
    )
    return jnp.where(inb, vals, 0.0), inb


def _sample3_pallas(track_img, grad_u, grad_v, u, v, interpret):
    """Sample (I, gu, gv) at shared warped coordinates with the VMEM-
    resident MXU kernel (pallas_kernels.bilinear_sample_imgs) — the TPU
    path: XLA lowers the 12 scattered gathers of the naive path to serial
    dynamic-slice loops that run below host-CPU speed (BASELINE r4)."""
    from ceres_slam_tpu.ops import pallas_kernels

    h, w = track_img.shape
    imgs = jnp.stack([track_img, grad_u, grad_v]).astype(jnp.float32)
    out = pallas_kernels.bilinear_sample_imgs(
        imgs, u.astype(jnp.float32), v.astype(jnp.float32),
        interpret=interpret)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    inb = (u0 >= 0) & (u0 + 1 <= w - 1) & (v0 >= 0) & (v0 + 1 <= h - 1)
    vals = jnp.where(inb[None, :], out.astype(track_img.dtype), 0.0)
    return vals[0], vals[1], vals[2], inb


def photometric_residual(
    camera: StereoCamera,
    T: jnp.ndarray,  # [12] track-from-ref pose
    disparities: jnp.ndarray,  # [N] per-pixel disparity parameters
    ref_uv: jnp.ndarray,  # [N, 2] pixel coords in the reference image
    ref_intensity: jnp.ndarray,  # [N]
    track_img: jnp.ndarray,  # [H, W]
    grad_u: jnp.ndarray,  # [H, W]
    grad_v: jnp.ndarray,  # [H, W]
    valid: jnp.ndarray,  # [N] bool input validity (e.g. disparity known)
    interp: str = "bilinear",  # "bilinear" (default) or "nn" (reference parity)
    sampler: str = "gather",  # "gather" | "pallas" | "pallas_interpret"
):
    """Batched residual + analytic Jacobians for all pixels.

    Returns (r [N], J_pose [N, 6], J_disp [N], in_bounds [N])."""
    obs = jnp.concatenate([ref_uv, disparities[:, None]], axis=-1)
    p_ref = camera.triangulate(obs)
    Jtri = camera.triangulation_jacobian(obs)  # [N, 3, 3]

    p_trk, J_pose_pt, R = lie.point_transform_jacobians(
        jnp.broadcast_to(T, (obs.shape[0], 12)), p_ref
    )
    proj = camera.project(p_trk)
    Jproj = camera.projection_jacobian(p_trk)  # [N, 3, 3]

    if sampler.startswith("pallas") and interp == "bilinear":
        I_trk, gu, gv, inb = _sample3_pallas(
            track_img, grad_u, grad_v, proj[..., 0], proj[..., 1],
            interpret=(sampler == "pallas_interpret"))
    else:
        sample = _sample_bilinear if interp == "bilinear" else _sample_nn
        I_trk, inb = sample(track_img, proj[..., 0], proj[..., 1])
        gu, _ = sample(grad_u, proj[..., 0], proj[..., 1])
        gv, _ = sample(grad_v, proj[..., 0], proj[..., 1])

    ok = inb & valid
    okf = ok.astype(p_ref.dtype)
    r = (I_trk - ref_intensity) * okf

    # dI/d(uv') [N, 2] chain: dr/dx = [gu gv] . Jproj[0:2] . (...)
    g_uv = jnp.stack([gu, gv], axis=-1) * okf[:, None]
    dI_dp = jnp.einsum("ni,nij->nj", g_uv, Jproj[:, :2, :])  # [N, 3]
    J_pose = jnp.einsum("ni,nij->nj", dI_dp, J_pose_pt)  # [N, 6]
    # dp_ref/dd is the third column of the triangulation Jacobian.
    dpref_dd = Jtri[:, :, 2]  # [N, 3]
    J_disp = jnp.einsum("ni,nij,nj->n", dI_dp, R, dpref_dd)
    return r, J_pose, J_disp, ok
