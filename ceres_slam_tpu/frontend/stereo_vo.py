"""Online stereo visual odometry from raw images.

TPU-native redesign of the reference's live ROS node pipeline
(`sparse_stereo_odometry_node.cpp`, design reference only — it is
bit-rotted and excluded from the reference build, SURVEY.md §2.6):

  per stereo pair (imageCallback, :103-300):
    detect features both images        -> Harris + patch descriptors
    stereo match with cross check      -> similarity matmul matching
    epipolar-row + positive-disparity  -> pairwise gate in the matcher
      filter (:153-174)
    temporal match vs previous left    -> same matcher
    triangulate both sets, RANSAC      -> batched 3-pt RANSAC (:219-221)
    pose refine on inliers             -> jitted GN on 6 dof (:236-295)
    compound onto the map pose          -> T_curr_map = T_curr_prev * T_prev_map
      (:297-300)

All per-frame compute is a few fused jit calls with static shapes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ceres_slam_tpu.frontend import alignment, features
from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import lie


class StereoFrame(NamedTuple):
    """Per-frame stereo features: uvd observations + left descriptors."""

    uvd: jnp.ndarray  # [N, 3]
    desc: jnp.ndarray  # [N, D] left-image descriptors
    valid: jnp.ndarray  # [N]


@partial(jax.jit, static_argnames=("max_corners", "patch_radius"))
def extract_stereo_frame(
    camera: StereoCamera,
    img_left: jnp.ndarray,
    img_right: jnp.ndarray,
    max_corners: int = 384,
    patch_radius: int = 4,
    epipolar_tol: float = 1.5,
    min_disparity: float = 0.25,
) -> StereoFrame:
    """Detect + stereo-match one rectified pair into uvd observations.

    The epipolar-row and positive-disparity filters of the node
    (:153-174) are applied as a pairwise gate inside the matcher."""
    uv_l, _, val_l = features.harris_corners(img_left, max_corners=max_corners)
    uv_r, _, val_r = features.harris_corners(img_right, max_corners=max_corners)
    d_l = features.patch_descriptors(img_left, uv_l, patch_radius)
    d_r = features.patch_descriptors(img_right, uv_r, patch_radius)

    dv = jnp.abs(uv_l[:, None, 1] - uv_r[None, :, 1])
    disp = uv_l[:, None, 0] - uv_r[None, :, 0]
    gate = (dv <= epipolar_tol) & (disp > min_disparity)
    idx_r, ok = features.match_descriptors(d_l, d_r, val_l, val_r, gate=gate)

    disparity = uv_l[:, 0] - uv_r[idx_r, 0]
    uvd = jnp.stack([uv_l[:, 0], uv_l[:, 1], jnp.maximum(disparity, 1e-3)], axis=-1)
    return StereoFrame(uvd=uvd, desc=d_l, valid=ok)


@partial(jax.jit, static_argnames=("iters",))
def refine_pose_gn(
    camera: StereoCamera,
    T0: jnp.ndarray,  # [12] initial T_curr_prev
    pts_prev: jnp.ndarray,  # [N, 3] triangulated in prev frame
    obs_curr: jnp.ndarray,  # [N, 3] uvd in current frame
    weights: jnp.ndarray,  # [N] inlier weights
    iters: int = 10,
):
    """Pose-only Gauss-Newton refinement of the frame-to-frame transform
    (replaces the node's 2-frame Ceres solve, :236-295, with landmarks
    held at their prev-frame triangulation)."""

    def body(_, T):
        p_c, J_pose, _ = lie.point_transform_jacobians(
            jnp.broadcast_to(T, (pts_prev.shape[0], 12)), pts_prev
        )
        pred = camera.project(p_c)
        Jproj = camera.projection_jacobian(p_c)
        r = (pred - obs_curr) * weights[:, None]
        J = (Jproj @ J_pose) * weights[:, None, None]
        H = jnp.einsum("nri,nrj->ij", J, J)
        g = jnp.einsum("nri,nr->i", J, r)
        H = H + 1e-8 * jnp.eye(6, dtype=T.dtype)
        dx = -jnp.linalg.solve(H, g)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
        return lie.se3_retract(T, dx)

    return jax.lax.fori_loop(0, iters, body, T0)


class OnlineStereoVO:
    """Stateful online VO: feed rectified stereo pairs, read poses.

    Keeps `T_curr_map` (camera-from-map) like the node's `T_curr_map_`
    member, compounded per frame (:297-300)."""

    def __init__(
        self,
        camera: StereoCamera,
        max_corners: int = 384,
        ransac_iters: int = 400,
        ransac_thresh: float = 4.0,
        seed: int = 42,
    ):
        self.camera = camera
        self.max_corners = max_corners
        self.ransac_iters = ransac_iters
        self.ransac_thresh = ransac_thresh
        self._key = jax.random.PRNGKey(seed)
        self._prev: StereoFrame | None = None
        self.T_curr_map = lie.se3_identity(dtype=jnp.float64)
        self.trajectory = [self.T_curr_map]

    def process(self, img_left, img_right):
        """Process one rectified pair; returns the updated T_curr_map."""
        frame = extract_stereo_frame(
            self.camera, img_left, img_right, max_corners=self.max_corners
        )
        if self._prev is not None:
            idx, ok = features.match_descriptors(
                self._prev.desc, frame.desc, self._prev.valid, frame.valid
            )
            pts_prev = self.camera.triangulate(self._prev.uvd)
            pts_curr = self.camera.triangulate(frame.uvd[idx])
            self._key, sub = jax.random.split(self._key)
            res = alignment.ransac_align(
                self.camera,
                pts_prev,
                pts_curr,
                ok,
                sub,
                num_iters=self.ransac_iters,
                thresh=self.ransac_thresh,
            )
            T = refine_pose_gn(
                self.camera,
                res.T_1_0,
                pts_prev,
                frame.uvd[idx],
                res.inliers.astype(pts_prev.dtype),
            )
            self.T_curr_map = lie.se3_compose(T, self.T_curr_map)
        self._prev = frame
        self.trajectory.append(self.T_curr_map)
        return self.T_curr_map
