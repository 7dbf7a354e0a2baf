"""Batched residual/Jacobian kernels — the "factors" of the framework.

TPU-native replacement for the reference's Ceres `AutoDiffCostFunction`
functors (`/root/reference/include/ceres_slam/*_error*.hpp`). Where Ceres
evaluates one scalar functor per residual block with Jet forward-mode
autodiff (SURVEY.md §3.4), each factor here is ONE batched kernel over all
observations of that type: gathered states in, whitened residuals plus
analytic tangent-space Jacobians out. The local-parameterization chain
rule (12 global params -> 6 tangent dofs, perturbations.hpp:45-76) is
collapsed analytically into the Jacobians, so the solver works directly
in the minimal tangent coordinates.

Convention shared by every factor (mirroring e.g.
stereo_reprojection_error.hpp:48-50): ``r = S @ (predicted - observed)``
where S is the stiffness = inverse matrix square root of the measurement
covariance; Jacobians are returned already whitened.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ceres_slam_tpu.models import lighting
from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import lie


def inv_sqrt_psd(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse matrix square root of a symmetric PSD matrix ``[..., d, d]``.

    Replacement for Eigen's ``SelfAdjointEigenSolver::operatorInverseSqrt``
    used by every driver to whiten residuals (e.g. tests/dataset_vo.cpp:29-32,
    tests/dataset_vo_sun.cpp:57-59).
    """
    w, V = jnp.linalg.eigh(M)
    w = jnp.maximum(w, jnp.finfo(M.dtype).tiny)
    return jnp.einsum("...ij,...j,...kj->...ik", V, 1.0 / jnp.sqrt(w), V)


def _whiten(S: jnp.ndarray, r: jnp.ndarray, *jacs):
    rw = jnp.einsum("...ij,...j->...i", S, r)
    return (rw,) + tuple(S @ J for J in jacs)


# ---------------------------------------------------------------------------
# Stereo reprojection (stereo_reprojection_error.hpp:12-81)
# ---------------------------------------------------------------------------


def stereo_reprojection(
    camera: StereoCamera,
    T_c_g: jnp.ndarray,  # [..., 12] pose(s), camera-from-global
    pt_g: jnp.ndarray,  # [..., 3] landmark(s), global frame
    obs_uvd: jnp.ndarray,  # [..., 3]
    stiffness: jnp.ndarray,  # [..., 3, 3]
):
    """``r = S (project(T p) - uvd)``; returns (r, J_pose[...,3,6], J_point[...,3,3]).

    Jacobian structure documented in the reference: the pose block is
    ``dproj/dp_c`` (stereo_camera.hpp:86-108) chained with the sparse
    point-transform Jacobian (se3group.hpp:196-207) and the 12->6
    parameterization chain, collapsed to ``Jproj @ [I | -p_c^]``.
    """
    p_c, J_pose_pt, R = lie.point_transform_jacobians(T_c_g, pt_g)
    pred, J_proj = camera.project_with_jacobian(p_c)
    r = pred - obs_uvd
    J_pose = J_proj @ J_pose_pt  # [..., 3, 6]
    J_point = J_proj @ R  # [..., 3, 3]
    return _whiten(stiffness, r, J_pose, J_point)


# ---------------------------------------------------------------------------
# Pose prior (pose_error.hpp:11-74)
# ---------------------------------------------------------------------------


def pose_prior(
    T: jnp.ndarray,  # [..., 12] current pose estimate
    T_ref: jnp.ndarray,  # [..., 12] prior mean
    stiffness: jnp.ndarray,  # [..., 6, 6]
):
    """``r = S log(T_ref T^-1)`` (pose_error.hpp:33-40).

    Analytic tangent Jacobian: with ``T_res = T_ref T^-1`` and the left
    perturbation ``T <- exp(eps) T``, ``T_res' = T_res exp(-eps)`` (first
    order), so ``dr_t/d(dt) = -R_res``, ``dr_psi/d(phi) = -J_r^{-1}(psi_res)``
    under the reference's decoupled (first-order-translation) log.
    """
    T_res = lie.se3_compose(T_ref, lie.se3_inverse(T))
    r = lie.se3_log(T_res)
    R_res = lie.se3_rot(T_res)
    psi = r[..., 3:]
    Z = jnp.zeros_like(R_res)
    J = jnp.concatenate(
        [
            jnp.concatenate([-R_res, Z], axis=-1),
            jnp.concatenate([Z, -lie.so3_inv_right_jacobian(psi)], axis=-1),
        ],
        axis=-2,
    )
    return _whiten(stiffness, r, J)


# ---------------------------------------------------------------------------
# Relative pose (relative_pose_error.hpp:11-59)
# ---------------------------------------------------------------------------


def relative_pose(
    T_1_0: jnp.ndarray,
    T_2_0: jnp.ndarray,
    T_2_1_ref: jnp.ndarray,
    stiffness: jnp.ndarray,  # [..., 6, 6]
):
    """``r = S log(T_2_1_ref (T_1_0 T_2_0^-1))`` (relative_pose_error.hpp:35-37).

    Tangent Jacobians (left perturbations, decoupled log):
      w.r.t. T_1_0: ``dt: R_ref``, ``dpsi: J_r^{-1}(psi_res) R_est^T`` and
      translation-rotation coupling ``-R_ref t_est^``;
      w.r.t. T_2_0: ``[-R_res, 0; 0, -J_r^{-1}(psi_res)]``.
    """
    T_est = lie.se3_compose(T_1_0, lie.se3_inverse(T_2_0))
    T_res = lie.se3_compose(T_2_1_ref, T_est)
    r = lie.se3_log(T_res)
    psi = r[..., 3:]
    R_ref = lie.se3_rot(T_2_1_ref)
    R_est = lie.se3_rot(T_est)
    R_res = lie.se3_rot(T_res)
    t_est = lie.se3_trans(T_est)
    Jr_inv = lie.so3_inv_right_jacobian(psi)
    Z = jnp.zeros_like(R_ref)

    J1 = jnp.concatenate(
        [
            jnp.concatenate([R_ref, -R_ref @ lie.so3_wedge(t_est)], axis=-1),
            jnp.concatenate([Z, Jr_inv @ jnp.swapaxes(R_est, -1, -2)], axis=-1),
        ],
        axis=-2,
    )
    J2 = jnp.concatenate(
        [
            jnp.concatenate([-R_res, Z], axis=-1),
            jnp.concatenate([Z, -Jr_inv], axis=-1),
        ],
        axis=-2,
    )
    return _whiten(stiffness, r, J1, J2)


# ---------------------------------------------------------------------------
# Sun sensor (sun_sensor_error.hpp:12-131)
# ---------------------------------------------------------------------------


def sun_sensor(
    T_c_g: jnp.ndarray,  # [..., 12]
    sun_obs_c: jnp.ndarray,  # [..., 3] observed sun dir, camera frame (unit)
    sun_dir_g: jnp.ndarray,  # [..., 3] ephemeris sun dir, global frame (unit)
    stiffness: jnp.ndarray,  # [..., 2, 2]
    az_err_thresh: float = 1000.0,
    zen_err_thresh: float = 1000.0,
):
    """Azimuth/zenith sun-direction residual with hard outlier gating.

    Mirrors sun_sensor_error.hpp:63-96: rotate the ephemeris direction into
    the camera frame, convert both to ``zen = acos(-y)``, ``az =
    atan2(x, z)``, wrap the azimuth difference to [-pi, pi] (:80-84), and
    hard-zero each residual component beyond its threshold (:87-93) — the
    gate also zeroes the Jacobian rows, exactly as Jet autodiff through the
    reference's branch does. Inputs are assumed normalized (the reference
    normalizes both at construction, :30-31).
    """
    s_c, J_pose_vec, _ = lie.vector_transform_jacobians(T_c_g, sun_dir_g)

    x, y, z = s_c[..., 0], s_c[..., 1], s_c[..., 2]
    expected_zen = jnp.arccos(-y)
    expected_az = jnp.arctan2(x, z)
    observed_zen = jnp.arccos(-sun_obs_c[..., 1])
    observed_az = jnp.arctan2(sun_obs_c[..., 0], sun_obs_c[..., 2])

    r_az = expected_az - observed_az
    r_az = jnp.where(r_az > jnp.pi, r_az - 2 * jnp.pi, r_az)
    r_az = jnp.where(r_az < -jnp.pi, r_az + 2 * jnp.pi, r_az)
    r_zen = expected_zen - observed_zen

    az_ok = jnp.abs(r_az) <= az_err_thresh
    zen_ok = jnp.abs(r_zen) <= zen_err_thresh

    # d az / d s_c = [z, 0, -x] / (x^2 + z^2);  d zen / d s_c = [0, 1, 0] / sqrt(1 - y^2)
    xz2 = x * x + z * z
    safe_xz2 = jnp.where(xz2 > 0, xz2, jnp.ones_like(xz2))
    zero = jnp.zeros_like(x)
    dz_dy_arg = 1.0 - y * y
    safe_dz = jnp.sqrt(jnp.where(dz_dy_arg > 0, dz_dy_arg, jnp.ones_like(dz_dy_arg)))
    daz_ds = jnp.stack([z / safe_xz2, zero, -x / safe_xz2], axis=-1)
    dzen_ds = jnp.stack([zero, 1.0 / safe_dz, zero], axis=-1)

    J_angles = jnp.stack([daz_ds, dzen_ds], axis=-2)  # [..., 2, 3]
    J_pose = J_angles @ J_pose_vec  # [..., 2, 6]

    r = jnp.stack(
        [jnp.where(az_ok, r_az, 0.0), jnp.where(zen_ok, r_zen, 0.0)], axis=-1
    )
    gate = jnp.stack(
        [az_ok.astype(r.dtype), zen_ok.astype(r.dtype)], axis=-1
    )
    J_pose = J_pose * gate[..., None]
    return _whiten(stiffness, r, J_pose)


# ---------------------------------------------------------------------------
# Surface normal (normal_error.hpp:11-61)
# ---------------------------------------------------------------------------


def normal_obs(
    T_c_g: jnp.ndarray,  # [..., 12]
    normal_g: jnp.ndarray,  # [..., 3] estimated normal, global frame
    obs_normal_c: jnp.ndarray,  # [..., 3] observed normal, camera frame
    stiffness: jnp.ndarray,  # [..., 3, 3]
):
    """``r = S (T n_g - n_obs_c)`` (normal_error.hpp:37-39).

    J_normal is w.r.t. the raw 3-vector; the solver chains the
    unit-vector tangent projector ``(I - n n^T)`` when the normal state
    uses the UnitVectorPerturbation retraction (perturbations.hpp:87-113).
    """
    n_c, J_pose, R = lie.vector_transform_jacobians(T_c_g, normal_g)
    r = n_c - obs_normal_c
    return _whiten(stiffness, r, J_pose, R)


# ---------------------------------------------------------------------------
# Phong intensity (intensity_error_{point,directional}_light.hpp)
# ---------------------------------------------------------------------------


def _intensity_predict(T_c_g, pt_g, normal_g, phong, texture, light_g, directional):
    """Predicted intensity for one observation (unbatched).

    Follows intensity_error_*_light.hpp:25-96: transform point, normal and
    light into the camera frame, shade with the camera at the origin,
    light colour fixed to 1.
    """
    pt_c = lie.se3_transform_point(T_c_g, pt_g)
    normal_c = lie.se3_transform_vector(T_c_g, normal_g)
    campos_c = jnp.zeros(3, dtype=pt_c.dtype)
    if directional:
        light_c = lie.se3_transform_vector(T_c_g, light_g)
        return lighting.directional_light_shade(
            pt_c, normal_c, phong, texture, light_c, campos_c
        )
    light_c = lie.se3_transform_point(T_c_g, light_g)
    return lighting.point_light_shade(
        pt_c, normal_c, phong, texture, light_c, campos_c
    )


def _intensity_factor(directional: bool):
    def single(T, pt_g, normal_g, phong, texture, light_g, obs, stiffness):
        def f(eps, pt_g, normal_g, phong, texture, light_g):
            return _intensity_predict(
                lie.se3_retract(T, eps), pt_g, normal_g, phong, texture, light_g,
                directional,
            )

        pred = f(jnp.zeros(6, dtype=T.dtype), pt_g, normal_g, phong, texture, light_g)
        grads = jax.grad(f, argnums=(0, 1, 2, 3, 4, 5))(
            jnp.zeros(6, dtype=T.dtype), pt_g, normal_g, phong, texture, light_g
        )
        r = stiffness * (pred - obs)
        return (r, *(stiffness * g for g in grads))

    return single


_intensity_point_single = _intensity_factor(directional=False)
_intensity_directional_single = _intensity_factor(directional=True)


def intensity_point_light(T, pt_g, normal_g, phong, texture, light_pos_g, obs, stiffness):
    """Batched point-light intensity factor (intensity_error_point_light.hpp).

    Residual dim 1; param blocks pose(6 tangent), point(3), normal(3),
    phong(3), texture(1), light position(3) — matching the Create() block
    dims at intensity_error_point_light.hpp:102-111. Gradients come from
    reverse-mode autodiff through the branchless shading kernel (the
    TPU-native equivalent of Jet autodiff through phong.hpp), which XLA
    fuses into the same kernel as the forward shade.

    Returns (r[N], J_pose[N,6], J_point[N,3], J_normal[N,3], J_phong[N,3],
    J_texture[N], J_light[N,3]).
    """
    return jax.vmap(_intensity_point_single, in_axes=(0, 0, 0, 0, 0, None, 0, 0))(
        T, pt_g, normal_g, phong, texture, light_pos_g, obs, stiffness
    )


def intensity_directional_light(
    T, pt_g, normal_g, phong, texture, light_dir_g, obs, stiffness
):
    """Batched directional-light intensity factor
    (intensity_error_directional_light.hpp; light direction instead of
    position, Create() dims at :100-113)."""
    return jax.vmap(_intensity_directional_single, in_axes=(0, 0, 0, 0, 0, None, 0, 0))(
        T, pt_g, normal_g, phong, texture, light_dir_g, obs, stiffness
    )


def unit_vector_tangent_projector(x: jnp.ndarray) -> jnp.ndarray:
    """``d retract(x, delta) / d delta`` at 0 = ``(I - x x^T / |x|^2)``.

    Chain this onto J_normal / J_lightdir columns when those states use the
    unit-vector retraction, exactly as Ceres chains the
    UnitVectorPerturbation parameterization Jacobian.
    """
    eye = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), (*x.shape, 3))
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    outer = x[..., :, None] * x[..., None, :]
    return eye - outer / x2[..., None]
