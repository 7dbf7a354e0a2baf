"""Rectified pinhole stereo camera model, batched for TPU.

TPU-native equivalent of `/root/reference/include/ceres_slam/stereo_camera.hpp`.
Observations are ``(u_l, v_l, disparity)`` triples (obs_dim = 3,
stereo_camera.hpp:20). The analytic projection/triangulation Jacobians
(stereo_camera.hpp:86-108, :112-144) are reproduced in closed form and
batched over arbitrary leading dimensions; they feed the factor kernels
instead of Ceres's Jet autodiff.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

OBS_DIM = 3


class StereoCamera(NamedTuple):
    """Intrinsics ``(fu, fv, cu, cv, b)`` — a pytree of scalars, so it can be
    closed over by jit or passed as an argument freely."""

    fu: jnp.ndarray  # horizontal focal length [px]
    fv: jnp.ndarray  # vertical focal length [px]
    cu: jnp.ndarray  # horizontal principal point [px]
    cv: jnp.ndarray  # vertical principal point [px]
    b: jnp.ndarray  # stereo baseline [m]

    @classmethod
    def create(cls, fu, fv, cu, cv, b) -> "StereoCamera":
        return cls(*(jnp.asarray(x) for x in (fu, fv, cu, cv, b)))

    # -- projection ---------------------------------------------------------

    def project(self, pt_c: jnp.ndarray) -> jnp.ndarray:
        """Camera-frame point(s) ``[..., 3]`` -> uvd observation(s) ``[..., 3]``.

        stereo_camera.hpp:77-85: ``u = fu x/z + cu; v = fv y/z + cv;
        d = fu b / z``.
        """
        one_over_z = 1.0 / pt_c[..., 2]
        u = self.fu * pt_c[..., 0] * one_over_z + self.cu
        v = self.fv * pt_c[..., 1] * one_over_z + self.cv
        d = self.fu * self.b * one_over_z
        return jnp.stack([u, v, d], axis=-1)

    def projection_jacobian(self, pt_c: jnp.ndarray) -> jnp.ndarray:
        """Analytic ``d(uvd)/d(pt_c)`` ``[..., 3, 3]`` (stereo_camera.hpp:86-108)."""
        z = pt_c[..., 2]
        one_over_z = 1.0 / z
        one_over_z2 = one_over_z * one_over_z
        zero = jnp.zeros_like(z)
        row_u = jnp.stack(
            [self.fu * one_over_z, zero, -self.fu * pt_c[..., 0] * one_over_z2],
            axis=-1,
        )
        row_v = jnp.stack(
            [zero, self.fv * one_over_z, -self.fv * pt_c[..., 1] * one_over_z2],
            axis=-1,
        )
        row_d = jnp.stack([zero, zero, -self.fu * self.b * one_over_z2], axis=-1)
        return jnp.stack([row_u, row_v, row_d], axis=-2)

    def project_with_jacobian(self, pt_c: jnp.ndarray):
        return self.project(pt_c), self.projection_jacobian(pt_c)

    # -- triangulation ------------------------------------------------------

    def triangulate(self, obs: jnp.ndarray) -> jnp.ndarray:
        """uvd observation(s) ``[..., 3]`` -> camera-frame point(s) ``[..., 3]``.

        stereo_camera.hpp:112-125: ``x=(u-cu) b/d; y=(v-cv)(b/d)(fu/fv);
        z = fu b/d``.
        """
        b_over_d = self.b / obs[..., 2]
        fu_over_fv = self.fu / self.fv
        x = (obs[..., 0] - self.cu) * b_over_d
        y = (obs[..., 1] - self.cv) * b_over_d * fu_over_fv
        z = self.fu * b_over_d
        return jnp.stack([x, y, z], axis=-1)

    def triangulation_jacobian(self, obs: jnp.ndarray) -> jnp.ndarray:
        """Analytic ``d(pt_c)/d(uvd)`` ``[..., 3, 3]`` (stereo_camera.hpp:126-144)."""
        d = obs[..., 2]
        b_over_d = self.b / d
        b_over_d2 = b_over_d / d
        fu_over_fv = self.fu / self.fv
        zero = jnp.zeros_like(d)
        row_x = jnp.stack([b_over_d, zero, (self.cu - obs[..., 0]) * b_over_d2], axis=-1)
        row_y = jnp.stack(
            [zero, b_over_d * fu_over_fv, (self.cv - obs[..., 1]) * b_over_d2 * fu_over_fv],
            axis=-1,
        )
        row_z = jnp.stack([zero, zero, -self.fu * b_over_d2], axis=-1)
        return jnp.stack([row_x, row_y, row_z], axis=-2)

    def triangulate_with_jacobian(self, obs: jnp.ndarray):
        return self.triangulate(obs), self.triangulation_jacobian(obs)

    def astype(self, dtype) -> "StereoCamera":
        """Counterpart of the reference's ``cast<OtherScalar>()``."""
        return StereoCamera(*(jnp.asarray(x, dtype) for x in self))
