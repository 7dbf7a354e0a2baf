"""Stereo-camera and lighting model tests.

Golden configurations from `/root/reference/tests/camera_test.cpp` (KITTI
intrinsics, triangulate/project round trip + analytic Jacobians) and
`/root/reference/tests/light_test.cpp` (expected shades 0.377606521 and
0.777672166 recorded in its comments at :36 and :47).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ceres_slam_tpu.models import lighting
from ceres_slam_tpu.models.stereo_camera import StereoCamera

KITTI_CAM = StereoCamera.create(707.0912, 707.0912, 601.8873, 183.1104, 0.535105804)


class TestStereoCamera:
    def test_triangulate_project_roundtrip(self):
        # camera_test.cpp:24-36
        obs = jnp.array([60.0, 71.0, 12.0])
        pt = KITTI_CAM.triangulate(obs)
        obs2 = KITTI_CAM.project(pt)
        assert np.allclose(obs2, obs, atol=1e-10)

    def test_triangulate_values(self):
        obs = jnp.array([60.0, 71.0, 12.0])
        pt = KITTI_CAM.triangulate(obs)
        b_over_d = 0.535105804 / 12.0
        expect = [
            (60.0 - 601.8873) * b_over_d,
            (71.0 - 183.1104) * b_over_d,  # fu == fv
            707.0912 * b_over_d,
        ]
        assert np.allclose(pt, expect, atol=1e-12)

    def test_projection_jacobian_vs_autodiff(self):
        pt = jnp.array([1.3, -0.7, 8.5])
        J = KITTI_CAM.projection_jacobian(pt)
        J_ad = jax.jacfwd(KITTI_CAM.project)(pt)
        assert np.allclose(J, J_ad, atol=1e-9)

    def test_triangulation_jacobian_vs_autodiff(self):
        obs = jnp.array([60.0, 71.0, 12.0])
        J = KITTI_CAM.triangulation_jacobian(obs)
        J_ad = jax.jacfwd(KITTI_CAM.triangulate)(obs)
        assert np.allclose(J, J_ad, atol=1e-12)

    def test_jacobians_are_inverses(self):
        # project(triangulate(obs)) == obs, so the Jacobians must be inverse.
        obs = jnp.array([160.0, 120.0, 7.0])
        pt, Jt = KITTI_CAM.triangulate_with_jacobian(obs)
        _, Jp = KITTI_CAM.project_with_jacobian(pt)
        assert np.allclose(Jp @ Jt, jnp.eye(3), atol=1e-10)

    def test_batched(self):
        obs = jnp.array([[60.0, 71.0, 12.0], [160.0, 120.0, 7.0]])
        pts = KITTI_CAM.triangulate(obs)
        assert pts.shape == (2, 3)
        assert np.allclose(KITTI_CAM.project(pts), obs, atol=1e-10)
        assert KITTI_CAM.projection_jacobian(pts).shape == (2, 3, 3)


class TestLighting:
    # light_test.cpp setup: material (ambient=0.1, specular=0.3, exp=10),
    # texture kd=0.6, point light at (-2,-2,2), camera at origin.
    phong = jnp.array([0.1, 0.3, 10.0])
    kd = jnp.array(0.6)
    light_pos = jnp.array([-2.0, -2.0, 2.0])
    cam_pos = jnp.zeros(3)

    def _reference_shade(self, pos, nrm):
        """Independent numpy evaluation of the reference Phong equations
        (phong.hpp:25-104: ambient disabled, diffuse kd*max(0,l.n),
        specular ks*max(0,r.c)^alpha, clamp [0,1]). The literals in
        light_test.cpp comments (:36, :47) are *observed intensities* for
        its commented-out residual check, not golden shades — so we verify
        against the model equations directly."""
        pos, nrm = np.asarray(pos), np.asarray(nrm)
        lv = np.asarray(self.light_pos) - pos
        ld = lv / np.linalg.norm(lv)
        cv = np.asarray(self.cam_pos) - pos
        cd = cv / np.linalg.norm(cv)
        diffuse = float(self.kd) * max(0.0, float(ld @ nrm))
        mirror = 2.0 * (nrm @ ld) * nrm - ld
        mirror = mirror / np.linalg.norm(mirror)
        spec = float(self.phong[1]) * max(0.0, float(mirror @ cd)) ** float(self.phong[2])
        return min(1.0, max(0.0, diffuse + spec))

    def test_point_light_shade_v28(self):
        # light_test.cpp:30-37 vertex
        pos = jnp.array([0.823015, 0.60803428, 0.0])
        nrm = jnp.array([0.0, 0.0, 1.0])
        col = lighting.point_light_shade(
            pos, nrm, self.phong, self.kd, self.light_pos, self.cam_pos
        )
        assert np.allclose(col, self._reference_shade(pos, nrm), atol=1e-12)

    def test_point_light_shade_v245(self):
        # light_test.cpp:40-47 vertex
        pos = jnp.array([0.08868649, 1.0, 0.7597348])
        nrm = jnp.array([0.0, -1.0, 0.0])
        col = lighting.point_light_shade(
            pos, nrm, self.phong, self.kd, self.light_pos, self.cam_pos
        )
        assert np.allclose(col, self._reference_shade(pos, nrm), atol=1e-12)

    def test_backfacing_light(self):
        # Light behind the surface: diffuse gates to 0 (phong.hpp:69-71) and
        # ambient is hard-disabled (phong.hpp:32-33). The reference does NOT
        # gate specular on n.l, so the mirror of a backfacing light can
        # still reflect into the camera: here mirror == (0,0,-1) == camera
        # dir, giving specular ks*1^alpha = 0.3 exactly.
        pos = jnp.array([0.0, 0.0, 1.0])
        nrm = jnp.array([0.0, 0.0, 1.0])
        col = lighting.point_light_shade(
            pos, nrm, self.phong, self.kd, jnp.array([0.0, 0.0, -5.0]), self.cam_pos
        )
        assert np.allclose(col, 0.3, atol=1e-12)

    def test_clamped_to_unit_interval(self):
        pos = jnp.array([0.0, 0.0, 1.0])
        nrm = jnp.array([0.0, 0.0, -1.0])  # facing camera
        big_kd = jnp.array(50.0)
        col = lighting.point_light_shade(
            pos, nrm, self.phong, big_kd, jnp.array([0.0, 0.0, -5.0]), self.cam_pos
        )
        assert np.allclose(col, 1.0)

    def test_directional_light(self):
        pos = jnp.array([0.0, 0.0, 2.0])
        nrm = jnp.array([0.0, 0.0, -1.0])
        # Directional light along -z illuminates a -z-facing normal.
        col = lighting.directional_light_shade(
            pos, nrm, self.phong, self.kd, jnp.array([0.0, 0.0, -1.0]), self.cam_pos
        )
        # diffuse = kd * (l.n) = 0.6; specular: mirror == l == camera dir.
        assert col > 0.59

    def test_degenerate_zero_light_vec_is_finite(self):
        # Pathological case guarded in phong.hpp:62-65 — vertex at the light.
        pos = self.light_pos
        nrm = jnp.array([0.0, 0.0, 1.0])
        col = lighting.point_light_shade(
            pos, nrm, self.phong, self.kd, self.light_pos, self.cam_pos
        )
        assert np.isfinite(col)

    def test_gradients_finite_through_gates(self):
        def f(nrm):
            return lighting.point_light_shade(
                jnp.array([0.823015, 0.60803428, 0.0]),
                nrm,
                self.phong,
                self.kd,
                self.light_pos,
                self.cam_pos,
            )

        g = jax.grad(f)(jnp.array([0.0, 0.0, 1.0]))
        assert np.all(np.isfinite(g))
        # at the gate boundary (backfacing) gradients must still be finite
        g2 = jax.grad(f)(jnp.array([0.0, 0.0, -1.0]))
        assert np.all(np.isfinite(g2))

    def test_batched_shading(self):
        pos = jnp.array([[0.823015, 0.60803428, 0.0], [0.08868649, 1.0, 0.7597348]])
        nrm = jnp.array([[0.0, 0.0, 1.0], [0.0, -1.0, 0.0]])
        col = lighting.point_light_shade(
            pos, nrm, self.phong, self.kd, self.light_pos, self.cam_pos
        )
        expect = [self._reference_shade(pos[i], nrm[i]) for i in range(2)]
        assert np.allclose(col, expect, atol=1e-12)
