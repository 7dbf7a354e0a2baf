"""Factor-kernel tests: every analytic tangent-space Jacobian is verified
against forward-mode autodiff through the retraction — the machine-checked
version of what Ceres's Jet autodiff guarantees in the reference."""

import jax
import jax.numpy as jnp
import numpy as np

from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import factors, lie

CAM = StereoCamera.create(707.0912, 707.0912, 601.8873, 183.1104, 0.535105804)


def _rand_pose(key, scale=0.5):
    return lie.se3_exp(scale * jax.random.normal(key, (6,), dtype=jnp.float64))


class TestInvSqrtPSD:
    def test_matches_eigen_operator_inverse_sqrt(self):
        A = jnp.array([[4.0, 1.0, 0.0], [1.0, 3.0, 0.5], [0.0, 0.5, 2.0]])
        S = factors.inv_sqrt_psd(A)
        assert np.allclose(S @ A @ S, jnp.eye(3), atol=1e-12)
        assert np.allclose(S, S.T, atol=1e-12)

    def test_diagonal(self):
        A = jnp.diag(jnp.array([4.0, 9.0, 16.0]))
        assert np.allclose(
            factors.inv_sqrt_psd(A), jnp.diag(jnp.array([0.5, 1 / 3, 0.25])), atol=1e-12
        )


class TestStereoReprojection:
    def setup_method(self):
        k = jax.random.split(jax.random.PRNGKey(7), 4)
        self.N = 12
        self.T = jax.vmap(_rand_pose)(jax.random.split(k[0], self.N))
        self.p = jax.random.normal(k[1], (self.N, 3), dtype=jnp.float64) + jnp.array(
            [0.0, 0.0, 10.0]
        )
        p_c = lie.se3_transform_point(self.T, self.p)
        self.obs = CAM.project(p_c) + 0.5 * jax.random.normal(
            k[2], (self.N, 3), dtype=jnp.float64
        )
        cov = jnp.eye(3) * jnp.array([0.25, 0.25, 0.49])
        self.S = jnp.broadcast_to(factors.inv_sqrt_psd(cov), (self.N, 3, 3))

    def test_residual_value(self):
        r, _, _ = factors.stereo_reprojection(CAM, self.T, self.p, self.obs, self.S)
        pred = CAM.project(lie.se3_transform_point(self.T, self.p))
        expect = jnp.einsum("nij,nj->ni", self.S, pred - self.obs)
        assert np.allclose(r, expect, atol=1e-12)

    def test_jacobians_vs_autodiff(self):
        r, J_pose, J_point = factors.stereo_reprojection(
            CAM, self.T, self.p, self.obs, self.S
        )
        for n in [0, 5, 11]:
            T, p, o, S = self.T[n], self.p[n], self.obs[n], self.S[n]

            def r_of_eps(eps):
                pred = CAM.project(
                    lie.se3_transform_point(lie.se3_retract(T, eps), p)
                )
                return S @ (pred - o)

            def r_of_p(q):
                return S @ (CAM.project(lie.se3_transform_point(T, q)) - o)

            assert np.allclose(J_pose[n], jax.jacfwd(r_of_eps)(jnp.zeros(6)), atol=1e-9)
            assert np.allclose(J_point[n], jax.jacfwd(r_of_p)(p), atol=1e-9)


class TestPosePrior:
    def test_jacobian_vs_autodiff(self):
        k = jax.random.split(jax.random.PRNGKey(3), 2)
        T = _rand_pose(k[0])
        T_ref = lie.se3_compose(lie.se3_exp(0.1 * jnp.ones(6)), T)
        S = factors.inv_sqrt_psd(jnp.eye(6) * 0.01)
        r, J = factors.pose_prior(T, T_ref, S)

        def r_of_eps(eps):
            Tp = lie.se3_retract(T, eps)
            return S @ lie.se3_log(lie.se3_compose(T_ref, lie.se3_inverse(Tp)))

        assert np.allclose(r, r_of_eps(jnp.zeros(6)), atol=1e-12)
        assert np.allclose(J, jax.jacfwd(r_of_eps)(jnp.zeros(6)), atol=1e-9)

    def test_at_zero_residual(self):
        # T == T_ref: the Jet path would hit the norm-at-zero singularity;
        # the analytic form must stay finite with J -> -I.
        T = _rand_pose(jax.random.PRNGKey(9))
        S = jnp.eye(6)
        r, J = factors.pose_prior(T, T, S)
        assert np.allclose(r, 0.0, atol=1e-14)
        assert np.allclose(J, -jnp.eye(6), atol=1e-9)


class TestRelativePose:
    def test_jacobians_vs_autodiff(self):
        k = jax.random.split(jax.random.PRNGKey(11), 3)
        T1 = _rand_pose(k[0])
        T2 = _rand_pose(k[1])
        T_ref = lie.se3_compose(
            lie.se3_exp(0.05 * jax.random.normal(k[2], (6,), dtype=jnp.float64)),
            lie.se3_compose(T2, lie.se3_inverse(T1)),
        )
        S = factors.inv_sqrt_psd(jnp.eye(6) * 0.04)
        r, J1, J2 = factors.relative_pose(T1, T2, T_ref, S)

        def r_of(e1, e2):
            T1p = lie.se3_retract(T1, e1)
            T2p = lie.se3_retract(T2, e2)
            T_est = lie.se3_compose(T1p, lie.se3_inverse(T2p))
            return S @ lie.se3_log(lie.se3_compose(T_ref, T_est))

        z = jnp.zeros(6)
        assert np.allclose(r, r_of(z, z), atol=1e-12)
        assert np.allclose(J1, jax.jacfwd(lambda e: r_of(e, z))(z), atol=1e-9)
        assert np.allclose(J2, jax.jacfwd(lambda e: r_of(z, e))(z), atol=1e-9)


class TestSunSensor:
    def setup_method(self):
        self.T = _rand_pose(jax.random.PRNGKey(5), scale=0.3)
        self.sun_g = jnp.array([0.2, -0.5, 0.84])
        self.sun_g = self.sun_g / jnp.linalg.norm(self.sun_g)
        s_c = lie.se3_transform_vector(self.T, self.sun_g)
        # observation near the prediction (inside the gate)
        self.obs_c = lie.unit_vector_retract(s_c, jnp.array([0.02, -0.01, 0.03]))
        self.S = factors.inv_sqrt_psd(jnp.eye(2) * 0.01)

    def test_jacobian_vs_autodiff(self):
        r, J = factors.sun_sensor(
            self.T[None], self.obs_c[None], self.sun_g[None], self.S[None]
        )

        def r_of_eps(eps):
            out, _ = factors.sun_sensor(
                lie.se3_retract(self.T, eps)[None],
                self.obs_c[None],
                self.sun_g[None],
                self.S[None],
            )
            return out[0]

        assert np.allclose(J[0], jax.jacfwd(r_of_eps)(jnp.zeros(6)), atol=1e-9)

    def test_gating_zeroes_residual_and_jacobian(self):
        # sun_sensor_error.hpp:87-93 — beyond the threshold both the
        # residual and (via the branch) its derivative are zeroed.
        r, J = factors.sun_sensor(
            self.T[None],
            self.obs_c[None],
            self.sun_g[None],
            self.S[None],
            az_err_thresh=1e-8,
            zen_err_thresh=1e-8,
        )
        assert np.allclose(r, 0.0)
        assert np.allclose(J, 0.0)

    def test_azimuth_wraparound(self):
        # Observation and prediction on opposite sides of the +-pi seam:
        # the wrapped error must be small, not ~2pi (sun_sensor_error.hpp:80-84).
        T = lie.se3_identity()
        sun_g = jnp.array([jnp.sin(jnp.pi - 0.01), 0.0, jnp.cos(jnp.pi - 0.01)])
        obs_c = jnp.array([jnp.sin(-jnp.pi + 0.01), 0.0, jnp.cos(-jnp.pi + 0.01)])
        r, _ = factors.sun_sensor(
            T[None], obs_c[None], sun_g[None], jnp.eye(2)[None]
        )
        assert abs(float(r[0, 0])) < 0.03


class TestNormal:
    def test_jacobians_vs_autodiff(self):
        T = _rand_pose(jax.random.PRNGKey(13), scale=0.4)
        n_g = jnp.array([0.0, 0.6, 0.8])
        n_obs = lie.unit_vector_retract(
            lie.se3_transform_vector(T, n_g), jnp.array([0.05, 0.0, -0.02])
        )
        S = factors.inv_sqrt_psd(jnp.eye(3) * 0.04)
        r, J_pose, J_n = factors.normal_obs(T[None], n_g[None], n_obs[None], S[None])

        def r_of(eps, n):
            return S @ (
                lie.se3_transform_vector(lie.se3_retract(T, eps), n) - n_obs
            )

        z = jnp.zeros(6)
        assert np.allclose(r[0], r_of(z, n_g), atol=1e-12)
        assert np.allclose(J_pose[0], jax.jacfwd(lambda e: r_of(e, n_g))(z), atol=1e-9)
        assert np.allclose(J_n[0], jax.jacfwd(lambda n: r_of(z, n))(n_g), atol=1e-9)

    def test_unit_vector_projector(self):
        n = jnp.array([0.0, 0.6, 0.8])
        P = factors.unit_vector_tangent_projector(n)
        P_ad = jax.jacfwd(lambda d: lie.unit_vector_retract(n, d))(jnp.zeros(3))
        assert np.allclose(P, P_ad, atol=1e-12)


class TestIntensity:
    def setup_method(self):
        k = jax.random.split(jax.random.PRNGKey(21), 5)
        self.N = 4
        self.T = jax.vmap(lambda kk: _rand_pose(kk, 0.3))(jax.random.split(k[0], self.N))
        self.pt = jax.random.normal(k[1], (self.N, 3), dtype=jnp.float64) + jnp.array(
            [0.0, 0.0, 5.0]
        )
        n = jax.random.normal(k[2], (self.N, 3), dtype=jnp.float64)
        self.normal = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        self.phong = jnp.tile(jnp.array([0.1, 0.3, 10.0]), (self.N, 1))
        self.texture = jnp.full((self.N,), 0.6)
        self.light_pos = jnp.array([-2.0, -2.0, 2.0])
        self.obs = jnp.full((self.N,), 0.4)
        self.stiff = jnp.full((self.N,), 2.0)

    def test_point_light_jacobians_vs_autodiff(self):
        out = factors.intensity_point_light(
            self.T, self.pt, self.normal, self.phong, self.texture,
            self.light_pos, self.obs, self.stiff,
        )
        r, J_pose, J_pt, J_n, J_ph, J_tex, J_light = out
        n = 1

        def r_of(eps, pt, nrm, ph, tex, lp):
            pred = factors._intensity_predict(
                lie.se3_retract(self.T[n], eps), pt, nrm, ph, tex, lp, False
            )
            return self.stiff[n] * (pred - self.obs[n])

        args = (jnp.zeros(6), self.pt[n], self.normal[n], self.phong[n],
                self.texture[n], self.light_pos)
        for i, J in enumerate([J_pose, J_pt, J_n, J_ph, J_tex, J_light]):
            g = jax.jacfwd(r_of, argnums=i)(*args)
            assert np.allclose(J[n], g, atol=1e-9), f"block {i}"

    def test_directional_light_runs_and_matches_shape(self):
        light_dir = jnp.array([0.0, 0.0, 1.0])
        out = factors.intensity_directional_light(
            self.T, self.pt, self.normal, self.phong, self.texture,
            light_dir, self.obs, self.stiff,
        )
        r = out[0]
        assert r.shape == (self.N,)
        assert np.all(np.isfinite(np.asarray(r)))
        for J in out[1:]:
            assert np.all(np.isfinite(np.asarray(J)))
