"""Geometry-core tests.

Golden cases are transcribed from the reference's print-based smoke test
(`/root/reference/tests/geometry_test.cpp`) — e.g. the 90-degree rotation
C4 (:110) and the real-VO regression matrices (:209-245) — plus algebraic
identities (exp/log round trips, compose/inverse, adjoint) that the
reference only eyeballs by stdout inspection.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceres_slam_tpu.ops import lie


def rand_phi(key, scale=1.0, batch=()):
    return scale * jax.random.normal(key, (*batch, 3), dtype=jnp.float64)


class TestSO3:
    def test_wedge_vee_roundtrip(self):
        phi = jnp.array([1.0, 2.0, 3.0])
        W = lie.so3_wedge(phi)
        assert np.allclose(W, [[0, -3, 2], [3, 0, -1], [-2, 1, 0]])
        assert np.allclose(lie.so3_vee(W), phi)

    def test_exp_ninety_degrees(self):
        # geometry_test.cpp:110 — C4 = Rz(90deg)
        phi = jnp.array([0.0, 0.0, np.pi / 2])
        C = lie.so3_exp(phi)
        assert np.allclose(C, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-15)
        assert np.allclose(lie.so3_log(C), phi, atol=1e-15)

    def test_exp_log_roundtrip_batched(self):
        # Keep |phi| < pi: so3_log returns the principal logarithm.
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        phi = rand_phi(keys[0], scale=0.9, batch=(64,))
        phi = phi / jnp.maximum(1.0, jnp.linalg.norm(phi, axis=-1, keepdims=True) / 3.0)
        C = lie.so3_exp(phi)
        # orthonormality, det +1
        eye = jnp.eye(3)
        assert np.allclose(C @ jnp.swapaxes(C, -1, -2), eye, atol=1e-12)
        assert np.allclose(jnp.linalg.det(C), 1.0, atol=1e-12)
        assert np.allclose(lie.so3_log(C), phi, atol=1e-9)

    def test_exp_small_angle(self):
        phi = jnp.array([1e-10, -2e-10, 3e-10])
        C = lie.so3_exp(phi)
        assert np.allclose(C, jnp.eye(3) + lie.so3_wedge(phi), atol=1e-18)
        assert np.allclose(lie.so3_log(C), phi, atol=1e-18, rtol=1e-6)
        # exactly zero
        assert np.allclose(lie.so3_exp(jnp.zeros(3)), jnp.eye(3))
        assert np.allclose(lie.so3_log(jnp.eye(3)), jnp.zeros(3))

    def test_inverse_is_transpose(self):
        C = lie.so3_exp(jnp.array([0.3, -0.2, 0.9]))
        assert np.allclose(lie.so3_inverse(C) @ C, jnp.eye(3), atol=1e-14)

    def test_normalize_projects_to_so3(self):
        C = lie.so3_exp(jnp.array([0.3, -0.2, 0.9])) + 1e-3 * jnp.ones((3, 3))
        Cn = lie.so3_normalize(C)
        assert np.allclose(Cn @ Cn.T, jnp.eye(3), atol=1e-12)
        assert np.allclose(jnp.linalg.det(Cn), 1.0, atol=1e-12)

    def test_retract(self):
        C = lie.so3_exp(jnp.array([0.1, 0.2, 0.3]))
        psi = jnp.array([0.01, -0.02, 0.03])
        assert np.allclose(lie.so3_retract(C, psi), lie.so3_exp(psi) @ C)


class TestSE3:
    def test_wedge_vee_roundtrip(self):
        xi = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
        Xi = lie.se3_wedge(xi)
        assert np.allclose(Xi[:3, 3], [1, 2, 3])
        assert np.allclose(lie.se3_vee(Xi), xi)

    def test_exp_is_first_order_in_translation(self):
        # Reference convention (se3group.hpp:313-325): t passes through
        # unrotated, NOT multiplied by the SO(3) left Jacobian.
        xi = jnp.array([1.0, 2.0, 3.0, 0.4, 0.5, 0.6])
        T = lie.se3_exp(xi)
        assert np.allclose(lie.se3_trans(T), [1, 2, 3])
        assert np.allclose(lie.se3_rot(T), lie.so3_exp(xi[3:]))
        assert np.allclose(lie.se3_log(T), xi, atol=1e-12)

    def test_compose_inverse_identity(self):
        # geometry_test.cpp:247-250 — T * T^-1 == I
        M = jnp.array(
            [[0.9995, -0.02937, 0.009072, -0.9472],
             [-0.005199, -0.4525, -0.8918, 0.4422],
             [0.03029, 0.8913, -0.4524, 1.35],
             [0.0, 0.0, 0.0, 1.0]]
        )
        T = lie.se3_from_matrix(M)
        TT = lie.se3_compose(T, lie.se3_inverse(T))
        assert np.allclose(TT, lie.se3_identity(), atol=1e-3)  # M is only 4-digit
        TT2 = lie.se3_compose(lie.se3_inverse(T), T)
        assert np.allclose(TT2, lie.se3_identity(), atol=1e-3)

    def test_compose_matches_matrix_product(self):
        # geometry_test.cpp:209-245 real-VO regression case.
        T_0_w = jnp.array(
            [[1, -0.0, 0, -1],
             [0, -0.4472, -0.8944, 0.4472],
             [0, 0.8944, -0.4472, 1.342],
             [0, 0, 0, 1.0]]
        )
        T_1_0 = jnp.array(
            [[0.9998, 0.009125, -0.01825, 0.04081],
             [-0.009271, 0.9999, -0.007961, 0.0178],
             [0.01818, 0.008128, 0.9998, -0.0349],
             [0, 0, 0, 1.0]]
        )
        out = lie.se3_compose(lie.se3_from_matrix(T_1_0), lie.se3_from_matrix(T_0_w))
        assert np.allclose(lie.se3_matrix(out), T_1_0 @ T_0_w, atol=1e-14)

    def test_transform_point_vs_matrix(self):
        T_mat = jnp.array(
            [[0, -1, 0, 1], [1, 0, 0, -1], [0, 0, 1, 1], [0, 0, 0, 1.0]]
        )
        T = lie.se3_from_matrix(T_mat)
        p = jnp.array([1.0, 2.0, 3.0])
        assert np.allclose(lie.se3_transform_point(T, p), (T_mat @ jnp.append(p, 1.0))[:3])
        v = jnp.array([1.0, 2.0, 3.0])
        assert np.allclose(lie.se3_transform_vector(T, v), T_mat[:3, :3] @ v)

    def test_adjoint_structure(self):
        T = lie.se3_exp(jnp.array([0.1, -0.2, 0.3, 0.4, -0.5, 0.6]))
        Ad = lie.se3_adjoint(T)
        R = lie.se3_rot(T)
        t = lie.se3_trans(T)
        assert np.allclose(Ad[:3, :3], R)
        assert np.allclose(Ad[:3, 3:], lie.so3_wedge(t) @ R)
        assert np.allclose(Ad[3:, :3], 0.0)
        assert np.allclose(Ad[3:, 3:], R)

    def test_flat_layout_matches_reference(self):
        # se3group.hpp:479: data = [t(3) | R row-major(9)]
        T_mat = jnp.array(
            [[0, -1, 0, 1], [1, 0, 0, -1], [0, 0, 1, 1], [0, 0, 0, 1.0]]
        )
        T = lie.se3_from_matrix(T_mat)
        assert np.allclose(T, [1, -1, 1, 0, -1, 0, 1, 0, 0, 0, 0, 1])

    def test_batched_ops(self):
        key = jax.random.PRNGKey(1)
        xi = jax.random.normal(key, (32, 6), dtype=jnp.float64)
        T = lie.se3_exp(xi)
        assert T.shape == (32, 12)
        Tinv = lie.se3_inverse(T)
        assert np.allclose(
            lie.se3_compose(T, Tinv), lie.se3_identity((32,)), atol=1e-12
        )
        p = jax.random.normal(key, (32, 3), dtype=jnp.float64)
        pc = lie.se3_transform_point(T, p)
        assert np.allclose(
            lie.se3_transform_point(Tinv, pc), p, atol=1e-12
        )

    def test_retraction_matches_reference_rule(self):
        # perturbations.hpp:62: T_new = exp(eps) * T
        T = lie.se3_exp(jnp.array([1.0, 2.0, 3.0, 0.1, 0.2, 0.3]))
        eps = jnp.array([0.01, 0.02, -0.01, 0.005, -0.002, 0.004])
        Tn = lie.se3_retract(T, eps)
        assert np.allclose(Tn, lie.se3_compose(lie.se3_exp(eps), T))


class TestJacobians:
    def test_point_transform_jacobians_vs_autodiff(self):
        T = lie.se3_exp(jnp.array([1.0, -2.0, 0.5, 0.3, -0.1, 0.2]))
        p = jnp.array([0.7, -1.3, 2.1])
        p_c, J_pose, J_point = lie.point_transform_jacobians(T, p)
        assert np.allclose(p_c, lie.se3_transform_point(T, p))

        J_pose_ad = jax.jacfwd(
            lambda e: lie.se3_transform_point(lie.se3_retract(T, e), p)
        )(jnp.zeros(6))
        assert np.allclose(J_pose, J_pose_ad, atol=1e-12)

        J_point_ad = jax.jacfwd(lambda q: lie.se3_transform_point(T, q))(p)
        assert np.allclose(J_point, J_point_ad, atol=1e-12)

    def test_vector_transform_jacobians_vs_autodiff(self):
        T = lie.se3_exp(jnp.array([1.0, -2.0, 0.5, 0.3, -0.1, 0.2]))
        v = jnp.array([0.0, 0.0, 1.0])
        v_c, J_pose, J_vec = lie.vector_transform_jacobians(T, v)
        J_pose_ad = jax.jacfwd(
            lambda e: lie.se3_transform_vector(lie.se3_retract(T, e), v)
        )(jnp.zeros(6))
        assert np.allclose(J_pose, J_pose_ad, atol=1e-12)
        J_vec_ad = jax.jacfwd(lambda q: lie.se3_transform_vector(T, q))(v)
        assert np.allclose(J_vec, J_vec_ad, atol=1e-12)


class TestUnitVector:
    def test_retract_stays_unit(self):
        x = jnp.array([0.0, 0.0, 1.0])
        d = jnp.array([0.1, -0.2, 0.5])
        y = lie.unit_vector_retract(x, d)
        assert np.allclose(jnp.linalg.norm(y), 1.0, atol=1e-15)

    def test_retract_matches_reference_formula(self):
        # perturbations.hpp:98-103
        x = jnp.array([0.3, -0.4, 0.8660254])
        d = jnp.array([0.05, 0.02, -0.01])
        d_orth = d - (jnp.dot(d, x) / jnp.dot(x, x)) * x
        expect = (x + d_orth) / jnp.linalg.norm(x + d_orth)
        assert np.allclose(lie.unit_vector_retract(x, d), expect, atol=1e-15)

    def test_zero_delta_is_identity_direction(self):
        x = jnp.array([3.0, 4.0, 0.0])  # not unit; should normalize
        y = lie.unit_vector_retract(x, jnp.zeros(3))
        assert np.allclose(y, jnp.array([0.6, 0.8, 0.0]), atol=1e-15)


def test_jit_and_grad_flow():
    """Everything must be jittable and differentiable (the replacement for
    ceres::Jet flowing through the templated C++)."""

    @jax.jit
    def fn(xi, p):
        T = lie.se3_exp(xi)
        return jnp.sum(lie.se3_transform_point(T, p) ** 2)

    g = jax.grad(fn)(jnp.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6]), jnp.ones(3))
    assert np.all(np.isfinite(g))


class TestNearestRotation:
    """TPU-safe SO(3) projection (lie.jacobi_eigh4 / nearest_rotation):
    jnp.linalg.svd is avoided on purpose — its TPU lowering is broken on
    this toolchain (r4: SIGABRT on a bare jitted batched 3x3 SVD, silent
    NaN/garbage inside larger programs)."""

    def test_jacobi_eigh4_matches_lapack(self):
        rng = np.random.default_rng(2)
        A = rng.normal(size=(40, 4, 4))
        A = A + np.swapaxes(A, -1, -2)
        vals, V = lie.jacobi_eigh4(jnp.asarray(A))
        vals, V = np.asarray(vals), np.asarray(V)
        w_ref = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(np.sort(vals, -1), w_ref,
                                   rtol=1e-12, atol=1e-12)
        # A V = V diag(vals)
        resid = np.einsum("bij,bjk->bik", A, V) - V * vals[:, None, :]
        assert np.abs(resid).max() < 1e-12

    def test_nearest_rotation_matches_svd(self):
        rng = np.random.default_rng(3)
        W = rng.normal(size=(60, 3, 3))
        R = np.asarray(lie.nearest_rotation(jnp.asarray(W)))
        U, _, Vt = np.linalg.svd(W)
        d = np.linalg.det(U) * np.linalg.det(Vt)
        D = np.stack([np.ones_like(d), np.ones_like(d), d], -1)
        R_ref = np.einsum("bij,bj,bjk->bik", U, D, Vt)
        np.testing.assert_allclose(R, R_ref, atol=1e-10)

    def test_nearest_rotation_reflection_case(self):
        """det(W) < 0 must still produce a PROPER rotation (the SVD path
        needs an explicit det fix; the quaternion path can't leave
        SO(3))."""
        W = np.diag([1.0, 1.0, -1.0])[None]
        R = np.asarray(lie.nearest_rotation(jnp.asarray(W)))[0]
        assert np.linalg.det(R) > 0.999
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)

    def test_nearest_rotation_degenerate_rank1(self):
        W = np.outer([1.0, 2.0, 3.0], [0.5, 0.1, -0.2])[None]
        R = np.asarray(lie.nearest_rotation(jnp.asarray(W)))[0]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.linalg.det(R) > 0.999

    def test_quat_to_rot_zero_quaternion_finite_f32(self):
        """The normalization floor must not underflow in f32: a zero
        quaternion in a pure-f32 session must yield a finite matrix, not
        NaN (advisor r4 finding on the 1e-300 literal)."""
        q0 = jnp.zeros((2, 4), jnp.float32)
        R = np.asarray(lie.quat_to_rot(q0))
        assert R.dtype == np.float32
        assert np.all(np.isfinite(R))
        # unit quaternion still normalizes exactly in both dtypes
        for dt in (np.float32, np.float64):
            q = jnp.asarray([[0.0, 1.0, 0.0, 0.0]], dt)
            R = np.asarray(lie.quat_to_rot(q))[0]
            np.testing.assert_allclose(
                R, np.diag([1.0, -1.0, -1.0]), atol=1e-6)

    def test_so3_normalize_projects_drifted_rotation(self):
        rng = np.random.default_rng(4)
        C = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, 1, (8, 3)))))
        drift = C + rng.normal(0, 1e-3, C.shape)
        Cn = np.asarray(lie.so3_normalize(jnp.asarray(drift)))
        np.testing.assert_allclose(
            np.einsum("bij,bkj->bik", Cn, Cn),
            np.broadcast_to(np.eye(3), Cn.shape), atol=1e-12)
        assert np.abs(Cn - C).max() < 5e-3
