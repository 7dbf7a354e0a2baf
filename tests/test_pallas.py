"""Pallas fused stereo-factor kernel vs the XLA reference path (interpret
mode on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import factors, lie
from ceres_slam_tpu.ops.pallas_kernels import TILE, stereo_factor_blocks

CAM = StereoCamera.create(500.0, 500.0, 320.0, 240.0, 0.5)


def test_pallas_matches_xla_blocks():
    N = TILE
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    T = lie.se3_exp(0.3 * jax.random.normal(k[0], (N, 6), dtype=jnp.float64))
    p = jax.random.normal(k[1], (N, 3), dtype=jnp.float64) + jnp.array([0.0, 0.0, 10.0])
    uvd = CAM.project(lie.se3_transform_point(T, p)) + jax.random.normal(
        k[2], (N, 3), dtype=jnp.float64
    )
    stiff = jnp.broadcast_to(2.0 * jnp.eye(3), (N, 3, 3))
    valid = jax.random.bernoulli(k[3], 0.8, (N,))

    r_p, hpp_p, hll_p, u_p, gp_p, gl_p = stereo_factor_blocks(
        CAM, T, p, uvd, stiff, valid, interpret=True
    )

    # reference path (f32 for comparison parity with the kernel dtype)
    r, J_pose, J_pt = factors.stereo_reprojection(CAM, T, p, uvd, stiff)
    w = valid.astype(jnp.float64)
    r = r * w[:, None]
    J_pose = J_pose * w[:, None, None]
    J_pt = J_pt * w[:, None, None]
    hpp = jnp.einsum("nri,nrj->nij", J_pose, J_pose)
    hll = jnp.einsum("nri,nrj->nij", J_pt, J_pt)
    u = jnp.einsum("nri,nrj->nij", J_pose, J_pt)
    gp = jnp.einsum("nri,nr->ni", J_pose, r)
    gl = jnp.einsum("nri,nr->ni", J_pt, r)

    # kernel runs in f32; compare with tolerances scaled to magnitudes
    def close(a, b, tol):
        scale = np.maximum(1.0, np.abs(np.asarray(b)).max())
        return np.allclose(np.asarray(a), np.asarray(b), atol=tol * scale)

    assert close(r_p, r, 1e-5)
    assert close(hpp_p, hpp, 1e-4)
    assert close(hll_p, hll, 1e-4)
    assert close(u_p, u, 1e-4)
    assert close(gp_p, gp, 1e-4)
    assert close(gl_p, gl, 1e-4)


def test_schur_matvec_kernel_matches_gather():
    """The lane-major Schur matvec kernel (ops.pallas_kernels.schur_uy,
    interpret mode) reproduces both the gather-table and the naive
    segment-sum matvecs on a random BA problem."""
    import bench
    from ceres_slam_tpu.solver import pcg

    bench.K, bench.J, bench.N_OBS = 16, 64, 512
    problem, state = bench.build(jnp.float32)
    K, J = 16, 64
    tables = pcg.build_obs_tables(
        problem.stereo.pose_idx, problem.stereo.point_idx, K, J)
    b = pcg.build_obs_blocks(problem, state, jnp.asarray(1e-4, jnp.float32),
                             tables=tables, fused=False)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(size=(K, 6)), jnp.float32)

    sv_gather = pcg.schur_matvec_gather(b, tables, v)
    sv_naive = pcg.schur_matvec(b, v)
    mv_kernel = pcg.make_schur_matvec_kernel(b, tables, interpret=True)
    sv_kernel = mv_kernel(v)

    scale = float(jnp.max(jnp.abs(sv_naive))) + 1.0
    np.testing.assert_allclose(np.asarray(sv_gather) / scale,
                               np.asarray(sv_naive) / scale, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sv_kernel) / scale,
                               np.asarray(sv_naive) / scale, atol=2e-5)
