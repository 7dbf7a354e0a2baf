"""Dense photometric alignment tests (the ImageError workload)."""

import jax
import jax.numpy as jnp
import numpy as np

from ceres_slam_tpu.apps.dense_stereo import make_scene, run
from ceres_slam_tpu.ops import lie, photometric
from ceres_slam_tpu.solver import lm as lm_mod
from ceres_slam_tpu.solver import photometric as ph


def test_residual_zero_at_truth():
    cam, img_ref, img_trk, gu, gv, disp_ref, T_true = make_scene(H=60, W=80)
    H, W = img_ref.shape
    uu, vv = np.meshgrid(np.arange(8, W - 8), np.arange(8, H - 8))
    ref_uv = jnp.asarray(np.stack([uu.reshape(-1), vv.reshape(-1)], -1), jnp.float64)
    idx = (vv.reshape(-1), uu.reshape(-1))
    ref_I = img_ref[idx]
    d = disp_ref[idx]
    r, J_pose, J_disp, ok = photometric.photometric_residual(
        cam, T_true, d, ref_uv, ref_I, img_trk, gu, gv,
        jnp.ones(ref_uv.shape[0], bool),
    )
    assert float(jnp.sqrt(jnp.mean(r**2))) < 0.01  # interpolation error only
    assert np.all(np.isfinite(np.asarray(J_pose)))
    assert np.all(np.isfinite(np.asarray(J_disp)))


def test_out_of_bounds_pixels_zeroed():
    # image_error.hpp:102-128 — OOB pixels give zero residual AND Jacobian.
    cam, img_ref, img_trk, gu, gv, disp_ref, T_true = make_scene(H=60, W=80)
    # a huge pose throws every projection out of bounds
    T_far = lie.se3_make(jnp.array([100.0, 100.0, 100.0]), jnp.eye(3, dtype=jnp.float64))
    ref_uv = jnp.asarray([[40.0, 30.0], [50.0, 20.0]])
    r, J_pose, J_disp, ok = photometric.photometric_residual(
        cam, T_far, jnp.array([10.0, 12.0]), ref_uv,
        jnp.array([0.5, 0.5]), img_trk, gu, gv, jnp.ones(2, bool),
    )
    assert not np.any(np.asarray(ok))
    assert np.allclose(r, 0.0)
    assert np.allclose(J_pose, 0.0)
    assert np.allclose(J_disp, 0.0)


def test_nn_interpolation_mode_runs():
    cam, img_ref, img_trk, gu, gv, disp_ref, T_true = make_scene(H=60, W=80)
    ref_uv = jnp.asarray([[40.0, 30.0]])
    r, *_ = photometric.photometric_residual(
        cam, T_true, jnp.array([disp_ref[30, 40]]), ref_uv,
        jnp.array([img_ref[30, 40]]), img_trk, gu, gv, jnp.ones(1, bool),
        interp="nn",
    )
    assert np.isfinite(float(r[0]))


def test_alignment_recovers_pose():
    summary, err0, err1 = run(H=80, W=100, pose_noise=0.02, verbose=False)
    assert float(jnp.linalg.norm(err1)) < 0.35 * float(jnp.linalg.norm(err0))
    assert float(summary.final_cost) < 0.05 * float(summary.initial_cost)


def test_pallas_sampler_matches_gather():
    """The VMEM-resident MXU sampling kernel (pallas_kernels.
    bilinear_sample_imgs, interpret mode here) reproduces the gather
    path's residuals/Jacobians to f32 rounding — including out-of-bounds
    masking."""
    cam, img_ref, img_trk, gu, gv, disp_ref, T_true = make_scene(H=60, W=80)
    H, W = img_ref.shape
    uu, vv = np.meshgrid(np.arange(2, W - 2), np.arange(2, H - 2))
    ref_uv = jnp.asarray(np.stack([uu.reshape(-1), vv.reshape(-1)], -1),
                         jnp.float64)
    idx = (vv.reshape(-1), uu.reshape(-1))
    rng = np.random.default_rng(3)
    d = disp_ref[idx] + jnp.asarray(rng.normal(0, 0.5, len(idx[0])))
    T = lie.se3_retract(T_true, jnp.asarray(rng.normal(0, 0.01, 6)))
    args = (cam, T, d, ref_uv, img_ref[idx], img_trk, gu, gv,
            jnp.ones(ref_uv.shape[0], bool))
    r0, Jp0, Jd0, ok0 = photometric.photometric_residual(*args)
    r1, Jp1, Jd1, ok1 = photometric.photometric_residual(
        *args, sampler="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(ok0), np.asarray(ok1))
    # kernel samples in f32; tolerance is f32 rounding on O(1) intensities
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(Jp1), np.asarray(Jp0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(Jd1), np.asarray(Jd0), atol=2e-4)


def test_pallas_sampler_solver_converges():
    """End-to-end solve with the kernel sampler lands at the same pose as
    the gather sampler."""
    cam, img_ref, img_trk, gu, gv, disp_ref, T_true = make_scene(H=60, W=80)
    H, W = img_ref.shape
    rng = np.random.default_rng(5)
    uu, vv = np.meshgrid(np.arange(6, W - 6), np.arange(6, H - 6))
    sel_idx = (vv.reshape(-1), uu.reshape(-1))
    ref_uv = jnp.asarray(np.stack([uu.reshape(-1), vv.reshape(-1)], -1),
                         jnp.float64)
    d0 = disp_ref[sel_idx] + jnp.asarray(
        rng.normal(0, 0.3, len(sel_idx[0])))
    problem = ph.PhotometricProblem(
        camera=cam, ref_uv=ref_uv, ref_intensity=img_ref[sel_idx],
        track_img=img_trk, grad_u=gu, grad_v=gv,
        valid=jnp.ones(ref_uv.shape[0], bool), disp_meas=d0,
        disp_stiffness=jnp.asarray(3.0))
    T0 = lie.se3_retract(T_true, jnp.asarray(rng.normal(0, 0.02, 6)))
    state0 = ph.PhotometricState(T=T0, disparities=d0)
    cfg = lm_mod.SolveConfig(max_iters=25)
    sol_g, sum_g = ph.solve_photometric(problem, state0, cfg,
                                        sampler="gather")
    sol_p, sum_p = ph.solve_photometric(problem, state0, cfg,
                                        sampler="pallas_interpret")
    err_g = float(jnp.linalg.norm(lie.se3_log(
        lie.se3_compose(sol_g.T, lie.se3_inverse(T_true)))))
    err_p = float(jnp.linalg.norm(lie.se3_log(
        lie.se3_compose(sol_p.T, lie.se3_inverse(T_true)))))
    assert err_p < max(1.5 * err_g, 5e-3), (err_p, err_g)
