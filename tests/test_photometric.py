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
