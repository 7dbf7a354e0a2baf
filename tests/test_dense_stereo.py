"""Dense disparity front end tests (frontend/dense_stereo.py) — the
cv::StereoSGBM + cv::Sobel + cv::pyrDown roles of the reference driver
(/root/reference/tests/dense_stereo_test.cpp:52-90)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ceres_slam_tpu.apps.dense_stereo import make_scene, run, run_images
from ceres_slam_tpu.frontend import dense_stereo as front


def test_sobel_matches_manual_correlation():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(12, 16))
    gx, gy = front.sobel_gradients(jnp.asarray(img))
    kx = np.outer([1, 2, 1], [-1, 0, 1]).astype(float)
    p = np.pad(img, 1, mode="reflect")
    ref_gx = np.zeros_like(img)
    ref_gy = np.zeros_like(img)
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            win = p[y : y + 3, x : x + 3]
            ref_gx[y, x] = (win * kx).sum()
            ref_gy[y, x] = (win * kx.T).sum()
    np.testing.assert_allclose(np.asarray(gx), ref_gx, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gy), ref_gy, atol=1e-12)


def test_pyr_down_shape_and_smoothing():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(21, 34))
    out = np.asarray(front.pyr_down(jnp.asarray(img)))
    assert out.shape == (11, 17)  # ceil(n/2), cv::pyrDown convention
    # a constant image is preserved exactly (kernel sums to 1)
    const = np.asarray(front.pyr_down(jnp.full((20, 20), 3.25)))
    np.testing.assert_allclose(const, 3.25, atol=1e-12)
    # smoothing: downsampled noise has smaller high-frequency content
    assert np.std(np.diff(out, axis=1)) < np.std(np.diff(img, axis=1))


def test_box_filter_matches_naive():
    rng = np.random.default_rng(2)
    v = rng.normal(size=(3, 10, 12))
    out = np.asarray(front._box_filter_sum(jnp.asarray(v), 2))
    pad = np.pad(v, ((0, 0), (2, 2), (2, 2)), mode="edge")
    ref = np.zeros_like(v)
    for y in range(10):
        for x in range(12):
            ref[:, y, x] = pad[:, y : y + 5, x : x + 5].sum(axis=(1, 2))
    np.testing.assert_allclose(out, ref, atol=1e-9)


class TestMatcher:
    @pytest.fixture(scope="class")
    def scene(self):
        cam, img_ref, img_trk, gu, gv, disp_gt, T_true, img_right = (
            make_scene(H=96, W=128, stereo=True))
        return cam, img_ref, img_right, disp_gt

    def test_disparity_accuracy_on_rendered_pair(self, scene):
        cam, left, right, disp_gt = scene
        disp, valid = front.match_disparity(
            left.astype(jnp.float32), right.astype(jnp.float32),
            max_disp=32, block=5)
        disp, valid = np.asarray(disp), np.asarray(valid)
        gt = np.asarray(disp_gt)
        # interior: border columns can't match (u < d) and are masked
        m = valid.copy()
        m[:, :34] = False
        assert m.mean() > 0.4, f"valid density {m.mean()}"
        err = np.abs(disp - gt)[m]
        assert np.median(err) < 0.3, f"median err {np.median(err)}"
        assert (err < 1.0).mean() > 0.9, f"<1px fraction {(err < 1.0).mean()}"

    def test_left_border_invalidated(self, scene):
        cam, left, right, disp_gt = scene
        disp, valid = front.match_disparity(
            left.astype(jnp.float32), right.astype(jnp.float32),
            max_disp=32, block=5)
        valid = np.asarray(valid)
        gt = np.asarray(disp_gt)
        # pixels whose true match falls off the right image (u < d_gt)
        uu = np.arange(valid.shape[1])[None, :]
        off = uu < gt - 1.0
        assert valid[off].mean() < 0.35  # overwhelmingly masked

    def test_textureless_region_invalidated(self):
        # flat images: no unique match anywhere -> low valid density
        flat_l = jnp.full((64, 96), 0.5, jnp.float32)
        flat_r = jnp.full((64, 96), 0.5, jnp.float32)
        _, valid = front.match_disparity(flat_l, flat_r, max_disp=16)
        assert np.asarray(valid).mean() < 0.05

    def test_uniform_shift_recovered(self):
        # right = left shifted by an integer disparity -> exact recovery
        rng = np.random.default_rng(7)
        base = rng.uniform(0, 1, (48, 100))
        base = np.asarray(front.pyr_down(jnp.asarray(np.kron(
            base, np.ones((2, 2))))))  # smooth texture
        # right camera sees content shifted LEFT: right[u - d] = left[u]
        d_true = 6
        left = base[:, :-d_true]
        right = base[:, d_true:]
        disp, valid = front.match_disparity(
            jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32),
            max_disp=16, block=5)
        disp, valid = np.asarray(disp), np.asarray(valid)
        m = valid & (np.arange(left.shape[1])[None, :] >= 18)
        assert m.mean() > 0.5
        assert np.median(np.abs(disp[m] - d_true)) < 0.25


def test_end_to_end_frontend_alignment():
    """Full chain: rendered stereo pair -> matcher -> Sobel -> photometric
    alignment improves the pose (the complete reference-driver flow)."""
    summary, err0, err1 = run(H=120, W=160, pose_noise=0.02,
                              frontend=True, max_disp=32, verbose=False)
    # matched disparities carry spatially-correlated error (SGM window
    # smoothing), so the pose-recovery factor is looser than the
    # GT-disparity case (test_photometric.test_alignment_recovers_pose)
    assert float(jnp.linalg.norm(err1)) < 0.75 * float(jnp.linalg.norm(err0))
    assert float(summary.final_cost) < 0.1 * float(summary.initial_cost)


def test_run_images_from_files(tmp_path):
    """The --images CLI path: npy files through pyrDown + matcher +
    alignment from identity (the reference starts at identity too)."""
    cam, img_ref, img_trk, gu, gv, disp_gt, T_true, img_right = (
        make_scene(H=192, W=256, stereo=True))
    p0, p1, p2 = (str(tmp_path / f) for f in
                  ("l0.npy", "r0.npy", "l1.npy"))
    np.save(p0, np.asarray(img_ref))
    np.save(p1, np.asarray(img_right))
    np.save(p2, np.asarray(img_trk))
    # one pyrdown -> 96x128; camera scales accordingly
    sol, summary = run_images(
        p0, p1, p2, cam_params=[150.0, 150.0, 128.0, 96.0, 0.5],
        pyrdown=1, max_disp=32, verbose=False)
    assert float(summary.final_cost) < float(summary.initial_cost)
    assert np.all(np.isfinite(np.asarray(sol.T)))
