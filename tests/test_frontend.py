"""Front-end alignment tests: Umeyama closed form + batched 3-point RANSAC."""

import jax
import jax.numpy as jnp
import numpy as np

from ceres_slam_tpu.frontend import alignment
from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import lie

CAM = StereoCamera.create(500.0, 500.0, 320.0, 240.0, 0.5)


def make_clouds(key, N=60, outlier_frac=0.3, noise=0.0):
    ks = jax.random.split(key, 4)
    pts_0 = jax.random.uniform(
        ks[0], (N, 3), minval=jnp.array([-4.0, -3.0, 4.0]), maxval=jnp.array([4.0, 3.0, 14.0])
    ).astype(jnp.float64)
    T_gt = lie.se3_exp(jnp.array([0.2, -0.1, -0.4, 0.03, 0.05, 0.02]))
    pts_1 = lie.se3_transform_point(T_gt, pts_0)
    if noise > 0:
        pts_1 = pts_1 + noise * jax.random.normal(ks[1], pts_1.shape, dtype=jnp.float64)
    n_out = int(outlier_frac * N)
    if n_out:
        bad = jax.random.uniform(
            ks[2], (n_out, 3), minval=jnp.array([-4.0, -3.0, 4.0]), maxval=jnp.array([4.0, 3.0, 14.0])
        ).astype(jnp.float64)
        pts_1 = pts_1.at[:n_out].set(bad)
    return pts_0, pts_1, T_gt, n_out


class TestUmeyama:
    def test_exact_recovery(self):
        pts_0, pts_1, T_gt, _ = make_clouds(jax.random.PRNGKey(0), outlier_frac=0.0)
        T = alignment.umeyama(pts_0, pts_1)
        assert np.allclose(T, T_gt, atol=1e-10)

    def test_three_point_minimal(self):
        pts_0, pts_1, T_gt, _ = make_clouds(jax.random.PRNGKey(1), N=3, outlier_frac=0.0)
        T = alignment.umeyama(pts_0, pts_1)
        assert np.allclose(T, T_gt, atol=1e-9)

    def test_weighted_ignores_masked(self):
        pts_0, pts_1, T_gt, _ = make_clouds(jax.random.PRNGKey(2), N=20, outlier_frac=0.0)
        # corrupt 5 points but mask them out
        pts_1 = pts_1.at[:5].add(100.0)
        w = jnp.ones(20).at[:5].set(0.0)
        T = alignment.umeyama(pts_0, pts_1, w)
        assert np.allclose(T, T_gt, atol=1e-9)

    def test_batched(self):
        pts_0, pts_1, T_gt, _ = make_clouds(jax.random.PRNGKey(3), N=12, outlier_frac=0.0)
        T = alignment.umeyama(
            jnp.stack([pts_0, pts_0]), jnp.stack([pts_1, pts_1])
        )
        assert T.shape == (2, 12)
        assert np.allclose(T[0], T_gt, atol=1e-9)


class TestRansac:
    def test_rejects_outliers(self):
        pts_0, pts_1, T_gt, n_out = make_clouds(jax.random.PRNGKey(4), outlier_frac=0.3)
        valid = jnp.ones(pts_0.shape[0], bool)
        res = alignment.ransac_align(
            CAM, pts_0, pts_1, valid, jax.random.PRNGKey(42), num_iters=400, thresh=4.0
        )
        # all true inliers found, all outliers rejected
        assert int(res.num_inliers) == pts_0.shape[0] - n_out
        assert not np.any(np.asarray(res.inliers[:n_out]))
        # refined alignment on the inliers recovers T_gt
        T = alignment.umeyama(pts_0, pts_1, res.inliers.astype(jnp.float64))
        err = lie.se3_log(lie.se3_compose(T, lie.se3_inverse(T_gt)))
        assert float(jnp.max(jnp.abs(err))) < 1e-9

    def test_padding_never_sampled_or_inlier(self):
        pts_0, pts_1, T_gt, n_out = make_clouds(jax.random.PRNGKey(5), outlier_frac=0.2)
        N = pts_0.shape[0]
        pad = 17
        pts_0p = jnp.concatenate([pts_0, jnp.full((pad, 3), 1e9)])
        pts_1p = jnp.concatenate([pts_1, jnp.full((pad, 3), -1e9)])
        valid = jnp.concatenate([jnp.ones(N, bool), jnp.zeros(pad, bool)])
        res = alignment.ransac_align(
            CAM, pts_0p, pts_1p, valid, jax.random.PRNGKey(42), num_iters=400, thresh=4.0
        )
        assert not np.any(np.asarray(res.inliers[N:]))
        assert int(res.num_inliers) == N - n_out

    def test_noisy_inliers(self):
        pts_0, pts_1, T_gt, n_out = make_clouds(
            jax.random.PRNGKey(6), outlier_frac=0.25, noise=0.002
        )
        valid = jnp.ones(pts_0.shape[0], bool)
        res = alignment.ransac_align(
            CAM, pts_0, pts_1, valid, jax.random.PRNGKey(7), num_iters=400, thresh=4.0
        )
        assert int(res.num_inliers) >= pts_0.shape[0] - n_out - 3
        err = lie.se3_log(lie.se3_compose(res.T_1_0, lie.se3_inverse(T_gt)))
        assert float(jnp.max(jnp.abs(err))) < 0.05
