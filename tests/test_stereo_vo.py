"""Online stereo VO tests on rendered synthetic stereo sequences."""

import jax
import jax.numpy as jnp
import numpy as np

from ceres_slam_tpu.frontend import features
from ceres_slam_tpu.frontend.stereo_vo import OnlineStereoVO, extract_stereo_frame
from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import lie

H, W = 120, 160
CAM = StereoCamera.create(140.0, 140.0, W / 2.0, H / 2.0, 0.4)
Z0 = 8.0  # textured wall depth in world frame


def tex(x, y):
    return (
        0.5
        + 0.2 * jnp.sin(1.3 * x) * jnp.cos(1.9 * y)
        + 0.15 * jnp.sin(4.1 * x + 2.0 * y)
        + 0.1 * jnp.cos(7.3 * x - 3.1 * y)
        + 0.05 * jnp.sin(13.0 * x * y / 4.0)
    )


def render(T_c_w):
    """Render left+right images of the wall z_w = Z0 from pose T_c_w."""
    uu, vv = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float64), jnp.arange(H, dtype=jnp.float64)
    )
    dirs = jnp.stack(
        [(uu - CAM.cu) / CAM.fu, (vv - CAM.cv) / CAM.fv, jnp.ones_like(uu)], axis=-1
    )

    def render_from(c_w, R_wc):
        d_w = jnp.einsum("ij,hwj->hwi", R_wc, dirs)
        s = (Z0 - c_w[2]) / d_w[..., 2]
        p_w = c_w + s[..., None] * d_w
        return tex(p_w[..., 0], p_w[..., 1])

    T_w_c = lie.se3_inverse(T_c_w)
    R_wc = lie.se3_rot(T_w_c)
    c_w = lie.se3_trans(T_w_c)
    left = render_from(c_w, R_wc)
    right = render_from(c_w + R_wc @ jnp.array([CAM.b, 0.0, 0.0]), R_wc)
    return left, right


class TestFeatures:
    def test_harris_finds_corners_of_checkerboard(self):
        img = jnp.asarray(
            np.kron((np.indices((8, 10)).sum(0) % 2), np.ones((12, 12))), jnp.float64
        )
        uv, resp, valid = features.harris_corners(img, max_corners=128)
        assert int(valid.sum()) > 20  # interior checkerboard corners

    def test_matching_is_identity_on_same_image(self):
        left, right = render(lie.se3_identity())
        uv, _, valid = features.harris_corners(left, max_corners=128)
        d = features.patch_descriptors(left, uv)
        idx, ok = features.match_descriptors(d, d, valid, valid)
        matched = np.asarray(idx[ok])
        expect = np.arange(len(np.asarray(ok)))[np.asarray(ok)]
        assert np.array_equal(matched, expect)

    def test_stereo_frame_disparity_accuracy(self):
        left, right = render(lie.se3_identity())
        frame = extract_stereo_frame(CAM, left, right)
        n_ok = int(frame.valid.sum())
        assert n_ok > 30
        # wall at Z0 in front of camera at origin => disparity = fu b / Z0
        expect = float(CAM.fu * CAM.b / Z0)
        d = np.asarray(frame.uvd[:, 2])[np.asarray(frame.valid)]
        assert np.median(np.abs(d - expect)) < 1.0


class TestOnlineVO:
    def test_tracks_forward_motion(self):
        vo = OnlineStereoVO(CAM, max_corners=256)
        step = jnp.array([0.02, -0.01, 0.12, 0.002, 0.004, -0.002])
        poses_gt = [lie.se3_identity(dtype=jnp.float64)]
        for _ in range(5):
            poses_gt.append(lie.se3_compose(lie.se3_exp(step), poses_gt[-1]))
        for T in poses_gt:
            left, right = render(T)
            vo.process(left, right)
        # trajectory[0] is the initial identity; frames start at trajectory[1]
        est = vo.trajectory[1:]
        errs = []
        for Te, Tg in zip(est, poses_gt):
            errs.append(
                np.linalg.norm(
                    np.asarray(lie.se3_log(lie.se3_compose(Te, lie.se3_inverse(Tg))))
                )
            )
        # A single fronto-parallel wall at 8 m with a 0.4 m baseline gives
        # ~7 px disparity — weakly constrained depth, so allow modest drift.
        assert errs[-1] < 0.15, f"VO drift too large: {errs}"
        assert np.median(errs) < 0.06
