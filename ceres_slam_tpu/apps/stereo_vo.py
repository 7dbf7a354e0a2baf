"""Live stereo visual-odometry driver: images in, trajectory out.

The CLI counterpart of the reference's ROS node
(`ros/src/ceres_slam/src/sparse_stereo_odometry_node.cpp:103-300`): it
consumes a sequence of rectified stereo pairs, runs the online VO
pipeline (`frontend/stereo_vo.py` — Harris detection, MXU cross-checked
matching, batched 3-pt RANSAC, jitted GN pose refinement), and emits
``<out>_poses.csv`` in the reference 4x4 row-major format
(dataset_problem.cpp:140-151).

Input modes:
  * ``--left-glob/--right-glob``: sorted file patterns of rectified
    grayscale frames (``.npy`` float arrays, or ``.png/.pgm/.jpg`` if
    PIL is importable).
  * ``--synthetic N``: render N frames of a textured-plane scene along a
    known trajectory (no files needed), run VO, and report ATE vs the
    ground truth — the self-contained smoke mode.

The node publishes TF at 20+ Hz; here every per-frame stage is a fused
static-shape jit, so after the first frame's compile the pipeline is a
handful of device calls per frame.
"""

from __future__ import annotations

import glob as globmod
import math
import sys


def _load_gray(path: str):
    import numpy as np

    if path.endswith(".npy"):
        img = np.load(path)
    else:
        try:
            from PIL import Image
        except ImportError as e:  # pragma: no cover - PIL is in the image
            raise SystemExit(
                f"cannot read {path}: PIL unavailable; use .npy frames"
            ) from e
        img = np.asarray(Image.open(path).convert("L"), np.float64) / 255.0
    if img.ndim == 3:
        img = img.mean(-1)
    return np.asarray(img, np.float64)


def _render_synthetic(camera, n_frames: int, shape=(120, 160), z0: float = 8.0):
    """Textured-plane stereo sequence along a sideways+forward dolly.

    Returns (frames [(left, right)], gt_poses [N, 12] T_c_w)."""
    import jax.numpy as jnp
    import numpy as np

    from ceres_slam_tpu.ops import lie

    H, W = shape

    def tex(x, y):
        return (
            0.5
            + 0.2 * jnp.sin(1.3 * x) * jnp.cos(1.9 * y)
            + 0.15 * jnp.sin(4.1 * x + 2.0 * y)
            + 0.1 * jnp.cos(7.3 * x - 3.1 * y)
            + 0.05 * jnp.sin(13.0 * x * y / 4.0)
        )

    uu, vv = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float64), jnp.arange(H, dtype=jnp.float64)
    )
    dirs = jnp.stack(
        [(uu - camera.cu) / camera.fu, (vv - camera.cv) / camera.fv,
         jnp.ones_like(uu)], axis=-1,
    )

    def render(T_c_w):
        T_w_c = lie.se3_inverse(T_c_w)
        R_wc = lie.se3_rot(T_w_c)
        c_w = lie.se3_trans(T_w_c)

        def from_center(c):
            d_w = jnp.einsum("ij,hwj->hwi", R_wc, dirs)
            s = (z0 - c[2]) / d_w[..., 2]
            p_w = c + s[..., None] * d_w
            return tex(p_w[..., 0], p_w[..., 1])

        right_c = c_w + R_wc @ jnp.array([float(camera.b), 0.0, 0.0])
        return from_center(c_w), from_center(right_c)

    frames, gt = [], []
    for i in range(n_frames):
        xi = jnp.asarray(
            [0.03 * i, 0.01 * math.sin(0.2 * i), 0.02 * i, 0.0, 0.002 * i, 0.0]
        )
        T_c_w = lie.se3_exp(xi)
        frames.append(render(T_c_w))
        gt.append(np.asarray(T_c_w))
    return frames, np.stack(gt)


def main(argv=None):
    from ceres_slam_tpu.apps.common import base_parser, setup_jax

    p = base_parser("stereo_vo: online stereo visual odometry from images")
    p.add_argument("--left-glob", default=None,
                   help="sorted glob of left rectified frames (.npy/.png)")
    p.add_argument("--right-glob", default=None,
                   help="sorted glob of right rectified frames")
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="render an N-frame synthetic sequence instead of files")
    p.add_argument("--out", required=True,
                   help="output base: writes <out>_poses.csv")
    # node camera parameters (the node reads them from the camera_info topic)
    p.add_argument("--fu", type=float, default=140.0)
    p.add_argument("--fv", type=float, default=140.0)
    p.add_argument("--cu", type=float, default=80.0)
    p.add_argument("--cv", type=float, default=60.0)
    p.add_argument("--baseline", type=float, default=0.4)
    p.add_argument("--max-corners", type=int, default=384)
    p.add_argument("--ransac-iters", type=int, default=400)
    p.add_argument("--ransac-thresh", type=float, default=4.0,
                   help="squared-pixel inlier threshold (node default)")
    args = p.parse_args(argv)
    setup_jax(args.platform, x64=True)

    import numpy as np

    from ceres_slam_tpu.frontend.stereo_vo import OnlineStereoVO
    from ceres_slam_tpu.models.stereo_camera import StereoCamera
    from ceres_slam_tpu.utils import csvio, metrics

    camera = StereoCamera.create(args.fu, args.fv, args.cu, args.cv, args.baseline)

    gt = None
    if args.synthetic:
        frames, gt = _render_synthetic(camera, args.synthetic)
    else:
        if not (args.left_glob and args.right_glob):
            raise SystemExit("need --left-glob/--right-glob or --synthetic N")
        lefts = sorted(globmod.glob(args.left_glob))
        rights = sorted(globmod.glob(args.right_glob))
        if len(lefts) != len(rights) or not lefts:
            raise SystemExit(
                f"frame count mismatch: {len(lefts)} left vs {len(rights)} right"
            )
        frames = ((_load_gray(l), _load_gray(r)) for l, r in zip(lefts, rights))

    vo = OnlineStereoVO(
        camera,
        max_corners=args.max_corners,
        ransac_iters=args.ransac_iters,
        ransac_thresh=args.ransac_thresh,
    )
    n = 0
    for left, right in frames:
        vo.process(left, right)
        n += 1
        if n % 25 == 0:
            print(f"  frame {n} done", file=sys.stderr)
    print(f"Processed {n} frames", file=sys.stderr)

    traj = np.stack([np.asarray(T) for T in vo.trajectory[1:]])  # drop pre-frame
    csvio.write_poses_csv(args.out + "_poses.csv", traj)
    print(f"Wrote {args.out}_poses.csv", file=sys.stderr)

    if gt is not None:
        ate = metrics.ate_translation(traj, gt)
        rot = float(metrics.rotation_error_deg(traj, gt).max())
        print(f"synthetic ATE RMSE: {ate:.4f} m, max rot err: {rot:.3f} deg")


if __name__ == "__main__":
    main()
