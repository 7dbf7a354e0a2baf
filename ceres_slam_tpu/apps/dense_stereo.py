"""Dense photometric stereo alignment demo.

TPU-native counterpart of `/root/reference/tests/dense_stereo_test.cpp`:
that driver loads two KITTI stereo frames, pyrDowns them twice, computes
SGBM disparities and Sobel gradients, and refines the inter-frame pose +
per-pixel disparities with one ImageError per valid pixel. This app runs
the same image -> disparity -> gradients -> alignment chain end-to-end:
`--images LEFT0 RIGHT0 LEFT1` consumes real image files through the
semi-global matcher (`frontend.dense_stereo.match_disparity`, the
cv::StereoSGBM(0, 64, 15) role at :63-67); with no files it renders a
synthetic textured-plane stereo pair (no data ships with either repo —
the reference hardcodes a local path at :32-34) and runs the identical
front end, with ground truth available for error reporting.
`--gt-disparity` skips the matcher and uses rendered disparities (the
pre-r5 demo behavior, isolating the solver from the front end).
"""

from __future__ import annotations

import numpy as np


def make_scene(H=120, W=160, seed=0, dtype=None, stereo=False):
    """Render a textured slanted plane from two camera poses. With
    ``stereo=True`` additionally returns the frame-0 RIGHT image (for
    the matching front end)."""
    import jax.numpy as jnp

    from ceres_slam_tpu.models.stereo_camera import StereoCamera
    from ceres_slam_tpu.ops import lie, photometric

    dtype = dtype or jnp.float64
    cam = StereoCamera.create(150.0, 150.0, W / 2.0, H / 2.0, 0.5)
    # Plane in the ref camera frame: z = z0 + ax x + ay y
    z0, ax, ay = 6.0, 0.15, -0.1

    def tex(x, y):
        return (
            0.5
            + 0.25 * jnp.sin(1.7 * x) * jnp.cos(2.3 * y)
            + 0.15 * jnp.sin(5.1 * x + 3.0 * y)
            + 0.10 * jnp.cos(8.7 * x - 4.1 * y)
        )

    def ray_plane(camdir):
        # p = t * dir; z = z0 + ax x + ay y  =>  t = z0 / (dz - ax dx - ay dy)
        t = z0 / (camdir[..., 2] - ax * camdir[..., 0] - ay * camdir[..., 1])
        return t[..., None] * camdir

    uu, vv = jnp.meshgrid(jnp.arange(W, dtype=dtype), jnp.arange(H, dtype=dtype))
    dirs_ref = jnp.stack(
        [(uu - cam.cu) / cam.fu, (vv - cam.cv) / cam.fv, jnp.ones_like(uu)], axis=-1
    )
    p_ref = ray_plane(dirs_ref)  # [H, W, 3] in ref frame
    img_ref = tex(p_ref[..., 0], p_ref[..., 1])
    disp_ref = cam.fu * cam.b / p_ref[..., 2]

    img_right = None
    if stereo:
        # Right camera: offset +b along x in the left frame, so a point's
        # right-frame coords are p_r = p_l - (b, 0, 0). The plane keeps
        # its form with z0' = z0 + ax*b, and the texture (a function of
        # LEFT-frame plane coordinates) is evaluated at (x_r + b, y_r).
        z0r = z0 + ax * float(cam.b)
        tr = z0r / (
            dirs_ref[..., 2] - ax * dirs_ref[..., 0] - ay * dirs_ref[..., 1]
        )
        p_r = tr[..., None] * dirs_ref
        img_right = tex(p_r[..., 0] + cam.b, p_r[..., 1])

    # Track camera: small forward + rotation motion; T maps ref -> track.
    T_true = lie.se3_exp(jnp.asarray([0.05, -0.02, 0.15, 0.004, -0.008, 0.003], dtype))
    T_inv = lie.se3_inverse(T_true)
    dirs_trk = dirs_ref
    # Ray-plane intersection in the track frame: express plane in track coords
    # by tracing back: point p_trk on the ray satisfies plane(T^-1 p_trk)=0.
    R_inv = lie.se3_rot(T_inv)
    t_inv = lie.se3_trans(T_inv)
    # (T^-1 p)_z = z0 + ax (T^-1 p)_x + ay (T^-1 p)_y, with p = s * dir
    a_vec = R_inv[2] - ax * R_inv[0] - ay * R_inv[1]
    b_sc = z0 + ax * t_inv[0] + ay * t_inv[1] - t_inv[2]
    s = b_sc / jnp.einsum("hwi,i->hw", dirs_trk, a_vec)
    p_trk = s[..., None] * dirs_trk
    p_in_ref = lie.se3_transform_point(T_inv, p_trk.reshape(-1, 3)).reshape(H, W, 3)
    img_trk = tex(p_in_ref[..., 0], p_in_ref[..., 1])

    gu, gv = photometric.image_gradients(img_trk)
    if stereo:
        return cam, img_ref, img_trk, gu, gv, disp_ref, T_true, img_right
    return cam, img_ref, img_trk, gu, gv, disp_ref, T_true


def align_pair(cam, img_ref, img_trk, disp_meas, disp_valid, T_init=None,
               disp_sigma=0.5, border=8, max_iters=40, verbose=True):
    """Photometric alignment from measured disparities: the reference's
    problem construction loop (dense_stereo_test.cpp:104-115 — one
    ImageError per valid-disparity pixel, parameters = pose + that
    pixel's disparity) as one static-shape batched problem. Gradient
    images are Sobel/8 of the track image (the reference feeds raw Sobel
    of LEFT0 at :71-72; /8 makes it the correctly-scaled intensity
    derivative for the GN chain, and sampling the TRACK image matches
    where the residual is evaluated)."""
    import jax.numpy as jnp

    from ceres_slam_tpu.frontend import dense_stereo as front
    from ceres_slam_tpu.ops import lie
    from ceres_slam_tpu.solver import lm as lm_mod
    from ceres_slam_tpu.solver import photometric as ph

    Hh, Ww = np.asarray(img_ref).shape
    gx, gy = front.sobel_gradients(img_trk)
    gu, gv = gx / 8.0, gy / 8.0

    uu, vv = np.meshgrid(np.arange(Ww), np.arange(Hh))
    inb = (
        (uu >= border) & (uu < Ww - border)
        & (vv >= border) & (vv < Hh - border)
    )
    disp_np = np.asarray(disp_meas, np.float64)
    valid = (
        inb & np.asarray(disp_valid, bool) & (disp_np > 0.5)
    ).reshape(-1)
    ref_uv = jnp.asarray(
        np.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1), jnp.float64
    )
    ref_I = jnp.asarray(np.asarray(img_ref, np.float64).reshape(-1))
    disp0 = jnp.asarray(np.where(valid, disp_np.reshape(-1), 1.0))

    problem = ph.PhotometricProblem(
        camera=cam, ref_uv=ref_uv, ref_intensity=ref_I,
        track_img=img_trk, grad_u=gu, grad_v=gv,
        valid=jnp.asarray(valid),
        disp_meas=disp0,
        disp_stiffness=jnp.asarray(1.0 / max(disp_sigma, 0.1)),
    )
    if T_init is None:
        T_init = lie.se3_identity()
    state0 = ph.PhotometricState(T=jnp.asarray(T_init), disparities=disp0)
    c0 = float(ph.photometric_cost(problem, state0))
    sol, summary = ph.solve_photometric(
        problem, state0, lm_mod.SolveConfig(max_iters=max_iters)
    )
    if verbose:
        print(f"pixels: {int(valid.sum())} valid / {ref_uv.shape[0]}")
        print(f"cost: {c0:.4e} -> {float(summary.final_cost):.4e} "
              f"in {int(summary.iterations)} iterations")
    return sol, summary, problem


def run(H=120, W=160, seed=0, pose_noise=0.02, disp_noise=0.3, border=8,
        verbose=True, frontend=False, max_disp=48, block=5):
    """Synthetic-scene demo. ``frontend=True`` runs the FULL chain:
    rendered stereo pair -> semi-global matching -> Sobel gradients ->
    alignment (the complete dense_stereo_test.cpp flow); otherwise the
    rendered ground-truth disparities (+noise) are used directly."""
    import jax.numpy as jnp

    from ceres_slam_tpu.frontend import dense_stereo as front
    from ceres_slam_tpu.ops import lie
    from ceres_slam_tpu.solver import lm as lm_mod
    from ceres_slam_tpu.solver import photometric as ph

    rng = np.random.default_rng(seed)
    if frontend:
        cam, img_ref, img_trk, _, _, disp_gt, T_true, img_right = make_scene(
            H, W, seed, stereo=True)
        disp, dvalid = front.match_disparity(
            img_ref.astype(jnp.float32), img_right.astype(jnp.float32),
            max_disp=max_disp, block=block)
        if verbose:
            err = np.abs(np.asarray(disp) - np.asarray(disp_gt))
            m = np.asarray(dvalid)
            print(f"matcher: {m.mean() * 100:.1f}% valid, "
                  f"median |d_err| {np.median(err[m]):.3f} px")
        T_init = lie.se3_retract(
            T_true, jnp.asarray(rng.normal(0, pose_noise, 6)))
        sol, summary, _ = align_pair(
            cam, img_ref, img_trk, disp, dvalid, T_init=T_init,
            disp_sigma=0.5, border=border, verbose=verbose)
    else:
        cam, img_ref, img_trk, gu, gv, disp_ref, T_true = make_scene(H, W, seed)
        uu, vv = np.meshgrid(np.arange(W), np.arange(H))
        sel = (
            (uu >= border) & (uu < W - border)
            & (vv >= border) & (vv < H - border)
        ).reshape(-1)
        ref_uv = jnp.asarray(
            np.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1)[sel],
            jnp.float64)
        ref_I = img_ref.reshape(-1)[jnp.asarray(np.nonzero(sel)[0])]
        disp0 = disp_ref.reshape(-1)[jnp.asarray(np.nonzero(sel)[0])]
        disp0 = disp0 + jnp.asarray(rng.normal(0, disp_noise, disp0.shape))

        problem = ph.PhotometricProblem(
            camera=cam, ref_uv=ref_uv, ref_intensity=ref_I,
            track_img=img_trk, grad_u=gu, grad_v=gv,
            valid=jnp.ones(ref_uv.shape[0], bool),
            disp_meas=disp0,
            disp_stiffness=jnp.asarray(1.0 / max(disp_noise, 0.1)),
        )
        T_init = lie.se3_retract(
            T_true, jnp.asarray(rng.normal(0, pose_noise, 6))
        )
        state0 = ph.PhotometricState(T=T_init, disparities=disp0)
        c0 = float(ph.photometric_cost(problem, state0))
        sol, summary = ph.solve_photometric(
            problem, state0, lm_mod.SolveConfig(max_iters=40)
        )
        if verbose:
            print(f"pixels: {ref_uv.shape[0]}")
            print(f"cost: {c0:.4e} -> {float(summary.final_cost):.4e} "
                  f"in {int(summary.iterations)} iterations")
    err0 = lie.se3_log(lie.se3_compose(T_init, lie.se3_inverse(T_true)))
    err1 = lie.se3_log(lie.se3_compose(sol.T, lie.se3_inverse(T_true)))
    if verbose:
        print(f"pose error |xi|: {float(jnp.linalg.norm(err0)):.5f} -> "
              f"{float(jnp.linalg.norm(err1)):.5f}")
    return summary, err0, err1


def run_images(left0_path, right0_path, left1_path, cam_params,
               pyrdown=2, max_disp=64, block=5, border=8, max_iters=40,
               verbose=True):
    """The reference driver's exact flow on real image files
    (dense_stereo_test.cpp:36-144): load grayscale, pyrDown ``pyrdown``
    times (the reference does 2), match frame-0 disparity, align frame 1
    photometrically from an identity initial pose."""
    import jax.numpy as jnp

    from ceres_slam_tpu.frontend import dense_stereo as front
    from ceres_slam_tpu.models.stereo_camera import StereoCamera

    left0 = front.load_gray(left0_path)
    right0 = front.load_gray(right0_path)
    left1 = front.load_gray(left1_path)
    fu, fv, cu, cv, b = cam_params
    for _ in range(pyrdown):
        left0, right0, left1 = (
            front.pyr_down(left0), front.pyr_down(right0),
            front.pyr_down(left1))
        fu, fv, cu, cv = fu / 2, fv / 2, cu / 2, cv / 2
    cam = StereoCamera.create(fu, fv, cu, cv, b)
    disp, dvalid = front.match_disparity(
        left0.astype(jnp.float32), right0.astype(jnp.float32),
        max_disp=max_disp, block=block)
    if verbose:
        print(f"disparity: {float(jnp.mean(dvalid)) * 100:.1f}% valid "
              f"({left0.shape[0]}x{left0.shape[1]}, max_disp {max_disp})")
    sol, summary, _ = align_pair(
        cam, left0, left1, disp, dvalid, border=border,
        max_iters=max_iters, verbose=verbose)
    if verbose:
        print("Final estimate T_track_ref:")
        print(np.asarray(sol.T))
    return sol, summary


def main(argv=None):
    from ceres_slam_tpu.apps.common import base_parser, setup_jax

    p = base_parser("dense_stereo: dense disparity + photometric alignment")
    p.add_argument("--height", type=int, default=120)
    p.add_argument("--width", type=int, default=160)
    p.add_argument("--pose-noise", type=float, default=0.02)
    p.add_argument("--gt-disparity", action="store_true",
                   help="skip the matcher; use rendered GT disparities")
    p.add_argument("--images", nargs=3, default=None,
                   metavar=("LEFT0", "RIGHT0", "LEFT1"),
                   help="real image files (png/pgm/npy)")
    p.add_argument("--camera", nargs=5, type=float,
                   default=[721.5377, 721.5377, 609.5593, 172.854, 0.53715],
                   metavar=("FU", "FV", "CU", "CV", "B"),
                   help="full-resolution intrinsics (KITTI defaults, "
                        "dense_stereo_test.cpp:22-26)")
    p.add_argument("--pyrdown", type=int, default=2)
    p.add_argument("--max-disp", type=int, default=64)
    p.add_argument("--block", type=int, default=5)
    args = p.parse_args(argv)
    setup_jax(args.platform)
    if args.images:
        run_images(*args.images, cam_params=args.camera,
                   pyrdown=args.pyrdown, max_disp=args.max_disp,
                   block=args.block)
    else:
        run(H=args.height, W=args.width, pose_noise=args.pose_noise,
            frontend=not args.gt_disparity, max_disp=args.max_disp,
            block=args.block)


if __name__ == "__main__":
    main()
