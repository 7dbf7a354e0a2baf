"""Dense photometric stereo alignment demo.

TPU-native counterpart of `/root/reference/tests/dense_stereo_test.cpp`,
which loads two KITTI frames, computes SGBM disparities and Sobel
gradients, and refines the inter-frame pose + per-pixel disparities with
one ImageError per valid pixel. That driver hardcodes a local image path
(:32-34); since no data ships with either repo, this app renders a
synthetic textured-plane stereo pair, perturbs the pose and disparities,
and runs the same photometric refinement.
"""

from __future__ import annotations

import numpy as np


def make_scene(H=120, W=160, seed=0, dtype=None):
    """Render a textured slanted plane from two camera poses."""
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
    return cam, img_ref, img_trk, gu, gv, disp_ref, T_true


def run(H=120, W=160, seed=0, pose_noise=0.02, disp_noise=0.3, border=8, verbose=True):
    import jax
    import jax.numpy as jnp

    from ceres_slam_tpu.ops import lie
    from ceres_slam_tpu.solver import lm as lm_mod
    from ceres_slam_tpu.solver import photometric as ph

    cam, img_ref, img_trk, gu, gv, disp_ref, T_true = make_scene(H, W, seed)
    rng = np.random.default_rng(seed)

    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    sel = (
        (uu >= border) & (uu < W - border) & (vv >= border) & (vv < H - border)
    ).reshape(-1)
    ref_uv = jnp.asarray(
        np.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1)[sel], jnp.float64
    )
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
    err0 = lie.se3_log(lie.se3_compose(T_init, lie.se3_inverse(T_true)))
    err1 = lie.se3_log(lie.se3_compose(sol.T, lie.se3_inverse(T_true)))
    if verbose:
        print(f"pixels: {ref_uv.shape[0]}")
        print(f"cost: {c0:.4e} -> {float(summary.final_cost):.4e} "
              f"in {int(summary.iterations)} iterations")
        print(f"pose error |xi|: {float(jnp.linalg.norm(err0)):.5f} -> "
              f"{float(jnp.linalg.norm(err1)):.5f}")
    return summary, err0, err1


def main(argv=None):
    from ceres_slam_tpu.apps.common import base_parser, setup_jax

    p = base_parser("dense_stereo: direct photometric alignment demo")
    p.add_argument("--height", type=int, default=120)
    p.add_argument("--width", type=int, default=160)
    p.add_argument("--pose-noise", type=float, default=0.02)
    args = p.parse_args(argv)
    setup_jax(args.platform)
    run(H=args.height, W=args.width, pose_noise=args.pose_noise)


if __name__ == "__main__":
    main()
