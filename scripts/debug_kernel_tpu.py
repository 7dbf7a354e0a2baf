"""Bisect the compiled-TPU divergence of the window Pallas kernel: run
both kernels (plain stereo_factor_blocks and fused window_factor_blocks)
on controlled small inputs and localize the error (which output, which
lanes, which grid step)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import lie, pallas_kernels as pk
from ceres_slam_tpu.solver import dense, window

def main():
    print("platform:", jax.devices()[0].platform)
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    cam = StereoCamera.create(
        *(jnp.asarray(v, dtype) for v in (500.0, 500.0, 320.0, 240.0, 0.5))
    )

    # --- 1) plain per-observation kernel, N = 2 tiles
    N = 2 * pk.TILE
    K, J = 8, 64
    xi = jnp.asarray(rng.normal(size=(K, 6)) * 0.1, dtype)
    poses = lie.se3_exp(xi)  # [K, 12]
    pose_idx = rng.integers(0, K, N)
    pts = jnp.asarray(rng.uniform([-4, -3, 4], [4, 3, 14], (J, 3)), dtype)
    point_idx = rng.integers(0, J, N)
    uvd = jnp.asarray(rng.uniform([0, 0, 1], [640, 480, 60], (N, 3)), dtype)
    stiff = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (N, 3, 3))
    valid = jnp.ones(N, bool)

    outs_c = pk.stereo_factor_blocks(
        cam, poses[pose_idx], pts[point_idx], uvd, stiff, valid, interpret=False
    )
    outs_i = pk.stereo_factor_blocks(
        cam, poses[pose_idx], pts[point_idx], uvd, stiff, valid, interpret=True
    )
    for name, a, b in zip(
        ("r", "Hpp", "Hll", "U", "gp", "gl"), outs_c, outs_i
    ):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(b).max(), 1e-30)
        print(f"plain {name:4s} rel={np.abs(a - b).max() / scale:.3e} scale={scale:.3e}")

    # --- 2) fused window kernel on a tiny synthetic window problem
    n_obs = 1024
    pose_idx = jnp.asarray(rng.integers(0, K, n_obs), jnp.int32)
    point_idx = jnp.asarray(rng.integers(0, J, n_obs), jnp.int32)
    st = dense.StereoObs(
        uvd=jnp.asarray(rng.uniform([0, 0, 1], [640, 480, 60], (n_obs, 3)), dtype),
        stiffness=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n_obs, 3, 3)),
        pose_idx=pose_idx,
        point_idx=point_idx,
        valid=jnp.ones(n_obs, bool),
    )
    problem = dense.StereoBAProblem(
        camera=cam,
        stereo=st,
        sun=None,
        prior=None,
        fixed_pose_mask=jnp.zeros(K, bool),
        point_valid=jnp.ones(J, bool),
        sun_huber=jnp.asarray(0.0, dtype),
        az_err_thresh=jnp.asarray(1e3, dtype),
        zen_err_thresh=jnp.asarray(1e3, dtype),
    )
    state = dense.BAState(poses=poses, points=pts)
    layout = window.build_window_layout(problem, K, J)
    bc = window._fused_blocks(layout, state, interpret=False)
    bi = window._fused_blocks(layout, state, interpret=True)
    for name in ("Hpp", "Hll", "U_jo", "gp", "gl", "stereo_cost"):
        a = np.asarray(getattr(bc, name), np.float64)
        b = np.asarray(getattr(bi, name), np.float64)
        scale = max(np.abs(b).max(), 1e-30)
        err = np.abs(a - b)
        print(f"fused {name:11s} rel={err.max() / scale:.3e} scale={scale:.3e}")
        if err.max() / scale > 1e-3 and a.ndim >= 1:
            bad = np.unravel_index(np.argmax(err), err.shape)
            print(f"    worst at {bad}: got {a[bad]:.6e} want {b[bad]:.6e}")

    # localize: raw kernel outputs lane by lane
    M_pad = layout.onehotT.shape[1]
    pT = jnp.broadcast_to(
        state.points.T.astype(dtype)[:, :, None], (3, J, layout.O)
    ).reshape(3, J * layout.O)
    pT = jnp.pad(pT, ((0, 0), (0, M_pad - J * layout.O)))
    args = (cam, state.poses.T.astype(dtype), layout.onehotT, pT, layout.uvdT,
            layout.stiffT, layout.weightT, layout.pose_freeT)
    hll_c, u_c, gl_c, hp_c = pk.window_factor_blocks(*args, interpret=False)
    hll_i, u_i, gl_i, hp_i = pk.window_factor_blocks(*args, interpret=True)
    for name, a, b in (("hll", hll_c, hll_i), ("u", u_c, u_i),
                       ("gl", gl_c, gl_i), ("hppgp", hp_c, hp_i)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(b).max(), 1e-30)
        err = np.abs(a - b) / scale
        nbad = int((err > 1e-3).sum())
        print(f"raw {name:6s} rel={err.max():.3e} nbad={nbad}/{err.size}")
        if nbad and a.ndim == 2:
            rows, cols = np.nonzero(err > 1e-3)
            print(f"    bad rows {sorted(set(rows.tolist()))[:12]}")
            print(f"    bad col range [{cols.min()}, {cols.max()}] of {a.shape[1]}")


if __name__ == "__main__":
    main()
