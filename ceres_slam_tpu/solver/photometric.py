"""Direct (dense photometric) alignment solver.

Optimizes one track-from-ref pose plus per-pixel disparities against the
photometric residual (the `dense_stereo_test` workload,
/root/reference/tests/dense_stereo_test.cpp:61-115: one ImageError block
per valid pixel, parameters = pose + that pixel's disparity).

The Hessian has arrowhead structure: a single 6x6 pose block, a scalar
diagonal for the disparities, and one 6-vector coupling per pixel — so the
disparities are eliminated in closed form (scalar Schur complement) and
each LM iteration costs one 6x6 solve. Runs fully jitted.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import lie, photometric
from ceres_slam_tpu.solver import lm


class PhotometricProblem(NamedTuple):
    camera: StereoCamera
    ref_uv: jnp.ndarray  # [N, 2]
    ref_intensity: jnp.ndarray  # [N]
    track_img: jnp.ndarray  # [H, W]
    grad_u: jnp.ndarray  # [H, W]
    grad_v: jnp.ndarray  # [H, W]
    valid: jnp.ndarray  # [N]
    disp_meas: jnp.ndarray  # [N] measured disparities (e.g. SGBM)
    disp_stiffness: jnp.ndarray  # [] 1/sigma_d; anchors the depth field.
    # Without this anchor the joint (pose, depth-field) problem is gauge-
    # ambiguous: any pose is photometrically explainable by re-bending the
    # per-pixel depths. The reference's dense_stereo_test has the same
    # ill-posedness (ImageError alone, no disparity prior); we add the
    # measurement prior the SGBM disparities imply.


class PhotometricState(NamedTuple):
    T: jnp.ndarray  # [12]
    disparities: jnp.ndarray  # [N]


def photometric_cost(problem: PhotometricProblem, state: PhotometricState,
                     sampler: str = "gather"):
    r, _, _, _ = photometric.photometric_residual(
        problem.camera, state.T, state.disparities, problem.ref_uv,
        problem.ref_intensity, problem.track_img, problem.grad_u,
        problem.grad_v, problem.valid, sampler=sampler,
    )
    r_d = problem.disp_stiffness * (state.disparities - problem.disp_meas)
    r_d = r_d * problem.valid.astype(r_d.dtype)
    return 0.5 * (jnp.sum(r * r) + jnp.sum(r_d * r_d))


def _step(problem: PhotometricProblem, state: PhotometricState, lam,
          sampler: str = "gather"):
    r, J_pose, J_disp, ok = photometric.photometric_residual(
        problem.camera, state.T, state.disparities, problem.ref_uv,
        problem.ref_intensity, problem.track_img, problem.grad_u,
        problem.grad_v, problem.valid, sampler=sampler,
    )
    Hpp = jnp.einsum("ni,nj->ij", J_pose, J_pose)
    c = J_disp * J_disp  # [N]
    w = J_pose * J_disp[:, None]  # [N, 6]
    gp = jnp.einsum("ni,n->i", J_pose, r)
    gd = J_disp * r
    # disparity measurement prior
    s2 = problem.disp_stiffness * problem.disp_stiffness
    vmask = problem.valid.astype(r.dtype)
    c = c + s2 * vmask
    gd = gd + s2 * (state.disparities - problem.disp_meas) * vmask

    # Damping with a clamped diagonal (Ceres's min_diagonal: pixels with
    # near-zero image gradient have c ~ 0 and would otherwise take
    # unbounded disparity steps).
    Hpp_d = Hpp + lam * jnp.diag(jnp.clip(jnp.diagonal(Hpp), 1e-6, 1e32))
    c_d = c + lam * jnp.clip(c, 1e-6, 1e32)
    dead = c <= 1e-10
    c_safe = jnp.where(dead, 1.0, c_d)

    S = Hpp_d - jnp.einsum("ni,nj->ij", w / c_safe[:, None], w)
    rhs = -(gp - jnp.einsum("ni,n->i", w, gd / c_safe))
    L, low = jax.scipy.linalg.cho_factor(S, lower=True)
    dp = jax.scipy.linalg.cho_solve((L, low), rhs)
    dd = jnp.where(dead, 0.0, -(gd + w @ dp) / c_safe)
    # Disparity trust region: steps beyond a couple of pixels per iteration
    # are meaningless for a photometric model and destabilize low-gradient
    # pixels; clamp (the LM accept test then judges the clamped step).
    dd = jnp.clip(dd, -2.0, 2.0)

    dx = jnp.concatenate([dp, dd])
    grad_norm = jnp.maximum(jnp.max(jnp.abs(gp)), jnp.max(jnp.abs(gd)))
    g_dot_dx = gp @ dp + gd @ dd
    dxHdx = dp @ (Hpp @ dp) + 2.0 * (dd @ (w @ dp)) + jnp.sum(c * dd * dd)
    pred = -(g_dot_dx + 0.5 * dxHdx)
    return dx, grad_norm, pred


def _retract(state: PhotometricState, dx):
    dp = dx[:6]
    dd = dx[6:]
    return PhotometricState(
        T=lie.se3_retract(state.T, dp), disparities=state.disparities + dd
    )


@partial(jax.jit, static_argnames=("config", "sampler"))
def _solve_photometric_jit(problem, state0, config, sampler):
    cost_fn = lambda s: photometric_cost(problem, s, sampler=sampler)
    step_fn = lambda s, lam: _step(problem, s, lam, sampler=sampler)
    return lm.lm_solve(state0, config, cost_fn, step_fn, _retract)


def resolve_sampler(sampler: str = "auto") -> str:
    """``auto`` picks the image-sampling path per backend: the
    VMEM-resident MXU kernel on TPU (where XLA's scattered gathers run
    below host speed), the plain gather elsewhere (CPU gathers are fast
    and f64-exact)."""
    if sampler != "auto":
        return sampler
    return ("pallas" if jax.devices()[0].platform == "tpu" else "gather")


def solve_photometric(
    problem: PhotometricProblem,
    state0: PhotometricState,
    config: lm.SolveConfig = lm.SolveConfig(max_iters=30),
    sampler: str = "auto",
):
    sampler = resolve_sampler(sampler)
    if sampler == "pallas" and jax.config.jax_enable_x64:
        # Mosaic cannot lower the sampling kernel from an x64 trace
        # context on this toolchain (float->int converts decompose
        # through 64-bit and recurse/fail to legalize; see
        # pallas_kernels._bilinear_kernel). The pallas path is the TPU
        # path and is f32 end-to-end, so trace/lower/run it under x32;
        # inputs are committed f32 arrays either way.
        def to_f32(x):
            x = jnp.asarray(x)
            return (x.astype(jnp.float32)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x)

        problem = jax.tree.map(to_f32, problem)
        state0 = jax.tree.map(to_f32, state0)
        jax.config.update("jax_enable_x64", False)
        try:
            return _solve_photometric_jit(problem, state0, config, sampler)
        finally:
            jax.config.update("jax_enable_x64", True)
    return _solve_photometric_jit(problem, state0, config, sampler)
