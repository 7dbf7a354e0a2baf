"""Point-cloud alignment front end: Horn/Umeyama + batched 3-point RANSAC.

TPU-native redesign of `/root/reference/src/ceres_slam/point_cloud_aligner.cpp`.
The reference runs 400 sequential RANSAC iterations, each doing a 3-point
SVD alignment and a full reprojection scoring pass (:81-131) — a textbook
embarrassingly-parallel workload. Here ALL hypotheses are generated,
solved, and scored at once:

  sample   [H, 3] index tensor        (one jax.random call)
  solve    vmapped closed-form 3-pt Umeyama -> T_h [H, 12]
  score    reprojected-uvd errors [H, N] in one batched einsum
  select   argmax of inlier counts

Static shapes throughout (H and N fixed, padding masked), so the whole
front end jits into a single XLA program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import lie


def umeyama(
    pts_0: jnp.ndarray,  # [..., N, 3]
    pts_1: jnp.ndarray,  # [..., N, 3]
    weights: jnp.ndarray | None = None,  # [..., N] optional validity/weights
) -> jnp.ndarray:
    """Closed-form rigid alignment ``T_1_0`` s.t. ``pts_1 ~= T_1_0 * pts_0``.

    Mirrors point_cloud_aligner.cpp:12-62: centroids, cross-covariance
    ``W_1_0 = sum (p1-c1)(p0-c0)^T / N`` (:43-47), optimal proper
    rotation (the reference uses Eigen SVD with det correction, :50-55;
    here Horn's quaternion method — same maximizer, see
    `lie.nearest_rotation` for why SVD is avoided), ``t = c1 - C c0``
    (:58). ``weights``
    generalizes to masked/padded point sets (reference operates on
    exact-size std::vectors; static-shape TPU code masks instead).

    The solve runs in f64 when available: 3-point cross-covariances are
    routinely near-degenerate and an f32 rotation fit is backend-
    sensitive enough to flip borderline RANSAC inliers (measured r4:
    42/199 triangle200 pair alignments differed TPU-vs-CPU, making whole
    trajectories backend-dependent).
    """
    out_dtype = pts_0.dtype
    if jax.config.jax_enable_x64:
        pts_0 = pts_0.astype(jnp.float64)
        pts_1 = pts_1.astype(jnp.float64)
    if weights is None:
        weights = jnp.ones(pts_0.shape[:-1], dtype=pts_0.dtype)
    weights = weights.astype(pts_0.dtype)
    wsum = jnp.sum(weights, axis=-1, keepdims=True)
    w = weights / jnp.maximum(wsum, 1e-12)
    c0 = jnp.einsum("...n,...ni->...i", w, pts_0)
    c1 = jnp.einsum("...n,...ni->...i", w, pts_1)
    d0 = pts_0 - c0[..., None, :]
    d1 = pts_1 - c1[..., None, :]
    W_1_0 = jnp.einsum("...n,...ni,...nj->...ij", w, d1, d0)

    C = lie.nearest_rotation(W_1_0)
    t = c1 - jnp.einsum("...ij,...j->...i", C, c0)
    return lie.se3_make(t, C).astype(out_dtype)


def _fit_3pt_lanes(h0: jnp.ndarray, h1: jnp.ndarray) -> jnp.ndarray:
    """Closed-form rigid fit of the 3-point minimal sets, fully
    lane-major ELEMENTWISE in the input dtype: ``h0/h1 [H, 3, 3] ->
    T_1_0 [H, 12]``.

    Replaces the `umeyama` call on the hypothesis path. Two reasons:

    - The general `umeyama` promotes to f64, and TPU f64 is emulated —
      the 400-hypothesis fit chain compiled to ~88 MB of per-op
      emulation code (95k source refs, r5 recon), which at the relay's
      ~2 MB/s per-process executable upload was most of the RANSAC
      program's wall cost. A 3-point fit in f32 loses nothing the
      inlier test can see (threshold 4 px^2 vs ~1e-4 px fit noise).
    - Everything here is ELEMENTWISE (explicit 3-term sums, no
      einsum/dot), so TPU and CPU execute identical IEEE f32 ops and
      the fits are bit-identical across backends — the property the r4
      post-mortem established for the pipeline (BASELINE.md).

    Set CSTPU_RANSAC_F64=1 to restore the f64 promoted fit.
    """
    import os

    if os.environ.get("CSTPU_RANSAC_F64"):
        return umeyama(h0, h1)
    third = 1.0 / 3.0
    p0 = [[h0[..., n, i] for i in range(3)] for n in range(3)]
    p1 = [[h1[..., n, i] for i in range(3)] for n in range(3)]
    c0 = [(p0[0][i] + p0[1][i] + p0[2][i]) * third for i in range(3)]
    c1 = [(p1[0][i] + p1[1][i] + p1[2][i]) * third for i in range(3)]
    d0 = [[p0[n][i] - c0[i] for i in range(3)] for n in range(3)]
    d1 = [[p1[n][i] - c1[i] for i in range(3)] for n in range(3)]
    # W[i][j] = sum_n d1[n][i] d0[n][j] / 3  (cross-covariance)
    W = [[(d1[0][i] * d0[0][j] + d1[1][i] * d0[1][j]
           + d1[2][i] * d0[2][j]) * third for j in range(3)]
         for i in range(3)]
    # Horn profile matrix of M = W^T: m(i, j) = W[j][i]
    m = lambda i, j: W[j][i]
    tr = m(0, 0) + m(1, 1) + m(2, 2)
    N4 = [
        [tr, m(1, 2) - m(2, 1), m(2, 0) - m(0, 2), m(0, 1) - m(1, 0)],
        [m(1, 2) - m(2, 1), m(0, 0) - m(1, 1) - m(2, 2),
         m(0, 1) + m(1, 0), m(2, 0) + m(0, 2)],
        [m(2, 0) - m(0, 2), m(0, 1) + m(1, 0),
         m(1, 1) - m(0, 0) - m(2, 2), m(1, 2) + m(2, 1)],
        [m(0, 1) - m(1, 0), m(2, 0) + m(0, 2),
         m(1, 2) + m(2, 1), m(2, 2) - m(0, 0) - m(1, 1)],
    ]
    w, x, y, z = lie._max_eigvec4_lanes(N4)
    R = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ]
    t = [c1[i] - (R[i][0] * c0[0] + R[i][1] * c0[1] + R[i][2] * c0[2])
         for i in range(3)]
    return jnp.stack(t + [R[i][j] for i in range(3) for j in range(3)],
                     axis=-1)


class RansacResult(NamedTuple):
    T_1_0: jnp.ndarray  # [12] best transformation
    inliers: jnp.ndarray  # [N] bool mask of inliers of the best hypothesis
    num_inliers: jnp.ndarray  # scalar int


@partial(jax.jit, static_argnames=("num_iters",))
def ransac_align(
    camera: StereoCamera,
    pts_0: jnp.ndarray,  # [N, 3] triangulated points, frame k-1
    pts_1: jnp.ndarray,  # [N, 3] triangulated points, frame k
    valid: jnp.ndarray,  # [N] bool — False for padding
    key: jax.Array,
    num_iters: int = 400,
    thresh: float = 4.0,
) -> RansacResult:
    """Batched 3-point RANSAC (point_cloud_aligner.cpp:64-136).

    Inlier test = squared reprojected-uvd error < thresh (:116-124),
    with the reference's default budget of 400 hypotheses and the VO
    threshold 4.0 px^2 (dataset_problem.cpp:248). Keeps the hypothesis
    with the largest inlier count (:127-130). Invalid (padded) entries
    never count as inliers and are never sampled as hypothesis points
    (sampling weights are masked).
    """
    N = pts_0.shape[0]
    dtype = pts_0.dtype

    # --- sample 3 distinct valid indices per hypothesis -------------------
    # Gumbel top-3 over masked logits: one [H, N] tensor op, no rejection
    # loops (the reference burns mt19937 draws in while-loops, :85-93).
    # Selected via 3x (argmax + mask) rather than lax.top_k: identical
    # selection (the 3 largest scores; Umeyama is order-invariant), but
    # top_k lowers to a TPU sort whose generated code dominated the
    # 18 MB RANSAC executable — at the relay's ~2 MB/s per-process
    # upload, executable bytes are wall time (r5 recon).
    logits = jnp.where(valid, 0.0, -jnp.inf)
    # gumbel draws are ALWAYS f32: the sample values differ between f32
    # and f64 draws, and hypothesis selection must be identical across
    # the f32 (TPU) and f64 (CPU reference) pipelines for them to be
    # comparable to 4 decimals
    scores = logits[None, :] + jax.random.gumbel(
        key, (num_iters, N), dtype=jnp.float32).astype(dtype)
    cols = jax.lax.broadcasted_iota(jnp.int32, (num_iters, N), 1)
    picks = []
    for _ in range(3):
        i = jnp.argmax(scores, axis=-1)  # [H]
        picks.append(i)
        scores = jnp.where(cols == i[:, None], -jnp.inf, scores)
    idx = jnp.stack(picks, axis=-1)  # [H, 3]

    h0 = pts_0[idx]  # [H, 3, 3]
    h1 = pts_1[idx]

    # --- minimal solver, lane-major over hypotheses -----------------------
    T_h = _fit_3pt_lanes(h0, h1)  # [H, 12]

    # --- score all hypotheses against all points --------------------------
    R_h = lie.se3_rot(T_h)  # [H, 3, 3]
    t_h = lie.se3_trans(T_h)  # [H, 3]
    p0_in_1 = jnp.einsum("hij,nj->hni", R_h, pts_0) + t_h[:, None, :]  # [H, N, 3]
    err = jnp.sum(
        (camera.project(pts_1)[None] - camera.project(p0_in_1)) ** 2, axis=-1
    )  # [H, N]
    inl = (err < thresh) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)

    best = jnp.argmax(counts)
    return RansacResult(T_1_0=T_h[best], inliers=inl[best], num_inliers=counts[best])
