"""Feature detection, description, and matching — batched and jittable.

TPU-native replacement for the feature front end of the reference's live
ROS node (`/root/reference/ros/src/ceres_slam/src/sparse_stereo_odometry_node.cpp`,
bit-rotted and excluded from its build): ORB detection (:127-135) becomes
Harris corners with max-pool NMS + top-k; ORB/BFMatcher cross-checked
Hamming matching (:139-148) becomes normalized-patch descriptors matched
by a similarity matmul (MXU work) with the same cross-check semantics.

Everything is static-shape: a fixed corner budget with validity masks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _box_filter(img: jnp.ndarray, r: int) -> jnp.ndarray:
    """(2r+1)^2 box filter via two separable cumsum passes."""
    k = 2 * r + 1
    pad = jnp.pad(img, ((r + 1, r), (r + 1, r)))
    cs = jnp.cumsum(jnp.cumsum(pad, axis=0), axis=1)
    out = (
        cs[k:, k:] - cs[:-k, k:] - cs[k:, :-k] + cs[:-k, :-k]
    )
    return out


@partial(jax.jit, static_argnames=("max_corners", "nms_radius", "border"))
def harris_corners(
    img: jnp.ndarray,
    max_corners: int = 512,
    k: float = 0.04,
    nms_radius: int = 3,
    border: int = 8,
    min_response: float = 1e-6,
):
    """Harris corner detection with non-max suppression.

    Returns (uv [N, 2] float, response [N], valid [N]) with N = max_corners,
    sorted by response."""
    dtype = img.dtype
    Ix = jnp.zeros_like(img).at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    Iy = jnp.zeros_like(img).at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    Sxx = _box_filter(Ix * Ix, 2)
    Syy = _box_filter(Iy * Iy, 2)
    Sxy = _box_filter(Ix * Iy, 2)
    det = Sxx * Syy - Sxy * Sxy
    tr = Sxx + Syy
    R = det - k * tr * tr

    # NMS: keep pixels equal to their local max.
    Rmax = jax.lax.reduce_window(
        R,
        -jnp.inf,
        jax.lax.max,
        (2 * nms_radius + 1, 2 * nms_radius + 1),
        (1, 1),
        "SAME",
    )
    h, w = img.shape
    uu = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    vv = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ok = (
        (R >= Rmax)
        & (R > min_response)
        & (uu >= border)
        & (uu < w - border)
        & (vv >= border)
        & (vv < h - border)
    )
    score = jnp.where(ok, R, -jnp.inf).reshape(-1)
    top, idx = jax.lax.top_k(score, max_corners)
    valid = jnp.isfinite(top) & (top > min_response)
    uv = jnp.stack(
        [(idx % w).astype(dtype), (idx // w).astype(dtype)], axis=-1
    )
    return uv, top, valid


@partial(jax.jit, static_argnames=("patch_radius",))
def patch_descriptors(img: jnp.ndarray, uv: jnp.ndarray, patch_radius: int = 4):
    """Normalized intensity-patch descriptors.

    Extracts a (2r)x(2r) patch around each corner, removes the mean and
    scales to unit norm — matching then reduces to a cosine-similarity
    matmul on the MXU (the TPU-idiomatic replacement for Hamming ORB)."""
    r = patch_radius
    h, w = img.shape
    ui = jnp.clip(uv[:, 0].astype(jnp.int32), r, w - r - 1)
    vi = jnp.clip(uv[:, 1].astype(jnp.int32), r, h - r - 1)
    du = jnp.arange(-r, r)
    dv = jnp.arange(-r, r)
    rows = vi[:, None, None] + dv[None, :, None]  # [N, 2r, 1]
    cols = ui[:, None, None] + du[None, None, :]  # [N, 1, 2r]
    patches = img[rows, cols].reshape(uv.shape[0], -1)
    patches = patches - jnp.mean(patches, axis=-1, keepdims=True)
    norm = jnp.linalg.norm(patches, axis=-1, keepdims=True)
    return patches / jnp.maximum(norm, 1e-8)


@jax.jit
def match_descriptors(
    desc_a: jnp.ndarray,  # [Na, D]
    desc_b: jnp.ndarray,  # [Nb, D]
    valid_a: jnp.ndarray,
    valid_b: jnp.ndarray,
    min_similarity: float = 0.6,
    gate: jnp.ndarray | None = None,  # [Na, Nb] bool extra constraint
):
    """Cross-checked nearest-neighbour matching.

    Returns (idx_b [Na], ok [Na]): for each valid a, its mutual best
    partner in b (BFMatcher crossCheck=true semantics, node :144-148),
    subject to the similarity threshold and an optional pairwise gate
    (e.g. epipolar constraints)."""
    # bf16 MXU pass is INTENTIONAL here (overrides the pipelines' f32
    # default-matmul policy): similarity ranking of unit-normalized
    # descriptors is robust to an 8-bit mantissa, cross-checking kills
    # near-ties, and this [Na, Nb] matmul is the one genuinely
    # MXU-throughput-bound op in the front end.
    sim = jnp.dot(desc_a, desc_b.T,
                  precision=jax.lax.Precision.DEFAULT)  # [Na, Nb]
    mask = valid_a[:, None] & valid_b[None, :]
    if gate is not None:
        mask = mask & gate
    sim = jnp.where(mask, sim, -jnp.inf)
    best_b = jnp.argmax(sim, axis=1)  # [Na]
    best_a = jnp.argmax(sim, axis=0)  # [Nb]
    best_sim = jnp.max(sim, axis=1)
    mutual = best_a[best_b] == jnp.arange(desc_a.shape[0])
    ok = mutual & (best_sim > min_similarity) & valid_a
    return best_b, ok
