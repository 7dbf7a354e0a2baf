"""Dense stereo disparity front end: image pair -> disparity + gradients.

TPU-native counterpart of the front third of the reference's dense
photometric driver (`/root/reference/tests/dense_stereo_test.cpp:52-90`):
pyrDown the stereo pair, run semi-global block matching (cv::StereoSGBM
(0, 64, 15) there), and take Sobel intensity gradients. Everything here
is static-shaped batched array work:

- the matching cost volume is one ``[D, H, W]`` tensor built by a
  `lax.scan` over disparity shifts, box-aggregated with integral images
  (two cumsums) instead of per-pixel window loops;
- the semi-global smoothing is four directional `lax.scan` dynamic
  programs (left/right along rows, up/down along columns), each carrying
  a full ``[rows, D]`` slab per step — the classic SGM recursion
  ``L(p,d) = C(p,d) + min(L', L'(d±1)+P1, min L' + P2) - min L'``
  vectorized over every scanline at once;
- winner-take-all with sub-pixel parabola refinement, a uniqueness-ratio
  test, and a left-right consistency check produce the validity mask
  (the reference relies on SGBM's equivalents inside OpenCV).

All outputs are (value, valid) pairs with static shapes; downstream the
valid mask feeds `solver.photometric.PhotometricProblem.valid` exactly
like the reference's `isfinite(d) && d > 0` pixel filter
(dense_stereo_test.cpp:104-115).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# cost sentinel for impossible matches: large enough to lose every
# comparison, small enough that a 4-direction SGM sum stays finite in f32
_BIG = 1.0e30


def _reflect_pad(img: jnp.ndarray, r: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 padding (OpenCV's default for Sobel/pyrDown)."""
    return jnp.pad(img, r, mode="reflect")


def sobel_gradients(img: jnp.ndarray):
    """3x3 Sobel gradients, OpenCV-compatible (cv::Sobel with ksize=3 and
    BORDER_REFLECT_101; dense_stereo_test.cpp:71-72): correlation with
    [-1 0 1] x [1 2 1]^T (gx) and its transpose (gv). Returns (gx, gy)."""
    p = _reflect_pad(img, 1)
    # smooth [1 2 1] along one axis, difference [-1 0 1] along the other
    sm_v = p[:-2, :] + 2.0 * p[1:-1, :] + p[2:, :]  # [H, W+2]
    gx = sm_v[:, 2:] - sm_v[:, :-2]
    sm_h = p[:, :-2] + 2.0 * p[:, 1:-1] + p[:, 2:]  # [H+2, W]
    gy = sm_h[2:, :] - sm_h[:-2, :]
    return gx, gy


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """cv::pyrDown: 5-tap Gaussian ([1 4 6 4 1]/16, separable,
    BORDER_REFLECT_101) then decimate by 2 (output size ceil(n/2))."""
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], img.dtype) / 16.0
    p = _reflect_pad(img, 2)
    # separable blur via shifted adds (5 taps per axis)
    H, W = img.shape
    rows = sum(k[i] * p[i : i + H, :] for i in range(5))  # [H, W+4]
    blur = sum(k[i] * rows[:, i : i + W] for i in range(5))  # [H, W]
    return blur[::2, ::2]


def _box_filter_sum(vol: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Windowed sum over the trailing two axes via integral images
    (edge-replicated), vectorized over any leading axes. O(1) per output
    element regardless of the window size."""
    r = radius
    pad = [(0, 0)] * (vol.ndim - 2) + [(r, r), (r, r)]
    v = jnp.pad(vol, pad, mode="edge")
    c = jnp.cumsum(jnp.cumsum(v, axis=-2), axis=-1)
    zero_col = [(0, 0)] * (vol.ndim - 2)
    c = jnp.pad(c, zero_col + [(1, 0), (1, 0)])  # prepend zero row/col
    w = 2 * r + 1
    H, W = vol.shape[-2], vol.shape[-1]
    return (
        c[..., w : w + H, w : w + W]
        - c[..., w : w + H, 0:W]
        - c[..., 0:H, w : w + W]
        + c[..., 0:H, 0:W]
    )


def _cost_volume(left, right, max_disp: int, block: int, prefilter_cap):
    """SAD block-matching cost volume [D, H, W] (cost of matching
    left[y, u] to right[y, u-d]). Pixels with u < d carry +inf. The
    unary is the x-Sobel-prefiltered absolute difference (the SGBM
    Birchfield-Tomasi-on-gradient spirit, robust to bias/gain), clipped
    at ``prefilter_cap``."""
    dtype = left.dtype
    H, W = left.shape
    gl, _ = sobel_gradients(left)
    gr, _ = sobel_gradients(right)
    cap = jnp.asarray(prefilter_cap, dtype)
    gl = jnp.clip(gl, -cap, cap)
    gr = jnp.clip(gr, -cap, cap)
    big = jnp.asarray(_BIG, dtype)

    # right images shifted right by d: pad left edge with +inf sentinel
    feats_r = jnp.stack([gr, right])  # [2, H, W]
    feats_l = jnp.stack([gl, left])

    def shift_cost(_, d):
        # right[y, u-d]: move content right by d, invalid lanes -> big
        rs = jnp.roll(feats_r, d, axis=-1)
        u = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        sad = jnp.abs(feats_l[0] - rs[0]) + 0.25 * jnp.abs(
            feats_l[1] - rs[1]
        ) * cap  # gradient term dominant, intensity term scaled to cap
        return None, jnp.where(u >= d, sad, big)

    _, vol = jax.lax.scan(shift_cost, None, jnp.arange(max_disp))
    # block aggregation of the valid part; keep sentinel where invalid
    r = block // 2
    agg = _box_filter_sum(jnp.where(vol >= big, 0.0, vol), r)
    cnt = _box_filter_sum(jnp.where(vol >= big, 0.0, 1.0), r)
    agg = jnp.where(cnt > 0, agg / jnp.maximum(cnt, 1.0), big)
    u = jax.lax.broadcasted_iota(jnp.int32, (max_disp, H, W), 2)
    d = jax.lax.broadcasted_iota(jnp.int32, (max_disp, H, W), 0)
    return jnp.where(u >= d, agg, big)


def _sgm_dir(cost_sd: jnp.ndarray, p1, p2):
    """One directional SGM pass. ``cost_sd``: [S, R, D] with S the scan
    axis (time), R the batched scanlines. Returns aggregated [S, R, D]."""
    inf = jnp.asarray(_BIG, cost_sd.dtype)

    def step(prev, c):
        m = jnp.min(prev, axis=-1, keepdims=True)
        up = jnp.pad(prev, ((0, 0), (1, 0)), constant_values=inf)[:, :-1]
        dn = jnp.pad(prev, ((0, 0), (0, 1)), constant_values=inf)[:, 1:]
        best = jnp.minimum(
            jnp.minimum(prev, m + p2),
            jnp.minimum(up + p1, dn + p1),
        )
        # clamp: +inf sentinel lanes must not poison the recursion
        L = jnp.minimum(c + best - m, inf)
        return L, L

    _, out = jax.lax.scan(step, cost_sd[0], cost_sd[1:])
    return jnp.concatenate([cost_sd[:1], out], axis=0)


def _sgm_aggregate(vol: jnp.ndarray, p1, p2, directions: int):
    """Sum of directional DP costs. ``vol``: [D, H, W] -> [D, H, W].
    directions: 2 (horizontal) or 4 (+ vertical)."""
    hwd = jnp.moveaxis(vol, 0, -1)  # [H, W, D]
    # horizontal: scan axis W, scanlines H
    lr = _sgm_dir(jnp.swapaxes(hwd, 0, 1), p1, p2)  # [W, H, D]
    rl = _sgm_dir(jnp.swapaxes(hwd, 0, 1)[::-1], p1, p2)[::-1]
    agg = jnp.swapaxes(lr, 0, 1) + jnp.swapaxes(rl, 0, 1)
    if directions >= 4:
        tb = _sgm_dir(hwd, p1, p2)  # scan axis H
        bt = _sgm_dir(hwd[::-1], p1, p2)[::-1]
        agg = agg + tb + bt
    return jnp.moveaxis(agg, -1, 0)


def _wta(S: jnp.ndarray, uniqueness: float):
    """Winner-take-all + parabola sub-pixel + uniqueness mask.
    ``S``: [D, H, W]. Returns (disp [H, W], valid [H, W])."""
    D = S.shape[0]
    d_best = jnp.argmin(S, axis=0)  # [H, W]
    c_best = jnp.min(S, axis=0)
    inf = jnp.asarray(_BIG, S.dtype)

    # uniqueness: best must beat every candidate outside d* +/- 1 by the
    # ratio margin (cv::StereoSGBM::uniquenessRatio semantics)
    d_ids = jax.lax.broadcasted_iota(jnp.int32, S.shape, 0)
    far = jnp.abs(d_ids - d_best[None]) > 1
    c_second = jnp.min(jnp.where(far, S, inf), axis=0)
    unique = c_best * (1.0 + uniqueness) <= c_second

    # sub-pixel parabola through (d-1, d, d+1)
    dm = jnp.clip(d_best - 1, 0, D - 1)
    dp = jnp.clip(d_best + 1, 0, D - 1)
    cm = jnp.take_along_axis(S, dm[None], 0)[0]
    cp = jnp.take_along_axis(S, dp[None], 0)[0]
    denom = cm - 2.0 * c_best + cp
    delta = jnp.where(
        denom > 1e-9, 0.5 * (cm - cp) / jnp.maximum(denom, 1e-9), 0.0
    )
    delta = jnp.clip(delta, -0.5, 0.5)
    disp = d_best.astype(S.dtype) + jnp.where(
        (d_best > 0) & (d_best < D - 1), delta, 0.0
    )
    valid = unique & (c_best < inf / 8) & (d_best > 0) & (d_best < D - 1)
    return disp, valid


@partial(jax.jit, static_argnames=("max_disp", "block", "directions"))
def match_disparity(
    left: jnp.ndarray,  # [H, W] grayscale in [0, 1]
    right: jnp.ndarray,  # [H, W]
    max_disp: int = 64,
    block: int = 5,
    p1: float = 0.03,
    p2: float = 0.12,
    uniqueness: float = 0.05,
    lr_threshold: float = 1.0,
    directions: int = 4,
    prefilter_cap: float = 0.25,
):
    """Semi-global stereo matching: (left, right) -> (disparity, valid).

    The role of ``cv::StereoSGBM(0, 64, 15)`` in the reference driver
    (dense_stereo_test.cpp:63-67): disparity of the LEFT image with
    sub-pixel refinement and confidence masking. One jitted program;
    every stage is static-shaped (D = max_disp plans the whole volume).
    """
    dtype = jnp.promote_types(left.dtype, jnp.float32)
    left = left.astype(dtype)
    right = right.astype(dtype)
    p1 = jnp.asarray(p1, dtype)
    p2 = jnp.asarray(p2, dtype)

    vol = _cost_volume(left, right, max_disp, block, prefilter_cap)
    S = _sgm_aggregate(vol, p1, p2, directions)
    disp, valid = _wta(S, uniqueness)

    # left-right consistency: the right image's cost volume is a shear of
    # the left's (cost_R[y, u, d] = cost_L[y, u+d, d]); a pixel survives
    # iff its match maps back within lr_threshold.
    D, H, W = S.shape
    u = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 2)
    d = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 0)
    inf = jnp.asarray(_BIG, dtype)
    u_shift = jnp.clip(u + d, 0, W - 1)
    S_r = jnp.take_along_axis(S, u_shift, axis=2)
    S_r = jnp.where(u + d <= W - 1, S_r, inf)
    disp_r, valid_r = _wta(S_r, uniqueness)
    # map left pixel u -> right pixel u - d
    u2 = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ur = jnp.clip(u2 - jnp.round(disp).astype(jnp.int32), 0, W - 1)
    d_back = jnp.take_along_axis(disp_r, ur, axis=1)
    vr_back = jnp.take_along_axis(valid_r, ur, axis=1)
    lr_ok = jnp.abs(disp - d_back) <= lr_threshold
    valid = valid & lr_ok & vr_back
    return disp, valid


def load_gray(path: str) -> "jnp.ndarray":
    """Load a grayscale image file as [H, W] float in [0, 1]. Supports
    ``.npy`` and anything PIL reads (png/pgm/jpg); the reference loads
    KITTI pngs via cv::imread(..., GRAYSCALE) (dense_stereo_test.cpp:
    36-44)."""
    import numpy as np

    if path.endswith(".npy"):
        arr = np.load(path).astype(np.float64)
        if arr.max() > 1.5:
            arr = arr / 255.0
        return jnp.asarray(arr)
    from PIL import Image

    img = Image.open(path).convert("L")
    return jnp.asarray(np.asarray(img, np.float64) / 255.0)
