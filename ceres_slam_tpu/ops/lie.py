"""Batched SO(3)/SE(3) Lie-group operations for TPU.

TPU-native redesign of the reference's header-only geometry library
(`/root/reference/include/ceres_slam/geometry/so3group.hpp`,
`se3group.hpp`). Design notes:

- The reference stores an SE(3) element as 12 contiguous doubles
  ``[t(3) | R row-major(9)]`` (se3group.hpp:114-123) so Ceres can treat the
  state as a flat parameter block. The TPU analog is a structure-of-arrays
  state: poses are ``f[..., 12]`` arrays and every op here is batched over
  arbitrary leading dimensions — no vmap required, no per-element scalar
  loops, everything jittable.

- The reference's SE(3) exp/log are *deliberately first order in
  translation* — the translation is NOT multiplied by the SO(3) left
  Jacobian (se3group.hpp:313-325: "This isn't quite right ... we don't
  really need this"). We reproduce that convention exactly, because the
  whole estimation stack (retraction `T <- exp(eps) * T`, pose-error
  residual `log(T_ref * T^-1)`) is built on it and trajectories are only
  reference-equivalent if the retraction matches.

- Branches (small-angle fallbacks, so3group.hpp:277, :329-345) become
  `jnp.where` with guarded denominators: both sides of a `where` are
  evaluated under XLA, so any division must be made safe *before* the
  select.

All functions are dtype-polymorphic (float32 on TPU hot paths, float64 for
CPU verification / covariance chains).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Size of the flat SE(3) parameterization: [t(3) | R row-major (9)].
SE3_DIM = 12
SO3_DIM = 9
SE3_DOF = 6
SO3_DOF = 3

_EPS = {jnp.dtype(jnp.float32): 1.1920929e-07, jnp.dtype(jnp.float64): 2.220446049250313e-16}


def _eps(dtype) -> float:
    return _EPS.get(jnp.dtype(dtype), 1.1920929e-07)


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------


def so3_wedge(phi: jnp.ndarray) -> jnp.ndarray:
    """so(3) wedge: ``phi[..., 3] -> Phi[..., 3, 3]`` (so3group.hpp:248-255)."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def so3_vee(Phi: jnp.ndarray) -> jnp.ndarray:
    """so(3) vee: inverse of wedge, averaging the antisymmetric part
    (so3group.hpp:260-265)."""
    return 0.5 * jnp.stack(
        [
            Phi[..., 2, 1] - Phi[..., 1, 2],
            Phi[..., 0, 2] - Phi[..., 2, 0],
            Phi[..., 1, 0] - Phi[..., 0, 1],
        ],
        axis=-1,
    )


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) exponential map: ``phi[..., 3] -> C[..., 3, 3]``.

    Rodrigues form with series fallback near zero (so3group.hpp:273-291).
    We use the numerically stable ``A = sin(t)/t``, ``B = (1-cos(t))/t^2``
    factorization so the small-angle branch is smooth (the reference's
    first-order fallback only triggers below machine epsilon; ours agrees
    to machine precision there).
    """
    dtype = phi.dtype
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 <= _eps(dtype)

    # NOTE: sqrt of an exactly-zero theta2 has an infinite derivative and
    # `0 * inf = NaN` leaks through the untaken where-branch under autodiff;
    # every transcendental below therefore uses the guarded safe_theta.
    safe_theta2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    safe_theta = jnp.sqrt(safe_theta2)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_theta) / safe_theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_theta)) / safe_theta2)

    W = so3_wedge(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(C: jnp.ndarray) -> jnp.ndarray:
    """SO(3) logarithmic map: ``C[..., 3, 3] -> phi[..., 3]``.

    Matches so3group.hpp:299-349: axis from the antisymmetric part,
    ``angle = atan2(0.5*|axis|, 0.5*(trace-1))``, with the first-order
    ``vee(C - I)`` fallback for tiny angles. Like the reference, this is
    singular at angle == pi (never exercised by frame-to-frame VO).
    """
    dtype = C.dtype
    axis = jnp.stack(
        [
            C[..., 2, 1] - C[..., 1, 2],
            C[..., 0, 2] - C[..., 2, 0],
            C[..., 1, 0] - C[..., 0, 1],
        ],
        axis=-1,
    )
    # Guarded |axis|: sqrt'(0) is infinite, so take sqrt of a safe value and
    # pin sin_angle to 0 in the small branch (there angle is then exactly 0
    # and the first-order scale applies, matching vee(C - I)).
    n2 = jnp.sum(axis * axis, axis=-1)
    tiny = n2 <= _eps(dtype)
    sin_angle = jnp.where(
        tiny, jnp.zeros_like(n2), 0.5 * jnp.sqrt(jnp.where(tiny, jnp.ones_like(n2), n2))
    )
    cos_angle = 0.5 * (jnp.trace(C, axis1=-2, axis2=-1) - 1.0)
    angle = jnp.arctan2(sin_angle, cos_angle)

    small = jnp.abs(angle) <= _eps(dtype) ** 0.5
    safe_sin = jnp.where(small, jnp.ones_like(sin_angle), sin_angle)
    # angle/sin(angle) -> 1 + angle^2/6 near zero.
    scale = jnp.where(small, 0.5 * (1.0 + angle * angle / 6.0), 0.5 * angle / safe_sin)
    return scale[..., None] * axis


def so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian ``J_l(phi) [..., 3, 3]``.

    ``J_l = I + B w + C w^2`` with ``B=(1-cos t)/t^2``, ``C=(t-sin t)/t^3``.
    Used for chaining rotation-log derivatives in the pose factors — the
    closed-form replacement for differentiating so3_log with ceres::Jet.
    """
    dtype = phi.dtype
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 <= _eps(dtype)
    safe_theta2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    safe_theta = jnp.sqrt(safe_theta2)
    safe_theta3 = safe_theta2 * safe_theta
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_theta)) / safe_theta2)
    Cc = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (safe_theta - jnp.sin(safe_theta)) / safe_theta3
    )
    W = so3_wedge(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), W.shape)
    return eye + B[..., None, None] * W + Cc[..., None, None] * (W @ W)


def so3_inv_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """Inverse SO(3) left Jacobian ``J_l^{-1}(phi)``.

    ``J_l^{-1} = I - 0.5 w + c w^2`` with
    ``c = 1/t^2 - (1 + cos t)/(2 t sin t)`` (series ``1/12 + t^2/720`` near 0).
    Singular at ``t = pi`` like so3_log itself.
    """
    dtype = phi.dtype
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 <= _eps(dtype) ** 0.5
    safe_theta2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    safe_theta = jnp.sqrt(safe_theta2)
    sin_t = jnp.sin(safe_theta)
    safe_sin = jnp.where(jnp.abs(sin_t) < _eps(dtype), jnp.ones_like(sin_t), sin_t)
    c = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / safe_theta2 - (1.0 + jnp.cos(safe_theta)) / (2.0 * safe_theta * safe_sin),
    )
    W = so3_wedge(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), W.shape)
    return eye - 0.5 * W + c[..., None, None] * (W @ W)


def so3_inv_right_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """Inverse SO(3) right Jacobian: ``J_r^{-1}(phi) = J_l^{-1}(-phi)``."""
    return so3_inv_left_jacobian(-phi)


def so3_inverse(C: jnp.ndarray) -> jnp.ndarray:
    """Rotation inverse = transpose (so3group.hpp:115-117)."""
    return jnp.swapaxes(C, -1, -2)


def so3_adjoint(C: jnp.ndarray) -> jnp.ndarray:
    """SO(3) adjoint = the rotation matrix itself (so3group.hpp:120-123)."""
    return C


def jacobi_eigh(A: jnp.ndarray, sweeps: int = 5):
    """Batched symmetric n x n (n small, static) eigendecomposition by
    cyclic Jacobi.

    Pure jnp rotations — deliberately NOT `jnp.linalg.eigh/svd`: those
    lower to LAPACK-style custom calls whose TPU lowering is broken on
    this toolchain (a bare jitted 3x3 batched SVD SIGABRTs the XLA
    compiler; embedded in a larger program it silently emits NaN/garbage
    factors — measured r4, out/r4/tpu_prof.log), and even where eigh
    works its TPU code is enormous (a single eager 3x3-batch whitening
    eigh compiled to a 2 MB executable, r5 recon) — at the relay's
    ~2 MB/s per-process upload, program bytes are wall time. Cyclic
    sweeps are rolled into a fori_loop for the same reason. Returns
    ``(eigenvalues [..., n], V)`` with eigenvectors in columns
    (unsorted). 5 sweeps reach f64 machine precision at n=4 (worst
    off-diagonal over 500 trials: 1.6e-16); use ~6-7 for n=6."""
    n = A.shape[-1]
    dtype = A.dtype
    batch = A.shape[:-2]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), batch + (n, n))
    pairs = [(p, q) for p in range(n) for q in range(p + 1, n)]

    def sweep(_, carry):
        A, V = carry
        for p, q in pairs:
            apq = A[..., p, q]
            theta = 0.5 * jnp.arctan2(2.0 * apq,
                                      A[..., p, p] - A[..., q, q])
            c, s = jnp.cos(theta), jnp.sin(theta)
            G = eye.at[..., p, p].set(c).at[..., q, q].set(c)
            G = G.at[..., p, q].set(-s).at[..., q, p].set(s)
            A = jnp.swapaxes(G, -1, -2) @ A @ G
            V = V @ G
        return A, V

    A, V = jax.lax.fori_loop(0, sweeps, sweep, (A, eye))
    return jnp.diagonal(A, axis1=-2, axis2=-1), V


def jacobi_eigh4(A: jnp.ndarray, sweeps: int = 5):
    """4x4 case of `jacobi_eigh` (the aligner's Horn profile matrix)."""
    return jacobi_eigh(A, sweeps)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion ``[..., 4] = (w, x, y, z)`` -> rotation matrix."""
    n = jnp.sum(q * q, axis=-1, keepdims=True)
    # dtype-appropriate floor: 1e-300 underflows to 0 in f32, which would
    # make the zero-quaternion guard a no-op (NaN) in x64-off sessions
    q = q / jnp.sqrt(jnp.maximum(n, jnp.finfo(q.dtype).tiny))
    w, x, y, z = (q[..., i] for i in range(4))
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                   2 * (x * z + y * w)], -1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                   2 * (y * z - x * w)], -1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def nearest_rotation(W: jnp.ndarray) -> jnp.ndarray:
    """``argmax_R tr(R^T W)`` — the proper rotation nearest to ``W``
    (Frobenius), via Horn's quaternion method in CLOSED FORM: the
    dominant eigenvector of the 4x4 profile matrix by unrolled Newton on
    the characteristic quartic + rank-1 adjugate. Equivalent to
    SVD-with-det-correction but always well-defined (degenerate/
    rank-deficient ``W`` included) and TPU-safe (`jacobi_eigh` on why
    SVD is avoided).

    LANE-MAJOR internals: every 3x3/4x4 element is a separate
    batch-shaped lane vector and no ``[..., 4, 4]`` array ever exists.
    Batched tiny-matrix arrays tile to (4, 4) sublaneXlane blocks on
    TPU, and every element slice forces a relayout — the earlier
    array-form closed form still compiled the 400-hypothesis RANSAC to
    92 MB of relayout/elementwise code (r5 recon, 38k bare muls). The
    same doctrine as ops/pallas_kernels._stereo_math."""
    batch = W.shape[:-2]
    Wf = W.reshape((-1, 3, 3))

    def m(i, j):  # M = W^T entries
        return Wf[:, j, i]

    tr = m(0, 0) + m(1, 1) + m(2, 2)
    N = [
        [tr, m(1, 2) - m(2, 1), m(2, 0) - m(0, 2), m(0, 1) - m(1, 0)],
        [m(1, 2) - m(2, 1), m(0, 0) - m(1, 1) - m(2, 2),
         m(0, 1) + m(1, 0), m(2, 0) + m(0, 2)],
        [m(2, 0) - m(0, 2), m(0, 1) + m(1, 0),
         m(1, 1) - m(0, 0) - m(2, 2), m(1, 2) + m(2, 1)],
        [m(0, 1) - m(1, 0), m(2, 0) + m(0, 2),
         m(1, 2) + m(2, 1), m(2, 2) - m(0, 0) - m(1, 1)],
    ]
    q = _max_eigvec4_lanes(N)  # 4 lane vectors
    w, x, y, z = q
    R_rows = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ]
    R = jnp.stack([jnp.stack(r, axis=-1) for r in R_rows], axis=-2)
    return R.reshape(batch + (3, 3))


def _max_eigvec4_lanes(N, newton_iters: int = 26):
    """Closed-form dominant unit eigenvector of a symmetric 4x4 given as
    a 4x4 nested list of batch-shaped lane vectors; returns 4 lane
    vectors (see `nearest_rotation` for the lane-major rationale and
    `max_eigvec4` for the math). Degenerate (repeated lambda_max) inputs
    return the identity quaternion."""
    dtype = N[0][0].dtype
    one = jnp.ones_like(N[0][0])
    t4 = (N[0][0] + N[1][1] + N[2][2] + N[3][3]) / 4.0
    B = [[N[i][j] - (t4 if i == j else 0.0) for j in range(4)]
         for i in range(4)]
    B2 = [[sum(B[i][k] * B[k][j] for k in range(4)) for j in range(4)]
          for i in range(4)]
    trB2 = sum(B2[i][i] for i in range(4))
    trB3 = sum(B2[i][j] * B[j][i] for i in range(4) for j in range(4))
    trB4 = sum(B2[i][j] * B2[j][i] for i in range(4) for j in range(4))
    # char poly of traceless symmetric B: p(x) = x^4 + e2 x^2 - e3 x + e4
    e2 = -0.5 * trB2
    e3 = trB3 / 3.0
    e4 = 0.125 * (trB2 * trB2 - 2.0 * trB4)
    lam = jnp.sqrt(jnp.clip(trB2, 0.0, None))  # >= lambda_max, p(lam) >= 0
    for _ in range(newton_iters):
        p = ((lam * lam + e2) * lam - e3) * lam + e4
        dp = (4.0 * lam * lam + 2.0 * e2) * lam - e3
        dp = jnp.where(jnp.abs(dp) < 1e-30, 1e-30, dp)
        lam = lam - jnp.clip(p / dp, 0.0, None)  # monotone descent
    M = [[B[i][j] - (lam if i == j else 0.0) for j in range(4)]
         for i in range(4)]

    def det3(rs, cs):
        (r0, r1, r2), (c0, c1, c2) = rs, cs
        return (
            M[r0][c0] * (M[r1][c1] * M[r2][c2] - M[r1][c2] * M[r2][c1])
            - M[r0][c1] * (M[r1][c0] * M[r2][c2] - M[r1][c2] * M[r2][c0])
            + M[r0][c2] * (M[r1][c0] * M[r2][c1] - M[r1][c1] * M[r2][c0])
        )

    rows = (0, 1, 2, 3)
    # adj columns: adj[i][j] = C[j][i] = (-1)^(i+j) minor(row j, col i)
    adj = [[None] * 4 for _ in range(4)]
    for j in range(4):
        rj = tuple(r for r in rows if r != j)
        for i in range(4):
            ci = tuple(c for c in rows if c != i)
            adj[i][j] = ((-1.0) ** (i + j)) * det3(rj, ci)
    # dominant column by |diagonal| — branchless 4-way select
    diag = [jnp.abs(adj[k][k]) for k in range(4)]
    best01 = diag[0] >= diag[1]
    d01 = jnp.where(best01, diag[0], diag[1])
    best23 = diag[2] >= diag[3]
    d23 = jnp.where(best23, diag[2], diag[3])
    front = d01 >= d23
    q = []
    for i in range(4):
        c01 = jnp.where(best01, adj[i][0], adj[i][1])
        c23 = jnp.where(best23, adj[i][2], adj[i][3])
        q.append(jnp.where(front, c01, c23))
    n2 = sum(qi * qi for qi in q)
    # repeated lambda_max -> adj ~ 0 -> identity quaternion fallback
    degenerate = n2 < jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    inv = one / jnp.sqrt(jnp.where(degenerate, 1.0, n2))
    q = [jnp.where(degenerate, init, qi * inv)
         for qi, init in zip(q, (one, 0.0 * one, 0.0 * one, 0.0 * one))]
    return q


def so3_normalize(C: jnp.ndarray) -> jnp.ndarray:
    """Project onto SO(3) (so3group.hpp:128-137) — the reference uses
    Eigen SVD; here `nearest_rotation` (same projection, TPU-safe).

    The reference disables this inside differentiated ops; use it only
    *between* solves to curb drift of the over-parameterized rotation.
    """
    return nearest_rotation(C)


# ---------------------------------------------------------------------------
# SE(3) — flat [t(3) | R row-major(9)] parameterization
# ---------------------------------------------------------------------------


def se3_trans(T: jnp.ndarray) -> jnp.ndarray:
    """Translation part ``[..., 3]`` of a flat pose ``[..., 12]``."""
    return T[..., :3]


def se3_rot(T: jnp.ndarray) -> jnp.ndarray:
    """Rotation part ``[..., 3, 3]`` of a flat pose ``[..., 12]``."""
    return T[..., 3:].reshape(*T.shape[:-1], 3, 3)


def se3_make(t: jnp.ndarray, C: jnp.ndarray) -> jnp.ndarray:
    """Pack translation ``[..., 3]`` + rotation ``[..., 3, 3]`` into ``[..., 12]``."""
    return jnp.concatenate([t, C.reshape(*C.shape[:-2], 9)], axis=-1)


def se3_identity(batch_shape=(), dtype=jnp.float64) -> jnp.ndarray:
    eye = jnp.concatenate([jnp.zeros(3, dtype), jnp.eye(3, dtype=dtype).reshape(9)])
    return jnp.broadcast_to(eye, (*batch_shape, SE3_DIM))


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exp, first-order in translation: ``xi[..., 6] -> T[..., 12]``.

    Reference convention (se3group.hpp:313-325): translation = xi[:3]
    verbatim, rotation = SO3 exp of xi[3:]. This IS the retraction used by
    the local parameterization (perturbations.hpp:62) — do not "fix" it.
    """
    return se3_make(xi[..., :3], so3_exp(xi[..., 3:]))


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log, first-order in translation (se3group.hpp:327-342)."""
    return jnp.concatenate([se3_trans(T), so3_log(se3_rot(T))], axis=-1)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse: ``(t, R) -> (-R^T t, R^T)`` (se3group.hpp:152-158)."""
    Rt = so3_inverse(se3_rot(T))
    t = se3_trans(T)
    return se3_make(-jnp.einsum("...ij,...j->...i", Rt, t), Rt)


def se3_compose(Ta: jnp.ndarray, Tb: jnp.ndarray) -> jnp.ndarray:
    """Group product ``Ta * Tb`` (se3group.hpp:176-183)."""
    Ra, Rb = se3_rot(Ta), se3_rot(Tb)
    ta, tb = se3_trans(Ta), se3_trans(Tb)
    return se3_make(jnp.einsum("...ij,...j->...i", Ra, tb) + ta, Ra @ Rb)


def se3_transform_point(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """``R p + t`` (se3group.hpp:191-209). Broadcasts over leading dims."""
    return jnp.einsum("...ij,...j->...i", se3_rot(T), p) + se3_trans(T)


def se3_transform_vector(T: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """``R v`` — directions ignore translation (se3group.hpp:240-258)."""
    return jnp.einsum("...ij,...j->...i", se3_rot(T), v)


def se3_adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """6x6 adjoint ``[[R, t^ R], [0, R]]`` (se3group.hpp:161-170)."""
    R = se3_rot(T)
    tw = so3_wedge(se3_trans(T))
    top = jnp.concatenate([R, tw @ R], axis=-1)
    bottom = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_matrix(T: jnp.ndarray) -> jnp.ndarray:
    """Flat pose -> homogeneous 4x4 (se3group.hpp:126-132)."""
    R = se3_rot(T)
    t = se3_trans(T)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros((*T.shape[:-1], 1, 4), dtype=T.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(M: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous 4x4 -> flat pose ``[..., 12]``."""
    return se3_make(M[..., :3, 3], M[..., :3, :3])


def se3_wedge(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) wedge: ``xi[..., 6] -> Xi[..., 4, 4]`` (se3group.hpp:293-300)."""
    W = so3_wedge(xi[..., 3:])
    top = jnp.concatenate([W, xi[..., :3][..., :, None]], axis=-1)
    bottom = jnp.zeros((*xi.shape[:-1], 1, 4), dtype=xi.dtype)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_vee(Xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) vee (se3group.hpp:306-311)."""
    return jnp.concatenate([Xi[..., :3, 3], so3_vee(Xi[..., :3, :3])], axis=-1)


def se3_normalize(T: jnp.ndarray) -> jnp.ndarray:
    """Renormalize the rotation block via SVD projection (between solves only)."""
    return se3_make(se3_trans(T), so3_normalize(se3_rot(T)))


def se3_retract(T: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    """Left-perturbation retraction ``T <- exp(eps) * T``.

    This is the TPU-native replacement for the reference's
    ``SE3Perturbation`` local parameterization (perturbations.hpp:45-76):
    instead of Ceres chaining a 12x6 parameterization Jacobian, the LM
    solver steps in the 6-dof tangent space and applies this retraction.
    """
    return se3_compose(se3_exp(eps), T)


def so3_retract(C: jnp.ndarray, psi: jnp.ndarray) -> jnp.ndarray:
    """Left-perturbation retraction ``C <- exp(psi) * C`` (perturbations.hpp:11-42)."""
    return so3_exp(psi) @ C


def unit_vector_retract(x: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Tangent-plane retraction for unit vectors (perturbations.hpp:87-113).

    Projects delta onto the tangent plane of x, adds, renormalizes.
    """
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    delta_orth = delta - (jnp.sum(delta * x, axis=-1, keepdims=True) / x2) * x
    y = x + delta_orth
    return y / jnp.linalg.norm(y, axis=-1, keepdims=True)


def point_transform_jacobians(T: jnp.ndarray, p_g: jnp.ndarray):
    """Transformed point + analytic tangent-space Jacobians.

    Returns ``(p_c, J_pose[..., 3, 6], J_point[..., 3, 3])`` where J_pose is
    the derivative of ``exp(eps)*T @ p_g`` w.r.t. ``eps`` at 0 — the product
    of the reference's sparse 3x12 TransformJacobian (se3group.hpp:196-207)
    with the 12x6 parameterization Jacobian, collapsed analytically:
    ``d p_c / d eps = [ I | -p_c^ ]`` and ``d p_c / d p_g = R``.
    """
    R = se3_rot(T)
    p_c = jnp.einsum("...ij,...j->...i", R, p_g) + se3_trans(T)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), R.shape)
    J_pose = jnp.concatenate([eye, -so3_wedge(p_c)], axis=-1)
    return p_c, J_pose, R


def vector_transform_jacobians(T: jnp.ndarray, v_g: jnp.ndarray):
    """Transformed direction + tangent Jacobians.

    ``d v_c / d eps = [ 0 | -v_c^ ]`` (translation does not act on
    directions), ``d v_c / d v_g = R``.
    """
    R = se3_rot(T)
    v_c = jnp.einsum("...ij,...j->...i", R, v_g)
    zero = jnp.zeros_like(R)
    J_pose = jnp.concatenate([zero, -so3_wedge(v_c)], axis=-1)
    return v_c, J_pose, R
