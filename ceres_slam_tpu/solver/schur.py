"""Schur-complement LM solver: landmark elimination on the block system.

TPU-native replacement for Ceres's SPARSE_SCHUR linear solver
(blowup_test.cpp:106, and the commented option in dataset_vo_sun.cpp:144).
The landmark blocks C_j are inverted in closed form (batched 3x3), the
reduced camera system

    S = B - W C^{-1} W^T        (6K x 6K)

is formed with two batched matmuls (MXU work, not scatter work), solved
with dense Cholesky, and the landmark steps are back-substituted:

    dl_j = C_j^{-1} (-gl_j - W_j^T dp)

This is exact (same dx as the dense solver) — landmark elimination is
algebraic, not an approximation. The dense-W layout [K, J, 6, 3] fits
windows and medium full-batch problems; very large problems should use
the observation-sparse PCG path (future work, SURVEY.md §5.7).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ceres_slam_tpu.solver import dense


def _inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / det) — much faster on
    TPU than LU for tiny blocks."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def schur_step(
    problem: dense.StereoBAProblem,
    blocks: dense.BlockNormalEq,
    lam: jnp.ndarray,
):
    """Solve the damped system via landmark elimination.

    Returns ``(dx [6K+3J], grad_norm, pred_decrease)`` — the scalar
    predicted decrease of the undamped model is computed blockwise
    (``dx.g + 0.5 dx.H dx``) without materializing H dx.
    """
    K, J = blocks.Hpp.shape[0], blocks.Hll.shape[0]
    dtype = blocks.Hpp.dtype
    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    free_pose = (~problem.fixed_pose_mask).astype(dtype)
    free_pt = problem.point_valid.astype(dtype)

    # Block-level gauge masking (equivalent to apply_gauge_mask).
    Hpp = blocks.Hpp * free_pose[:, None, None]
    gp = blocks.gp * free_pose[:, None]
    Hll = blocks.Hll * free_pt[:, None, None]
    gl = blocks.gl * free_pt[:, None]
    W = blocks.W * free_pose[:, None, None, None] * free_pt[None, :, None, None]

    # Pin empty diagonals (fixed poses / invalid points) to identity.
    dpp = jnp.einsum("kii->ki", Hpp)
    Hpp = Hpp + eye6 * jnp.all(dpp == 0.0, axis=-1, keepdims=True)[..., None].astype(dtype)
    dll = jnp.einsum("jii->ji", Hll)
    Hll = Hll + eye3 * jnp.all(dll == 0.0, axis=-1, keepdims=True)[..., None].astype(dtype)

    # LM damping on the block diagonals (same diag-scaled damping as the
    # dense path).
    Hpp_d = Hpp + lam * jnp.einsum(
        "ka,ab->kab", jnp.clip(jnp.einsum("kaa->ka", Hpp), 1e-12, 1e32), eye6
    )
    C_d = Hll + lam * jnp.einsum(
        "ja,ab->jab", jnp.clip(jnp.einsum("jaa->ja", Hll), 1e-12, 1e32), eye3
    )

    Cinv = _inv3x3(C_d)

    # Reduced camera system S = B - W C^{-1} W^T via flat matmuls.
    Wf = W.transpose(0, 2, 1, 3).reshape(6 * K, 3 * J)
    WC = jnp.einsum("kjab,jbc->kjac", W, Cinv).transpose(0, 2, 1, 3).reshape(6 * K, 3 * J)
    S = -WC @ Wf.T
    S = S.reshape(K, 6, K, 6)
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hpp_d)
    S = S.reshape(6 * K, 6 * K)

    rhs = -(gp.reshape(-1) - WC @ gl.reshape(-1))
    L, low = jax.scipy.linalg.cho_factor(S, lower=True)
    dp = jax.scipy.linalg.cho_solve((L, low), rhs)

    Wt_dp = (Wf.T @ dp).reshape(J, 3)
    dl = -jnp.einsum("jab,jb->ja", Cinv, gl + Wt_dp)

    dx = jnp.concatenate([dp, dl.reshape(-1)])
    grad_norm = jnp.maximum(jnp.max(jnp.abs(gp)), jnp.max(jnp.abs(gl)))
    # Predicted decrease of the UNDAMPED model, blockwise:
    # dx.H dx = dp.Hpp dp + 2 dp.W dl + dl.Hll dl
    dp_r = dp.reshape(K, 6)
    dl_f = dl.reshape(-1)
    g_dot_dx = jnp.sum(gp * dp_r) + jnp.sum(gl * dl)
    dxHdx = (
        jnp.einsum("ka,kab,kb->", dp_r, Hpp, dp_r)
        + 2.0 * (dp @ (Wf @ dl_f))
        + jnp.einsum("ja,jab,jb->", dl, Hll, dl)
    )
    pred = -(g_dot_dx + 0.5 * dxHdx)
    return dx, grad_norm, pred


@partial(jax.jit, static_argnames=("config",))
def solve_ba_schur(
    problem: dense.StereoBAProblem,
    state0: dense.BAState,
    config: dense.SolveConfig = dense.SolveConfig(),
):
    """LM with the Schur-complement linear solver (drop-in replacement for
    `dense.solve_ba`; exact same minimum, much faster for J >> K)."""
    from ceres_slam_tpu.solver import lm as lm_mod

    def step(state, lam):
        blocks = dense.ba_block_normal_equations(problem, state)
        return schur_step(problem, blocks, lam)

    return lm_mod.lm_solve(
        state0,
        config,
        lambda s: dense.ba_cost(problem, s),
        step,
        lambda s, dx: dense._retract_state(problem, s, dx),
    )
