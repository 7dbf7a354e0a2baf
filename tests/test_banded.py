"""Banded Schur preconditioner (solver/banded.py): cyclic reduction vs
dense, banded assembly vs the true reduced camera matrix, and the full
banded-PCG solve vs block-Jacobi PCG."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from ceres_slam_tpu.solver import banded, dense, lm, pcg


def _dense_tridiag(D, E):
    n, m, _ = D.shape
    A = np.zeros((n * m, n * m))
    for i in range(n):
        A[i * m:(i + 1) * m, i * m:(i + 1) * m] = D[i]
        if i + 1 < n:
            A[i * m:(i + 1) * m, (i + 1) * m:(i + 2) * m] = E[i]
            A[(i + 1) * m:(i + 2) * m, i * m:(i + 1) * m] = E[i].T
    return A


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8])
def test_cyclic_reduction_matches_dense(n):
    rng = np.random.default_rng(0)
    m = 4
    # SPD block tridiagonal: A = B B^T + n*I with banded B
    D = np.stack([np.eye(m) * (5.0 + i) for i in range(n)])
    E = 0.5 * rng.normal(size=(max(0, n - 1), m, m))
    A = _dense_tridiag(D, E)
    A = A + A.T  # symmetric; diagonal dominance for SPD
    A += 4.0 * m * n * np.eye(n * m)
    # re-extract blocks of the symmetrized matrix
    Ds = np.stack([A[i * m:(i + 1) * m, i * m:(i + 1) * m] for i in range(n)])
    Es = np.stack([A[i * m:(i + 1) * m, (i + 1) * m:(i + 2) * m]
                   for i in range(n - 1)]) if n > 1 else np.zeros((0, m, m))
    b = rng.normal(size=(n, m))

    levels = banded.ctridiag_factor(jnp.asarray(Ds), jnp.asarray(Es))
    x = np.asarray(banded.ctridiag_solve(levels, jnp.asarray(b)))[:n]
    x_ref = np.linalg.solve(A, b.reshape(-1)).reshape(n, m)
    np.testing.assert_allclose(x, x_ref, rtol=1e-9, atol=1e-10)


def _small_problem():
    return ge._build_example(K=8, J=64, n_obs=320, dtype=jnp.float64, seed=3)


def test_track_info_structure():
    problem, state = _small_problem()
    K, J = state.poses.shape[0], state.points.shape[0]
    t = banded.build_track_info(problem.stereo.pose_idx,
                                problem.stereo.point_idx, K, J)
    assert t.eligible_frac > 0.9  # generator builds contiguous tracks
    # every eligible landmark's slots reference its own pose-sorted obs
    pi = np.asarray(problem.stereo.pose_idx)
    pt = np.asarray(problem.stereo.point_idx)
    slots, w = np.asarray(t.slots), np.asarray(t.slot_w)
    for j in range(J):
        c = int(w[j].sum())
        if c == 0:
            continue
        obs = slots[j, :c]
        assert np.all(pt[obs] == j)
        assert np.all(np.diff(pi[obs]) == 1)


def test_track_info_valid_mask():
    """Padding rows (index 0) must not corrupt the structure analysis:
    with `valid` passed, masked observations are excluded, and the slot
    table still addresses the ORIGINAL observation array."""
    problem, state = _small_problem()
    K, J = state.poses.shape[0], state.points.shape[0]
    pi = np.asarray(problem.stereo.pose_idx)
    pt = np.asarray(problem.stereo.point_idx)
    t_ref = banded.build_track_info(pi, pt, K, J)
    # append padding rows that all hit (pose 0, landmark 0) — the typical
    # zero-initialized pad — plus one that breaks landmark 3's contiguity
    pad_pi = np.concatenate([pi, [0, 0, 5]]).astype(pi.dtype)
    pad_pt = np.concatenate([pt, [0, 0, 3]]).astype(pt.dtype)
    valid = np.concatenate([np.ones(pi.size, bool), [False] * 3])
    t_masked = banded.build_track_info(pad_pi, pad_pt, K, J, valid=valid)
    assert t_masked.eligible_frac == t_ref.eligible_frac
    assert t_masked.L == t_ref.L
    np.testing.assert_array_equal(np.asarray(t_masked.slot_w),
                                  np.asarray(t_ref.slot_w))
    np.testing.assert_array_equal(np.asarray(t_masked.slots),
                                  np.asarray(t_ref.slots))
    # unmasked analysis of the padded arrays degrades (landmark 0 and 3)
    t_bad = banded.build_track_info(pad_pi, pad_pt, K, J)
    assert t_bad.eligible_frac < t_ref.eligible_frac


def test_banded_precond_is_exact_when_all_eligible():
    problem, state = ge._build_example(K=16, J=64, n_obs=256,
                                       dtype=jnp.float64, seed=3)
    K, J = state.poses.shape[0], state.points.shape[0]
    t = banded.build_track_info(problem.stereo.pose_idx,
                                problem.stereo.point_idx, K, J)
    assert t.eligible_frac == 1.0
    lam = jnp.asarray(1e-4, jnp.float64)
    b = pcg.build_obs_blocks(problem, state, lam)
    apply_M = banded.make_banded_precond(b, t, K)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.normal(size=(K, 6)))
    x = apply_M(r)
    # S x == r when the banded part IS S (all landmarks eligible)
    Sx = pcg.schur_matvec(b, x)
    np.testing.assert_allclose(np.asarray(Sx), np.asarray(r),
                               rtol=1e-8, atol=1e-9)


def test_banded_pcg_matches_jacobi():
    problem, state0 = _small_problem()
    # perturb so the solve does real work
    rng = np.random.default_rng(11)
    K, J = state0.poses.shape[0], state0.points.shape[0]
    dx = np.concatenate([rng.normal(0, 0.01, 6 * K),
                         rng.normal(0, 0.05, 3 * J)])
    state0 = dense._retract_state(problem, state0, jnp.asarray(dx))
    cfg = lm.SolveConfig(max_iters=25)
    s_j, sum_j = pcg.solve_ba_pcg(problem, state0, cfg, precond="jacobi")
    s_b, sum_b = pcg.solve_ba_pcg(problem, state0, cfg, precond="banded")
    assert bool(jnp.isfinite(sum_b.final_cost))
    np.testing.assert_allclose(float(sum_b.final_cost),
                               float(sum_j.final_cost), rtol=1e-6)


def test_banded_pcg_with_ineligible_landmarks():
    """Non-contiguous tracks are excluded from the preconditioner but the
    solve still reaches the same minimum (CG mops up the difference)."""
    problem, state0 = _small_problem()
    # break contiguity for a handful of landmarks by swapping pose ids
    st = problem.stereo
    pi = np.asarray(st.pose_idx).copy()
    pt = np.asarray(st.point_idx)
    for j in [0, 5, 9]:
        rows = np.nonzero(pt == j)[0]
        if rows.size >= 2:
            pi[rows[0]], pi[rows[-1]] = pi[rows[-1]], pi[rows[0]]
    problem = problem._replace(stereo=st._replace(
        pose_idx=jnp.asarray(pi, jnp.int32)))
    K, J = state0.poses.shape[0], state0.points.shape[0]
    t = banded.build_track_info(pi, pt, K, J)
    assert t.eligible_frac < 1.0
    rng = np.random.default_rng(11)
    dx = np.concatenate([rng.normal(0, 0.01, 6 * K),
                         rng.normal(0, 0.05, 3 * J)])
    state0 = dense._retract_state(problem, state0, jnp.asarray(dx))
    cfg = lm.SolveConfig(max_iters=25)
    s_j, sum_j = pcg.solve_ba_pcg(problem, state0, cfg, precond="jacobi")
    s_b, sum_b = pcg.solve_ba_pcg(problem, state0, cfg, precond="banded")
    np.testing.assert_allclose(float(sum_b.final_cost),
                               float(sum_j.final_cost), rtol=1e-6)
