"""Dogleg / subspace-dogleg trust region over the scatter-free block system.

Counterpart of the reference flagship's minimizer configuration
(`/root/reference/tests/dataset_vo_sun.cpp:136-152`):

    options.trust_region_strategy_type = ceres::DOGLEG;
    options.dogleg_type = ceres::SUBSPACE_DOGLEG;
    options.use_nonmonotonic_steps = true;

Ceres's SUBSPACE_DOGLEG minimizes the quadratic model exactly over the
two-dimensional subspace span{gradient, Gauss-Newton step} subject to the
trust-region radius. The TPU-native formulation here works on the reduced
block system of the window solver (`solver/window.py`) — no dense Hessian
is ever materialized:

  * the Gauss-Newton step comes from the undamped scatter-free Schur
    solve (one 6K x 6K Cholesky);
  * the two H.v products needed for the projected 2x2 model are block
    contractions (one-hot MXU matmuls, zero scatters);
  * the boundary subproblem (min of the model on the trust-region circle)
    is solved by a dense angular scan + Newton polish — a few hundred
    scalar FLOPs, branchless and jittable (Ceres solves the equivalent
    degree-4 polynomial, dogleg_strategy.cc).

Like `window.blocks_lm_loop`, the loop carries the candidate state's
factor blocks so each iteration runs exactly ONE factor pass; a rejected
step only shrinks the radius and re-solves the tiny subproblem.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ceres_slam_tpu.solver import dense, lm


def _pin_blocks(Hpp, Hll):
    """Unit diagonals for all-zero (fixed/invalid) blocks — identical
    pinning to `window._schur_reduce` so the model Hessian matches the one
    the GN solve factorizes."""
    dtype = Hpp.dtype
    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    dpp = jnp.einsum("kaa->ka", Hpp)
    Hpp_p = Hpp + eye6 * jnp.all(dpp == 0.0, axis=-1)[:, None, None].astype(dtype)
    dll = jnp.einsum("jaa->ja", Hll)
    Hll_p = Hll + eye3 * jnp.all(dll == 0.0, axis=-1)[:, None, None].astype(dtype)
    return Hpp_p, Hll_p


def block_hvp(Hpp_p, Hll_p, U_jo, onehot_jok, v):
    """H @ v for the block system H = [[Hpp, W], [W^T, Hll]] without
    materializing W: the pose<->landmark coupling is applied through the
    per-slot U blocks and the [J, O, K] one-hot (MXU contractions)."""
    K = Hpp_p.shape[0]
    J = Hll_p.shape[0]
    dtype = Hpp_p.dtype
    vp = v[: 6 * K].reshape(K, 6)
    vl = v[6 * K :].reshape(J, 3)
    U4 = U_jo.reshape(J, -1, 6, 3)

    # HIGHEST on EVERY product: the TPU MXU default is a single bf16 pass,
    # and the ill-conditioned BA system (prior chain cond ~1e12) loses the
    # 2x2 subspace model's accuracy if any link of the H.v chain truncates.
    HI = jax.lax.Precision.HIGHEST
    Hvp = jnp.einsum("kab,kb->ka", Hpp_p, vp, precision=HI)
    # W vl: per-observation U4[j,o] @ vl[j], reduced to poses by one-hot.
    Wvl = jnp.einsum("joab,jb->joa", U4, vl, precision=HI)
    Hvp = Hvp + jnp.einsum(
        "jok,joa->ka", onehot_jok.astype(dtype), Wvl, precision=HI
    )
    # W^T vp: gather vp to observation slots by one-hot, contract with U4.
    vp_obs = jnp.einsum("jok,ka->joa", onehot_jok.astype(dtype), vp, precision=HI)
    Hvl = jnp.einsum("jab,jb->ja", Hll_p, vl, precision=HI) + jnp.einsum(
        "joab,joa->jb", U4, vp_obs, precision=HI
    )
    return jnp.concatenate([Hvp.reshape(-1), Hvl.reshape(-1)])


def _boundary_min(B00, B01, B11, g0, g1, radius):
    """Minimize 0.5 y^T B y + g^T y on the circle ||y|| = radius.

    Exact More-Sorensen solve in the 2x2 eigenbasis: the minimizer is
    y(lam) = -(B + lam I)^{-1} g with lam >= max(0, -e_min) chosen so
    ||y(lam)|| = radius (Ceres solves the equivalent degree-4 polynomial,
    dogleg_strategy.cc). A sampled angular scan is NOT safe here: for an
    ill-conditioned B (cond ~1e5 is routine in BA) the model's valley on
    the circle is only ~cond^{-1/2} radians wide and falls between samples.
    Safeguarded bisection on lam is branchless, jittable, and exact."""
    dtype = B00.dtype
    r = radius
    tiny = jnp.asarray(1e-30, dtype)

    # closed-form symmetric 2x2 eigendecomposition, e1 <= e2
    mean = 0.5 * (B00 + B11)
    half = 0.5 * (B00 - B11)
    d = jnp.sqrt(half * half + B01 * B01)
    e1 = mean - d
    e2 = mean + d
    # eigenvector for e1 from the better-conditioned row of (B - e1 I)
    v_a = jnp.stack([B01, e1 - B00])
    v_b = jnp.stack([e1 - B11, B01])
    use_a = jnp.abs(e1 - B00) > jnp.abs(e1 - B11)
    v1 = jnp.where(use_a, v_a, v_b)
    n1 = jnp.sqrt(jnp.sum(v1 * v1))
    v1 = jnp.where(n1 > tiny, v1 / jnp.maximum(n1, tiny),
                   jnp.asarray([1.0, 0.0], dtype))
    v2 = jnp.stack([-v1[1], v1[0]])

    g_vec = jnp.stack([g0, g1])
    gh1 = jnp.sum(v1 * g_vec)
    gh2 = jnp.sum(v2 * g_vec)

    def norm2_y(lam):
        y1 = -gh1 / jnp.maximum(e1 + lam, tiny)
        y2 = -gh2 / jnp.maximum(e2 + lam, tiny)
        return y1 * y1 + y2 * y2

    # ||y(lam)|| decreases in lam; bracket so ||y(hi)|| <= r <= ||y(lo+)||
    gnorm = jnp.sqrt(gh1 * gh1 + gh2 * gh2)
    lo = jnp.maximum(jnp.asarray(0.0, dtype), -e1)
    hi = jnp.maximum(lo + tiny, -e1 + gnorm / jnp.maximum(r, tiny))

    def bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        too_big = norm2_y(mid) > r * r
        return jnp.where(too_big, mid, lo), jnp.where(too_big, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 64, bisect, (lo, hi))
    lam = 0.5 * (lo + hi)
    yh1 = -gh1 / jnp.maximum(e1 + lam, tiny)
    yh2 = -gh2 / jnp.maximum(e2 + lam, tiny)
    # hard case (gh1 ~ 0, lam pinned at -e1, ||y|| < r): fill the missing
    # norm along the e1 eigendirection to reach the boundary
    tau = jnp.sqrt(jnp.maximum(r * r - (yh1 * yh1 + yh2 * yh2), 0.0))
    yh1 = yh1 + tau * jnp.where(gh1 > 0.0, -1.0, 1.0)
    # the fill's cross term and the bisection residual leave ||y|| within
    # ~1e-8 of r; project exactly onto the circle
    ynorm = jnp.sqrt(yh1 * yh1 + yh2 * yh2)
    scale = r / jnp.maximum(ynorm, tiny)
    yh1 = yh1 * scale
    yh2 = yh2 * scale

    def model(y0, y1):
        return 0.5 * (B00 * y0 * y0 + 2.0 * B01 * y0 * y1 + B11 * y1 * y1) + (
            g0 * y0 + g1 * y1
        )

    # candidates: the More-Sorensen point, the boundary Cauchy point, and
    # +/- the e1 eigendirection (covers g ~ 0); pick the lowest model value
    cand0 = jnp.stack([
        yh1 * v1[0] + yh2 * v2[0],
        -r * g0 / jnp.maximum(jnp.sqrt(g0 * g0 + g1 * g1), tiny),
        r * v1[0],
        -r * v1[0],
    ])
    cand1 = jnp.stack([
        yh1 * v1[1] + yh2 * v2[1],
        -r * g1 / jnp.maximum(jnp.sqrt(g0 * g0 + g1 * g1), tiny),
        r * v1[1],
        -r * v1[1],
    ])
    best = jnp.argmin(model(cand0, cand1))
    return cand0[best], cand1[best]


def subspace_step(g, dx_gn, hvp, radius):
    """The SUBSPACE_DOGLEG step: exact model minimization over
    span{g, dx_gn} within ``radius``. ``hvp(v)`` applies the (pinned,
    masked) model Hessian. Returns ``(dx, pred_decrease)``."""
    dtype = g.dtype
    eps = jnp.asarray(1e-30, dtype)

    gn = jnp.sqrt(jnp.sum(g * g))
    b1 = g / jnp.maximum(gn, eps)
    proj = jnp.sum(dx_gn * b1)
    b2_raw = dx_gn - proj * b1
    n2 = jnp.sqrt(jnp.sum(b2_raw * b2_raw))
    gn_norm = jnp.sqrt(jnp.sum(dx_gn * dx_gn))
    degenerate = n2 <= 1e-7 * jnp.maximum(gn_norm, eps)
    # When span{g, gn} is 1-D, zero b2: with B11 := 1 and g1 := 0 the 2-D
    # subproblem collapses to the 1-D line search along b1 on its own.
    b2 = jnp.where(degenerate, jnp.zeros_like(b2_raw), b2_raw / jnp.maximum(n2, eps))

    Hb1 = hvp(b1)
    Hb2 = hvp(b2)
    B00 = jnp.sum(b1 * Hb1)
    B01 = 0.5 * (jnp.sum(b1 * Hb2) + jnp.sum(b2 * Hb1))
    B11 = jnp.where(degenerate, jnp.asarray(1.0, dtype), jnp.sum(b2 * Hb2))
    g0 = jnp.sum(b1 * g)
    g1 = jnp.where(degenerate, jnp.asarray(0.0, dtype), jnp.sum(b2 * g))

    # interior candidate: B y = -g2 (2x2 closed form)
    det = B00 * B11 - B01 * B01
    posdef = (B00 > 0.0) & (det > 0.0)
    det_safe = jnp.where(det == 0.0, 1.0, det)
    yi0 = (-g0 * B11 + g1 * B01) / det_safe
    yi1 = (-g1 * B00 + g0 * B01) / det_safe
    interior_ok = posdef & (yi0 * yi0 + yi1 * yi1 <= radius * radius)

    yb0, yb1 = _boundary_min(B00, B01, B11, g0, g1, radius)
    y0 = jnp.where(interior_ok, yi0, yb0)
    y1 = jnp.where(interior_ok, yi1, yb1)

    dx = y0 * b1 + y1 * b2
    pred = -(
        g0 * y0
        + g1 * y1
        + 0.5 * (B00 * y0 * y0 + 2.0 * B01 * y0 * y1 + B11 * y1 * y1)
    )
    return dx, pred


def blocks_dogleg_loop(
    problem,
    state0,
    config: lm.SolveConfig,
    total_blocks,
    onehot_jok,
    schur_solve,
    init_radius: float = 1e4,
):
    """Subspace-dogleg trust-region loop carrying the candidate's factor
    blocks (ONE factor pass per iteration, like `window.blocks_lm_loop`).

    ``total_blocks(state) -> (blocks, total_cost)`` evaluates the factors;
    ``schur_solve(blocks_with_aux..., lam) -> (dx, grad_norm, pred)`` is
    the scatter-free Schur solve used undamped for the GN step. Implements
    nonmonotonic step acceptance when ``config.nonmonotonic`` (Ceres
    use_nonmonotonic_steps, tests/dataset_vo_sun.cpp:144).
    """
    from ceres_slam_tpu.solver import window as window_mod

    blocks0, cost0 = total_blocks(state0)
    dtype = cost0.dtype

    class Carry(NamedTuple):
        state: object
        blocks: object
        radius: jnp.ndarray
        cost: jnp.ndarray
        grad_norm: jnp.ndarray
        it: jnp.ndarray
        done: jnp.ndarray
        cost_buf: jnp.ndarray
        best_state: object
        best_blocks: object
        best_cost: jnp.ndarray
        history: tuple

    def cond(c):
        return (~c.done) & (c.it < config.max_iters)

    def body(c):
        Hpp_aux, gp_aux = window_mod._masked_aux_blocks(problem, c.state, dtype)
        Hpp = c.blocks.Hpp + Hpp_aux
        gp = c.blocks.gp + gp_aux
        Hpp_p, Hll_p = _pin_blocks(Hpp, c.blocks.Hll)

        # Gauss-Newton step from the undamped Schur solve
        dx_gn, grad_norm, _ = schur_solve(
            problem, Hpp, c.blocks.Hll, c.blocks.U_jo, gp, c.blocks.gl,
            onehot_jok, jnp.asarray(0.0, dtype),
        )
        gn_ok = jnp.all(jnp.isfinite(dx_gn))
        g = jnp.concatenate([gp.reshape(-1), c.blocks.gl.reshape(-1)])
        # a failed (indefinite) GN solve degrades to steepest descent
        dx_gn = jnp.where(gn_ok, dx_gn, -g)

        hvp = lambda v: block_hvp(Hpp_p, Hll_p, c.blocks.U_jo, onehot_jok, v)
        dx, pred = subspace_step(g, dx_gn, hvp, c.radius)
        dx_ok = jnp.all(jnp.isfinite(dx))
        dx = jnp.where(dx_ok, dx, jnp.zeros_like(dx))

        new_state = dense._retract_state(problem, c.state, dx)
        new_blocks, new_cost = total_blocks(new_state)

        actual = c.cost - new_cost
        rho = actual / jnp.maximum(pred, 1e-30)
        accept_ref = jnp.max(c.cost_buf) if config.nonmonotonic else c.cost
        accept = jnp.isfinite(new_cost) & (new_cost < accept_ref)

        step_norm = jnp.sqrt(jnp.sum(dx * dx))
        radius = jnp.where(
            rho > 0.75,
            jnp.maximum(c.radius, 3.0 * step_norm),
            jnp.where(rho < 0.25, c.radius * 0.5, c.radius),
        )
        radius = jnp.where(accept, radius, c.radius * 0.25)
        radius = jnp.clip(radius, 1e-12, 1e12)

        state = jax.tree.map(
            lambda n, o: jnp.where(accept, n, o), new_state, c.state)
        blocks = jax.tree.map(
            lambda n, o: jnp.where(accept, n, o), new_blocks, c.blocks)
        cost = jnp.where(accept, new_cost, c.cost)
        cost_buf = jnp.where(
            accept,
            c.cost_buf.at[c.it % config.nonmonotonic_window].set(new_cost),
            c.cost_buf,
        )
        better = accept & (new_cost < c.best_cost)
        best_state = jax.tree.map(
            lambda n, o: jnp.where(better, n, o), new_state, c.best_state)
        best_blocks = jax.tree.map(
            lambda n, o: jnp.where(better, n, o), new_blocks, c.best_blocks)
        best_cost = jnp.where(better, new_cost, c.best_cost)

        # ftol gated on a real decrease: an accepted nonmonotonic uphill
        # step (actual < 0) must not terminate the solve.
        small = accept & (actual >= 0.0) & (
            actual <= config.ftol * jnp.maximum(c.cost, 1e-30))
        done = (
            small
            | (grad_norm <= config.gtol)
            | (dx_ok & (jnp.max(jnp.abs(dx)) <= config.xtol))
            | (radius <= 1e-11)
        )
        if config.run_full_budget:
            done = jnp.asarray(False)
        history = c.history
        if config.record_history:
            ch, rh, gh, ah = history
            history = (
                ch.at[c.it].set(cost),
                rh.at[c.it].set(radius),  # trust radius in the lambda slot
                gh.at[c.it].set(grad_norm),
                ah.at[c.it].set(accept),
            )
        return Carry(
            state, blocks, radius, cost, grad_norm, c.it + 1, done,
            cost_buf, best_state, best_blocks, best_cost, history,
        )

    init = Carry(
        state=state0,
        blocks=blocks0,
        radius=jnp.asarray(init_radius, dtype),
        cost=cost0,
        grad_norm=jnp.asarray(jnp.inf, dtype),
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        cost_buf=jnp.full((config.nonmonotonic_window,), cost0, dtype),
        best_state=state0,
        best_blocks=blocks0,
        best_cost=cost0,
        history=(
            (jnp.full((config.max_iters,), jnp.nan, dtype),) * 3
            + (jnp.zeros((config.max_iters,), bool),)
        ) if config.record_history else (),
    )
    out = jax.lax.while_loop(cond, body, init)
    # With nonmonotonic steps the final iterate can sit above the best
    # accepted one; return the best, with ITS factor blocks, so covariance
    # extraction linearizes at the returned solution.
    final_state = out.best_state if config.nonmonotonic else out.state
    final_blocks = out.best_blocks if config.nonmonotonic else out.blocks
    final_cost = out.best_cost if config.nonmonotonic else out.cost
    hist = out.history if config.record_history else (None, None, None, None)
    summary = lm.SolveSummary(
        iterations=out.it,
        initial_cost=cost0,
        final_cost=final_cost,
        final_grad_norm=out.grad_norm,
        final_lambda=out.radius,
        cost_history=hist[0],
        lambda_history=hist[1],
        grad_norm_history=hist[2],
        step_accepted=hist[3],
    )
    return final_state, summary, final_blocks
