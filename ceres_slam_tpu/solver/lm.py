"""Generic jitted Levenberg-Marquardt trust-region loop.

Shared by every problem family (stereo/sun BA, Phong BA, photometric
alignment): the caller supplies a cost function, a normal-equations
builder, a linear-step solver, and a retraction; the loop runs entirely
on device in a `lax.while_loop` — the replacement for `ceres::Solve`'s
minimizer iteration (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class SolveConfig(NamedTuple):
    max_iters: int = 50
    ftol: float = 1e-9
    gtol: float = 1e-12
    # step-size (parameter) tolerance: terminate when max|dx| of an
    # attempted step falls below this. Ceres' parameter_tolerance role;
    # the default keeps the historical "numerically zero step" behavior.
    # f32 pipelines should set ~1e-6: the step norm is rounding-robust
    # where f32 cost-decrease plateaus are not (r5: f32 windows ground
    # 4-8x the f64 iteration count against ftol noise).
    xtol: float = 1e-14
    init_lambda: float = 1e-4
    min_lambda: float = 1e-12
    max_lambda: float = 1e10
    # Ceres use_nonmonotonic_steps (tests/dataset_vo.cpp:70): accept steps
    # that increase the cost relative to the current iterate as long as
    # they decrease it relative to the worst of the last `window` accepted
    # costs — lets the trust region walk through small ridges.
    nonmonotonic: bool = False
    nonmonotonic_window: int = 5
    # Record per-iteration cost/lambda/grad/accept trajectories into the
    # SolveSummary (telemetry.full_report; ceres FullReport equivalent).
    record_history: bool = False
    # Benchmarking only: ignore every convergence test and run exactly
    # max_iters iterations (each one full factor pass + linear solve +
    # retraction, accepted or not) so measured it/s is a pure
    # per-iteration rate with no early-exit dependence.
    run_full_budget: bool = False


class SolveSummary(NamedTuple):
    """Solver report — the replacement for ceres::Solver::Summary
    (BriefReport is the only perf signal the reference emits,
    tests/dataset_vo_sun.cpp:152). When history recording is enabled the
    per-iteration cost/lambda/gradient trajectories are included
    (entries beyond `iterations` are NaN)."""

    iterations: jnp.ndarray
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    final_grad_norm: jnp.ndarray
    final_lambda: jnp.ndarray
    cost_history: jnp.ndarray | None = None  # [max_iters]
    lambda_history: jnp.ndarray | None = None  # [max_iters]
    grad_norm_history: jnp.ndarray | None = None  # [max_iters]
    step_accepted: jnp.ndarray | None = None  # [max_iters] bool


class _Carry(NamedTuple):
    state: object
    lam: jnp.ndarray
    cost: jnp.ndarray
    grad_norm: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    history: tuple
    cost_buf: jnp.ndarray  # [window] recent accepted costs (nonmonotonic ref)
    best_state: object
    best_cost: jnp.ndarray


def lm_solve(
    state0,
    config: SolveConfig,
    cost_fn: Callable,  # state -> scalar cost
    step_fn: Callable,  # (state, lam) -> (dx, grad_norm, pred_decrease)
    retract_fn: Callable,  # (state, dx) -> state
    record_history: bool = False,
):
    """Run LM. `step_fn` solves the damped system and returns the step dx,
    the max-norm of the gradient, and the scalar predicted cost decrease
    ``-(g . dx + 0.5 dx . H dx)`` of the undamped model (computing the
    scalar directly is much cheaper than materializing H dx)."""
    record_history = record_history or config.record_history
    cost0 = cost_fn(state0)
    dtype = cost0.dtype

    def cond(c: _Carry):
        return (~c.done) & (c.it < config.max_iters)

    def body(c: _Carry):
        dx, grad_norm, pred_decrease = step_fn(c.state, c.lam)
        dx_ok = jnp.all(jnp.isfinite(dx))
        dx = jnp.where(dx_ok, dx, jnp.zeros_like(dx))

        new_state = retract_fn(c.state, dx)
        new_cost = cost_fn(new_state)

        actual_decrease = c.cost - new_cost
        rho = actual_decrease / jnp.maximum(pred_decrease, 1e-30)

        if config.nonmonotonic:
            accept_ref = jnp.max(c.cost_buf)
        else:
            accept_ref = c.cost
        accept = jnp.isfinite(new_cost) & (new_cost < accept_ref)
        lam_down = c.lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_up = c.lam * 4.0
        lam = jnp.where(
            accept,
            jnp.maximum(lam_down, config.min_lambda),
            jnp.minimum(lam_up, config.max_lambda),
        )
        state = jax.tree.map(
            lambda new, old: jnp.where(accept, new, old), new_state, c.state
        )
        cost = jnp.where(accept, new_cost, c.cost)
        # ftol fires only on a REAL (non-negative) decrease: an accepted
        # nonmonotonic uphill step has actual_decrease < 0 and must not
        # terminate the solve (Ceres tests |cost_change|).
        small_decrease = accept & (actual_decrease >= 0.0) & (
            actual_decrease <= config.ftol * jnp.maximum(c.cost, 1e-30)
        )
        # A failed linear solve (non-finite dx, zeroed above) is NOT
        # convergence — the rejected step raises lambda and we retry.
        done = (
            small_decrease
            | (grad_norm <= config.gtol)
            | (dx_ok & (jnp.max(jnp.abs(dx)) <= config.xtol))
            | (c.lam >= config.max_lambda)
        )
        if config.run_full_budget:
            done = jnp.asarray(False)
        history = c.history
        if record_history:
            ch, lh, gh, ah = history
            history = (
                ch.at[c.it].set(cost),
                lh.at[c.it].set(lam),
                gh.at[c.it].set(grad_norm),
                ah.at[c.it].set(accept),
            )
        cost_buf = jnp.where(
            accept,
            c.cost_buf.at[c.it % config.nonmonotonic_window].set(new_cost),
            c.cost_buf,
        )
        better = accept & (new_cost < c.best_cost)
        best_state = jax.tree.map(
            lambda new, old: jnp.where(better, new, old), new_state, c.best_state
        )
        best_cost = jnp.where(better, new_cost, c.best_cost)
        return _Carry(
            state, lam, cost, grad_norm, c.it + 1, done, history,
            cost_buf, best_state, best_cost,
        )

    if record_history:
        nan = jnp.full((config.max_iters,), jnp.nan, dtype)
        history0 = (nan, nan, nan, jnp.zeros((config.max_iters,), bool))
    else:
        history0 = ()
    init = _Carry(
        state=state0,
        lam=jnp.asarray(config.init_lambda, dtype),
        cost=cost0,
        grad_norm=jnp.asarray(jnp.inf, dtype),
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        history=history0,
        cost_buf=jnp.full((config.nonmonotonic_window,), cost0, dtype),
        best_state=state0,
        best_cost=cost0,
    )
    out = jax.lax.while_loop(cond, body, init)
    hist = out.history if record_history else (None, None, None, None)
    # With nonmonotonic steps the final iterate can sit above the best
    # accepted one; return the best (Ceres returns the best minimizer).
    final_state = out.best_state if config.nonmonotonic else out.state
    final_cost = out.best_cost if config.nonmonotonic else out.cost
    return final_state, SolveSummary(
        iterations=out.it,
        initial_cost=cost0,
        final_cost=final_cost,
        final_grad_norm=out.grad_norm,
        final_lambda=out.lam,
        cost_history=hist[0],
        lambda_history=hist[1],
        grad_norm_history=hist[2],
        step_accepted=hist[3],
    )


def dogleg_solve(
    state0,
    config: SolveConfig,
    cost_fn: Callable,  # state -> scalar cost
    normal_eq_fn: Callable,  # state -> (H, g) dense
    retract_fn: Callable,  # (state, dx) -> state
    init_radius: float = 1e4,
):
    """Classic (Powell) dogleg trust-region minimizer over a dense system.

    Counterpart of the reference's ceres::DOGLEG strategy
    (tests/dataset_vo_sun.cpp:142-143): blend the steepest-descent Cauchy
    step and the Gauss-Newton step within a trust radius, growing/shrinking
    the radius by the gain ratio. Converges to the same optima as LM; kept
    for parity and for problems where LM damping stalls.
    """
    cost0 = cost_fn(state0)
    dtype = cost0.dtype

    class Carry(NamedTuple):
        state: object
        radius: jnp.ndarray
        cost: jnp.ndarray
        grad_norm: jnp.ndarray
        it: jnp.ndarray
        done: jnp.ndarray

    def cond(c):
        return (~c.done) & (c.it < config.max_iters)

    def body(c):
        H, g = normal_eq_fn(c.state)
        grad_norm = jnp.max(jnp.abs(g))
        # Gauss-Newton step (tiny Tikhonov for safety)
        A = H + 1e-10 * jnp.eye(H.shape[0], dtype=dtype)
        L, low = jax.scipy.linalg.cho_factor(A, lower=True)
        dx_gn = jax.scipy.linalg.cho_solve((L, low), -g)
        dx_gn = jnp.where(jnp.all(jnp.isfinite(dx_gn)), dx_gn, -g)
        # Cauchy (steepest descent to the model minimum along -g)
        gHg = g @ (H @ g)
        alpha = (g @ g) / jnp.maximum(gHg, 1e-30)
        dx_sd = -alpha * g

        n_gn = jnp.linalg.norm(dx_gn)
        n_sd = jnp.linalg.norm(dx_sd)

        # dogleg blend
        def blend():
            d = dx_gn - dx_sd
            a = d @ d
            b = 2.0 * (dx_sd @ d)
            cc = dx_sd @ dx_sd - c.radius**2
            disc = jnp.sqrt(jnp.maximum(b * b - 4 * a * cc, 0.0))
            beta = (-b + disc) / jnp.maximum(2 * a, 1e-30)
            return dx_sd + jnp.clip(beta, 0.0, 1.0) * d

        dx = jnp.where(
            n_gn <= c.radius,
            dx_gn,
            jnp.where(
                n_sd >= c.radius,
                dx_sd * (c.radius / jnp.maximum(n_sd, 1e-30)),
                blend(),
            ),
        )

        new_state = retract_fn(c.state, dx)
        new_cost = cost_fn(new_state)
        pred = -(g @ dx + 0.5 * dx @ (H @ dx))
        actual = c.cost - new_cost
        rho = actual / jnp.maximum(pred, 1e-30)

        accept = jnp.isfinite(new_cost) & (actual > 0.0)
        radius = jnp.where(
            rho > 0.75,
            jnp.maximum(c.radius, 3.0 * jnp.linalg.norm(dx)),
            jnp.where(rho < 0.25, c.radius * 0.5, c.radius),
        )
        radius = jnp.where(accept, radius, c.radius * 0.25)
        radius = jnp.clip(radius, 1e-12, 1e12)

        state = jax.tree.map(
            lambda new, old: jnp.where(accept, new, old), new_state, c.state
        )
        cost = jnp.where(accept, new_cost, c.cost)
        small_decrease = accept & (actual >= 0.0) & (
            actual <= config.ftol * jnp.maximum(c.cost, 1e-30))
        done = (
            small_decrease
            | (grad_norm <= config.gtol)
            | (radius <= 1e-11)
        )
        return Carry(state, radius, cost, grad_norm, c.it + 1, done)

    init = Carry(
        state=state0,
        radius=jnp.asarray(init_radius, dtype),
        cost=cost0,
        grad_norm=jnp.asarray(jnp.inf, dtype),
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out.state, SolveSummary(
        iterations=out.it,
        initial_cost=cost0,
        final_cost=out.cost,
        final_grad_norm=out.grad_norm,
        final_lambda=out.radius,
    )


def dense_cholesky_step(normal_eq_fn: Callable):
    """Standard damped dense step: (H + lam diag(H)) dx = -g."""

    def step(state, lam):
        H, g = normal_eq_fn(state)
        diag = jnp.clip(jnp.diagonal(H), 1e-12, 1e32)
        A = H + lam * jnp.diag(diag)
        L, low = jax.scipy.linalg.cho_factor(A, lower=True)
        dx = jax.scipy.linalg.cho_solve((L, low), -g)
        pred = -(g @ dx + 0.5 * dx @ (H @ dx))
        return dx, jnp.max(jnp.abs(g)), pred

    return step
