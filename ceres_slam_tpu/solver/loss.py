"""Robust-loss IRLS weights.

Replacement for ceres::HuberLoss / ceres::CauchyLoss
(used at tests/dataset_vo_sun.cpp:91-101). Ceres applies the loss
rho(s) to the squared norm s = |r|^2 of each residual block; the standard
IRLS linearization rescales the whitened residual and Jacobian by
sqrt(rho'(s)).
"""

from __future__ import annotations

import jax.numpy as jnp


def huber_weight(sq_norm: jnp.ndarray, a: float) -> jnp.ndarray:
    """sqrt(rho'(s)) for Huber: rho(s) = s if s <= a^2 else 2a sqrt(s) - a^2."""
    a2 = a * a
    safe = jnp.maximum(sq_norm, a2)
    return jnp.where(sq_norm <= a2, 1.0, jnp.sqrt(a / jnp.sqrt(safe)))


def huber_rho(sq_norm: jnp.ndarray, a: float) -> jnp.ndarray:
    a2 = a * a
    return jnp.where(sq_norm <= a2, sq_norm, 2.0 * a * jnp.sqrt(jnp.maximum(sq_norm, a2)) - a2)


def cauchy_weight(sq_norm: jnp.ndarray, a: float) -> jnp.ndarray:
    """sqrt(rho'(s)) for Cauchy: rho(s) = a^2 log(1 + s/a^2)."""
    return 1.0 / jnp.sqrt(1.0 + sq_norm / (a * a))


def cauchy_rho(sq_norm: jnp.ndarray, a: float) -> jnp.ndarray:
    a2 = a * a
    return a2 * jnp.log1p(sq_norm / a2)
