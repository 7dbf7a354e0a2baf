"""NaN-hygiene utility tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from ceres_slam_tpu.utils import debug


def test_assert_finite_passes_and_raises():
    debug.assert_finite({"a": jnp.ones(3)}, "state")
    with pytest.raises(FloatingPointError):
        debug.assert_finite({"a": jnp.array([1.0, jnp.nan])}, "state")


def test_debug_finite_passthrough():
    x = jnp.array([1.0, 2.0])
    y = debug.debug_finite(x, "x")
    assert np.allclose(x, y)
