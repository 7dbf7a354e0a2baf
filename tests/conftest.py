"""Test configuration: CPU backend with an 8-device virtual mesh + float64.

Tests run on CPU so that (a) float64 verification of the geometry/solver
numerics is exact, and (b) multi-chip sharding paths can be exercised via
XLA's virtual host devices without TPU hardware (the strategy the
reference repo lacks entirely — it has no test framework at all, see
SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The sandbox's sitecustomize force-registers the axon TPU backend; the env
# var alone does not win. jax.config does.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: each unique XLA compile costs ~1-2s in this
# environment; cache them across test runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
