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

# No persistent compilation cache on CPU: cached CPU AOT entries have
# crashed the suite twice (cross-host ISA mismatch -> SIGSEGV; concurrent
# writer corruption -> SIGABRT). See utils/hostcache.py for the policy.
from ceres_slam_tpu.utils import hostcache

hostcache.configure(jax.config, platform="cpu")


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    With all 21 modules in one process, XLA:CPU's JIT state accumulates
    across hundreds of compiled programs and eventually segfaults inside
    backend_compile (reproducible at tests/test_pipeline.py's f32 window
    solve after ~100 prior tests; every bisected subset passes). Clearing
    the caches per module keeps the compiler healthy; within-module reuse
    — where the real compile cost is — is unaffected.
    """
    yield
    import jax

    jax.clear_caches()
