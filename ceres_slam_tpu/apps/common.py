"""Shared app plumbing: platform selection and argument helpers.

The reference's drivers hand-roll argv parsing per executable
(tests/dataset_vo_sun.cpp:210-249 etc.); here each app uses argparse with
the same flag names and defaults, plus framework-level options (platform,
dtype) the reference had no equivalent for.
"""

from __future__ import annotations

import argparse
import os


def setup_jax(platform: str | None = None, x64: bool = True):
    """Select backend before first use. On TPU, x64 falls back to emulated
    f64 — accurate but slow; the hot paths accept f32 inputs instead."""
    import jax

    if platform is None:
        # Honor an explicit JAX_PLATFORMS env var: the sandbox's
        # sitecustomize force-registers the TPU backend regardless of the
        # env, so we must push it through jax.config.
        platform = os.environ.get("JAX_PLATFORMS") or None
    if platform:
        jax.config.update("jax_platforms", platform)
    if x64:
        jax.config.update("jax_enable_x64", True)
    cache = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument(
        "--platform",
        default=None,
        choices=[None, "cpu", "tpu", "axon"],
        help="JAX backend override (default: whatever is configured)",
    )
    # reference iteration budget: max_num_iterations = 1000
    # (tests/dataset_vo.cpp:69, dataset_vo_sun.cpp:140)
    p.add_argument("--max-iters", type=int, default=1000,
                   help="max trust-region iterations per solve")
    return p
