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
        # ALWAYS keep the host CPU backend registered alongside the
        # accelerator: the scan-statics precompute pins its per-window
        # array work to the CPU backend (problems/scan_pipeline.py), and
        # without it that path silently degrades to one ~25 ms relay
        # round trip per op — measured 118 s/dataset vs 1.4 s (r4; the
        # sandbox exports JAX_PLATFORMS=axon, which used to strip "cpu").
        # The first entry stays the default (primary) backend.
        if "cpu" not in platform.split(","):
            platform = platform + ",cpu"
        jax.config.update("jax_platforms", platform)
    if x64:
        jax.config.update("jax_enable_x64", True)
    # TPU f32 matmuls default to ONE bf16 MXU pass (~8-bit mantissa).
    # That is fine for descriptor-matching scores (features.py opts back
    # in explicitly) but corrupts geometry: RANSAC reprojection scoring
    # through a bf16 R@p is off by whole pixels against a 4 px^2 inlier
    # threshold, making inlier sets BACKEND-DEPENDENT (42/199 triangle200
    # pairs differed TPU-vs-CPU, ATE 0.52 vs 0.31 — measured r4). Full
    # f32 (3-pass) everywhere geometry flows; the small-dim factor
    # contractions are nowhere near MXU-bound.
    jax.config.update("jax_default_matmul_precision", "float32")
    from ceres_slam_tpu.utils import hostcache

    hostcache.configure(jax.config, platform=platform)


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
    p.add_argument("--report", default="none",
                   choices=["none", "brief", "full"],
                   help="per-window solver report (ceres Brief/FullReport "
                        "equivalent; full records per-iteration telemetry)")
    return p


def solver_tolerance(dtype: str, num_windows: int = 0) -> float:
    """Precision- and chain-length-matched ftol/xtol for the
    sliding-window pipelines.

    f64 uses Ceres' default function_tolerance (1e-6 — the reference
    never overrides it, tests/dataset_vo_sun.cpp:136-143). f32 uses 1e-5
    on short chains: that is the same distance above f32 cost resolution,
    and tighter tolerances just grind iterations against rounding noise
    for the SAME trajectory (r5 diagnostic sweep, triangle200: 39.9 vs
    5.3 dogleg iters/window, ATE unchanged to 4 decimals). On LONG
    chains the calculus flips: each window's early stop leaves a small
    plateau error, and 1000+ chained windows accumulate it into tens of
    meters (kitti1100 r5: f32@1e-5 sun-aided ATE 23.9-55.7 m ACROSS RUNS
    vs f64 7.2; f32@1e-7 -> 6.5 m, beating f64, at ~6x the per-window
    iterations). 256 windows is the calibrated crossover: the 199-window
    sims match f64 to 4 decimals at 1e-5."""
    if dtype == "float64":
        return 1e-6
    return 1e-5 if num_windows <= 256 else 1e-7


def print_reports(summaries, mode: str, file=None) -> None:
    """Print per-window solver reports (reference prints BriefReport per
    window, tests/dataset_vo_sun.cpp:152)."""
    import sys

    from ceres_slam_tpu.utils import telemetry

    if mode == "none":
        return
    file = file or sys.stderr
    fmt = telemetry.full_report if mode == "full" else telemetry.brief_report
    for i, s in enumerate(summaries):
        print(f"[window {i}] {fmt(s)}", file=file)
