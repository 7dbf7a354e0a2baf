"""Tracing, profiling, and solver-report utilities.

The reference's only perf signal is ceres::Solver::Summary::BriefReport
printed per window (tests/dataset_vo_sun.cpp:152; SURVEY.md §5.1). Here:
per-iteration LM telemetry is recorded on device by the solver core
(`lm_solve(record_history=True)`), formatted by `brief_report` /
`full_report`, and whole-pipeline device traces are captured with
`jax.profiler` via the `trace` context manager (viewable in TensorBoard /
Perfetto).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


def brief_report(summary) -> str:
    """One-line report in the spirit of ceres BriefReport."""
    return (
        f"iterations: {int(summary.iterations)}, "
        f"initial cost: {float(summary.initial_cost):.6e}, "
        f"final cost: {float(summary.final_cost):.6e}, "
        f"grad max-norm: {float(summary.final_grad_norm):.3e}, "
        f"lambda: {float(summary.final_lambda):.3e}"
    )


def full_report(summary) -> str:
    """Multi-line per-iteration report (needs record_history=True)."""
    lines = [brief_report(summary)]
    if summary.cost_history is not None:
        ch = np.asarray(summary.cost_history)
        lh = np.asarray(summary.lambda_history)
        gh = np.asarray(summary.grad_norm_history)
        ah = np.asarray(summary.step_accepted)
        n = int(summary.iterations)
        lines.append(" it |        cost |    lambda | grad max | accepted")
        for i in range(n):
            lines.append(
                f"{i:>3} | {ch[i]:>11.5e} | {lh[i]:>9.3e} | {gh[i]:>8.2e} | "
                f"{'yes' if ah[i] else 'no'}"
            )
    return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ceres_slam_tpu_trace"):
    """Capture a jax.profiler device trace around a code block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Wall-clock section timer that forces device sync via value fetch
    (block_until_ready is unreliable under the axon relay)."""

    def __init__(self):
        self.sections = {}

    @contextlib.contextmanager
    def section(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                float(np.asarray(sync_value).ravel()[0])
            self.sections[name] = self.sections.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def report(self) -> str:
        total = sum(self.sections.values())
        lines = [f"total: {total:.3f}s"]
        for k, v in sorted(self.sections.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {k}: {v:.3f}s ({100 * v / max(total, 1e-12):.1f}%)")
        return "\n".join(lines)
