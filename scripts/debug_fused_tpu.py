"""Compare the fused Pallas window factor pass against the pure-XLA block
builder on the live backend, at bench.py's scale. Diagnoses the
compiled-kernel divergence seen in bench_compare (fused final cost 1.9e14
vs XLA 2.5e4 on TPU while interpret-mode tests pass)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from ceres_slam_tpu.solver import dense, lm, window


def rel(a, b, name):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = np.maximum(np.abs(b).max(), 1e-30)
    err = np.abs(a - b).max() / scale
    print(f"{name:12s} max_rel_err={err:.3e} ref_scale={scale:.3e}")
    return err


def main():
    problem, state = bench.build(jnp.float32)
    layout = window.build_window_layout(problem, bench.K, bench.J)
    interpret = jax.devices()[0].platform != "tpu"
    print("platform:", jax.devices()[0].platform, "interpret:", interpret)

    bx = jax.jit(window._xla_blocks)(layout, state)
    bf = jax.jit(window._fused_blocks, static_argnames=("interpret",))(
        layout, state, interpret
    )
    for name in ("Hpp", "Hll", "U_jo", "gp", "gl", "stereo_cost"):
        rel(getattr(bf, name), getattr(bx, name), name)

    # one LM step from each block set
    cfg = lm.SolveConfig(max_iters=1, ftol=0.0, gtol=0.0)
    s1, sum1 = window._solve_jit(layout, problem, state, cfg)
    s2, sum2 = window._solve_jit(layout, problem, state, cfg, True, interpret)
    print("xla   1-step cost:", float(sum1.final_cost), "init", float(sum1.initial_cost))
    print("fused 1-step cost:", float(sum2.final_cost), "init", float(sum2.initial_cost))


if __name__ == "__main__":
    main()
