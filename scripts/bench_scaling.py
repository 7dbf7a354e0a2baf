"""Distributed BA scaling benchmark.

Measures sharded Gauss-Newton step throughput over a 1-D device mesh at
1/2/4/8 devices and reports scaling efficiency. On a real TPU pod slice
the psum rides ICI and this reports the north-star distributed-Schur
efficiency (BASELINE.md: >= 70% at N >= 2 hosts); without multi-chip
hardware it runs on XLA's virtual CPU devices, which validates the
collective mechanics but shares one host's cores (efficiency numbers are
then NOT meaningful hardware numbers — they are printed with backend
metadata so the context is explicit).

Usage: python scripts/bench_scaling.py [--devices 8] [--obs 65536]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--obs", type=int, default=65536)
    p.add_argument("--poses", type=int, default=64)
    p.add_argument("--points", type=int, default=2048)
    p.add_argument("--force-cpu-mesh", action="store_true", default=None)
    args = p.parse_args()

    if os.environ.get("_SCALING_REEXEC") != "1":
        # Re-exec with virtual CPU devices (decide BEFORE touching jax:
        # backend init is sticky). Real pod slices skip this by exporting
        # _SCALING_REEXEC=1 themselves.
        env = dict(
            os.environ,
            _SCALING_REEXEC="1",
            XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}",
        )
        os.execve(sys.executable, [sys.executable] + sys.argv, env)

    import jax

    # Backend init is sticky: choose before the first device query. Set
    # SCALING_REAL_HW=1 on an actual pod slice to use the TPU mesh.
    if os.environ.get("SCALING_REAL_HW") != "1":
        jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= args.devices, "not enough devices"

    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge
    from ceres_slam_tpu.parallel import sharded_ba
    from ceres_slam_tpu.solver import dense

    problem, state = ge._build_example(
        K=args.poses, J=args.points, n_obs=args.obs, dtype=jnp.float32, seed=3
    )

    results = {}
    n = 1
    while n <= args.devices:
        mesh = sharded_ba.make_mesh(n)
        problem_s = sharded_ba.shard_problem(problem, mesh)
        blocks_fn = sharded_ba.make_sharded_blocks(mesh)

        R = 20

        @jax.jit
        def run(problem, st):
            def body(i, acc):
                b = blocks_fn(problem, st)
                return acc + jnp.sum(b.gp) + jnp.sum(b.gl) + b.Hpp[0, 0, 0]

            return jax.lax.fori_loop(0, R, body, jnp.asarray(0.0, jnp.float32))

        float(run(problem_s, state))
        t0 = time.perf_counter()
        float(run(problem_s, state))
        dt = (time.perf_counter() - t0) / R
        results[n] = dt
        n *= 2

    base = results[1]
    report = {
        "metric": "sharded_gn_assembly_scaling",
        "backend": jax.devices()[0].platform,
        "virtual_cpu_mesh": jax.devices()[0].platform == "cpu",
        "problem": {"K": args.poses, "J": args.points, "n_obs": args.obs},
        "per_device_counts": {
            str(nn): {
                "ms_per_step": round(results[nn] * 1e3, 3),
                "speedup": round(base / results[nn], 3),
                "efficiency": round(base / results[nn] / nn, 3),
            }
            for nn in results
        },
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
