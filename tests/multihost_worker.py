"""Worker for the 2-process multi-host integration test
(tests/test_multihost.py). Each process owns 4 virtual CPU devices; the
pair forms an 8-device global mesh through `jax.distributed`.

Run: python tests/multihost_worker.py <port> <process_id> <num_processes>
Prints one line: ``OK <final_cost> <H_err>`` on success.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    os.environ[
        "JAX_PLATFORMS"
    ] = "cpu"  # and through jax.config: sitecustomize force-registers axon
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    from ceres_slam_tpu.parallel import multihost, sharded_ba
    from ceres_slam_tpu.solver import dense

    assert multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.local_device_count() == 4

    mesh = multihost.make_global_mesh()
    assert mesh.devices.size == 4 * nproc

    # identical problem on every process (deterministic seed)
    from tests.test_solver import make_problem, perturb

    problem, gt, key = make_problem(jax.random.PRNGKey(0), K=4, J=50, noise_px=0.4)
    init = perturb(gt, key)
    H_ref, g_ref = dense.ba_normal_equations(problem, init)

    sharded = multihost.shard_problem_global(problem, mesh)
    normal_eq = sharded_ba.make_sharded_normal_eq(mesh)
    H, g = jax.jit(normal_eq)(sharded, init)
    H_err = float(
        np.abs(np.asarray(H.addressable_data(0)) - np.asarray(H_ref)).max()
    )

    # hybrid [DCN, ICI] mesh (multihost.make_hybrid_mesh): observations
    # shard jointly over both axes; the assembled system must be identical
    hmesh = multihost.make_hybrid_mesh()
    assert hmesh.devices.shape == (nproc, 4), hmesh.devices.shape
    sharded_h = multihost.shard_problem_global(problem, hmesh)
    H_h, _ = jax.jit(sharded_ba.make_sharded_normal_eq(hmesh))(sharded_h, init)
    H_err_hybrid = float(
        np.abs(np.asarray(H_h.addressable_data(0)) - np.asarray(H_ref)).max()
    )

    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    sol, summary = sharded_ba.solve_ba_sharded(
        problem, init, mesh, dense.SolveConfig(max_iters=25),
        shard=lambda p: multihost.shard_problem_global(p, mesh),
        put_replicated=lambda x: multihost.put_global(x, rep),
    )
    cost = float(np.asarray(summary.final_cost.addressable_data(0)))
    print(f"OK {cost:.12e} {max(H_err, H_err_hybrid):.3e}", flush=True)


if __name__ == "__main__":
    main()
