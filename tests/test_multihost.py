"""Multi-host distributed runtime integration test (SURVEY.md §5.8).

Spawns TWO separate processes, each owning 4 virtual CPU devices, joined
through `jax.distributed.initialize` into an 8-device global mesh; both
run the observation-sharded BA assembly + LM solve and must agree with
each other and with the in-process dense reference
(tests/multihost_worker.py prints the comparison)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_ba():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    import tempfile

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2"],
            cwd=repo,
            # Private per-worker compilation cache: concurrent writers on
            # the shared .jax_cache have segfaulted the pytest process.
            env=dict(env, JAX_COMPILATION_CACHE_DIR=tempfile.mkdtemp()),
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(out.strip().splitlines()[-1])

    costs, errs = [], []
    for line in outs:
        tag, cost, h_err = line.split()
        assert tag == "OK"
        costs.append(float(cost))
        errs.append(float(h_err))

    # both processes see the identical replicated solution
    assert costs[0] == costs[1]
    # sharded assembly == dense reference (f64 exact up to reduction order)
    assert max(errs) < 1e-6

    # and it matches the single-process in-memory reference
    import jax

    from ceres_slam_tpu.solver import dense
    from tests.test_solver import make_problem, perturb

    problem, gt, key = make_problem(jax.random.PRNGKey(0), K=4, J=50, noise_px=0.4)
    init = perturb(gt, key)
    _, sum_ref = dense.solve_ba(problem, init, dense.SolveConfig(max_iters=25))
    np.testing.assert_allclose(costs[0], float(sum_ref.final_cost), rtol=1e-9)
