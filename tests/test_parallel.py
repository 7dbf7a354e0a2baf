"""Distributed BA tests on an 8-device virtual CPU mesh.

Validates the observation-sharded Gauss-Newton assembly (psum-reduced
shard contributions) against the single-device dense path — exact
numerical agreement is required since the sum over observation shards is
associative in f64 up to reduction ordering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceres_slam_tpu.parallel import sharded_ba
from ceres_slam_tpu.solver import dense
from tests.test_solver import make_problem, perturb


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    return sharded_ba.make_mesh()


class TestShardedNormalEquations:
    def test_matches_dense(self, mesh):
        problem, gt, key = make_problem(jax.random.PRNGKey(0), K=4, J=50, noise_px=0.4)
        init = perturb(gt, key)
        H_ref, g_ref = dense.ba_normal_equations(problem, init)

        sharded = sharded_ba.shard_problem(problem, mesh)
        normal_eq = sharded_ba.make_sharded_normal_eq(mesh)
        H, g = jax.jit(normal_eq)(sharded, init)
        assert np.allclose(H, H_ref, atol=1e-9)
        assert np.allclose(g, g_ref, atol=1e-9)

    def test_sharded_solve_matches_dense(self, mesh):
        problem, gt, key = make_problem(jax.random.PRNGKey(1), K=3, J=40, noise_px=0.3)
        init = perturb(gt, key)
        sol_ref, sum_ref = dense.solve_ba(problem, init, dense.SolveConfig(max_iters=25))
        sol, summary = sharded_ba.solve_ba_sharded(
            problem, init, mesh, dense.SolveConfig(max_iters=25)
        )
        assert np.allclose(float(summary.final_cost), float(sum_ref.final_cost), rtol=1e-6)
        assert np.allclose(sol.poses, sol_ref.poses, atol=1e-7)

    def test_gn_step_runs_sharded(self, mesh):
        problem, gt, key = make_problem(jax.random.PRNGKey(2), K=3, J=30, noise_px=0.2)
        init = perturb(gt, key)
        problem_s = sharded_ba.shard_problem(problem, mesh)
        out = sharded_ba.gn_step_sharded(problem_s, init, mesh)
        assert np.all(np.isfinite(np.asarray(out.poses)))
        # a GN step from a perturbed state must reduce the cost
        c0 = float(dense.ba_cost(problem, init))
        c1 = float(dense.ba_cost(problem, out))
        assert c1 < c0


class TestShardedPCG:
    def test_sharded_pcg_matches_dense(self, mesh):
        from ceres_slam_tpu.parallel import sharded_pcg

        problem, gt, key = make_problem(jax.random.PRNGKey(5), K=4, J=50, noise_px=0.4)
        init = perturb(gt, key)
        sol_ref, sum_ref = dense.solve_ba(problem, init, dense.SolveConfig(max_iters=25))
        sol, summary = sharded_pcg.solve_ba_pcg_sharded(
            problem, init, mesh, dense.SolveConfig(max_iters=25), max_cg_iters=200,
            cg_tol=1e-10,
        )
        assert np.allclose(float(summary.final_cost), float(sum_ref.final_cost), rtol=1e-5)
        assert np.allclose(sol.poses, sol_ref.poses, atol=1e-5)


class TestShardedBandedPCG:
    """Distributed banded preconditioner (VERDICT r3 item 8): the
    structure-exploiting cyclic-reduction solve survives sharding — V is
    built by a per-shard scatter + one psum, the small factorization is
    replicated — and agrees with both the dense reference and the
    single-chip banded path."""

    def test_sharded_banded_matches_dense_and_single_chip(self, mesh):
        import __graft_entry__ as ge
        from ceres_slam_tpu.parallel import sharded_pcg
        from ceres_slam_tpu.solver import pcg

        problem, state0 = ge._build_example(K=16, J=64, n_obs=256,
                                            dtype=jnp.float64, seed=3)
        rng = np.random.default_rng(11)
        K, J = 16, 64
        dx = np.concatenate([rng.normal(0, 0.01, 6 * K),
                             rng.normal(0, 0.05, 3 * J)])
        init = dense._retract_state(problem, state0, jnp.asarray(dx))
        cfg = dense.SolveConfig(max_iters=25)
        sol_ref, sum_ref = pcg.solve_ba_pcg(problem, init, cfg,
                                            precond="banded")
        sol, summary = sharded_pcg.solve_ba_pcg_sharded(
            problem, init, mesh, cfg, max_cg_iters=200, cg_tol=1e-10,
            precond="banded")
        assert np.allclose(float(summary.final_cost),
                           float(sum_ref.final_cost), rtol=1e-6)
        assert np.allclose(sol.poses, sol_ref.poses, atol=1e-6)

    def test_sharded_banded_obs_not_divisible_by_mesh(self, mesh):
        """slot_idx must be padded to the same multiple-of-mesh-size
        length shard_problem pads the observations to (regression: 132
        obs on an 8-device mesh crashed at device_put)."""
        import __graft_entry__ as ge
        from ceres_slam_tpu.parallel import sharded_pcg
        from ceres_slam_tpu.solver import pcg

        problem, state0 = ge._build_example(K=8, J=66, n_obs=132,
                                            dtype=jnp.float64, seed=5)
        rng = np.random.default_rng(9)
        dx = np.concatenate([rng.normal(0, 0.01, 6 * 8),
                             rng.normal(0, 0.05, 3 * 66)])
        init = dense._retract_state(problem, state0, jnp.asarray(dx))
        cfg = dense.SolveConfig(max_iters=15)
        sol_ref, sum_ref = pcg.solve_ba_pcg(problem, init, cfg,
                                            precond="banded")
        sol, summary = sharded_pcg.solve_ba_pcg_sharded(
            problem, init, mesh, cfg, max_cg_iters=200, cg_tol=1e-10,
            precond="banded")
        assert np.allclose(float(summary.final_cost),
                           float(sum_ref.final_cost), rtol=1e-6)
        assert np.allclose(sol.poses, sol_ref.poses, atol=1e-6)

    def test_sharded_banded_with_masked_padding(self, mesh):
        """Padding obs (valid=False) must not corrupt the distributed
        structure analysis (slot_scatter_index routes them nowhere)."""
        import __graft_entry__ as ge
        from ceres_slam_tpu.parallel import sharded_pcg

        problem, state0 = ge._build_example(K=8, J=64, n_obs=320,
                                            dtype=jnp.float64, seed=4)
        st = problem.stereo
        valid = np.asarray(st.valid).copy()
        valid[-8:] = False  # mask the tail as padding
        problem = problem._replace(stereo=st._replace(
            valid=jnp.asarray(valid)))
        rng = np.random.default_rng(7)
        dx = np.concatenate([rng.normal(0, 0.01, 6 * 8),
                             rng.normal(0, 0.05, 3 * 64)])
        init = dense._retract_state(problem, state0, jnp.asarray(dx))
        cfg = dense.SolveConfig(max_iters=20)
        sol_ref, sum_ref = sharded_pcg.solve_ba_pcg_sharded(
            problem, init, mesh, cfg, max_cg_iters=200, cg_tol=1e-10,
            precond="jacobi")
        sol, summary = sharded_pcg.solve_ba_pcg_sharded(
            problem, init, mesh, cfg, max_cg_iters=200, cg_tol=1e-10,
            precond="banded")
        assert np.allclose(float(summary.final_cost),
                           float(sum_ref.final_cost), rtol=1e-6)
        assert np.allclose(sol.poses, sol_ref.poses, atol=1e-6)


class TestHybridMesh:
    """Hybrid [DCN, ICI] 2-D mesh (multihost.make_hybrid_mesh layout):
    observations shard jointly over both axes; assembly and solves must
    agree exactly with the single-device path."""

    @pytest.fixture(scope="class")
    def hmesh(self):
        from jax.sharding import Mesh

        devs = np.asarray(jax.devices())
        if devs.size < 4 or devs.size % 2:
            pytest.skip("needs >=4 (virtual) devices")
        return Mesh(devs.reshape(2, -1), ("dcn", "obs"))

    def test_normal_eq_matches_dense(self, hmesh):
        problem, gt, key = make_problem(jax.random.PRNGKey(3), K=4, J=50,
                                        noise_px=0.4)
        init = perturb(gt, key)
        H_ref, g_ref = dense.ba_normal_equations(problem, init)
        sharded = sharded_ba.shard_problem(problem, hmesh)
        H, g = jax.jit(sharded_ba.make_sharded_normal_eq(hmesh))(sharded, init)
        assert np.allclose(H, H_ref, atol=1e-9)
        assert np.allclose(g, g_ref, atol=1e-9)

    def test_hybrid_pcg_solve_matches_dense(self, hmesh):
        from ceres_slam_tpu.parallel import sharded_pcg

        problem, gt, key = make_problem(jax.random.PRNGKey(4), K=3, J=40,
                                        noise_px=0.3)
        init = perturb(gt, key)
        sol_ref, sum_ref = dense.solve_ba(problem, init,
                                          dense.SolveConfig(max_iters=20))
        sol, summary = sharded_pcg.solve_ba_pcg_sharded(
            problem, init, hmesh, dense.SolveConfig(max_iters=20),
            max_cg_iters=200, cg_tol=1e-12,
        )
        assert np.allclose(float(summary.final_cost),
                           float(sum_ref.final_cost), rtol=1e-6)
        assert np.allclose(sol.poses, sol_ref.poses, atol=1e-6)
