"""Dense LM solver tests on synthetic bundle-adjustment problems."""

import jax
import jax.numpy as jnp
import numpy as np

from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import factors, lie
from ceres_slam_tpu.solver import dense

CAM = StereoCamera.create(500.0, 500.0, 320.0, 240.0, 0.5)


def make_problem(key, K=3, J=40, noise_px=0.3, n_pad=7, with_sun=False):
    ks = jax.random.split(key, 6)
    # Ground-truth trajectory: forward motion with slight rotation.
    xi = jnp.stack(
        [
            jnp.array([0.0, 0.0, -0.4, 0.02, 0.03, 0.01]) * k
            for k in range(K)
        ]
    )
    poses_gt = lie.se3_exp(xi)  # T_k_g (camera from global)
    # Landmarks in front of all cameras (global frame).
    pts_gt = jax.random.uniform(
        ks[0], (J, 3), minval=jnp.array([-4.0, -3.0, 4.0]), maxval=jnp.array([4.0, 3.0, 14.0])
    ).astype(jnp.float64)

    # All (pose, point) pairs observed.
    pose_idx = jnp.repeat(jnp.arange(K), J)
    point_idx = jnp.tile(jnp.arange(J), K)
    p_c = lie.se3_transform_point(poses_gt[pose_idx], pts_gt[point_idx])
    uvd = CAM.project(p_c)
    uvd = uvd + noise_px * jax.random.normal(ks[1], uvd.shape, dtype=jnp.float64)
    N = K * J
    stiff = jnp.broadcast_to(jnp.eye(3) / noise_px if noise_px > 0 else jnp.eye(3), (N, 3, 3))

    # Pad with garbage that must be ignored.
    uvd = jnp.concatenate([uvd, jnp.full((n_pad, 3), 1e6)])
    stiff = jnp.concatenate([stiff, jnp.broadcast_to(jnp.eye(3), (n_pad, 3, 3))])
    pose_idx = jnp.concatenate([pose_idx, jnp.zeros(n_pad, jnp.int32)])
    point_idx = jnp.concatenate([point_idx, jnp.zeros(n_pad, jnp.int32)])
    valid = jnp.concatenate([jnp.ones(N, bool), jnp.zeros(n_pad, bool)])

    stereo = dense.StereoObs(uvd, stiff, pose_idx, point_idx, valid)

    sun_dir_g = jnp.tile(jnp.array([0.0, -1.0, 0.0]), (K, 1))
    if with_sun:
        sun_dir_c = lie.se3_transform_vector(poses_gt, sun_dir_g)
        sun_valid = jnp.ones(K, bool)
    else:
        sun_dir_c = jnp.tile(jnp.array([0.0, -1.0, 0.0]), (K, 1))
        sun_valid = jnp.zeros(K, bool)
    sun = dense.SunObs(
        sun_dir_c, sun_dir_g, jnp.broadcast_to(10.0 * jnp.eye(2), (K, 2, 2)), sun_valid
    )

    prior = dense.PosePrior(
        pose_idx=jnp.asarray(0, jnp.int32),
        T_ref=poses_gt[0],
        stiffness=1e6 * jnp.eye(6),
        valid=jnp.asarray(with_sun),  # sun variant uses prior, plain uses gauge fix
    )

    fixed = jnp.zeros(K, bool).at[0].set(not with_sun)
    problem = dense.StereoBAProblem(
        camera=CAM,
        stereo=stereo,
        sun=sun,
        prior=prior,
        fixed_pose_mask=fixed,
        point_valid=jnp.ones(J, bool),
        sun_huber=jnp.asarray(0.0),
        az_err_thresh=jnp.asarray(1000.0),
        zen_err_thresh=jnp.asarray(1000.0),
    )
    return problem, dense.BAState(poses_gt, pts_gt), ks[5]


def perturb(state, key, pose_scale=0.05, pt_scale=0.3):
    k1, k2 = jax.random.split(key)
    K = state.poses.shape[0]
    dp = pose_scale * jax.random.normal(k1, (K, 6), dtype=jnp.float64)
    dp = dp.at[0].set(0.0)
    return dense.BAState(
        poses=lie.se3_retract(state.poses, dp),
        points=state.points + pt_scale * jax.random.normal(k2, state.points.shape, dtype=jnp.float64),
    )


class TestSolveBA:
    def test_converges_to_ground_truth_noiseless(self):
        problem, gt, key = make_problem(jax.random.PRNGKey(0), noise_px=0.0)
        init = perturb(gt, key)
        sol, summary = dense.solve_ba(problem, init, dense.SolveConfig(max_iters=50))
        assert float(summary.final_cost) < 1e-16
        # poses recover GT (gauge fixed at pose 0)
        err = jax.vmap(
            lambda a, b: lie.se3_log(lie.se3_compose(a, lie.se3_inverse(b)))
        )(sol.poses, gt.poses)
        assert float(jnp.max(jnp.abs(err))) < 1e-6
        assert float(jnp.max(jnp.abs(sol.points - gt.points))) < 1e-5

    def test_reduces_cost_with_noise(self):
        problem, gt, key = make_problem(jax.random.PRNGKey(1), noise_px=0.3)
        init = perturb(gt, key)
        c0 = dense.ba_cost(problem, init)
        sol, summary = dense.solve_ba(problem, init)
        assert float(summary.final_cost) < 0.2 * float(c0)
        # converged near GT despite noise
        err = jax.vmap(
            lambda a, b: lie.se3_log(lie.se3_compose(a, lie.se3_inverse(b)))
        )(sol.poses, gt.poses)
        assert float(jnp.max(jnp.abs(err))) < 0.02

    def test_padding_is_ignored(self):
        p1, gt, key = make_problem(jax.random.PRNGKey(2), noise_px=0.1, n_pad=0)
        p2, _, _ = make_problem(jax.random.PRNGKey(2), noise_px=0.1, n_pad=13)
        init = perturb(gt, key)
        s1, _ = dense.solve_ba(p1, init)
        s2, _ = dense.solve_ba(p2, init)
        assert np.allclose(s1.poses, s2.poses, atol=1e-10)

    def test_gauge_fixed_pose_does_not_move(self):
        problem, gt, key = make_problem(jax.random.PRNGKey(3), noise_px=0.5)
        init = perturb(gt, key)
        sol, _ = dense.solve_ba(problem, init)
        assert np.allclose(sol.poses[0], gt.poses[0], atol=0)

    def test_sun_factors_improve_orientation(self):
        # With heavy pose noise and exact sun observations, enabling sun
        # factors must reduce final rotational error vs the same problem
        # without them.
        problem_sun, gt, key = make_problem(jax.random.PRNGKey(4), noise_px=1.0, with_sun=True)
        init = perturb(gt, key, pose_scale=0.1)
        sol, summary = dense.solve_ba(problem_sun, init)
        assert np.isfinite(float(summary.final_cost))
        err = jax.vmap(
            lambda a, b: lie.se3_log(lie.se3_compose(a, lie.se3_inverse(b)))
        )(sol.poses, gt.poses)
        assert float(jnp.max(jnp.abs(err[:, 3:]))) < 0.05


class TestCovariance:
    def test_prior_only_covariance(self):
        # A pose constrained only by a prior: tangent covariance must equal
        # the prior covariance (stiffness = cov^{-1/2}).
        K, J = 1, 2
        cov_gt = jnp.diag(jnp.array([0.04, 0.09, 0.01, 0.0025, 0.0016, 0.0049]))
        stiffness = factors.inv_sqrt_psd(cov_gt)
        T = lie.se3_exp(jnp.array([0.3, -0.2, 0.5, 0.1, 0.05, -0.02]))
        stereo = dense.StereoObs(
            uvd=jnp.zeros((1, 3)),
            stiffness=jnp.broadcast_to(jnp.eye(3), (1, 3, 3)),
            pose_idx=jnp.zeros(1, jnp.int32),
            point_idx=jnp.zeros(1, jnp.int32),
            valid=jnp.zeros(1, bool),
        )
        sun = dense.SunObs(
            dir_c=jnp.zeros((K, 3)),
            dir_g=jnp.zeros((K, 3)),
            stiffness=jnp.broadcast_to(jnp.eye(2), (K, 2, 2)),
            valid=jnp.zeros(K, bool),
        )
        prior = dense.PosePrior(jnp.asarray(0, jnp.int32), T, stiffness, jnp.asarray(True))
        problem = dense.StereoBAProblem(
            camera=CAM,
            stereo=stereo,
            sun=sun,
            prior=prior,
            fixed_pose_mask=jnp.zeros(K, bool),
            point_valid=jnp.zeros(J, bool),
            sun_huber=jnp.asarray(0.0),
            az_err_thresh=jnp.asarray(1000.0),
            zen_err_thresh=jnp.asarray(1000.0),
        )
        state = dense.BAState(T[None], jnp.zeros((J, 3)))
        cov = dense.pose_tangent_covariance(problem, state, jnp.asarray(0))
        assert np.allclose(cov, cov_gt, atol=1e-9)


class TestSchur:
    def test_schur_step_matches_dense_solve(self):
        from ceres_slam_tpu.solver import schur
        import jax.scipy.linalg as jsl

        problem, gt, key = make_problem(jax.random.PRNGKey(8), K=4, J=60, noise_px=0.4)
        init = perturb(gt, key)
        lam = jnp.asarray(1e-3)

        H, g = dense.ba_normal_equations(problem, init)
        diag = jnp.clip(jnp.diagonal(H), 1e-12, 1e32)
        L, low = jsl.cho_factor(H + lam * jnp.diag(diag), lower=True)
        dx_ref = jsl.cho_solve((L, low), -g)

        blocks = dense.ba_block_normal_equations(problem, init)
        dx, grad_norm, pred = schur.schur_step(problem, blocks, lam)
        assert np.allclose(dx, dx_ref, atol=1e-8)
        assert np.allclose(float(grad_norm), float(jnp.max(jnp.abs(g))), atol=1e-10)
        pred_ref = -(g @ dx_ref + 0.5 * dx_ref @ (H @ dx_ref))
        assert np.allclose(float(pred), float(pred_ref), rtol=1e-8)

    def test_schur_lm_converges_like_dense(self):
        from ceres_slam_tpu.solver import schur

        problem, gt, key = make_problem(jax.random.PRNGKey(9), noise_px=0.3)
        init = perturb(gt, key)
        sol_d, sum_d = dense.solve_ba(problem, init)
        sol_s, sum_s = schur.solve_ba_schur(problem, init)
        assert np.allclose(float(sum_s.final_cost), float(sum_d.final_cost), rtol=1e-6)
        assert np.allclose(sol_s.poses, sol_d.poses, atol=1e-6)

    def test_schur_with_sun_and_prior(self):
        from ceres_slam_tpu.solver import schur

        problem, gt, key = make_problem(jax.random.PRNGKey(10), noise_px=0.5, with_sun=True)
        init = perturb(gt, key)
        sol_d, sum_d = dense.solve_ba(problem, init)
        sol_s, sum_s = schur.solve_ba_schur(problem, init)
        assert np.allclose(float(sum_s.final_cost), float(sum_d.final_cost), rtol=1e-5)


class TestPCG:
    def test_pcg_step_matches_dense_solve(self):
        import jax.scipy.linalg as jsl

        from ceres_slam_tpu.solver import pcg

        problem, gt, key = make_problem(jax.random.PRNGKey(12), K=4, J=60, noise_px=0.4)
        init = perturb(gt, key)
        lam = jnp.asarray(1e-3)

        H, g = dense.ba_normal_equations(problem, init)
        diag = jnp.clip(jnp.diagonal(H), 1e-12, 1e32)
        L, low = jsl.cho_factor(H + lam * jnp.diag(diag), lower=True)
        dx_ref = jsl.cho_solve((L, low), -g)

        dx, grad_norm, pred = pcg.pcg_step(problem, init, lam, max_cg_iters=200, cg_tol=1e-12)
        assert np.allclose(dx, dx_ref, atol=1e-7)
        pred_ref = -(g @ dx_ref + 0.5 * dx_ref @ (H @ dx_ref))
        assert np.allclose(float(pred), float(pred_ref), rtol=1e-6)

    def test_pcg_lm_converges_like_dense(self):
        from ceres_slam_tpu.solver import pcg

        problem, gt, key = make_problem(jax.random.PRNGKey(13), noise_px=0.3, with_sun=True)
        init = perturb(gt, key)
        sol_d, sum_d = dense.solve_ba(problem, init)
        sol_p, sum_p = pcg.solve_ba_pcg(problem, init)
        assert np.allclose(float(sum_p.final_cost), float(sum_d.final_cost), rtol=1e-5)
        assert np.allclose(sol_p.poses, sol_d.poses, atol=1e-5)


class TestDogleg:
    def test_dogleg_converges_like_lm(self):
        problem, gt, key = make_problem(jax.random.PRNGKey(15), noise_px=0.3)
        init = perturb(gt, key)
        sol_lm, sum_lm = dense.solve_ba(problem, init)
        sol_dl, sum_dl = dense.solve_ba(
            problem, init, dense.SolveConfig(max_iters=100), strategy="dogleg"
        )
        assert np.allclose(
            float(sum_dl.final_cost), float(sum_lm.final_cost), rtol=1e-5
        )
        assert np.allclose(sol_dl.poses, sol_lm.poses, atol=1e-5)


class TestPCGTables:
    def test_gather_matvec_matches_segment_matvec(self):
        from ceres_slam_tpu.solver import pcg

        problem, gt, key = make_problem(jax.random.PRNGKey(17), K=5, J=70, noise_px=0.4)
        init = perturb(gt, key)
        lam = jnp.asarray(1e-3)
        b = pcg.build_obs_blocks(problem, init, lam)
        t = pcg.build_obs_tables(
            problem.stereo.pose_idx, problem.stereo.point_idx, 5, 70
        )
        v = jax.random.normal(jax.random.PRNGKey(0), (5, 6), dtype=jnp.float64)
        ref = pcg.schur_matvec(b, v)
        out = pcg.schur_matvec_gather(b, t, v)
        assert np.allclose(out, ref, atol=1e-10)

    def test_pcg_step_with_tables_matches(self):
        from ceres_slam_tpu.solver import pcg

        problem, gt, key = make_problem(jax.random.PRNGKey(18), K=4, J=50, noise_px=0.3)
        init = perturb(gt, key)
        lam = jnp.asarray(1e-3)
        t = pcg.build_obs_tables(
            problem.stereo.pose_idx, problem.stereo.point_idx, 4, 50
        )
        dx_ref, _, _ = pcg.pcg_step(problem, init, lam, max_cg_iters=200, cg_tol=1e-12)
        dx, _, _ = pcg.pcg_step(
            problem, init, lam, max_cg_iters=200, cg_tol=1e-12, tables=t
        )
        assert np.allclose(dx, dx_ref, atol=1e-8)


class TestNonmonotonic:
    def test_nonmonotonic_converges(self):
        problem, gt, key = make_problem(jax.random.PRNGKey(19), noise_px=0.3)
        init = perturb(gt, key)
        sol_m, sum_m = dense.solve_ba(problem, init)
        sol_n, sum_n = dense.solve_ba(
            problem, init,
            dense.SolveConfig(max_iters=60, nonmonotonic=True),
        )
        # must reach (at least) the same optimum; best iterate is returned
        assert float(sum_n.final_cost) <= float(sum_m.final_cost) * (1 + 1e-6)
        assert np.allclose(sol_n.poses, sol_m.poses, atol=1e-4)

    def test_uphill_accept_does_not_fire_ftol(self):
        """Regression (ADVICE r2 #1): an accepted uphill step under
        nonmonotonic acceptance has actual_decrease < 0; the ftol test
        `actual <= ftol*cost` is then trivially true and (pre-fix) killed
        the solve at the first ridge crossing. Scripted 1-D descent:
        cost 100 -> 10 -> 50 (uphill, accepted vs max(recent)=100) -> 1e-8.
        The solve must walk through the ridge and reach 1e-8, not stop at
        10."""
        from ceres_slam_tpu.solver import lm

        costs = jnp.asarray([100.0, 10.0, 50.0, 1e-8])

        def cost_fn(x):
            idx = jnp.clip(jnp.round(x[0]).astype(jnp.int32), 0, 3)
            return costs[idx]

        def step_fn(x, lam):
            one = jnp.ones((1,), costs.dtype)
            return one, jnp.asarray(1.0, costs.dtype), jnp.asarray(
                1.0, costs.dtype)

        cfg = lm.SolveConfig(max_iters=10, nonmonotonic=True,
                             ftol=1e-9, gtol=0.0)
        _, summary = lm.lm_solve(
            jnp.zeros((1,), costs.dtype), cfg, cost_fn,
            step_fn, lambda x, dx: x + dx,
        )
        assert float(summary.final_cost) <= 1e-6

    def test_window_uphill_accept_does_not_fire_ftol(self):
        """Same defect in window.blocks_lm_loop / dogleg.blocks_dogleg_loop:
        a far-from-minimum start with nonmonotonic=True must reach the
        monotone run's final cost (the pre-fix loops could stop orders of
        magnitude short once an uphill step was accepted)."""
        from ceres_slam_tpu.solver import window

        problem, gt, key = make_problem(jax.random.PRNGKey(23), K=8, J=80,
                                        noise_px=0.3)
        init = perturb(gt, key)
        cfg_m = dense.SolveConfig(max_iters=120, nonmonotonic=False)
        cfg_n = dense.SolveConfig(max_iters=120, nonmonotonic=True)
        for strategy in ("lm", "dogleg"):
            _, sm = window.solve_ba_window(problem, init, cfg_m,
                                           strategy=strategy)
            _, sn = window.solve_ba_window(problem, init, cfg_n,
                                           strategy=strategy)
            assert (float(sn.final_cost)
                    <= float(sm.final_cost) * (1 + 1e-6)), strategy


def test_fused_obs_blocks_match_xla():
    """Pallas fused PCG assembly (interpret mode) == XLA assembly."""
    import __graft_entry__ as ge
    from ceres_slam_tpu.solver import pcg as pcg_mod

    problem, state = ge._build_example(K=8, J=64, n_obs=512,
                                       dtype=jnp.float32, seed=3)
    K, J = 8, 64
    t = pcg_mod.build_obs_tables(problem.stereo.pose_idx,
                                 problem.stereo.point_idx, K, J)
    lam = jnp.asarray(1e-4, jnp.float32)
    b_x = pcg_mod.build_obs_blocks(problem, state, lam, tables=t, fused=False)
    b_f = pcg_mod.build_obs_blocks(problem, state, lam, tables=t, fused=True)
    for name in ("Hpp", "Cinv", "gp", "gl", "Hll", "Hpp_undamped", "U18"):
        a = np.asarray(getattr(b_x, name))
        c = np.asarray(getattr(b_f, name))[: a.shape[0]]
        # f32 kernel vs f32 XLA: tolerance scaled to block magnitude
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(a, c, rtol=1e-3, atol=1e-4 * scale,
                                   err_msg=name)
    # full pcg step agrees end-to-end: fused (Pallas, interpret mode on
    # CPU) assembly vs XLA assembly must produce the same step
    dx_x, g_x, p_x = pcg_mod.pcg_step(problem, state, lam, tables=t,
                                      fused=False)
    dx_f, g_f, p_f = pcg_mod.pcg_step(problem, state, lam, tables=t,
                                      fused=True)
    np.testing.assert_allclose(float(g_f), float(g_x), rtol=1e-4)
    np.testing.assert_allclose(float(p_f), float(p_x), rtol=1e-3)
    scale = max(1.0, float(np.abs(np.asarray(dx_x)).max()))
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_x),
                               rtol=1e-3, atol=1e-4 * scale)


def test_pcg_step_masked_invalid_points_finite():
    """Invalid observations (e.g. uninitialized landmarks at the origin,
    z <= 0 in camera frame) must contribute EXACT zeros to the PCG
    assembly — the unguarded factor eval produced NaN*0 = NaN and the
    full-batch KITTI run rejected every LM step (r5 regression)."""
    import bench
    from ceres_slam_tpu.solver import pcg as pcg_mod

    bench.K, bench.J, bench.N_OBS = 8, 32, 256
    problem, state = bench.build(jnp.float64)
    # poison: invalidate half the landmarks and put them AT THE ORIGIN
    # (z ~ 0 garbage in camera frame, like uninitialized map points)
    bad = np.zeros(32, bool)
    bad[::2] = True
    pts = np.array(state.points)
    pts[bad] = 0.0
    state = state._replace(points=jnp.asarray(pts))
    problem = problem._replace(point_valid=jnp.asarray(~bad))

    dx, gn, pred = pcg_mod.pcg_step(
        problem, state, jnp.asarray(1e-4), max_cg_iters=50)
    assert bool(jnp.all(jnp.isfinite(dx)))
    assert np.isfinite(float(gn)) and np.isfinite(float(pred))

    sol, summary = pcg_mod.solve_ba_pcg(
        problem, state, pcg_mod.lm.SolveConfig(max_iters=10,
                                               nonmonotonic=True))
    assert float(summary.final_cost) < float(summary.initial_cost)
