"""Phong-illumination BA tests: joint geometry + lighting estimation on a
synthetic shaded scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceres_slam_tpu.models import lighting
from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import lie
from ceres_slam_tpu.solver import lm, phong

CAM = StereoCamera.create(500.0, 500.0, 320.0, 240.0, 0.5)


def make_phong_problem(key, K=3, J=40, M=2, directional=False, noise=0.0):
    ks = jax.random.split(key, 8)
    xi = jnp.stack([jnp.array([0.0, 0.0, -0.3, 0.01, 0.03, 0.005]) * k for k in range(K)])
    poses = lie.se3_exp(xi)
    pts = jax.random.uniform(
        ks[0], (J, 3), minval=jnp.array([-4.0, -3.0, 6.0]), maxval=jnp.array([4.0, 3.0, 14.0])
    ).astype(jnp.float64)
    # normals roughly facing the cameras (-z global-ish)
    n = jax.random.normal(ks[1], (J, 3), dtype=jnp.float64) * 0.3 + jnp.array([0.0, 0.0, -1.0])
    normals = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    mat_of_vertex = jax.random.randint(ks[2], (J,), 0, M)
    phong_gt = jnp.tile(jnp.array([0.0, 0.25, 8.0]), (M, 1))
    tex_gt = jnp.linspace(0.4, 0.8, M)
    light_gt = (
        jnp.array([0.3, -0.5, -0.8]) / jnp.linalg.norm(jnp.array([0.3, -0.5, -0.8]))
        if directional
        else jnp.array([-5.0, -5.0, -3.0])
    )

    pose_idx = jnp.repeat(jnp.arange(K), J)
    vertex_idx = jnp.tile(jnp.arange(J), K)
    material_idx = mat_of_vertex[vertex_idx]
    N = K * J

    T = poses[pose_idx]
    p_c = lie.se3_transform_point(T, pts[vertex_idx])
    uvd = CAM.project(p_c)
    n_c = lie.se3_transform_vector(T, normals[vertex_idx])
    # shade in the camera frame exactly as the factor predicts
    if directional:
        l_c = lie.se3_transform_vector(T, jnp.broadcast_to(light_gt, (N, 3)))
        I = lighting.directional_light_shade(
            p_c, n_c, phong_gt[material_idx], tex_gt[material_idx], l_c, jnp.zeros(3)
        )
    else:
        l_c = lie.se3_transform_point(T, jnp.broadcast_to(light_gt, (N, 3)))
        I = lighting.point_light_shade(
            p_c, n_c, phong_gt[material_idx], tex_gt[material_idx], l_c, jnp.zeros(3)
        )

    if noise > 0:
        kk = jax.random.split(ks[3], 3)
        uvd = uvd + noise * jax.random.normal(kk[0], uvd.shape, dtype=jnp.float64)
        I = I + 0.01 * jax.random.normal(kk[1], I.shape, dtype=jnp.float64)
        n_c = n_c + 0.01 * jax.random.normal(kk[2], n_c.shape, dtype=jnp.float64)

    obs = phong.PhongObs(
        uvd=uvd,
        int_obs=I,
        normal_obs=n_c,
        pose_idx=pose_idx.astype(jnp.int32),
        vertex_idx=vertex_idx.astype(jnp.int32),
        material_idx=material_idx.astype(jnp.int32),
        valid=jnp.ones(N, bool),
    )
    problem = phong.PhongBAProblem(
        camera=CAM,
        obs=obs,
        stereo_stiffness=jnp.eye(3) / 0.5,
        normal_stiffness=jnp.eye(3) / 0.1,
        int_stiffness=jnp.asarray(1.0 / 0.1),
        fixed_pose_mask=jnp.zeros(K, bool).at[0].set(True),
        vertex_valid=jnp.ones(J, bool),
    )
    gt = phong.PhongState(poses, pts, normals, phong_gt, tex_gt, light_gt)
    return problem, gt


def perturb(gt, key, directional):
    ks = jax.random.split(key, 6)
    K = gt.poses.shape[0]
    dp = 0.02 * jax.random.normal(ks[0], (K, 6), dtype=jnp.float64)
    dp = dp.at[0].set(0.0)
    n = gt.normals + 0.1 * jax.random.normal(ks[2], gt.normals.shape, dtype=jnp.float64)
    light = gt.light + (0.1 if directional else 1.0) * jax.random.normal(
        ks[3], (3,), dtype=jnp.float64
    )
    if directional:
        light = light / jnp.linalg.norm(light)
    return phong.PhongState(
        poses=lie.se3_retract(gt.poses, dp),
        points=gt.points + 0.1 * jax.random.normal(ks[1], gt.points.shape, dtype=jnp.float64),
        normals=n / jnp.linalg.norm(n, axis=-1, keepdims=True),
        phong=jnp.tile(jnp.array([0.0, 0.0, 1.0]), (gt.phong.shape[0], 1)),
        textures=jnp.full(gt.textures.shape, 0.5),
        light=light,
    )


@pytest.mark.parametrize("directional", [False, True])
def test_phong_ba_recovers_scene(directional):
    problem, gt = make_phong_problem(
        jax.random.PRNGKey(0), directional=directional, noise=0.0
    )
    init = perturb(gt, jax.random.PRNGKey(1), directional)
    sol, summary = phong.solve_phong_ba(
        problem, init, lm.SolveConfig(max_iters=100), use_light=True,
        directional=directional,
    )
    c0 = float(phong.phong_cost(problem, init, True, directional))
    assert float(summary.final_cost) < 1e-3 * c0
    # geometry recovered
    assert float(jnp.max(jnp.abs(sol.points - gt.points))) < 0.02
    # texture (diffuse albedo) recovered per material
    assert float(jnp.max(jnp.abs(sol.textures - gt.textures))) < 0.05
    # normals recovered (up to small angle)
    dots = jnp.sum(sol.normals * gt.normals, axis=-1)
    assert float(jnp.min(dots)) > 0.99
    # bounds respected
    assert float(jnp.min(sol.phong[:, :2])) >= 0.0
    assert float(jnp.max(sol.phong[:, :2])) <= 1.0
    assert float(jnp.min(sol.phong[:, 2])) >= 1.0
    if directional:
        assert np.isclose(float(jnp.linalg.norm(sol.light)), 1.0, atol=1e-12)


def test_multistage_schedule_runs():
    problem, gt = make_phong_problem(jax.random.PRNGKey(2), noise=0.3)
    init = perturb(gt, jax.random.PRNGKey(3), False)
    sol, summaries = phong.solve_phong_staged(
        problem, init, lm.SolveConfig(max_iters=40), use_light=True,
        directional=False, multistage=True,
    )
    assert len(summaries) == 3
    # each stage must not increase the final joint cost
    cj = float(phong.phong_cost(problem, sol, True, False))
    ci = float(phong.phong_cost(problem, init, True, False))
    assert cj < ci


def test_geometry_only_matches_stereo_ba():
    # With use_light=False the Phong problem reduces to plain stereo BA:
    # lighting states must not move.
    problem, gt = make_phong_problem(jax.random.PRNGKey(4), noise=0.2)
    init = perturb(gt, jax.random.PRNGKey(5), False)
    sol, _ = phong.solve_phong_ba(
        problem, init, lm.SolveConfig(max_iters=40), use_light=False,
        directional=False,
    )
    assert np.allclose(sol.normals, init.normals)
    assert np.allclose(sol.textures, init.textures)
    assert np.allclose(sol.light, init.light)
    assert not np.allclose(sol.points, init.points)


def test_phong_dataset_pipeline(tmp_path):
    """Full dataset_ba_phong pipeline: sim -> reference CSV -> read ->
    initial guess (median-intensity textures, normal transport) -> staged
    solve -> emitted outputs."""
    from ceres_slam_tpu.problems.dataset_phong import DatasetProblemPhong
    from ceres_slam_tpu.utils import metrics, sim

    ds = sim.generate_phong(num_states=12, num_points=200, seed=7)
    track = str(tmp_path / "phong.csv")
    sim.write_phong_track_csv(ds, track)
    prob = DatasetProblemPhong.read_csv(track)
    assert prob.num_states == ds.num_states
    summaries = prob.solve_full(use_light=True, multistage=True)
    assert all(np.isfinite(float(s.final_cost)) for s in summaries)
    ate = metrics.ate_translation(prob.poses, ds.poses_gt)
    assert ate < 0.3, f"Phong BA ATE {ate}"
    assert np.max(np.abs(prob.textures - ds.textures_gt)) < 0.05
    prob.write_csv(track)
    import os
    for suffix in ("_poses.csv", "_map.csv", "_lights.csv"):
        assert os.path.exists(str(tmp_path / f"phong{suffix}"))


def test_phong_dataset_windowed(tmp_path):
    """Sliding-window Phong BA (--window N, tests/dataset_ba_phong.cpp:
    314-327): padded per-window problems share ONE compiled program and
    carry only the window's active vertex slots, not the global set."""
    from ceres_slam_tpu.problems.dataset_phong import DatasetProblemPhong
    from ceres_slam_tpu.utils import metrics, sim

    ds = sim.generate_phong(num_states=12, num_points=200, seed=7)
    track = str(tmp_path / "phong_w.csv")
    sim.write_phong_track_csv(ds, track)
    prob = DatasetProblemPhong.read_csv(track)
    n_obs_pad, n_vtx_pad = prob._window_budget(5)
    assert n_vtx_pad < prob.num_vertices  # bounded by window content
    summaries = prob.solve_full(window=5, use_light=True)
    assert all(np.isfinite(float(s.final_cost)) for s in summaries)
    ate = metrics.ate_translation(prob.poses, ds.poses_gt)
    assert ate < 0.3, f"windowed Phong BA ATE {ate}"


class TestPhongSchur:
    """Vertex-Schur elimination (solver/phong_schur.py) vs the dense path —
    the reference's SPARSE_NORMAL_CHOLESKY role (dataset_ba_phong.cpp:87)."""

    @pytest.mark.parametrize("directional", [False, True])
    @pytest.mark.parametrize("use_light", [True, False])
    def test_step_matches_dense(self, directional, use_light):
        from ceres_slam_tpu.solver import phong_schur

        problem, gt = make_phong_problem(
            jax.random.PRNGKey(6), directional=directional, noise=0.2
        )
        init = perturb(gt, jax.random.PRNGKey(7), directional)
        lam = jnp.asarray(1e-3, jnp.float64)

        normal_eq = lambda s: phong.phong_normal_equations(
            problem, s, use_light, directional, False
        )
        dx_d, gn_d, pred_d = lm.dense_cholesky_step(normal_eq)(init, lam)
        step = phong_schur.phong_schur_step(
            problem, use_light, directional, False
        )
        dx_s, gn_s, pred_s = step(init, lam)

        scale = float(jnp.max(jnp.abs(dx_d)))
        np.testing.assert_allclose(
            np.asarray(dx_s), np.asarray(dx_d), atol=1e-9 * scale
        )
        np.testing.assert_allclose(float(gn_s), float(gn_d), rtol=1e-9)
        np.testing.assert_allclose(float(pred_s), float(pred_d), rtol=1e-7)

    def test_step_matches_dense_frozen_geometry(self):
        from ceres_slam_tpu.solver import phong_schur

        problem, gt = make_phong_problem(jax.random.PRNGKey(8), noise=0.2)
        init = perturb(gt, jax.random.PRNGKey(9), False)
        lam = jnp.asarray(1e-2, jnp.float64)
        normal_eq = lambda s: phong.phong_normal_equations(
            problem, s, True, False, True
        )
        dx_d, _, _ = lm.dense_cholesky_step(normal_eq)(init, lam)
        dx_s, _, _ = phong_schur.phong_schur_step(problem, True, False, True)(
            init, lam
        )
        scale = max(float(jnp.max(jnp.abs(dx_d))), 1e-12)
        np.testing.assert_allclose(
            np.asarray(dx_s), np.asarray(dx_d), atol=1e-9 * scale
        )
        # geometry stays frozen through the schur path too
        K = init.poses.shape[0]
        J = init.points.shape[0]
        assert float(jnp.max(jnp.abs(dx_s[: 6 * K]))) == 0.0
        assert float(jnp.max(jnp.abs(dx_s[6 * K : 6 * K + 3 * J]))) == 0.0

    @pytest.mark.parametrize("directional", [False, True])
    def test_solve_reaches_dense_minimum(self, directional):
        from ceres_slam_tpu.solver import phong_schur

        problem, gt = make_phong_problem(
            jax.random.PRNGKey(10), directional=directional, noise=0.1
        )
        init = perturb(gt, jax.random.PRNGKey(11), directional)
        cfg = lm.SolveConfig(max_iters=80)
        sol_d, sum_d = phong.solve_phong_ba(
            problem, init, cfg, use_light=True, directional=directional
        )
        sol_s, sum_s = phong_schur.solve_phong_ba_schur(
            problem, init, cfg, use_light=True, directional=directional
        )
        np.testing.assert_allclose(
            float(sum_s.final_cost), float(sum_d.final_cost), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(sol_s.poses), np.asarray(sol_d.poses), atol=1e-5
        )

    def test_invalid_vertices_masked(self):
        from ceres_slam_tpu.solver import phong_schur

        problem, gt = make_phong_problem(jax.random.PRNGKey(12), noise=0.2)
        # invalidate some vertices (padding semantics)
        vv = problem.vertex_valid.at[-5:].set(False)
        problem = problem._replace(vertex_valid=vv)
        init = perturb(gt, jax.random.PRNGKey(13), False)
        lam = jnp.asarray(1e-3, jnp.float64)
        normal_eq = lambda s: phong.phong_normal_equations(
            problem, s, True, False, False
        )
        dx_d, _, _ = lm.dense_cholesky_step(normal_eq)(init, lam)
        dx_s, _, _ = phong_schur.phong_schur_step(problem, True, False, False)(
            init, lam
        )
        scale = float(jnp.max(jnp.abs(dx_d)))
        np.testing.assert_allclose(
            np.asarray(dx_s), np.asarray(dx_d), atol=1e-9 * scale
        )

    def test_fullbatch_200_states_via_schur(self, tmp_path):
        """The reference's default mode is FULL-BATCH Phong BA
        (dataset_ba_phong.cpp:314-327) backed by SPARSE_NORMAL_CHOLESKY;
        at 200 states the dense [D, D] path is the limiting factor and the
        vertex-Schur reduction must carry the solve (auto selection)."""
        from ceres_slam_tpu.problems.dataset_phong import DatasetProblemPhong
        from ceres_slam_tpu.utils import metrics, sim

        ds = sim.generate_phong(num_states=200, num_points=300, seed=11)
        track = str(tmp_path / "p200.csv")
        sim.write_phong_track_csv(ds, track)
        prob = DatasetProblemPhong.read_csv(track)
        # auto must pick schur at this scale (D = 6K + 6J + 4M + 3 > 1024)
        dummy = phong.PhongState(
            poses=jnp.zeros((prob.num_states, 12)),
            points=jnp.zeros((prob.num_vertices, 3)),
            normals=jnp.zeros((prob.num_vertices, 3)),
            phong=jnp.zeros((prob.num_materials, 3)),
            textures=jnp.zeros(prob.num_materials),
            light=jnp.zeros(3),
        )
        assert phong.auto_linear_solver(dummy) == "schur"
        summaries = prob.solve_full(
            window=0, use_light=True, config=lm.SolveConfig(max_iters=50),
            linear_solver="auto",
        )
        assert all(np.isfinite(float(s.final_cost)) for s in summaries)
        ate = metrics.ate_translation(prob.poses, ds.poses_gt)
        assert ate < 0.05, f"full-batch schur Phong BA ATE {ate}"


class TestSlottedAssembly:
    """Scatter-free (slotted) Phong Schur assembly == the segment-sum
    path, on every block (r4: the segment path's O(J*K) pair scatters
    were 100% of the chip iteration time, out/r4/phong_prof.log)."""

    @pytest.mark.parametrize("use_light,directional", [
        (True, False), (True, True), (False, False)])
    def test_blocks_match(self, use_light, directional):
        from ceres_slam_tpu.solver import phong_schur

        problem, gt = make_phong_problem(jax.random.PRNGKey(21), noise=0.3,
                                         directional=directional)
        state = perturb(gt, jax.random.PRNGKey(22), directional)
        layout = phong_schur.build_phong_layout(
            problem, state.points.shape[0])
        a = phong_schur._segment_blocks(problem, state, use_light,
                                        directional, False)
        b = phong_schur._slotted_blocks(problem, state, use_light,
                                        directional, False, layout)
        for name, x, y in zip(("Hv", "gv", "W", "Hr", "gr"), a, b):
            scale = max(1.0, float(jnp.max(jnp.abs(x))))
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       rtol=1e-9, atol=1e-12 * scale,
                                       err_msg=name)

    def test_blocks_match_masked_vertices(self):
        from ceres_slam_tpu.solver import phong_schur

        problem, gt = make_phong_problem(jax.random.PRNGKey(23), noise=0.2)
        vv = problem.vertex_valid.at[-5:].set(False)
        problem = problem._replace(vertex_valid=vv)
        state = perturb(gt, jax.random.PRNGKey(24), False)
        layout = phong_schur.build_phong_layout(
            problem, state.points.shape[0])
        a = phong_schur._segment_blocks(problem, state, True, False, True)
        b = phong_schur._slotted_blocks(problem, state, True, False, True,
                                        layout)
        for name, x, y in zip(("Hv", "gv", "W", "Hr", "gr"), a, b):
            scale = max(1.0, float(jnp.max(jnp.abs(x))))
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       rtol=1e-9, atol=1e-12 * scale,
                                       err_msg=name)

    def test_solve_via_layout_matches(self):
        from ceres_slam_tpu.solver import lm as lm_mod
        from ceres_slam_tpu.solver import phong_schur

        problem, gt = make_phong_problem(jax.random.PRNGKey(25), noise=0.3)
        init = perturb(gt, jax.random.PRNGKey(26), False)
        cfg = lm_mod.SolveConfig(max_iters=25)
        s_seg, sum_seg = phong_schur.solve_phong_ba_schur(
            problem, init, cfg, True, False, False)
        s_slot, sum_slot = phong_schur.solve_phong_ba_schur_jit(
            problem, init, cfg, True, False, False)
        np.testing.assert_allclose(float(sum_slot.final_cost),
                                   float(sum_seg.final_cost), rtol=1e-8)
        np.testing.assert_allclose(np.asarray(s_slot.poses),
                                   np.asarray(s_seg.poses), atol=1e-8)
