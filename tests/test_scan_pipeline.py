"""Device-resident sliding-window scan pass vs the host per-window loop
(problems/scan_pipeline.py): same trajectories, both passes."""

import os

import numpy as np
import pytest

from ceres_slam_tpu.problems import scan_pipeline
from ceres_slam_tpu.problems.dataset import DatasetProblemSun
from ceres_slam_tpu.solver import dense
from ceres_slam_tpu.utils import sim


@pytest.fixture(scope="module")
def sim_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("scan_sim")
    ds = sim.generate(kind="triangle", num_states=16, num_points=120,
                      seed=0, stereo_noise=(0.3, 0.3, 0.3),
                      sun_noise_deg=5.0)
    base = os.path.join(d, "t16")
    sim.write_track_csv(ds, base + ".csv", with_covar=True)
    sim.write_ref_sun_csv(ds, base + "_sun_ref.csv")
    sim.write_obs_sun_csv(ds, base + "_sun_dir.csv")
    return base


def _load(base):
    return DatasetProblemSun.read_csv(
        f"{base}.csv", f"{base}_sun_ref.csv", f"{base}_sun_dir.csv")


@pytest.mark.parametrize("use_sun", [False, True])
def test_scan_matches_host_loop(sim_files, use_sun):
    cfg = dense.SolveConfig(max_iters=60, nonmonotonic=True)
    ds_host = _load(sim_files)
    # scan=False forces the reference-semantics host per-window loop —
    # without it this test would compare the (default) scan against itself
    ds_host.solve_sliding_window(window=2, use_sun=use_sun, config=cfg,
                                 scan=False)
    ds_scan = _load(sim_files)
    summaries, ok = scan_pipeline.solve_sliding_window_scan(
        ds_scan, window=2, use_sun=use_sun, config=cfg)
    assert np.all(np.isfinite(ds_scan.poses))
    assert summaries.final_cost.shape[0] == ds_scan.num_states - 1
    assert np.all(ok)
    # same trajectory (both solve each window to convergence; tiny
    # numerical differences compound along the chain)
    err = np.abs(ds_scan.poses - ds_host.poses)
    assert err.max() < 1e-5, err.max()
    cov_err = np.abs(ds_scan.pose_covars - ds_host.pose_covars)
    assert cov_err.max() < 1e-7, cov_err.max()


def test_scan_matches_host_loop_window5(sim_files):
    """Window sizes beyond the flagship default share the same scan path
    (different per-window chain length and layout shapes)."""
    cfg = dense.SolveConfig(max_iters=60, nonmonotonic=True)
    ds_host = _load(sim_files)
    ds_host.solve_sliding_window(window=5, use_sun=True, config=cfg,
                                 scan=False)
    ds_scan = _load(sim_files)
    summaries, ok = scan_pipeline.solve_sliding_window_scan(
        ds_scan, window=5, use_sun=True, config=cfg)
    assert summaries.final_cost.shape[0] == ds_scan.num_states - 4
    err = np.abs(ds_scan.poses - ds_host.poses)
    assert err.max() < 1e-5, err.max()


def _crippled_files(tmp_path, window_extra=0):
    """Sim with frame 8's features remapped to bogus ids: no reciprocal
    matches with its neighbors -> RANSAC degeneracy at every window
    containing the pair (7, 8)."""
    ds = sim.generate(kind="triangle", num_states=16, num_points=120,
                      seed=0, stereo_noise=(0.3, 0.3, 0.3),
                      sun_noise_deg=5.0)
    sel = ds.state_ids == 8
    ds.point_ids = ds.point_ids.copy()
    ds.point_ids[sel] = ds.point_ids.max() + 1 + np.arange(sel.sum())
    ds.points_gt = np.concatenate(
        [ds.points_gt, np.zeros((int(sel.sum()), 3))])
    base = os.path.join(tmp_path, "crip16")
    sim.write_track_csv(ds, base + ".csv", with_covar=True)
    sim.write_ref_sun_csv(ds, base + "_sun_ref.csv")
    sim.write_obs_sun_csv(ds, base + "_sun_dir.csv")
    return base


@pytest.mark.parametrize("window", [2, 4])
def test_scan_degenerate_window_matches_host(tmp_path, window):
    """Fault injection through the scan path (mirrors
    test_pipeline.test_ransac_failure_fallback): RANSAC-degenerate
    windows take the copy-pose-and-covariance-forward fallback
    (tests/dataset_vo_sun.cpp:276-281) with the HOST LOOP's exact
    indexing — including the stale-covariance semantics at window>2 —
    and failed windows emit no summary."""
    base = _crippled_files(str(tmp_path))
    cfg = dense.SolveConfig(max_iters=60, nonmonotonic=True)
    ds_host = _load(base)
    host_summaries = ds_host.solve_sliding_window(
        window=window, use_sun=False, config=cfg, scan=False)
    ds_scan = _load(base)
    summaries, ok = scan_pipeline.solve_sliding_window_scan(
        ds_scan, window=window, use_sun=False, config=cfg)
    assert not np.all(ok)  # the fault fired
    assert len(scan_pipeline.unstack_summaries(summaries, ok)) == len(
        host_summaries)
    assert np.all(np.isfinite(ds_scan.poses))
    err = np.abs(ds_scan.poses - ds_host.poses)
    assert err.max() < 1e-5, err.max()
    cov_err = np.abs(ds_scan.pose_covars - ds_host.pose_covars)
    assert cov_err.max() < 1e-7, cov_err.max()


def test_scan_chunked_checkpoint_matches_unchunked(sim_files, tmp_path):
    """Checkpointing chunks the scan (one compiled program, inactive pad
    windows) without changing the result, and clears its file on
    completion."""
    cfg = dense.SolveConfig(max_iters=60, nonmonotonic=True)
    ds_ref = _load(sim_files)
    ds_ref.solve_sliding_window(window=2, use_sun=True, config=cfg)
    ds_ck = _load(sim_files)
    path = str(tmp_path / "scan_ck.npz")
    summaries = ds_ck.solve_sliding_window(
        window=2, use_sun=True, config=cfg, checkpoint=path,
        checkpoint_every=4)
    assert not os.path.exists(path)
    assert len(summaries) == ds_ck.num_states - 1
    np.testing.assert_allclose(ds_ck.poses, ds_ref.poses, atol=1e-9)
    np.testing.assert_allclose(ds_ck.pose_covars, ds_ref.pose_covars,
                               atol=1e-12)


def test_scan_kill_and_resume_cli(sim_files, tmp_path, monkeypatch):
    """Kill-and-resume THROUGH THE APP: interrupt the flagship CLI
    mid-pass (after the 2nd checkpoint write), re-run the identical
    command, and require the final trajectories to match an
    uninterrupted run (VERDICT r3 item 5)."""
    from ceres_slam_tpu.apps.dataset_vo_sun import main
    from ceres_slam_tpu.utils import checkpoint as ckpt_mod
    from ceres_slam_tpu.utils import csvio

    argv = [f"{sim_files}.csv", f"{sim_files}_sun_ref.csv",
            f"{sim_files}_sun_dir.csv", "--window", "2",
            "--max-iters", "60"]
    # uninterrupted baseline
    main(argv)
    ref_vo = csvio.read_poses_csv(f"{sim_files}_poses.csv")
    ref_sun = csvio.read_poses_csv(f"{sim_files}_dir_poses.csv")

    ck = str(tmp_path / "app_ck")
    argv_ck = argv + ["--checkpoint", ck, "--checkpoint-every", "4"]
    real_save = ckpt_mod.save
    calls = {"n": 0}

    def dying_save(path, step, arrays, **kw):
        real_save(path, step, arrays, **kw)
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt("simulated kill")

    monkeypatch.setattr(ckpt_mod, "save", dying_save)
    with pytest.raises(KeyboardInterrupt):
        main(argv_ck)
    monkeypatch.setattr(ckpt_mod, "save", real_save)
    assert os.path.exists(ck + ".vo")  # died mid-pass-1, state persisted
    main(argv_ck)  # resumes pass 1 at window 8, then runs pass 2
    assert not os.path.exists(ck + ".vo") and not os.path.exists(ck + ".sun")
    np.testing.assert_allclose(
        csvio.read_poses_csv(f"{sim_files}_poses.csv"), ref_vo, atol=1e-9)
    np.testing.assert_allclose(
        csvio.read_poses_csv(f"{sim_files}_dir_poses.csv"), ref_sun,
        atol=1e-9)


def test_batch_scan_matches_individual_runs(sim_files, tmp_path_factory):
    """Batched multi-run scan (problems/batch_scan.py): padded,
    vmapped-over-runs chains reproduce each individual scan run —
    heterogeneous sequence lengths, shared datasets, VO-only and sun
    configs mixed in one batch."""
    from ceres_slam_tpu.problems import batch_scan

    d = tmp_path_factory.mktemp("batch_sim")
    ds2 = sim.generate(kind="square", num_states=12, num_points=90,
                       seed=5, stereo_noise=(0.3, 0.3, 0.3),
                       sun_noise_deg=5.0)
    base2 = os.path.join(d, "sq12")
    sim.write_track_csv(ds2, base2 + ".csv", with_covar=True)
    sim.write_ref_sun_csv(ds2, base2 + "_sun_ref.csv")
    sim.write_obs_sun_csv(ds2, base2 + "_sun_dir.csv")

    cfg = dense.SolveConfig(max_iters=60, nonmonotonic=True)
    ds_a = _load(sim_files)   # 16 states
    ds_b = _load(base2)       # 12 states
    poses_before = ds_a.poses.copy()
    inited_before = ds_a.initialized_point.copy()
    runs = [
        batch_scan.RunSpec(ds_a, use_sun=False),
        batch_scan.RunSpec(ds_a, use_sun=True),
        batch_scan.RunSpec(ds_b, use_sun=True),
    ]
    results = batch_scan.solve_batch(runs, window=2, config=cfg)
    # datasets untouched by the batch solve (the statics precompute
    # dead-reckons through ds.poses but must restore it)
    np.testing.assert_array_equal(ds_a.poses, poses_before)
    np.testing.assert_array_equal(ds_a.initialized_point, inited_before)

    for spec, res in zip(runs, results):
        ref = _load(sim_files if spec.ds is ds_a else base2)
        summaries, ok = scan_pipeline.solve_sliding_window_scan(
            ref, window=2, use_sun=spec.use_sun, config=cfg)
        np.testing.assert_allclose(res.poses, ref.poses, atol=1e-8)
        np.testing.assert_allclose(res.pose_covars, ref.pose_covars,
                                   atol=1e-10)
        assert len(res.summaries) == len(
            scan_pipeline.unstack_summaries(summaries, ok))
        np.testing.assert_array_equal(res.ok, ok)


def test_scan_fused_kernel_matches_xla(sim_files):
    """The Pallas factor mega-kernel inside the scan body (interpret mode
    on CPU) reproduces the XLA-blocks scan. The r3 'Mosaic fails to
    lower inside lax.scan' report was actually a dtype bug: the scan took
    its solve dtype from the f64 pose-chain carry, so the kernel's f32
    blocks could never trace (fixed r4)."""
    import jax.numpy as jnp

    from ceres_slam_tpu.solver import dense as dense_mod

    cfg = dense_mod.SolveConfig(max_iters=60, nonmonotonic=True)
    ds_x = _load(sim_files)
    ds_x.dtype = "float32"
    summaries, ok = scan_pipeline.solve_sliding_window_scan(
        ds_x, window=2, use_sun=True, config=cfg)
    ds_f = _load(sim_files)
    ds_f.dtype = "float32"
    statics, point_idx, O, M_pad = scan_pipeline.precompute_pass(ds_f, 2)
    poses, summ, cov = scan_pipeline._run_scan(
        statics, point_idx,
        jnp.asarray(ds_f.poses, jnp.float64),
        jnp.asarray(ds_f.pose_covars, jnp.float64),
        ds_f.camera.astype(jnp.float32),
        jnp.asarray(0.0, jnp.float32), jnp.asarray(1000.0, jnp.float32),
        jnp.asarray(1000.0, jnp.float32), jnp.asarray(1e-12, jnp.float64),
        jnp.asarray(True), 2, O, cfg, "dogleg", True, True)
    err = np.abs(np.asarray(poses) - ds_x.poses)
    assert err.max() < 1e-3, err.max()  # f32 kernel vs f32 XLA blocks


def test_scan_replication_divergence_falls_back(sim_files, monkeypatch):
    """A replication discrepancy in the scan precompute must degrade to
    the host loop, not kill the pass (VERDICT r3; reference posture
    dataset_problem_sun.cpp:324-327)."""
    ds = _load(sim_files)
    monkeypatch.setattr(
        type(ds), "compute_initial_guess",
        lambda self, k1=0, k2=0, _orig=type(ds).compute_initial_guess:
        (False if k1 == 3 else _orig(self, k1, k2)))
    # the patched guess makes window 3 "fail" while the replication loop
    # (driven by the pair caches) still sees healthy inlier counts
    summaries = ds.solve_sliding_window(
        window=2, use_sun=False,
        config=dense.SolveConfig(max_iters=30, nonmonotonic=True))
    assert np.all(np.isfinite(ds.poses))
    assert len(summaries) == ds.num_states - 2  # window 3 fell back
