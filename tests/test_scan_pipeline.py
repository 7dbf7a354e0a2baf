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
    ds_host.solve_sliding_window(window=2, use_sun=use_sun, config=cfg)
    ds_scan = _load(sim_files)
    summaries = scan_pipeline.solve_sliding_window_scan(
        ds_scan, window=2, use_sun=use_sun, config=cfg)
    assert np.all(np.isfinite(ds_scan.poses))
    assert summaries.final_cost.shape[0] == ds_scan.num_states - 1
    # same trajectory (both solve each window to convergence; tiny
    # numerical differences compound along the chain)
    err = np.abs(ds_scan.poses - ds_host.poses)
    assert err.max() < 1e-5, err.max()
