"""KITTI-shaped sim validation (sim.generate_kitti) — the scaling
statistics the real ba_all_icra/iser/kitti harnesses will present
(reference sequence tables: scripts/ba_all_icra.sh:19-56), exercised
before real data exists: realistic track-length/dropout distributions,
open drive trajectories, and the padding budgets they imply."""

import numpy as np
import pytest

from ceres_slam_tpu.utils import metrics, sim


class TestStatistics:
    @pytest.fixture(scope="class")
    def ds(self):
        return sim.generate_kitti(num_states=200, num_points=3200, seed=2)

    def test_every_frame_tracked(self, ds):
        opf = np.bincount(ds.state_ids, minlength=ds.num_states)
        assert opf.min() >= 8, "frames with too few observations"
        assert opf.mean() > 50

    def test_track_length_distribution(self, ds):
        tl = np.bincount(ds.point_ids)
        tl = tl[tl > 0]
        # real trackers: short geometric-tailed tracks, none spanning
        # the whole sequence (the r2 bench-geometry lesson: one O(K)
        # landmark inflates every [J, O, *] slot tensor)
        assert 4.0 < tl.mean() < 20.0
        assert tl.max() < 60
        assert np.percentile(tl, 95) < 30

    def test_consecutive_frame_overlap(self, ds):
        # RANSAC needs >= 3 shared landmarks per consecutive pair
        sets = [set() for _ in range(ds.num_states)]
        for k, j in zip(ds.state_ids, ds.point_ids):
            sets[k].add(j)
        ov = np.array([len(sets[k] & sets[k + 1])
                       for k in range(ds.num_states - 1)])
        assert ov.min() >= 5

    def test_open_trajectory(self, ds):
        # a drive, not a loop: endpoints far apart
        c0 = -ds.poses_gt[0, 3:].reshape(3, 3).T @ ds.poses_gt[0, :3]
        c1 = -ds.poses_gt[-1, 3:].reshape(3, 3).T @ ds.poses_gt[-1, :3]
        assert np.linalg.norm(c1 - c0) > 20.0


def test_kitti_sim_pipeline_end_to_end(tmp_path):
    """A small KITTI-shaped drive through the flagship scan pipeline:
    CSV round trip, VO init chain, sliding-window solve, sane ATE."""
    from ceres_slam_tpu.problems.dataset import DatasetProblemSun

    ds = sim.generate_kitti(num_states=40, num_points=640, seed=2,
                            sun_noise_deg=5.0)
    base = str(tmp_path / "kitti40")
    sim.write_track_csv(ds, base + ".csv", with_covar=True)
    sim.write_ref_sun_csv(ds, base + "_sun_ref.csv")
    sim.write_obs_sun_csv(ds, base + "_sun_dir_gtsun5.csv")

    prob = DatasetProblemSun.read_csv(
        base + ".csv", base + "_sun_ref.csv", base + "_sun_dir_gtsun5.csv")
    prob.solve_sliding_window(window=2, use_sun=True)
    ate = metrics.ate_translation(prob.poses, ds.poses_gt)
    rot = metrics.rotation_error_deg(prob.poses, ds.poses_gt).max()
    assert np.all(np.isfinite(prob.poses))
    # 40 frames of ~1 m/frame drive; dead-reckoned chain with sun aiding
    assert ate < 0.5, f"ATE {ate}"
    assert rot < 5.0, f"max rot err {rot}"
