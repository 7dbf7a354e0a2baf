"""CLI app smoke tests (argv-level, CPU)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sim_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("appsim"))
    from ceres_slam_tpu.apps.make_sim import main as make_sim

    make_sim([d, "--kind", "triangle", "--num-states", "16",
              "--num-points", "160", "--sun-noise", "10"])
    return d


def test_dataset_vo_cli(sim_dir, capsys):
    from ceres_slam_tpu.apps.dataset_vo import main

    main([os.path.join(sim_dir, "triangle16_vo.csv"), "--window", "0",
          "--max-iters", "30", "--report", "full"])
    err = capsys.readouterr().err
    assert "accepted" in err  # --report full prints per-iteration telemetry
    assert os.path.exists(os.path.join(sim_dir, "triangle16_vo_poses.csv"))
    assert os.path.exists(os.path.join(sim_dir, "triangle16_vo_map.csv"))


def test_dataset_vo_sun_cli_and_evaluate(sim_dir, capsys):
    from ceres_slam_tpu.apps.dataset_vo_sun import main
    from ceres_slam_tpu.apps.evaluate import main as evaluate

    main([
        os.path.join(sim_dir, "triangle16.csv"),
        os.path.join(sim_dir, "triangle16_sun_ref.csv"),
        os.path.join(sim_dir, "triangle16_sun_dir_gtsun10.csv"),
        "--window", "2", "--max-iters", "30",
    ])
    est = os.path.join(sim_dir, "triangle16_gtsun10_poses.csv")
    assert os.path.exists(est)
    evaluate([est, os.path.join(sim_dir, "triangle16_gt_poses.csv"),
              "--label", "smoke"])
    out = capsys.readouterr().out
    assert "ATE:" in out


def test_blowup_cli(capsys):
    from ceres_slam_tpu.apps.blowup import main

    main(["--num-poses", "10"])
    out = capsys.readouterr().out
    assert "max relative deviation" in out


def test_dense_stereo_cli(capsys):
    from ceres_slam_tpu.apps.dense_stereo import main

    main(["--height", "60", "--width", "80"])
    out = capsys.readouterr().out
    assert "pose error" in out


def test_stereo_vo_cli_synthetic(tmp_path, capsys):
    """Live-VO driver (sparse_stereo_odometry_node counterpart) on a
    rendered synthetic sequence."""
    from ceres_slam_tpu.apps.stereo_vo import main
    from ceres_slam_tpu.utils import csvio

    out = str(tmp_path / "svo")
    main(["--synthetic", "6", "--out", out])
    poses = csvio.read_poses_csv(out + "_poses.csv")
    assert poses.shape == (6, 12)
    text = capsys.readouterr().out
    assert "ATE RMSE" in text
    ate = float(text.split("ATE RMSE:")[1].split("m")[0])
    assert ate < 0.5  # dead-reckoned VO on a short synthetic dolly


def test_stereo_vo_cli_files(tmp_path, capsys):
    """File-glob input mode with .npy frames."""
    import jax.numpy as jnp

    from ceres_slam_tpu.apps.stereo_vo import _render_synthetic, main
    from ceres_slam_tpu.models.stereo_camera import StereoCamera
    from ceres_slam_tpu.utils import csvio

    cam = StereoCamera.create(140.0, 140.0, 80.0, 60.0, 0.4)
    frames, _ = _render_synthetic(cam, 4)
    for i, (l, r) in enumerate(frames):
        np.save(tmp_path / f"{i:03d}_left.npy", np.asarray(l))
        np.save(tmp_path / f"{i:03d}_right.npy", np.asarray(r))
    out = str(tmp_path / "svo_files")
    main(["--left-glob", str(tmp_path / "*_left.npy"),
          "--right-glob", str(tmp_path / "*_right.npy"), "--out", out])
    poses = csvio.read_poses_csv(out + "_poses.csv")
    assert poses.shape == (4, 12)
