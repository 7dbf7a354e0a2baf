from ceres_slam_tpu.ops import factors, lie, photometric  # noqa: F401
