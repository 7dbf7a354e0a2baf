"""Measure f32-mode flagship accuracy vs f64 under the promoted Schur chain.

Sweeps the f32 covariance floor to pick the production value (CPU, x64 on:
matches the app's mixed-precision configuration — state f32, Schur/cov f64).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from ceres_slam_tpu.problems.dataset import DatasetProblemSun
from ceres_slam_tpu.utils import metrics, sim

d = "/tmp/f32acc"
os.makedirs(d, exist_ok=True)
ds = sim.generate(
    kind="triangle", num_states=24, num_points=200, seed=3,
    stereo_noise=(0.3, 0.3, 0.3), sun_noise_deg=5.0,
)
track_sun = f"{d}/tri_sun.csv"
ref_sun = f"{d}/sun_ref.csv"
obs_sun = f"{d}/sun_dir_gtsun5.csv"
sim.write_track_csv(ds, track_sun, with_covar=True)
sim.write_ref_sun_csv(ds, ref_sun)
sim.write_obs_sun_csv(ds, obs_sun)


def run(dtype, floor=None):
    prob = DatasetProblemSun.read_csv(track_sun, ref_sun, obs_sun)
    prob.dtype = dtype
    if floor is not None:
        # shadow the inherited property on the subclass only
        DatasetProblemSun._covar_floor = property(lambda self: floor)
    try:
        prob.solve_sliding_window(window=2, use_sun=True)
    finally:
        if floor is not None:
            del DatasetProblemSun._covar_floor
    return metrics.ate_translation(prob.poses, ds.poses_gt)


print("f64 baseline:", run("float64"))
for floor in (1e-8, 1e-10, 1e-12):
    print(f"f32 floor={floor:g}:", run("float32", floor))
