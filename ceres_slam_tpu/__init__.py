"""ceres_slam_tpu — a TPU-native stereo SLAM back end.

A from-scratch JAX/XLA/Pallas redesign of the capabilities of the
`utiasSTARS/ceres-slam` research SLAM back end: Lie-group geometry,
stereo-camera and Phong-shading models, batched residual/Jacobian factor
kernels, a jitted trust-region (LM/dogleg) solver with block-sparse Schur
elimination, a batched 3-point-RANSAC VO front end, sliding-window and
full-batch bundle adjustment with covariance-prior chaining, and
observation-sharded distributed BA over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from ceres_slam_tpu.ops import lie  # noqa: F401
