"""Trajectory evaluation metrics.

The reference evaluated accuracy externally by comparing emitted
`*_poses.csv` trajectories against ground-truth files
(scripts/ba_all_iser.sh:33-39); this module provides that comparison
in-framework: absolute trajectory error (ATE) on camera centers, with
optional rigid alignment, plus rotational error statistics.
"""

from __future__ import annotations

import numpy as np


def camera_centers(poses: np.ndarray) -> np.ndarray:
    """Flat ``[K, 12]`` T_k_g poses -> camera centers in the global frame
    (``c = -R^T t``)."""
    R = poses[:, 3:].reshape(-1, 3, 3)
    t = poses[:, :3]
    return -np.einsum("kji,kj->ki", R, t)


def ate_translation(
    poses_est: np.ndarray, poses_gt: np.ndarray, align: bool = False
) -> float:
    """RMSE of camera-center error [m]. ``align=True`` removes the best
    rigid transform first (Horn); both trajectories share the anchored
    first pose in our pipelines, so default is no alignment."""
    c_est = camera_centers(poses_est)
    c_gt = camera_centers(poses_gt)
    if align:
        mu_e, mu_g = c_est.mean(0), c_gt.mean(0)
        W = (c_gt - mu_g).T @ (c_est - mu_e)
        U, _, Vt = np.linalg.svd(W)
        D = np.diag([1.0, 1.0, np.linalg.det(U) * np.linalg.det(Vt)])
        R = U @ D @ Vt
        c_est = (c_est - mu_e) @ R.T + mu_g
    err = c_est - c_gt
    return float(np.sqrt(np.mean(np.sum(err * err, axis=-1))))


def rotation_error_deg(poses_est: np.ndarray, poses_gt: np.ndarray) -> np.ndarray:
    """Per-state geodesic rotation error in degrees."""
    R_e = poses_est[:, 3:].reshape(-1, 3, 3)
    R_g = poses_gt[:, 3:].reshape(-1, 3, 3)
    dR = np.einsum("kij,klj->kil", R_e, R_g)  # R_e R_g^T
    tr = np.clip((np.trace(dR, axis1=1, axis2=2) - 1.0) / 2.0, -1.0, 1.0)
    return np.degrees(np.arccos(tr))
