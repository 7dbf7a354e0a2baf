"""FactorGraph — a ceres::Problem-style incremental builder.

The reference's user-facing API is `ceres::Problem` + AddResidualBlock
(e.g. tests/dataset_vo_sun.cpp:36-130); this is its TPU-native analog: an
imperative host-side builder that accumulates variables and factors, then
`build()`s the padded static-shape batched problem the jitted solvers
consume. Intended for users assembling custom problems (the dataset layer
builds its problems directly).

    g = FactorGraph(camera)
    k0 = g.add_pose(T0, fixed=True)
    k1 = g.add_pose(T1)
    j = g.add_point(p)
    g.add_stereo_obs(k0, j, uvd0, covariance=np.diag([.25,.25,.49]))
    g.add_stereo_obs(k1, j, uvd1)
    g.add_pose_prior(k0, T0, covariance=1e-6*np.eye(6))
    sol, summary = g.solve()
    cov = g.covariance(k1)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import factors
from ceres_slam_tpu.solver import dense, lm


def _round_up(n: int, m: int = 32) -> int:
    return max(m, ((n + m - 1) // m) * m)


class FactorGraph:
    def __init__(self, camera: StereoCamera, default_stereo_var=(1.0, 1.0, 1.0)):
        self.camera = camera
        self._default_cov = np.diag(default_stereo_var)
        self._poses: list = []
        self._fixed: list = []
        self._points: list = []
        self._stereo: list = []  # (pose_id, point_id, uvd, cov)
        self._sun: dict = {}  # pose_id -> (dir_c, dir_g, cov)
        self._prior = None  # (pose_id, T_ref, cov)
        self._huber = 0.0
        self._az_thresh = 1000.0
        self._zen_thresh = 1000.0
        self._solution = None

    # -- variables ----------------------------------------------------------

    def add_pose(self, T, fixed: bool = False) -> int:
        self._poses.append(np.asarray(T, float))
        self._fixed.append(bool(fixed))
        return len(self._poses) - 1

    def add_point(self, p) -> int:
        self._points.append(np.asarray(p, float))
        return len(self._points) - 1

    def set_pose_constant(self, pose_id: int, fixed: bool = True):
        """SetParameterBlockConstant / Variable."""
        self._fixed[pose_id] = bool(fixed)

    # -- factors ------------------------------------------------------------

    def add_stereo_obs(self, pose_id: int, point_id: int, uvd, covariance=None):
        cov = self._default_cov if covariance is None else np.asarray(covariance)
        self._stereo.append((pose_id, point_id, np.asarray(uvd, float), cov))

    def add_sun_obs(self, pose_id: int, dir_c, dir_g, covariance=None):
        cov = np.eye(2) if covariance is None else np.asarray(covariance)
        self._sun[pose_id] = (np.asarray(dir_c, float), np.asarray(dir_g, float), cov)

    def add_pose_prior(self, pose_id: int, T_ref, covariance=None):
        cov = np.eye(6) if covariance is None else np.asarray(covariance)
        self._prior = (pose_id, np.asarray(T_ref, float), cov)

    def set_sun_robust_loss(self, huber_param: float):
        self._huber = float(huber_param)

    def set_sun_gating(self, az_err_thresh: float, zen_err_thresh: float):
        """Hard outlier gating thresholds in radians."""
        self._az_thresh = float(az_err_thresh)
        self._zen_thresh = float(zen_err_thresh)

    # -- build / solve -------------------------------------------------------

    def build(self):
        K = len(self._poses)
        J = max(1, len(self._points))
        N = _round_up(max(1, len(self._stereo)))

        uvd = np.zeros((N, 3))
        covs = np.broadcast_to(np.eye(3), (N, 3, 3)).copy()
        pose_idx = np.zeros(N, np.int32)
        point_idx = np.zeros(N, np.int32)
        valid = np.zeros(N, bool)
        for i, (k, j, o, c) in enumerate(self._stereo):
            uvd[i] = o
            covs[i] = c
            pose_idx[i] = k
            point_idx[i] = j
            valid[i] = True

        stereo = dense.StereoObs(
            uvd=jnp.asarray(uvd),
            stiffness=factors.inv_sqrt_psd(jnp.asarray(covs)),
            pose_idx=jnp.asarray(pose_idx),
            point_idx=jnp.asarray(point_idx),
            valid=jnp.asarray(valid),
        )

        sun_dir_c = np.zeros((K, 3))
        sun_dir_g = np.zeros((K, 3))
        sun_cov = np.broadcast_to(np.eye(2), (K, 2, 2)).copy()
        sun_valid = np.zeros(K, bool)
        for k, (dc, dg, c) in self._sun.items():
            sun_dir_c[k] = dc / max(np.linalg.norm(dc), 1e-30)
            sun_dir_g[k] = dg / max(np.linalg.norm(dg), 1e-30)
            sun_cov[k] = c
            sun_valid[k] = True
        sun = dense.SunObs(
            dir_c=jnp.asarray(sun_dir_c),
            dir_g=jnp.asarray(sun_dir_g),
            stiffness=factors.inv_sqrt_psd(jnp.asarray(sun_cov)),
            valid=jnp.asarray(sun_valid),
        )

        if self._prior is not None:
            pid, T_ref, cov = self._prior
            prior = dense.PosePrior(
                pose_idx=jnp.asarray(pid, jnp.int32),
                T_ref=jnp.asarray(T_ref),
                stiffness=factors.inv_sqrt_psd(jnp.asarray(cov)),
                valid=jnp.asarray(True),
            )
        else:
            prior = dense.PosePrior(
                pose_idx=jnp.asarray(0, jnp.int32),
                T_ref=jnp.asarray(np.concatenate([np.zeros(3), np.eye(3).reshape(9)])),
                stiffness=jnp.eye(6),
                valid=jnp.asarray(False),
            )

        pts = np.zeros((J, 3))
        point_valid = np.zeros(J, bool)
        for j, p in enumerate(self._points):
            pts[j] = p
            point_valid[j] = True

        problem = dense.StereoBAProblem(
            camera=self.camera,
            stereo=stereo,
            sun=sun,
            prior=prior,
            fixed_pose_mask=jnp.asarray(np.asarray(self._fixed, bool)),
            point_valid=jnp.asarray(point_valid),
            sun_huber=jnp.asarray(self._huber),
            az_err_thresh=jnp.asarray(self._az_thresh),
            zen_err_thresh=jnp.asarray(self._zen_thresh),
        )
        state = dense.BAState(
            poses=jnp.asarray(np.stack(self._poses)), points=jnp.asarray(pts)
        )
        return problem, state

    def solve(
        self,
        config: lm.SolveConfig = lm.SolveConfig(max_iters=100),
        linear_solver: str = "dense",
        strategy: str = "lm",
    ):
        """Solve and absorb the solution back into the graph variables.

        ``linear_solver``: 'dense' | 'schur' | 'pcg' (the Ceres
        DENSE_NORMAL_CHOLESKY / SPARSE_SCHUR / ITERATIVE_SCHUR analogs)."""
        problem, state = self.build()
        if linear_solver == "schur":
            from ceres_slam_tpu.solver import schur

            sol, summary = schur.solve_ba_schur(problem, state, config)
        elif linear_solver == "pcg":
            from ceres_slam_tpu.solver import pcg

            sol, summary = pcg.solve_ba_pcg(problem, state, config)
        else:
            sol, summary = dense.solve_ba(problem, state, config, strategy=strategy)
        self._solution = (problem, sol)
        poses = np.asarray(sol.poses)
        points = np.asarray(sol.points)
        for k in range(len(self._poses)):
            self._poses[k] = poses[k]
        for j in range(len(self._points)):
            self._points[j] = points[j]
        return sol, summary

    def covariance(self, pose_id: int) -> np.ndarray:
        """6x6 tangent-space marginal covariance at the last solution
        (GetCovarianceBlockInTangentSpace analog)."""
        assert self._solution is not None, "solve() first"
        problem, sol = self._solution
        return np.asarray(
            dense.pose_tangent_covariance(problem, sol, jnp.asarray(pose_id))
        )

    def pose(self, pose_id: int) -> np.ndarray:
        return self._poses[pose_id]

    def point(self, point_id: int) -> np.ndarray:
        return self._points[point_id]
