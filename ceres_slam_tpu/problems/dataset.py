"""Dataset problem layer: state containers + CSV IO + pipeline orchestration.

TPU-native redesign of the reference's L5 layer
(`/root/reference/src/ceres_slam/dataset_problem{,_sun}.cpp`): reads the
same CSV formats, owns the structure-of-arrays state (poses ``[K,12]``,
points ``[J,3]``), runs the VO initial-guess chain (triangulate + batched
RANSAC + pose compounding, dataset_problem.cpp:179-270), builds padded
static-shape window problems for the jitted LM solver, and chains the
tangent covariance prior between windows (tests/dataset_vo_sun.cpp:159-183).

Host/device split: index bookkeeping (reciprocal matching, window slot
remapping, padding) is cold-path numpy; triangulation, RANSAC scoring and
the window solves are jitted JAX. Shapes are padded to per-dataset maxima
so each pipeline compiles exactly once.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ceres_slam_tpu.frontend import alignment
from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import factors, lie
from ceres_slam_tpu.solver import dense
from ceres_slam_tpu.solver import window as window_mod
from ceres_slam_tpu.utils import csvio, se3np


def run_batched_ransac(camera, pts0, pts1, valid, rng_seed: int,
                       ransac_iters: int, ransac_thresh: float,
                       chunk: int = 64):
    """Chunk-vmapped RANSAC over all consecutive frame pairs (shared by
    the stereo and Phong datasets). ``pts0/pts1 [K, P, 3]`` carry pair
    k's matched camera-frame points (row 0 unused); returns numpy
    ``(T [K, 12], inliers [K, P], num_inliers [K])``. Per-pair PRNG key
    = PRNGKey(rng_seed + k), so results are bit-identical to K-1
    individual `ransac_align` calls. Chunks are padded to one static
    shape (a second shape means a second multi-second remote compile)."""
    from ceres_slam_tpu.utils.hostdev import host_cpu_ctx

    K, P = valid.shape
    vmapped = jax.jit(
        jax.vmap(
            lambda a, b, v, key: alignment.ransac_align(
                camera, a, b, v, key,
                num_iters=ransac_iters, thresh=ransac_thresh,
            )
        )
    )
    # key construction + chunk padding are eager host work (each eager
    # op on the relay is a program upload + ~30 ms round trip)
    with host_cpu_ctx():
        keys = jax.vmap(jax.random.PRNGKey)(rng_seed + jnp.arange(K))
    pair_T = np.zeros((K, 12))
    pair_inliers = np.zeros((K, P), bool)
    pair_num = np.zeros(K, np.int64)
    for s in range(1, K, chunk):
        e = min(s + chunk, K)
        n = e - s

        def padc(x):
            if n == chunk:
                return jnp.asarray(x[s:e])
            buf = np.zeros((chunk,) + x.shape[1:], x.dtype)
            buf[:n] = x[s:e]
            return jnp.asarray(buf)

        with host_cpu_ctx():
            kpad = keys[s:e] if n == chunk else jnp.concatenate(
                [keys[s:e],
                 jnp.broadcast_to(keys[s], (chunk - n,) + keys.shape[1:])])
        res = vmapped(padc(pts0), padc(pts1), padc(valid), kpad)
        pair_T[s:e] = np.asarray(res.T_1_0)[:n]
        pair_inliers[s:e] = np.asarray(res.inliers)[:n]
        pair_num[s:e] = np.asarray(res.num_inliers)[:n]
    return pair_T, pair_inliers, pair_num


def _round_up(n: int, m: int = 64) -> int:
    return max(m, ((n + m - 1) // m) * m)


@dataclasses.dataclass
class DatasetProblem:
    """Plain stereo VO/BA dataset (dataset_problem.{hpp,cpp}).

    Track CSV format (dataset_problem.hpp:57-65): header ``K,J``;
    intrinsics ``fu,fv,cu,cv,b``; shared observation variances; first GT
    pose as a row-major 4x4; then rows ``k, j, u, v, d``.
    """

    camera: StereoCamera = None
    num_states: int = 0
    num_points: int = 0
    poses: np.ndarray = None  # [K, 12] T_k_g
    map_points: np.ndarray = None  # [J, 3]
    initialized_point: np.ndarray = None  # [J] bool
    state_ids: np.ndarray = None  # [N]
    point_ids: np.ndarray = None  # [N]
    obs_list: np.ndarray = None  # [N, 3] uvd
    obs_covars: np.ndarray = None  # [N, 3, 3]
    stereo_obs_var: np.ndarray = None  # [3]
    # RANSAC settings (dataset_problem.cpp:248)
    ransac_iters: int = 400
    ransac_thresh: float = 4.0
    rng_seed: int = 42
    # Solver dtype: float64 (default; exact) or float32 (fast TPU mode).
    # f32 needs no special conditioning: the window solver promotes the
    # Schur reduce/factorize/covariance chain to f64 whenever x64 is
    # enabled (window._auto_schur_dtype), so the 1e-12-prior chain
    # (dataset_problem_sun.cpp:80) stays exact in both modes.
    dtype: str = "float64"

    @property
    def _dt(self):
        return jnp.dtype(self.dtype)

    @property
    def _camera_dt(self):
        """dtype-cast camera, cached: `camera.astype` dispatches ~6 eager
        device ops, which at ~30 ms relay latency dominated the per-window
        problem build when done per window."""
        cached = getattr(self, "_camera_dt_cache", None)
        if cached is None or cached[0] != self.dtype:
            from ceres_slam_tpu.utils.hostdev import host_cpu_ctx

            with host_cpu_ctx():
                cam = self.camera.astype(self._dt)
            self._camera_dt_cache = (self.dtype, cam)
        return self._camera_dt_cache[1]

    _covar_floor: float = 1e-12

    # -- IO -----------------------------------------------------------------

    @classmethod
    def read_csv(cls, filename: str) -> "DatasetProblem":
        self = cls()
        rows = csvio.read_numeric_csv(filename)
        self._parse_header(rows, with_var_line=True)
        body = rows[self._header_lines :]
        self._parse_obs(body, with_covar=False)
        self._init_state()
        return self

    _header_lines = 4

    def _parse_header(self, rows, with_var_line: bool):
        self.num_states, self.num_points = int(rows[0][0]), int(rows[0][1])
        fu, fv, cu, cv, b = rows[1][:5]
        # camera scalars live on the host CPU backend; they ride into
        # jitted device programs as (tiny) auto-transferred inputs. An
        # eager TPU placement here was the process's FIRST device
        # contact — 11-110 s of relay grant before any real work (r5)
        from ceres_slam_tpu.utils.hostdev import host_cpu_ctx

        with host_cpu_ctx():
            self.camera = StereoCamera.create(fu, fv, cu, cv, b)
        i = 2
        if with_var_line:
            self.stereo_obs_var = np.asarray(rows[i][:3])
            i += 1
        T_0_g = np.asarray(rows[i][:16]).reshape(4, 4)
        self._T0 = np.concatenate([T_0_g[:3, 3], T_0_g[:3, :3].reshape(9)])
        self._header_lines = i + 1

    def _parse_obs(self, body, with_covar: bool):
        arr = np.asarray(body)
        self.state_ids = arr[:, 0].astype(np.int64)
        self.point_ids = arr[:, 1].astype(np.int64)
        self.obs_list = arr[:, 2:5].copy()
        if with_covar:
            self.obs_covars = arr[:, 5:14].reshape(-1, 3, 3).copy()
        else:
            self.obs_covars = np.broadcast_to(
                np.diag(self.stereo_obs_var), (arr.shape[0], 3, 3)
            ).copy()

    def _init_state(self):
        import sys
        import time as _time

        _t0 = _time.perf_counter()
        K, J = self.num_states, self.num_points
        self.poses = np.zeros((K, 12))
        self.poses[:] = np.concatenate([np.zeros(3), np.eye(3).reshape(9)])
        self.poses[0] = self._T0
        self.map_points = np.zeros((J, 3))
        self.initialized_point = np.zeros(J, bool)
        # inverted indexes (dataset_problem.cpp:87-118)
        self._state_obs = [
            np.nonzero(self.state_ids == k)[0] for k in range(K)
        ]
        # pre-triangulated camera-frame points + pre-whitened stiffness
        # for all observations (covariances are static per dataset).
        # Pinned to the host CPU backend: on the TPU relay these eager
        # ops were the FIRST device contact and cost 11-110 s of grant +
        # executable upload (r5 recon) for work numpy consumes anyway.
        from ceres_slam_tpu.utils.hostdev import host_cpu_ctx

        with host_cpu_ctx():
            self._pts_c = np.asarray(
                self.camera.triangulate(jnp.asarray(self.obs_list)))
            self._stiffness_all = np.asarray(
                factors.inv_sqrt_psd(jnp.asarray(self.obs_covars))
            )
        if os.environ.get("CSTPU_TIMING"):
            print(f"  dataset init (triangulate + whiten, host): "
                  f"{_time.perf_counter() - _t0:.1f}s", file=sys.stderr,
                  flush=True)
        # static pad size for RANSAC match arrays
        max_matches = 1
        for k in range(1, K):
            m = np.intersect1d(
                self.point_ids[self._state_obs[k - 1]],
                self.point_ids[self._state_obs[k]],
            ).size
            max_matches = max(max_matches, m)
        self._match_pad = _round_up(max_matches)

    def write_csv(self, filename: str):
        """Emit ``<base>_poses.csv`` + ``<base>_map.csv``
        (dataset_problem.cpp:123-165)."""
        base = filename.rsplit(".", 1)[0]
        csvio.write_poses_csv(base + "_poses.csv", self.poses)
        csvio.write_map_csv(
            base + "_map.csv", self.map_points, self.initialized_point
        )

    # -- accessors matching the reference API --------------------------------

    def obs_indices_at_state(self, k: int) -> np.ndarray:
        return self._state_obs[k]

    def obs_indices_for_feature(self, j: int) -> np.ndarray:
        return np.nonzero(self.point_ids == j)[0]

    def reset_points(self):
        self.initialized_point[:] = False

    # -- VO initial guess (dataset_problem.cpp:179-270) -----------------------

    def _pair_match(self, k: int):
        """Reciprocal matches between states k-1 and k
        (dataset_problem.cpp:199-225 via set intersection on point ids)."""
        idx_a = self._state_obs[k - 1]
        idx_b = self._state_obs[k]
        _, ia, ib = np.intersect1d(
            self.point_ids[idx_a], self.point_ids[idx_b], return_indices=True
        )
        return idx_a[ia], idx_b[ib]

    def precompute_pair_alignments(self, chunk: int = 64):
        """Batched RANSAC for ALL consecutive frame pairs at once.

        The sliding-window loop re-runs the identical pair alignment every
        window (reset_points wipes landmark init between windows); with a
        high-latency device link this dominates wall time. One vmapped
        RANSAC over all pairs (chunked) replaces K-1 sequential calls.
        Results are bit-identical to the per-call path (same per-pair PRNG
        keys). Idempotent: a second call (e.g. the second flagship pass,
        or a sibling dataset that had the cache copied in) is a no-op."""
        if getattr(self, "_pair_T", None) is not None:
            return
        import sys
        import time as _time

        _t0 = _time.perf_counter()
        K = self.num_states
        P = self._match_pad
        # RANSAC runs in the dataset's SOLVE dtype: under x64 the f64
        # numpy inputs silently made the whole 400-hypothesis program
        # emulated-f64 on TPU — most of its executable size and cold
        # compile cost (r5 recon). f32 pipelines use f32 RANSAC (fit
        # noise ~1e-6 relative vs the 4 px^2 inlier threshold); the f64
        # CPU reference path is unchanged.
        pts0 = np.zeros((K, P, 3), self._dt)
        pts1 = np.zeros((K, P, 3), self._dt)
        valid = np.zeros((K, P), bool)
        counts = np.zeros(K, np.int64)
        for k in range(1, K):
            idx_a, idx_b = self._pair_match(k)
            M = idx_a.size
            counts[k] = M
            pts0[k, :M] = self._pts_c[idx_a]
            pts1[k, :M] = self._pts_c[idx_b]
            valid[k, :M] = True

        _t1 = _time.perf_counter()
        self._pair_T, self._pair_inliers, self._pair_num_inliers = \
            run_batched_ransac(
                self.camera, pts0, pts1, valid, self.rng_seed,
                self.ransac_iters, self.ransac_thresh, chunk)
        if os.environ.get("CSTPU_TIMING"):
            print(f"  pair alignments: match-gather {_t1 - _t0:.1f}s, "
                  f"ransac {_time.perf_counter() - _t1:.1f}s "
                  f"({(K - 1 + chunk - 1) // chunk} chunks)",
                  file=sys.stderr, flush=True)

    def compute_initial_guess(self, k1: int = 0, k2: int = 0) -> bool:
        if k1 >= k2:
            k1, k2 = 0, self.num_states
        use_cache = getattr(self, "_pair_T", None) is not None
        for k in range(k1 + 1, k2):
            idx_a, idx_b = self._pair_match(k)
            M = idx_a.size
            if M < 3:
                return False
            if use_cache:
                res_T = self._pair_T[k]
                res_inliers = self._pair_inliers[k]
                n_inl = int(self._pair_num_inliers[k])
            else:
                P = self._match_pad
                pts0 = np.zeros((P, 3))
                pts1 = np.zeros((P, 3))
                pts0[:M] = self._pts_c[idx_a]
                pts1[:M] = self._pts_c[idx_b]
                valid = np.zeros(P, bool)
                valid[:M] = True
                res = alignment.ransac_align(
                    self.camera,
                    jnp.asarray(pts0),
                    jnp.asarray(pts1),
                    jnp.asarray(valid),
                    jax.random.PRNGKey(self.rng_seed + k),
                    num_iters=self.ransac_iters,
                    thresh=self.ransac_thresh,
                )
                res_T = np.asarray(res.T_1_0)
                res_inliers = np.asarray(res.inliers)
                n_inl = int(res.num_inliers)
            if n_inl < 3:
                return False
            # Compound onto the previous pose (dataset_problem.cpp:241) —
            # host numpy: per-window scalar math is latency-bound on device.
            self.poses[k] = se3np.compose(res_T, self.poses[k - 1])
            # Initialize inlier landmarks in the base frame (:245-255)
            inl = res_inliers[:M]
            jj = self.point_ids[idx_a[inl]]
            new = ~self.initialized_point[jj]
            if np.any(new):
                T_inv = se3np.inverse(self.poses[k - 1])
                p_g = se3np.transform_point(T_inv, self._pts_c[idx_a[inl]])
                self.map_points[jj[new]] = p_g[new]
                self.initialized_point[jj[new]] = True
        return True

    # -- window problem construction -----------------------------------------

    def _window_budget(self, window: int):
        """Static pad sizes (obs, active points, obs-per-landmark slots)
        across all windows, so every window solve shares ONE compiled XLA
        program (per-window shapes would compile ~K programs and exhaust
        the process's mmap budget on long trajectories)."""
        K = self.num_states
        max_obs, max_pts, max_slots = 1, 1, 1
        for k1 in range(0, K - window + 1):
            sel = np.concatenate(self._state_obs[k1 : k1 + window])
            max_obs = max(max_obs, sel.size)
            _, cnt = np.unique(self.point_ids[sel], return_counts=True)
            if cnt.size:
                max_pts = max(max_pts, cnt.size)
                max_slots = max(max_slots, int(cnt.max()))
        return _round_up(max_obs), _round_up(max_pts), max_slots

    def build_window_problem(
        self,
        k1: int,
        k2: int,
        n_obs_pad: int,
        n_pts_pad: int,
        prior: dense.PosePrior | None = None,
        sun: dense.SunObs | None = None,
        sun_huber: float = 0.0,
        az_err_thresh: float = 1000.0,
        zen_err_thresh: float = 1000.0,
        gauge_fix_first: bool = True,
    ):
        """Build a padded StereoBAProblem + BAState for window [k1, k2)."""
        Kw = k2 - k1
        sel = np.concatenate(self._state_obs[k1:k2])
        slots, local_pt = np.unique(self.point_ids[sel], return_inverse=True)
        n_obs, n_pts = sel.size, slots.size
        assert n_obs <= n_obs_pad and n_pts <= n_pts_pad, "pad budget too small"

        uvd = np.zeros((n_obs_pad, 3))
        uvd[:n_obs] = self.obs_list[sel]
        covar = np.broadcast_to(np.eye(3), (n_obs_pad, 3, 3)).copy()
        covar[:n_obs] = self.obs_covars[sel]
        pose_idx = np.zeros(n_obs_pad, np.int32)
        pose_idx[:n_obs] = self.state_ids[sel] - k1
        point_idx = np.zeros(n_obs_pad, np.int32)
        point_idx[:n_obs] = local_pt
        valid = np.zeros(n_obs_pad, bool)
        valid[:n_obs] = True

        point_valid = np.zeros(n_pts_pad, bool)
        point_valid[:n_pts] = self.initialized_point[slots]

        dt = self._dt
        stiff_np = np.broadcast_to(np.eye(3), (n_obs_pad, 3, 3)).copy()
        stiff_np[:n_obs] = self._stiffness_all[sel]
        stereo = dense.StereoObs(
            uvd=jnp.asarray(uvd, dt),
            stiffness=jnp.asarray(stiff_np, dt),
            pose_idx=jnp.asarray(pose_idx),
            point_idx=jnp.asarray(point_idx),
            valid=jnp.asarray(valid),
        )
        if sun is None:
            sun = dense.SunObs(
                dir_c=jnp.zeros((Kw, 3), dt),
                dir_g=jnp.zeros((Kw, 3), dt),
                stiffness=jnp.broadcast_to(jnp.eye(2, dtype=dt), (Kw, 2, 2)),
                valid=jnp.zeros(Kw, bool),
            )
        if prior is None:
            prior = dense.PosePrior(
                pose_idx=jnp.asarray(0, jnp.int32),
                T_ref=jnp.asarray(self.poses[k1], dt),
                stiffness=jnp.eye(6, dtype=dt),
                valid=jnp.asarray(False),
            )
        fixed = np.zeros(Kw, bool)
        fixed[0] = gauge_fix_first
        problem = dense.StereoBAProblem(
            camera=self._camera_dt,
            stereo=stereo,
            sun=sun,
            prior=prior,
            fixed_pose_mask=jnp.asarray(fixed),
            point_valid=jnp.asarray(point_valid),
            sun_huber=jnp.asarray(float(sun_huber), dt),
            az_err_thresh=jnp.asarray(float(az_err_thresh), dt),
            zen_err_thresh=jnp.asarray(float(zen_err_thresh), dt),
        )

        pts = np.zeros((n_pts_pad, 3))
        pts[:n_pts] = self.map_points[slots]
        state = dense.BAState(
            poses=jnp.asarray(self.poses[k1:k2], dt), points=jnp.asarray(pts, dt)
        )
        return problem, state, slots

    def absorb_window_solution(self, k1, k2, state: dense.BAState, slots: np.ndarray):
        """Write the solved window state back into the dataset arrays
        (Ceres mutates the parameter blocks in place; we copy back)."""
        self.poses[k1:k2] = np.asarray(state.poses)
        pts = np.asarray(state.points)[: slots.size]
        upd = self.initialized_point[slots]
        self.map_points[slots[upd]] = pts[upd]

    # -- drivers --------------------------------------------------------------

    @staticmethod
    def auto_linear_solver(Kw: int, n_pts: int) -> str:
        """Size-based solver selection (the reference's commented solver
        switches, tests/dataset_vo.cpp:65-74): dense Cholesky at window
        scale, the scatter-free explicit-Schur window solver for medium
        batches (its reduced S is 6K x 6K dense), matrix-free Schur-PCG
        at KITTI full-batch scale where even the [J, O, K] window layout
        stops paying."""
        dof = 6 * Kw + 3 * n_pts
        if dof <= 1536:
            return "dense"
        return "window" if Kw <= 128 else "pcg"

    def solve_full(self, window: int = 0,
                   config: dense.SolveConfig | None = None,
                   linear_solver: str = "auto"):
        """The `dataset_vo` pipeline (tests/dataset_vo.cpp:119-131): for each
        window: VO initial guess, window BA with the first pose fixed,
        reset_points. window=0 means full batch.

        ``linear_solver``: 'auto' | 'dense' | 'window' | 'pcg' — all three
        backends are cross-validated to the same minimum (tests/
        test_window.py, test_solver.py); auto picks by problem size so a
        KITTI-scale full-batch run never materializes the dense H."""
        from ceres_slam_tpu.solver import pcg as pcg_mod

        config = config or dense.SolveConfig(max_iters=100)
        K = self.num_states
        window = window or K
        n_obs_pad, n_pts_pad, _ = self._window_budget(window)
        solver = linear_solver
        if solver == "auto":
            solver = self.auto_linear_solver(window, n_pts_pad)
        if window < K:
            self.precompute_pair_alignments()
        summaries = []
        for k1 in range(0, K - window + 1):
            k2 = min(k1 + window, K)
            self.compute_initial_guess(k1, k2)
            problem, state, slots = self.build_window_problem(
                k1, k2, n_obs_pad, n_pts_pad, gauge_fix_first=True
            )
            if solver == "window":
                sol, summary = window_mod.solve_ba_window(
                    problem, state, config)
            elif solver == "pcg":
                sol, summary = pcg_mod.solve_ba_pcg(problem, state, config)
            else:
                sol, summary = dense.solve_ba(problem, state, config)
            self.absorb_window_solution(k1, k2, sol, slots)
            summaries.append(summary)
            self.reset_points()
        return summaries


@dataclasses.dataclass
class DatasetProblemSun(DatasetProblem):
    """Sun-aided sliding-window VO dataset (dataset_problem_sun.{hpp,cpp}).

    Adds per-observation full stereo covariances, per-state pose covariances
    for the sliding-window prior chain, and ENU ephemeris + camera-frame sun
    observations read from two extra CSVs (dataset_problem_sun.cpp:16-182).
    """

    pose_covars: np.ndarray = None  # [K, 6, 6]
    sun_dir_g: np.ndarray = None  # [K, 3]
    sun_obs_list: np.ndarray = None  # [K, 3]
    sun_obs_covars: np.ndarray = None  # [K, 2, 2]
    state_has_sun_obs: np.ndarray = None  # [K] bool

    @classmethod
    def read_csv(
        cls, track_file: str, ref_sun_file: str, obs_sun_file: str
    ) -> "DatasetProblemSun":
        self = cls()
        rows = csvio.read_numeric_csv(track_file)
        self._parse_header(rows, with_var_line=False)
        self._parse_obs(rows[self._header_lines :], with_covar=True)
        self._init_state()

        K = self.num_states
        # First pose covariance ~ exact (dataset_problem_sun.cpp:80)
        self.pose_covars = np.zeros((K, 6, 6))
        self.pose_covars[:] = 1e-12 * np.eye(6)

        self.sun_dir_g = np.zeros((K, 3))
        self.sun_obs_list = np.zeros((K, 3))
        self.sun_obs_covars = np.broadcast_to(np.eye(2), (K, 2, 2)).copy()
        self.state_has_sun_obs = np.zeros(K, bool)

        for row in csvio.read_numeric_csv(ref_sun_file):
            k = int(row[0])
            self.sun_dir_g[k] = row[1:4]
        for row in csvio.read_numeric_csv(obs_sun_file):
            k = int(row[0])
            self.sun_obs_list[k] = row[1:4]
            self.sun_obs_covars[k] = np.asarray(row[4:8]).reshape(2, 2)
            self.state_has_sun_obs[k] = True
        # normalize both directions (sun_sensor_error.hpp:30-31)
        def _norm(a):
            n = np.linalg.norm(a, axis=-1, keepdims=True)
            return np.where(n > 0, a / np.maximum(n, 1e-30), a)

        self.sun_dir_g = _norm(self.sun_dir_g)
        self.sun_obs_list = _norm(self.sun_obs_list)
        return self

    def write_csv(self, filename: str):
        """Poses only (dataset_problem_sun.cpp:184-233)."""
        base = filename.rsplit(".", 1)[0]
        csvio.write_poses_csv(base + "_poses.csv", self.poses)

    def compute_initial_guess(self, k1: int = 0, k2: int = 0) -> bool:
        """Returns False if any pair has <3 RANSAC inliers
        (dataset_problem_sun.cpp:324-327)."""
        return super().compute_initial_guess(k1, k2)

    def _window_sun(self, k1: int, k2: int) -> dense.SunObs:
        dt = self._dt
        if not hasattr(self, "_sun_stiffness_all"):
            self._sun_stiffness_all = se3np.inv_sqrt_psd(self.sun_obs_covars)
        return dense.SunObs(
            dir_c=jnp.asarray(self.sun_obs_list[k1:k2], dt),
            dir_g=jnp.asarray(self.sun_dir_g[k1:k2], dt),
            stiffness=jnp.asarray(self._sun_stiffness_all[k1:k2], dt),
            valid=jnp.asarray(self.state_has_sun_obs[k1:k2]),
        )

    def _window_prior(self, k1: int) -> dense.PosePrior:
        dt = self._dt
        covar = self.pose_covars[k1] + self._covar_floor * np.eye(6)
        return dense.PosePrior(
            pose_idx=jnp.asarray(0, jnp.int32),
            T_ref=jnp.asarray(self.poses[k1], dt),
            stiffness=jnp.asarray(se3np.inv_sqrt_psd(covar), dt),
            valid=jnp.asarray(True),
        )

    def solve_sliding_window(
        self,
        window: int = 2,
        use_sun: bool = False,
        huber_param: float = 0.0,
        az_err_thresh: float = 1000.0,
        zen_err_thresh: float = 1000.0,
        config: dense.SolveConfig | None = None,
        progress: bool = False,
        checkpoint: str | None = None,
        checkpoint_every: int = 25,
        strategy: str = "dogleg",
        scan: bool | None = None,
    ):
        """One pass of the flagship pipeline (tests/dataset_vo_sun.cpp:265-312):
        per window — VO initial guess, window solve with a pose prior from
        the previous window's covariance, covariance extraction for the
        next window's prior; on RANSAC failure, copy pose and covariance
        forward (:276-281).

        ``checkpoint`` enables periodic checkpoint-restart: the solver
        state (poses, covariance chain, window index) is persisted every
        ``checkpoint_every`` windows and the pass resumes from the last
        checkpoint if one exists (a capability the reference lacks,
        SURVEY.md §5.4).

        ``strategy`` selects the trust-region strategy per window solve;
        the default matches the reference flagship (DOGLEG/SUBSPACE_DOGLEG,
        tests/dataset_vo_sun.cpp:142-143).

        ``scan=None`` (default) runs the DEVICE-RESIDENT pass
        (`problems.scan_pipeline`: the whole sliding-window chain as one
        lax.scan — zero per-window host round trips, ~100x less relay
        latency on TPU); with ``checkpoint`` set the scan runs in
        checkpoint_every-sized chunks, persisting the carry between
        chunks. ``scan=False`` forces the host per-window loop."""
        from ceres_slam_tpu.utils import checkpoint as ckpt_mod

        config = config or dense.SolveConfig(max_iters=100)
        if scan is None:
            scan = True
        if scan:
            from ceres_slam_tpu.problems import scan_pipeline

            try:
                summaries, ok = scan_pipeline.solve_sliding_window_scan(
                    self, window=window or self.num_states, use_sun=use_sun,
                    huber_param=huber_param, az_err_thresh=az_err_thresh,
                    zen_err_thresh=zen_err_thresh, config=config,
                    strategy=strategy, progress=progress,
                    checkpoint=checkpoint, checkpoint_every=checkpoint_every,
                )
                return scan_pipeline.unstack_summaries(summaries, ok)
            except scan_pipeline.ScanReplicationError as e:
                # degrade to the host per-window loop (reference posture:
                # dataset_problem_sun.cpp:324-327 degrades, never dies)
                import sys

                print(f"  scan precompute diverged ({e}); "
                      "falling back to the host per-window loop",
                      file=sys.stderr)
                self.reset_points()  # clear partial precompute state
        K = self.num_states
        window = window or K
        n_obs_pad, n_pts_pad, o_pad = self._window_budget(window)
        self.precompute_pair_alignments()
        summaries = []
        k_start = 0
        ckpt_meta = {
            "window": window, "use_sun": bool(use_sun),
            "dataset": ckpt_mod.dataset_fingerprint(self),
        }
        if checkpoint:
            restored = ckpt_mod.load(checkpoint, meta=ckpt_meta)
            if restored is not None:
                k_start, arrays = restored
                self.poses[:] = arrays["poses"]
                self.pose_covars[:] = arrays["pose_covars"]
                if progress:
                    print(f"  resumed from checkpoint at window {k_start}")
        for k1 in range(k_start, K - window + 1):
            k2 = min(k1 + window, K)
            if self.compute_initial_guess(k1, k2):
                problem, state, slots = self.build_window_problem(
                    k1,
                    k2,
                    n_obs_pad,
                    n_pts_pad,
                    prior=self._window_prior(k1),
                    sun=self._window_sun(k1, k2) if use_sun else None,
                    sun_huber=huber_param if use_sun else 0.0,
                    az_err_thresh=az_err_thresh,
                    zen_err_thresh=zen_err_thresh,
                    gauge_fix_first=False,
                )
                # Scatter-free Schur window solver + covariance in one
                # device call (solver/window.py): the reduced S is 6K x 6K
                # (12 x 12 at the default window) vs the dense path's
                # [6K+3J]^2 factorization; on TPU/f32 it dispatches the
                # fused Pallas factor kernel.
                sol, summary, cov = window_mod.solve_ba_window_with_covariance(
                    problem, state, 1, config, strategy=strategy, O_pad=o_pad
                )
                self.absorb_window_solution(k1, k2, sol, slots)
                cov = np.asarray(cov)
                if np.all(np.isfinite(cov)):
                    self.pose_covars[k1 + 1] = cov
                else:
                    # covariance failure fallback (tests/dataset_vo_sun.cpp:172-177)
                    self.pose_covars[k1 + 1] = self.pose_covars[k1]
                summaries.append(summary)
            else:
                # RANSAC degeneracy fallback (tests/dataset_vo_sun.cpp:276-281)
                self.poses[k2 - 1] = self.poses[k1]
                self.pose_covars[k2 - 1] = self.pose_covars[k1]
            self.reset_points()
            if checkpoint and ((k1 + 1) % checkpoint_every == 0):
                ckpt_mod.save(
                    checkpoint,
                    k1 + 1,
                    {"poses": self.poses, "pose_covars": self.pose_covars},
                    meta=ckpt_meta,
                )
            if progress and (k1 % 50 == 0):
                print(f"  window [{k1},{k2}) done")
        if checkpoint and os.path.exists(checkpoint):
            os.unlink(checkpoint)  # pass completed; clear stale state
        return summaries
