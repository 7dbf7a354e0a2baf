"""Phong BA dataset layer (dataset_problem_phong.{hpp,cpp}).

Track CSV format (dataset_problem_phong.cpp:16-117): header ``K,J,M``;
intrinsics; stereo(3) + normal(3) + intensity(1) variances; initial light
position/direction; first GT pose 4x4; rows ``[t,j,m,u,v,d,I,nx,ny,nz]``.
Outputs three files (write_csv, :175-235): ``_poses.csv``, ``_map.csv``
(``point_id,x,y,z,nx,ny,nz,ka,ks,exponent,kd``), ``_lights.csv``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import lie
from ceres_slam_tpu.problems.dataset import _round_up
from ceres_slam_tpu.solver import lm as lm_mod
from ceres_slam_tpu.solver import phong as phong_mod
from ceres_slam_tpu.utils import csvio, se3np


@dataclasses.dataclass
class DatasetProblemPhong:
    camera: StereoCamera = None
    directional_light: bool = False
    num_states: int = 0
    num_vertices: int = 0
    num_materials: int = 0
    poses: np.ndarray = None  # [K, 12]
    vertex_positions: np.ndarray = None  # [J, 3]
    vertex_normals: np.ndarray = None  # [J, 3]
    material_of_vertex: np.ndarray = None  # [J] (filled from obs at init)
    materials: np.ndarray = None  # [M, 3] phong params
    textures: np.ndarray = None  # [M]
    light: np.ndarray = None  # [3]
    initialized_vertex: np.ndarray = None  # [J] bool
    # observations
    state_ids: np.ndarray = None  # [N] (timestamps mapped to state index)
    vertex_ids: np.ndarray = None
    material_ids: np.ndarray = None
    obs_list: np.ndarray = None  # [N, 3]
    int_list: np.ndarray = None  # [N]
    normal_obs_list: np.ndarray = None  # [N, 3]
    stereo_obs_var: np.ndarray = None  # [3]
    normal_obs_var: np.ndarray = None  # [3]
    int_var: float = 0.0
    ransac_iters: int = 400
    ransac_thresh: float = 9.0  # dataset_problem_phong.cpp:345
    rng_seed: int = 42
    dtype: str = "float64"

    # -- IO -------------------------------------------------------------

    @classmethod
    def read_csv(cls, filename: str, directional_light: bool = False):
        self = cls(directional_light=directional_light)
        rows = csvio.read_numeric_csv(filename)
        self.num_states = int(rows[0][0])
        self.num_vertices = int(rows[0][1])
        self.num_materials = int(rows[0][2])
        fu, fv, cu, cv, b = rows[1][:5]
        self.camera = StereoCamera.create(fu, fv, cu, cv, b)
        self.stereo_obs_var = np.asarray(rows[2][:3])
        self.normal_obs_var = np.asarray(rows[2][3:6])
        self.int_var = float(rows[2][6])
        self.light = np.asarray(rows[3][:3])
        if directional_light:
            self.light = self.light / np.linalg.norm(self.light)
        T_0_g = np.asarray(rows[4][:16]).reshape(4, 4)

        body = np.asarray(rows[5:])
        # Timestamps (column 0) may be arbitrary; map to dense state ids by
        # change-points, like the reference (dataset_problem_phong.cpp:121-134).
        t = body[:, 0]
        state_ids = np.concatenate([[0], np.cumsum(t[1:] != t[:-1])]).astype(np.int64)
        self.state_ids = state_ids
        self.vertex_ids = body[:, 1].astype(np.int64)
        self.material_ids = body[:, 2].astype(np.int64)
        self.obs_list = body[:, 3:6].copy()
        self.int_list = body[:, 6].copy()
        self.normal_obs_list = body[:, 7:10].copy()

        K, J, M = self.num_states, self.num_vertices, self.num_materials
        self.poses = np.zeros((K, 12))
        self.poses[:] = np.concatenate([np.zeros(3), np.eye(3).reshape(9)])
        self.poses[0] = np.concatenate([T_0_g[:3, 3], T_0_g[:3, :3].reshape(9)])
        self.vertex_positions = np.zeros((J, 3))
        self.vertex_normals = np.tile(np.array([0.0, 0.0, 1.0]), (J, 1))
        self.material_of_vertex = np.zeros(J, np.int64)
        for n in range(self.vertex_ids.size):
            self.material_of_vertex[self.vertex_ids[n]] = self.material_ids[n]
        self.materials = np.tile(np.array([0.0, 0.0, 1.0]), (M, 1))
        self.textures = np.full(M, 0.5)
        self.initialized_vertex = np.zeros(J, bool)
        self._state_obs = [np.nonzero(self.state_ids == k)[0] for k in range(K)]
        self._pts_c = np.asarray(self.camera.triangulate(jnp.asarray(self.obs_list)))
        max_matches = 1
        for k in range(1, K):
            m = np.intersect1d(
                self.vertex_ids[self._state_obs[k - 1]],
                self.vertex_ids[self._state_obs[k]],
            ).size
            max_matches = max(max_matches, m)
        self._match_pad = max(64, ((max_matches + 63) // 64) * 64)
        return self

    def obs_indices_at_state(self, k):
        return self._state_obs[k]

    def obs_indices_for_feature(self, j):
        return np.nonzero(self.vertex_ids == j)[0]

    def obs_indices_for_material(self, m):
        return np.nonzero(self.material_ids == m)[0]

    def reset_points(self):
        self.initialized_vertex[:] = False

    def write_csv(self, filename: str):
        base = filename.rsplit(".", 1)[0]
        csvio.write_poses_csv(base + "_poses.csv", self.poses)
        with open(base + "_map.csv", "w") as f:
            f.write("point_id, x, y, z, nx, ny, nz, ka, ks, exponent, kd\n")
            for j in range(self.num_vertices):
                if self.initialized_vertex[j]:
                    m = self.material_of_vertex[j]
                    vals = (
                        list(self.vertex_positions[j])
                        + list(self.vertex_normals[j])
                        + list(self.materials[m])
                        + [self.textures[m]]
                    )
                    f.write(f"{j}," + ",".join(repr(float(x)) for x in vals) + "\n")
        with open(base + "_lights.csv", "w") as f:
            f.write("i, j, k\n" if self.directional_light else "x, y, z\n")
            f.write(",".join(repr(float(x)) for x in self.light) + "\n")

    # -- initial guess (dataset_problem_phong.cpp:251-391) ----------------

    def precompute_pair_alignments(self, chunk: int = 64):
        """Batched RANSAC for all consecutive frame pairs (the stereo
        dataset's treatment, problems/dataset.py): K-1 sequential
        `ransac_align` dispatches cost ~60 ms relay latency EACH — the
        sequential initial-guess loop dominated the Phong app's chip
        wall (r5: 48 s app vs <1 s solver). Idempotent."""
        if getattr(self, "_pair_T", None) is not None:
            return
        from ceres_slam_tpu.problems.dataset import run_batched_ransac

        K = self.num_states
        P = self._match_pad
        dt = jnp.dtype(self.dtype)
        pts0 = np.zeros((K, P, 3), dt)
        pts1 = np.zeros((K, P, 3), dt)
        valid = np.zeros((K, P), bool)
        for k in range(1, K):
            idx_a, idx_b = self._pair_match(k)
            M_ = idx_a.size
            pts0[k, :M_] = self._pts_c[idx_a]
            pts1[k, :M_] = self._pts_c[idx_b]
            valid[k, :M_] = True
        self._pair_T, self._pair_inliers, _ = run_batched_ransac(
            self.camera, pts0, pts1, valid, self.rng_seed,
            self.ransac_iters, self.ransac_thresh, chunk)

    def _pair_match(self, k: int):
        idx_a = self._state_obs[k - 1]
        idx_b = self._state_obs[k]
        _, ia, ib = np.intersect1d(
            self.vertex_ids[idx_a], self.vertex_ids[idx_b],
            return_indices=True)
        return idx_a[ia], idx_b[ib]

    def compute_initial_guess(self, k1: int = 0, k2: int = 0):
        if k1 >= k2:
            k1, k2 = 0, self.num_states
        self.precompute_pair_alignments()

        # Material init: phong = (0,0,1); texture = median observed
        # intensity over the material's observations (:266-278).
        for m in range(self.num_materials):
            self.materials[m] = [0.0, 0.0, 1.0]
            ints = self.int_list[self.obs_indices_for_material(m)]
            if ints.size:
                half = ints.size // 2
                self.textures[m] = np.partition(ints, half)[half]

        for k in range(k1 + 1, k2):
            idx_a, idx_b = self._pair_match(k)
            M_ = idx_a.size
            if M_ < 3:
                # Degenerate pair: carry the previous pose forward (the
                # sun driver's failure fallback, tests/dataset_vo_sun.cpp:276-281)
                # rather than leaving the default identity.
                self.poses[k] = self.poses[k - 1]
                continue
            self.poses[k] = se3np.compose(self._pair_T[k], self.poses[k - 1])
            inl = self._pair_inliers[k, :M_]
            jj = self.vertex_ids[idx_a[inl]]
            new = ~self.initialized_vertex[jj]
            if np.any(new):
                T_inv = se3np.inverse(self.poses[k - 1])
                p_g = se3np.transform_point(T_inv, self._pts_c[idx_a[inl]])
                n_g = se3np.transform_vector(T_inv, self.normal_obs_list[idx_a[inl]])
                self.vertex_positions[jj[new]] = p_g[new]
                norms = np.linalg.norm(n_g[new], axis=-1, keepdims=True)
                self.vertex_normals[jj[new]] = n_g[new] / np.maximum(norms, 1e-12)
                self.initialized_vertex[jj[new]] = True

    # -- solving -----------------------------------------------------------

    def _window_budget(self, window: int):
        """Static pad sizes (obs, active vertices) across all windows, so
        every window solve reuses ONE compiled XLA program (the reference
        rebuilds a ceres::Problem per window; unpadded shapes here would
        mean a fresh ~seconds-long compile per window)."""
        K = self.num_states
        max_obs, max_vtx = 1, 1
        for k1 in range(0, K - window + 1):
            sel = np.concatenate(self._state_obs[k1 : k1 + window])
            max_obs = max(max_obs, sel.size)
            max_vtx = max(max_vtx, np.unique(self.vertex_ids[sel]).size)
        return _round_up(max_obs), _round_up(max_vtx)

    def build_window_problem(self, k1: int, k2: int, n_obs_pad: int,
                             n_vtx_pad: int):
        """Padded PhongBAProblem + PhongState for window [k1, k2): only the
        window's active vertices ride along (slotted into [0, n_vtx_pad)),
        not the full global vertex set; materials/textures/light are global
        shared blocks (dataset_problem_phong.cpp:266-278) and stay whole."""
        from ceres_slam_tpu.ops import factors as factors_mod

        Kw = k2 - k1
        sel = np.concatenate(self._state_obs[k1:k2])
        slots, local_v = np.unique(self.vertex_ids[sel], return_inverse=True)
        n_obs, n_vtx = sel.size, slots.size
        assert n_obs <= n_obs_pad and n_vtx <= n_vtx_pad, "pad budget too small"

        dt = jnp.dtype(self.dtype)
        uvd = np.zeros((n_obs_pad, 3))
        uvd[:n_obs] = self.obs_list[sel]
        ints = np.zeros(n_obs_pad)
        ints[:n_obs] = self.int_list[sel]
        nobs = np.tile(np.array([0.0, 0.0, 1.0]), (n_obs_pad, 1))
        nobs[:n_obs] = self.normal_obs_list[sel]
        pose_idx = np.zeros(n_obs_pad, np.int32)
        pose_idx[:n_obs] = self.state_ids[sel] - k1
        vertex_idx = np.zeros(n_obs_pad, np.int32)
        vertex_idx[:n_obs] = local_v
        material_idx = np.zeros(n_obs_pad, np.int32)
        material_idx[:n_obs] = self.material_ids[sel]
        valid = np.zeros(n_obs_pad, bool)
        valid[:n_obs] = True
        vertex_valid = np.zeros(n_vtx_pad, bool)
        vertex_valid[:n_vtx] = self.initialized_vertex[slots]

        obs = phong_mod.PhongObs(
            uvd=jnp.asarray(uvd, dt),
            int_obs=jnp.asarray(ints, dt),
            normal_obs=jnp.asarray(nobs, dt),
            pose_idx=jnp.asarray(pose_idx),
            vertex_idx=jnp.asarray(vertex_idx),
            material_idx=jnp.asarray(material_idx),
            valid=jnp.asarray(valid),
        )
        problem = phong_mod.PhongBAProblem(
            camera=self.camera.astype(dt),
            obs=obs,
            stereo_stiffness=factors_mod.inv_sqrt_psd(jnp.diag(jnp.asarray(self.stereo_obs_var, dt))),
            normal_stiffness=factors_mod.inv_sqrt_psd(jnp.diag(jnp.asarray(self.normal_obs_var, dt))),
            int_stiffness=jnp.asarray(1.0 / np.sqrt(self.int_var), dt),
            fixed_pose_mask=jnp.zeros(Kw, bool).at[0].set(True),
            vertex_valid=jnp.asarray(vertex_valid),
        )
        pts = np.zeros((n_vtx_pad, 3))
        pts[:n_vtx] = self.vertex_positions[slots]
        nrm = np.tile(np.array([0.0, 0.0, 1.0]), (n_vtx_pad, 1))  # unit pad:
        # the tangent projector of a zero normal would be singular
        nrm[:n_vtx] = self.vertex_normals[slots]
        state = phong_mod.PhongState(
            poses=jnp.asarray(self.poses[k1:k2], dt),
            points=jnp.asarray(pts, dt),
            normals=jnp.asarray(nrm, dt),
            phong=jnp.asarray(self.materials, dt),
            textures=jnp.asarray(self.textures, dt),
            light=jnp.asarray(self.light, dt),
        )
        return problem, state, slots

    def absorb_window_solution(self, k1, k2, sol: "phong_mod.PhongState",
                               slots: np.ndarray):
        self.poses[k1:k2] = np.asarray(sol.poses)
        upd = self.initialized_vertex[slots]
        self.vertex_positions[slots[upd]] = np.asarray(sol.points)[: slots.size][upd]
        self.vertex_normals[slots[upd]] = np.asarray(sol.normals)[: slots.size][upd]
        # np.array (copy): np.asarray of a jax buffer is read-only, and the
        # next window's initial guess writes these in place
        self.materials = np.array(sol.phong)
        self.textures = np.array(sol.textures)
        self.light = np.array(sol.light)

    def solve_full(
        self,
        window: int = 0,
        use_light: bool = True,
        multistage: bool = False,
        config: lm_mod.SolveConfig | None = None,
        linear_solver: str = "auto",
    ):
        """The dataset_ba_phong pipeline (tests/dataset_ba_phong.cpp:298-331):
        full-trajectory initial guess, then (windowed or full-batch)
        staged solves."""
        config = config or lm_mod.SolveConfig(max_iters=100)
        K = self.num_states
        window = window or K
        n_obs_pad, n_vtx_pad = self._window_budget(window)
        if window < K:
            # The reference driver VO-initializes the FULL chain before the
            # window loop (dataset_ba_phong.cpp:306); the per-window call
            # below only re-inits materials when k1 > 0 (its pose loop
            # range(k2, k2) is empty), so without this, poses past the
            # first window would enter their window at identity.
            self.compute_initial_guess()
        all_summaries = []
        for k1 in range(0, K - window + 1):
            k2 = min(k1 + window, K)
            # Initial guess: full chain for the first window, then only the
            # newly entered frame (tests/dataset_ba_phong.cpp:318-326).
            if k1 > 0:
                self.compute_initial_guess(k2 - 1, k2)
            else:
                self.compute_initial_guess(k1, k2)
            problem, state, slots = self.build_window_problem(
                k1, k2, n_obs_pad, n_vtx_pad
            )
            sol, summaries = phong_mod.solve_phong_staged(
                problem, state, config,
                use_light=use_light,
                directional=self.directional_light,
                multistage=multistage,
                linear_solver=linear_solver,
            )
            self.absorb_window_solution(k1, k2, sol, slots)
            all_summaries.extend(summaries)
        return all_summaries
