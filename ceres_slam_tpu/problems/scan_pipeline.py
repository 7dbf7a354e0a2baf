"""Device-resident sliding-window pass: the whole flagship pipeline as
ONE ``lax.scan`` over windows.

The host sliding-window loop (`DatasetProblemSun.solve_sliding_window`)
makes ~3 device round trips per window (problem upload, solve, pose +
covariance fetch); through this sandbox's ~30 ms-latency TPU relay that
is ~250 ms/window — 100x the ~2 ms the window solve actually takes on
chip (measured: BASELINE.md flagship table). The reference's windows are
inherently sequential (the covariance-prior chain,
tests/dataset_vo_sun.cpp:159-183 -> :109-124), but NOTHING about each
window's problem STRUCTURE depends on solved values:

- the VO pair transforms come from RANSAC over triangulated camera-frame
  point clouds (precomputed batched, `precompute_pair_alignments`);
- which observations/landmarks enter a window, their slot layout, and
  which landmarks get initialized are functions of the (static)
  observation graph and the (static) RANSAC inlier sets;
- only the carried pose chain and the 6x6 prior covariance flow between
  windows.

So: precompute every per-window static (window layouts, slot-ordered
observations, sun slices, camera-frame init points + their init frame,
pair transforms, degeneracy flags) STACKED over windows on the host,
upload once, and run the sequential chain as a `lax.scan` whose carry is
(poses [K,12], prior covariance [6,6]). Per-window work on device: the
SE(3) compounding chain, landmark initialization, the trust-region
window solve (fused Pallas factor kernel on TPU), tangent covariance
extraction, and the reference's fallback semantics
(dataset_problem_sun.cpp:324-327, dataset_vo_sun.cpp:172-181) as
`where`-selects. One compile per pass shape; zero host round trips
inside the pass.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ceres_slam_tpu.ops import lie
from ceres_slam_tpu.solver import dense
from ceres_slam_tpu.solver import window as window_mod


def _scan_fused(interpret: bool, M_pad: int, dt) -> bool:
    """Whether the scan's window step uses the fused Pallas factor
    kernel. History: the r3/r4 TPU compile of scan-of-pallas_call failed
    in the remote compile helper; r5 isolated the trigger to GRIDDED
    pallas_call inside lax.scan (any kernel — results/r5/
    probe_pallas_scan.log) and the single-tile whole-block variant
    (pallas_kernels._window_kernel_single) now compiles and runs on
    chip. Measured on triangle200 the fused scan is within noise of the
    pure-XLA step (the scan already amortizes dispatch latency, which is
    what the kernel exists to cut), so the default stays XLA; set
    CSTPU_SCAN_FUSED=1 to enable where the factor pass dominates."""
    if interpret or M_pad != 512 or jnp.dtype(dt) != jnp.float32:
        return False
    return os.environ.get("CSTPU_SCAN_FUSED") == "1"


class ScanReplicationError(RuntimeError):
    """The scan precompute's init-structure replication diverged from
    `compute_initial_guess`. Callers degrade to the host per-window loop
    (reference posture: degrade, don't die —
    dataset_problem_sun.cpp:324-327)."""


class PassStatics(NamedTuple):
    """Stacked [W, ...] per-window statics (host-built)."""

    k1: jnp.ndarray  # [W] window start pose
    # slot-ordered stereo observations (window layout order)
    uvd: jnp.ndarray  # [W, M, 3]
    stiff: jnp.ndarray  # [W, M, 3, 3]
    pose_idx: jnp.ndarray  # [W, M]
    valid: jnp.ndarray  # [W, M]
    point_valid: jnp.ndarray  # [W, J]
    # layout one-hots / lane-major fused statics
    onehot: jnp.ndarray  # [W, M, Kw]
    onehotT: jnp.ndarray  # [W, Kw, M_pad]
    uvdT: jnp.ndarray  # [W, 3, M_pad]
    stiffT: jnp.ndarray  # [W, 9, M_pad]
    weightT: jnp.ndarray  # [W, 1, M_pad]
    pose_freeT: jnp.ndarray  # [W, 1, M_pad]
    onehot_jok: jnp.ndarray  # [W, J, O, Kw]
    # sun observations per window
    sun_dir_c: jnp.ndarray  # [W, Kw, 3]
    sun_dir_g: jnp.ndarray  # [W, Kw, 3]
    sun_stiff: jnp.ndarray  # [W, Kw, 2, 2]
    sun_valid: jnp.ndarray  # [W, Kw]
    # landmark initialization (camera-frame point + which chain frame)
    pts_c: jnp.ndarray  # [W, J, 3]
    init_frame: jnp.ndarray  # [W, J] int32 in [0, Kw)
    # VO chain
    T_rel: jnp.ndarray  # [W, Kw-1, 12]
    ransac_ok: jnp.ndarray  # [W] bool
    # last chain row the host loop writes before a RANSAC failure (the
    # failing window's earlier pairs still compound, dataset_problem.cpp:
    # 241 runs before the failure return); Kw-1 when the window is ok
    n_chain: jnp.ndarray  # [W] int32
    # False = no-op pad window (chunked checkpointing pads the last chunk
    # to the fixed chunk shape); the carry passes through unchanged
    active: jnp.ndarray  # [W] bool


def _host_cpu_ctx():
    """Shared host-CPU pinning (utils.hostdev.host_cpu_ctx)."""
    from ceres_slam_tpu.utils.hostdev import host_cpu_ctx

    return host_cpu_ctx()


def host_statics_cached(ds, window: int, progress: bool = False):
    """Host-resident PassStatics, cached on ``ds`` (one cache shared by
    the single-run and batched paths). Restores the dataset's pose/
    landmark state afterwards: the replication sweep dead-reckons the
    whole chain through ``ds.poses``, and callers must not observe that.
    """
    import sys
    import time as _time

    cached = getattr(ds, "_scan_statics_host", None)
    if cached is not None and cached[0] == window:
        return cached[1]
    _t0 = _time.perf_counter()
    ds.precompute_pair_alignments()
    _t1 = _time.perf_counter()
    poses_snap = ds.poses.copy()
    inited_snap = ds.initialized_point.copy()
    try:
        with _host_cpu_ctx():
            out = _precompute_pass_host(ds, window)
    finally:
        # restore on EVERY exit — the replication sweep dead-reckons
        # through ds.poses, and ScanReplicationError is an expected exit
        # (callers degrade to the host loop on it, which must start from
        # the untouched dataset state)
        ds.poses[:] = poses_snap
        ds.initialized_point[:] = inited_snap
    ds._scan_statics_host = (window, out)
    if progress:
        print(f"    statics: ransac {_t1 - _t0:.1f}s, "
              f"host build {_time.perf_counter() - _t1:.1f}s",
              file=sys.stderr, flush=True)
    return out


def precompute_pass(ds, window: int, progress: bool = False):
    """Device-resident PassStatics for a pass (cached on ``ds``).

    Statics include the sun observations — whether a pass USES them is a
    runtime flag in the scan, so the VO-only and VO+sun passes share both
    this precompute and one compiled program.

    The per-window builders create jax arrays; on a TPU backend every one
    would be a separate relay upload (~23/window: measured 235 s for a
    200-state pass). They are pinned to the host CPU backend
    (`host_statics_cached`) — only the final stacked statics move to the
    accelerator, once.
    """
    cached = getattr(ds, "_scan_statics", None)
    if cached is not None and cached[0] == window:
        return cached[1]
    statics, point_idx, O, M_pad = host_statics_cached(ds, window, progress)
    # one bulk transfer to the accelerator; cached so the second pass
    # reuses the resident copies
    out = (jax.device_put(statics), jax.device_put(point_idx), O, M_pad)
    ds._scan_statics = (window, out)
    return out


def _precompute_pass_host(ds, window: int):
    K = ds.num_states
    dt = ds._dt
    n_obs_pad, n_pts_pad, o_pad = ds._window_budget(window)
    W = K - window + 1
    J = n_pts_pad

    fields = {name: [] for name in PassStatics._fields}
    point_idx = None
    O = M = M_pad = None
    for k1 in range(W):
        k2 = k1 + window
        ok = ds.compute_initial_guess(k1, k2)
        problem, state, slots = ds.build_window_problem(
            k1, k2, n_obs_pad, n_pts_pad, prior=None,
            sun=ds._window_sun(k1, k2),
            gauge_fix_first=False,
        )
        layout = window_mod.build_window_layout(
            problem, window, n_pts_pad, O_pad=o_pad)
        st = layout.problem.stereo
        O, M = layout.O, st.uvd.shape[0]
        M_pad = layout.uvdT.shape[1]
        point_idx = np.asarray(st.point_idx)
        # landmark init statics: first-winning pair initializes a
        # landmark from frame k-1's triangulation (dataset_problem.cpp:
        # 245-255); replicate structure (values are state-independent)
        glob2loc = {g: i for i, g in enumerate(slots)}
        pts_c = np.zeros((J, 3))
        init_frame = np.zeros(J, np.int32)
        inited = np.zeros(J, bool)
        ransac_ok = True
        n_chain = k2 - 1 - k1
        for k in range(k1 + 1, k2):
            idx_a, idx_b = ds._pair_match(k)
            Mm = idx_a.size
            if Mm < 3 or ds._pair_num_inliers[k] < 3:
                ransac_ok = False
                n_chain = k - 1 - k1
                break
            inl = ds._pair_inliers[k][:Mm]
            for oa, g in zip(idx_a[inl], ds.point_ids[idx_a[inl]]):
                loc = glob2loc.get(g)
                if loc is None or inited[loc]:
                    continue
                inited[loc] = True
                pts_c[loc] = ds._pts_c[oa]
                init_frame[loc] = k - 1 - k1
        if ok != ransac_ok:
            raise ScanReplicationError(
                f"window [{k1},{k2}): compute_initial_guess={ok} but "
                f"replication={ransac_ok}")

        fields["k1"].append(k1)
        fields["uvd"].append(np.asarray(st.uvd))
        fields["stiff"].append(np.asarray(st.stiffness))
        fields["pose_idx"].append(np.asarray(st.pose_idx))
        fields["valid"].append(np.asarray(st.valid))
        fields["point_valid"].append(np.asarray(problem.point_valid))
        fields["onehot"].append(np.asarray(layout.onehot))
        fields["onehotT"].append(np.asarray(layout.onehotT))
        fields["uvdT"].append(np.asarray(layout.uvdT))
        fields["stiffT"].append(np.asarray(layout.stiffT))
        fields["weightT"].append(np.asarray(layout.weightT))
        fields["pose_freeT"].append(np.asarray(layout.pose_freeT))
        fields["onehot_jok"].append(np.asarray(layout.onehot_jok))
        sun = problem.sun
        fields["sun_dir_c"].append(np.asarray(sun.dir_c))
        fields["sun_dir_g"].append(np.asarray(sun.dir_g))
        fields["sun_stiff"].append(np.asarray(sun.stiffness))
        fields["sun_valid"].append(np.asarray(sun.valid))
        fields["pts_c"].append(pts_c)
        fields["init_frame"].append(init_frame)
        fields["T_rel"].append(
            np.stack([ds._pair_T[k] for k in range(k1 + 1, k2)]))
        fields["ransac_ok"].append(ransac_ok)
        fields["n_chain"].append(np.int32(n_chain))
        fields["active"].append(True)
        ds.reset_points()

    # Solver-facing floats are cast to the solve dtype; the VO-chain
    # inputs (pair transforms, camera-frame init points) STAY f64 — the
    # host path compounds the chain in f64 numpy (se3np), and an f32
    # compounding chain drifts measurably over hundreds of windows.
    chain_fields = {"T_rel", "pts_c"}
    stacked = {}
    for name, vals in fields.items():
        arr = np.stack(vals)
        if arr.dtype.kind == "f" and name not in chain_fields:
            arr = arr.astype(dt)
        stacked[name] = jnp.asarray(arr)
    statics = PassStatics(**stacked)
    return statics, jnp.asarray(point_idx), O, M_pad


def _inv_sqrt_psd6(C):
    """Device 6x6 inverse matrix square root (f64 for the 1e-12-scale
    prior chain, cast back by the caller). Uses `jnp.linalg.eigh`: A/B
    executable-size measurement (r5, cache_flagship v1 vs v2) showed the
    in-scan eigh lowering is COMPACT here (scan program 7.1 MB) while a
    cyclic-Jacobi fori_loop body gets clone-duplicated by the TPU loop
    optimizer to 13 MB — the opposite of the aligner situation
    (lie.nearest_rotation docstring)."""
    w, V = jnp.linalg.eigh(C)
    w = jnp.clip(w, 1e-300, None)
    return (V * (1.0 / jnp.sqrt(w))[None, :]) @ V.T


def _scan_core(statics: PassStatics, point_idx, poses0, cov0, camera,
               sun_huber, az_thresh, zen_thresh, covar_floor, use_sun,
               Kw, O, config, strategy, fused, interpret):
    # SOLVE dtype comes from the statics (ds._dt), NOT from the carried
    # pose chain: the chain is deliberately f64 (compounding drift), and
    # taking its dtype silently promoted every "f32" window solve to f64
    # (caught r4 when the fused kernel's hard-coded f32 blocks refused to
    # trace against f64 states)
    dt = statics.uvd.dtype
    J = statics.point_valid.shape[1]
    cov_dtype = cov0.dtype  # f64 when x64 on (the prior chain needs it)

    def step(carry, w):
        # poses_full stays f64 (chain math); cov_full is the whole [K,6,6]
        # covariance array, carried so the host loop's FALLBACK INDEXING
        # is replicated exactly at any window size: success writes k1+1,
        # RANSAC failure writes the stale prior into k2-1 and leaves k1+1
        # untouched (tests/dataset_vo_sun.cpp:276-281 vs :159-183)
        poses_full, cov_full = carry
        k1 = w.k1
        prior_cov = jax.lax.dynamic_slice(
            cov_full, (k1, 0, 0), (1, 6, 6))[0]
        # --- VO chain: compound pair transforms onto the carried pose
        # (f64, matching the host path's se3np chain — an f32 chain
        # drifts over hundreds of windows)
        chain = [jax.lax.dynamic_slice(poses_full, (k1, 0), (1, 12))[0]]
        for t in range(Kw - 1):
            chain.append(lie.se3_compose(w.T_rel[t], chain[-1]))
        chain64 = jnp.stack(chain)  # [Kw, 12] f64
        chain_poses = chain64.astype(dt)
        # --- landmark init: p_g = T_f^{-1} * p_c at each slot's frame
        T_inv = lie.se3_inverse(chain64)[w.init_frame]  # [J, 12]
        p_g = lie.se3_transform_point(T_inv, w.pts_c)
        p_g = jnp.where(w.point_valid[:, None], p_g, 0.0).astype(dt)
        # --- prior from the carried covariance
        floor = covar_floor * jnp.eye(6, dtype=cov_dtype)
        prior = dense.PosePrior(
            pose_idx=jnp.asarray(0, jnp.int32),
            T_ref=chain_poses[0],
            stiffness=_inv_sqrt_psd6(prior_cov + floor).astype(dt),
            valid=jnp.asarray(True),
        )
        # use_sun is a TRACED flag so the VO-only and VO+sun passes share
        # one compiled program (compile is minutes through the relay)
        sun = dense.SunObs(dir_c=w.sun_dir_c, dir_g=w.sun_dir_g,
                           stiffness=w.sun_stiff,
                           valid=w.sun_valid & use_sun)
        stereo = dense.StereoObs(
            uvd=w.uvd, stiffness=w.stiff,
            pose_idx=w.pose_idx.astype(jnp.int32),
            point_idx=point_idx.astype(jnp.int32), valid=w.valid,
        )
        problem = dense.StereoBAProblem(
            camera=camera, stereo=stereo, sun=sun, prior=prior,
            fixed_pose_mask=jnp.zeros(Kw, bool),
            point_valid=w.point_valid,
            sun_huber=sun_huber, az_err_thresh=az_thresh,
            zen_err_thresh=zen_thresh,
        )
        layout = window_mod.WindowLayout(
            problem=problem, onehot=w.onehot, O=O, onehotT=w.onehotT,
            uvdT=w.uvdT, stiffT=w.stiffT, weightT=w.weightT,
            pose_freeT=w.pose_freeT, onehot_jok=w.onehot_jok,
        )
        state0 = dense.BAState(poses=chain_poses, points=p_g)
        state, summary, blocks = window_mod._run_loop(
            layout, problem, state0, config, fused, interpret, strategy)
        # --- tangent covariance of local pose 1 (next window's prior),
        # mirroring window._solve_cov_jit
        Hpp_aux, _ = window_mod._masked_aux_blocks(problem, state, cov_dtype)
        cov = window_mod.pose_marginal_covariance(
            blocks.Hpp.astype(cov_dtype) + Hpp_aux,
            blocks.Hll.astype(cov_dtype), blocks.U_jo.astype(cov_dtype),
            w.onehot_jok.astype(cov_dtype), 1,
        )
        # --- fallbacks (reference semantics)
        cov_ok = jnp.all(jnp.isfinite(cov))
        # success: write cov (or, on covariance failure, the stale prior,
        # tests/dataset_vo_sun.cpp:172-177) at k1+1; RANSAC failure: write
        # the stale prior at k2-1 (:276-281). Same index at window 2.
        write_val = jnp.where(w.ransac_ok & cov_ok, cov, prior_cov)
        write_idx = jnp.where(w.ransac_ok, k1 + 1, k1 + Kw - 1)
        cov_full_new = jax.lax.dynamic_update_slice(
            cov_full, write_val[None], (write_idx, 0, 0))
        # RANSAC degeneracy: the host loop's exact partial-chain writes —
        # rows up to the failing pair keep their compounded VO values,
        # later rows stay stale, and k2-1 gets pose k1 copied in
        old_rows = jax.lax.dynamic_slice(poses_full, (k1, 0), (Kw, 12))
        chain_valid = jnp.arange(Kw) <= w.n_chain
        fb_rows = jnp.where(chain_valid[:, None],
                            chain64.astype(poses_full.dtype), old_rows)
        fb_rows = fb_rows.at[Kw - 1].set(old_rows[0])
        new_rows = jnp.where(w.ransac_ok,
                             state.poses.astype(poses_full.dtype), fb_rows)
        new_poses_full = jax.lax.dynamic_update_slice(poses_full, new_rows,
                                                      (k1, 0))
        # inactive pad windows (chunked checkpointing) are no-ops
        poses_full = jnp.where(w.active, new_poses_full, poses_full)
        cov_full = jnp.where(w.active, cov_full_new, cov_full)
        return (poses_full, cov_full), summary

    (poses_full, cov_full), summaries = jax.lax.scan(
        step, (poses0, cov0), statics)
    return poses_full, summaries, cov_full


_run_scan = partial(jax.jit, static_argnames=(
    "Kw", "O", "config", "strategy", "fused", "interpret"))(_scan_core)


@partial(jax.jit, static_argnames=(
    "Kw", "O", "config", "strategy", "fused", "interpret"))
def _run_scan_batch(statics, point_idx, poses0, cov0, camera,
                    sun_huber, az_thresh, zen_thresh, covar_floor, use_sun,
                    Kw, O, config, strategy, fused, interpret):
    """vmap of the scan pass over a leading batch of INDEPENDENT runs
    (sequences x sun configurations): the single-chain windows are
    latency/serialization-bound (chip >95% idle, solver/window.py:7), so
    concurrent chains are nearly free — the whole ba_all_sims grid solves
    in ~the wall time of one sequence."""

    def one(statics, point_idx, poses0, cov0, camera, sun_huber,
            az_thresh, zen_thresh, use_sun):
        return _scan_core(statics, point_idx, poses0, cov0, camera,
                          sun_huber, az_thresh, zen_thresh, covar_floor,
                          use_sun, Kw, O, config, strategy, fused,
                          interpret)

    return jax.vmap(one)(statics, point_idx, poses0, cov0, camera,
                         sun_huber, az_thresh, zen_thresh, use_sun)


def _chunk_statics(statics: PassStatics, c0: int, c1: int, C: int):
    """Slice windows [c0, c1) and pad to the fixed chunk length C with
    inactive (no-op) copies of the last window, so every chunk shares one
    compiled program."""
    n = c1 - c0

    def slc(x):
        part = x[c0:c1]
        if n < C:
            part = jnp.concatenate(
                [part, jnp.repeat(part[-1:], C - n, axis=0)], axis=0)
        return part

    ch = jax.tree_util.tree_map(slc, statics)
    return ch._replace(active=ch.active & (jnp.arange(C) < n))


def solve_sliding_window_scan(
    ds, window: int = 2, use_sun: bool = False, huber_param: float = 0.0,
    az_err_thresh: float = 1000.0, zen_err_thresh: float = 1000.0,
    config: dense.SolveConfig | None = None, strategy: str = "dogleg",
    progress: bool = False, checkpoint: str | None = None,
    checkpoint_every: int = 25,
):
    """Drop-in device-resident counterpart of
    `DatasetProblemSun.solve_sliding_window`. Returns
    ``(stacked summaries, per-window ransac_ok mask)``.

    ``checkpoint`` keeps the pass device-resident while adding
    checkpoint-restart: the scan runs in fixed-size chunks of
    ``checkpoint_every`` windows (one compiled program — the last chunk
    is padded with inactive no-op windows) and the carry — (poses,
    pose-covariance array), exactly the checkpoint payload — is persisted
    between chunks. Resume restores the carry and re-enters at the next
    chunk boundary."""
    from ceres_slam_tpu.utils import checkpoint as ckpt_mod

    import time as _time

    config = config or dense.SolveConfig(max_iters=100)
    dt = ds._dt
    _t0 = _time.perf_counter()
    statics, point_idx, O, M_pad = precompute_pass(ds, window)
    W = int(statics.k1.shape[0])
    if progress:
        print(f"  scan pass: {W} windows, O={O}, M_pad={M_pad} "
              f"(precompute {_time.perf_counter() - _t0:.1f}s)", flush=True)
    interpret = jax.devices()[0].platform != "tpu"
    fused = _scan_fused(interpret, M_pad, dt)
    cov_dtype = (jnp.float64 if jax.config.jax_enable_x64
                 else jnp.asarray(0.0, dt).dtype)
    chain_dtype = jnp.float64 if jax.config.jax_enable_x64 else dt

    k_start = 0
    ckpt_meta = {
        "window": window, "use_sun": bool(use_sun),
        "dataset": ckpt_mod.dataset_fingerprint(ds),
    }
    if checkpoint:
        restored = ckpt_mod.load(checkpoint, meta=ckpt_meta)
        if restored is not None:
            k_start, arrays = restored
            ds.poses[:] = arrays["poses"]
            ds.pose_covars[:] = arrays["pose_covars"]
            if progress:
                print(f"  resumed from checkpoint at window {k_start}",
                      flush=True)

    def run(chunk, poses0, cov0):
        return _run_scan(
            chunk, point_idx, poses0, cov0, ds._camera_dt,
            jnp.asarray(float(huber_param), dt),
            jnp.asarray(float(az_err_thresh), dt),
            jnp.asarray(float(zen_err_thresh), dt),
            jnp.asarray(ds._covar_floor, cov_dtype),
            jnp.asarray(bool(use_sun)),
            window, O, config, strategy, fused, interpret,
        )

    poses0 = jnp.asarray(ds.poses, chain_dtype)
    cov0 = jnp.asarray(ds.pose_covars, cov_dtype)
    if not checkpoint:
        _t1 = _time.perf_counter()
        poses_full, summaries, cov_full = run(statics, poses0, cov0)
        if progress:
            float(jnp.sum(poses_full))  # force completion for the timing
            print(f"  scan solve: {_time.perf_counter() - _t1:.1f}s "
                  f"({W} windows)", flush=True)
    else:
        C = max(1, int(checkpoint_every))
        parts = []
        for c0 in range(k_start, W, C):
            c1 = min(c0 + C, W)
            chunk = _chunk_statics(statics, c0, c1, C)
            poses0, s, cov0 = run(chunk, poses0, cov0)
            parts.append(jax.tree_util.tree_map(
                lambda x: np.asarray(x)[: c1 - c0], s))
            ckpt_mod.save(checkpoint, c1, {
                "poses": np.asarray(poses0, np.float64),
                "pose_covars": np.asarray(cov0, np.float64)},
                meta=ckpt_meta)
            if progress:
                print(f"  checkpointed at window {c1}/{W}", flush=True)
        poses_full, cov_full = poses0, cov0
        # (a resume at/past the last window leaves no chunks to run)
        summaries = (jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs, axis=0), *parts)
            if parts else [])
    ds.poses[:] = np.asarray(poses_full, np.float64)
    ds.pose_covars[:] = np.asarray(cov_full, np.float64)
    ds.reset_points()
    if checkpoint and os.path.exists(checkpoint):
        os.unlink(checkpoint)  # pass completed; clear stale state
    # failed windows append no summary in the host loop
    return summaries, np.asarray(statics.ransac_ok)[k_start:W]


def unstack_summaries(summaries, ok=None):
    """Stacked scan outputs -> list of per-window summaries (the host
    loop's return shape, consumed by apps.common.print_reports). ``ok``
    (the per-window ransac_ok mask) drops failed windows — the host loop
    appends no summary for them."""
    leaves = jax.tree_util.tree_leaves(summaries)
    if not leaves:
        return []
    n = int(leaves[0].shape[0])
    arrs = jax.tree_util.tree_map(np.asarray, summaries)
    keep = range(n) if ok is None else np.nonzero(np.asarray(ok))[0]
    return [jax.tree_util.tree_map(lambda x: x[i], arrs) for i in keep]
