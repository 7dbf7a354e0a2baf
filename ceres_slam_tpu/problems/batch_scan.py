"""Batched multi-run scan: independent sliding-window chains solved
CONCURRENTLY on one chip.

The windows of one sequence are serialized by the covariance-prior chain
(tests/dataset_vo_sun.cpp:159-183), so a single chain leaves the chip
>95% idle (solver/window.py:7) — but harness runs are independent:
`ba_all_sims` is 3 sequences x {VO-only + 4 sun configs} = 15 chains
(/root/reference/scripts/ba_all_sims.sh:8-26), `ba_all_icra` a 10x8
grid. This module pads every run's `PassStatics` to common shapes,
stacks them on a leading batch axis, and runs ONE vmapped scan
(`scan_pipeline._run_scan_batch`): one compile, one upload, the whole
grid in ~the wall time of the longest single chain.

Runs never mutate their dataset objects — results come back as
`BatchResult` so many runs can share one loaded dataset (and its cached
RANSAC/statics precompute).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ceres_slam_tpu.problems import scan_pipeline
from ceres_slam_tpu.solver import dense


class RunSpec(NamedTuple):
    """One independent chain: a dataset plus its pass configuration."""

    ds: object  # DatasetProblemSun
    use_sun: bool = False
    huber_param: float = 0.0
    az_err_thresh: float = 1000.0
    zen_err_thresh: float = 1000.0


class BatchResult(NamedTuple):
    poses: np.ndarray  # [K, 12]
    pose_covars: np.ndarray  # [K, 6, 6]
    summaries: list  # per-window summaries (failed windows dropped)
    ok: np.ndarray  # [W] bool


_host_statics = scan_pipeline.host_statics_cached  # shared cache + restore


def _pad_to(arr: np.ndarray, shape) -> np.ndarray:
    """Zero/False-pad trailing of each axis to the target shape — the
    same padding semantics `build_window_problem` uses (masked rows carry
    zero weight; masked variables get unit diagonals in H)."""
    pads = [(0, t - s) for s, t in zip(arr.shape, shape)]
    if not any(p[1] for p in pads):
        return arr
    return np.pad(arr, pads)


def solve_batch(
    runs: list[RunSpec], window: int = 2,
    config: dense.SolveConfig | None = None, strategy: str = "dogleg",
    progress: bool = False,
) -> list[BatchResult]:
    """Solve every run's sliding-window pass in one vmapped device scan.

    All runs must share the solver dtype and window size. Shapes are
    padded to the batch maxima (inactive no-op windows pad shorter
    sequences), so heterogeneous sequences share one compiled program.
    """
    import time as _time

    config = config or dense.SolveConfig(max_iters=100)
    dts = {r.ds.dtype for r in runs}
    assert len(dts) == 1, f"runs must share a dtype, got {dts}"
    floors = {float(r.ds._covar_floor) for r in runs}
    assert len(floors) == 1, f"runs must share _covar_floor, got {floors}"
    dt = runs[0].ds._dt

    _t0 = _time.perf_counter()
    pre = [_host_statics(r.ds, window, progress) for r in runs]
    if progress:
        print(f"  batch precompute: {_time.perf_counter() - _t0:.1f}s "
              f"({len(runs)} runs)", flush=True)
    Ws = [int(p[0].k1.shape[0]) for p in pre]
    Ks = [r.ds.num_states for r in runs]
    W_max, K_max = max(Ws), max(Ks)
    M_max = max(int(p[0].uvd.shape[1]) for p in pre)
    Mp_max = max(int(p[3]) for p in pre)
    J_max = max(int(p[0].point_valid.shape[1]) for p in pre)
    O_max = max(int(p[2]) for p in pre)
    Kw = window

    tgt = dict(
        k1=(W_max,), uvd=(W_max, M_max, 3), stiff=(W_max, M_max, 3, 3),
        pose_idx=(W_max, M_max), valid=(W_max, M_max),
        point_valid=(W_max, J_max), onehot=(W_max, M_max, Kw),
        onehotT=(W_max, Kw, Mp_max), uvdT=(W_max, 3, Mp_max),
        stiffT=(W_max, 9, Mp_max), weightT=(W_max, 1, Mp_max),
        pose_freeT=(W_max, 1, Mp_max),
        onehot_jok=(W_max, J_max, O_max, Kw),
        sun_dir_c=(W_max, Kw, 3), sun_dir_g=(W_max, Kw, 3),
        sun_stiff=(W_max, Kw, 2, 2), sun_valid=(W_max, Kw),
        pts_c=(W_max, J_max, 3), init_frame=(W_max, J_max),
        T_rel=(W_max, Kw - 1, 12), ransac_ok=(W_max,), n_chain=(W_max,),
        active=(W_max,),
    )

    stacked, pidx, poses0, cov0, cams = {}, [], [], [], []
    for name in scan_pipeline.PassStatics._fields:
        stacked[name] = []
    for r, (statics, point_idx, O, M_pad) in zip(runs, pre):
        for name in scan_pipeline.PassStatics._fields:
            stacked[name].append(
                _pad_to(np.asarray(getattr(statics, name)), tgt[name]))
        pidx.append(_pad_to(np.asarray(point_idx), (M_max,)))
        p0 = np.zeros((K_max, 12))
        p0[:, 3:] = np.eye(3).reshape(9)  # identity pad rows (never read)
        p0[: r.ds.num_states] = r.ds.poses
        poses0.append(p0)
        c0 = np.broadcast_to(np.eye(6), (K_max, 6, 6)).copy()
        c0[: r.ds.num_states] = r.ds.pose_covars
        cov0.append(c0)
        cams.append(r.ds._camera_dt)  # host-pinned dtype-cast (cached)

    chain_dtype = np.float64 if jax.config.jax_enable_x64 else dt
    cov_dtype = np.float64 if jax.config.jax_enable_x64 else dt
    _t1 = _time.perf_counter()
    batch = scan_pipeline.PassStatics(
        **{name: jnp.asarray(np.stack(vals)) for name, vals in
           stacked.items()})
    jax.block_until_ready(batch)  # (no-op under the relay; harmless)
    nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(batch))
    if progress:
        print(f"  batch scan: {len(runs)} runs x {W_max} windows, "
              f"O={O_max}, M_pad={Mp_max} "
              f"(stack+upload {nbytes / 1e6:.0f} MB, "
              f"{_time.perf_counter() - _t1:.1f}s)", flush=True)
    _t2 = _time.perf_counter()
    interpret = jax.devices()[0].platform != "tpu"
    fused = scan_pipeline._scan_fused(interpret, Mp_max, dt)
    poses_full, summaries, cov_full = scan_pipeline._run_scan_batch(
        batch, jnp.asarray(np.stack(pidx)),
        jnp.asarray(np.stack(poses0), chain_dtype),
        jnp.asarray(np.stack(cov0), cov_dtype),
        jax.tree_util.tree_map(
            lambda *xs: jnp.asarray(np.stack([np.asarray(x) for x in xs])),
            *cams),
        jnp.asarray([float(r.huber_param) for r in runs], dt),
        jnp.asarray([float(r.az_err_thresh) for r in runs], dt),
        jnp.asarray([float(r.zen_err_thresh) for r in runs], dt),
        jnp.asarray(runs[0].ds._covar_floor, cov_dtype),
        jnp.asarray([bool(r.use_sun) for r in runs]),
        Kw, O_max, config, strategy, fused, interpret,
    )
    poses_np = np.asarray(poses_full, np.float64)
    cov_np = np.asarray(cov_full, np.float64)
    summaries_np = jax.tree_util.tree_map(np.asarray, summaries)
    if progress:
        print(f"  batch solve (compile+run+fetch): "
              f"{_time.perf_counter() - _t2:.1f}s", flush=True)

    results = []
    for i, (r, W, K) in enumerate(zip(runs, Ws, Ks)):
        ok = np.asarray(pre[i][0].ransac_ok)
        s_i = jax.tree_util.tree_map(lambda x: x[i][:W], summaries_np)
        results.append(BatchResult(
            poses=poses_np[i, :K], pose_covars=cov_np[i, :K],
            summaries=scan_pipeline.unstack_summaries(s_i, ok), ok=ok))
    return results
