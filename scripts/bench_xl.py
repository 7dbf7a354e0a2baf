"""Scale sweep: BA LM iterations/s at S/XL/XXL problem sizes, plus
dogleg-vs-LM on the fused window solver at bench scale.

Measures the matrix-free Schur-PCG LM loop (the full-batch path,
`solver/pcg.py`) at the three scales BASELINE.md tracks:

    S   : K=64,   J=2048,  N=16384   (KITTI window batch — bench.py scale)
    XL  : K=256,  J=8192,  N=65536   (multi-window batch)
    XXL : K=1024, J=32768, N=262144  (KITTI-drive full batch)

and the window solver under both trust-region strategies at S scale
(the flagship defaults to dogleg — apps/common.py — so the default
configuration's chip cost must be on record, VERDICT r2 weak #8).

Run on TPU (default) and on CPU (`JAX_PLATFORMS=cpu python
scripts/bench_xl.py`) for the vs-CPU columns. One JSON line per result.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOOP_ITERS = 50
SCALES = {
    "S": (64, 2048, 16384),
    "XL": (256, 8192, 65536),
    "XXL": (1024, 32768, 262144),
}


def _sync(x) -> float:
    return float(x)  # forces a fetch (block_until_ready no-op under relay)


def measure_pcg(scale: str, dtype, force_segment: bool = False,
                banded_precond: bool = False):
    import jax

    import bench
    from ceres_slam_tpu.solver import banded, pcg

    K, J, N = SCALES[scale]
    bench.K, bench.J, bench.N_OBS = K, J, N
    problem, state = bench.build(dtype)
    tables = None
    if jax.devices()[0].platform == "tpu" and not force_segment:
        tables = pcg.build_obs_tables(
            problem.stereo.pose_idx, problem.stereo.point_idx, K, J)
    tracks = None
    if banded_precond:
        tracks = banded.build_track_info(
            problem.stereo.pose_idx, problem.stereo.point_idx, K, J)
    run = bench.pcg_loop_fn(tables, tracks)
    t0 = time.perf_counter()
    _sync(run(problem, state))  # compile + warm
    compile_s = time.perf_counter() - t0
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        c = run(problem, state)
    _sync(c)
    dt = time.perf_counter() - t0
    tag = "_segsum" if force_segment else ("_banded" if banded_precond else "")
    r = {"metric": f"pcg_lm_it_s_{scale}{tag}", "K": K, "J": J, "N": N,
         "it_s": round(reps * LOOP_ITERS / dt, 2),
         "compile_s": round(compile_s, 1)}
    if tracks is not None:
        r["eligible_frac"] = round(tracks.eligible_frac, 4)
        r["track_L"] = tracks.L
    return r


def measure_window_strategy(strategy: str, dtype):
    """Window solver (flagship linear solver) under lm vs dogleg, S scale."""
    import jax

    import bench
    from ceres_slam_tpu.solver import lm, window

    K, J, N = SCALES["S"]
    bench.K, bench.J, bench.N_OBS = K, J, N
    problem, state = bench.build(dtype)
    fused = jax.devices()[0].platform == "tpu"
    cfg = lm.SolveConfig(max_iters=LOOP_ITERS, ftol=0.0, gtol=0.0,
                         run_full_budget=True)
    layout = window.build_window_layout(problem, K, J)

    def run():
        return window._solve_jit(layout, problem, state, cfg, fused,
                                 not fused, strategy)

    _, summary = run()
    iters = int(summary.iterations)
    assert iters == LOOP_ITERS, f"{strategy} ran {iters}/{LOOP_ITERS}"
    final = float(summary.final_cost)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        _, summary = run()
    _sync(summary.final_cost)
    dt = time.perf_counter() - t0
    return {"metric": f"window_{strategy}_it_s_S",
            "it_s": round(reps * iters / dt, 2), "final_cost": final}


def measure_phong(dtype, num_states=200, num_points=1000):
    """Workload #2 (tests/dataset_ba_phong.cpp:79-87): FULL-BATCH Phong BA
    through the vertex-Schur elimination path (the SPARSE_NORMAL_CHOLESKY
    role) — poses + vertex positions/normals + shared materials/textures
    + light, jointly. Rate = LM iterations/s at a 200-state scene."""
    import tempfile

    import jax

    from ceres_slam_tpu.problems.dataset_phong import DatasetProblemPhong
    from ceres_slam_tpu.solver import lm, phong_schur
    from ceres_slam_tpu.utils import sim

    ds = sim.generate_phong(num_states=num_states, num_points=num_points,
                            seed=11)
    with tempfile.TemporaryDirectory() as d:
        track = os.path.join(d, "phong.csv")
        sim.write_phong_track_csv(ds, track)
        prob = DatasetProblemPhong.read_csv(track)
    prob.dtype = str(jax.numpy.dtype(dtype))
    prob.compute_initial_guess()  # VO + median-texture init: real descent
    n_obs_pad, n_vtx_pad = prob._window_budget(num_states)
    problem, state, _ = prob.build_window_problem(
        0, num_states, n_obs_pad, n_vtx_pad)
    cfg = lm.SolveConfig(max_iters=LOOP_ITERS, ftol=0.0, gtol=0.0,
                         run_full_budget=True)

    def run():
        return phong_schur.solve_phong_ba_schur_jit(
            problem, state, cfg, True, False, False)

    t0 = time.perf_counter()
    _, summary = run()
    iters = int(summary.iterations)
    compile_s = time.perf_counter() - t0
    assert iters == LOOP_ITERS, f"phong bench ran {iters}/{LOOP_ITERS}"
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        _, summary = run()
    _sync(summary.final_cost)
    dt = time.perf_counter() - t0
    return {"metric": "phong_schur_it_s", "K": num_states,
            "J": int(prob.num_vertices), "N": int(prob.state_ids.size),
            "M": int(prob.num_materials),
            "it_s": round(reps * iters / dt, 2),
            "compile_s": round(compile_s, 1)}


def measure_photometric(dtype, H=240, W=320, sampler="gather"):
    """Dense photometric alignment (the ImageError workload,
    dense_stereo_test.cpp:61-115): one residual per pixel — pose +
    per-pixel disparity refinement. Rate = LM iterations/s."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ceres_slam_tpu.apps.dense_stereo import make_scene
    from ceres_slam_tpu.ops import lie
    from ceres_slam_tpu.solver import lm
    from ceres_slam_tpu.solver import photometric as ph

    cam, img_ref, img_trk, gu, gv, disp_ref, T_true = make_scene(
        H, W, dtype=dtype)
    rng = np.random.default_rng(0)
    border = 8
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    sel = ((uu >= border) & (uu < W - border)
           & (vv >= border) & (vv < H - border)).reshape(-1)
    idx = jnp.asarray(np.nonzero(sel)[0])
    ref_uv = jnp.asarray(
        np.stack([uu.reshape(-1), vv.reshape(-1)], -1)[sel], dtype)
    disp0 = disp_ref.reshape(-1)[idx] + jnp.asarray(
        rng.normal(0, 0.3, int(sel.sum())), dtype)
    problem = ph.PhotometricProblem(
        camera=cam, ref_uv=ref_uv,
        ref_intensity=img_ref.reshape(-1)[idx],
        track_img=img_trk, grad_u=gu, grad_v=gv,
        valid=jnp.ones(ref_uv.shape[0], bool), disp_meas=disp0,
        disp_stiffness=jnp.asarray(1.0 / 0.3, dtype))
    state0 = ph.PhotometricState(
        T=lie.se3_retract(T_true, jnp.asarray(rng.normal(0, 0.02, 6), dtype)),
        disparities=disp0)
    cfg = lm.SolveConfig(max_iters=LOOP_ITERS, ftol=0.0, gtol=0.0,
                         run_full_budget=True)
    def run(problem, state0, cfg):
        # solve_photometric jits internally (static config + sampler)
        return ph.solve_photometric(problem, state0, cfg, sampler=sampler)

    t0 = time.perf_counter()
    _, summary = run(problem, state0, cfg)
    iters = int(summary.iterations)
    compile_s = time.perf_counter() - t0
    assert iters == LOOP_ITERS, f"photometric ran {iters}/{LOOP_ITERS}"
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        _, summary = run(problem, state0, cfg)
    _sync(summary.final_cost)
    dt = time.perf_counter() - t0
    return {"metric": "photometric_it_s", "pixels": int(ref_uv.shape[0]),
            "H": H, "W": W, "sampler": sampler,
            "it_s": round(reps * iters / dt, 2),
            "compile_s": round(compile_s, 1)}


def main():
    import jax
    import jax.numpy as jnp

    # The sandbox's sitecustomize force-registers the TPU backend; the
    # env var alone does NOT win — push it through jax.config.
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # production precision policy (see apps/common.setup_jax)
    jax.config.update("jax_default_matmul_precision", "float32")
    platform = jax.devices()[0].platform
    scales = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "S", "XL", "XXL"]
    # dogleg-vs-LM is a chip question (the flagship default runs on TPU);
    # skip the slow interpret-mode window path on CPU unless asked.
    if platform == "tpu" or "--window-strategies" in sys.argv:
        for strategy in ("lm", "dogleg"):
            r = measure_window_strategy(strategy, jnp.float32)
            r["platform"] = platform
            print(json.dumps(r), flush=True)
    for s in scales:
        r = measure_pcg(s, jnp.float32)
        r["platform"] = platform
        print(json.dumps(r), flush=True)
        r = measure_pcg(s, jnp.float32, banded_precond=True)
        r["platform"] = platform
        print(json.dumps(r), flush=True)
        if platform == "tpu" and "--segsum" in sys.argv:
            r = measure_pcg(s, jnp.float32, force_segment=True)
            r["platform"] = platform
            print(json.dumps(r), flush=True)
    if "--no-workloads" not in sys.argv:
        r = measure_phong(jnp.float32)
        r["platform"] = platform
        print(json.dumps(r), flush=True)
        # the VMEM-resident MXU sampling kernel vs the gather path: the
        # gather path is the r4 record (0.74x CPU); the kernel is the fix
        samplers = ("gather", "pallas") if platform == "tpu" else ("gather",)
        for sampler in samplers:
            r = measure_photometric(jnp.float32, sampler=sampler)
            r["platform"] = platform
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
