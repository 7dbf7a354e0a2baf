"""Benchmark: bundle-adjustment LM iterations/s on one chip.

Measures the full BA iteration pipeline (batched residual/Jacobian factor
kernels -> block-sparse Gauss-Newton assembly via segment-sums ->
Schur-complement landmark elimination -> reduced Cholesky -> SE(3)
retraction -> cost) at KITTI-window scale, plus the batched RANSAC front
end. Iterations run inside a jitted lax.fori_loop so per-call dispatch
overhead (~30 ms through the axon relay) is amortized, and timing forces
a scalar fetch (block_until_ready is a no-op under the relay).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
the speedup of the default (TPU) backend over the same XLA program on the
multi-threaded host CPU — the stand-in for the reference's 8-thread Ceres
CPU configuration (tests/dataset_vo.cpp:67-68).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Problem scale: ~KITTI window batch (64 frames, 2k landmarks, 16k obs).
K, J, N_OBS = 64, 2048, 16384
RANSAC_N, RANSAC_ITERS = 512, 400
LOOP_ITERS = 50  # LM iterations fused into one device call


def build(dtype):
    """Bench problem: well-posed geometry + a VO-initialization-sized
    perturbation of the state, so the timed LM iterations do real descent
    (an unperturbed start sits at the minimum and every step is a
    rejection)."""
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from ceres_slam_tpu.solver import dense

    problem, state = ge._build_example(K=K, J=J, n_obs=N_OBS, dtype=dtype, seed=7)
    rng = np.random.default_rng(11)
    dx = np.concatenate([
        rng.normal(0, 0.01, 6 * K),   # ~1 cm / 0.5 deg pose error
        rng.normal(0, 0.05, 3 * J),   # 5 cm landmark error
    ])
    state = dense._retract_state(problem, state, jnp.asarray(dx, dtype))
    return problem, state


def lm_loop_fn(problem, strategy="lm"):
    """Production trust-region loop (LM or the flagship's SUBSPACE_DOGLEG
    default): the scatter-free Schur window solver, fused Pallas factor
    kernel on TPU / pure-XLA blocks elsewhere — one jitted call for the
    whole trust-region loop.

    The window layout (gather tables + one-hots) is built ONCE here, as
    production does per sliding-window pass, and is NOT in the timed
    region: it is host-side Python + a ~tens-of-MB upload whose cost the
    r02 benchmark wrongly folded into every rep (BENCH_r02 recorded
    61 it/s for a solver that runs at 329-470 it/s on chip)."""
    import jax

    from ceres_slam_tpu.solver import lm, window

    fused = jax.devices()[0].platform == "tpu"
    # run_full_budget: every measured iteration is one full factor pass +
    # Schur solve + retraction (accepted or rejected — identical FLOPs),
    # with no early exit, so it/s is a pure per-iteration rate.
    cfg = lm.SolveConfig(max_iters=LOOP_ITERS, ftol=0.0, gtol=0.0,
                         run_full_budget=True)
    layout = window.build_window_layout(problem, K, J)

    def run(problem, state):
        return window._solve_jit(layout, problem, state, cfg, fused,
                                 not fused, strategy)

    return run


def pcg_loop_fn(tables=None, tracks=None):
    """Secondary metric: LM with the matrix-free Schur-PCG linear solver —
    the memory-light path that scales past the window layout's [J,O,K]
    one-hot (K >= 256 full-batch BA). ``tables`` makes it scatter-free;
    ``tracks`` (banded.TrackInfo) swaps block-Jacobi for the banded
    cyclic-reduction preconditioner."""
    import jax
    import jax.numpy as jnp

    from ceres_slam_tpu.solver import dense, pcg

    @jax.jit
    def run(problem, state):
        def body(_, carry):
            state, lam, cost = carry
            dx, _, _ = pcg.pcg_step(problem, state, lam, max_cg_iters=50,
                                    cg_tol=1e-5, tables=tables,
                                    tracks=tracks)
            new_state = dense._retract_state(problem, state, dx)
            new_cost = dense.ba_cost(problem, new_state)
            accept = jnp.isfinite(new_cost) & (new_cost < cost)
            lam = jnp.where(accept, lam * (1.0 / 3.0), lam * 4.0)
            lam = jnp.clip(lam, 1e-10, 1e8)
            state = jax.tree.map(
                lambda n, o: jnp.where(accept, n, o), new_state, state
            )
            return state, lam, jnp.where(accept, new_cost, cost)

        state, lam, cost = jax.lax.fori_loop(
            0, LOOP_ITERS, body, (state, jnp.asarray(1e-4, state.poses.dtype),
                                  dense.ba_cost(problem, state))
        )
        return cost

    return run


def _sync(x) -> float:
    return float(x)  # forces device->host fetch (real sync under the relay)


def _median_rate(block, work_per_block, blocks: int = 3) -> float:
    """Median rate over ``blocks`` independently-timed measurement
    windows. ``block()`` runs a batch of work and returns a scalar to
    fetch. One window is vulnerable to relay-state outliers (r4: two
    same-round RANSAC captures differed 2x); the median of three ~0.5-1 s
    windows is stable to ~15% (VERDICT r4 item 9)."""
    import statistics

    rates = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        _sync(block())
        rates.append(work_per_block / (time.perf_counter() - t0))
    return float(statistics.median(rates))


def measure_lm(dtype, strategy="lm") -> float:
    problem, state = build(dtype)
    run = lm_loop_fn(problem, strategy)
    _, summary = run(problem, state)  # compile + warm
    iters = int(summary.iterations)
    # Bench hygiene (BASELINE.md "what bench.py measures"): the rate is
    # only per-iteration if the loop ran its whole budget — with
    # ftol=gtol=0 and a perturbed start it must. Early termination would
    # silently blend fixed per-call overhead into the per-iteration cost.
    assert iters == LOOP_ITERS, (
        f"bench LM loop terminated early ({iters}/{LOOP_ITERS} iters); "
        "per-iteration rate would be meaningless — fix the bench problem"
    )
    _sync(summary.final_cost)
    reps = 5

    def block():
        for _ in range(reps):
            _, s = run(problem, state)
        return s.final_cost

    return _median_rate(block, reps * iters)


def measure_pcg(dtype, banded: bool = False) -> float:
    import jax

    from ceres_slam_tpu.solver import banded as banded_mod
    from ceres_slam_tpu.solver import pcg

    problem, state = build(dtype)
    tables = None
    if jax.devices()[0].platform == "tpu":  # scatter-free reductions
        tables = pcg.build_obs_tables(
            problem.stereo.pose_idx, problem.stereo.point_idx, K, J)
    tracks = None
    if banded:
        tracks = banded_mod.build_track_info(
            problem.stereo.pose_idx, problem.stereo.point_idx, K, J)
    run = pcg_loop_fn(tables, tracks)
    _sync(run(problem, state))  # compile + warm
    reps = 3

    def block():
        for _ in range(reps):
            c = run(problem, state)
        return c

    return _median_rate(block, reps * LOOP_ITERS)


def measure_ransac(dtype) -> float:
    """RANSAC scoring throughput (hypotheses x points / s), 20 alignments
    fused per call."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ceres_slam_tpu.frontend import alignment
    from ceres_slam_tpu.models.stereo_camera import StereoCamera
    from ceres_slam_tpu.ops import lie

    cam = StereoCamera.create(
        *(jnp.asarray(v, dtype) for v in (500.0, 500.0, 320.0, 240.0, 0.5))
    )
    rng = np.random.default_rng(0)
    pts0 = jnp.asarray(rng.uniform([-4, -3, 4], [4, 3, 14], (RANSAC_N, 3)), dtype)
    T = lie.se3_exp(jnp.asarray([0.1, 0, -0.3, 0.02, 0.03, 0.01], dtype))
    pts1 = lie.se3_transform_point(T, pts0)
    valid = jnp.ones(RANSAC_N, bool)
    FUSED = 20

    @jax.jit
    def run(key):
        def body(i, acc):
            res = alignment.ransac_align(
                cam, pts0, pts1, valid, jax.random.fold_in(key, i),
                num_iters=RANSAC_ITERS,
            )
            return acc + res.num_inliers

        return jax.lax.fori_loop(0, FUSED, body, jnp.asarray(0, jnp.int32))

    _sync(run(jax.random.PRNGKey(0)))
    reps = 5

    def block():
        for i in range(reps):
            c = run(jax.random.PRNGKey(i))
        return c

    return _median_rate(block, reps * FUSED * RANSAC_ITERS * RANSAC_N)


def measure_matching(dtype) -> float:
    """Stereo descriptor-matching throughput (pair similarity scores/s):
    cross-checked NN matching of 1024x1024 patch descriptors (D=128), the
    MXU replacement for the ROS node's BFMatcher cross-check
    (sparse_stereo_odometry_node.cpp:144-148). 50 frames fused per call."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ceres_slam_tpu.frontend import features

    N, D, FUSED = 1024, 128, 50
    rng = np.random.default_rng(1)
    desc_a = jnp.asarray(rng.normal(size=(N, D)), dtype)
    desc_b = jnp.asarray(rng.normal(size=(N, D)), dtype)
    valid = jnp.ones(N, bool)

    @jax.jit
    def run(da):
        def body(i, acc):
            idx, ok = features.match_descriptors(
                da + 0.001 * i, desc_b, valid, valid
            )
            return acc + jnp.sum(ok.astype(jnp.int32))

        return jax.lax.fori_loop(0, FUSED, body, jnp.asarray(0, jnp.int32))

    _sync(run(desc_a))
    reps = 5

    def block():
        for _ in range(reps):
            c = run(desc_a)
        return c

    return _median_rate(block, reps * FUSED * N * N)


def main():
    if "--backend-probe" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "float32")
        import jax.numpy as jnp

        # The honest CPU baseline is the host's BEST solver for this
        # problem, not the TPU-shaped program: the window solver's dense
        # one-hot contractions are nearly free on the MXU but dominate on
        # CPU, and on CPU the banded-preconditioned PCG (CG matvecs
        # dominate there) beats block-Jacobi ~2.4x at bench scale.
        best = max(measure_lm(jnp.float32),
                   measure_pcg(jnp.float32, banded=True))
        print(json.dumps({"lm_iters_per_s": best}))
        return

    import jax

    # production precision policy (apps/common.setup_jax): full-f32
    # matmuls — bf16 MXU passes corrupt geometry (backend-dependent
    # RANSAC inlier sets, measured r4). The bench measures what ships.
    # features.match_descriptors opts back into bf16 explicitly.
    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    lm = measure_lm(jnp.float32)
    # the flagship ships SUBSPACE_DOGLEG (tests/dataset_vo_sun.cpp:142-143);
    # record that configuration in the driver-captured artifact too
    dogleg = measure_lm(jnp.float32, strategy="dogleg")
    pcg = measure_pcg(jnp.float32)
    ransac = measure_ransac(jnp.float32)
    matching = measure_matching(jnp.float32)

    try:
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [sys.executable, __file__, "--backend-probe"],
            capture_output=True,
            text=True,
            timeout=1800,
            env=env,
        )
        cpu_lm = json.loads(out.stdout.strip().splitlines()[-1])["lm_iters_per_s"]
    except Exception:
        cpu_lm = float("nan")

    vs = lm / cpu_lm if cpu_lm == cpu_lm and cpu_lm > 0 else 1.0
    print(
        json.dumps(
            {
                "metric": "ba_lm_iterations_per_s",
                "value": round(lm, 3),
                "unit": "iter/s",
                "vs_baseline": round(vs, 3),
                "baseline": "same XLA BA LM iteration on multithreaded host CPU (stand-in for reference's 8-thread Ceres)",
                "platform": platform,
                "problem": {"K": K, "J": J, "n_obs": N_OBS, "dof": 6 * K + 3 * J},
                "cpu_lm_iters_per_s": round(cpu_lm, 3) if cpu_lm == cpu_lm else None,
                "dogleg_iters_per_s": round(dogleg, 3),
                "pcg_lm_iters_per_s": round(pcg, 3),
                "ransac_point_hypotheses_per_s": round(ransac, 1),
                "matching_pair_scores_per_s": round(matching, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
