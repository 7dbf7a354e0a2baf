"""Distributed bundle adjustment over a `jax.sharding.Mesh`.

The reference has no distributed layer at all — its only parallelism is
Ceres's intra-process thread pool (SURVEY.md §2.7, tests/dataset_vo.cpp:67-68).
This module is the TPU-native scaling story designed from the north star:
observations are sharded across devices along a 1-D mesh axis, each device
assembles the Gauss-Newton contribution of its observation shard with the
same batched factor kernels as the single-chip path, and the partial
(H, g) are reduced with `psum` over ICI. The (small) damped solve and
retraction then run replicated on every device — cheaper than a gather,
and keeps the LM loop entirely on-device.

This is observation-parallel ("data parallel" in NN terms). Keyframe/
map-block partitioning of the *state* (for problems whose reduced camera
system itself outgrows a chip) composes on top by sharding H's block rows;
see `ceres_slam_tpu/solver/schur.py` for the block-sparse reduced system.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ceres_slam_tpu.solver import dense

OBS_AXIS = "obs"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the observation axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (OBS_AXIS,))


def _axes(mesh: Mesh) -> tuple:
    """All mesh axis names: observations shard jointly over every axis, so
    the same assembly code runs on a 1-D ICI mesh and on the hybrid
    [DCN, ICI] mesh (`multihost.make_hybrid_mesh`) — XLA routes the inner
    axis of the psum over ICI and the outer over DCN."""
    return tuple(mesh.axis_names)


def pad_obs_to_multiple(stereo: dense.StereoObs, n: int) -> dense.StereoObs:
    """Pad the observation batch so it divides evenly across n devices."""
    N = stereo.uvd.shape[0]
    pad = (-N) % n
    if pad == 0:
        return stereo
    eye = jnp.broadcast_to(jnp.eye(3, dtype=stereo.stiffness.dtype), (pad, 3, 3))
    return dense.StereoObs(
        uvd=jnp.concatenate([stereo.uvd, jnp.zeros((pad, 3), stereo.uvd.dtype)]),
        stiffness=jnp.concatenate([stereo.stiffness, eye]),
        pose_idx=jnp.concatenate([stereo.pose_idx, jnp.zeros(pad, jnp.int32)]),
        point_idx=jnp.concatenate([stereo.point_idx, jnp.zeros(pad, jnp.int32)]),
        valid=jnp.concatenate([stereo.valid, jnp.zeros(pad, bool)]),
    )


def shard_problem(problem: dense.StereoBAProblem, mesh: Mesh) -> dense.StereoBAProblem:
    """Place the observation arrays sharded along the mesh axis and
    everything else replicated."""
    n = mesh.devices.size
    stereo = pad_obs_to_multiple(problem.stereo, n)
    obs_sharding = NamedSharding(mesh, P(_axes(mesh)))
    rep = NamedSharding(mesh, P())
    stereo = dense.StereoObs(
        uvd=jax.device_put(stereo.uvd, obs_sharding),
        stiffness=jax.device_put(stereo.stiffness, obs_sharding),
        pose_idx=jax.device_put(stereo.pose_idx, obs_sharding),
        point_idx=jax.device_put(stereo.point_idx, obs_sharding),
        valid=jax.device_put(stereo.valid, obs_sharding),
    )
    rest = problem._replace(stereo=stereo)
    return jax.tree.map(
        lambda x: x if isinstance(x, jax.Array) and x.sharding == obs_sharding
        else jax.device_put(x, rep),
        rest,
    )


def make_sharded_blocks(mesh: Mesh):
    """Block-system builder with the stereo contribution shard_mapped over
    the observation axis and psum-reduced.

    The reduction payload is the block-sparse system (Hpp [K,6,6],
    Hll [J,3,3], W [K,J,6,3], g) — orders of magnitude smaller than
    all-reducing the dense [D, D] Hessian, and the exact quantity both the
    dense and Schur solvers consume."""

    axes = _axes(mesh)

    def blocks_fn(problem: dense.StereoBAProblem, state: dense.BAState):
        camera = problem.camera
        point_valid = problem.point_valid

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(axes), P()),
            out_specs=P(),
        )
        def stereo_part(stereo_shard, state_rep):
            blocks = dense.stereo_block_contrib(
                camera, stereo_shard, point_valid, state_rep
            )
            return jax.tree.map(lambda x: jax.lax.psum(x, axes), blocks)

        blocks = stereo_part(problem.stereo, state)
        Hpp_aux, gp_aux = dense.aux_pose_blocks(problem, state)
        return blocks._replace(Hpp=blocks.Hpp + Hpp_aux, gp=blocks.gp + gp_aux)

    return blocks_fn


def make_sharded_normal_eq(mesh: Mesh):
    """Dense (H, g) built from the psum-reduced block system."""
    blocks_fn = make_sharded_blocks(mesh)

    def normal_eq(problem: dense.StereoBAProblem, state: dense.BAState):
        H, g = dense.blocks_to_dense(blocks_fn(problem, state))
        return dense.apply_gauge_mask(problem, H, g)

    return normal_eq


def make_sharded_cost(mesh: Mesh):
    """Cost with the stereo term psum-reduced over observation shards."""

    axes = _axes(mesh)

    def cost(problem: dense.StereoBAProblem, state: dense.BAState):
        from ceres_slam_tpu.ops import factors as factors_mod

        camera = problem.camera
        point_valid = problem.point_valid

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(axes), P()),
            out_specs=P(),
        )
        def stereo_cost(stereo_shard, state_rep):
            r, _, _ = factors_mod.stereo_reprojection(
                camera,
                state_rep.poses[stereo_shard.pose_idx],
                state_rep.points[stereo_shard.point_idx],
                stereo_shard.uvd,
                stereo_shard.stiffness,
            )
            v = stereo_shard.valid & point_valid[stereo_shard.point_idx]
            return jax.lax.psum(jnp.sum(jnp.sum(r * r, axis=-1) * v), axes)

        c_stereo = stereo_cost(problem.stereo, state)
        # replicated sun + prior terms
        zero_stereo = problem._replace(
            stereo=dense.StereoObs(
                uvd=jnp.zeros((1, 3), state.poses.dtype),
                stiffness=jnp.zeros((1, 3, 3), state.poses.dtype),
                pose_idx=jnp.zeros(1, jnp.int32),
                point_idx=jnp.zeros(1, jnp.int32),
                valid=jnp.zeros(1, bool),
            )
        )
        return 0.5 * c_stereo + dense.ba_cost(zero_stereo, state)

    return cost


def solve_ba_sharded(
    problem: dense.StereoBAProblem,
    state0: dense.BAState,
    mesh: Mesh,
    config: dense.SolveConfig = dense.SolveConfig(),
    shard=None,
    put_replicated=None,
):
    """Distributed LM solve: same trust-region loop as the single-chip
    path, with the Gauss-Newton assembly sharded over observations.

    ``shard`` / ``put_replicated`` override array placement for
    multi-process meshes (see `parallel.multihost.shard_problem_global`);
    the defaults handle the single-process case.

    The returned solution is replicated on all mesh devices."""
    rep = NamedSharding(mesh, P())
    problem = shard(problem) if shard is not None else shard_problem(problem, mesh)
    if put_replicated is None:
        state0 = jax.device_put(state0, rep)
    else:
        state0 = jax.tree.map(put_replicated, state0)

    normal_eq = make_sharded_normal_eq(mesh)

    @partial(jax.jit, static_argnames=("config",))
    def run(problem, state0, config):
        return dense.lm_minimize(problem, state0, config, normal_eq_fn=normal_eq)

    return run(problem, state0, config)


def gn_step_sharded(problem, state, mesh):
    """One sharded Gauss-Newton step (assembly + damped solve + retract) —
    the distributed 'training step' used by dryrun validation and
    benchmarks."""
    normal_eq = make_sharded_normal_eq(mesh)

    @jax.jit
    def step(problem, state):
        H, g = normal_eq(problem, state)
        diag = jnp.clip(jnp.diagonal(H), 1e-12, 1e32)
        A = H + 1e-4 * jnp.diag(diag)
        L, low = jax.scipy.linalg.cho_factor(A, lower=True)
        dx = jax.scipy.linalg.cho_solve((L, low), -g)
        return dense._retract_state(problem, state, dx)

    return step(problem, state)
