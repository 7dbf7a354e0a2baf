"""Multi-host bootstrap and hybrid ICI x DCN mesh construction.

The reference has no multi-machine story at all (its parallelism ceiling
is Ceres's 8-thread pool, tests/dataset_vo.cpp:67-68). This module is the
pod-scale entry point the SURVEY (§5.8) specifies: each host process
calls :func:`initialize` (driven by env vars in launch scripts), after
which `jax.devices()` is the GLOBAL device list and every collective in
`parallel/sharded_ba.py` / `parallel/sharded_pcg.py` spans the full pod —
XLA routes the reductions over ICI within a slice and DCN across slices.

Mesh layout policy: observation-parallel BA reduces small block systems
(psum payloads of ~10 MB), so the observation axis may safely span DCN;
the hybrid mesh constructor still orders devices process-major so that
the inner dimension of a 2-D mesh stays on ICI where bandwidth is ~10x.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_ENV_COORD = "CERES_COORDINATOR_ADDRESS"
_ENV_NPROC = "CERES_NUM_PROCESSES"
_ENV_PID = "CERES_PROCESS_ID"


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """`jax.distributed.initialize` with explicit args or the
    ``CERES_COORDINATOR_ADDRESS`` / ``CERES_NUM_PROCESSES`` /
    ``CERES_PROCESS_ID`` environment (set by the pod launch script; on
    Cloud TPU all three are auto-detected from the TPU metadata and the
    env vars can stay unset).

    Returns True if a multi-process runtime was initialized, False for
    the single-process (no coordinator configured) case — callers can use
    one code path for both."""
    coordinator_address = coordinator_address or os.environ.get(_ENV_COORD)
    if num_processes is None and _ENV_NPROC in os.environ:
        num_processes = int(os.environ[_ENV_NPROC])
    if process_id is None and _ENV_PID in os.environ:
        process_id = int(os.environ[_ENV_PID])

    if coordinator_address is None and num_processes is None:
        return False  # single-process: nothing to initialize

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def shutdown():
    jax.distributed.shutdown()


def global_devices_process_major() -> np.ndarray:
    """All global devices ordered process-major (each host's devices
    contiguous), so a flat mesh keeps intra-host neighbors adjacent."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return np.asarray(devs)


def make_global_mesh(axis_name: str = "obs") -> Mesh:
    """1-D mesh over every device of every process — the drop-in mesh for
    the observation-sharded BA/PCG paths at multi-host scale."""
    return Mesh(global_devices_process_major(), (axis_name,))


def make_hybrid_mesh(axis_names: tuple = ("dcn", "obs")) -> Mesh:
    """2-D [n_processes, devices_per_process] mesh: the outer axis crosses
    hosts (DCN), the inner stays on each host's chips (ICI). Shard the
    bandwidth-heavy axis along ``axis_names[1]``."""
    devs = global_devices_process_major()
    n_proc = max(d.process_index for d in devs.tolist()) + 1
    if devs.size % n_proc != 0:
        raise ValueError(
            f"uneven devices per process: {devs.size} devices, {n_proc} processes"
        )
    return Mesh(devs.reshape(n_proc, -1), axis_names)


def put_global(x, sharding: NamedSharding) -> jax.Array:
    """Place a host array as a global `jax.Array` over a (possibly
    multi-process) sharding. `jax.device_put` only addresses local
    devices; the callback form fills exactly the shards this process
    owns — every process must call it with the same (replicated) host
    value."""
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def shard_problem_global(problem, mesh: Mesh):
    """Multi-host counterpart of `sharded_ba.shard_problem`: observation
    arrays sharded jointly over ALL mesh axes across every process's
    devices (1-D and hybrid [DCN, ICI] meshes alike), everything else
    replicated."""
    from ceres_slam_tpu.parallel import sharded_ba

    stereo = sharded_ba.pad_obs_to_multiple(problem.stereo, mesh.devices.size)
    obs_sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    rep = NamedSharding(mesh, P())
    stereo = jax.tree.map(lambda x: put_global(x, obs_sh), stereo)
    rest = jax.tree.map(lambda x: put_global(x, rep), problem._replace(stereo=None))
    return rest._replace(stereo=stereo)
