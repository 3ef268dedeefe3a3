"""Multi-host (multi-process) mesh bring-up for the sharded SLAM layer.

The reference is strictly single-node/single-GPU (SURVEY.md §2.7/§5.8);
this is the new capability's process-level entry: initialize
``jax.distributed``, build a global 1-D mesh over every chip of every
host, and construct host-local shards of the TSDF window as a global
``jax.Array`` — after which every function in parallel/sharded.py works
unchanged (shard_map addresses the global mesh; collectives ride
ICI/DCN as laid out by the mesh).

Single-process (tests, one host) degenerates gracefully: ``initialize``
with ``num_processes=1`` is a no-op-equivalent and the helpers fall back
to plain ``device_put``.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..map.local_map import LocalMapState


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Bring up jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID); no-op when
    single-process and nothing is configured."""
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if coordinator_address is None and num_processes == 1:
        return                                  # single host, nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def global_mesh(axis: str = "x") -> Mesh:
    """1-D mesh over ALL devices of the job (every chip of every host),
    in process-major order so each host's block is contiguous — slab IO
    during shift stays host-local."""
    return Mesh(np.array(jax.devices()), (axis,))


def shard_state_global(state: LocalMapState, mesh: Mesh) -> LocalMapState:
    """Place a (host-replicated numpy/jnp) LocalMapState as a global
    x-block-sharded jax.Array across every process.

    Each process materializes only ITS devices' blocks
    (``make_array_from_callback`` slices the host copy), so the full
    window never needs to exist on more than one host at a time beyond
    the source copy driving the call."""
    blk = NamedSharding(mesh, P("x", None, None))
    rep = NamedSharding(mesh, P())

    def arr(x, sharding):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])

    return LocalMapState(
        value=arr(state.value, blk),
        weight=arr(state.weight, blk),
        pos=arr(np.asarray(state.pos, np.int32), rep),
        offset=arr(np.asarray(state.offset, np.int32), rep),
    )


def host_slab_bounds(mesh: Mesh, size: tuple[int, int, int]
                     ) -> tuple[int, int]:
    """[x0, x1) array-axis rows owned by THIS process's devices — the
    rows whose slab IO (shift eviction/load) this host performs."""
    X = size[0]
    devs = list(mesh.devices.flat)
    n = len(devs)
    assert X % n == 0, "window X must divide the mesh"
    xs = X // n
    mine = [i for i, d in enumerate(devs)
            if d.process_index == jax.process_index()]
    if not mine:
        return 0, 0
    return min(mine) * xs, (max(mine) + 1) * xs


def gather_state(state: LocalMapState) -> LocalMapState:
    """Fully-replicated numpy copy of a sharded state (host side; uses
    process-local data plus an allgather when multi-host)."""
    def np_of(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            x = multihost_utils.process_allgather(x, tiled=True)
        return np.asarray(x)
    return LocalMapState(*(np_of(x) for x in state))
