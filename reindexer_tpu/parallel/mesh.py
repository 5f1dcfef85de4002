"""Device mesh helpers for sharded index partitions.

The TPU analog of the reference's sharding plane (P8 in SURVEY.md §2.4:
ShardingProxy + ParallelExecutor distributed select over cproto RPC): index
rows are sharded across chips with `jax.sharding.Mesh`, and cross-shard
top-k / rank merges ride ICI collectives inside `shard_map` instead of
request/response RPC.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host mesh bootstrap (SURVEY §2.4 P8: the reference moves
    cross-node sharded selects over cproto RPC, core/shardingproxy.cc;
    the TPU-native plane instead joins hosts into ONE jax.distributed
    runtime so meshes span hosts and collectives ride ICI/DCN).

    Args default from RX_DIST_COORDINATOR / RX_DIST_NUM_PROCESSES /
    RX_DIST_PROCESS_ID; a single-process configuration is a no-op (returns
    False). After this returns True, jax.devices() is the GLOBAL device
    list and make_mesh() builds cross-host meshes transparently."""
    import os
    coordinator_address = coordinator_address or os.environ.get(
        "RX_DIST_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("RX_DIST_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("RX_DIST_PROCESS_ID", "0"))
    if num_processes <= 1 or not coordinator_address:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_put(mesh: Mesh, x: np.ndarray, spec) -> jax.Array:
    """Build a (possibly process-spanning) global array from host data that
    every process holds identically: each process contributes only its
    addressable shards. Single-process meshes degrade to device_put."""
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("shards",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def shard_rows(mesh: Mesh, x, axis: str = "shards"):
    """Place an [N, ...] array row-sharded over the mesh axis."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def pad_rows_to_multiple(x: np.ndarray, multiple: int,
                         fill=0) -> np.ndarray:
    n = x.shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x
    pad_shape = (target - n,) + x.shape[1:]
    return np.concatenate([x, np.full(pad_shape, fill, dtype=x.dtype)])
