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
