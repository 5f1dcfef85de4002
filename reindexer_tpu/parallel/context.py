"""Mesh context: the engine-integrated sharding plane.

The TPU analog of the reference's ShardingProxy
(cpp_src/core/shardingproxy.cc: every public API call is proxied so a
sharded select is the same Select() the user always calls, fanned out by
core/parallelexecutor.cc). Here the proxy is a `MeshContext` attached at
the `Reindexer` level: namespaces pass it to every index they create, and
mesh-aware indexes (BF/HNSW/IVF/full-text) transparently keep their device
state row-sharded over the mesh and run their selects as `shard_map`
programs with ICI collectives — same `select`/`select_batch` API, no
separate "sharded" builders for users.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class MeshContext:
    """A device mesh + the axis indexes shard their rows over."""
    mesh: Mesh
    shard_axis: str = "shards"

    @property
    def n_shards(self) -> int:
        return int(self.mesh.shape[self.shard_axis])

    def row_sharding(self, ndim: int) -> NamedSharding:
        return NamedSharding(self.mesh,
                             P(self.shard_axis, *([None] * (ndim - 1))))

    def shard_rows(self, x) -> jax.Array:
        """Place an [N, ...] array row-sharded (N must divide n_shards)."""
        return jax.device_put(x, self.row_sharding(np.ndim(x)))

    def replicate(self, x) -> jax.Array:
        return jax.device_put(x, NamedSharding(self.mesh, P()))


def make_mesh_context(n_devices: Optional[int] = None,
                      shard_axis: str = "shards") -> MeshContext:
    from .mesh import make_mesh
    return MeshContext(make_mesh(n_devices, axis_names=(shard_axis,)),
                       shard_axis)
