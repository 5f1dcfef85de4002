"""Distributed KNN: row-sharded base partitions + collective top-k merge.

The multi-chip analog of the reference's distributed sharded select
(core/shardingproxy.cc + parallelexecutor.cc: fan out the query to shards,
merge partial results): each chip scans its base partition with the same
fused matmul+top-k kernel, then the per-shard top-k candidates are
all-gathered over ICI and merged with one more top-k — O(k * n_shards)
bytes on the wire instead of the full distance rows.

Mesh axes: 'shards' partitions base rows (the reference's shard-by-key
analog); 'batch' optionally partitions the query batch (scale-out serving).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.type_consts import VectorMetric
from ..ops.distance import NEG_INF, _chunk_scores


def _local_topk(q, base_loc, valid_loc, sq_loc, k: int, metric: VectorMetric,
                axis: str):
    """Per-shard scan + local top-k; ids are globalized with the shard offset."""
    scores = _chunk_scores(q, base_loc, sq_loc, metric)
    scores = jnp.where(valid_loc[None, :], scores, NEG_INF)
    kk = min(k, base_loc.shape[0])
    loc_s, loc_i = jax.lax.top_k(scores, kk)
    shard_off = jax.lax.axis_index(axis) * base_loc.shape[0]
    loc_i = loc_i + shard_off
    return loc_s, loc_i


def build_sharded_knn(mesh: Mesh, k: int, metric: VectorMetric,
                      shard_axis: str = "shards", batch_axis: Optional[str] = None):
    """Returns a jitted fn(queries, base, valid, sq) -> (scores, ids) with the
    base row-sharded over `shard_axis` (and queries over `batch_axis` if the
    mesh has one)."""
    n_shards = mesh.shape[shard_axis]
    qspec = P(batch_axis, None) if batch_axis else P(None, None)
    out_spec = (P(batch_axis, None) if batch_axis else P(None, None))

    def local_fn(q, base_loc, valid_loc, sq_loc):
        loc_s, loc_i = _local_topk(q, base_loc, valid_loc, sq_loc, k, metric,
                                   shard_axis)
        # gather each shard's candidates and merge: [n_shards*kk] per query
        all_s = jax.lax.all_gather(loc_s, shard_axis, axis=1, tiled=True)
        all_i = jax.lax.all_gather(loc_i, shard_axis, axis=1, tiled=True)
        best_s, sel = jax.lax.top_k(all_s, k)
        best_i = jnp.take_along_axis(all_i, sel, axis=1)
        best_i = jnp.where(best_s > NEG_INF, best_i, -1)
        return best_s, best_i

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(qspec, P(shard_axis, None), P(shard_axis), P(shard_axis)),
        out_specs=(out_spec, out_spec),
        check_vma=False,
    )
    return jax.jit(fn)
