"""Distributed IVF: row-sharded lists + replicated centroids + collective
top-k merge.

Multi-chip analog of the reference's sharded ANN select over IVF indexes
(SURVEY.md §2.4 P8; cpp_src/core/shardingproxy.cc scatter + rank merge):
stage 1 (centroid probe) runs replicated — the centroid table is tiny and
identical on every chip — and stage 2 scans each chip's row partition with
the probe-mask formulation (rows whose list assignment is probed), merging
the per-shard top-k over ICI with one all_gather + top_k.

The probe-mask stage 2 (not the segment reorder) is the sharded
formulation on purpose: each shard's row partition contains fragments of
every inverted list, so a per-shard list-contiguous reorder would need a
global shuffle on every rebuild; the masked scan needs none and its cost
is already split S ways.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.type_consts import VectorMetric
from ..ops.distance import NEG_INF, _chunk_scores


def build_sharded_ivf(mesh: Mesh, k: int, metric: VectorMetric,
                      shard_axis: str = "shards"):
    """Returns a jitted fn(queries, base, sq, valid, assign, sel) with
    base/sq/valid/assign row-sharded over `shard_axis` and sel (bool
    [B, nlist] probe membership from stage 1) replicated. Output:
    (scores f32[B, k], GLOBAL row ids int32[B, k], -1 padded)."""

    def local_fn(q, base_loc, sq_loc, valid_loc, assign_loc, sel):
        scores = _chunk_scores(q, base_loc, sq_loc, metric)
        safe_assign = jnp.maximum(assign_loc, 0)
        probed = jnp.take_along_axis(
            sel, jnp.broadcast_to(safe_assign[None, :], scores.shape),
            axis=1)
        ok = probed & (assign_loc >= 0)[None, :] & valid_loc[None, :]
        scores = jnp.where(ok, scores, NEG_INF)
        kk = min(k, base_loc.shape[0])
        loc_s, loc_i = jax.lax.top_k(scores, kk)
        loc_i = loc_i + jax.lax.axis_index(shard_axis) * base_loc.shape[0]
        all_s = jax.lax.all_gather(loc_s, shard_axis, axis=1, tiled=True)
        all_i = jax.lax.all_gather(loc_i, shard_axis, axis=1, tiled=True)
        best_s, pos = jax.lax.top_k(all_s, k)
        best_i = jnp.take_along_axis(all_i, pos, axis=1)
        best_i = jnp.where(best_s > NEG_INF, best_i, -1)
        return best_s, best_i

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, None), P(shard_axis, None), P(shard_axis),
                  P(shard_axis), P(shard_axis), P(None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(fn)
