"""Distributed HNSW: per-shard subgraphs + collective top-k merge.

Multi-chip analog of the reference's sharded ANN select (SURVEY.md §2.4 P8):
each chip holds the HNSW graph of its row partition (graphs are built
per-shard — exactly like the reference's per-shard namespaces); a query
beams through every shard's graph simultaneously inside `shard_map` and the
per-shard top-ef candidates merge over ICI with one all_gather + top-k.

Host-side helper `shard_hnsw_state` packs N independently built HnswIndex
partitions into mesh-sharded arrays (row-block global ids: shard s owns rows
[s*cap, (s+1)*cap)).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.type_consts import VectorMetric
from ..ops.hnsw_kernels import DataPack, beam_search_layer, greedy_descend

NEG_INF = jnp.float32(-jnp.inf)


def build_sharded_hnsw(mesh: Mesh, ef: int, expand: int, metric: VectorMetric,
                       n_upper: int, shard_axis: str = "shards"):
    """Returns jitted fn(queries, data, sq, links0, upper, entries) with all
    graph arrays row-sharded over `shard_axis`:

      data f32[S*cap, D], sq f32[S*cap], links0 int32[S*cap, M0] (LOCAL ids),
      upper int32[n_upper, S*cap, M] top-first (all -1 when n_upper == 0 is
      not supported — pass n_upper >= 1 with empty tables), entries int32[S]
      (local entry id per shard, -1 for empty shards).

    Output: (scores f32[Q, ef], GLOBAL ids int32[Q, ef]).
    """
    max_iters = 2 * ef

    def local_fn(q, data, sq, links0, upper, entries):
        cap = data.shape[0]
        pack = DataPack(data, sq)
        Q = q.shape[0]
        ent = jnp.broadcast_to(entries[0], (Q,)).astype(jnp.int32)
        has_entry = entries[0] >= 0
        safe_ent = jnp.where(has_entry, ent, 0)
        if n_upper > 0:
            safe_ent = greedy_descend(q, pack, upper, safe_ent, metric)
        w_s, w_i = beam_search_layer(
            q, pack, links0, safe_ent[:, None], ef, expand, max_iters,
            metric)
        w_s = jnp.where(has_entry, w_s, NEG_INF)
        w_i = jnp.where((w_i >= 0) & has_entry,
                        w_i + jax.lax.axis_index(shard_axis) * cap, -1)
        all_s = jax.lax.all_gather(w_s, shard_axis, axis=1, tiled=True)
        all_i = jax.lax.all_gather(w_i, shard_axis, axis=1, tiled=True)
        best_s, pos = jax.lax.top_k(all_s, ef)
        best_i = jnp.take_along_axis(all_i, pos, axis=1)
        best_i = jnp.where(best_s > NEG_INF, best_i, -1)
        return best_s, best_i

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, None), P(shard_axis, None), P(shard_axis),
                  P(shard_axis, None), P(None, shard_axis, None),
                  P(shard_axis)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_hnsw_state(mesh: Mesh, indexes: Sequence, cap: int,
                     shard_axis: str = "shards"):
    """Pack per-shard HnswIndex partitions into mesh-sharded arrays.

    Every index must have capacity <= cap; n_upper is the max upper-layer
    count across shards (others pad with empty tables)."""
    S = mesh.shape[shard_axis]
    assert len(indexes) == S
    dims = indexes[0].dims
    m0 = indexes[0].m0
    m = indexes[0].m
    n_upper = max((len(ix._upper) for ix in indexes), default=0)
    data = np.zeros((S * cap, dims), dtype=np.float32)
    sq = np.zeros(S * cap, dtype=np.float32)
    links0 = np.full((S * cap, m0), -1, dtype=np.int32)
    upper = np.full((max(n_upper, 1), S * cap, m), -1, dtype=np.int32)
    entries = np.full(S, -1, dtype=np.int32)
    for s, ix in enumerate(indexes):
        ix._commit()
        kcap = ix.keeper.capacity
        assert kcap <= cap, "shard capacity exceeds pack cap"
        lo = s * cap
        data[lo: lo + kcap] = np.asarray(ix.keeper.data)
        sq[lo: lo + kcap] = np.asarray(ix.keeper.sq)
        links0[lo: lo + kcap] = ix._links0
        # align upper stacks at the BOTTOM (layer 1 = last row)
        off = n_upper - len(ix._upper)
        for li, u in enumerate(ix._upper):
            upper[off + li, lo: lo + kcap] = u
        entries[s] = ix._entry
    sh = lambda spec: NamedSharding(mesh, spec)
    return (jax.device_put(data, sh(P(shard_axis, None))),
            jax.device_put(sq, sh(P(shard_axis))),
            jax.device_put(links0, sh(P(shard_axis, None))),
            jax.device_put(upper, sh(P(None, shard_axis, None))),
            jax.device_put(entries, sh(P(shard_axis))),
            n_upper)
