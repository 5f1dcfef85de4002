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


def build_sharded_knn_sq8(mesh: Mesh, k: int, metric: VectorMetric,
                          shard_axis: str = "shards", rerank: bool = False):
    """Sharded APPROX-SQ8 scan (VERDICT r4 #3: the sharded codes layout):
    each shard scores its row partition of the uint8 codes (dequant fused
    into the matmul — 1/4 the HBM bytes per chip), optionally re-scores its
    local top-k EXACTLY from its fp32 partition (mode=approx_rerank), then
    the per-shard candidates merge with one all_gather + top_k — the same
    wire cost as the fp32 sharded scan. Mirrors the reference sharding
    proxy's every-index-type coverage (core/shardingproxy.cc) with SQ8
    semantics from scalar_quantization/quantizer.h:11-75.

    Returns jitted fn(q, codes, lo, alpha, base, valid, sq) -> (scores, ids).
    """
    l2 = metric == VectorMetric.L2

    def local_fn(q, codes_loc, lo, alpha, base_loc, valid_loc, sq_loc):
        q_alpha = q * alpha[None, :]
        q_lo = jnp.dot(q, lo, preferred_element_type=jnp.float32)  # [Q]
        dots = jax.lax.dot_general(
            q_alpha, codes_loc.astype(jnp.bfloat16).astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + q_lo[:, None]
        if l2:
            scores = (2.0 * dots - sq_loc[None, :]
                      - jnp.sum(q * q, axis=1, keepdims=True))
        else:
            scores = dots
        scores = jnp.where(valid_loc[None, :], scores, NEG_INF)
        kk = min(k, codes_loc.shape[0])
        loc_s, loc_i = jax.lax.top_k(scores, kk)
        if rerank:
            # exact fp32 re-score of the LOCAL candidates (stays on-shard:
            # a [Q, kk, D] gather of local rows, no cross-chip traffic)
            cand = jnp.take(base_loc, jnp.maximum(loc_i, 0), axis=0)
            d_ex = jnp.einsum("qd,qkd->qk", q, cand,
                              preferred_element_type=jnp.float32)
            if l2:
                sq_c = jnp.take(sq_loc, jnp.maximum(loc_i, 0), axis=0)
                ex = (2.0 * d_ex - sq_c
                      - jnp.sum(q * q, axis=1, keepdims=True))
            else:
                ex = d_ex
            loc_s = jnp.where(loc_s > NEG_INF, ex, NEG_INF)
        shard_off = jax.lax.axis_index(shard_axis) * codes_loc.shape[0]
        loc_i = loc_i + shard_off
        all_s = jax.lax.all_gather(loc_s, shard_axis, axis=1, tiled=True)
        all_i = jax.lax.all_gather(loc_i, shard_axis, axis=1, tiled=True)
        best_s, sel = jax.lax.top_k(all_s, k)
        best_i = jnp.take_along_axis(all_i, sel, axis=1)
        best_i = jnp.where(best_s > NEG_INF, best_i, -1)
        return best_s, best_i

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, None), P(shard_axis, None), P(), P(),
                  P(shard_axis, None), P(shard_axis), P(shard_axis)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(fn)
