"""Distributed BM25: doc-sharded posting partitions + collective top-k merge.

Multi-chip analog of the reference's distributed FT select over sharded
namespaces (core/shardingproxy.cc scatter + rank merge): each chip holds the
CSR postings of its document partition, scores its local docs with the same
BM25 core (ft/scorer.py sum_ranks — proximity/full-match boosts included),
takes a local top-k, and the per-shard candidate lists merge over ICI with
one all_gather + top_k — O(k * n_shards) bytes on the interconnect
(SURVEY.md §2.4 P8: "cross-chip BM25 merges with collectives").

IDF is computed from *global* document frequencies on the host before the
fan-out, so sharded scores equal the single-chip scores exactly. Proximity
and full-match boosts are also per-doc quantities (every doc's postings
live wholly in its shard), so they shard without approximation.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ft.scorer import NEG_INF, sum_ranks


def build_sharded_bm25(mesh: Mesh, t_count: int, cap_per_shard: int,
                       merge_k: int, bm25_type: str = "rx",
                       shard_axis: str = "shards", *,
                       dist_w: float = 0.0, dist_b: float = 1.0,
                       use_proximity: bool = False, n_terms: int = 0,
                       fm_boost: float = 1.0, use_fullmatch: bool = False):
    """Returns a jitted fn over doc-sharded postings.

    Inputs (leading dim = n_shards, sharded over `shard_axis`):
      gather_idx int32[S, G], g_term int32[S, G], g_weight f32[S, G],
      g_idf f32[S, G]                  — per-shard variant gathers (host-built)
      post_doc/post_field int32[S, P], post_tf f32[S, P],
      post_minpos int32[S, P]          — per-shard CSR postings (LOCAL doc ids)
      doc_words f32[S, cap_per_shard]
      field_words f32[S, F, cap_per_shard] — per-field doc lengths (fullmatch)
    Replicated: field/term parameter vectors + scalars k1/b/avg_len.
    Returns (scores f32[merge_k], doc_ids int32[merge_k]) with GLOBAL doc ids
    (shard offset folded in).
    """
    def local_fn(gather_idx, g_term, g_weight, g_idf,
                 post_doc, post_field, post_tf, post_minpos, doc_words,
                 field_words,
                 field_boost, bb, bw, pb, pw,
                 term_boost, term_lenboost, must_mask, not_mask,
                 scalars):
        k1, b, avg_len = scalars[0], scalars[1], scalars[2]
        sum_rank, ok = sum_ranks(
            gather_idx[0], g_term[0], g_weight[0], g_idf[0],
            post_doc[0], post_field[0], post_tf[0], post_minpos[0],
            doc_words[0],
            field_boost, bb, bw, pb, pw,
            term_boost, term_lenboost, must_mask, not_mask,
            k1, b, avg_len, t_count, cap_per_shard, bm25_type,
            dist_w=dist_w, dist_b=dist_b, use_proximity=use_proximity,
            field_words=field_words[0], n_terms=n_terms,
            fm_boost=fm_boost, use_fullmatch=use_fullmatch)
        sum_rank = jnp.where(ok, sum_rank, NEG_INF)
        kk = min(merge_k, cap_per_shard)
        loc_s, loc_i = jax.lax.top_k(sum_rank[None, :], kk)
        shard_off = jax.lax.axis_index(shard_axis) * cap_per_shard
        loc_i = loc_i + shard_off
        all_s = jax.lax.all_gather(loc_s, shard_axis, axis=1, tiled=True)
        all_i = jax.lax.all_gather(loc_i, shard_axis, axis=1, tiled=True)
        best_s, sel = jax.lax.top_k(all_s, merge_k)
        best_i = jnp.take_along_axis(all_i, sel, axis=1)
        best_i = jnp.where(best_s > NEG_INF, best_i, -1)
        return best_s[0], best_i[0]

    sh = P(shard_axis, None)
    sh3 = P(shard_axis, None, None)
    rep = P(None)
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(sh, sh, sh, sh, sh, sh, sh, sh, sh, sh3,
                  rep, rep, rep, rep, rep, rep, rep, rep, rep, rep),
        out_specs=(P(None), P(None)),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_postings(holder, n_shards: int, cap_per_shard: int):
    """Host-side partitioning of one FtDataHolder's postings by doc shard
    (doc row -> shard row//cap_per_shard). Returns per-shard padded arrays
    + per-shard posting index remap (global posting idx -> (shard, local))."""
    s_of = holder.post_doc // cap_per_shard
    local_doc = holder.post_doc % cap_per_shard
    parts = []
    max_p = 1
    for s in range(n_shards):
        m = np.flatnonzero(s_of == s)
        parts.append(m)
        max_p = max(max_p, len(m))
    pad = 1
    while pad < max_p:
        pad *= 2

    def pack(src, fill=0):
        out = np.full((n_shards, pad), fill, dtype=src.dtype)
        for s, m in enumerate(parts):
            out[s, : len(m)] = src[m]
        return out

    post_doc = np.full((n_shards, pad), 0, dtype=np.int32)
    for s, m in enumerate(parts):
        post_doc[s, : len(m)] = local_doc[m]
    packed = {
        "post_doc": post_doc,
        "post_field": pack(holder.post_field),
        "post_tf": pack(holder.post_tf),
        "post_minpos": pack(holder.post_minpos),
    }
    # global posting idx -> (shard, local idx)
    remap_shard = np.empty(holder.num_postings, dtype=np.int32)
    remap_local = np.empty(holder.num_postings, dtype=np.int32)
    for s, m in enumerate(parts):
        remap_shard[m] = s
        remap_local[m] = np.arange(len(m), dtype=np.int32)
    dw = np.zeros((n_shards, cap_per_shard), dtype=np.float32)
    n = len(holder.doc_words)
    for s in range(n_shards):
        lo, hi = s * cap_per_shard, min((s + 1) * cap_per_shard, n)
        if hi > lo:
            dw[s, : hi - lo] = holder.doc_words[lo:hi]
    # per-field doc lengths, doc-sharded (fullmatch boost input)
    F = holder.field_words.shape[0]
    fw = np.zeros((n_shards, F, cap_per_shard),
                  dtype=holder.field_words.dtype)
    nfw = holder.field_words.shape[1]
    for s in range(n_shards):
        lo, hi = s * cap_per_shard, min((s + 1) * cap_per_shard, nfw)
        if hi > lo:
            fw[s, :, : hi - lo] = holder.field_words[:, lo:hi]
    return packed, dw, remap_shard, remap_local, pad, fw
