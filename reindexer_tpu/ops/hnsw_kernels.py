"""Device kernels for the HNSW engine: batched beam search + neighbor
heuristic.

TPU-native re-design of the reference's hnswlib fork
(cpp_src/core/index/float_vector/hnswlib/hnswalg.h): the graph lives as a
padded neighbor table int32[N, M] per layer (instead of per-node link lists
with fine-grained locks, hnswalg.h:236-238), and `searchBaseLayerST`
(hnswalg.h:967 — greedy descent + ef beam with a visited list) becomes a
*batched* beam search: every iteration expands the best `expand` unexpanded
beam nodes of every query at once, gathers their neighbor tiles, scores them
against the query block in one fused matmul, and merges via top-k. The
visited list (visited_list_pool.h) becomes a packed uint32 bitset updated
with scatter-adds (bits are checked-then-set and deduped per step, so add ==
bitwise-or).

Scores follow ops/distance.py convention: higher is better (L2 negated).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.type_consts import VectorMetric

NEG_INF = jnp.float32(-jnp.inf)


def _score_gathered(q: jnp.ndarray, vecs: jnp.ndarray, vec_sq: jnp.ndarray,
                    metric: VectorMetric) -> jnp.ndarray:
    """q [Q, D], vecs [Q, K, D], vec_sq [Q, K] -> scores [Q, K]
    (higher-better)."""
    dots = jnp.einsum("qkd,qd->qk", vecs, q,
                      preferred_element_type=jnp.float32)
    if metric == VectorMetric.L2:
        q_sq = jnp.sum(q * q, axis=1, keepdims=True)
        return 2.0 * dots - vec_sq - q_sq
    return dots


class DataPack:
    """Vector storage handed to the graph kernels: fp32 rows or SQ8 codes
    (reference: HierarchicalNSWImpl templated over float/uint8 storage,
    hnswalg.h). Hashable per (id of arrays) so jit treats it as static-free
    pytree via tree flattening below."""

    def __init__(self, data, data_sq, lo=None, alpha=None):
        self.data = data          # f32[N, D] or uint8[N, D] codes
        self.data_sq = data_sq    # f32[N] exact |v|^2 (L2 correction)
        self.lo = lo              # f32[D] quantization offsets (codes only)
        self.alpha = alpha        # f32[D] quantization scales (codes only)

    @property
    def quantized(self) -> bool:
        return self.lo is not None

    def tree_flatten(self):
        if self.lo is None:
            return (self.data, self.data_sq), False
        return (self.data, self.data_sq, self.lo, self.alpha), True

    @classmethod
    def tree_unflatten(cls, quantized, children):
        if not quantized:
            return cls(children[0], children[1])
        return cls(*children)


jax.tree_util.register_pytree_node(
    DataPack, DataPack.tree_flatten, DataPack.tree_unflatten)


def _score_ids(q: jnp.ndarray, pack: DataPack, ids: jnp.ndarray,
               metric: VectorMetric) -> jnp.ndarray:
    """Gather + score rows `ids` [Q, K] against q [Q, D] (higher-better);
    callers mask invalid ids themselves. Dequantization fuses into the
    contraction for SQ8 packs (v ~ lo + alpha*code)."""
    if not pack.quantized:
        return _score_gathered(q, pack.data[ids], pack.data_sq[ids], metric)
    codes = pack.data[ids].astype(jnp.float32)        # [Q, K, D]
    qa = q * pack.alpha[None, :]
    dots = jnp.einsum("qkd,qd->qk", codes, qa,
                      preferred_element_type=jnp.float32)
    dots = dots + jnp.dot(q, pack.lo,
                          preferred_element_type=jnp.float32)[:, None]
    if metric == VectorMetric.L2:
        q_sq = jnp.sum(q * q, axis=1, keepdims=True)
        return 2.0 * dots - pack.data_sq[ids] - q_sq
    return dots


def _beam_init(queries, pack, n_rows: int, entry_ids, ef: int, fcap: int,
               metric: VectorMetric):
    """Initial beam state from entry points: result set W, frontier C
    (sorted best-first), visited bitset with entry bits set."""
    Q = queries.shape[0]
    n_words = (n_rows + 31) // 32
    e0 = entry_ids.shape[1]
    entry_valid = entry_ids >= 0
    safe_entry = jnp.where(entry_valid, entry_ids, 0)
    entry_scores = _score_ids(queries, pack, safe_entry, metric)
    entry_scores = jnp.where(entry_valid, entry_scores, NEG_INF)

    w_ids = jnp.full((Q, ef), -1, dtype=jnp.int32)
    w_s = jnp.full((Q, ef), NEG_INF, dtype=jnp.float32)
    w_ids = w_ids.at[:, :e0].set(jnp.where(entry_valid, entry_ids, -1))
    w_s = w_s.at[:, :e0].set(entry_scores)
    c_ids = jnp.full((Q, fcap), -1, dtype=jnp.int32)
    c_s = jnp.full((Q, fcap), NEG_INF, dtype=jnp.float32)
    c_ids = c_ids.at[:, :e0].set(jnp.where(entry_valid, entry_ids, -1))
    c_s = c_s.at[:, :e0].set(entry_scores)
    # frontier must stay sorted best-first (pop reads the head)
    c_s, cpos0 = jax.lax.top_k(c_s, fcap)
    c_ids = jnp.take_along_axis(c_ids, cpos0, axis=1)

    visited = jnp.zeros((Q, n_words), dtype=jnp.uint32)
    qrows = jnp.arange(Q, dtype=jnp.int32)[:, None]
    visited = visited.at[
        jnp.broadcast_to(qrows, (Q, e0)), safe_entry >> 5].add(
        jnp.where(entry_valid,
                  (jnp.uint32(1) << (safe_entry & 31).astype(jnp.uint32)),
                  jnp.uint32(0)), mode="drop")
    return w_s, w_ids, c_s, c_ids, visited


def _beam_loop(queries, pack, links, w_s, w_ids, c_s, c_ids, visited,
               ef: int, expand: int, max_iters: int, metric: VectorMetric):
    """The best-first expansion loop shared by one-shot and streaming
    searches. Returns the final full state + iteration count."""
    Q, D = queries.shape
    N, M = links.shape
    K = expand * M  # gathered candidates per iteration
    fcap = c_s.shape[1]
    qrows = jnp.arange(Q, dtype=jnp.int32)[:, None]

    def cond(state):
        w_s, w_ids, c_s, c_ids, visited, it = state
        # classic termination: stop when the best frontier node cannot
        # improve the worst result (per query); run while any query active
        c_best = c_s[:, 0]
        w_worst = w_s[:, ef - 1]
        active = (c_best > NEG_INF) & (c_best >= w_worst)
        return jnp.logical_and(it < max_iters, jnp.any(active))

    def body(state):
        w_s, w_ids, c_s, c_ids, visited, it = state
        # pop the best `expand` frontier entries (frontier kept sorted)
        sel_ids = jnp.where(c_s[:, :expand] > NEG_INF, c_ids[:, :expand], 0)
        sel_ok = c_s[:, :expand] > NEG_INF
        c_s = c_s.at[:, :expand].set(NEG_INF)
        c_ids = c_ids.at[:, :expand].set(-1)

        # gather neighbors [Q, expand, M] -> [Q, K]
        nbrs = links[sel_ids].reshape(Q, K)
        nbrs = jnp.where(
            jnp.broadcast_to(sel_ok[:, :, None], (Q, expand, M)).reshape(Q, K),
            nbrs, -1)
        valid = nbrs >= 0
        safe = jnp.where(valid, nbrs, 0)

        # dedup within the step: sort by id, mask repeats
        order = jnp.argsort(nbrs, axis=1)
        sorted_ids = jnp.take_along_axis(nbrs, order, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((Q, 1), dtype=bool),
             sorted_ids[:, 1:] == sorted_ids[:, :-1]], axis=1)
        inv = jnp.argsort(order, axis=1)
        dup = jnp.take_along_axis(dup, inv, axis=1)
        fresh = valid & ~dup

        # visited check (bit test), then set (add == or: bits distinct+unset)
        words = jnp.take_along_axis(visited, safe >> 5, axis=1)
        bit = (jnp.uint32(1) << (safe & 31).astype(jnp.uint32))
        seen = (words & bit) != 0
        fresh = fresh & ~seen
        visited = visited.at[
            jnp.broadcast_to(qrows, (Q, K)), safe >> 5].add(
            jnp.where(fresh, bit, jnp.uint32(0)), mode="drop")

        scores = _score_ids(queries, pack, safe, metric)
        scores = jnp.where(fresh, scores, NEG_INF)
        new_ids = jnp.where(fresh, nbrs, -1)

        # results: W = top-ef of (W u new)
        mw_s = jnp.concatenate([w_s, scores], axis=1)
        mw_i = jnp.concatenate([w_ids, new_ids], axis=1)
        w_s2, pos = jax.lax.top_k(mw_s, ef)
        w_i2 = jnp.take_along_axis(mw_i, pos, axis=1)
        w_i2 = jnp.where(w_s2 > NEG_INF, w_i2, -1)

        # frontier: C = top-fcap of (C u new), sorted best-first
        mc_s = jnp.concatenate([c_s, scores], axis=1)
        mc_i = jnp.concatenate([c_ids, new_ids], axis=1)
        c_s2, cpos = jax.lax.top_k(mc_s, fcap)
        c_i2 = jnp.take_along_axis(mc_i, cpos, axis=1)
        c_i2 = jnp.where(c_s2 > NEG_INF, c_i2, -1)
        return w_s2, w_i2, c_s2, c_i2, visited, it + 1

    return jax.lax.while_loop(
        cond, body, (w_s, w_ids, c_s, c_ids, visited, jnp.int32(0)))


@functools.partial(
    jax.jit,
    static_argnames=("ef", "expand", "max_iters", "metric"))
def beam_search_layer(
    queries: jnp.ndarray,      # f32[Q, D]
    pack: DataPack,            # fp32 rows or SQ8 codes
    links: jnp.ndarray,        # int32[N, M]  (-1 = empty slot)
    entry_ids: jnp.ndarray,    # int32[Q, E0] starting beam (-1 pad)
    ef: int, expand: int, max_iters: int, metric: VectorMetric,
):
    """Batched best-first beam search on one graph layer.

    Faithful batched form of the reference's ef-search (searchBaseLayerST,
    hnswalg.h:967): a RESULT set W of size ef and a separate unexpanded
    FRONTIER queue C — keeping them separate matters, because a frontier
    node that ranks below the current top-ef results must still be
    expandable (the classic algorithm pops candidates until the best
    candidate is worse than the worst result). Each iteration expands the
    `expand` best frontier nodes of every query at once.

    Returns (w_scores f32[Q, ef], w_ids int32[Q, ef]) best-first; empty
    slots are (-inf, -1).
    """
    w_s, w_ids, c_s, c_ids, visited = _beam_init(
        queries, pack, links.shape[0], entry_ids, ef, ef, metric)
    w_s, w_ids, _, _, _, _ = _beam_loop(
        queries, pack, links, w_s, w_ids, c_s, c_ids, visited,
        ef, expand, max_iters, metric)
    return w_s, w_ids


@functools.partial(jax.jit, static_argnames=("n_rows", "fcap", "metric"))
def beam_begin_stream(
    queries: jnp.ndarray,      # f32[Q, D]
    pack: DataPack,
    entry_ids: jnp.ndarray,    # int32[Q, E0] layer-0 entries (-1 pad)
    n_rows: int, fcap: int, metric: VectorMetric,
):
    """BeginStreamingSearch analog (reference hnswalg.h:1865): score the
    entry points and build the initial frontier + visited bitset. The
    entry scores come back as the first batch's W seed (they are visited
    already, so no later batch can re-emit them).

    Returns (seed_s, seed_i, c_s, c_ids, visited)."""
    e0 = entry_ids.shape[1]
    w_s, w_ids, c_s, c_ids, visited = _beam_init(
        queries, pack, n_rows, entry_ids, e0, fcap, metric)
    return w_s, w_ids, c_s, c_ids, visited


def _fit_width(s, i, width: int):
    """Pad or best-first-truncate a (scores, ids) pair to `width` columns."""
    if s.shape[1] < width:
        pad = width - s.shape[1]
        s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=NEG_INF)
        i = jnp.pad(i, ((0, 0), (0, pad)), constant_values=-1)
    elif s.shape[1] > width:
        s, pos = jax.lax.top_k(s, width)
        i = jnp.take_along_axis(i, pos, axis=1)
    return s, i


@functools.partial(
    jax.jit,
    static_argnames=("ef", "expand", "max_iters", "metric"))
def beam_search_resume(
    queries: jnp.ndarray,      # f32[Q, D]
    pack: DataPack,
    links: jnp.ndarray,        # int32[N, M]
    w_seed_s: jnp.ndarray,     # f32[Q, S] scored-but-unreturned seeds
    w_seed_i: jnp.ndarray,     # int32[Q, S] (entry points on the 1st batch)
    c_s: jnp.ndarray,          # f32[Q, F] saved frontier (sorted best-first)
    c_ids: jnp.ndarray,        # int32[Q, F]
    visited: jnp.ndarray,      # uint32[Q, n_words] saved visited bitset
    ef: int, expand: int, max_iters: int, metric: VectorMetric,
):
    """Continue a streaming beam search (reference ContinueStreamingSearch,
    hnswalg.h:1945): resume from a saved frontier + visited bitset and
    collect the next `ef` nearest not-yet-visited nodes. Because W refills
    only from freshly-visited nodes, successive batches are disjoint by
    construction — no host-side seen-set, no re-search.

    Returns (w_s, w_ids, c_s, c_ids, visited, iters)."""
    w_s, w_ids = _fit_width(w_seed_s, w_seed_i, ef)
    c_s, c_ids = _fit_width(c_s, c_ids, ef)
    return _beam_loop(queries, pack, links, w_s, w_ids, c_s, c_ids, visited,
                      ef, expand, max_iters, metric)


@functools.partial(jax.jit, static_argnames=("metric",))
def exact_rescore(
    queries: jnp.ndarray,      # f32[Q, D]
    data: jnp.ndarray,         # f32[N, D] exact rows
    data_sq: jnp.ndarray,      # f32[N]
    ids: jnp.ndarray,          # int32[Q, K] beam results (-1 pad)
    scores_in: jnp.ndarray,    # f32[Q, K] quantized scores (pad mask only)
    metric: VectorMetric,
):
    """Exact re-ranking of quantized beam results: the SQ8 beam finds the
    right neighborhood but its ~alpha-scale score error mis-ranks the
    final top-k (recall saturated at 0.91 on the 200k demo). Re-scoring
    the K returned rows against the resident fp32 vectors costs one
    [Q, K, D] gather + re-sort in the SAME dispatch chain (reference
    analog: exact distances on the float map after a quantized walk,
    float_vector.md:296+)."""
    valid = (ids >= 0) & (scores_in > NEG_INF)
    pack = DataPack(data, data_sq)
    s = _score_ids(queries, pack, jnp.where(valid, ids, 0), metric)
    s = jnp.where(valid, s, NEG_INF)
    s2, pos = jax.lax.top_k(s, s.shape[1])
    ids2 = jnp.take_along_axis(ids, pos, axis=1)
    ids2 = jnp.where(s2 > NEG_INF, ids2, -1)
    return s2, ids2


@functools.partial(jax.jit, static_argnames=("metric", "max_hops"))
def greedy_descend(
    queries: jnp.ndarray,      # f32[Q, D]
    pack: DataPack,            # fp32 rows or SQ8 codes
    links_stack: jnp.ndarray,  # int32[Lu, N, m] upper layers, TOP first
    entry: jnp.ndarray,        # int32[Q]
    metric: VectorMetric, max_hops: int = 64,
):
    """Greedy descent through the upper layers (reference: the level>0 loop
    of searchKnn, hnswalg.h:1988 — single-entry greedy walk per layer).
    All layers run inside one jit (fori over the stacked link tables) so a
    query batch costs one device dispatch. Returns int32[Q] layer-0 entries."""
    Q = queries.shape[0]
    Lu = links_stack.shape[0]
    m = links_stack.shape[2]

    def score_of(ids):
        v = ids >= 0
        safe = jnp.where(v, ids, 0)
        s = _score_ids(queries, pack, safe, metric)
        return jnp.where(v, s, NEG_INF)

    def one_layer(l, carry):
        cur, cur_s = carry

        def cond(st):
            _, _, improved, hops = st
            return jnp.logical_and(jnp.any(improved), hops < max_hops)

        def body(st):
            cur, cur_s, _, hops = st
            nbrs = links_stack[l][cur]              # [Q, m]
            s = score_of(nbrs)
            best_pos = jnp.argmax(s, axis=1)
            best_s = jnp.take_along_axis(s, best_pos[:, None], axis=1)[:, 0]
            best_i = jnp.take_along_axis(nbrs, best_pos[:, None], axis=1)[:, 0]
            imp = best_s > cur_s
            cur = jnp.where(imp, best_i, cur)
            cur_s = jnp.where(imp, best_s, cur_s)
            return cur, cur_s, imp, hops + 1

        cur, cur_s, _, _ = jax.lax.while_loop(
            cond, body, (cur, cur_s, jnp.ones(Q, dtype=jnp.bool_),
                         jnp.int32(0)))
        return cur, cur_s

    cur = entry
    cur_s = score_of(entry[:, None])[:, 0]
    cur, cur_s = jax.lax.fori_loop(0, Lu, one_layer, (cur, cur_s))
    return cur


@functools.partial(
    jax.jit, static_argnames=("ef", "expand", "max_iters", "m", "metric"))
def insert_layer(
    queries: jnp.ndarray,        # f32[Q, D] new points
    pack: DataPack,              # vector storage (fp32 during build)
    links: jnp.ndarray,          # int32[N, M] this layer
    entry_ids: jnp.ndarray,      # int32[Q]
    cand_extra_ids: jnp.ndarray,     # int32[Q, KC] chunk-internal cands (-1 pad)
    cand_extra_scores: jnp.ndarray,  # f32[Q, KC]
    ef: int, expand: int, max_iters: int, m: int, metric: VectorMetric,
):
    """One fused insertion step for a whole batch on one layer: efC beam
    search + merge of batch-internal candidates + neighbor-selection
    heuristic — a single device dispatch per (chunk, layer) instead of
    beam/heuristic round-trips (the device analog of the reference's
    per-point addPoint pipeline, hnswalg.h:1402).

    Returns (selected int32[Q, m] best-first (-1 pad), next_entries int32[Q]).
    """
    bs, bi = beam_search_layer(queries, pack, links,
                               entry_ids[:, None], ef, expand, max_iters,
                               metric)
    next_ents = jnp.where(bi[:, 0] >= 0, bi[:, 0], entry_ids)
    # merge chunk-internal candidates, re-sort best-first
    all_s = jnp.concatenate([bs, cand_extra_scores], axis=1)
    all_i = jnp.concatenate([bi, cand_extra_ids], axis=1)
    all_s = jnp.where(all_i >= 0, all_s, NEG_INF)
    srt_s, pos = jax.lax.top_k(all_s, all_s.shape[1])
    srt_i = jnp.take_along_axis(all_i, pos, axis=1)
    srt_i = jnp.where(srt_s > NEG_INF, srt_i, -1)
    safe = jnp.where(srt_i >= 0, srt_i, 0)
    if pack.quantized:
        cand_vecs = (pack.lo[None, None, :]
                     + pack.alpha[None, None, :]
                     * pack.data[safe].astype(jnp.float32))
    else:
        cand_vecs = pack.data[safe]
    sel = heuristic_select(srt_i, srt_s, cand_vecs, m, metric)
    return sel, next_ents


@functools.partial(jax.jit, static_argnames=("m", "metric"))
def heuristic_select(
    cand_ids: jnp.ndarray,     # int32[B, C] sorted best-first (-1 pad)
    cand_scores: jnp.ndarray,  # f32[B, C] higher-better scores to the query
    cand_vecs: jnp.ndarray,    # f32[B, C, D]
    m: int, metric: VectorMetric,
):
    """Batched neighbor-selection heuristic (reference:
    getNeighborsByHeuristic2, hnswalg.h:978): walk candidates best-first,
    keep one iff it is closer to the query than to every already-kept
    candidate. Returns int32[B, m] kept ids (-1 pad)."""
    B, C = cand_ids.shape
    # pairwise candidate-candidate "closeness" (same score convention)
    dots = jnp.einsum("bcd,bed->bce", cand_vecs, cand_vecs,
                      preferred_element_type=jnp.float32)
    if metric == VectorMetric.L2:
        sq = jnp.sum(cand_vecs * cand_vecs, axis=2)
        pair = 2.0 * dots - sq[:, :, None] - sq[:, None, :]
    else:
        pair = dots

    valid = cand_ids >= 0

    def step(carry, i):
        kept, kept_cnt = carry                     # bool[B, C], int32[B]
        # closer-to-query than to any kept candidate:
        # score_q[i] (higher better) must exceed pair(i, j) for all kept j
        pij = pair[:, i, :]                        # [B, C]
        conflict = jnp.any(kept & (pij > cand_scores[:, i][:, None]), axis=1)
        take = valid[:, i] & ~conflict & (kept_cnt < m)
        kept = kept.at[:, i].set(take)
        kept_cnt = kept_cnt + take.astype(jnp.int32)
        return (kept, kept_cnt), None

    kept0 = jnp.zeros((B, C), dtype=jnp.bool_)
    (kept, _), _ = jax.lax.scan(step, (kept0, jnp.zeros(B, jnp.int32)),
                                jnp.arange(C))
    # compact kept ids to the left
    key = jnp.where(kept, -cand_scores, jnp.inf)   # kept best-first
    order = jnp.argsort(key, axis=1)[:, :m]
    sel = jnp.take_along_axis(cand_ids, order, axis=1)
    selk = jnp.take_along_axis(kept, order, axis=1)
    return jnp.where(selk, sel, -1)


@functools.partial(jax.jit, static_argnames=("k", "kc", "m", "metric",
                                             "use_heuristic"))
def exact_build_layer(
    queries: jnp.ndarray,      # f32[Q, D] new points (zero rows = pad)
    pack: DataPack,            # fp32 vector storage
    levels_d: jnp.ndarray,     # int32[N] per-row level (-1 = not in graph)
    deleted_d: jnp.ndarray,    # bool[N]
    lc: jnp.ndarray,           # int32 scalar: layer being connected (traced
                               # — one compiled program serves every layer)
    row_arr: jnp.ndarray,      # int32[Q] row id per chunk member (-1 pad)
    q_lvl_ok: jnp.ndarray,     # bool[Q] member eligible at this layer
    k: int, kc: int, m: int, metric: VectorMetric,
    use_heuristic: bool = True,
):
    """Exact-candidate batched insertion for one layer: the TPU-native build
    replaces the reference's per-point graph-walk candidate search
    (addPoint's searchBaseLayer, hnswalg.h:1402) with an EXACT top-k scan of
    the current layer population on the MXU — candidate quality is strictly
    >= the reference's approximate beam, and the cost is one fused matmul
    scan per chunk instead of ef serial graph hops per point (each hop
    gathers expand*M neighbor vectors per query from HBM — the measured
    build bottleneck). The neighbor heuristic (getNeighborsByHeuristic2
    semantics) then prunes to m as in the reference; chunk-internal KNN is
    folded in (batch members cannot see each other in the scan base yet).

    Returns sel int32[Q, m] (-1 pad), best-first.
    """
    from .distance import knn_scan

    qf = queries.astype(jnp.float32)
    Q = qf.shape[0]
    # validity computed on device from the resident levels array — callers
    # scatter 4KB of level updates per chunk instead of uploading a bool[N]
    # mask per (chunk, layer) dispatch (256KB each at 1M-row capacity)
    valid_l = (levels_d >= lc) & ~deleted_d
    bs, bi = knn_scan(qf, pack.data, valid_l, pack.data_sq, k, metric)

    if kc > 0:
        dots = jnp.dot(qf, qf.T, preferred_element_type=jnp.float32)
        if metric == VectorMetric.L2:
            sq = jnp.sum(qf * qf, axis=1)
            cs = 2.0 * dots - sq[None, :] - sq[:, None]
        else:
            cs = dots
        eye = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0) == \
            jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)
        bad = eye | ~q_lvl_ok[None, :] | (row_arr < 0)[None, :]
        cs = jnp.where(bad, NEG_INF, cs)
        cm_sc, nn = jax.lax.top_k(cs, kc)
        cm_ids = jnp.where(cm_sc > NEG_INF, row_arr[nn], -1)
        all_s = jnp.concatenate([bs, cm_sc], axis=1)
        all_i = jnp.concatenate([bi, cm_ids], axis=1)
    else:
        all_s, all_i = bs, bi
    all_s = jnp.where(all_i >= 0, all_s, NEG_INF)
    srt_s, pos = jax.lax.top_k(all_s, all_s.shape[1])
    srt_i = jnp.take_along_axis(all_i, pos, axis=1)
    srt_i = jnp.where(srt_s > NEG_INF, srt_i, -1)
    if not use_heuristic:
        # ablation knob (RX_HNSW_NO_HEURISTIC=1): plain top-m closest, no
        # diversity pruning — used to measure whether the heuristic is the
        # binding constraint for recall on a given data/metric regime
        return srt_i[:, :m]
    safe = jnp.where(srt_i >= 0, srt_i, 0)
    cand_vecs = pack.data[safe]
    return heuristic_select(srt_i, srt_s, cand_vecs, m, metric)
