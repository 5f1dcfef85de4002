"""Device BM25 scoring + ranked merge.

TPU-native replacement for the reference's scalar posting-merge loop
(cpp_src/core/ft/ft_fast/merger.h Merger::Merge + mergerimpl.h mergeTerm):
the host selects which postings participate (variant expansion -> gather
index list); the device then computes, for every gathered posting, the
sub-term rank

    subTermRank = fieldBoost * termProc * bm25_norm * termBoost
                  * termLenBoost * positionRank           (mergerimpl.h:95-124)

with bm25_norm = (1-w) + bm25*boost*w and the piecewise pos2rank curve
(ftconfig.h:126-147), scatter-maxes it into a [terms, docs] accumulator
(= "max subTermRank per term"), and folds docRank = sum_t max_t with
must/not masks — one fused XLA program ending in top-k (mergeLimit cap,
ftconfig.h merge_limit).

IDF choices mirror bm25.h: rx = max(0.2, log((N-M+1)/M)/log(1+N)),
classic = log(N/(M+1))+1, word_count = 0 (rank = raw term count).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.float32(-jnp.inf)


@functools.partial(
    jax.jit,
    static_argnames=("n_q", "t_count", "cap", "merge_k", "bm25_type",
                     "use_proximity", "use_fullmatch"))
def score_and_merge_batch(
    gather_idx, g_term, g_weight, g_idf,
    post_doc, post_field, post_tf, post_minpos, doc_words,
    field_boost, field_bm25_boost, field_bm25_weight,
    field_pos_boost, field_pos_weight,
    term_boost, term_lenboost, must_mask, not_mask,
    k1, b, avg_len, n_q: int, t_count: int, cap: int, merge_k: int,
    bm25_type: str,
    dist_w=0.0, dist_b=1.0, use_proximity: bool = False,
    field_words=None, n_terms=None, fm_boost=1.0,
    use_fullmatch: bool = False,
):
    """Batched-query scoring: `n_q` independent DSL queries share ONE device
    program by occupying disjoint term-id ranges (query q's terms live at
    [q*t_count, (q+1)*t_count)). The serving-throughput analog of
    knn_batch for full-text (SURVEY.md §7 stage 8).

    g_term carries FLATTENED term ids; per-term vectors are [n_q*t_count].
    Returns (scores f32[n_q, merge_k], ids int32[n_q, merge_k])."""
    doc = post_doc[gather_idx]
    fld = post_field[gather_idx]
    tf = post_tf[gather_idx]
    minpos = post_minpos[gather_idx]
    wdoc = jnp.maximum(doc_words[doc], 1.0)
    if bm25_type == "word_count":
        bm25 = tf
    else:
        t_freq = tf / wdoc if bm25_type == "classic" else tf
        bm25 = (g_idf * t_freq * (k1 + 1.0)
                / (t_freq + k1 * (1.0 - b + b * wdoc / avg_len)))
    w_f = field_bm25_weight[fld]
    bm25_norm = (1.0 - w_f) + bm25 * field_bm25_boost[fld] * w_f
    pw = field_pos_weight[fld]
    posrank = (1.0 - pw) + _pos2rank(minpos) * field_pos_boost[fld] * pw
    subrank = (field_boost[fld] * g_weight * bm25_norm
               * term_boost[g_term] * term_lenboost[g_term] * posrank)
    acc = jnp.zeros((n_q * t_count, cap), dtype=jnp.float32)
    acc = acc.at[g_term, doc].max(subrank, mode="drop")
    acc = acc.reshape(n_q, t_count, cap)
    mm = must_mask.reshape(n_q, t_count)
    nm = not_mask.reshape(n_q, t_count)
    present = acc > 0.0
    if use_proximity:
        minp = _term_minpos(g_term, doc, minpos, g_weight,
                            n_q * t_count, cap)
        minp = jnp.swapaxes(minp.reshape(n_q, t_count, cap), 0, 1)
        att = _apply_proximity(jnp.swapaxes(acc, 0, 1), minp,
                               nm.T, dist_w, dist_b)
        acc = jnp.swapaxes(att, 0, 1)
    excluded = jnp.any(present & nm[:, :, None], axis=1)
    rank_acc = jnp.where(nm[:, :, None], 0.0, acc)
    sum_rank = jnp.sum(rank_acc, axis=1)                  # [n_q, cap]
    if use_fullmatch:
        pos_present = present & ~nm[:, :, None]
        matched_all = (jnp.sum(pos_present.astype(jnp.int32), axis=1)
                       == n_terms[:, None])               # [n_q, cap]
        searched = field_boost[: field_words.shape[0]] > 0.0
        fm = matched_all & jnp.any(
            searched[None, :, None]
            & (field_words[None] == n_terms[:, None, None]),
            axis=1)                                       # [n_q, cap]
        sum_rank = jnp.where(fm, sum_rank * fm_boost, sum_rank)
    all_must = jnp.all(present | ~mm[:, :, None], axis=1)
    ok = all_must & ~excluded & (sum_rank > 0.0)
    sum_rank = jnp.where(ok, sum_rank, NEG_INF)
    top_s, top_i = jax.lax.top_k(sum_rank, merge_k)
    top_i = jnp.where(top_s > NEG_INF, top_i, -1)
    return top_s, top_i


# ---------------------------------------------------------------------------
# Sorted / segmented-scan formulation (no dense [T, cap] accumulator)
# ---------------------------------------------------------------------------
#
# The dense scatter-max above lowers to a serial loop on TPU (arbitrary-index
# scatters) and its [terms, docs] accumulator is O(T*cap) memory — 1M-doc
# corpora OOM the batched variant. This formulation replaces it with ONE
# lax.sort of the gathered postings by (doc, term) followed by log-depth
# segmented scans (associative_scan):
#   * per-(doc,term) segment:  max subrank (variant max), min position
#   * per-doc segment:         sum of term maxes, must/not/full-match counts
# Memory is O(G) (G = gathered postings), top-k runs over G not cap, and
# nothing scatters. Replaces the same reference hot loop (mergerimpl.h:95-124).


def _pair_scan(sr, mp, starts):
    """Segmented (max, min) inclusive scan; segments begin where starts."""
    def comb(a, b):
        va, na, fa = a
        vb, nb, fb = b
        return (jnp.where(fb, vb, jnp.maximum(va, vb)),
                jnp.where(fb, nb, jnp.minimum(na, nb)),
                fa | fb)
    v, n, _ = jax.lax.associative_scan(comb, (sr, mp, starts))
    return v, n


def _doc_scan(contrib, excl_b, must_c, pos_c, starts):
    """Segmented (sum, or, count, count) inclusive scan keyed by doc runs."""
    def comb(a, b):
        sa, ea, ma, pa, fa = a
        sb, eb, mb, pb, fb = b
        return (jnp.where(fb, sb, sa + sb),
                jnp.where(fb, eb, ea | eb),
                jnp.where(fb, mb, ma + mb),
                jnp.where(fb, pb, pa + pb),
                fa | fb)
    s, e, m, p, _ = jax.lax.associative_scan(
        comb, (contrib, excl_b, must_c, pos_c, starts))
    return s, e, m, p


def _seg_last_valid(vals, valid, starts, ident):
    """Segmented 'last valid value so far' inclusive scan."""
    def comb(a, b):
        va, ha, fa = a
        vb, hb, fb = b
        v = jnp.where(fb | hb, vb, va)
        h = jnp.where(fb, hb, ha | hb)
        return v, h, fa | fb
    v, h, _ = jax.lax.associative_scan(
        comb, (jnp.where(valid, vals, ident), valid, starts))
    return v, h


def _subranks(gather_idx, g_term, g_weight, g_idf,
              post_doc, post_field, post_tf, post_minpos, doc_words,
              field_boost, field_bm25_boost, field_bm25_weight,
              field_pos_boost, field_pos_weight,
              term_boost, term_lenboost, k1, b, avg_len, bm25_type):
    """Per-gathered-posting subTermRank (shared by dense + sorted paths)."""
    doc = post_doc[gather_idx]
    fld = post_field[gather_idx]
    tf = post_tf[gather_idx]
    minpos = post_minpos[gather_idx]
    wdoc = jnp.maximum(doc_words[doc], 1.0)
    if bm25_type == "word_count":
        bm25 = tf
    else:
        t_freq = tf / wdoc if bm25_type == "classic" else tf
        bm25 = (g_idf * t_freq * (k1 + 1.0)
                / (t_freq + k1 * (1.0 - b + b * wdoc / avg_len)))
    w_f = field_bm25_weight[fld]
    bm25_norm = (1.0 - w_f) + bm25 * field_bm25_boost[fld] * w_f
    pw = field_pos_weight[fld]
    posrank = (1.0 - pw) + _pos2rank(minpos) * field_pos_boost[fld] * pw
    subrank = (field_boost[fld] * g_weight * bm25_norm
               * term_boost[g_term] * term_lenboost[g_term] * posrank)
    return doc, minpos, subrank


def sum_ranks_sorted(
    gather_idx, g_term, g_weight, g_idf,
    post_doc, post_field, post_tf, post_minpos, doc_words,
    field_boost, field_bm25_boost, field_bm25_weight,
    field_pos_boost, field_pos_weight,
    term_boost, term_lenboost, must_mask, not_mask,
    k1, b, avg_len, t_count: int, cap: int, bm25_type: str,
    dist_w=0.0, dist_b=1.0, use_proximity: bool = False,
    field_words=None, n_terms=0, fm_boost=1.0, use_fullmatch: bool = False,
):
    """Traceable core of the sorted path. Returns (scores f32[G],
    doc_keys i32[G]) where scores are -inf except at doc-run leaders."""
    doc, minpos, subrank = _subranks(
        gather_idx, g_term, g_weight, g_idf,
        post_doc, post_field, post_tf, post_minpos, doc_words,
        field_boost, field_bm25_boost, field_bm25_weight,
        field_pos_boost, field_pos_weight,
        term_boost, term_lenboost, k1, b, avg_len, bm25_type)

    padm = g_weight <= 0.0
    dockey = jnp.where(padm, cap, doc).astype(jnp.int32)
    termk = jnp.where(padm, t_count, g_term).astype(jnp.int32)
    mp = jnp.where(padm, _POS_BIG, minpos.astype(jnp.float32))
    sr = jnp.where(padm, 0.0, subrank)

    # pack (doc, term) into ONE int32 sort key when it fits: the bitonic
    # sort then moves 3 arrays with 1-key comparisons instead of 4 arrays
    # with 2-key comparisons (t_count is pow2; termk <= t_count needs one
    # extra bit). Giant caps fall back to the 2-key sort.
    t2 = 2 * t_count
    shift = t2.bit_length() - 1
    if (cap + 1) << shift < (1 << 31):
        key = jnp.bitwise_or(jnp.left_shift(dockey, shift), termk)
        key, sr, mp = jax.lax.sort((key, sr, mp), num_keys=1)
        dockey = jnp.right_shift(key, shift)
        termk = jnp.bitwise_and(key, t2 - 1)
    else:
        dockey, termk, sr, mp = jax.lax.sort(
            (dockey, termk, sr, mp), num_keys=2)
    real = dockey < cap

    prev_doc = jnp.concatenate([jnp.full((1,), -1, jnp.int32), dockey[:-1]])
    prev_term = jnp.concatenate([jnp.full((1,), -1, jnp.int32), termk[:-1]])
    nxt_doc = jnp.concatenate([dockey[1:], jnp.full((1,), -2, jnp.int32)])
    nxt_term = jnp.concatenate([termk[1:], jnp.full((1,), -2, jnp.int32)])
    pair_start = (dockey != prev_doc) | (termk != prev_term)
    pair_end = (dockey != nxt_doc) | (termk != nxt_term)
    doc_start = dockey != prev_doc
    doc_end = dockey != nxt_doc

    smax, pmin = _pair_scan(sr, mp, pair_start)
    leader = pair_end & real
    present = leader & (smax > 0.0)

    # per-element term masks (index t_count = padding -> False)
    ext = jnp.zeros((1,), dtype=jnp.bool_)
    t_not = jnp.concatenate([not_mask, ext])[jnp.minimum(termk, t_count)]
    t_must = jnp.concatenate([must_mask, ext])[jnp.minimum(termk, t_count)]

    att = smax
    if use_proximity:
        # carry = min-position of the previous positive present term in this
        # doc (terms appear in ascending order inside a doc run — the exact
        # order the dense scan walks them)
        upd = present & ~t_not
        lastv, lasth = _seg_last_valid(pmin, upd, doc_start, _POS_BIG)
        carry = jnp.concatenate([jnp.full((1,), _POS_BIG), lastv[:-1]])
        hasp = jnp.concatenate([jnp.zeros((1,), jnp.bool_), lasth[:-1]])
        carry = jnp.where(doc_start, _POS_BIG, carry)
        hasp = jnp.where(doc_start, False, hasp)
        dist = jnp.maximum(jnp.abs(pmin - carry), 1.0)
        norm = jnp.where(present & hasp,
                         (1.0 - dist_w) + dist_b * dist_w / dist, 1.0)
        att = smax * norm

    contrib = jnp.where(present & ~t_not, att, 0.0)
    excl_b = present & t_not
    must_c = (present & t_must).astype(jnp.int32)
    pos_c = (present & ~t_not).astype(jnp.int32)
    docsum, excl, must_cnt, pos_cnt = _doc_scan(
        contrib, excl_b, must_c, pos_c, doc_start)

    n_must = jnp.sum(must_mask.astype(jnp.int32))
    doc_leader = doc_end & real
    if use_fullmatch:
        searched = field_boost[: field_words.shape[0]] > 0.0
        fm_doc = jnp.any(searched[:, None] & (field_words == n_terms), axis=0)
        fm = fm_doc[jnp.minimum(dockey, cap - 1)] & (pos_cnt == n_terms)
        docsum = jnp.where(fm, docsum * fm_boost, docsum)
    ok = (doc_leader & (must_cnt == n_must) & ~excl & (docsum > 0.0))
    scores = jnp.where(ok, docsum, NEG_INF)
    return scores, dockey


def _topk_sorted(scores, dockey, merge_k: int):
    kk = min(merge_k, scores.shape[0])
    top_s, idx = jax.lax.top_k(scores, kk)
    top_i = jnp.take(dockey, idx)
    top_i = jnp.where(top_s > NEG_INF, top_i, -1)
    if kk < merge_k:
        top_s = jnp.pad(top_s, (0, merge_k - kk), constant_values=NEG_INF)
        top_i = jnp.pad(top_i, (0, merge_k - kk), constant_values=-1)
    return top_s, top_i


@functools.partial(
    jax.jit,
    static_argnames=("t_count", "cap", "merge_k", "bm25_type",
                     "use_proximity", "use_fullmatch"))
def score_and_merge_sorted(
    gather_idx, g_term, g_weight, g_idf,
    post_doc, post_field, post_tf, post_minpos, doc_words,
    field_boost, field_bm25_boost, field_bm25_weight,
    field_pos_boost, field_pos_weight,
    term_boost, term_lenboost, must_mask, not_mask,
    k1, b, avg_len, t_count: int, cap: int, merge_k: int, bm25_type: str,
    dist_w=0.0, dist_b=1.0, use_proximity: bool = False,
    field_words=None, n_terms=0, fm_boost=1.0, use_fullmatch: bool = False,
):
    """Drop-in replacement for score_and_merge built on the sorted path."""
    scores, dockey = sum_ranks_sorted(
        gather_idx, g_term, g_weight, g_idf,
        post_doc, post_field, post_tf, post_minpos, doc_words,
        field_boost, field_bm25_boost, field_bm25_weight,
        field_pos_boost, field_pos_weight,
        term_boost, term_lenboost, must_mask, not_mask,
        k1, b, avg_len, t_count, cap, bm25_type,
        dist_w, dist_b, use_proximity,
        field_words, n_terms, fm_boost, use_fullmatch)
    return _topk_sorted(scores, dockey, merge_k)


@functools.partial(
    jax.jit,
    static_argnames=("t_count", "cap", "merge_k", "bm25_type",
                     "use_proximity", "use_fullmatch"))
def score_and_merge_batch_sorted(
    gather_idx, g_term, g_weight, g_idf,      # [n_q, G] per-query arrays
    post_doc, post_field, post_tf, post_minpos, doc_words,
    field_boost, field_bm25_boost, field_bm25_weight,
    field_pos_boost, field_pos_weight,
    term_boost, term_lenboost, must_mask, not_mask,   # [n_q, t_count]
    k1, b, avg_len, t_count: int, cap: int, merge_k: int, bm25_type: str,
    dist_w=0.0, dist_b=1.0, use_proximity: bool = False,
    field_words=None, n_terms=None, fm_boost=1.0,     # n_terms: i32[n_q]
    use_fullmatch: bool = False,
):
    """Batched serving path: vmap of the sorted single-query pipeline.
    Memory is O(n_q * G) — scales to 1M-doc corpora where the dense
    [n_q*t_count, cap] accumulator cannot."""
    def one(gi, gt, gw, gidf, tb, tlb, mm, nm, nt):
        scores, dockey = sum_ranks_sorted(
            gi, gt, gw, gidf,
            post_doc, post_field, post_tf, post_minpos, doc_words,
            field_boost, field_bm25_boost, field_bm25_weight,
            field_pos_boost, field_pos_weight,
            tb, tlb, mm, nm,
            k1, b, avg_len, t_count, cap, bm25_type,
            dist_w, dist_b, use_proximity,
            field_words, nt, fm_boost, use_fullmatch)
        return _topk_sorted(scores, dockey, merge_k)

    if n_terms is None:
        n_terms = jnp.zeros(gather_idx.shape[0], jnp.int32)
    return jax.vmap(one)(gather_idx, g_term, g_weight, g_idf,
                         term_boost, term_lenboost, must_mask, not_mask,
                         n_terms)


def idf_host(total_docs: int, matched_docs: np.ndarray, bm25_type: str,
             ) -> np.ndarray:
    """Per-word IDF on host (reference: bm25.h IDF formulas)."""
    n = float(max(total_docs, 1))
    m = np.maximum(matched_docs.astype(np.float64), 1.0)
    if bm25_type == "classic":
        return (np.log(n / (m + 1.0)) + 1.0).astype(np.float32)
    if bm25_type == "word_count":
        return np.zeros_like(m, dtype=np.float32)
    f = np.log((n - m + 1.0) / m) / np.log(1.0 + n)
    return np.maximum(f, 0.2).astype(np.float32)


def _pos2rank(pos: jnp.ndarray) -> jnp.ndarray:
    """Piecewise position rank (reference: FTFieldConfig::pos2rank,
    ftconfig.h:126-144)."""
    p = pos.astype(jnp.float32)
    return jnp.where(
        p <= 10, 1.0 - p / 100.0,
        jnp.where(p <= 100, 0.9 - p / 1000.0,
                  jnp.where(p <= 1000, 0.8 - p / 10000.0,
                            jnp.where(p <= 10000, 0.7 - p / 100000.0,
                                      jnp.where(p <= 100000, 0.6 - p / 1e6,
                                                0.5)))))


_POS_BIG = jnp.float32(1e9)


def _term_minpos(g_term, doc, minpos, g_weight, t_count: int, cap: int):
    """Min token position per (term, doc) — scatter-min companion to the
    rank accumulator. Padding postings (g_weight == 0) are pushed to the
    sentinel so they never win the min."""
    p = jnp.where(g_weight > 0.0, minpos.astype(jnp.float32), _POS_BIG)
    minp = jnp.full((t_count, cap), _POS_BIG, dtype=jnp.float32)
    return minp.at[g_term, doc].min(p, mode="drop")


def _apply_proximity(acc, minp, not_mask, dist_w, dist_b):
    """Term-proximity attenuation (reference: mergerimpl.h:179-181): for each
    term after the first that matches a doc already matched by an earlier
    term, its rank is multiplied by

        normDist = (1 - distanceWeight)
                 + distanceBoost * distanceWeight / max(distance, 1)

    (FTFieldConfig::bound, ftconfig.h:146) where `distance` is the position
    distance to the previous matched term. The reference takes the min over
    all same-field position pairs; this TPU formulation uses the per-(term,
    doc) min positions already resident on device (post_minpos) — a scan
    over the tiny term axis, elementwise over docs, so the cost is O(T*cap)
    adds on top of the existing accumulator."""
    present = acc > 0.0

    def step(carry, xs):
        acc_t, minp_t, pres_t, not_t = xs
        has_prev = carry < _POS_BIG
        dist = jnp.maximum(jnp.abs(minp_t - carry), 1.0)
        norm = jnp.where(pres_t & has_prev,
                         (1.0 - dist_w) + dist_b * dist_w / dist, 1.0)
        new_carry = jnp.where(pres_t & ~not_t, minp_t, carry)
        return new_carry, acc_t * norm

    carry0 = jnp.full(acc.shape[1:], _POS_BIG, dtype=jnp.float32)
    nm = jnp.broadcast_to(
        not_mask.reshape(not_mask.shape + (1,) * (acc.ndim - not_mask.ndim)),
        acc.shape)
    _, out = jax.lax.scan(step, carry0, (acc, minp, present, nm))
    return out


def _full_match_boost(sum_rank, field_boost, field_words, n_terms, fm_boost,
                      matched_all):
    """Boost docs that matched ALL positive terms (canBeBoostedByFullMatch,
    mergerimpl.h:527-531) AND where a searched field holds exactly as many
    words as the query has terms (reference: Merger::addFullMatchBoost,
    merger.h:101-109 — the reference checks the matched field only; this
    device form checks every searched field, equivalent for the common
    exact-title-match case)."""
    searched = field_boost[: field_words.shape[0]] > 0.0
    fm = matched_all & jnp.any(
        searched[:, None] & (field_words == n_terms), axis=0)
    return jnp.where(fm, sum_rank * fm_boost, sum_rank)


def sum_ranks(
    gather_idx, g_term, g_weight, g_idf,
    post_doc, post_field, post_tf, post_minpos, doc_words,
    field_boost, field_bm25_boost, field_bm25_weight,
    field_pos_boost, field_pos_weight,
    term_boost, term_lenboost, must_mask, not_mask,
    k1, b, avg_len, t_count: int, cap: int, bm25_type: str,
    dist_w=0.0, dist_b=1.0, use_proximity: bool = False,
    field_words=None, n_terms=0, fm_boost=1.0, use_fullmatch: bool = False,
):
    """Traceable core: per-doc summed rank + validity mask (docRank =
    sum_t max subTermRank with must/not folding). Shared by the single-chip
    jit (score_and_merge) and the shard_map distributed path
    (parallel/sharded_ft.py)."""
    doc = post_doc[gather_idx]
    fld = post_field[gather_idx]
    tf = post_tf[gather_idx]
    minpos = post_minpos[gather_idx]
    wdoc = jnp.maximum(doc_words[doc], 1.0)

    if bm25_type == "word_count":
        bm25 = tf
    else:
        t_freq = tf / wdoc if bm25_type == "classic" else tf
        bm25 = (g_idf * t_freq * (k1 + 1.0)
                / (t_freq + k1 * (1.0 - b + b * wdoc / avg_len)))

    w_f = field_bm25_weight[fld]
    bm25_norm = (1.0 - w_f) + bm25 * field_bm25_boost[fld] * w_f
    pw = field_pos_weight[fld]
    posrank = (1.0 - pw) + _pos2rank(minpos) * field_pos_boost[fld] * pw

    subrank = (field_boost[fld] * g_weight * bm25_norm
               * term_boost[g_term] * term_lenboost[g_term] * posrank)

    acc = jnp.zeros((t_count, cap), dtype=jnp.float32)
    acc = acc.at[g_term, doc].max(subrank, mode="drop")

    present = acc > 0.0
    if use_proximity:
        minp = _term_minpos(g_term, doc, minpos, g_weight, t_count, cap)
        acc = _apply_proximity(acc, minp, not_mask, dist_w, dist_b)
    excluded = jnp.any(present & not_mask[:, None], axis=0)
    rank_acc = jnp.where(not_mask[:, None], 0.0, acc)
    sum_rank = jnp.sum(rank_acc, axis=0)
    if use_fullmatch:
        pos_present = present & ~not_mask[:, None]
        matched_all = jnp.sum(pos_present.astype(jnp.int32), axis=0) == n_terms
        sum_rank = _full_match_boost(sum_rank, field_boost, field_words,
                                     n_terms, fm_boost, matched_all)
    all_must = jnp.all(present | ~must_mask[:, None], axis=0)
    ok = all_must & ~excluded & (sum_rank > 0.0)
    return sum_rank, ok


def sum_ranks_fielded(
    gather_idx, g_term, g_weight, g_idf,
    post_doc, post_field, post_tf, post_minpos, doc_words,
    field_boost, field_bm25_boost, field_bm25_weight,
    field_pos_boost, field_pos_weight,
    term_boost, term_lenboost, must_mask, not_mask,
    sum_fields_mask,            # bool[F] '+'-marked fields
    ratio: float,
    k1, b, avg_len, t_count: int, f_count: int, cap: int, bm25_type: str,
    dist_w=0.0, dist_b=1.0, use_proximity: bool = False,
    field_words=None, n_terms=0, fm_boost=1.0, use_fullmatch: bool = False,
):
    """Field-rank summation variant (reference: SumRanksByFieldsRatio,
    fulltext.md:118-128): per (term, doc) the field ranks sort descending and
    combine as Rmax + K*R1 + K^2*R2 + ... where only '+'-marked fields (plus
    the maximum) participate. Costs an extra [T, F, cap] accumulator — used
    only when the ratio is configured non-zero."""
    doc = post_doc[gather_idx]
    fld = post_field[gather_idx]
    tf = post_tf[gather_idx]
    minpos = post_minpos[gather_idx]
    wdoc = jnp.maximum(doc_words[doc], 1.0)

    if bm25_type == "word_count":
        bm25 = tf
    else:
        t_freq = tf / wdoc if bm25_type == "classic" else tf
        bm25 = (g_idf * t_freq * (k1 + 1.0)
                / (t_freq + k1 * (1.0 - b + b * wdoc / avg_len)))
    w_f = field_bm25_weight[fld]
    bm25_norm = (1.0 - w_f) + bm25 * field_bm25_boost[fld] * w_f
    pw = field_pos_weight[fld]
    posrank = (1.0 - pw) + _pos2rank(minpos) * field_pos_boost[fld] * pw
    subrank = (field_boost[fld] * g_weight * bm25_norm
               * term_boost[g_term] * term_lenboost[g_term] * posrank)

    acc3 = jnp.zeros((t_count, f_count, cap), dtype=jnp.float32)
    acc3 = acc3.at[g_term, fld, doc].max(subrank, mode="drop")

    # per (term, doc): sort field ranks desc, geometric-sum participants
    v = jnp.transpose(acc3, (0, 2, 1))               # [T, cap, F]
    order = jnp.argsort(-v, axis=2)
    v_sorted = jnp.take_along_axis(v, order, axis=2)
    part = jnp.take_along_axis(
        jnp.broadcast_to(sum_fields_mask[None, None, :], v.shape),
        order, axis=2)
    first = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2) == 0
    include = (first | part) & (v_sorted > 0.0)
    j = jnp.cumsum(include.astype(jnp.int32), axis=2) - 1
    w = jnp.where(include, ratio ** jnp.maximum(j, 0).astype(jnp.float32),
                  0.0)
    # the max (position 0) always has weight 1
    w = jnp.where(first & include, 1.0, w)
    acc = jnp.sum(v_sorted * w, axis=2)              # [T, cap]

    present = acc > 0.0
    if use_proximity:
        minp = _term_minpos(g_term, doc, minpos, g_weight, t_count, cap)
        acc = _apply_proximity(acc, minp, not_mask, dist_w, dist_b)
    excluded = jnp.any(present & not_mask[:, None], axis=0)
    rank_acc = jnp.where(not_mask[:, None], 0.0, acc)
    sum_rank = jnp.sum(rank_acc, axis=0)
    if use_fullmatch:
        pos_present = present & ~not_mask[:, None]
        matched_all = jnp.sum(pos_present.astype(jnp.int32), axis=0) == n_terms
        sum_rank = _full_match_boost(sum_rank, field_boost, field_words,
                                     n_terms, fm_boost, matched_all)
    all_must = jnp.all(present | ~must_mask[:, None], axis=0)
    ok = all_must & ~excluded & (sum_rank > 0.0)
    return sum_rank, ok


@functools.partial(
    jax.jit,
    static_argnames=("t_count", "f_count", "cap", "merge_k", "bm25_type",
                     "ratio", "use_proximity", "use_fullmatch"))
def score_and_merge_fielded(
    gather_idx, g_term, g_weight, g_idf,
    post_doc, post_field, post_tf, post_minpos, doc_words,
    field_boost, field_bm25_boost, field_bm25_weight,
    field_pos_boost, field_pos_weight,
    term_boost, term_lenboost, must_mask, not_mask, sum_fields_mask,
    k1, b, avg_len, t_count: int, f_count: int, cap: int, merge_k: int,
    bm25_type: str, ratio: float,
    dist_w=0.0, dist_b=1.0, use_proximity: bool = False,
    field_words=None, n_terms=0, fm_boost=1.0, use_fullmatch: bool = False,
):
    sum_rank, ok = sum_ranks_fielded(
        gather_idx, g_term, g_weight, g_idf,
        post_doc, post_field, post_tf, post_minpos, doc_words,
        field_boost, field_bm25_boost, field_bm25_weight,
        field_pos_boost, field_pos_weight,
        term_boost, term_lenboost, must_mask, not_mask,
        sum_fields_mask, ratio,
        k1, b, avg_len, t_count, f_count, cap, bm25_type,
        dist_w, dist_b, use_proximity,
        field_words, n_terms, fm_boost, use_fullmatch)
    sum_rank = jnp.where(ok, sum_rank, NEG_INF)
    top_s, top_i = jax.lax.top_k(sum_rank, merge_k)
    top_i = jnp.where(top_s > NEG_INF, top_i, -1)
    return top_s, top_i


@functools.partial(
    jax.jit,
    static_argnames=("t_count", "cap", "merge_k", "bm25_type",
                     "use_proximity", "use_fullmatch"))
def score_and_merge(
    gather_idx: jnp.ndarray,     # int32[G] posting indices (pad -> 0)
    g_term: jnp.ndarray,         # int32[G] query-term id per gathered posting
    g_weight: jnp.ndarray,       # f32[G] termProc/100 (0 for padding)
    g_idf: jnp.ndarray,          # f32[G] idf of the matched word
    post_doc: jnp.ndarray,       # int32[P]
    post_field: jnp.ndarray,     # int32[P]
    post_tf: jnp.ndarray,        # f32[P]
    post_minpos: jnp.ndarray,    # int32[P]
    doc_words: jnp.ndarray,      # f32[cap]
    field_boost: jnp.ndarray,        # f32[F] 0 = field not searched
    field_bm25_boost: jnp.ndarray,   # f32[F]
    field_bm25_weight: jnp.ndarray,  # f32[F]
    field_pos_boost: jnp.ndarray,    # f32[F]
    field_pos_weight: jnp.ndarray,   # f32[F]
    term_boost: jnp.ndarray,     # f32[T]
    term_lenboost: jnp.ndarray,  # f32[T]
    must_mask: jnp.ndarray,      # bool[T] term must match
    not_mask: jnp.ndarray,       # bool[T] term must NOT match
    k1: float, b: float, avg_len: float,
    t_count: int, cap: int, merge_k: int, bm25_type: str,
    dist_w=0.0, dist_b=1.0, use_proximity: bool = False,
    field_words=None, n_terms=0, fm_boost=1.0, use_fullmatch: bool = False,
):
    """Returns (scores f32[merge_k], doc_ids int32[merge_k]); empty slots
    have score -inf / id -1. Scores are un-normalized docRank sums — the
    caller applies the *255/allmax normalization (mergerimpl.h:107)."""
    sum_rank, ok = sum_ranks(
        gather_idx, g_term, g_weight, g_idf,
        post_doc, post_field, post_tf, post_minpos, doc_words,
        field_boost, field_bm25_boost, field_bm25_weight,
        field_pos_boost, field_pos_weight,
        term_boost, term_lenboost, must_mask, not_mask,
        k1, b, avg_len, t_count, cap, bm25_type,
        dist_w, dist_b, use_proximity,
        field_words, n_terms, fm_boost, use_fullmatch)
    sum_rank = jnp.where(ok, sum_rank, NEG_INF)
    top_s, top_i = jax.lax.top_k(sum_rank, merge_k)
    top_i = jnp.where(top_s > NEG_INF, top_i, -1)
    return top_s, top_i
