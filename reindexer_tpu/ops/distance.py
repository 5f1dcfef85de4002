"""Device distance + fused top-k kernels — the MXU replacement for the
reference's SIMD distance kernels (cpp_src/tools/distances/l2_dist.cc,
ip_dist.cc: AVX512/AVX/SSE runtime dispatch) and the heap-based selection in
hnswlib/bruteforce.cc.

Design (SURVEY.md §7): brute-force KNN is a tiled `queries x base` matmul
with a fused running top-k. The scan over base chunks keeps HBM traffic
bounded (never materializes the full [Q, N] distance matrix), the per-chunk
`q @ b.T` rides the MXU, and chunk-local top-k merges into a running top-k
carry — all inside one jit so XLA fuses the elementwise tails into the
matmul epilogue.

Scores are normalized to "higher is better": inner-product/cosine use the
similarity directly, L2 uses the *negated* squared distance. `rank_for_metric`
converts a score back to the reference's rank value (L2 -> positive distance,
reference: hnsw_index.cc select() rank semantics).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.type_consts import RankOrdering, VectorMetric

NEG_INF = jnp.float32(-jnp.inf)


def _pow2(n: int, floor: int = 8) -> int:
    c = floor
    while c < n:
        c *= 2
    return c


def metric_ordering(metric: VectorMetric) -> RankOrdering:
    """Rank ordering per metric (reference: float_vector.md — L2 ascending,
    IP/cosine descending)."""
    return RankOrdering.ASC if metric == VectorMetric.L2 else RankOrdering.DESC


def scores_to_ranks(scores: jnp.ndarray, metric: VectorMetric) -> jnp.ndarray:
    """Convert internal higher-is-better scores to reference rank values."""
    if metric == VectorMetric.L2:
        return -scores  # score = -l2^2  ->  rank = l2^2 (ascending best-first)
    return scores


def _chunk_scores(q: jnp.ndarray, base_chunk: jnp.ndarray,
                  base_sq_chunk: Optional[jnp.ndarray],
                  metric: VectorMetric) -> jnp.ndarray:
    """[Q, D] x [C, D] -> [Q, C] higher-is-better scores. One MXU matmul plus
    a fused elementwise tail."""
    dots = jax.lax.dot_general(
        q, base_chunk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if metric == VectorMetric.L2:
        # -(|q|^2 - 2 q.b + |b|^2); |q|^2 is constant per row -> dropped from
        # the argmax but kept so returned ranks are true L2^2 values.
        q_sq = jnp.sum(q * q, axis=1, keepdims=True)
        return 2.0 * dots - base_sq_chunk[None, :] - q_sq
    return dots


_DN_BATCHED = (((2,), (1,)), ((0,), (0,)))   # [Q,k,W] x [Q,W,B] -> [Q,k,B]


def _trunc16_xla(x):
    """Top 16 bits of an f32 (exactly bf16-representable), via integer
    masking so the algebraic simplifier cannot fuse it away (the XLA-side
    twin of pallas_select._trunc16)."""
    return jax.lax.bitcast_convert_type(
        jnp.bitwise_and(jax.lax.bitcast_convert_type(x, jnp.int32),
                        jnp.int32(-65536)), jnp.float32)


def onehot_take(vals3: jnp.ndarray, idx: jnp.ndarray, width: int):
    """Block gather as an MXU one-hot matmul: vals3 f32[Q, W, B] taken at
    idx int32[Q, kb] -> f32[Q, kb, B].

    TPU's gather unit moves small block slices at ~11 GB/s (measured:
    0.17 ms for the fused scan's 1.7 MB candidate gather); the same
    selection as a one-hot contraction rides the MXU (full fused scan
    0.37 -> 0.14 ms). The f32 values split into three exact bf16 limbs
    (hi/mid/lo): reconstruction error ~1e-10 relative — epsilon-level
    ties that top_k resolves arbitrarily anyway; every limb product is
    exact on the MXU (one-hot entries and limbs are bf16-representable)."""
    oh = (idx[:, :, None] ==
          jax.lax.broadcasted_iota(jnp.int32, (1, 1, width), 2)
          ).astype(jnp.bfloat16)
    # BIT-TRUNCATION splits, not arithmetic (x - bf16(x)) Dekker splits:
    # under --xla_allow_excess_precision XLA fuses the bf16 round-trip
    # away, collapsing the three limbs to ~one — scores then carry bf16
    # ulps of error, which near dense selection boundaries (clustered
    # data, |b|~const so scores are catastrophic cancellations) reorders
    # the top-k almost entirely (measured: 196/200 wrong at 16k rows).
    # The integer AND is opaque to the algebraic simplifier.
    hi32 = _trunc16_xla(vals3)
    hi = hi32.astype(jnp.bfloat16)
    r1 = vals3 - hi32
    mid32 = _trunc16_xla(r1)
    mid = mid32.astype(jnp.bfloat16)
    lo = (r1 - mid32).astype(jnp.bfloat16)
    out = jax.lax.dot_general(oh, hi, dimension_numbers=_DN_BATCHED,
                              preferred_element_type=jnp.float32)
    out += jax.lax.dot_general(oh, mid, dimension_numbers=_DN_BATCHED,
                               preferred_element_type=jnp.float32)
    out += jax.lax.dot_general(oh, lo, dimension_numbers=_DN_BATCHED,
                               preferred_element_type=jnp.float32)
    return out


def exact_topk_blocks(scores: jnp.ndarray, k: int, block: int = 64):
    """EXACT top-k designed for the TPU memory system: a huge single
    lax.top_k over row widths ~1e5+ sorts the whole row (slow to compile AND
    run), so instead

      1. reduce per-`block` row maxima M [Q, G]  (one cheap VPU pass)
      2. pick the top-k *blocks* by max — every exact top-k element's block
         max is >= the k-th largest block max, so those blocks form a
         superset of the exact top-k (each block max IS an element, making
         the k largest block maxima k distinct elements >= exact kth)
      3. gather just those blocks [Q, k, block] (one-hot MXU contraction —
         see onehot_take) and run the small exact top-k over k*block
         candidates.

    No scatters, no approximation (ties at the k-th value resolve
    arbitrarily, same as any top-k; the one-hot gather adds ~1e-10-relative
    limb-reconstruction noise, below any rank-relevant gap).
    Returns (top_s [Q, k], top_i [Q, k]).
    """
    Q, C = scores.shape
    G = C // block
    # clamp -inf masks to a finite floor: the limb split would turn
    # (-inf) - (-inf) into NaN and 0 * -inf poisons the one-hot matmul;
    # restored to -inf on the way out (legit scores never reach -5e29)
    sc = jnp.maximum(scores, jnp.float32(-1e30))
    sb = sc.reshape(Q, G, block)
    m = jnp.max(sb, axis=2)
    kb = min(k, G)
    _, blk = jax.lax.top_k(m, kb)                        # [Q, kb]
    cand = onehot_take(sb, blk, G)
    cand = cand.reshape(Q, kb * block)
    base_col = (blk * block)[:, :, None] + jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, block), 2)
    cand_cols = jnp.broadcast_to(base_col, (Q, kb, block)).reshape(
        Q, kb * block)
    top_s, sel = jax.lax.top_k(cand, k)
    top_s = jnp.where(top_s > -5e29, top_s, NEG_INF)
    top_i = jnp.take_along_axis(cand_cols, sel, axis=1)
    top_i = jnp.where(top_s > NEG_INF, top_i, -1)
    return top_s, top_i


@functools.partial(jax.jit, static_argnames=("k", "metric", "chunk"))
def knn_scan(queries: jnp.ndarray, base: jnp.ndarray, valid: jnp.ndarray,
             base_sq: jnp.ndarray, k: int, metric: VectorMetric,
             chunk: int = 262144):
    """Fused brute-force KNN: returns (scores [Q, k], idx [Q, k]) with
    higher-is-better scores; invalid slots get -inf / idx -1.

    `base` is [N, D] device-resident (N a multiple of `chunk` — the caller
    pads); `valid` is [N] bool; `base_sq` is precomputed |b|^2 (only used for
    L2).
    """
    n = base.shape[0]
    q = queries.astype(jnp.float32)
    num_chunks = max(n // chunk, 1)

    def chunk_topk(scores, kk):
        """Exact per-chunk selection via block-gather (plain top_k when the
        candidate set wouldn't shrink the problem)."""
        C = scores.shape[1]
        if C < 1024 or kk * 64 * 2 >= C:
            return tuple(jax.lax.top_k(scores, kk))
        return exact_topk_blocks(scores, kk)

    if num_chunks <= 1:
        scores = _chunk_scores(q, base, base_sq, metric)
        scores = jnp.where(valid[None, :], scores, NEG_INF)
        top_s, top_i = chunk_topk(scores, min(k, n))
        if top_s.shape[1] < k:
            pad = k - top_s.shape[1]
            top_s = jnp.pad(top_s, ((0, 0), (0, pad)),
                            constant_values=NEG_INF)
            top_i = jnp.pad(top_i, ((0, 0), (0, pad)), constant_values=-1)
        top_i = jnp.where(top_s > NEG_INF, top_i, -1)
        return top_s, top_i

    base_r = base.reshape(num_chunks, chunk, base.shape[1])
    valid_r = valid.reshape(num_chunks, chunk)
    base_sq_r = base_sq.reshape(num_chunks, chunk)

    def step(carry, xs):
        best_s, best_i = carry
        b_chunk, v_chunk, sq_chunk, start = xs
        scores = _chunk_scores(q, b_chunk, sq_chunk, metric)
        scores = jnp.where(v_chunk[None, :], scores, NEG_INF)
        loc_s, loc_i = chunk_topk(scores, min(k, chunk))
        loc_i = jnp.where(loc_i >= 0, loc_i + start, -1)
        merged_s = jnp.concatenate([best_s, loc_s], axis=1)
        merged_i = jnp.concatenate([best_i, loc_i], axis=1)
        new_s, sel = jax.lax.top_k(merged_s, k)
        new_i = jnp.take_along_axis(merged_i, sel, axis=1)
        return (new_s, new_i), None

    init_s = jnp.full((q.shape[0], k), NEG_INF, dtype=jnp.float32)
    init_i = jnp.full((q.shape[0], k), -1, dtype=jnp.int32)
    starts = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    (best_s, best_i), _ = jax.lax.scan(
        step, (init_s, init_i), (base_r, valid_r, base_sq_r, starts))
    best_i = jnp.where(best_s > NEG_INF, best_i, -1)
    return best_s, best_i


@functools.partial(jax.jit, static_argnames=("metric",))
def pairwise_scores(queries: jnp.ndarray, base: jnp.ndarray,
                    valid: jnp.ndarray, base_sq: jnp.ndarray,
                    metric: VectorMetric) -> jnp.ndarray:
    """Full [Q, N] higher-is-better score matrix (small bases / oracle path)."""
    scores = _chunk_scores(queries.astype(jnp.float32), base, base_sq, metric)
    return jnp.where(valid[None, :], scores, NEG_INF)


def normalize_rows(x: np.ndarray) -> np.ndarray:
    """Row-normalize for cosine metric (reference: cosine handled via norm
    cache, hnswlib.h DistCalculator norm cache)."""
    norms = np.linalg.norm(x, axis=-1, keepdims=True)
    norms = np.where(norms == 0.0, 1.0, norms)
    return x / norms
