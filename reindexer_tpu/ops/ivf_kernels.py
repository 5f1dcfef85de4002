"""Device kernels for the IVF engine: jitted Lloyd k-means + candidate scan.

TPU-native replacement for the reference's FAISS dependency
(cpp_src/core/index/float_vector/ivf_index.cc wrapping vendored
faiss::IndexIVFFlat + faiss::Clustering with OpenMP/BLAS, SURVEY.md §2.1):
training is a jitted loop of (assignment matmul -> segment-sum centroid
update) — the MXU replaces BLAS+OMP threads (P4 in SURVEY.md §2.4); the
nprobe search is a two-stage matmul: query x centroids -> top-nprobe, then a
gathered candidate scan fused with top-k.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.type_consts import VectorMetric

NEG_INF = jnp.float32(-jnp.inf)


@functools.partial(jax.jit, static_argnames=("iters",))
def kmeans_l2(train: jnp.ndarray, init_centroids: jnp.ndarray, iters: int):
    """Lloyd iterations with L2 assignment (faiss Clustering default).
    train [T, D], init [K, D] -> centroids [K, D]. Empty clusters keep their
    previous centroid."""
    t_sq = jnp.sum(train * train, axis=1)

    def step(cent, _):
        c_sq = jnp.sum(cent * cent, axis=1)
        # assignment: argmin ||t - c||^2 == argmax 2 t.c - c^2
        scores = 2.0 * jnp.dot(train, cent.T,
                               preferred_element_type=jnp.float32) - c_sq[None, :]
        assign = jnp.argmax(scores, axis=1)
        sums = jnp.zeros_like(cent).at[assign].add(train)
        counts = jnp.zeros((cent.shape[0],), dtype=jnp.float32).at[assign].add(1.0)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        cent = jnp.where(counts[:, None] > 0, new, cent)
        return cent, None

    cent, _ = jax.lax.scan(step, init_centroids, None, length=iters)
    return cent


@functools.partial(jax.jit, static_argnames=("metric",))
def assign_lists(vecs: jnp.ndarray, centroids: jnp.ndarray,
                 metric: VectorMetric) -> jnp.ndarray:
    """Nearest-centroid assignment for new vectors [B, D] -> int32[B]."""
    dots = jnp.dot(vecs, centroids.T, preferred_element_type=jnp.float32)
    if metric == VectorMetric.L2:
        c_sq = jnp.sum(centroids * centroids, axis=1)
        return jnp.argmax(2.0 * dots - c_sq[None, :], axis=1).astype(jnp.int32)
    return jnp.argmax(dots, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("nprobe", "metric"))
def probe_centroids(queries: jnp.ndarray, centroids: jnp.ndarray,
                    nprobe: int, metric: VectorMetric) -> jnp.ndarray:
    """Stage 1: top-nprobe centroid ids per query [Q, nprobe]."""
    dots = jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32)
    if metric == VectorMetric.L2:
        c_sq = jnp.sum(centroids * centroids, axis=1)
        scores = 2.0 * dots - c_sq[None, :]
    else:
        scores = dots
    _, idx = jax.lax.top_k(scores, min(nprobe, centroids.shape[0]))
    return idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cmax",))
def expand_probes(probes: jnp.ndarray, list_start: jnp.ndarray,
                  list_rows: jnp.ndarray, cmax: int):
    """Concatenate the probed inverted-list CSR ranges on DEVICE.

    The reference's FAISS scan walks each probed list's ids on the CPU
    (ivf_index.cc / faiss InvertedLists); the round-1 port did the same
    per-query list concatenation in host Python — a multi-ms step at
    nprobe=128 x 1M rows. Here every output slot finds its owning probe
    via searchsorted over the per-probe cumulative lengths.

    probes int32[B, P] centroid ids; list_start int32[nlist+1];
    list_rows int32[Ptot]. Returns (cand int32[B, cmax], ok bool[B, cmax]).
    """
    starts = list_start[probes]                           # [B, P]
    ends = list_start[probes + 1]
    lens = (ends - starts).astype(jnp.int32)
    cum = jnp.cumsum(lens, axis=1)                        # inclusive [B, P]
    total = cum[:, -1:]
    prev = jnp.concatenate(
        [jnp.zeros_like(cum[:, :1]), cum[:, :-1]], axis=1)
    B, P = probes.shape
    pos = jnp.broadcast_to(jnp.arange(cmax, dtype=jnp.int32)[None, :],
                           (B, cmax))
    j = jax.vmap(lambda c, p: jnp.searchsorted(c, p, side="right"))(cum, pos)
    j = jnp.minimum(j, P - 1).astype(jnp.int32)
    src = (jnp.take_along_axis(starts, j, axis=1).astype(jnp.int32)
           + pos - jnp.take_along_axis(prev, j, axis=1))
    ok = pos < total
    src = jnp.where(ok, src, 0)
    return list_rows[src], ok


@functools.partial(jax.jit, static_argnames=("k", "metric", "chunk"))
def scan_lists_batch(queries: jnp.ndarray, data: jnp.ndarray,
                     data_sq: jnp.ndarray, valid: jnp.ndarray,
                     cand: jnp.ndarray, cand_ok: jnp.ndarray,
                     k: int, metric: VectorMetric, chunk: int = 65536):
    """Batched stage 2: per-query candidate row matrices.

    queries [B, D]; cand int32[B, C]; cand_ok bool[B, C].
    Returns (scores [B, k], ids [B, k]). Candidate axes wider than `chunk`
    scan in chunks with a running top-k so the [B, C, D] vector gather
    never materializes more than [B, chunk, D] at once (1M-row x 768-dim
    configs would otherwise OOM the HBM)."""
    B, C = cand.shape
    q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)

    def score_block(cnd, okm):
        vecs = data[cnd]                               # [B, c, D]
        dots = jnp.einsum("bd,bcd->bc", queries, vecs,
                          preferred_element_type=jnp.float32)
        if metric == VectorMetric.L2:
            scores = 2.0 * dots - data_sq[cnd] - q_sq
        else:
            scores = dots
        return jnp.where(okm & valid[cnd], scores, NEG_INF)

    if C <= chunk:
        scores = score_block(cand, cand_ok)
        kk = min(k, C)
        top_s, top_pos = jax.lax.top_k(scores, kk)
        top_i = jnp.where(top_s > NEG_INF,
                          jnp.take_along_axis(cand, top_pos, axis=1), -1)
        return top_s, top_i

    nc = C // chunk
    cand_r = cand.reshape(B, nc, chunk).transpose(1, 0, 2)
    ok_r = cand_ok.reshape(B, nc, chunk).transpose(1, 0, 2)
    kk = min(k, chunk)

    def step(carry, xs):
        best_s, best_i = carry
        cnd, okm = xs
        scores = score_block(cnd, okm)
        loc_s, loc_pos = jax.lax.top_k(scores, kk)
        loc_i = jnp.where(loc_s > NEG_INF,
                          jnp.take_along_axis(cnd, loc_pos, axis=1), -1)
        m_s = jnp.concatenate([best_s, loc_s], axis=1)
        m_i = jnp.concatenate([best_i, loc_i], axis=1)
        new_s, sel = jax.lax.top_k(m_s, kk)
        return (new_s, jnp.take_along_axis(m_i, sel, axis=1)), None

    init = (jnp.full((B, kk), NEG_INF, jnp.float32),
            jnp.full((B, kk), -1, jnp.int32))
    (best_s, best_i), _ = jax.lax.scan(step, init, (cand_r, ok_r))
    return best_s, best_i




@functools.partial(jax.jit, static_argnames=("k", "metric", "chunk"))
def scan_probed_full(queries: jnp.ndarray, data: jnp.ndarray,
                     data_sq: jnp.ndarray, valid: jnp.ndarray,
                     assign: jnp.ndarray, probe_sel: jnp.ndarray,
                     k: int, metric: VectorMetric, chunk: int = 262144):
    """Stage 2 as a MASKED FULL MATMUL SCAN (the TPU-native formulation).

    The gathered candidate scan (scan_lists_batch) moves candidate rows
    through the gather unit at ~11 GB/s; a contiguous matmul sweep reads
    the whole base at the ~819 GB/s HBM rate, so the full scan with a
    probe-membership mask wins whenever C_gather > N/75 — i.e. for every
    realistic nprobe/nlist ratio (measured: 0.34s -> ~5ms per 16-query
    batch at 1M x 768, nprobe=128). Semantics are identical to the list
    scan: only rows whose assigned list was probed are eligible.

    queries [B, D]; assign int32[N] per-row list id (-1 = unassigned);
    probe_sel bool[B, nlist]. Returns (scores [B, k], ids [B, k])."""
    q = queries.astype(jnp.float32)
    B = q.shape[0]
    n = data.shape[0]
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)
    nc = max(n // chunk, 1)
    csz = n // nc
    kk = min(k, csz)

    def step(carry, xs):
        best_s, best_i = carry
        dchunk, sq_chunk, v_chunk, a_chunk, base_idx = xs
        dots = jax.lax.dot_general(
            q, dchunk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        scores = (2.0 * dots - sq_chunk[None, :] - q_sq
                  if metric == VectorMetric.L2 else dots)
        # probe membership: lookup each row's list id in the per-query
        # probe table (tiny [B, nlist] table — embedding-style gather)
        safe_a = jnp.maximum(a_chunk, 0)
        memb = jnp.take_along_axis(
            probe_sel, jnp.broadcast_to(safe_a[None, :], (B, csz)), axis=1)
        ok = memb & (a_chunk >= 0)[None, :] & v_chunk[None, :]
        scores = jnp.where(ok, scores, NEG_INF)
        # hierarchical block selection — a flat lax.top_k over a
        # 262144-wide row is the pathological case (docs/performance.md)
        from .distance import exact_topk_blocks
        loc_s, loc_pos = exact_topk_blocks(scores, kk)
        loc_i = jnp.where(loc_s > NEG_INF, loc_pos + base_idx, -1)
        m_s = jnp.concatenate([best_s, loc_s], axis=1)
        m_i = jnp.concatenate([best_i, loc_i], axis=1)
        new_s, sel = jax.lax.top_k(m_s, kk)
        return (new_s, jnp.take_along_axis(m_i, sel, axis=1)), None

    xs = (data.reshape(nc, csz, -1), data_sq.reshape(nc, csz),
          valid.reshape(nc, csz), assign.reshape(nc, csz),
          jnp.arange(nc, dtype=jnp.int32) * csz)
    init = (jnp.full((B, kk), NEG_INF, jnp.float32),
            jnp.full((B, kk), -1, jnp.int32))
    (best_s, best_i), _ = jax.lax.scan(step, init, xs)
    if kk < k:
        best_s = jnp.pad(best_s, ((0, 0), (0, k - kk)),
                         constant_values=NEG_INF)
        best_i = jnp.pad(best_i, ((0, 0), (0, k - kk)),
                         constant_values=-1)
    return best_s, best_i


@functools.partial(jax.jit, static_argnames=("k", "metric", "chunk"))
def scan_reordered_masked(queries, reordered, reordered_sq, perm, bmask,
                          k: int, metric: VectorMetric, chunk: int = 262144):
    """Masked full sweep over the LIST-CONTIGUOUS reorder.

    Probe membership is resolved per 128-row block from a host-computed
    bool[B, n_blocks] table (tiny upload) instead of per ELEMENT — the
    original scan_probed_full looked up each row's list id with
    take_along_axis, i.e. a 16M-element gather per 262k chunk at batch 16,
    which is the documented TPU anti-pattern and dominated the 1M ivf
    select (~220 ms of a ~5 ms matmul scan).

    queries f32[B, D]; reordered f32[Npad, D] (pad rows zero);
    reordered_sq f32[Npad]; perm i32[Npad] (-1 on padding);
    bmask bool[B, Npad/SEG_BLK]. Returns (scores [B, k], ids [B, k])."""
    from .distance import exact_topk_blocks
    q = queries.astype(jnp.float32)
    B = q.shape[0]
    npad = reordered.shape[0]
    nc = max(npad // chunk, 1)
    csz = npad // nc
    nbc = csz // SEG_BLK
    kk = min(k, csz)
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)

    def step(carry, xs):
        best_s, best_i = carry
        dchunk, sq_chunk, p_chunk, m_chunk, base_idx = xs
        dots = jax.lax.dot_general(
            q, dchunk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        scores = (2.0 * dots - sq_chunk[None, :] - q_sq
                  if metric == VectorMetric.L2 else dots)
        ok = (jnp.broadcast_to(m_chunk[:, :, None], (B, nbc, SEG_BLK))
              .reshape(B, csz) & (p_chunk >= 0)[None, :])
        scores = jnp.where(ok, scores, NEG_INF)
        loc_s, loc_pos = exact_topk_blocks(scores, kk)
        glob = loc_pos + base_idx
        m_s = jnp.concatenate([best_s, loc_s], axis=1)
        m_i = jnp.concatenate([best_i, glob], axis=1)
        new_s, sel = jax.lax.top_k(m_s, kk)
        return (new_s, jnp.take_along_axis(m_i, sel, axis=1)), None

    xs = (reordered.reshape(nc, csz, -1), reordered_sq.reshape(nc, csz),
          perm.reshape(nc, csz), bmask.reshape(B, nc, nbc).swapaxes(0, 1),
          jnp.arange(nc, dtype=jnp.int32) * csz)
    init = (jnp.full((B, kk), NEG_INF, jnp.float32),
            jnp.full((B, kk), -1, jnp.int32))
    (best_s, best_i), _ = jax.lax.scan(step, init, xs)
    ids = perm[jnp.maximum(best_i, 0)]
    ids = jnp.where((best_i >= 0) & (best_s > -5e29), ids, -1)
    best_s = jnp.where(ids >= 0, best_s, NEG_INF)
    if kk < k:
        best_s = jnp.pad(best_s, ((0, 0), (0, k - kk)),
                         constant_values=NEG_INF)
        ids = jnp.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1)
    return best_s, ids


@functools.partial(jax.jit, static_argnames=("nlist",))
def probe_mask(probes: jnp.ndarray, nlist: int) -> jnp.ndarray:
    """[B, P] probed centroid ids -> bool[B, nlist] membership table."""
    B = probes.shape[0]
    m = jnp.zeros((B, nlist), jnp.bool_)
    return m.at[jnp.arange(B, dtype=jnp.int32)[:, None], probes].set(True)


# ---------------------------------------------------------------------------
# Segment scan: probe-proportional stage 2 over a LIST-CONTIGUOUS reorder
# ---------------------------------------------------------------------------
#
# The masked full scan reads all N rows regardless of nprobe (an index whose
# cost ignores the probe count is a scan with extra steps); gathering probed
# rows moves them at the ~11 GB/s gather unit. The TPU-honest fix is DATA
# LAYOUT: IvfIndex reorders base rows so every inverted list is a contiguous
# 128-row-aligned span (ivf.py _rebuild_csr), and this Pallas kernel's grid
# walks exactly the probed blocks — the scalar-prefetched block index feeds
# the pipeline's DMA, so probed rows stream at full HBM bandwidth. Cost is
# now proportional to the probed rows (reference parity: ivf_index.cc
# 151-261 probes only nprobe lists; ours does too, in array form).

SEG_BLK = 128      # rows per segment block (list starts align to this)


def _make_seg_kernel(metric, d):
    from jax.experimental import pallas as pl
    from .pallas_scan import _dot3
    l2 = metric == VectorMetric.L2

    def _kernel(starts_ref, qids_ref, counts_ref, q_ref, base_ref, out_ref):
        del starts_ref, qids_ref       # consumed by the index maps
        i = pl.program_id(0)
        tile = base_ref[:]                       # [SEG_BLK, D]
        qrow = q_ref[:]                          # [1, D]
        dots = _dot3(tile, qrow)                 # [SEG_BLK, 1]
        if l2:
            sumsq = jnp.sum(tile * tile, axis=1, keepdims=True)
            s = 2.0 * dots - sumsq
        else:
            s = dots
        # rows past this block's valid count are list/segment padding ->
        # finite sentinel (explicit counts, NOT a zero-vector heuristic:
        # a legitimate all-zero vector must stay searchable)
        rows = jax.lax.broadcasted_iota(jnp.int32, (SEG_BLK, 1), 0)
        s = jnp.where(rows < counts_ref[i], jnp.maximum(s, -1e30), -1e30)
        out_ref[:] = s.T                         # [1, SEG_BLK]

    return _kernel


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def scan_segments(starts, qids, counts, queries, reordered, metric,
                  interpret=False):
    """Score the probed segments. starts i32[NSEG] = BLOCK index (rows /
    SEG_BLK) into `reordered` [Npad, D]; qids i32[NSEG] = query row per
    segment; counts i32[NSEG] = valid rows in each block (0 for padding
    segments); queries f32[B, D]. Returns scores f32[NSEG, SEG_BLK] in
    s_t-form (L2: 2 q.b - |b|^2; caller adds the rank-invariant -|q|^2)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nseg = starts.shape[0]
    d = reordered.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nseg,),
        in_specs=[
            pl.BlockSpec((1, d), lambda i, st, qi, ct: (qi[i], 0)),
            pl.BlockSpec((SEG_BLK, d), lambda i, st, qi, ct: (st[i], 0)),
        ],
        out_specs=pl.BlockSpec((1, SEG_BLK),
                               lambda i, st, qi, ct: (i, 0)),
    )
    return pl.pallas_call(
        _make_seg_kernel(metric, d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nseg, SEG_BLK), jnp.float32),
        interpret=interpret,
    )(starts, qids, counts, queries, reordered)


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def segment_topk(seg_scores, starts, perm, queries, k, metric):
    """Fold [B*S_q, SEG_BLK] segment scores to the final per-query top-k
    with original row ids. starts i32[NSEG] as in scan_segments (NSEG must
    be B * S_q, query-major); perm i32[Npad] maps reordered positions back
    to original rows (-1 on padding)."""
    from .distance import exact_topk_blocks
    B = queries.shape[0]
    nseg = seg_scores.shape[0]
    sq_ = nseg // B
    width = sq_ * SEG_BLK
    flat = seg_scores.reshape(B, width)
    if width > 4096:
        top_s, top_p = exact_topk_blocks(flat, k, block=SEG_BLK)
    else:
        top_s, top_p = jax.lax.top_k(flat, min(k, width))
    # flat position -> reordered row -> original row id
    seg_of = top_p // SEG_BLK + (jnp.arange(B, dtype=jnp.int32) * sq_)[:, None]
    pos = starts[seg_of] * SEG_BLK + top_p % SEG_BLK
    ids = perm[pos]
    if metric == VectorMetric.L2:
        top_s = top_s - jnp.sum(queries * queries, axis=1, keepdims=True)
    ids = jnp.where(top_s > -5e29, ids, -1)
    top_s = jnp.where(ids >= 0, top_s, NEG_INF)
    if top_s.shape[1] < k:
        pad = k - top_s.shape[1]
        top_s = jnp.pad(top_s, ((0, 0), (0, pad)), constant_values=NEG_INF)
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
    return top_s, ids
