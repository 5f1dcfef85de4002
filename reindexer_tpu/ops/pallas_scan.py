"""Pallas fused brute-force scan: one HBM sweep + hierarchical selection.

The TPU-native replacement for the reference's SIMD distance loops + heap
select (tools/distances/l2_dist.cc:38-280, hnswlib/bruteforce.cc). Design
(measured on v5e, see docs/performance.md):

- ONE kernel sweep reads each base tile once and emits two things:
    * partial scores in gather-friendly [Q, N] layout (2*q.b - sq_eff; the
      per-query |q|^2 constant is rank-invariant and added at the end),
      from a [Q, D] x [D, TILE] matmul;
    * exact per-64-row block maxima [N/64, Q] from a transposed
      [TILE, D] x [D, Q] matmul reduced over native sublane groups
      (Mosaic cannot lane-split [Q, TILE] for the reduction — the dual
      orientation sidesteps that).
- both matmuls run a manual bf16x3 product (Mosaic lacks Precision.HIGH;
  HIGHEST's 6 passes measured 2x the compute for no selection benefit) —
  |err| ~ 1e-6 relative, validated exact against a float64 oracle.
- selection never runs a wide top_k (lax.top_k over >4k columns measured
  0.7ms at 16k wide vs 0.026ms at 2k): top-(k+4) coarse blocks by the
  block maxima -> gather those score blocks -> per-8 fine maxima ->
  top-(k+4) fine blocks -> final top-k. Every top_k is <= 2048 wide and
  every gather is contiguous-block shaped.

Exactness argument: any row in the true top-k lives in a block whose max
is >= the k-th best score, so the top-k blocks by maxima are a superset of
the true top-k rows (applied twice: 64-row blocks, then 8-wide sub-blocks
of the gathered candidates). The +4 margin absorbs cross-matmul rounding
(bmax comes from the transposed product, candidates from the direct one).

Validity contract: DELETED/PAD rows must be all-zero in `base` (the block
maxima treat sumsq==0 as -inf) and carry sq_eff = +BIG (so their partial
scores are -BIG). The vector keeper maintains both invariants; arbitrary
valid-masks over non-zeroed rows must use ops.distance.knn_scan.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.type_consts import VectorMetric

NEG_INF = jnp.float32(-jnp.inf)
SQ_EFF_BIG = 1e30        # sq_eff value marking an invalid row
BLK = 64                 # coarse selection block (row granularity of bmax)
FB = 8                   # fine sub-block within gathered candidates
TILE = 4096              # base rows per grid step (VMEM-bound; 8192 OOMs)
MARGIN = 4               # extra blocks absorbing cross-matmul rounding

_DN_CONTRACT_LAST = (((1,), (1,)), ((), ()))


def _dot3(a, b):
    """bf16x3 f32-accurate contraction over the last axis of both operands
    (Precision.HIGH is unsupported by Mosaic; HIGHEST costs 2x)."""
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = (a - a_hi).astype(jnp.bfloat16).astype(jnp.float32)
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = (b - b_hi).astype(jnp.bfloat16).astype(jnp.float32)
    d = jax.lax.dot_general(a_hi, b_hi, dimension_numbers=_DN_CONTRACT_LAST,
                            preferred_element_type=jnp.float32)
    d += jax.lax.dot_general(a_lo, b_hi, dimension_numbers=_DN_CONTRACT_LAST,
                             preferred_element_type=jnp.float32)
    d += jax.lax.dot_general(a_hi, b_lo, dimension_numbers=_DN_CONTRACT_LAST,
                             preferred_element_type=jnp.float32)
    return d


def _make_kernel(tile_n: int, metric: VectorMetric):
    l2 = metric == VectorMetric.L2

    def _kernel(q_ref, base_ref, sqe_ref, ps_ref, bmax_ref):
        q = q_ref[:]                               # [Q, D]
        tile = base_ref[:]                         # [T, D]
        dots_t = _dot3(tile, q)                    # [T, Q]
        sumsq = jnp.sum(tile * tile, axis=1, keepdims=True)
        s_t = (2.0 * dots_t - sumsq) if l2 else dots_t
        # python -inf literal: a jnp scalar would be a captured constant,
        # which pallas kernels reject
        s_t = jnp.where(sumsq > 0.0, s_t, float("-inf"))
        bmax_ref[:] = jnp.max(
            s_t.reshape(tile_n // BLK, BLK, s_t.shape[1]), axis=1)
        dots_q = _dot3(q, tile)                    # [Q, T]
        ps_ref[:] = (2.0 * dots_q if l2 else dots_q) - sqe_ref[:]

    return _kernel


@functools.partial(jax.jit, static_argnames=("tile_n", "metric", "interpret"))
def _pass1(queries, base, sq_eff_row, tile_n, metric, interpret=False):
    n, d = base.shape
    qf = queries.astype(jnp.float32)
    Qn = qf.shape[0]
    return pl.pallas_call(
        _make_kernel(tile_n, metric),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((Qn, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Qn, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n // BLK, Qn), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qn, n), jnp.float32),
            jax.ShapeDtypeStruct((n // BLK, Qn), jnp.float32),
        ],
        interpret=interpret,
    )(qf, base, sq_eff_row)


def _pad_queries(queries: jnp.ndarray) -> jnp.ndarray:
    """Mosaic lowers a Q<8 dot to an unsupported accumulating reduction —
    pad the query batch to a sublane-friendly power-of-2 size."""
    qf = queries.astype(jnp.float32)
    Qn = 8
    while Qn < qf.shape[0]:
        Qn *= 2
    if Qn != qf.shape[0]:
        qf = jnp.pad(qf, ((0, Qn - qf.shape[0]), (0, 0)))
    return qf


_LOG_FB = FB.bit_length() - 1
_LOG_BLK = BLK.bit_length() - 1

from .distance import onehot_take as _onehot_take  # noqa: E402


def _take1(a, idx):
    """take_along_axis with in-bounds promise: skips XLA's negative-index
    normalization (3 extra ops per gather) and FILL_OR_DROP masking — all
    selection indices come from top_k and are in bounds by construction."""
    return jnp.take_along_axis(a, idx, axis=1, mode="promise_in_bounds")


def _select_topk(ps: jnp.ndarray, bmax: jnp.ndarray, k: int):
    """Hierarchical exact top-k from materialized partial scores.

    ps f32[Qn, N]; bmax f32[Qn, N/BLK] per-64-row block maxima (from either
    matmul orientation — MARGIN absorbs cross-orientation rounding).
    Returns (top_s [Qn, <=k], rows [Qn, <=k]) before validity masking.

    All index arithmetic is shift/mask (FB/BLK are powers of 2): signed
    //and % lower to ~8 XLA ops each for the sign fix-ups, and at tiny
    [Q, k] shapes per-op launch overhead — not FLOPs or bytes — is what
    the epilogue costs (measured ~0.2ms of the 0.45ms round-1 scan)."""
    Qn, n = ps.shape
    G = n // BLK
    kb = min(k + MARGIN, G)
    _, coarse = jax.lax.top_k(bmax, kb)                       # [Q, kb]
    cand = _onehot_take(ps.reshape(Qn, G, BLK), coarse, G
                        ).reshape(Qn, kb * BLK)

    nf = kb * BLK // FB
    fine = jnp.max(cand.reshape(Qn, nf, FB), axis=2)
    kf = min(k + MARGIN, nf)
    _, fids = jax.lax.top_k(fine, kf)                         # [Q, kf]
    c4 = _onehot_take(cand.reshape(Qn, nf, FB), fids, nf)
    top_s, sel = jax.lax.top_k(c4.reshape(Qn, kf * FB), min(k, kf * FB))

    fpos = jnp.bitwise_and(sel, FB - 1)
    fine_sel = _take1(fids, jnp.right_shift(sel, _LOG_FB))
    blk_sel = _take1(coarse, jnp.right_shift(fine_sel, _LOG_BLK - _LOG_FB))
    rows = jnp.bitwise_or(
        jnp.bitwise_or(jnp.left_shift(blk_sel, _LOG_BLK),
                       jnp.bitwise_and(jnp.left_shift(fine_sel, _LOG_FB),
                                       BLK - 1)),
        fpos)
    return top_s, rows


def _finish(top_s, rows, k: int, Q_in: int, corr):
    """Validity mask + per-query rank-invariant correction + k padding.
    `corr` f32[Qn, 1] is added to valid scores (e.g. -|q|^2 for L2)."""
    ids = jnp.where(top_s > -SQ_EFF_BIG / 2, rows, -1)
    top_s = jnp.where(ids >= 0, top_s + corr, NEG_INF)
    if top_s.shape[1] < k:
        pad = k - top_s.shape[1]
        top_s = jnp.pad(top_s, ((0, 0), (0, pad)), constant_values=NEG_INF)
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
    return top_s[:Q_in], ids[:Q_in]


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "interpret"))
def knn_scan_fused(queries: jnp.ndarray, base: jnp.ndarray,
                   sq_eff: jnp.ndarray, k: int, metric: VectorMetric,
                   interpret: bool = False):
    """Fused scan + hierarchical exact top-k.

    queries f32[Q, D]; base f32[N, D] (invalid rows ZEROED); sq_eff f32[N]
    (|b|^2 for valid rows, +SQ_EFF_BIG for invalid — pass |b|^2 for L2,
    zeros for IP/cosine). Returns (scores f32[Q, k], ids int32[Q, k]),
    higher-better (L2 negated), -inf/-1 padded. Same result contract as
    ops.distance.knn_scan.
    """
    qf = _pad_queries(queries)
    ps, bmax = _pass1(qf, base, sq_eff[None, :], TILE, metric, interpret)
    top_s, rows = _select_topk(ps, bmax.T, k)
    corr = (-jnp.sum(qf * qf, axis=1, keepdims=True)
            if metric == VectorMetric.L2 else jnp.float32(0.0))
    return _finish(top_s, rows, k, queries.shape[0], corr)


# ---------------------------------------------------------------------------
# Single-orientation variant: the kernel emits partial scores only; the
# 64-row block maxima come from an XLA reshape-max over the materialized ps
# (re-reads ps once from HBM but skips the transposed bf16x3 product).
# ---------------------------------------------------------------------------

def _make_kernel_ps(metric: VectorMetric):
    l2 = metric == VectorMetric.L2

    def _kernel(q_ref, base_ref, sqe_ref, ps_ref):
        dots_q = _dot3(q_ref[:], base_ref[:])      # [Q, T]
        ps_ref[:] = (2.0 * dots_q if l2 else dots_q) - sqe_ref[:]

    return _kernel


@functools.partial(jax.jit, static_argnames=("tile_n", "metric", "interpret"))
def _pass1_ps(queries, base, sq_eff_row, tile_n, metric, interpret=False):
    n, d = base.shape
    Qn = queries.shape[0]
    return pl.pallas_call(
        _make_kernel_ps(metric),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((Qn, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Qn, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Qn, n), jnp.float32),
        interpret=interpret,
    )(queries, base, sq_eff_row)


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "interpret"))
def knn_scan_fused_single(queries: jnp.ndarray, base: jnp.ndarray,
                          sq_eff: jnp.ndarray, k: int, metric: VectorMetric,
                          interpret: bool = False):
    """Same contract as knn_scan_fused; single-orientation formulation.
    Validity rides sq_eff alone (invalid rows score -2*SQ_EFF_BIG-ish), so
    this variant does not need the zeroed-rows side of the contract."""
    qf = _pad_queries(queries)
    n = base.shape[0]
    ps = _pass1_ps(qf, base, sq_eff[None, :], TILE, metric, interpret)
    bmax = jnp.max(ps.reshape(qf.shape[0], n // BLK, BLK), axis=2)
    top_s, rows = _select_topk(ps, bmax, k)
    corr = (-jnp.sum(qf * qf, axis=1, keepdims=True)
            if metric == VectorMetric.L2 else jnp.float32(0.0))
    return _finish(top_s, rows, k, queries.shape[0], corr)


# ---------------------------------------------------------------------------
# SQ8 fused scan: uint8 codes stream at 1/4 the HBM cost; the dequantize
# folds into the matmul as  q_alpha = q * alpha  (per-component scale) and a
# per-query constant  q_lo = q . lo  added at the end (rank-invariant).
# Replaces the same reference path as index/vector/quantization.py
# (scalar_quantization/quantizer.h:11-75; float_vector.md:291 — the ~75%
# memory saving turning into a proportional scan speedup).
# ---------------------------------------------------------------------------

def _dot2(a, b):
    """f32-accurate contraction where `a`'s values are exactly representable
    in bf16 (integer codes 0..255) — only `b` needs the hi/lo split."""
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = (b - b_hi).astype(jnp.bfloat16).astype(jnp.float32)
    d = jax.lax.dot_general(a, b_hi, dimension_numbers=_DN_CONTRACT_LAST,
                            preferred_element_type=jnp.float32)
    d += jax.lax.dot_general(a, b_lo, dimension_numbers=_DN_CONTRACT_LAST,
                             preferred_element_type=jnp.float32)
    return d


def _make_kernel_sq8(tile_n: int, metric: VectorMetric):
    l2 = metric == VectorMetric.L2

    def _kernel(qa_ref, codes_ref, sqe_row_ref, sqe_col_ref, ps_ref,
                bmax_ref):
        qa = qa_ref[:]                                   # [Q, D] f32
        # Mosaic lacks a direct u8->f32 cast; hop through i32
        c = codes_ref[:].astype(jnp.int32).astype(jnp.float32)  # [T, D]
        dots_t = _dot2(c, qa)                            # [T, Q]
        s_t = (2.0 * dots_t if l2 else dots_t) - sqe_col_ref[:]
        bmax_ref[:] = jnp.max(
            s_t.reshape(tile_n // BLK, BLK, s_t.shape[1]), axis=1)
        dots_q = _dot2(qa, c)                            # [Q, T]
        ps_ref[:] = (2.0 * dots_q if l2 else dots_q) - sqe_row_ref[:]

    return _kernel


@functools.partial(jax.jit, static_argnames=("tile_n", "metric", "interpret"))
def _pass1_sq8(q_alpha, codes, sq_eff, tile_n, metric, interpret=False):
    n, d = codes.shape
    Qn = q_alpha.shape[0]
    return pl.pallas_call(
        _make_kernel_sq8(tile_n, metric),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((Qn, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Qn, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n // BLK, Qn), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qn, n), jnp.float32),
            jax.ShapeDtypeStruct((n // BLK, Qn), jnp.float32),
        ],
        interpret=interpret,
    )(q_alpha, codes, sq_eff[None, :], sq_eff[:, None])


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "interpret"))
def knn_scan_fused_sq8(queries: jnp.ndarray, codes: jnp.ndarray,
                       lo: jnp.ndarray, alpha: jnp.ndarray,
                       sq_eff: jnp.ndarray, k: int, metric: VectorMetric,
                       interpret: bool = False):
    """SQ8 fused scan: same contract as knn_scan_fused with uint8 codes.

    codes u8[N, D]; lo/alpha f32[D] the affine grid (x ~ lo + alpha*code);
    sq_eff as in knn_scan_fused (|b|^2 of the ORIGINAL vectors for L2, 0
    for IP/cosine; +SQ_EFF_BIG marks invalid rows — validity rides sq_eff
    alone, no zeroed-codes contract needed). Scores match
    quantization.knn_scan_quantized: 2*(q.lo + q_alpha.c) - |b|^2 - |q|^2
    for L2, q.lo + q_alpha.c for IP/cosine."""
    qf = _pad_queries(queries)
    q_alpha = qf * alpha[None, :]
    ps, bmax = _pass1_sq8(q_alpha, codes, sq_eff, TILE, metric, interpret)
    top_s, rows = _select_topk(ps, bmax.T, k)
    q_lo = jnp.dot(qf, lo, preferred_element_type=jnp.float32)[:, None]
    if metric == VectorMetric.L2:
        corr = 2.0 * q_lo - jnp.sum(qf * qf, axis=1, keepdims=True)
    else:
        corr = q_lo
    return _finish(top_s, rows, k, queries.shape[0], corr)


def fused_available(n: int, dims: int, k: int) -> bool:
    """Whether the Pallas fast path applies: TPU backend, tile-divisible
    base, lane-aligned dims, and a base wide enough that block selection
    shrinks the problem. Callers must additionally hold the zeroed-invalid
    contract (the vector keeper does). RX_TPU_FUSED_SCAN=0 disables."""
    if os.environ.get("RX_TPU_FUSED_SCAN", "") in ("0", "false"):
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    return (n % TILE == 0 and dims % 128 == 0
            and (k + MARGIN) * BLK * 2 < n and k + MARGIN <= n // BLK)
