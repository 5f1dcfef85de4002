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
    n, d = base.shape
    qf = queries.astype(jnp.float32)
    Q_in = qf.shape[0]
    # Mosaic lowers a Q<8 dot to an unsupported accumulating reduction —
    # pad the query batch to a sublane-friendly size and strip at the end
    Qn = 8
    while Qn < Q_in:
        Qn *= 2
    if Qn != Q_in:
        qf = jnp.pad(qf, ((0, Qn - Q_in), (0, 0)))
    G = n // BLK
    ps, bmax = _pass1(qf, base, sq_eff[None, :], TILE, metric, interpret)

    kb = min(k + MARGIN, G)
    _, coarse = jax.lax.top_k(bmax.T, kb)                     # [Q, kb]
    cand = jnp.take_along_axis(
        ps.reshape(Qn, G, BLK), coarse[:, :, None], axis=1
    ).reshape(Qn, kb * BLK)

    nf = kb * BLK // FB
    fine = jnp.max(cand.reshape(Qn, nf, FB), axis=2)
    kf = min(k + MARGIN, nf)
    _, fids = jax.lax.top_k(fine, kf)                         # [Q, kf]
    c4 = jnp.take_along_axis(cand.reshape(Qn, nf, FB),
                             fids[:, :, None], axis=1)
    top_s, sel = jax.lax.top_k(c4.reshape(Qn, kf * FB), min(k, kf * FB))

    fpos = sel % FB
    fine_sel = jnp.take_along_axis(fids, sel // FB, axis=1)
    blk_sel = jnp.take_along_axis(coarse, fine_sel * FB // BLK, axis=1)
    rows = blk_sel * BLK + (fine_sel * FB) % BLK + fpos
    if metric == VectorMetric.L2:
        top_s = top_s - jnp.sum(qf * qf, axis=1, keepdims=True)
    ids = jnp.where(top_s > -SQ_EFF_BIG / 2, rows, -1)
    top_s = jnp.where(ids >= 0, top_s, NEG_INF)
    if top_s.shape[1] < k:
        pad = k - top_s.shape[1]
        top_s = jnp.pad(top_s, ((0, 0), (0, pad)), constant_values=NEG_INF)
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
    return top_s[:Q_in], ids[:Q_in]


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
