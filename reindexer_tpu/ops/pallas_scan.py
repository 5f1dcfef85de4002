"""Pallas fused brute-force scan: matmul + validity mask + block maxima in
ONE pass over HBM.

The Pallas replacement for the XLA composite in ops/distance.knn_scan
(reference counterpart: the AVX512 distance loops + heap select,
tools/distances/l2_dist.cc + hnswlib/bruteforce.cc): the grid walks base
tiles HBM->VMEM, each step computes the [Q, TILE] score tile on the MXU and
reduces per-64-row block maxima in VMEM, writing both. Selection then runs
on the tiny block-max matrix: top-k blocks (a provable superset of the exact
top-k, see ops/distance.exact_topk_blocks) -> gather those score blocks ->
small exact top-k. Scores stream through HBM once; no giant row-wide sort
ever materializes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.type_consts import VectorMetric

NEG_INF = jnp.float32(-jnp.inf)
BLOCK = 64          # block-max granularity (matches exact_topk_blocks)
TILE = 8192         # base rows per grid step (TILE//BLOCK = 128-wide bmax blocks)


def _scan_kernel_l2(q_ref, base_ref, sq_ref, valid_ref, scores_ref, bmax_ref):
    q = q_ref[:]                                   # [Q, D]
    tile = base_ref[:]                             # [TILE, D]
    dots = jax.lax.dot_general(
        q, tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # [Q, TILE]
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)
    s = 2.0 * dots - sq_ref[:] - q_sq
    s = jnp.where(valid_ref[:] != 0, s, float("-inf"))
    scores_ref[:] = s
    bmax_ref[:] = jnp.max(
        s.reshape(s.shape[0], TILE // BLOCK, BLOCK), axis=2)


def _scan_kernel_ip(q_ref, base_ref, sq_ref, valid_ref, scores_ref, bmax_ref):
    q = q_ref[:]
    tile = base_ref[:]
    s = jax.lax.dot_general(
        q, tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = jnp.where(valid_ref[:] != 0, s, float("-inf"))
    scores_ref[:] = s
    bmax_ref[:] = jnp.max(
        s.reshape(s.shape[0], TILE // BLOCK, BLOCK), axis=2)


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "interpret"))
def knn_scan_fused(queries: jnp.ndarray, base: jnp.ndarray,
                   valid: jnp.ndarray, base_sq: jnp.ndarray, k: int,
                   metric: VectorMetric, interpret: bool = False):
    """Fused Pallas scan + block-gather selection. Same contract as
    ops.distance.knn_scan: (scores [Q, k], ids [Q, k]), -inf/-1 padded.
    Requires base rows divisible by TILE (callers pad pow2 >= 4096)."""
    n, d = base.shape
    q = queries.astype(jnp.float32)
    Q = q.shape[0]
    grid = n // TILE
    kernel = _scan_kernel_l2 if metric == VectorMetric.L2 else _scan_kernel_ip
    valid_row = valid.astype(jnp.float32)[None, :]       # [1, N]
    sq_row = base_sq.astype(jnp.float32)[None, :]

    scores, bmax = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((Q, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Q, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, TILE // BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, n), jnp.float32),
            jax.ShapeDtypeStruct((Q, n // BLOCK), jnp.float32),
        ],
        interpret=interpret,
    )(q, base, sq_row, valid_row)

    # selection over the tiny block-max matrix (exact superset property,
    # ops/distance.exact_topk_blocks)
    G = n // BLOCK
    kb = min(k, G)
    _, blk = jax.lax.top_k(bmax, kb)                      # [Q, kb]
    sb = scores.reshape(Q, G, BLOCK)
    cand = jnp.take_along_axis(sb, blk[:, :, None], axis=1).reshape(
        Q, kb * BLOCK)
    base_col = (blk * BLOCK)[:, :, None] + jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, BLOCK), 2)
    cand_cols = jnp.broadcast_to(base_col, (Q, kb, BLOCK)).reshape(
        Q, kb * BLOCK)
    top_s, sel = jax.lax.top_k(cand, min(k, cand.shape[1]))
    top_i = jnp.take_along_axis(cand_cols, sel, axis=1)
    top_i = jnp.where(top_s > NEG_INF, top_i, -1)
    if top_s.shape[1] < k:
        pad = k - top_s.shape[1]
        top_s = jnp.pad(top_s, ((0, 0), (0, pad)), constant_values=NEG_INF)
        top_i = jnp.pad(top_i, ((0, 0), (0, pad)), constant_values=-1)
    return top_s, top_i


def fused_available(n: int, dims: int, k: int) -> bool:
    """Whether the Pallas path applies: TPU backend, tile-divisible base,
    MXU-friendly dims, selection actually shrinking the problem.

    Opt-in via RX_TPU_FUSED_SCAN=1: some remote-compile environments (e.g.
    the axon tunnel's chipless AOT helper) cannot compile Mosaic kernels even
    though XLA programs work — the XLA composite (ops/distance.knn_scan)
    stays the default until the deployment's Mosaic path is verified."""
    import os
    if os.environ.get("RX_TPU_FUSED_SCAN", "") not in ("1", "true"):
        return False
    try:
        import jax
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    return (n % TILE == 0 and dims % 128 == 0
            and k * BLOCK * 2 < n and k <= n // BLOCK)
