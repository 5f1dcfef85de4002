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


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def scan_lists_batch(queries: jnp.ndarray, data: jnp.ndarray,
                     data_sq: jnp.ndarray, valid: jnp.ndarray,
                     cand: jnp.ndarray, cand_ok: jnp.ndarray,
                     k: int, metric: VectorMetric):
    """Batched stage 2: per-query candidate row matrices.

    queries [B, D]; cand int32[B, C]; cand_ok bool[B, C].
    Returns (scores [B, k], ids [B, k])."""
    vecs = data[cand]                                  # [B, C, D]
    dots = jnp.einsum("bd,bcd->bc", queries, vecs,
                      preferred_element_type=jnp.float32)
    if metric == VectorMetric.L2:
        q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)
        scores = 2.0 * dots - data_sq[cand] - q_sq
    else:
        scores = dots
    ok = cand_ok & valid[cand]
    scores = jnp.where(ok, scores, NEG_INF)
    kk = min(k, cand.shape[1])
    top_s, top_pos = jax.lax.top_k(scores, kk)
    safe = jnp.where(top_pos >= 0, top_pos, 0)
    top_i = jnp.where(top_s > NEG_INF,
                      jnp.take_along_axis(cand, safe, axis=1), -1)
    return top_s, top_i


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def scan_lists(queries: jnp.ndarray, data: jnp.ndarray, data_sq: jnp.ndarray,
               valid: jnp.ndarray, cand: jnp.ndarray, cand_ok: jnp.ndarray,
               k: int, metric: VectorMetric):
    """Stage 2: exact scan over gathered candidate rows.

    queries [Q, D]; cand int32[C] row ids (pad -> 0 with cand_ok False);
    returns (scores [Q, k], ids [Q, k]) higher-better, -1 padded."""
    vecs = data[cand]                       # [C, D]
    dots = jnp.dot(queries, vecs.T, preferred_element_type=jnp.float32)
    if metric == VectorMetric.L2:
        q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)
        scores = 2.0 * dots - data_sq[cand][None, :] - q_sq
    else:
        scores = dots
    ok = cand_ok & valid[cand]
    scores = jnp.where(ok[None, :], scores, NEG_INF)
    kk = min(k, cand.shape[0])
    C = cand.shape[0]
    if C >= 1024 and kk * 64 * 2 < C:
        from .distance import exact_topk_blocks
        top_s, top_pos = exact_topk_blocks(scores, kk)
        safe = jnp.where(top_pos >= 0, top_pos, 0)
        top_i = jnp.where(top_pos >= 0, cand[safe], -1)
    else:
        top_s, top_pos = jax.lax.top_k(scores, kk)
        top_i = jnp.where(top_s > NEG_INF, cand[top_pos], -1)
    return top_s, top_i
