"""SQ8 scalar quantization for vector indexes.

Semantic equivalent of the reference scalar quantizer
(cpp_src/core/index/float_vector/scalar_quantization/quantizer.h:11-75 +
float_vector.md:296-371): 8-bit per-component quantization with quantile
clipping (left/right quantiles from the config), activated once the index
holds `min_elements` vectors, re-quantized when the data distribution drifts
(here: when the vector count doubles since the last quantization — the
analog of NeedRequantize's outlier test).

The corrective term that keeps L2 ranks accurate is exact: the keeper's
fp32 |b|^2 column is computed from the ORIGINAL vectors, so the quantized
score  2*(x·lo + (x*alpha)·codes) - |b|^2 - |x|^2  only approximates the
cross-term. Codes stream from HBM at 1/4 the bandwidth of fp32 — the scan
stays HBM-bound, so quantization directly multiplies QPS (reference reports
~75% memory saving, float_vector.md:291).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.type_consts import VectorMetric

NEG_INF = jnp.float32(-jnp.inf)


@jax.jit
def _encode(data: jnp.ndarray, lo: jnp.ndarray, inv_alpha: jnp.ndarray,
            ) -> jnp.ndarray:
    x = jnp.clip((data - lo[None, :]) * inv_alpha[None, :], 0.0, 255.0)
    return jnp.round(x).astype(jnp.uint8)


@jax.jit
def _to_i8(codes: jnp.ndarray) -> jnp.ndarray:
    return (codes.astype(jnp.int32) - 128).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("k", "metric", "chunk"))
def knn_scan_quantized(queries: jnp.ndarray, codes: jnp.ndarray,
                       lo: jnp.ndarray, alpha: jnp.ndarray,
                       valid: jnp.ndarray, base_sq: jnp.ndarray,
                       k: int, metric: VectorMetric, chunk: int = 262144):
    """Quantized analog of ops.distance.knn_scan: decode fused into the
    matmul (codes ride HBM as uint8)."""
    q = queries.astype(jnp.float32)
    q_alpha = q * alpha[None, :]
    q_lo = jnp.dot(q, lo, preferred_element_type=jnp.float32)  # [Q]
    n = codes.shape[0]
    num_chunks = max(n // chunk, 1)

    def chunk_scores(code_chunk, sq_chunk):
        dots = jax.lax.dot_general(
            q_alpha, code_chunk.astype(jnp.bfloat16).astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + q_lo[:, None]
        if metric == VectorMetric.L2:
            q_sq = jnp.sum(q * q, axis=1, keepdims=True)
            return 2.0 * dots - sq_chunk[None, :] - q_sq
        return dots

    from ...ops.distance import exact_topk_blocks

    def chunk_topk(scores, kk):
        C = scores.shape[1]
        if C < 1024 or kk * 64 * 2 >= C:
            return tuple(jax.lax.top_k(scores, kk))
        return exact_topk_blocks(scores, kk)

    if num_chunks <= 1:
        scores = chunk_scores(codes, base_sq)
        scores = jnp.where(valid[None, :], scores, NEG_INF)
        top_s, top_i = chunk_topk(scores, min(k, n))
        return top_s, jnp.where(top_s > NEG_INF, top_i, -1)

    codes_r = codes.reshape(num_chunks, chunk, codes.shape[1])
    valid_r = valid.reshape(num_chunks, chunk)
    sq_r = base_sq.reshape(num_chunks, chunk)

    def step(carry, xs):
        best_s, best_i = carry
        c_chunk, v_chunk, sq_chunk, start = xs
        scores = jnp.where(v_chunk[None, :], chunk_scores(c_chunk, sq_chunk),
                           NEG_INF)
        loc_s, loc_i = chunk_topk(scores, min(k, chunk))
        merged_s = jnp.concatenate([best_s, loc_s], axis=1)
        merged_i = jnp.concatenate([best_i, loc_i + start], axis=1)
        new_s, sel = jax.lax.top_k(merged_s, k)
        return (new_s, jnp.take_along_axis(merged_i, sel, axis=1)), None

    init = (jnp.full((q.shape[0], k), NEG_INF, jnp.float32),
            jnp.full((q.shape[0], k), -1, jnp.int32))
    starts = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    (best_s, best_i), _ = jax.lax.scan(step, init,
                                       (codes_r, valid_r, sq_r, starts))
    return best_s, jnp.where(best_s > NEG_INF, best_i, -1)


@jax.jit
def _max_abs_err(data, valid, codes, lo, alpha):
    """Per-dim (max, mean-square) dequantization error over valid rows (one
    fused device sweep). The max certifies the SQ8 threshold bound in
    knn_scan_sq8_v2 ("cert" mode); the mean square sizes the probabilistic
    "fast" eps (per-query score-error variance = fac^2 * sum q_d^2 ms_d)."""
    vm = valid[:, None].astype(jnp.float32)
    deq = lo[None, :] + alpha[None, :] * codes.astype(jnp.float32)
    err = jnp.abs(data - deq) * vm
    denom = jnp.maximum(jnp.sum(vm), 1.0)
    return jnp.max(err, axis=0), jnp.sum(err * err, axis=0) / denom


class QuantizedStore:
    """Quantized mirror of a VectorKeeper's data."""

    def __init__(self, left_quantile: float, right_quantile: float,
                 min_elements: int):
        self.left_q = left_quantile
        self.right_q = right_quantile
        self.min_elements = max(int(min_elements), 1)
        self.codes: Optional[jnp.ndarray] = None
        self.lo: Optional[jnp.ndarray] = None
        self.alpha: Optional[jnp.ndarray] = None
        # max per-dim |b - dequant(b)| over valid rows: the certified error
        # bound that lets the v2 scan threshold on quantized block maxima
        # yet return the EXACT fp32 top-k (ops/pallas_select.knn_scan_sq8_v2)
        self.err_dims: Optional[jnp.ndarray] = None
        # mean-square per-dim residual: sizes the probabilistic "fast" eps
        self.ms_dims: Optional[jnp.ndarray] = None
        self._quantized_count = 0
        self._codes_i8 = None

    @property
    def active(self) -> bool:
        return self.codes is not None

    @property
    def codes_i8(self) -> jnp.ndarray:
        """Signed view (codes - 128) for the i8 MXU approx kernel
        (ops/pallas_select.knn_scan_approx_sq8_v4); cached per codes
        identity."""
        key = id(self.codes)
        if self._codes_i8 is None or self._codes_i8[0] != key:
            self._codes_i8 = (key, _to_i8(self.codes))
        return self._codes_i8[1]

    def need_requantize(self, count: int, capacity: int) -> bool:
        """(reference: Quantizer::NeedRequantize — outlier drift; here:
        count doubled or capacity changed since last quantization)"""
        if not self.active:
            return count >= self.min_elements
        if self.codes.shape[0] != capacity:
            return True
        return count >= 2 * max(self._quantized_count, 1)

    def need_refresh(self, count: int) -> bool:
        """Codes stale (rows added/removed since last encode) but the
        quantile grid still valid — re-encode without recomputing
        quantiles."""
        return self.active and count != self._quantized_count

    def refresh(self, keeper) -> None:
        """Re-encode with the existing grid — unless the data drifted outside
        it, in which case requantize (reference: Quantizer::NeedRequantize
        outlier test, quantizer.h:11-75)."""
        keeper.flush()
        lo = np.asarray(self.lo)
        alpha = np.asarray(self.alpha)
        hi = lo + alpha * 255.0
        valid = np.asarray(keeper.valid)
        data = np.asarray(keeper.data)[valid]
        if len(data):
            span = np.maximum(hi - lo, 1e-12)
            drift = np.any(data.max(axis=0) > hi + 0.05 * span) or \
                np.any(data.min(axis=0) < lo - 0.05 * span)
            if drift:
                self.quantize(keeper)
                return
        self.codes = _encode(keeper.data, self.lo,
                             jnp.asarray(1.0 / alpha))
        self.err_dims, self.ms_dims = _max_abs_err(
            keeper.data, keeper.valid, self.codes,
                                     self.lo, self.alpha)
        self._quantized_count = keeper.count

    def quantize(self, keeper) -> None:
        """ComponentNthQuantiles + encode (reference: quantizer.h:11-75)."""
        keeper.flush()
        valid = np.asarray(keeper.valid)
        rows = np.flatnonzero(valid)
        if len(rows) == 0:
            return
        sample = rows if len(rows) <= 65536 else \
            np.random.default_rng(7).choice(rows, 65536, replace=False)
        data_s = np.asarray(keeper.data)[sample]
        lo = np.quantile(data_s, self.left_q, axis=0).astype(np.float32)
        hi = np.quantile(data_s, self.right_q, axis=0).astype(np.float32)
        alpha = np.maximum((hi - lo) / 255.0, 1e-12).astype(np.float32)
        self.lo = jnp.asarray(lo)
        self.alpha = jnp.asarray(alpha)
        self.codes = _encode(keeper.data, self.lo,
                             jnp.asarray(1.0 / alpha))
        self.err_dims, self.ms_dims = _max_abs_err(
            keeper.data, keeper.valid, self.codes,
                                     self.lo, self.alpha)
        self._quantized_count = len(rows)

    def memstat(self) -> dict:
        if not self.active:
            return {"quantized": False}
        return {
            "quantized": True,
            "quantized_size": int(self.codes.shape[0] * self.codes.shape[1]),
        }

    def state_dict(self) -> dict:
        if not self.active:
            return {}
        return {"lo": np.asarray(self.lo), "alpha": np.asarray(self.alpha),
                "quantized_count": self._quantized_count}

    def load_state_dict(self, state: dict, keeper) -> None:
        if not state:
            return
        self.lo = jnp.asarray(state["lo"])
        self.alpha = jnp.asarray(state["alpha"])
        self._quantized_count = int(state["quantized_count"])
        self.codes = _encode(keeper.data, self.lo,
                             jnp.asarray(1.0 / np.asarray(self.alpha)))
        self.err_dims, self.ms_dims = _max_abs_err(
            keeper.data, keeper.valid, self.codes,
                                     self.lo, self.alpha)
