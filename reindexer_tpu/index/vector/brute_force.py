"""Brute-force vector index: tiled matmul + fused top-k on device.

TPU-native replacement for the reference's linear-scan-with-heap
brute-force index (cpp_src/core/index/float_vector/hnswlib/bruteforce.cc):
the whole base rides the MXU as a queries x base matmul (ops/distance.knn_scan)
with a fused running top-k, so QPS is matmul-roofline-bound instead of
scalar-heap-bound. Exact by construction — also serves as the recall oracle
for HNSW/IVF tests (SURVEY.md §4 implication (a)).
"""
from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from ...ops.distance import knn_scan, pairwise_scores, scores_to_ranks
from ..base import SelectKeyResult
from .base import FloatVectorIndexBase
from .params import KnnSearchParams


class BruteForceIndex(FloatVectorIndexBase):
    KEEPER_ZERO_ON_REMOVE = True    # fused-scan validity contract

    def __init__(self, definition):
        super().__init__(definition)
        qc = definition.vector_opts.quantization
        self._quant = None
        self._mesh_fns: dict = {}   # k -> jitted sharded scan
        # sq8-v2 eps ladder: start with the CERTIFIED bound (provably exact
        # kept set); if the data is too weakly structured for the certified
        # margin to fit the slot capacity (overflow flag), stick to the
        # 12-sigma "fast" bound (candidates still scored exactly from the
        # fp32 base — only the kept-SET guarantee becomes probabilistic,
        # the reference's own SQ8 fidelity model); if even that overflows,
        # scan fp32. RX_SQ8_EPS=fast skips the certified attempt.
        import os
        self._sq8_mode = os.environ.get("RX_SQ8_EPS", "cert")
        # scoring contract (QuantizationConfig.mode): "exact" runs the
        # certified eps ladder; "approx" is the REFERENCE's own SQ8
        # semantics (quantizer.h:11-75 — quantized scores, no exactness
        # guarantee, scan streams 1/4 the HBM bytes); "approx_rerank"
        # re-scores the quantized top-k from fp32
        self._quant_mode = qc.mode if qc.enabled else "exact"
        if self._quant_mode not in ("exact", "approx", "approx_rerank"):
            from ...core.errors import ParamsError
            raise ParamsError(
                f"unknown quantization mode '{self._quant_mode}'")
        if qc.enabled:
            from .quantization import QuantizedStore
            self._quant = QuantizedStore(qc.left_quantile, qc.right_quantile,
                                         qc.min_elements)

    def _maybe_quantize(self) -> None:
        if self._quant is None:
            return
        if self._quant.need_requantize(self.keeper.count,
                                       self.keeper.capacity):
            self._quant.quantize(self.keeper)
        elif self._quant.need_refresh(self.keeper.count):
            self._quant.refresh(self.keeper)

    def memstat(self) -> dict:
        st = super().memstat()
        if self._quant is not None:
            st.update(self._quant.memstat())
        return st

    def _scan_quantized(self, q: jnp.ndarray, k: int):
        """SQ8 scan: Pallas fused kernel when the geometry allows (codes
        stream at 1/4 HBM cost, ops/pallas_scan.knn_scan_fused_sq8), XLA
        chunked scan otherwise."""
        kp = self.keeper
        from ...ops.pallas_scan import fused_available, knn_scan_fused_sq8
        if fused_available(kp.capacity, kp.dims, k):
            return knn_scan_fused_sq8(
                q, self._quant.codes, self._quant.lo, self._quant.alpha,
                kp.sq_eff(), k, self.metric)
        from .quantization import knn_scan_quantized
        return knn_scan_quantized(
            q, self._quant.codes, self._quant.lo, self._quant.alpha,
            kp.valid, kp.sq, k, self.metric)

    def _dispatch_scan(self, q: jnp.ndarray, k: int):
        """Dispatch the best available scan for (q, k). Returns
        (scores, idx, flag) device arrays; flag is None unless the v2
        fused-selection kernel ran (flag > 0 on readback => slot-capacity
        overflow, rerun via _scan_fallback — astronomically rare)."""
        kp = self.keeper
        from ...ops.pallas_select import (knn_scan_fused_v2,
                                          knn_scan_fused_v3,
                                          knn_scan_fused_v4,
                                          knn_scan_sq8_v2,
                                          knn_scan_sq8_v3,
                                          sq8_tuning,
                                          v2_available, v3_available,
                                          v4_available, v4_tuning)
        quant = self._quant is not None and self._quant.active
        B = q.shape[0]
        if self._mesh_ctx is not None:
            # mesh-resident mode: row-sharded scan + collective top-k
            # merge. jit keys bucket k to the next pow2 (CLAUDE.md: every
            # distinct k would otherwise be a fresh shard_map compile);
            # results slice back to k. Quantized stores in approx modes
            # ride the sharded codes layout (VERDICT r4 #3).
            kpad = 8
            while kpad < k:
                kpad *= 2
            kpad = min(kpad, kp.capacity)
            if quant and self._quant_mode != "exact":
                from ...parallel.sharded_knn import build_sharded_knn_sq8
                rer = self._quant_mode == "approx_rerank"
                key = ("sq8", kpad, rer)
                fn = self._mesh_fns.get(key)
                if fn is None:
                    fn = build_sharded_knn_sq8(
                        self._mesh_ctx.mesh, kpad, self.metric,
                        shard_axis=self._mesh_ctx.shard_axis, rerank=rer)
                    self._mesh_fns[key] = fn
                s, i = fn(q, self._quant.codes, self._quant.lo,
                          self._quant.alpha, kp.data, kp.valid, kp.sq)
                return s[:, :k], i[:, :k], None
            from ...parallel.sharded_knn import build_sharded_knn
            fn = self._mesh_fns.get(kpad)
            if fn is None:
                fn = build_sharded_knn(self._mesh_ctx.mesh, kpad,
                                       self.metric,
                                       shard_axis=self._mesh_ctx.shard_axis)
                self._mesh_fns[kpad] = fn
            s, i = fn(q, kp.data, kp.valid, kp.sq)
            return s[:, :k], i[:, :k], None
        if (not quant and B > 64 and B % 64 == 0
                and v4_available(kp.capacity, kp.dims, k, 64)):
            # many-batch selects ride the pipelined kernel: batch r's
            # selection overlaps batch r+1's sweep in ONE launch
            R = B // 64
            s, i, flag = knn_scan_fused_v4(
                q.reshape(R, 64, q.shape[1]), kp.data, k, self.metric,
                **v4_tuning())
            return s.reshape(B, -1), i.reshape(B, -1), flag
        if quant and self._quant_mode != "exact":
            # reference-semantics SQ8: top-k of the quantized scores —
            # NO eps ladder, NO fp32 pass. Primary path: the pipelined
            # codes-only i8 kernel (1/4 HBM bytes, i8 MXU scoring —
            # knn_scan_approx_sq8_v4); flag > 0 reruns the v1 quantized
            # scan. approx_rerank re-scores the winners exactly from fp32.
            if (v4_available(kp.capacity, kp.dims, k, min(B, 64))
                    and (B <= 64 or B % 64 == 0)):
                from ...ops.pallas_select import knn_scan_approx_sq8_v4
                R = B // 64 if B % 64 == 0 else 1
                s, i, flag = knn_scan_approx_sq8_v4(
                    q.reshape(R, B // R, q.shape[1]),
                    self._quant.codes_i8, self._quant.lo,
                    self._quant.alpha, kp.sq_eff(), k, self.metric)
                s, i = s.reshape(B, -1), i.reshape(B, -1)
                if self._quant_mode == "approx_rerank":
                    from ...ops.hnsw_kernels import exact_rescore
                    s, i = exact_rescore(q, kp.data, kp.sq, i, s,
                                         self.metric)
                return s, i, flag
            s, i = self._scan_quantized(q, k)
            if self._quant_mode == "approx_rerank":
                from ...ops.hnsw_kernels import exact_rescore
                s, i = exact_rescore(q, kp.data, kp.sq, i, s, self.metric)
            return s, i, None
        if v2_available(kp.capacity, kp.dims, k, q.shape[0]):
            if quant and self._quant.err_dims is not None:
                # top-k at SQ8 scan cost: quantized threshold sweep
                # (cert/fast eps ladder) + exact fp32 candidate sweep,
                # fused into one twin-phase kernel (sq8 v3)
                s, i, flag = knn_scan_sq8_v3(
                    q, self._quant.codes, self._quant.lo, self._quant.alpha,
                    self._quant.err_dims, kp.sq_eff(), kp.data, k,
                    self.metric, eps_mode=self._sq8_mode,
                    ms_dims=self._quant.ms_dims, **sq8_tuning())
                return s, i, flag
            if not quant:
                if v3_available(kp.capacity, kp.dims, k, q.shape[0]):
                    # one-sweep kernel: scores resident in VMEM scratch,
                    # selection with zero extra HBM traffic (same tuned
                    # park/bits variant as v4 — shared kernel machinery)
                    s, i, flag = knn_scan_fused_v3(q, kp.data, k,
                                                   self.metric,
                                                   **v4_tuning())
                else:
                    s, i, flag = knn_scan_fused_v2(q, kp.data, k,
                                                   self.metric)
                return s, i, flag
        s, i = self._scan_fallback(q, k)
        return s, i, None

    def _overflow_rerun(self, q: jnp.ndarray, k: int):
        """Slot-capacity overflow ladder: cert -> fast (sticky — later
        queries dispatch fast directly) -> exact fp32 scan. Returns host
        (scores, idx). In approx modes the rerun is the v1 quantized scan
        (same quantized-score contract, no slot capacity)."""
        if (self._quant is not None and self._quant.active
                and self._quant_mode != "exact"):
            s, i = self._scan_quantized(q, k)
            if self._quant_mode == "approx_rerank":
                from ...ops.hnsw_kernels import exact_rescore
                s, i = exact_rescore(q, self.keeper.data, self.keeper.sq,
                                     i, s, self.metric)
            return jax.device_get((s, i))
        if (self._sq8_mode == "cert" and self._quant is not None
                and self._quant.active and self._quant.err_dims is not None):
            self._sq8_mode = "fast"
            s, i, fl = self._dispatch_scan(q, k)
            if fl is None:
                return jax.device_get((s, i))
            s, i, fl = jax.device_get((s, i, fl))
            if float(fl) <= 0.0:
                return s, i
        if q.shape[0] > 64:
            # v4 group overflow: the v1 fallback kernels are gated at
            # <=128 padded queries — rerun in 64-query slices
            outs = [jax.device_get(self._scan_fallback(q[b:b + 64], k,
                                                       exact=True))
                    for b in range(0, q.shape[0], 64)]
            return (np.concatenate([o[0] for o in outs]),
                    np.concatenate([o[1] for o in outs]))
        return jax.device_get(self._scan_fallback(q, k, exact=True))

    def _scan_fallback(self, q: jnp.ndarray, k: int, exact: bool = False):
        """v1 scan paths (also the overflow fallback for v2). With
        exact=True the quantized formulation is skipped: the sq8-v2
        overflow flag means the certified quantization-error bound could
        not prove a bounded candidate set, so the engine keeps its
        exactness contract by scanning the fp32 base instead (cost of an
        fp32 scan, correctness of the exact engine)."""
        kp = self.keeper
        if not exact and self._quant is not None and self._quant.active:
            return self._scan_quantized(q, k)
        from ...ops.pallas_scan import fused_available, knn_scan_fused
        if fused_available(kp.capacity, kp.dims, k):
            return knn_scan_fused(q, kp.data, kp.sq_eff(), k, self.metric)
        return knn_scan(q, kp.data, kp.valid, kp.sq, k, self.metric)

    def select_batch_async(self, queries: np.ndarray,
                           params: KnnSearchParams):
        """Dispatch one fused scan for the whole query batch (queries ride
        the MXU as one [B, D] x [D, N] matmul) and return the drain closure.
        The dispatch phase runs under the caller's namespace lock; the drain
        (blocking readback + host post-processing) runs outside it, so
        concurrent clients overlap their device round trips."""
        self.keeper.flush()
        kp = self.keeper
        queries = np.asarray(queries, dtype=np.float32)
        if kp.count == 0 or params.k is None:
            res = super().select_batch(queries, params)
            return lambda: res
        self._maybe_quantize()
        q = np.stack([kp.prepare_query(v) for v in queries])
        k = min(params.k, kp.capacity)
        qd = jnp.asarray(q)
        scores, idx, flag = self._dispatch_scan(qd, k)

        def drain() -> list[SelectKeyResult]:
            if flag is not None:
                s, i, fl = jax.device_get((scores, idx, flag))
                if float(fl) > 0.0:        # v2 slot overflow: eps ladder
                    s, i = self._overflow_rerun(qd, k)
            else:
                s, i = jax.device_get((scores, idx))
            s, i = np.asarray(s), np.asarray(i)
            out = []
            for b in range(len(queries)):
                keep = i[b] >= 0
                ranks = np.asarray(scores_to_ranks(s[b][keep], self.metric))
                ids = i[b][keep]
                ranks, ids = self._apply_radius(ranks, ids, params.radius)
                out.append(SelectKeyResult(ids.astype(np.int64),
                                           ranks.astype(np.float32),
                                           self.ordering))
            return out

        return drain

    def select_batch(self, queries: np.ndarray, params: KnnSearchParams,
                     ) -> list[SelectKeyResult]:
        return self.select_batch_async(queries, params)()

    def select_async(self, query: np.ndarray, params: KnnSearchParams):
        """Single-query dispatch/drain split (see select_batch_async)."""
        self.keeper.flush()
        kp = self.keeper
        if kp.count == 0:
            return lambda: SelectKeyResult.empty()
        q = jnp.asarray(kp.prepare_query(query)[None, :])
        self._maybe_quantize()

        if params.k is not None:
            k = min(params.k, kp.capacity)
            scores, idx, flag = self._dispatch_scan(q, k)

            def drain() -> SelectKeyResult:
                # ONE blocking readback for all arrays: separate
                # np.asarray(scores[0]) / np.asarray(idx[0]) cost a device
                # slice dispatch + round trip EACH (~35ms of pure tunnel RTT
                # per single-query select, measured in the hybrid profile)
                if flag is not None:
                    s, i, fl = jax.device_get((scores, idx, flag))
                    if float(fl) > 0.0:    # v2 slot overflow: eps ladder
                        s, i = self._overflow_rerun(q, k)
                else:
                    s, i = jax.device_get((scores, idx))
                s, i = np.asarray(s[0]), np.asarray(i[0])
                keep = i >= 0
                s, i = s[keep], i[keep]
                ranks = np.asarray(scores_to_ranks(s, self.metric))
                ranks, i = self._apply_radius(ranks, i, params.radius)
                return SelectKeyResult(i.astype(np.int64),
                                       ranks.astype(np.float32),
                                       self.ordering)

            return drain

        # radius-only search: full scan, filter on host
        scores_d = pairwise_scores(q, kp.data, kp.valid, kp.sq, self.metric)

        def drain_radius() -> SelectKeyResult:
            scores = np.asarray(scores_d[0])
            idx = np.flatnonzero(scores > -np.inf)
            scores = scores[idx]
            order = np.argsort(-scores, kind="stable")
            scores, idx2 = scores[order], idx[order]
            ranks = np.asarray(scores_to_ranks(scores, self.metric))
            ranks, idx2 = self._apply_radius(ranks, idx2, params.radius)
            return SelectKeyResult(idx2.astype(np.int64),
                                   ranks.astype(np.float32), self.ordering)

        return drain_radius

    def select(self, query: np.ndarray, params: KnnSearchParams) -> SelectKeyResult:
        return self.select_async(query, params)()
