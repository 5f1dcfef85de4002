"""IVF vector index — two-stage matmul (centroid probe -> list scan).

Semantic equivalent of the reference IVF index
(cpp_src/core/index/float_vector/ivf_index.cc: FAISS IndexIVFFlat wrapper —
k-means training on 39 x nlist samples (ivf_index.h:62), nprobe search,
RebuildCentroids action), re-built TPU-first: training and both search
stages are device matmuls (ops/ivf_kernels.py), the inverted lists are a
host CSR over row ids rebuilt lazily from the assignment array.

Recommended nlist 4*sqrt(N)..16*sqrt(N) (float_vector.md:56-57) is the
default when centroids_count is 0.
"""
from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ...core.payload import IndexDef
from ...core.type_consts import VectorMetric
from ...ops.distance import scores_to_ranks
from ...ops.ivf_kernels import (assign_lists, expand_probes, kmeans_l2,
                                probe_centroids, scan_lists_batch)
from ..base import SelectKeyResult
from .base import FloatVectorIndexBase
from .params import KnnSearchParams

_TRAIN_FACTOR = 39      # reference: ivf_index.h:62
_KMEANS_ITERS = 20
_MIN_TRAIN = 64


def _pow2(n: int, floor: int = 256) -> int:
    c = floor
    while c < n:
        c *= 2
    return c


class IvfIndex(FloatVectorIndexBase):
    def __init__(self, definition: IndexDef):
        super().__init__(definition)
        vo = definition.vector_opts
        self.nlist_cfg = int(vo.centroids_count or 0)
        self.centroids: Optional[jnp.ndarray] = None
        self._assign = np.full(self.keeper.capacity, -1, dtype=np.int32)
        self._pending_rows: list[int] = []
        self._csr_dirty = True
        self._list_start = np.zeros(1, dtype=np.int64)
        self._list_rows = np.empty(0, dtype=np.int32)
        self._rng = np.random.default_rng(0x1F5)
        # approximate index: bulk uploads ship bf16 (half the transfer; the
        # 3 GB fp32 upload dominated 1M x 768 training) unless disabled
        self.keeper.upload_bf16 = os.environ.get(
            "RX_IVF_BF16_UPLOAD", "1") not in ("0", "false")

    # ------------------------------------------------------------------
    def upsert(self, row_id: int, values) -> None:
        super().upsert(row_id, values)
        self._grow(row_id + 1)
        if values is None or (hasattr(values, "__len__") and len(values) == 0):
            self._assign[row_id] = -1
        else:
            self._pending_rows.append(row_id)
        self._csr_dirty = True

    def delete(self, row_id: int, values) -> None:
        super().delete(row_id, values)
        if row_id < len(self._assign):
            self._assign[row_id] = -1
        self._csr_dirty = True

    def clear(self) -> None:
        super().clear()
        self.centroids = None
        self._assign = np.full(self.keeper.capacity, -1, dtype=np.int32)
        self._pending_rows.clear()
        self._csr_dirty = True

    def _grow(self, need: int) -> None:
        if need <= len(self._assign):
            return
        cap = len(self._assign)
        while cap < need:
            cap *= 2
        self._assign = np.concatenate(
            [self._assign, np.full(cap - len(self._assign), -1,
                                   dtype=np.int32)])

    # ------------------------------------------------------------------
    @property
    def nlist(self) -> int:
        if self.centroids is not None:
            return self.centroids.shape[0]
        if self.nlist_cfg > 0:
            return self.nlist_cfg
        n = max(self.keeper.count, 1)
        return max(1, min(int(4 * math.sqrt(n)), n))

    def _train(self) -> None:
        """k-means on up to 39*nlist sampled vectors (reference
        ivf_index.h:62; faiss Clustering -> jitted Lloyd)."""
        self.keeper.flush()
        valid = np.asarray(self.keeper.valid)
        rows = np.flatnonzero(valid)
        if len(rows) == 0:
            return
        nlist = min(self.nlist, len(rows))
        n_train = min(len(rows), max(_TRAIN_FACTOR * nlist, _MIN_TRAIN))
        sample = self._rng.choice(rows, size=n_train, replace=False)
        # gather the training sample on DEVICE (never pull the full base to
        # host — 100s of MB at 1M rows)
        train_d = self.keeper.data[jnp.asarray(sample, dtype=jnp.int32)]
        init_rows = self._rng.choice(n_train, size=nlist, replace=False)
        init_d = train_d[jnp.asarray(init_rows, dtype=jnp.int32)]
        self.centroids = kmeans_l2(train_d, init_d, _KMEANS_ITERS)
        # re-assign every valid vector
        assign = np.asarray(assign_lists(
            self.keeper.data, self.centroids, self.metric))
        self._assign[:] = -1
        self._assign[rows] = assign[rows]
        self._pending_rows.clear()
        self._csr_dirty = True

    def rebuild_centroids(self) -> None:
        """`rebuild_ivf_index` action analog (float_vector.md:741-799)."""
        self._train()

    def commit(self) -> None:
        self._commit()

    def _commit(self) -> None:
        self.keeper.flush()
        if self.centroids is None:
            if self.keeper.count > 0:
                self._train()
            return
        if self._pending_rows:
            rows = np.unique(np.asarray(self._pending_rows, dtype=np.int32))
            self._pending_rows.clear()
            valid = np.asarray(self.keeper.valid)
            rows = rows[valid[rows]]
            if len(rows):
                vecs_d = self.keeper.data[jnp.asarray(rows, dtype=jnp.int32)]
                self._assign[rows] = np.asarray(assign_lists(
                    vecs_d, self.centroids, self.metric))
            self._csr_dirty = True
        # retrain when the index grew far beyond its training size
        if self.nlist_cfg == 0 and self.keeper.count > 0:
            if self.centroids.shape[0] < 4 * math.sqrt(self.keeper.count) / 2:
                self._train()

    def _rebuild_csr(self) -> None:
        if not self._csr_dirty:
            return
        nlist = self.centroids.shape[0] if self.centroids is not None else 0
        rows = np.flatnonzero(self._assign >= 0)
        a = self._assign[rows]
        order = np.argsort(a, kind="stable")
        self._list_rows = rows[order].astype(np.int32)
        self._list_start = np.searchsorted(
            a[order], np.arange(nlist + 1)).astype(np.int64)
        # device mirror (ops/ivf_kernels.expand_probes): rows pow2-padded so
        # jit shapes stay bucketed across incremental rebuilds
        rpad = _pow2(max(len(self._list_rows), 1))
        rows_p = np.zeros(rpad, dtype=np.int32)
        rows_p[: len(self._list_rows)] = self._list_rows
        self._d_list_rows = jnp.asarray(rows_p)
        self._d_list_start = jnp.asarray(self._list_start.astype(np.int32))
        # assignment mirror aligned to the keeper rows (masked full-scan
        # stage 2, ops/ivf_kernels.scan_probed_full)
        cap = self.keeper.capacity
        a = np.full(cap, -1, dtype=np.int32)
        m = min(cap, len(self._assign))
        a[:m] = self._assign[:m]
        if self._mesh_ctx is not None:
            # mesh mode: assignment row-sharded like the keeper; the
            # list-contiguous reorder is skipped — each shard's partition
            # holds fragments of every list, so the sharded stage 2 is the
            # probe-mask scan split S ways (parallel/sharded_ivf.py)
            self._d_assign = self._mesh_ctx.shard_rows(jnp.asarray(a))
        else:
            self._d_assign = jnp.asarray(a)
            self._rebuild_segments()
        self._csr_dirty = False

    def _rebuild_segments(self) -> None:
        """LIST-CONTIGUOUS device reorder (ops/ivf_kernels.scan_segments):
        every inverted list becomes a SEG_BLK-aligned contiguous span of a
        reordered base copy, so stage 2 streams exactly the probed blocks
        at HBM bandwidth — cost proportional to nprobe, like the
        reference's list probing (ivf_index.cc:151-261) and unlike the
        masked full scan. One extra base-sized HBM buffer + <= nlist
        zero-padded blocks; rebuilt only when assignments change."""
        from ...ops.ivf_kernels import SEG_BLK
        nlist = self.centroids.shape[0] if self.centroids is not None else 0
        lens = np.diff(self._list_start)
        blocks = np.maximum((lens + SEG_BLK - 1) // SEG_BLK, 0)
        seg_start_rows = np.zeros(nlist + 1, dtype=np.int64)
        np.cumsum(blocks * SEG_BLK, out=seg_start_rows[1:])
        total = int(seg_start_rows[-1]) + SEG_BLK   # +1 guaranteed pad block
        npad = _pow2(max(total, SEG_BLK), SEG_BLK)
        perm = np.full(npad, -1, dtype=np.int32)
        for li in range(nlist):
            s, e = self._list_start[li], self._list_start[li + 1]
            if e > s:
                off = int(seg_start_rows[li])
                perm[off: off + (e - s)] = self._list_rows[s:e]
        self._seg_blocks = blocks.astype(np.int64)
        self._seg_first_block = (seg_start_rows[:-1] // SEG_BLK).astype(
            np.int64)
        self._pad_block = int(seg_start_rows[-1]) // SEG_BLK
        # block -> list id map (host, -1 on padding blocks): the masked
        # sweep resolves probe membership per BLOCK from this table
        # instead of gathering per-row list ids on device
        block_list = np.full(npad // SEG_BLK, -1, dtype=np.int32)
        owned = np.repeat(np.arange(nlist, dtype=np.int32),
                          blocks.astype(np.int64))
        block_list[: len(owned)] = owned
        self._block_list = block_list
        self._d_perm = jnp.asarray(perm)
        # reordered base on device: row-gather once per rebuild; padding
        # rows zero (the kernel's sumsq validity check needs exact zeros)
        safe = jnp.maximum(self._d_perm, 0)
        self._d_reordered = (self.keeper.data[safe]
                             * (self._d_perm >= 0)[:, None])
        self._d_reordered_sq = (self.keeper.sq[safe]
                                * (self._d_perm >= 0))


    def _stage2(self, qd, nprobe: int, k, q_host=None):
        """Candidate scoring. Default: SEGMENT SCAN over the list-contiguous
        reorder — the Pallas pipeline DMAs exactly the probed 128-row blocks
        at HBM bandwidth, so cost scales with nprobe (ops/ivf_kernels.
        scan_segments). Fallbacks: masked full matmul scan
        (RX_IVF_SEGMENTS=0 — cost independent of nprobe) and the gathered
        formulation (RX_IVF_GATHER=1 — rows move at the ~11 GB/s gather
        unit). Returns (scores, ids) device arrays or (None, None)."""
        from ...ops.ivf_kernels import probe_mask, scan_probed_full
        if self._mesh_ctx is not None:
            return self._stage2_sharded(qd, nprobe, k)
        use_gather = os.environ.get("RX_IVF_GATHER", "") in ("1", "true")
        if use_gather or k is None:
            cand, ok, totals = self._device_cands(qd, nprobe)
            if cand is None:
                return None, None
            k_eff = k if k is not None else int(totals[0])
            kk = _pow2(min(k_eff, cand.shape[1]), 16)
            return scan_lists_batch(
                qd, self.keeper.data, self.keeper.sq, self.keeper.valid,
                cand, ok, kk, self.metric)
        nlist = self.centroids.shape[0]
        npb = min(nprobe, nlist)
        # stage 1 on the host centroid mirror by default: the table is
        # ~3 MB and the matmul ~25 MFLOP at batch 16, while a device
        # probe costs a full dispatch+readback round trip (~24 ms
        # measured) that serializes ahead of stage 2
        if os.environ.get("RX_IVF_HOST_STAGE1", "1") in ("0", "false"):
            probes = np.asarray(probe_centroids(
                qd, self.centroids, npb, self.metric))
        else:
            # q_host avoids a device->host round-trip on the just-uploaded
            # query batch (np.asarray of a device array costs a tunnel RTT)
            probes = self._probe_host(
                q_host if q_host is not None else np.asarray(qd), npb)
        use_segments = os.environ.get("RX_IVF_SEGMENTS", "1") not in (
            "0", "false")
        if use_segments:
            # cost-based route: segment DMA moves 128-row blocks at
            # ~10-20 GB/s effective (measured, tools/probe_ivf_phases),
            # the masked full sweep reads contiguously at ~819 GB/s —
            # segments only win when the probed fraction (batch-summed,
            # probe sets of distinct queries do not dedup) is tiny
            # default 128: block DMA runs at ~10-20 GB/s vs 819 contiguous
            # (ratio 41-82), and on the tunnel deployment the segment path
            # pays ~15 ms extra fixed dispatch cost (3 uploads + 2 kernels;
            # measured single nprobe=8 at 1M: segments 56 ms vs masked
            # 41 ms) — co-located deployments can lower this to ~48
            penalty = float(os.environ.get("RX_IVF_SEG_PENALTY", "128"))
            seg_rows = None
            if getattr(self, "_seg_blocks", None) is not None:
                from ...ops.ivf_kernels import SEG_BLK
                seg_rows = int(self._seg_blocks[probes].sum()) * SEG_BLK
            # the fixed dispatch overhead (3 extra uploads + 2 kernels,
            # ~15 ms measured on the tunnel; ~0 co-located) expressed in
            # full-sweep-row equivalents, so one inequality routes: at
            # 819 GB/s the sweep covers fixed_ms worth of rows "for free"
            # before the segment path's bandwidth advantage can matter.
            # Round-5 fix: without this term the router picked segments
            # for small single-query probes where the masked sweep was
            # measured 1.4-1.8x faster (47 vs 26 ms at 200k, 56 vs 41 at
            # 1M — the old model ignored the fixed cost entirely).
            fixed_ms = float(os.environ.get("RX_IVF_SEG_FIXED_MS", "15"))
            fixed_rows = fixed_ms * 819e9 / (self.dims * 4) / 1e3
            seg_wins = (seg_rows is not None
                        and seg_rows * penalty + fixed_rows
                        < self.keeper.capacity)
            try:
                if seg_wins and jax.default_backend() == "tpu":
                    return self._stage2_segments(qd, nprobe, k,
                                                 probes=probes)
            except Exception:
                pass
            if os.environ.get("RX_IVF_SEGMENTS", "") in ("1", "true"):
                # explicit opt-in (tests): interpret-mode segments
                return self._stage2_segments(qd, nprobe, k, probes=probes,
                                             interpret=True)
        kk = _pow2(min(k, self.keeper.capacity), 16)
        if getattr(self, "_block_list", None) is not None:
            # block-masked sweep over the list-contiguous reorder: the
            # membership table is per 128-row block and host-computed
            # (B x n_blocks bool, ~100 KB), replacing scan_probed_full's
            # per-element assignment gather (the TPU gather anti-pattern
            # — measured ~220 ms of a ~5 ms scan at 1M x 768, B=16)
            from ...ops.ivf_kernels import scan_reordered_masked
            B = probes.shape[0]
            psel = np.zeros((B, nlist), np.bool_)
            psel[np.arange(B)[:, None], probes] = True
            bl = self._block_list
            bmask = np.where(bl[None, :] >= 0,
                             psel[:, np.maximum(bl, 0)], False)
            return scan_reordered_masked(
                qd, self._d_reordered, self._d_reordered_sq, self._d_perm,
                jnp.asarray(bmask), kk, self.metric)
        sel = probe_mask(jnp.asarray(probes), nlist)
        return scan_probed_full(
            qd, self.keeper.data, self.keeper.sq, self.keeper.valid,
            self._d_assign, sel, kk, self.metric)

    def _stage2_sharded(self, qd, nprobe: int, k):
        """Mesh-resident stage 2: stage 1 runs replicated (the centroid
        table is tiny and identical everywhere), stage 2 scans each chip's
        row partition masked by the probe set and merges per-shard top-k
        over ICI (parallel/sharded_ivf.build_sharded_ivf)."""
        from ...ops.ivf_kernels import probe_mask
        from ...parallel.sharded_ivf import build_sharded_ivf
        nlist = self.centroids.shape[0]
        probes = probe_centroids(qd, self.centroids,
                                 min(nprobe, nlist), self.metric)
        sel = probe_mask(probes, nlist)
        kk = _pow2(min(k, self.keeper.capacity), 16) if k is not None \
            else self.keeper.capacity
        fns = getattr(self, "_mesh_fns", None)
        if fns is None:
            fns = self._mesh_fns = {}
        fn = fns.get(kk)
        if fn is None:
            fn = build_sharded_ivf(self._mesh_ctx.mesh, kk, self.metric,
                                   shard_axis=self._mesh_ctx.shard_axis)
            fns[kk] = fn
        return fn(qd, self.keeper.data, self.keeper.sq, self.keeper.valid,
                  self._d_assign, sel)

    def _host_centroids(self) -> np.ndarray:
        """Host mirror of the (tiny) centroid table, refreshed whenever
        the device array identity changes (train/rebuild)."""
        c = getattr(self, "_c_np", None)
        if c is None or c[0] is not self.centroids:
            self._c_np = (self.centroids, np.asarray(self.centroids))
        return self._c_np[1]

    def _probe_host(self, q: np.ndarray, nprobe: int) -> np.ndarray:
        """Stage 1 on host: the centroid table is ~3 MB and the matmul is
        ~25 MFLOP at batch 16 — a device round-trip through the ~30 ms-RTT
        tunnel costs more than computing it here (measured: the r4 ivf1m
        capture was FLAT ~55 qps across nprobe because fixed per-select
        overheads, led by the probe dispatch+readback, swamped the
        probe-proportional DMA)."""
        cn = self._host_centroids()
        nlist = cn.shape[0]
        npb = min(nprobe, nlist)
        dots = q @ cn.T
        if self.metric == VectorMetric.L2:
            dots = 2.0 * dots - np.sum(cn * cn, axis=1)[None, :]
        part = np.argpartition(-dots, npb - 1, axis=1)[:, :npb]
        order = np.argsort(-np.take_along_axis(dots, part, axis=1),
                           kind="stable", axis=1)
        return np.take_along_axis(part, order, axis=1).astype(np.int32)

    def _stage2_segments(self, qd, nprobe: int, k: int, probes=None,
                         interpret=False):
        """Probe-proportional stage 2: host expands the probed lists into a
        query-major block list (tiny, fully vectorized), the segment kernel
        streams exactly those blocks, and segment_topk folds them with
        original row ids. Stage 1 runs on the host centroid mirror
        (RX_IVF_HOST_STAGE1=0 restores the device probe) so one select =
        ONE device dispatch chain with a single drain."""
        from ...ops.ivf_kernels import (SEG_BLK, scan_segments, segment_topk)
        nlist = self.centroids.shape[0]
        if probes is None:
            if os.environ.get("RX_IVF_HOST_STAGE1", "1") in ("0", "false"):
                probes = np.asarray(probe_centroids(
                    qd, self.centroids, min(nprobe, nlist), self.metric))
            else:
                probes = self._probe_host(np.asarray(qd), nprobe)
        B, P = probes.shape
        blk_cnt = self._seg_blocks[probes]               # [B, P]
        lens = np.diff(self._list_start)
        per_q = blk_cnt.sum(axis=1)
        sq_ = _pow2(max(int(per_q.max()), 1), 4)
        # vectorized run expansion (the python B x P x blocks loop cost
        # ~10s of ms on the 1-core host at nprobe=128)
        cnt = blk_cnt.reshape(-1)                        # [B*P]
        total = int(cnt.sum())
        starts_f = np.full(B * sq_, self._pad_block, dtype=np.int32)
        counts_f = np.zeros(B * sq_, dtype=np.int32)
        if total:
            off = np.zeros((B, P), np.int64)
            off[:, 1:] = np.cumsum(blk_cnt, axis=1)[:, :-1]
            pos0 = (np.arange(B, dtype=np.int64)[:, None] * sq_
                    + off).reshape(-1)                   # [B*P]
            csum = np.cumsum(cnt) - cnt
            within = np.arange(total, dtype=np.int64) - np.repeat(csum, cnt)
            flat = np.repeat(pos0, cnt) + within
            fb = self._seg_first_block[probes].reshape(-1)
            starts_f[flat] = np.repeat(fb, cnt) + within
            rem = np.repeat(lens[probes].reshape(-1), cnt) \
                - within * SEG_BLK
            counts_f[flat] = np.minimum(rem, SEG_BLK).astype(np.int32)
        qids = np.repeat(np.arange(B, dtype=np.int32), sq_)
        seg_scores = scan_segments(
            jnp.asarray(starts_f), jnp.asarray(qids),
            jnp.asarray(counts_f), qd,
            self._d_reordered, self.metric, interpret)
        return segment_topk(seg_scores, jnp.asarray(starts_f),
                            self._d_perm, qd, min(k, self.keeper.capacity),
                            self.metric)

    def _device_cands(self, qd, nprobe: int):
        """Probe + inverted-list expansion fully on device; only the tiny
        [B, nprobe] probe matrix round-trips to host (to size the static
        candidate width)."""
        probes = probe_centroids(qd, self.centroids, nprobe, self.metric)
        p_np = np.asarray(probes)
        lens = (self._list_start[p_np + 1]
                - self._list_start[p_np])          # [B, P] host, tiny
        totals = lens.sum(axis=1)
        if totals.max() == 0:
            return None, None, totals
        cmax = _pow2(int(totals.max()))
        cand, ok = expand_probes(probes, self._d_list_start,
                                 self._d_list_rows, cmax)
        return cand, ok, totals

    # ------------------------------------------------------------------
    def select_async(self, query: np.ndarray, params: KnnSearchParams):
        """Dispatch/drain split (serving overlap, same contract as the BF
        and HNSW engines): the stage-2 device program dispatches under the
        namespace lock; the returned closure blocks on the readback."""
        self._commit()
        if self.centroids is None or self.keeper.count == 0:
            res = SelectKeyResult.empty()
            return lambda: res
        self._rebuild_csr()
        nprobe = getattr(params, "nprobe", 1) or 1
        q = self.keeper.prepare_query(query)[None, :]
        qd = jnp.asarray(q)
        scores_d, ids_d = self._stage2(qd, nprobe, params.k, q_host=q)

        def drain() -> SelectKeyResult:
            if scores_d is None:
                return SelectKeyResult.empty()
            scores, ids = jax.device_get((scores_d, ids_d))
            scores, ids = np.asarray(scores)[0], np.asarray(ids)[0]
            keep = ids >= 0
            scores, ids = scores[keep], ids[keep]
            if params.k is not None:
                scores, ids = scores[: params.k], ids[: params.k]
            ranks = np.asarray(scores_to_ranks(scores, self.metric))
            ranks, ids = self._apply_radius(ranks, ids, params.radius)
            return SelectKeyResult(ids.astype(np.int64),
                                   ranks.astype(np.float32), self.ordering)

        return drain

    def select(self, query: np.ndarray, params: KnnSearchParams,
               ) -> SelectKeyResult:
        return self.select_async(query, params)()

    def select_batch_async(self, queries: np.ndarray,
                           params: KnnSearchParams):
        """Batched dispatch/drain split (see select_async)."""
        self._commit()
        queries = np.asarray(queries, dtype=np.float32)
        if self.centroids is None or self.keeper.count == 0 \
                or params.k is None:
            res = super().select_batch(queries, params)
            return lambda: res
        self._rebuild_csr()
        nprobe = getattr(params, "nprobe", 1) or 1
        q = np.stack([self.keeper.prepare_query(v) for v in queries])
        qd = jnp.asarray(q)
        B = len(queries)
        scores_d, ids_d = self._stage2(qd, nprobe, params.k, q_host=q)

        def drain() -> list[SelectKeyResult]:
            if scores_d is None:
                return [SelectKeyResult.empty() for _ in range(B)]
            scores, ids = jax.device_get((scores_d, ids_d))
            scores, ids = np.asarray(scores), np.asarray(ids)
            out = []
            for b in range(B):
                keep = ids[b] >= 0
                s = scores[b][keep][: params.k]
                i = ids[b][keep][: params.k]
                ranks = np.asarray(scores_to_ranks(s, self.metric))
                ranks, i = self._apply_radius(ranks, i, params.radius)
                out.append(SelectKeyResult(i.astype(np.int64),
                                           ranks.astype(np.float32),
                                           self.ordering))
            return out

        return drain

    def select_batch(self, queries: np.ndarray, params: KnnSearchParams,
                     ) -> list[SelectKeyResult]:
        """Batched IVF: one probe matmul + one device list expansion + one
        chunked candidate scan for all queries."""
        out = self.select_batch_async(queries, params)()
        return out

    # ------------------------------------------------------------------
    def memstat(self) -> dict:
        st = super().memstat()
        st["centroids"] = (int(self.centroids.shape[0])
                           if self.centroids is not None else 0)
        return st

    def state_dict(self) -> dict:
        self._commit()
        return {
            "keeper": self.keeper.state_dict(),
            "centroids": (np.asarray(self.centroids)
                          if self.centroids is not None else None),
            "assign": self._assign.copy(),
        }

    def load_state_dict(self, state: dict) -> None:
        self.clear()
        self.keeper.load_state_dict(state["keeper"])
        c = state.get("centroids")
        self.centroids = jnp.asarray(c) if c is not None else None
        self._assign = np.asarray(state["assign"], dtype=np.int32)
        self._csr_dirty = True
