"""Streaming KNN: batched candidate streaming for post-filtered queries.

Semantic equivalent of the reference streaming stack
(cpp_src/core/nsselecter/knn_streaming_estimator.h:21-53 — ef/batch
estimation with amplification = itemsCount/maxIterations clamped [100, 800];
knn_streaming_index_iterator.h:16; hnswalg.h BeginStreamingSearch
/ContinueStreamingSearch :1865,:1945). Activated for HNSW KNN queries with
neither k nor radius (nsselecter.cc:483-490); batches stream until
offset+limit survivors pass the scalar post-filters.

The TPU variant persists the beam state DEVICE-SIDE across continuations —
frontier queue C, visited bitset, and the scored-but-unreturned seed — so
each `next_batch` resumes the graph traversal exactly where the previous
one stopped (ops/hnsw_kernels.beam_search_resume). Batches are disjoint by
construction: W refills only from freshly-visited nodes, so there is no
host seen-set and no re-search (the round-1 re-run-with-doubled-ef design
cost O(ef^2) rework; this is the reference's ContinueStreamingSearch
semantics, hnswalg.h:1945).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

MIN_EF_BATCH = 100   # reference kMinEfBatch
MAX_EF_BATCH = 800   # reference kMaxEfBatch


def _pow2(n: int, floor: int = 16) -> int:
    c = floor
    while c < n:
        c *= 2
    return c


def _clamp(v: float) -> int:
    return int(min(max(v, MIN_EF_BATCH), MAX_EF_BATCH))


class StreamingKnnEstimator:
    """Mirror of the reference StreamingKnnEstimator."""

    @staticmethod
    def estimate_ef(max_iterations: int, items_count: int, offset: int,
                    limit: int) -> int:
        if items_count == 0:
            return MIN_EF_BATCH
        restricted = max(1, min(max_iterations, items_count))
        needed = offset + limit
        return _clamp(needed * items_count / restricted)

    @staticmethod
    def estimate_batch_size(accepted: int, presented: int, needed: int) -> int:
        remaining = 1 if accepted >= needed else needed - accepted
        amplification = presented / max(1, accepted)
        return _clamp(amplification * remaining)


class KnnStreamingSession:
    """Streams successive next-nearest batches from an HNSW index
    (reference: KnnStreamingSession facade, float_vector_index.h:95-99;
    Begin/ContinueStreamingSearch, hnswalg.h:1865,1945).

    Device state (frontier, visited bitset) persists across batches; the
    session snapshots the index's device arrays at construction, so
    concurrent index mutations do not corrupt a running stream (jnp arrays
    are immutable)."""

    def __init__(self, index, query: np.ndarray, initial_ef: int):
        import jax.numpy as jnp
        from ...ops.hnsw_kernels import beam_begin_stream, greedy_descend

        index._commit()
        index._sync_device()
        self.index = index
        self.metric = index.metric
        self.ef = max(initial_ef, MIN_EF_BATCH)
        self._exhausted = False
        self._returned = 0
        self.iters_total = 0      # device beam iterations (tests/stats)

        self._pack = index._pack(for_search=True)
        self._links = index._d_links0
        self._deleted = index._deleted.copy()

        q = index.keeper.prepare_query(np.asarray(query, dtype=np.float32))
        qp = np.zeros((8, index.dims), dtype=np.float32)   # Q bucket
        qp[0] = q
        self._q = jnp.asarray(qp)

        if index._entry < 0:
            self._exhausted = True
            self._seed = None
            return
        ents = np.full(8, index._entry, dtype=np.int32)
        if index._max_level > 0 and index._d_upper is not None:
            ents = np.asarray(greedy_descend(
                self._q, self._pack, index._d_upper, jnp.asarray(ents),
                self.metric))
        seed_s, seed_i, self._c_s, self._c_ids, self._visited = \
            beam_begin_stream(self._q, self._pack, jnp.asarray(ents)[:, None],
                              n_rows=self._links.shape[0],
                              fcap=_pow2(self.ef), metric=self.metric)
        self._seed = (seed_s, seed_i)

    @property
    def exhausted(self) -> bool:
        return self._exhausted

    def next_batch(self, batch_size: Optional[int] = None,
                   ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (ids, scores higher-better) of the next ranked batch —
        one incremental beam continuation per call, disjoint from all
        previous batches by the visited-bitset construction."""
        import jax.numpy as jnp
        from ...ops.hnsw_kernels import NEG_INF, beam_search_resume

        if self._exhausted:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float32))
        ef_b = _pow2(_clamp(batch_size) if batch_size is not None
                     else self.ef)
        if self._seed is None:
            seed_s = jnp.full((8, 1), NEG_INF, jnp.float32)
            seed_i = jnp.full((8, 1), -1, jnp.int32)
        else:
            seed_s, seed_i = self._seed
            self._seed = None
        w_s, w_ids, self._c_s, self._c_ids, self._visited, iters = \
            beam_search_resume(self._q, self._pack, self._links,
                               seed_s, seed_i, self._c_s, self._c_ids,
                               self._visited, ef=ef_b, expand=2,
                               max_iters=2 * ef_b, metric=self.metric)
        self.iters_total += int(iters)
        if self._pack.quantized:
            # exact fp32 re-rank within the batch (hnsw._search_batch does
            # the same for one-shot searches)
            from ...ops.hnsw_kernels import exact_rescore
            w_s, w_ids = exact_rescore(self._q, self.index.keeper.data,
                                       self.index.keeper.sq, w_ids, w_s,
                                       self.metric)
        import jax
        scores, ids = jax.device_get((w_s, w_ids))
        scores = np.asarray(scores[0])
        ids = np.asarray(ids[0])
        keep = ids >= 0
        scores, ids = scores[keep], ids[keep]
        if len(ids):
            keep = ~self._deleted[ids]
            scores, ids = scores[keep], ids[keep]
        frontier_dead = bool(np.asarray(self._c_s[0, 0]) == -np.inf)
        self._returned += len(ids)
        if (len(ids) == 0 or frontier_dead
                or self._returned >= self.index.keeper.count):
            self._exhausted = True
        return ids.astype(np.int64), scores.astype(np.float32)


class MeshKnnStreamingSession:
    """Streaming KNN over a mesh-sharded HNSW index (VERDICT r4 #3):
    one per-shard KnnStreamingSession per subgraph (hnsw.attach_mesh
    round-robins rows: shard s owns namespace rows {r : r % S == s} as
    local rows r // S), merged on the host by score — the streaming analog
    of the reference's sharded-select merge (core/shardingproxy.cc +
    parallelexecutor.cc). Batches stay disjoint (per-shard visited bitsets
    + disjoint id spaces) and approximately rank-ordered, the same contract
    as the single-device session."""

    def __init__(self, index, query: np.ndarray, initial_ef: int):
        S = len(index._mesh_shards)
        self._S = S
        self._default = max(initial_ef, MIN_EF_BATCH)
        self._sessions: list[tuple[int, KnnStreamingSession]] = []
        for s, sub in enumerate(index._mesh_shards):
            if sub.keeper.count == 0:
                continue
            self._sessions.append(
                (s, KnnStreamingSession(sub, query, self._default)))
        self._buf_ids: list[int] = []
        self._buf_scores: list[float] = []
        self.iters_total = 0

    @property
    def exhausted(self) -> bool:
        return (not self._buf_ids
                and all(sess.exhausted for _, sess in self._sessions))

    def next_batch(self, batch_size: Optional[int] = None,
                   ) -> tuple[np.ndarray, np.ndarray]:
        need = _clamp(batch_size) if batch_size is not None else self._default
        # refill: pull one batch from every live shard whose buffer ran dry
        # (buffered leftovers keep later batches disjoint)
        if len(self._buf_ids) < need:
            for s, sess in self._sessions:
                if sess.exhausted:
                    continue
                ids, scores = sess.next_batch(batch_size)
                self.iters_total += sess.iters_total
                sess.iters_total = 0
                # local row -> namespace row (hnsw._mesh_route inverse)
                self._buf_ids.extend(
                    int(i) * self._S + s for i in ids)
                self._buf_scores.extend(float(x) for x in scores)
        if not self._buf_ids:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float32))
        order = np.argsort(-np.asarray(self._buf_scores))
        take, rest = order[:need], order[need:]
        ids = np.asarray(self._buf_ids, dtype=np.int64)[take]
        scores = np.asarray(self._buf_scores, dtype=np.float32)[take]
        self._buf_ids = [self._buf_ids[j] for j in rest]
        self._buf_scores = [self._buf_scores[j] for j in rest]
        return ids, scores


def open_streaming_session(index, query: np.ndarray, initial_ef: int):
    """Factory: mesh-sharded indexes stream through per-shard sessions."""
    if getattr(index, "_mesh_shards", None):
        return MeshKnnStreamingSession(index, query, initial_ef)
    return KnnStreamingSession(index, query, initial_ef)
