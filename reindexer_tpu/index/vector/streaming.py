"""Streaming KNN: batched candidate streaming for post-filtered queries.

Semantic equivalent of the reference streaming stack
(cpp_src/core/nsselecter/knn_streaming_estimator.h:21-53 — ef/batch
estimation with amplification = itemsCount/maxIterations clamped [100, 800];
knn_streaming_index_iterator.h:16; hnswalg.h BeginStreamingSearch
/ContinueStreamingSearch :1865,:1945). Activated for HNSW KNN queries with
neither k nor radius (nsselecter.cc:483-490); batches stream until
offset+limit survivors pass the scalar post-filters.

The TPU variant re-runs the batched beam with a widened ef per continuation
and returns only not-yet-seen ids in rank order — the device does all the
distance work per batch; the host only tracks the seen-set (SURVEY.md §7
"keep the survivor-count filter on device" is the later optimization).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

MIN_EF_BATCH = 100   # reference kMinEfBatch
MAX_EF_BATCH = 800   # reference kMaxEfBatch


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
    (reference: KnnStreamingSession facade, float_vector_index.h:95-99)."""

    def __init__(self, index, query: np.ndarray, initial_ef: int):
        self.index = index
        self.query = np.asarray(query, dtype=np.float32)
        self.ef = max(initial_ef, MIN_EF_BATCH)
        self._seen: set[int] = set()
        self._exhausted = False
        self._total_ef = self.ef

    @property
    def exhausted(self) -> bool:
        return self._exhausted

    def next_batch(self, batch_size: Optional[int] = None,
                   ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (ids, scores higher-better) of the next ranked batch of
        previously-unseen candidates; empty arrays when the graph is
        exhausted."""
        if self._exhausted:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float32))
        if batch_size is not None:
            self._total_ef = min(self._total_ef + _clamp(batch_size),
                                 max(self.index.keeper.count, 1))
        q = self.index.keeper.prepare_query(self.query)[None, :]
        scores, ids = self.index._search_batch(q, self._total_ef)
        scores, ids = scores[0], ids[0]
        keep = ids >= 0
        scores, ids = scores[keep], ids[keep]
        fresh = np.asarray([int(i) not in self._seen for i in ids],
                           dtype=bool)
        new_ids = ids[fresh]
        new_scores = scores[fresh]
        self._seen.update(int(i) for i in new_ids)
        if len(self._seen) >= self.index.keeper.count or len(new_ids) == 0:
            self._exhausted = True
        # widen next continuation (doubling like the reference's growing
        # ef/batch interplay)
        self._total_ef = min(self._total_ef * 2,
                             max(self.index.keeper.count, MIN_EF_BATCH))
        return new_ids.astype(np.int64), new_scores.astype(np.float32)
