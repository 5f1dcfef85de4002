"""Float-vector index base.

Semantic equivalent of the reference `FloatVectorIndex`
(cpp_src/core/index/float_vector/float_vector_index.h:45): dims/metric
checks, empty-vector bookkeeping, rank ordering per metric, radius
filtering, and the common select facade over {brute-force, HNSW, IVF}
engines. Ranks returned to the planner are the metric values themselves
(L2 distance ascending / similarity descending), matching the reference's
KnnCtx rank semantics (hnsw_index.cc:232-290).
"""
from __future__ import annotations

from typing import Any, Optional

import numpy as np

from ...core.errors import ParamsError
from ...core.payload import IndexDef
from ...core.type_consts import CondType, RankOrdering, VectorMetric
from ...ops.distance import metric_ordering
from ..base import Index, SelectKeyResult
from .keeper import VectorKeeper
from .params import KnnSearchParams


class FloatVectorIndexBase(Index):
    # True for indexes riding the Pallas fused scan (needs removed rows
    # zeroed); graph indexes keep stale data for mark-delete traversal
    KEEPER_ZERO_ON_REMOVE = False

    def __init__(self, definition: IndexDef):
        super().__init__(definition)
        vo = definition.vector_opts
        assert vo is not None
        self.dims = vo.dims
        self.metric = vo.metric
        self.ordering = metric_ordering(self.metric)
        self.keeper = VectorKeeper(vo.dims, vo.metric, vo.start_size,
                                   zero_on_remove=self.KEEPER_ZERO_ON_REMOVE)
        self._mesh_ctx = None   # engine-integrated sharding (attach_mesh)

    def attach_mesh(self, ctx) -> None:
        """Switch the index into mesh-resident mode (the ShardingProxy
        analog, parallel/context.py): keeper arrays row-shard over the mesh
        and selects run shard_map scans with collective top-k merges —
        same select/select_batch API. Subclasses with per-shard structure
        (HNSW subgraphs) override."""
        if ctx is None or ctx.n_shards <= 1:
            return
        self._mesh_ctx = ctx
        self.keeper.attach_mesh(ctx)

    # --- Index interface ------------------------------------------------
    def upsert(self, row_id: int, values: Any) -> None:
        if values is None or (isinstance(values, (list, tuple, np.ndarray))
                              and len(values) == 0):
            self.keeper.set(row_id, None)  # empty vector: excluded from KNN
            return
        self.keeper.set(row_id, np.asarray(values, dtype=np.float32))

    def delete(self, row_id: int, values: Any) -> None:
        self.keeper.remove(row_id)

    def supports(self, condition: CondType) -> bool:
        return condition in (CondType.KNN, CondType.ANY, CondType.EMPTY)

    def select_key(self, condition: CondType, values: tuple, **kw) -> SelectKeyResult:
        if condition in (CondType.ANY, CondType.EMPTY):
            self.keeper.flush()
            valid = np.asarray(self.keeper.valid)
            ids = np.flatnonzero(valid if condition == CondType.ANY else ~valid)
            return SelectKeyResult(ids.astype(np.int64))
        raise ParamsError(
            f"float_vector index '{self.name}' supports only KNN/ANY/EMPTY conditions")

    def clear(self) -> None:
        self.keeper.clear()

    # --- KNN ------------------------------------------------------------
    def select(self, query: np.ndarray, params: KnnSearchParams) -> SelectKeyResult:
        """KNN select (reference: FloatVectorIndex::Select, float_vector_index.h:95)."""
        raise NotImplementedError

    def select_batch(self, queries: np.ndarray, params: KnnSearchParams,
                     ) -> list[SelectKeyResult]:
        """Batched KNN over many queries in ONE device program — the serving
        throughput path (SURVEY.md §7 stage 8: padded device batches).
        Subclasses override with a truly batched kernel; the fallback loops."""
        return [self.select(q, params) for q in np.asarray(queries)]

    # --- two-phase (dispatch / drain) serving protocol ------------------
    # Device dispatch through the tunnel is ASYNC (issuing a jitted call
    # returns immediately; blocking happens at the result readback), so a
    # server holding the namespace lock only for the dispatch phase lets N
    # concurrent clients overlap their device round-trips — the reference's
    # per-connection coroutines never serialize the whole server on one
    # query either (net/cproto/serverconnection.cc). Subclasses with real
    # async dispatch override these; the fallback runs synchronously.

    def select_async(self, query: np.ndarray, params: KnnSearchParams):
        """Returns a zero-arg drain closure producing the SelectKeyResult.
        Call under the namespace lock; invoke the closure outside it."""
        res = self.select(query, params)
        return lambda: res

    def select_batch_async(self, queries: np.ndarray,
                           params: KnnSearchParams):
        """Batched variant of select_async (drain -> list[SelectKeyResult])."""
        res = self.select_batch(queries, params)
        return lambda: res

    def _apply_radius(self, ranks: np.ndarray, ids: np.ndarray,
                      radius: Optional[float]) -> tuple[np.ndarray, np.ndarray]:
        """Radius cut-off in reference semantics: keep rank strictly better
        than radius (L2: rank < radius; IP/cos: rank > radius) —
        reference: knn_search_params.h radius handling."""
        if radius is None:
            return ranks, ids
        if self.ordering == RankOrdering.ASC:
            keep = ranks < radius
        else:
            keep = ranks > radius
        return ranks[keep], ids[keep]

    def memstat(self) -> dict:
        st = self.keeper.memstat()
        st["name"] = self.name
        st["unique_keys_count"] = st["vectors"]
        return st

    def state_dict(self) -> dict:
        return {"keeper": self.keeper.state_dict()}

    def load_state_dict(self, state: dict) -> None:
        self.keeper.load_state_dict(state["keeper"])
