"""Query executor: preprocess -> entry evaluation -> select loop.

Semantic equivalent of the reference planner/executor stack
(cpp_src/core/nsselecter/: QueryPreprocessor, NsSelecter::operator()
nsselecter.cc:68, SelectIteratorContainer, selectLoop nsselecter.cc:799,
Aggregator aggregator.h:14, ExplainCalc) and the multi-namespace fan-out
(reindexer_impl/rx_selector.cc:72 DoSelect for joins/merge).

TPU-first re-design: instead of per-row iterators + comparators in a scalar
hot loop, every condition produces a whole-column boolean mask (index lookup
-> id scatter, comparator -> vectorized compare) and the entries tree is
folded over masks with AND/OR/NOT. Ranked entries (KNN / full-text) produce
RankSources; hybrid fusion applies the RRF/linear rerank over them
(reference: SelectIteratorContainer::MergeRanked selectiteratorcontainer.cc:1561,
sorting/reranker.h) inside the sort-expression evaluator.
"""
from __future__ import annotations

import json
import time
from typing import Any, Optional

import numpy as np

from ..core import precepts as _precepts
from ..core.errors import NotFoundError, QueryError
from ..core.namespace import Namespace
from ..core.rdxcontext import check_cancel
from ..core.payload import get_json_path, set_json_path
from ..core.type_consts import AggType, CondType, OpType, RankOrdering, StrictMode
from ..index.base import SelectKeyResult
from .comparators import column_mask, column_mask_rows, raw_values_mask
from .query import (AlwaysTrue, BetweenFieldsEntry, Bracket, JoinedQuery,
                    JoinType, KnnQueryEntry, Query, QueryEntry, SortingEntry,
                    SubQueryEntry, UpdateEntry)
from .results import (AggregationResult, FacetResult, QueryResults, ResultItem)
from .sortexpr import (DEFAULT_RRF_RANK_CONST, RankSource, SortExprEvaluator)


def _coerce_numeric(vals: list):
    """Python values -> float64 array (None -> NaN), or None when any value
    is non-numeric (strings, lists); enables vectorized comparator paths."""
    try:
        return np.asarray(vals, dtype=np.float64)
    except (TypeError, ValueError):
        return None


_NUM_JOIN_OPS = {CondType.EQ: np.equal, CondType.LT: np.less,
                 CondType.LE: np.less_equal, CondType.GT: np.greater,
                 CondType.GE: np.greater_equal}


_SCALAR_NATIVE: Any = None
_SCALAR_NATIVE_TRIED = False


def _scalar_native():
    """Lazily-built C fast lane for id-space AND/NOT conjunctions
    (csrc/scalar_native.cpp — the native analog of the reference's C++
    selectLoop, nsselecter.cc). Returns None when disabled
    (RX_SCALAR_NATIVE=0) or no compiler is available; callers fall back to
    the pure-Python paths, which are semantically identical."""
    global _SCALAR_NATIVE, _SCALAR_NATIVE_TRIED
    if not _SCALAR_NATIVE_TRIED:
        _SCALAR_NATIVE_TRIED = True
        import os
        if os.environ.get("RX_SCALAR_NATIVE", "1") != "0":
            from .. import csrc
            mod = csrc.load("scalar_native", "scalar_native.cpp")
            if mod is not None:
                mod.setup(QueryEntry, JoinedQuery, ResultItem)
            _SCALAR_NATIVE = mod
    return _SCALAR_NATIVE


class Selecter:
    """Executes select/update/delete queries against the database facade."""

    def __init__(self, db):
        self.db = db

    # per-namespace metadata snapshot for the hot select paths: field ->
    # (index, idef) plus has-TTL and default vector-exclusion sets, rebuilt
    # only when the index set changes (Namespace.schema_version). The analog
    # of the reference holding resolved index pointers inside SelectCtx
    # instead of re-resolving names per query.
    @staticmethod
    def _fast_meta(ns: Namespace) -> dict:
        meta = getattr(ns, "_fast_meta_cache", None)
        if meta is not None and meta["schema_version"] == ns.schema_version:
            return meta
        from ..index.scalar import TtlIndex
        fields: dict[str, tuple] = {}
        vector_excl: set[str] = set()
        has_ttl = False
        for idef, index in zip(ns.payload_type.indexes, ns.indexes):
            fields[idef.name] = (index, idef)
            if isinstance(index, TtlIndex):
                has_ttl = True
            if idef.is_vector:
                for p in idef.json_paths:
                    vector_excl.add(p.split(".")[0])
        meta = {"schema_version": ns.schema_version, "fields": fields,
                "has_ttl": has_ttl, "vector_excl": vector_excl}
        ns._fast_meta_cache = meta
        return meta

    # query-count cache (reference: QueryCountCache, core/querycache.h) and
    # join-preselect cache (reference: JoinCache/JoinPreResult,
    # core/joincache.h) live ON the namespace (like the reference's per-ns
    # caches) so dropping/recreating a namespace discards them; entries are
    # validated against Namespace.version
    @staticmethod
    def _ns_cache(ns: Namespace, name: str) -> dict:
        cache = getattr(ns, name, None)
        if cache is None:
            cache = {}
            setattr(ns, name, cache)
        return cache

    def _query_fingerprint(self, q: Query) -> str:
        from .dsl import to_dsl
        try:
            return json.dumps(to_dsl(q), sort_keys=True, default=str)
        except Exception:
            return repr(vars(q))

    # ==================================================================
    # WAL-as-query surface (reference: wal/walselecter.cc — followers and
    # tooling SELECT from a namespace's WAL with `#lsn > N`; only
    # #lsn/#slave_version conditions are legal in a WAL query)
    # ==================================================================
    def _wal_select(self, q: Query) -> QueryResults:
        from ..core.errors import OutdatedWalError

        lsn_e = None
        for _, e in q.entries:
            if (not isinstance(e, QueryEntry)
                    or e.field not in ("#lsn", "#slave_version")):
                raise QueryError(
                    "WAL query may only contain #lsn/#slave_version "
                    "conditions")
            if e.field == "#lsn":
                lsn_e = e
        if (lsn_e is None
                or lsn_e.condition not in (CondType.GT, CondType.GE)
                or len(lsn_e.values) != 1):
            raise QueryError("Query to WAL should contain one condition "
                             "'#lsn > number' (walselecter.cc:23)")
        self.db.get_namespace(q.namespace)       # validates existence
        rs = getattr(self.db, "_replication_state", None)
        if rs is None:
            from ..replication import ReplicationState
            rs = ReplicationState(self.db)
        from_lsn = int(lsn_e.values[0])
        if lsn_e.condition == CondType.GE:
            from_lsn -= 1
        recs = rs.wal.since(from_lsn)
        if recs is None:
            raise OutdatedWalError(
                f"Query to WAL with outdated LSN {from_lsn}, "
                f"LSN counter {rs.wal.last_lsn + 1}")
        recs = [r for r in recs if r["ns"] == q.namespace]
        total = len(recs)
        off = q.offset_ or 0
        end = off + q.limit_ if q.limit_ is not None else None
        items = [ResultItem(doc=dict(r), row_id=-1, ns_name=q.namespace)
                 for r in recs[off:end]]
        return QueryResults(ns_name=q.namespace, items=items,
                            total_count=total)

    # ==================================================================
    # SELECT
    # ==================================================================
    def select(self, q: Query) -> QueryResults:
        if any(isinstance(e, QueryEntry)
               and e.field in ("#lsn", "#slave_version")
               for _, e in q.entries):
            return self._wal_select(q)
        fast = self._fast_point_select(q)
        if fast is not None:
            return fast
        t_start = time.perf_counter()
        check_cancel()
        ns = self.db.get_namespace(q.namespace)
        with ns.lock:
            ns.collect_expired()

            # count_cached fast path (reference: QueryCountCache — pure-count
            # queries reuse the total until the namespace version changes)
            count_key = None
            if (q.limit_ == 0 and not q.explain_ and not q.merge_queries
                    and q.aggregations
                    and all(a.agg_type in (AggType.COUNT, AggType.COUNT_CACHED)
                            for a in q.aggregations)
                    and any(a.agg_type == AggType.COUNT_CACHED
                            for a in q.aggregations)):
                count_key = self._query_fingerprint(q)
                hit = self._ns_cache(ns, "query_count_cache").get(count_key)
                if hit is not None and hit[0] == ns.version:
                    aggs = []
                    for a in q.aggregations:
                        r = AggregationResult(a.agg_type.value, a.fields)
                        r.value = float(hit[1])
                        aggs.append(r)
                    ns.perf.hit("selects", time.perf_counter() - t_start)
                    return QueryResults(
                        ns_name=ns.name, items=[], total_count=hit[1],
                        aggregations=aggs)

            cap = ns.rows_capacity
            exists = ns.exists_mask()
            explain_sel: list[dict] = []
            t_idx0 = time.perf_counter()
            streaming_entry = self._detect_streaming_knn(ns, q)
            if streaming_entry is not None:
                rows, stream_ranks, sources = self._stream_knn_rows(
                    ns, q, streaming_entry, exists, explain_sel)
                t_idx1 = time.perf_counter()
            else:
                rows = None
                sources = {}
                if not q.explain_:
                    rows = self._fast_and_rows(ns, q, exists)
                    if rows is None:
                        rows = self._fast_or_rows(ns, q, exists)
                if rows is None:
                    mask, sources = self._eval_entries(ns, q.entries, q,
                                                       exists, explain_sel)
                    mask = mask & exists
                    rows = np.flatnonzero(mask).astype(np.int64)
                t_idx1 = time.perf_counter()

            # --- equal-position re-verification (reference: equalPositions —
            # conditions on the listed array fields must hold at the same
            # array index)
            if q.equal_positions:
                rows = self._equal_position_filter(ns, q, rows)

            # --- aggregations (over the full filtered set, pre-pagination,
            # reference: aggregator runs inside selectLoop over all matches)
            aggregations = [self._aggregate(ns, rows, a) for a in q.aggregations]
            distinct_aggs = [a for a in q.aggregations if a.agg_type == AggType.DISTINCT]
            if distinct_aggs:
                rows = self._distinct_filter(ns, rows, distinct_aggs[0].fields)

            # --- sorting
            t_sort0 = time.perf_counter()
            if streaming_entry is not None:
                # streaming rows arrive already rank-ordered
                ranks_arr, sort_info = stream_ranks, "rank(streaming)"
            else:
                rows, ranks_arr, sort_info = self._sort_rows(ns, q, rows,
                                                             sources)
            t_sort1 = time.perf_counter()

            total = len(rows)
            if count_key is not None:
                cc = self._ns_cache(ns, "query_count_cache")
                if len(cc) >= 256:
                    cc.clear()
                cc[count_key] = (ns.version, total)
            # --- pagination
            lo = q.offset_
            hi = total if q.limit_ is None else min(total, lo + q.limit_)
            page = rows[lo:hi]
            page_ranks = ranks_arr[lo:hi] if ranks_arr is not None else None

            # --- materialize items; float-vector fields are excluded from
            # results unless named in select_filter or requested via
            # vectors() (reference: float_vector.md:389-421)
            vector_paths = self._excluded_vector_paths(ns, q)
            items: list[ResultItem] = []
            for i, row in enumerate(page):
                doc = ns.get_item(int(row))
                if doc is None:
                    continue
                doc_out = self._project(doc, q.select_filter)
                if vector_paths:
                    doc_out = {k: v for k, v in doc_out.items()
                               if k not in vector_paths}
                items.append(ResultItem(
                    doc=doc_out, row_id=int(row),
                    rank=(float(page_ranks[i]) if page_ranks is not None else None),
                    ns_name=ns.name))

            # --- left joins attach matched docs (post-pagination — the
            # reference left-join also materializes per result item)
            for jq in q.joins:
                if jq.join_type == JoinType.LEFT:
                    self._attach_left_join(ns, jq, items)

            # --- select functions (highlight/snippet) via the FT layer
            if q.select_functions:
                self._apply_select_functions(ns, q, items, sources)

            explain = None
            if q.explain_:
                explain = {
                    "total_us": int((time.perf_counter() - t_start) * 1e6),
                    "indexes_us": int((t_idx1 - t_idx0) * 1e6),
                    "sort_us": int((t_sort1 - t_sort0) * 1e6),
                    "selectors": explain_sel,
                    "sort_index": sort_info,
                    "matched": int(total),
                }

            res = QueryResults(
                ns_name=ns.name, items=items,
                total_count=total if (q.req_total or q.explain_) else None,
                aggregations=aggregations, explain=explain)
            ns.perf.hit("selects", time.perf_counter() - t_start)

        # --- merge queries (reference: Query::Merge, rx_selector merge path)
        for mq in q.merge_queries:
            sub = self.select(mq)
            res.extend(sub)
        return res

    # ==================================================================
    # point-select fast path (reference headline: WHERE id=? point reads are
    # the hottest pattern, readme.md:126 — skip the whole-column mask
    # machinery for single indexed-EQ lookups)
    # ==================================================================
    def _fast_point_select(self, q: Query) -> Optional[QueryResults]:
        if (len(q.entries) != 1 or q.sorts or q.aggregations or q.joins
                or q.merge_queries or q.select_functions or q.explain_
                or q.equal_positions or q.offset_ or q.req_total):
            return None
        op, entry = q.entries[0]
        if op != OpType.AND or not isinstance(entry, QueryEntry):
            return None
        if entry.condition not in (CondType.EQ, CondType.SET):
            return None
        ns = self.db.get_namespace(q.namespace)
        meta = self._fast_meta(ns)
        pair = meta["fields"].get(entry.field)
        if pair is None:
            return None
        index, idef = pair
        if (idef.is_fulltext or idef.is_vector
                or not index.supports(entry.condition)):
            return None
        t0 = time.perf_counter()
        with ns.lock:
            if meta["has_ttl"]:
                ns.collect_expired()
            # native point core: plain docs only (no projection, no vector
            # paths to strip); bails to the Python loop otherwise
            if not q.select_filter and not meta["vector_excl"]:
                mod = _scalar_native()
                if mod is not None:
                    nm = self._native_meta(ns, mod)
                    fm = nm.get(entry.field)
                    if fm is not None:
                        limit = q.limit_ if q.limit_ is not None else -1
                        items = mod.point_items(fm, int(entry.condition),
                                                entry.values, ns.items,
                                                limit, ns.name)
                        if items is not None:
                            ns.perf.hit("selects",
                                        time.perf_counter() - t0)
                            return QueryResults(ns_name=ns.name, items=items)
            res = index.select_key(entry.condition, entry.values, copy=False)
            if res.unmatched:
                return None
            if not q.select_filter:
                vector_paths = meta["vector_excl"]
            else:
                vector_paths = self._excluded_vector_paths(ns, q)
            items = []
            items_list = ns.items
            nrows = len(items_list)
            limit = q.limit_ if q.limit_ is not None else len(res.ids)
            for row in res.ids[:limit]:
                row = int(row)
                doc = items_list[row] if 0 <= row < nrows else None
                if doc is None:
                    continue
                doc_out = self._project(doc, q.select_filter)
                if vector_paths:
                    doc_out = {k: v for k, v in doc_out.items()
                               if k not in vector_paths}
                items.append(ResultItem(doc=doc_out, row_id=row,
                                        ns_name=ns.name))
            ns.perf.hit("selects", time.perf_counter() - t0)
            return QueryResults(ns_name=ns.name, items=items)

    # ==================================================================
    # streaming KNN (reference: NsSelecter::detectStreamingKnn,
    # nsselecter.cc:483-500 + knn_streaming_index_iterator.h)
    # ==================================================================
    def _detect_streaming_knn(self, ns: Namespace,
                              q: Query) -> Optional[KnnQueryEntry]:
        """Streaming mode: exactly one top-level AND KNN entry with neither k
        nor radius, on an HNSW index, non-hybrid, default rank sort."""
        knn = [(op, e) for op, e in q.entries if isinstance(e, KnnQueryEntry)]
        if len(knn) != 1:
            return None
        op, entry = knn[0]
        if not getattr(entry.params, "is_streaming", False):
            return None
        from ..index.vector.hnsw import HnswIndex
        index = ns.get_index(entry.field)
        if not isinstance(index, HnswIndex):
            raise QueryError(
                "KNN query without 'k' and 'radius' (streaming search) is "
                f"supported for HNSW indexes only, but index '{entry.field}' "
                "is not HNSW")
        if op != OpType.AND:
            raise QueryError("streaming KNN entry must be an AND condition")
        # hybrid (FT+KNN) never streams
        for _, e in q.entries:
            if isinstance(e, QueryEntry):
                idef = ns.index_def(e.field)
                if idef is not None and idef.is_fulltext:
                    raise QueryError(
                        "Streaming KNN search does not support hybrid queries")
        if q.sorts:
            return None
        return entry

    def _stream_knn_rows(self, ns: Namespace, q: Query, entry: KnnQueryEntry,
                         exists: np.ndarray, explain_sel: list,
                         ) -> tuple[np.ndarray, np.ndarray, dict]:
        from ..index.vector.hnsw import HnswIndex
        from ..index.vector.streaming import (StreamingKnnEstimator,
                                              open_streaming_session)
        from ..ops.distance import scores_to_ranks
        index: HnswIndex = ns.get_index(entry.field)  # type: ignore[assignment]
        other = [(op, e) for op, e in q.entries if e is not entry]
        mask, sources = self._eval_entries(ns, other, q, exists, explain_sel)
        mask = mask & exists
        items_count = ns.item_count()
        max_iter = int(mask.sum())
        limit = q.limit_ if q.limit_ is not None else items_count
        needed = q.offset_ + limit
        value = entry.value
        if isinstance(value, str):
            value = self.db.embed_query(ns, entry.field, value)
        ef0 = StreamingKnnEstimator.estimate_ef(
            max_iter, items_count, q.offset_, limit)
        session = open_streaming_session(index, np.asarray(value,
                                                           dtype=np.float32),
                                         ef0)
        acc_rows: list[int] = []
        acc_scores: list[float] = []
        presented = 0
        while len(acc_rows) < needed and not session.exhausted:
            batch = StreamingKnnEstimator.estimate_batch_size(
                len(acc_rows), max(presented, 1), needed)
            ids, scores = session.next_batch(batch)
            presented += len(ids)
            for i, s in zip(ids, scores):
                if mask[int(i)]:
                    acc_rows.append(int(i))
                    acc_scores.append(float(s))
        rows = np.asarray(acc_rows, dtype=np.int64)
        scores = np.asarray(acc_scores, dtype=np.float32)
        ranks = np.asarray(scores_to_ranks(scores, index.metric),
                           dtype=np.float64)
        src = RankSource(field=entry.field, kind="knn", ids=rows,
                         ranks=ranks.astype(np.float32),
                         ordering=index.ordering)
        sources = {**sources, entry.field: src}
        return rows, ranks, sources

    # ==================================================================
    # entries tree evaluation
    # ==================================================================
    def _substitute_composite(self, ns: Namespace, entries: list) -> list:
        """Composite-index substitution (reference: QueryPreprocessor
        composite substitution, nsselecter/querypreprocessor.h:33-114):
        top-level AND EQ conditions covering all sub-fields of a composite
        index collapse into one composite lookup."""
        composites = [d for d in ns.payload_type.indexes if d.is_composite]
        if not composites:
            return entries
        eq_at: dict[str, int] = {}
        for i, (op, e) in enumerate(entries):
            if (op == OpType.AND and isinstance(e, QueryEntry)
                    and e.condition == CondType.EQ and len(e.values) == 1
                    and e.field not in eq_at):
                eq_at[e.field] = i
        for cdef in composites:
            fields = list(cdef.json_paths)
            if all(f in eq_at for f in fields):
                key = tuple(entries[eq_at[f]][1].values[0] for f in fields)
                drop = {eq_at[f] for f in fields}
                new_entries = [ent for i, ent in enumerate(entries)
                               if i not in drop]
                new_entries.insert(
                    min(drop),
                    (OpType.AND, QueryEntry(cdef.name, CondType.EQ, (key,))))
                return new_entries
        return entries

    # cost classes for planner ordering (reference: QueryPreprocessor
    # cost-based condition reorder, nsselecter/querypreprocessor.cc —
    # cheap indexed lookups run first so expensive comparators / device
    # dispatches see an already-narrowed candidate set and can be skipped
    # outright when the AND-chain is already empty)
    _EST_UNKNOWN = 1 << 60

    def _entry_cost(self, ns: Namespace, entry: Any) -> tuple:
        """(cost class, selectivity estimate): classes order cheap indexed
        lookups before comparators/device dispatches; within the indexed
        class, smaller posting-size estimates run first to maximize
        short-circuit odds (reference: cost-based reorder w/ index
        distribution stats, querypreprocessor.cc)."""
        if isinstance(entry, AlwaysTrue):
            return (0, self._EST_UNKNOWN)
        if isinstance(entry, QueryEntry):
            idef = ns.index_def(entry.field)
            if idef is not None and idef.is_fulltext:
                return (60, self._EST_UNKNOWN)  # ranked device program
            index = ns.get_index(entry.field)
            if index is not None and index.supports(entry.condition):
                est = index.estimate_matches(entry.condition, entry.values)
                return (10, est if est is not None else self._EST_UNKNOWN)
            if ns.column_values(entry.field) is not None:
                return (20, self._EST_UNKNOWN)  # vectorized comparator
            return (40, self._EST_UNKNOWN)      # raw per-doc comparator
        if isinstance(entry, BetweenFieldsEntry):
            return (30, self._EST_UNKNOWN)
        if isinstance(entry, Bracket):
            return (50, self._EST_UNKNOWN)
        if isinstance(entry, KnnQueryEntry):
            return (70, self._EST_UNKNOWN)      # device KNN dispatch
        if isinstance(entry, SubQueryEntry):
            return (80, self._EST_UNKNOWN)
        if isinstance(entry, JoinedQuery):
            return (90, self._EST_UNKNOWN)      # full joined-ns select
        return (50, self._EST_UNKNOWN)

    def _plan_order(self, ns: Namespace, entries: list) -> list:
        """Stable-sort entries by cost class within maximal runs of AND/NOT
        ops. Entries in such a run commute (each contributes `& m` or
        `& ~m` to the conjunction), so reordering preserves semantics; OR
        entries are fixed pivots because `(a & b) | c != (a | c) & b`."""
        out: list = []
        run: list = []
        for op, entry in entries:
            if op == OpType.OR:
                run.sort(key=lambda oe: self._entry_cost(ns, oe[1]))
                out.extend(run)
                run = []
                out.append((op, entry))
            else:
                run.append((op, entry))
        run.sort(key=lambda oe: self._entry_cost(ns, oe[1]))
        out.extend(run)
        return out

    # id-space conjunction fast path (reference analog: the most selective
    # SelectIterator drives the scan and comparators only see its rows,
    # nsselecter.cc selectLoop — vs the default whole-column mask algebra
    # below, which pays O(namespace) per entry regardless of selectivity)
    _FAST_AND_MAX_DRIVER = 4096

    def _native_meta(self, ns: Namespace, mod) -> dict:
        """Schema-versioned dict of FieldMeta capsules for the native lane
        (strong refs to the in-place-mutated posting containers; rebuilt on
        index add/drop, which bumps Namespace.schema_version)."""
        cache = getattr(ns, "_native_meta_cache", None)
        if cache is None or cache[0] != ns.schema_version:
            nmeta = mod.build_meta(self._fast_meta(ns)["fields"], ns.columns)
            cache = (ns.schema_version, nmeta)
            ns._native_meta_cache = cache
        return cache[1]

    def _native_and_rows(self, ns: Namespace,
                         q: Query) -> Optional[np.ndarray]:
        """One-call C evaluation of an all-AND/NOT conjunction
        (csrc/scalar_native.cpp). The C side walks the live posting
        dicts/sets and Column buffers under the namespace lock and returns
        sorted live row ids; join entries come back as positions and are
        probed here at the surviving candidate rows (AND/NOT probes
        commute, so ordering joins last is result-identical). Returns None
        on bail — any shape/type the C lane doesn't handle exactly like
        the Python paths."""
        mod = _scalar_native()
        if mod is None:
            return None
        res = mod.eval_and(self._native_meta(ns, mod), q.entries, ns.items)
        if res is None:
            return None
        buf, join_pos = res
        ids = np.frombuffer(buf, dtype=np.int64)
        for p in join_pos:
            if not len(ids):
                break
            op, entry = q.entries[p]
            m, _ = self._join_matches(ns, entry, need_matches=False,
                                      only_rows=ids)
            keep = m[ids]
            ids = ids[~keep if op == OpType.NOT else keep]
        return ids

    def _fast_and_rows(self, ns: Namespace, q: Query,
                       exists: np.ndarray) -> Optional[np.ndarray]:
        """Evaluate an all-AND/NOT conjunction in id space: drive from the
        most selective indexed entry's posting list and probe the remaining
        conditions only at those candidate rows. Returns sorted row ids, or
        None when the query shape doesn't qualify (the caller falls back to
        the mask path, which is always correct)."""
        rows = self._native_and_rows(ns, q)
        if rows is not None:
            return rows
        entries = self._substitute_composite(ns, q.entries)
        cap = len(exists)
        fields = self._fast_meta(ns)["fields"]
        est_cap = min(self._FAST_AND_MAX_DRIVER, max(64, cap >> 2))
        driver_pos = -1
        driver_est = None
        costed: list[tuple] = []
        for op, entry in entries:
            if op == OpType.OR:
                return None
            if isinstance(entry, (AlwaysTrue, JoinedQuery)):
                if isinstance(entry, AlwaysTrue) and op == OpType.NOT:
                    return None  # NOT AlwaysTrue = empty set; mask path owns it
                costed.append((op, entry, self._entry_cost(ns, entry)))
                continue
            if not isinstance(entry, QueryEntry):
                return None
            if entry.field.startswith("#"):
                return None
            pair = fields.get(entry.field)
            if pair is not None and (pair[1].is_fulltext or pair[1].is_vector):
                return None
            cost = self._entry_cost(ns, entry)
            if cost[0] >= 40:
                # raw per-doc comparator entry: the probe loop would bail
                # mid-way anyway — reject before paying the driver lookup
                return None
            costed.append((op, entry, cost))
            # cost class 10 == supporting index; cost[1] is its estimate
            if op == OpType.AND and cost[0] == 10 and cost[1] <= est_cap:
                if driver_est is None or cost[1] < driver_est:
                    driver_est = cost[1]
        if driver_est is None:
            return None
        costed.sort(key=lambda oec: oec[2])
        entries = [(op, e) for op, e, _ in costed]
        for pos, (op, entry) in enumerate(entries):
            if (op == OpType.AND and costed[pos][2][0] == 10
                    and costed[pos][2][1] == driver_est):
                driver_pos = pos
                break
        d_entry = entries[driver_pos][1]
        res = fields[d_entry.field][0].select_key(d_entry.condition,
                                                  d_entry.values)
        if res.unmatched:
            return None
        ids = np.asarray(res.ids, dtype=np.int64)
        ids = ids[(ids >= 0) & (ids < cap)]
        if len(ids) > 1 and not res.sorted_unique:
            ids = np.unique(ids)  # sorted; array-indexed fields can repeat
        ids = ids[exists[ids]]
        for pos, (op, entry) in enumerate(entries):
            if pos == driver_pos or isinstance(entry, AlwaysTrue):
                continue
            if len(ids) == 0:
                break  # AND/NOT only: nothing can revive an empty set
            check_cancel()
            if isinstance(entry, JoinedQuery):
                m, _ = self._join_matches(ns, entry, need_matches=False,
                                          only_rows=ids)
                keep = m[ids]
            else:
                col = ns.column_values(entry.field)
                if col is not None and entry.condition != CondType.DWITHIN:
                    keep = column_mask_rows(col, entry.condition,
                                            list(entry.values), ids)
                else:
                    index = ns.get_index(entry.field)
                    if index is None or not index.supports(entry.condition):
                        return None
                    r2 = index.select_key(entry.condition, entry.values)
                    if r2.unmatched:
                        return None
                    keep = np.isin(ids, r2.ids)
            ids = ids[~keep if op == OpType.NOT else keep]
        return ids

    def _fast_or_rows(self, ns: Namespace, q: Query,
                      exists: np.ndarray) -> Optional[np.ndarray]:
        """Id-space pure-disjunction fast path: a chain of indexed OR
        entries unions posting lists instead of building one full-width
        mask per arm (reference analog: OR SelectIterators merge their
        IdSets, selectiteratorcontainer.cc). Returns sorted row ids or
        None when the shape doesn't qualify."""
        entries = self._substitute_composite(ns, q.entries)
        cap = len(exists)
        fields = self._fast_meta(ns)["fields"]
        parts = []
        total = 0
        for pos, (op, entry) in enumerate(entries):
            if op != (OpType.AND if pos == 0 else OpType.OR):
                return None
            if not isinstance(entry, QueryEntry):
                return None
            if entry.field.startswith("#"):
                return None
            pair = fields.get(entry.field)
            if pair is None:
                return None
            index, idef = pair
            if (idef.is_fulltext or idef.is_vector
                    or not index.supports(entry.condition)):
                return None
            est = index.estimate_matches(entry.condition, entry.values)
            total += est if est is not None else cap
            if total > max(64, cap >> 1):
                return None  # near-full unions: whole-column masks are fine
            res = index.select_key(entry.condition, entry.values)
            if res.unmatched:
                return None
            parts.append(np.asarray(res.ids, dtype=np.int64))
        if len(parts) < 2:
            return None  # single entries belong to the point/AND paths
        ids = np.concatenate(parts)
        ids = ids[(ids >= 0) & (ids < cap)]
        if len(ids) > 1:
            ids = np.unique(ids)
        return ids[exists[ids]]

    def _eval_entries(self, ns: Namespace, entries: list, q: Query,
                      exists: np.ndarray, explain_sel: list,
                      ) -> tuple[np.ndarray, dict[str, RankSource]]:
        entries = self._substitute_composite(ns, entries)
        entries = self._plan_order(ns, entries)
        cap = len(exists)
        mask: Optional[np.ndarray] = None
        sources: dict[str, RankSource] = {}
        for pos, (op, entry) in enumerate(entries):
            # per-entry cancellation checkpoint (reference: RdxContext
            # ThrowOnCancel inside the select loop, nsselecter.cc)
            check_cancel()
            # AND short-circuit: once the conjunction is empty and no OR
            # can revive it, later entries cannot change the (empty) result
            # (reference analog: the leading SelectIterator driving the scan
            # — comparators are never consulted past an empty iterator)
            if (op != OpType.OR and mask is not None and not mask.any()
                    and all(o != OpType.OR for o, _ in entries[pos:])):
                if explain_sel is not None:
                    explain_sel.append({
                        "field": getattr(entry, "field", None)
                        or type(entry).__name__,
                        "skipped": True, "matched": 0, "time_us": 0,
                    })
                continue
            t0 = time.perf_counter()
            # thread the running conjunction into entries that can probe a
            # candidate subset instead of every row (joins): for AND/NOT
            # the entry's mask is combined with `mask` anyway, so
            # restricting evaluation to its rows is result-identical
            # (reference analog: comparators only see rows the leading
            # SelectIterator drives). OR entries must see everything.
            cand = mask if (op != OpType.OR and mask is not None) else None
            m, src = self._eval_entry(ns, entry, q, exists, explain_sel,
                                      cand_mask=cand)
            if src is not None:
                sources[src.field] = src
            if op == OpType.AND:
                mask = m if mask is None else (mask & m)
            elif op == OpType.OR:
                mask = m if mask is None else (mask | m)
            elif op == OpType.NOT:
                base = exists.copy() if mask is None else mask
                mask = base & ~m
            if explain_sel is not None and not isinstance(entry, Bracket):
                name = getattr(entry, "field", None) or type(entry).__name__
                explain_sel.append({
                    "field": name,
                    "matched": int(m.sum()),
                    "time_us": int((time.perf_counter() - t0) * 1e6),
                })
        if mask is None:
            mask = exists.copy()
        return mask, sources

    def _eval_entry(self, ns: Namespace, entry: Any, q: Query,
                    exists: np.ndarray, explain_sel: list,
                    cand_mask: Optional[np.ndarray] = None,
                    ) -> tuple[np.ndarray, Optional[RankSource]]:
        cap = len(exists)
        if isinstance(entry, Bracket):
            m, srcs = self._eval_entries(ns, entry.entries, q, exists, explain_sel)
            # a single ranked source propagates through the return value; a
            # multi-source bracket (hybrid pair inside brackets) stashes the
            # extras on the query for the sort stage to pick up
            src = next(iter(srcs.values())) if len(srcs) == 1 else None
            if len(srcs) > 1:
                for name, s in srcs.items():
                    q.__dict__.setdefault("_extra_sources", {})[name] = s
            return m, src
        if isinstance(entry, AlwaysTrue):
            return exists.copy(), None
        if isinstance(entry, QueryEntry):
            return self._eval_condition(ns, entry, q, cap)
        if isinstance(entry, KnnQueryEntry):
            return self._eval_knn(ns, entry, cap)
        if isinstance(entry, BetweenFieldsEntry):
            return self._eval_between_fields(ns, entry, cap), None
        if isinstance(entry, SubQueryEntry):
            return self._eval_subquery(ns, entry, cap, exists), None
        if isinstance(entry, JoinedQuery):
            # probe only the running conjunction's candidates (falling back
            # to existing rows): the join cost scales with the filtered set,
            # not the namespace size — measured 125 -> 1,139 qps on the
            # 100k filter+join microbench (tools/bench_scalar.py)
            rows = np.flatnonzero(exists if cand_mask is None
                                  else (cand_mask & exists[:len(cand_mask)]))
            m, _ = self._join_matches(ns, entry, need_matches=False,
                                      only_rows=rows)
            return m[:cap], None
        raise QueryError(f"unknown query entry type: {type(entry).__name__}")

    def _ids_to_mask(self, ids: np.ndarray, cap: int) -> np.ndarray:
        mask = np.zeros(cap, dtype=np.bool_)
        if len(ids):
            valid = ids[(ids >= 0) & (ids < cap)]
            mask[valid] = True
        return mask

    def _eval_condition(self, ns: Namespace, entry: QueryEntry, q: Query,
                        cap: int) -> tuple[np.ndarray, Optional[RankSource]]:
        idef = ns.index_def(entry.field)
        index = ns.get_index(entry.field)

        if idef is not None and idef.is_fulltext:
            # full-text match: ranked source (reference: IndexText::SelectKey)
            res = index.select_key(CondType.EQ, entry.values)
            src = RankSource(field=entry.field, kind="ft", ids=res.ids,
                             ranks=(res.ranks if res.ranks is not None
                                    else np.zeros(len(res.ids), dtype=np.float32)),
                             ordering=res.ordering,
                             matched_words=(res.aux or {}).get("matched_words"),
                             area_sources=(res.aux or {}).get("area_sources"))
            return self._ids_to_mask(res.ids, cap), src

        if index is not None and index.supports(entry.condition):
            res = index.select_key(entry.condition, entry.values)
            if not res.unmatched:
                return self._ids_to_mask(res.ids, cap), None

        # comparator fallback on the column
        col = ns.column_values(entry.field)
        if col is not None and entry.condition != CondType.DWITHIN:
            return column_mask(col, entry.condition, list(entry.values), cap), None

        # non-indexed field: strict-mode checks
        # (reference: StrictMode, query/queryentry validation)
        if idef is None:
            if q.strict_mode == StrictMode.INDEXES:
                raise QueryError(
                    f"current strict mode allows filtering by indexes only; "
                    f"field '{entry.field}' is not indexed")
        raw = ns.doc_field_values(entry.field)
        if q.strict_mode == StrictMode.NAMES and idef is None:
            if all(v is None for v in raw) and ns.item_count() > 0:
                raise QueryError(
                    f"current strict mode requires the field to exist; "
                    f"'{entry.field}' not found in namespace '{ns.name}'")
        m = raw_values_mask(raw, entry.condition, list(entry.values))
        if len(m) < cap:
            m = np.concatenate([m, np.zeros(cap - len(m), dtype=np.bool_)])
        return m[:cap], None

    def _eval_knn(self, ns: Namespace, entry: KnnQueryEntry,
                  cap: int) -> tuple[np.ndarray, RankSource]:
        idef = ns.index_def(entry.field)
        index = ns.get_index(entry.field)
        if idef is None or not idef.is_vector or index is None:
            raise QueryError(f"KNN condition requires a float_vector index, "
                             f"'{entry.field}' is not one")
        value = entry.value
        if isinstance(value, str):
            value = self.db.embed_query(ns, entry.field, value)
        # dispatch under the namespace lock, drain with it released: the
        # device round-trip (~30ms tunnel RTT) no longer serializes
        # concurrent queries on this namespace (see Namespace.unlocked)
        qv = np.asarray(value, dtype=np.float32)
        res = self._knn_select_batched(ns, index, qv, entry.params)
        if res is None and hasattr(index, "select_async"):
            drain = index.select_async(qv, entry.params)
            with ns.unlocked():
                # cancellation between dispatch and drain: the device
                # program keeps running, but the query stops blocking
                check_cancel()
                res = drain()
        elif res is None:          # adapters without an async split
            res = index.select(qv, entry.params)
        src = RankSource(field=entry.field, kind="knn", ids=res.ids,
                         ranks=res.ranks, ordering=res.ordering)
        return self._ids_to_mask(res.ids, cap), src

    def _knn_select_batched(self, ns: Namespace, index, qv: np.ndarray,
                            params) -> Optional[SelectKeyResult]:
        """Continuous batching for concurrent KNN serving (query/dynbatch.py):
        coalesce single-query selects that pile up behind an in-flight
        device dispatch into ONE batched program. Returns None when
        batching does not apply (disabled, radius-only, or the index has
        no batched async path) — the caller falls back to the single path."""
        from . import dynbatch
        if (not dynbatch.enabled() or params.k is None
                or not hasattr(index, "select_batch_async")):
            return None
        batchers = self._ns_cache(ns, "knn_batchers")
        batcher = batchers.get(id(index))
        if batcher is None:
            batcher = batchers.setdefault(id(index), dynbatch.KnnBatcher())
        key = (type(params).__name__,
               tuple(sorted(params.to_dict().items())), len(qv))
        p = dynbatch.PendingQuery(qv)
        batch = None
        with ns.unlocked():
            # waiters park with the namespace lock released; the elected
            # leader returns here and re-acquires it on exit
            batch = batcher.join(key, p)
        while batch is not None:
            # leader: one device program for the whole coalesced batch
            # (dispatch under the ns lock, drain with it released — same
            # isolation class as the single-query path)
            try:
                qs = np.stack([b.query for b in batch])
                pad = dynbatch.bucket_of(len(batch))
                if pad > len(batch):
                    # pad to a shape bucket: the tunnel compiles at most
                    # len(BUCKETS) programs per params key
                    qs = np.concatenate(
                        [qs, np.repeat(qs[-1:], pad - len(batch), axis=0)])
                drain = index.select_batch_async(qs, params)
                with ns.unlocked():
                    if len(batch) == 1:
                        # solo leader: safe to cancel between dispatch and
                        # drain; a shared batch must not die on one
                        # query's deadline
                        check_cancel()
                    results = drain()
            except BaseException as e:
                batcher.finish(batch, None, error=e)
                raise
            batcher.finish(batch, results)
            batch = None
        if p.error is not None:
            raise p.error
        return p.result

    def _eval_between_fields(self, ns: Namespace, entry: BetweenFieldsEntry,
                             cap: int) -> np.ndarray:
        # vectorized two-column compare (reference: BetweenFieldsQueryEntry;
        # the reference comparators walk payloads row-wise but in tight C++ —
        # here the numeric/string common cases run as one numpy expression)
        def vals_of(field: str) -> list:
            col = ns.column_values(field)
            if col is not None and not col.is_array:
                v = col.values()
                s = col.set_mask()
                return [v[i] if s[i] else None for i in range(len(v))]
            return ns.doc_field_values(field)

        left = vals_of(entry.first_field)
        right = vals_of(entry.second_field)
        n = min(len(left), len(right), cap)
        out = np.zeros(cap, dtype=np.bool_)
        ops = {CondType.EQ: lambda a, b: a == b, CondType.LT: lambda a, b: a < b,
               CondType.LE: lambda a, b: a <= b, CondType.GT: lambda a, b: a > b,
               CondType.GE: lambda a, b: a >= b}
        fn = ops.get(entry.condition)
        if fn is None:
            raise QueryError(
                f"unsupported between-fields condition: {entry.condition}")
        la = _coerce_numeric(left[:n])
        ra = _coerce_numeric(right[:n])
        if la is not None and ra is not None:
            with np.errstate(invalid="ignore"):
                m = fn(la, ra)                  # NaN (missing) compares False
            out[:n] = m & ~np.isnan(la) & ~np.isnan(ra)
            return out
        for i in range(n):
            a, b = left[i], right[i]
            if a is None or b is None:
                continue
            try:
                out[i] = fn(a, b)
            except TypeError:
                out[i] = False
        return out

    def _eval_subquery(self, ns: Namespace, entry: SubQueryEntry, cap: int,
                       exists: np.ndarray) -> np.ndarray:
        sub_q = entry.sub_query
        sub_res = self.select(sub_q)
        if entry.field is not None:
            # field COND (subquery values) — subquery must select one field
            # or carry an aggregation (reference: SubQueryFieldEntry)
            if sub_q.aggregations:
                vals = self._agg_values(sub_res)
            else:
                if not sub_q.select_filter:
                    raise QueryError(
                        "subquery on a field requires select_filter or aggregation")
                f = sub_q.select_filter[0]
                vals = [get_json_path(it.doc, f) for it in sub_res]
                vals = [v for v in vals if v is not None]
            qe = QueryEntry(entry.field,
                            CondType.SET if entry.condition == CondType.EQ
                            and len(vals) > 1 else entry.condition,
                            tuple(vals))
            m, _ = self._eval_condition(ns, qe, Query(ns.name), cap)
            return m
        # (subquery) COND values — ANY/EMPTY check result presence, aggregates
        # compare against values (reference: SubQueryEntry)
        if entry.condition == CondType.ANY:
            ok = len(sub_res) > 0
        elif entry.condition == CondType.EMPTY:
            ok = len(sub_res) == 0
        else:
            vals = self._agg_values(sub_res)
            if not vals:
                vals = [float(len(sub_res))]
            lhs = vals[0]
            rhs = entry.values
            ok = {
                CondType.EQ: lambda: lhs in rhs,
                CondType.SET: lambda: lhs in rhs,
                CondType.LT: lambda: lhs < rhs[0],
                CondType.LE: lambda: lhs <= rhs[0],
                CondType.GT: lambda: lhs > rhs[0],
                CondType.GE: lambda: lhs >= rhs[0],
                CondType.RANGE: lambda: rhs[0] <= lhs <= rhs[1],
            }[entry.condition]()
        return exists.copy() if ok else np.zeros(cap, dtype=np.bool_)

    @staticmethod
    def _agg_values(res: QueryResults) -> list:
        out = []
        for a in res.aggregations:
            if a.value is not None:
                out.append(a.value)
            out.extend(a.distincts)
        return out

    # ==================================================================
    # equal positions
    # ==================================================================
    def _equal_position_filter(self, ns: Namespace, q: Query,
                               rows: np.ndarray) -> np.ndarray:
        """equal_positions: some array position j must satisfy every field's
        condition simultaneously. Evaluated position-major — one vectorized
        comparator call per (field, position) over ALL rows, instead of a
        Python loop per row (reference: comparators run row-wise but in C++,
        selectiteratorcontainer.cc)."""
        from .comparators import raw_values_mask
        conds: dict[str, QueryEntry] = {}
        for op, e in q.entries:
            if isinstance(e, QueryEntry) and op == OpType.AND:
                conds[e.field] = e
        R = len(rows)
        docs = [ns.get_item(int(r)) for r in rows]
        keep = np.asarray([d is not None for d in docs], dtype=bool)
        for group in q.equal_positions:
            missing = [f for f in group if f not in conds]
            if missing:
                raise QueryError(
                    f"equal_position fields must have AND conditions: "
                    f"{missing}")
            per_field = []
            for f in group:
                vals = [None if d is None else get_json_path(d, f)
                        for d in docs]
                per_field.append([v if isinstance(v, list) else [v]
                                  for v in vals])
            n_pos = np.fromiter(
                (min(len(per_field[fi][i]) for fi in range(len(group)))
                 if keep[i] else 0 for i in range(R)),
                dtype=np.int64, count=R)
            ok = np.zeros(R, dtype=bool)
            for j in range(int(n_pos.max()) if R else 0):
                act = n_pos > j
                if not act.any():
                    break
                pos_ok = act.copy()
                for fi, f in enumerate(group):
                    colv = [per_field[fi][i][j] if act[i] else None
                            for i in range(R)]
                    pos_ok &= raw_values_mask(colv, conds[f].condition,
                                              list(conds[f].values))
                ok |= pos_ok
            keep &= ok
        return rows[keep]

    # ==================================================================
    # joins
    # ==================================================================
    def _join_matches(self, ns: Namespace, jq: JoinedQuery,
                      need_matches: bool,
                      only_rows: Optional[np.ndarray] = None,
                      ) -> tuple[np.ndarray, dict[int, list[int]]]:
        """Evaluate a join: boolean mask over main-ns rows + per-row matched
        joined rows (reference: joins/items_processor, preselect strategy)."""
        check_cancel()
        joined_ns = self.db.get_namespace(jq.query.namespace)
        # preselect the joined namespace with its own filters; the preselect
        # rows + hash table are cached until the joined ns changes
        # (reference: JoinCache/JoinPreResult, core/joincache.h)
        with joined_ns.lock:
            join_cache = self._ns_cache(joined_ns, "join_preselect_cache")
            on_key = tuple((c.op, c.condition, c.left_field, c.right_field)
                           for c in jq.on)
            # cheap tuple key for plain-conjunction joined queries (the
            # JSON fingerprint costs more than the probe itself); the
            # preselect only consumes entries, so the key only needs them
            jkey = None
            ent_key: list = []
            for jop, je in jq.query.entries:
                if type(je) is not QueryEntry:
                    ent_key = None
                    break
                ent_key.append((jop, je.field, je.condition,
                                tuple(je.values)))
            if ent_key is not None:
                jkey = (jq.query.namespace, tuple(ent_key), on_key)
                try:
                    hash(jkey)
                except TypeError:
                    jkey = None
            if jkey is None:
                jkey = (self._query_fingerprint(jq.query), on_key)
            cached = join_cache.get(jkey)
            if cached is not None and cached["version"] != joined_ns.version:
                cached = None
            if cached is None:
                j_exists = joined_ns.exists_mask()
                j_mask, _ = self._eval_entries(joined_ns, jq.query.entries,
                                               jq.query, j_exists, [])
                j_mask &= j_exists
                cached = {"version": joined_ns.version,
                          "j_rows": np.flatnonzero(j_mask), "j_keys": None}
                if len(join_cache) >= 128:
                    join_cache.clear()
                join_cache[jkey] = cached
            j_rows = cached["j_rows"]

            cap = ns.rows_capacity
            mask = np.zeros(cap, dtype=np.bool_)
            matches: dict[int, list[int]] = {}
            if len(j_rows) == 0 or not jq.on:
                return mask, matches

            main_rows = (only_rows if only_rows is not None
                         else np.arange(cap, dtype=np.int64))

            # fast path: all-EQ AND on-conditions -> hash probe
            all_eq_and = all(c.condition == CondType.EQ and c.op == OpType.AND
                             for c in jq.on)
            if all_eq_and:
                vec = self._join_eq_vectorized(ns, joined_ns, jq, main_rows,
                                               j_rows, mask, need_matches)
                if vec is not None:
                    return vec
                j_keys = cached["j_keys"]
                if j_keys is None:
                    j_keys = {}
                    for jrow in j_rows:
                        jdoc = joined_ns.get_item(int(jrow))
                        if jdoc is None:
                            continue
                        for key in self._join_key_variants(jdoc, jq, "right"):
                            j_keys.setdefault(key, []).append(int(jrow))
                    cached["j_keys"] = j_keys
                for row in main_rows:
                    doc = ns.get_item(int(row))
                    if doc is None:
                        continue
                    if not need_matches:
                        for key in self._join_key_variants(doc, jq, "left"):
                            if j_keys.get(key):
                                mask[row] = True
                                break
                        continue
                    hit: list = []
                    seen: set = set()
                    for key in self._join_key_variants(doc, jq, "left"):
                        for r in j_keys.get(key, ()):
                            if r not in seen:
                                seen.add(r)
                                hit.append(r)
                    if hit:
                        mask[row] = True
                        matches[int(row)] = hit
                return mask, matches

            # general path — numeric ON-conditions evaluate as chunked
            # [rows, j_rows] numpy broadcasts (the vectorized equivalent of
            # the reference's joined-row comparator scan,
            # selectiteratorcontainer.cc); non-numeric values fall back to
            # the per-pair loop
            docs = [ns.get_item(int(r)) for r in main_rows]
            jdocs = [joined_ns.get_item(int(r)) for r in j_rows]
            if all(c.condition in _NUM_JOIN_OPS for c in jq.on):
                lcols = [_coerce_numeric(
                    [None if d is None else get_json_path(d, c.left_field)
                     for d in docs]) for c in jq.on]
                rcols = [_coerce_numeric(
                    [None if d is None else get_json_path(d, c.right_field)
                     for d in jdocs]) for c in jq.on]
                if all(a is not None for a in lcols + rcols):
                    CH = 256
                    for s0 in range(0, len(main_rows), CH):
                        sl = slice(s0, s0 + CH)
                        verdict = None
                        for ci, c in enumerate(jq.on):
                            a = lcols[ci][sl][:, None]
                            b = rcols[ci][None, :]
                            with np.errstate(invalid="ignore"):
                                m = _NUM_JOIN_OPS[c.condition](a, b)
                            m &= ~np.isnan(a) & ~np.isnan(rcols[ci])[None, :]
                            if verdict is None:
                                verdict = m
                            elif c.op == OpType.OR:
                                verdict |= m
                            else:
                                verdict &= m
                        hit_any = verdict.any(axis=1)
                        for k_i in np.flatnonzero(hit_any):
                            row = int(main_rows[s0 + k_i])
                            mask[row] = True
                            if need_matches:
                                matches[row] = [
                                    int(j_rows[j])
                                    for j in np.flatnonzero(verdict[k_i])]
                    return mask, matches

            ops = {CondType.EQ: lambda a, b: a == b,
                   CondType.LT: lambda a, b: a < b,
                   CondType.LE: lambda a, b: a <= b,
                   CondType.GT: lambda a, b: a > b,
                   CondType.GE: lambda a, b: a >= b,
                   CondType.SET: lambda a, b: a in b
                   if isinstance(b, (list, tuple)) else a == b}
            for mi, row in enumerate(main_rows):
                doc = docs[mi]
                if doc is None:
                    continue
                hit_rows = []
                for ji, jrow in enumerate(j_rows):
                    jdoc = jdocs[ji]
                    if jdoc is None:
                        continue
                    verdict: Optional[bool] = None
                    for c in jq.on:
                        a = get_json_path(doc, c.left_field)
                        b = get_json_path(jdoc, c.right_field)
                        try:
                            ok = (a is not None and b is not None
                                  and ops[c.condition](a, b))
                        except TypeError:
                            ok = False
                        if verdict is None:
                            verdict = ok
                        elif c.op == OpType.OR:
                            verdict = verdict or ok
                        else:
                            verdict = verdict and ok
                    if verdict:
                        hit_rows.append(int(jrow))
                        if not need_matches:
                            break
                if hit_rows:
                    mask[row] = True
                    if need_matches:
                        matches[int(row)] = hit_rows
            return mask, matches

    @staticmethod
    def _join_key(v: Any):
        if isinstance(v, list):
            return tuple(v)
        return v

    @staticmethod
    def _join_key_variants(doc: dict, jq: JoinedQuery, side: str) -> list:
        """All composite ON-key tuples a document contributes: array fields
        contribute one variant per ELEMENT (reference: the ON condition is
        injected into the joined query with the item's VariantArray values —
        CondSet semantics, joinedselector.cc — so `ON tags = gid` matches
        any element). An empty/missing array yields no variants (IN ()
        matches nothing); a missing scalar keeps the None key (None == None
        parity with the single-key path)."""
        parts = []
        for c in jq.on:
            v = get_json_path(doc, c.left_field if side == "left"
                              else c.right_field)
            if isinstance(v, (list, tuple)):
                if not v:
                    return []
                parts.append(list(dict.fromkeys(v)))
            else:
                parts.append([v])
        out = [()]
        for p in parts:
            out = [k + (x,) for k in out for x in p]
        return out

    def _join_eq_vectorized(self, ns: Namespace, joined_ns: Namespace,
                            jq: JoinedQuery, main_rows: np.ndarray,
                            j_rows: np.ndarray, mask: np.ndarray,
                            need_matches: bool):
        """Columnar EQ-join probe: zero per-row Python on the probe side.

        Replaces the get_item dict-walk hash probe with factorized column
        codes + a sort/searchsorted join (reference analog:
        joins/items_processor preselect — the reference probes its hash with
        indexed key values, not decoded documents). Returns None when a
        field lacks a scalar column or value kinds are incomparable (the
        dict fallback keeps full generality). Parity notes: deleted rows are
        excluded via exists masks; an UNSET field matches another UNSET
        field (code 0), matching the dict path's None == None behavior."""
        if len(jq.on) > 3:
            return None
        cols = []
        for c in jq.on:
            lc = ns.column_values(c.left_field)
            rc = joined_ns.column_values(c.right_field)
            if (lc is None or rc is None or lc.is_array or rc.is_array):
                return None
            lk = np.asarray(lc.values()).dtype.kind
            rk = np.asarray(rc.values()).dtype.kind
            num = "biuf"
            if not ((lk in num and rk in num) or lk == rk):
                return None
            cols.append((lc, rc, lk in num and rk in num))

        def at_rows(col, rows, numeric):
            # gather only at the candidate rows (the probe sets are tiny
            # next to the namespace; a capacity-wide materialization per
            # query was the join bench's wall). Values at unset rows are
            # never consulted — codes are only assigned where st is True.
            v = col.values()
            s = col.set_mask()
            in_r = rows < len(v)
            if not in_r.any():
                vals = (np.zeros(len(rows), dtype=np.float64) if numeric
                        else np.empty(len(rows), dtype=object))
                return vals, np.zeros(len(rows), dtype=np.bool_)
            safe = np.where(in_r, rows, 0)
            vals = v[safe]
            if numeric:
                vals = vals.astype(np.float64, copy=False)
            return vals, s[safe] & in_r

        lex = ns.exists_mask()
        lvalid = lex[main_rows]
        comb_l = np.zeros(len(main_rows), dtype=np.int64)
        comb_r = np.zeros(len(j_rows), dtype=np.int64)
        for (lc, rc, numeric) in cols:
            lv, ls = at_rows(lc, main_rows, numeric)
            rv, rs = at_rows(rc, j_rows, numeric)
            both = np.concatenate([lv[ls], rv[rs]])
            try:
                _, inv = np.unique(both, return_inverse=True)
            except TypeError:
                return None
            lcode = np.zeros(len(lv), dtype=np.int64)
            rcode = np.zeros(len(rv), dtype=np.int64)
            nl = int(ls.sum())
            lcode[ls] = inv[:nl] + 1
            rcode[rs] = inv[nl:] + 1
            width = (int(inv.max(initial=-1)) + 3)
            comb_l = comb_l * width + lcode
            comb_r = comb_r * width + rcode

        order = np.argsort(comb_r, kind="stable")
        r_sorted = comb_r[order]
        jr_sorted = j_rows[order]
        lo = np.searchsorted(r_sorted, comb_l, side="left")
        hi = np.searchsorted(r_sorted, comb_l, side="right")
        hit = (hi > lo) & lvalid
        mask[main_rows[hit]] = True
        matches: dict[int, list[int]] = {}
        if need_matches:
            for k_i in np.flatnonzero(hit):
                matches[int(main_rows[k_i])] = [
                    int(r) for r in jr_sorted[lo[k_i]:hi[k_i]]]
        return mask, matches

    def _attach_left_join(self, ns: Namespace, jq: JoinedQuery,
                          items: list[ResultItem]) -> None:
        if not items:
            return
        rows = np.asarray([it.row_id for it in items], dtype=np.int64)
        _, matches = self._join_matches(ns, jq, need_matches=True, only_rows=rows)
        joined_ns = self.db.get_namespace(jq.query.namespace)
        key = f"joined_{jq.query.namespace}"
        for it in items:
            hit = matches.get(it.row_id, [])
            if hit:
                docs = [joined_ns.get_item(r) for r in hit]
                it.joined[jq.query.namespace] = [d for d in docs if d is not None]

    # ==================================================================
    # sorting
    # ==================================================================
    def _sort_rows(self, ns: Namespace, q: Query, rows: np.ndarray,
                   sources: dict[str, RankSource],
                   ) -> tuple[np.ndarray, Optional[np.ndarray], str]:
        extra = getattr(q, "_extra_sources", None)
        if extra:
            sources = {**sources, **extra}
        evaluator = SortExprEvaluator(ns, rows, sources)
        ranks_arr: Optional[np.ndarray] = None

        # default rank array for with_rank() output
        if sources:
            if len(sources) == 1:
                src = next(iter(sources.values()))
                ranks_arr = src.rank_of(
                    rows, default=(np.inf if src.ordering == RankOrdering.ASC
                                   else -np.inf)).astype(np.float64)
            else:
                # hybrid: default fused rank is RRF (reference: hybrid.md —
                # RRF is the default rank_function)
                ranks_arr = evaluator.evaluate("RRF()")

        if not q.sorts:
            if sources:
                if len(sources) == 1:
                    src = next(iter(sources.values()))
                    key = src.score_key(rows)
                else:
                    key = ranks_arr
                order = np.argsort(-key, kind="stable")
                return rows[order], (ranks_arr[order] if ranks_arr is not None
                                     else None), "rank"
            return rows, None, "-"

        keys: list[np.ndarray] = []
        sort_names = []
        for se in q.sorts:
            expr = se.expression.strip()
            sort_names.append(expr + (" desc" if se.desc else ""))
            if se.forced_values:
                # forced sort order (reference: forcedSortOrder, sortexpression)
                forced_pos = {v: i for i, v in enumerate(se.forced_values)}
                col_vals = self._field_sort_values(ns, rows, expr)
                primary = np.asarray(
                    [forced_pos.get(v, len(forced_pos)) for v in col_vals],
                    dtype=np.int64)
                keys.append(primary)
            if evaluator.is_plain_field(expr):
                vals = self._field_sort_values(ns, rows, expr)
                key = self._encode_sort_key(vals)
            else:
                key = evaluator.evaluate(expr)
                if expr.upper().startswith("RRF") or "rank" in expr.lower():
                    # expose the fused/returned rank to the caller
                    ranks_arr = key.copy()
            keys.append(-key if se.desc else key)

        order = np.lexsort(tuple(reversed(keys)))
        return rows[order], (ranks_arr[order] if ranks_arr is not None else None), \
            ",".join(sort_names)

    def _field_sort_values(self, ns: Namespace, rows: np.ndarray,
                           field: str) -> list:
        col = ns.column_values(field)
        out = []
        if col is not None and not col.is_array:
            vals = col.values()
            s = col.set_mask()
            n = len(vals)
            for r in rows:
                ri = int(r)
                out.append(vals[ri] if ri < n and s[ri] else None)
            return out
        for r in rows:
            doc = ns.get_item(int(r))
            v = None if doc is None else get_json_path(doc, field)
            if isinstance(v, list):
                v = v[0] if v else None
            out.append(v)
        return out

    @staticmethod
    def _encode_sort_key(vals: list) -> np.ndarray:
        """Order-preserving numeric encoding of arbitrary column values
        (None sorts first, like the reference's null handling)."""
        if all(v is None or isinstance(v, (int, float, bool, np.number))
               for v in vals):
            return np.asarray(
                [float("-inf") if v is None else float(v) for v in vals],
                dtype=np.float64)
        svals = ["" if v is None else str(v) for v in vals]
        uniq, inv = np.unique(np.asarray(svals, dtype=object), return_inverse=True)
        return inv.astype(np.float64)

    # ==================================================================
    # aggregation (reference: cpp_src/core/nsselecter/aggregator.h)
    # ==================================================================
    def _aggregate(self, ns: Namespace, rows: np.ndarray,
                   agg) -> AggregationResult:
        result = AggregationResult(agg.agg_type.value, agg.fields)
        if agg.agg_type in (AggType.COUNT, AggType.COUNT_CACHED):
            result.value = float(len(rows))
            return result
        if agg.agg_type == AggType.DISTINCT:
            seen = []
            seen_set = set()
            for v in self._gather_field(ns, rows, agg.fields[0]):
                for x in (v if isinstance(v, list) else [v]):
                    if x is not None and x not in seen_set:
                        seen_set.add(x)
                        seen.append(x)
            result.distincts = seen
            return result
        if agg.agg_type == AggType.FACET:
            counts: dict[tuple, int] = {}
            per_field = [self._gather_field(ns, rows, f) for f in agg.fields]
            multi = len(agg.fields) > 1
            for i in range(len(rows)):
                vals = [pf[i] for pf in per_field]
                if multi and any(isinstance(v, list) for v in vals):
                    raise QueryError(
                        "multifield facet cannot be applied to array fields")
                if not multi and isinstance(vals[0], list):
                    for x in vals[0]:
                        counts[(x,)] = counts.get((x,), 0) + 1
                    continue
                key = tuple(vals)
                if any(v is None for v in key):
                    continue
                counts[key] = counts.get(key, 0) + 1
            facets = [FacetResult(k, c) for k, c in counts.items()]
            facets = self._sort_facets(facets, agg)
            off = agg.offset
            lim = len(facets) if agg.limit < 0 else agg.limit
            result.facets = facets[off:off + lim]
            return result
        # sum/avg/min/max
        nums: list[float] = []
        for v in self._gather_field(ns, rows, agg.fields[0]):
            for x in (v if isinstance(v, list) else [v]):
                if x is not None:
                    try:
                        nums.append(float(x))
                    except (TypeError, ValueError):
                        pass
        if agg.agg_type == AggType.SUM:
            result.value = float(np.sum(nums)) if nums else 0.0
        elif agg.agg_type == AggType.AVG:
            result.value = float(np.mean(nums)) if nums else 0.0
        elif agg.agg_type == AggType.MIN:
            result.value = float(np.min(nums)) if nums else None
        elif agg.agg_type == AggType.MAX:
            result.value = float(np.max(nums)) if nums else None
        return result

    def _sort_facets(self, facets: list[FacetResult], agg) -> list[FacetResult]:
        if not agg.sort:
            return sorted(facets, key=lambda f: -f.count)
        for se in reversed(agg.sort):
            expr = se.expression.strip()
            if expr == "count":
                facets.sort(key=lambda f: f.count, reverse=se.desc)
            else:
                try:
                    fi = agg.fields.index(expr)
                except ValueError:
                    raise QueryError(f"facet sort field '{expr}' not in facet fields")
                facets.sort(key=lambda f: (f.values[fi] is None, f.values[fi]),
                            reverse=se.desc)
        return facets

    def _gather_field(self, ns: Namespace, rows: np.ndarray, field: str) -> list:
        col = ns.column_values(field)
        out = []
        if col is not None:
            vals = col.values()
            s = col.set_mask()
            n = len(vals)
            for r in rows:
                ri = int(r)
                if ri < n and s[ri]:
                    v = vals[ri]
                    out.append(list(v) if isinstance(v, np.ndarray) else v)
                else:
                    out.append(None)
            return out
        for r in rows:
            doc = ns.get_item(int(r))
            out.append(None if doc is None else get_json_path(doc, field))
        return out

    def _distinct_filter(self, ns: Namespace, rows: np.ndarray,
                         fields: tuple[str, ...]) -> np.ndarray:
        """Keep the first row per distinct value (reference: distinct returns
        one item per distinct key)."""
        seen: set = set()
        keep = []
        per_field = [self._gather_field(ns, rows, f) for f in fields]
        for i, r in enumerate(rows):
            vals = tuple(tuple(v) if isinstance(v, list) else v
                         for v in (pf[i] for pf in per_field))
            if vals in seen:
                continue
            seen.add(vals)
            keep.append(r)
        return np.asarray(keep, dtype=np.int64)

    # ==================================================================
    # projection / select functions
    # ==================================================================
    @staticmethod
    def _excluded_vector_paths(ns: Namespace, q: Query) -> set:
        """Top-level json paths of float-vector indexes to strip from
        output (reference: FieldsFilter vector exclusion)."""
        sf = set(q.select_filter)
        if "vectors()" in sf:
            return set()
        out = set()
        for idef in ns.payload_type.indexes:
            if idef.is_vector:
                for p in idef.json_paths:
                    top = p.split(".")[0]
                    if p not in sf and top not in sf:
                        out.add(top)
        return out

    @staticmethod
    def _project(doc: dict, select_filter: tuple[str, ...]) -> dict:
        # "vectors()" is an include-vectors directive (float_vector.md:
        # 389-421), not a projection field — alone it means "all fields
        # plus vectors"
        select_filter = tuple(f for f in select_filter if f != "vectors()")
        if not select_filter or "*" in select_filter:
            return doc
        out: dict = {}
        for f in select_filter:
            v = get_json_path(doc, f)
            if v is not None:
                set_json_path(out, f, v)
        return out

    def _apply_select_functions(self, ns: Namespace, q: Query,
                                items: list[ResultItem],
                                sources: dict[str, RankSource]) -> None:
        import copy
        from ..ft.functions import apply_select_function
        # select functions rewrite result docs in place — detach them from
        # the namespace's stored documents first, or a highlight() would
        # permanently corrupt storage (reference renders into the result
        # payload, never the item store)
        for it in items:
            it.doc = copy.deepcopy(it.doc)
        for fn in q.select_functions:
            apply_select_function(ns, fn, items, sources)

    # ==================================================================
    # UPDATE / DELETE queries (reference: ReindexerImpl::Update/Delete(Query))
    # ==================================================================
    def _matched_rows(self, q: Query) -> tuple[Namespace, np.ndarray]:
        ns = self.db.get_namespace(q.namespace)
        exists = ns.exists_mask()
        rows = self._fast_and_rows(ns, q, exists)
        if rows is None:
            rows = self._fast_or_rows(ns, q, exists)
        if rows is None:
            mask, _ = self._eval_entries(ns, q.entries, q, exists, [])
            mask = mask & exists
            rows = np.flatnonzero(mask).astype(np.int64)
        if q.sorts or q.offset_ or q.limit_ is not None:
            rows, _, _ = self._sort_rows(ns, q, rows, {})
            lo = q.offset_
            hi = len(rows) if q.limit_ is None else min(len(rows), lo + q.limit_)
            rows = rows[lo:hi]
        return ns, rows

    def update(self, q: Query) -> QueryResults:
        ns, rows = self._matched_rows(q)
        items: list[ResultItem] = []
        with ns.lock:
            for row in rows:
                doc = ns.get_item(int(row))
                if doc is None:
                    continue
                new_doc = dict(doc)
                for ue in q.update_entries:
                    self._apply_update_entry(ns, new_doc, ue, int(row))
                ns.upsert(new_doc)
                items.append(ResultItem(doc=new_doc, row_id=int(row),
                                        ns_name=ns.name))
        return QueryResults(ns_name=ns.name, items=items, total_count=len(items))

    def _apply_update_entry(self, ns: Namespace, doc: dict, ue: UpdateEntry,
                            row: int) -> None:
        if ue.mode == "drop":
            parts = ue.field.split(".")
            cur = doc
            for p in parts[:-1]:
                cur = cur.get(p) if isinstance(cur, dict) else None
                if cur is None:
                    return
            if isinstance(cur, dict):
                cur.pop(parts[-1], None)
            return
        if ue.mode == "set_expression":
            expr = str(ue.values[0]).strip()
            fm = _precepts._FUNC_RE.match(expr)
            if fm and fm.group("name").lower() in ("now", "serial"):
                # atomic on-update functions in UPDATE ... SET
                # (reference: function.cc:27-30 via ExpressionEvaluator)
                args = [a.strip() for a in fm.group("args").split(",")
                        if a.strip()]
                val = _precepts.eval_function(
                    ns, fm.group("name").lower(), args, ue.field)
                set_json_path(doc, ue.field, val)
                return
            evaluator = SortExprEvaluator(ns, np.asarray([row]), {})
            val = float(evaluator.evaluate(str(ue.values[0]))[0])
            if val.is_integer():
                val = int(val)
            set_json_path(doc, ue.field, val)
            return
        value = list(ue.values) if ue.is_array else ue.values[0]
        set_json_path(doc, ue.field, value)

    def delete(self, q: Query) -> int:
        ns, rows = self._matched_rows(q)
        with ns.lock:
            for row in rows:
                ns.delete_row(int(row))
        return len(rows)
