"""Database facade — the embedded engine entry point.

Semantic equivalent of the reference `Reindexer` / `ReindexerImpl`
(cpp_src/core/reindexer.h:73-207, reindexer_impl/reindexerimpl.cc): namespace
registry, item CRUD wrappers, query execution, transactions, metadata, the
system namespaces (#namespaces/#memstats/#perfstats/#config/...,
cpp_src/core/system_ns_names.h:7-16), dynamic config, and the embedders hook
for query auto-embedding (reindexerimpl.cc:1231 embedQuery).
"""
from __future__ import annotations

import threading
import time
from typing import Any, Iterable, Optional, Sequence, Union

import numpy as np

from .errors import NotFoundError, ParamsError, QueryError
from .namespace import Namespace
from .payload import IndexDef
from .transaction import Transaction
from ..query.executor import Selecter
from ..query.query import Query
from ..query.results import QueryResults, ResultItem

SYSTEM_NS = ("#namespaces", "#memstats", "#perfstats", "#queriesperfstats",
             "#config", "#activitystats", "#clientsstats", "#replicationstats")

DEFAULT_CONFIG = {
    # profiling stats default OFF, matching the reference
    # (dbconfig.h:72-75, kDefProfilingConfig in defnsconfigs.h) — enable
    # via a #config upsert like the reference's own tests do
    "profiling": {
        "queriesperfstats": False,
        "perfstats": False,
        "memstats": True,
        "activitystats": False,
        "long_queries_logging": {
            "select": {"threshold_us": -1, "normalized": False},
            "update_delete": {"threshold_us": -1, "normalized": False},
            "transaction": {"threshold_total_us": -1, "threshold_avg_step_us": -1},
        },
    },
    "namespaces": [],
    "replication": {"server_id": 0, "cluster_id": 1},
    "async_replication": {"role": "none", "nodes": []},
    "embedders": [],
}


class Reindexer:
    """Embedded database engine.

    Usage:
        db = Reindexer()                      # in-memory
        db = Reindexer("/path/to/storage")    # persistent
        db.open_namespace("items", [IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))])
        db.upsert("items", {"id": 1, "name": "x"})
        res = db.select(Query("items").where("id", "=", 1))
    """

    def __init__(self, dsn: str = "", storage=None, mesh=None):
        """mesh: a jax.sharding.Mesh or parallel.context.MeshContext. When
        given, the database runs MESH-RESIDENT: every mesh-aware index the
        namespaces create keeps its device state row-sharded over the mesh
        and executes selects as shard_map programs with ICI collective
        merges — the TPU-native ShardingProxy (reference:
        cpp_src/core/shardingproxy.cc proxies every API call; here the
        proxy is placement, the API is unchanged)."""
        self.mesh_ctx = None
        if mesh is not None:
            from ..parallel.context import MeshContext
            self.mesh_ctx = (mesh if isinstance(mesh, MeshContext)
                             else MeshContext(mesh))
        self._namespaces: dict[str, Namespace] = {}
        self._lock = threading.RLock()
        self._selecter = Selecter(self)
        self._config = {k: (dict(v) if isinstance(v, dict) else list(v))
                        for k, v in DEFAULT_CONFIG.items()}
        self._embedders: dict[str, Any] = {}
        # cache_tag -> ({text: vector}, {text: request count})
        self._embed_caches: dict[str, tuple[dict, dict]] = {}
        self._activity: list[dict] = []
        # per-normalized-query latency stats (reference: #queriesperfstats,
        # core/queryperfstat.h — queries aggregate under a values-stripped
        # normalization)
        self._queries_perf: dict[str, dict] = {}
        # background TTL expiry (reference: TtlIndex expiry thread,
        # core/index/ttlindex.cc) — started lazily on the first TTL index
        self._ttl_stop = threading.Event()
        self._ttl_thread: Optional[threading.Thread] = None
        self.storage = storage
        if dsn and storage is None:
            from ..storage.engine import open_storage
            self.storage = open_storage(dsn)
        if self.storage is not None:
            self._load_from_storage()

    # ------------------------------------------------------------------
    # namespace lifecycle (reference: reindexer.h OpenNamespace/AddNamespace/...)
    # ------------------------------------------------------------------
    def open_namespace(self, name: str,
                       indexes: Sequence[IndexDef] = ()) -> Namespace:
        with self._lock:
            ns = self._namespaces.get(name)
            if ns is None:
                if name.startswith("#"):
                    raise ParamsError("'#' namespace names are reserved")
                ns = Namespace(name, mesh_ctx=self.mesh_ctx)
                self._namespaces[name] = ns
                if self.storage is not None:
                    self.storage.attach_namespace(ns)
            for idef in indexes:
                ns.add_index(idef)
                if idef.opts.expire_after:
                    self._ensure_ttl_thread()
            return ns

    add_namespace = open_namespace

    # ------------------------------------------------------------------
    # background TTL expiry (reference: TTL index expiry thread)
    # ------------------------------------------------------------------
    def _ensure_ttl_thread(self) -> None:
        if self._ttl_thread is not None and self._ttl_thread.is_alive():
            return
        self._ttl_thread = threading.Thread(
            target=self._ttl_loop, name="rx-ttl", daemon=True)
        self._ttl_thread.start()

    def _ttl_loop(self) -> None:
        while not self._ttl_stop.wait(float(
                self._config.get("ttl_poll_interval_sec", 1.0))):
            for ns in list(self._namespaces.values()):
                try:
                    ns.collect_expired()
                except Exception:      # expiry must never kill the daemon
                    pass

    def close_namespace(self, name: str) -> None:
        with self._lock:
            if name not in self._namespaces:
                raise NotFoundError(f"namespace '{name}' not found")
            if self.storage is not None:
                self.storage.flush_namespace(self._namespaces[name])
            del self._namespaces[name]

    def drop_namespace(self, name: str) -> None:
        with self._lock:
            ns = self._namespaces.pop(name, None)
            if ns is None:
                raise NotFoundError(f"namespace '{name}' not found")
            if self.storage is not None:
                self.storage.drop_namespace(name)

    def truncate_namespace(self, name: str) -> None:
        self.get_namespace(name).truncate()

    def rename_namespace(self, src: str, dst: str) -> None:
        with self._lock:
            ns = self._namespaces.pop(src, None)
            if ns is None:
                raise NotFoundError(f"namespace '{src}' not found")
            ns.name = dst
            ns.payload_type.name = dst
            self._namespaces[dst] = ns
            if self.storage is not None:
                self.storage.rename_namespace(src, dst)

    def get_namespace(self, name: str) -> Namespace:
        if name.startswith("#"):
            return self._system_namespace(name)
        ns = self._namespaces.get(name)
        if ns is None:
            raise NotFoundError(f"namespace '{name}' not found")
        return ns

    def namespace_names(self) -> list[str]:
        return list(self._namespaces.keys())

    # ------------------------------------------------------------------
    # index management
    # ------------------------------------------------------------------
    def add_index(self, ns_name: str, idef: IndexDef) -> None:
        self.get_namespace(ns_name).add_index(idef)
        if idef.opts.expire_after:
            self._ensure_ttl_thread()

    def update_index(self, ns_name: str, idef: IndexDef) -> None:
        self.get_namespace(ns_name).update_index(idef)

    def drop_index(self, ns_name: str, index_name: str) -> None:
        self.get_namespace(ns_name).drop_index(index_name)

    def set_schema(self, ns_name: str, schema: dict) -> None:
        self.get_namespace(ns_name).schema = schema

    # ------------------------------------------------------------------
    # item CRUD (reference: reindexer.h Insert/Update/Upsert/Delete)
    # ------------------------------------------------------------------
    def insert(self, ns_name: str, doc: dict,
               precepts: Optional[list[str]] = None) -> int:
        doc = self._embed_upsert(ns_name, doc, precepts)
        return self.get_namespace(ns_name).upsert(doc, mode="insert",
                                                  precepts=precepts)

    def update(self, ns_name: str, doc: dict,
               precepts: Optional[list[str]] = None) -> int:
        doc = self._embed_upsert(ns_name, doc, precepts)
        return self.get_namespace(ns_name).upsert(doc, mode="update",
                                                  precepts=precepts)

    def upsert(self, ns_name: str, doc: dict,
               precepts: Optional[list[str]] = None) -> int:
        if ns_name == "#config":
            # dynamic config application (reference: #config watcher,
            # core/dbconfig.cc — upserting a typed section applies it)
            section = doc.get("type")
            if section and section in doc:
                self.update_config(section, doc[section])
                self._apply_config_actions(section, doc[section])
                return 0
            raise ParamsError("#config document requires a 'type' section")
        doc = self._embed_upsert(ns_name, doc, precepts)
        return self.get_namespace(ns_name).upsert(doc, mode="upsert",
                                                  precepts=precepts)

    def _apply_config_actions(self, section: str, value: Any) -> None:
        """`action` commands (reference: float_vector.md:741-799)."""
        if section != "action":
            return
        cmd = value.get("command") if isinstance(value, dict) else None
        if cmd == "rebuild_ivf_index":
            ns = self.get_namespace(value["namespace"])
            ix = ns.get_index(value["index"])
            if ix is not None and hasattr(ix, "rebuild_centroids"):
                ix.rebuild_centroids()
        elif cmd == "drop_ann_storage_cache":
            if self.storage is not None and hasattr(self.storage, "ann_cache"):
                self.storage.ann_cache.drop(value.get("namespace", ""),
                                            value.get("index"))
        elif cmd == "set_leader_node":
            # manual RAFT leadership transfer (reference: replication.md:498)
            node = getattr(self, "_cluster_node", None)
            if node is None:
                raise ParamsError(
                    "set_leader_node: this instance is not a cluster node")
            node.set_desired_leader(int(value["server_id"]))
        elif cmd == "clear_embedders_cache":
            # reference: float_vector.md:785-799
            self._clear_embedders_cache(value.get("cache_tag", "*"))
        elif cmd == "create_embeddings":
            # (re)embed existing documents (reference: float_vector.md:762-784)
            self._create_embeddings(value.get("namespace", "*"),
                                    int(value.get("batch_size", 100)))

    def delete(self, ns_name: str, doc: dict) -> bool:
        return self.get_namespace(ns_name).delete(doc)

    # ------------------------------------------------------------------
    # queries
    # ------------------------------------------------------------------
    def select(self, q: Union[Query, str],
               timeout_ms: Optional[float] = None,
               cancel=None) -> QueryResults:
        if timeout_ms is not None or cancel is not None:
            # per-query deadline/cancellation (reference: RdxContext,
            # core/rdxcontext.h; the cgo binding's ctx watcher)
            from . import rdxcontext
            with rdxcontext.context(timeout_ms=timeout_ms, cancel=cancel):
                return self.select(q)
        if isinstance(q, str):
            from ..query.sql import parse_sql
            q = parse_sql(q)
            if q.__dict__.get("_truncate"):
                self.truncate_namespace(q.namespace)
                return QueryResults(ns_name=q.namespace)
            if q.__dict__.get("_delete"):
                n = self._selecter.delete(q)
                return QueryResults(ns_name=q.namespace, total_count=n)
            if q.update_entries:
                return self._selecter.update(q)
        t0 = time.perf_counter()
        prof = self._config.get("profiling", {})
        act = None
        if prof.get("activitystats"):
            # the normalized text is derived lazily by the #activitystats
            # view: normalization costs more than a fast point select itself
            act = {"query": q, "namespace": q.namespace,
                   "state": "in_progress", "query_start": time.time(),
                   "client": "builtin"}
            self._activity.append(act)
        try:
            from .. import tracing
            if tracing.enabled():
                # span names mirror the Go connector's OTel spans
                # (reference: tracing.go:10-18 "Reindexer.Query")
                with tracing.span("Reindexer.Query",
                                  namespace=q.namespace):
                    res = self._selecter.select(q)
            else:
                res = self._selecter.select(q)
        finally:
            if act is not None:
                self._activity.remove(act)
        dt_us = (time.perf_counter() - t0) * 1e6
        # per-normalized-query latency stats (reference: #queriesperfstats,
        # queries aggregate under a values-stripped normalization)
        if prof.get("queriesperfstats"):
            key = self._normalize_query(q)
            st = self._queries_perf.get(key)
            if st is None:
                if len(self._queries_perf) >= 1024:
                    self._queries_perf.clear()
                st = self._queries_perf.setdefault(key, {
                    "total_queries_count": 0,
                    "total_avg_latency_us": 0.0,
                    "min_latency_us": dt_us,
                    "max_latency_us": 0.0})
            n = st["total_queries_count"]
            st["total_avg_latency_us"] = (
                (st["total_avg_latency_us"] * n + dt_us) / (n + 1))
            st["total_queries_count"] = n + 1
            st["min_latency_us"] = min(st["min_latency_us"], dt_us)
            st["max_latency_us"] = max(st["max_latency_us"], dt_us)
        # slow-query logging (reference: profiling.long_queries_logging,
        # tools/logginglongqueries.cc)
        thr = (prof.get("long_queries_logging", {})
               .get("select", {}).get("threshold_us", -1))
        if 0 <= thr < dt_us:
            import logging
            logging.getLogger("reindexer_tpu.slowlog").warning(
                "slow select on '%s': %.0f us (threshold %d us)",
                q.namespace, dt_us, thr)
        return res

    @staticmethod
    def _normalize_query(q) -> str:
        """Values-stripped query signature (reference: QueryPerfStat
        normalization — WHERE values become '?')."""
        from .type_consts import CondType, OpType
        parts = [f"SELECT FROM {q.namespace}"]
        for op, e in q.entries:
            f = getattr(e, "field", None) or type(e).__name__
            c = getattr(e, "condition", None)
            try:
                op_s, c_s = OpType(op).name, CondType(c).name
            except ValueError:
                op_s, c_s = str(op), str(c)
            parts.append(f"{op_s} {f} {c_s} ?")
        for s in getattr(q, "sorts", ()):
            parts.append(f"ORDER BY {getattr(s, 'expression', s)}")
        for a in getattr(q, "aggregations", ()):
            parts.append(f"AGG {getattr(a, 'agg_type', a)}")
        if q.limit_ is not None:
            parts.append("LIMIT ?")
        return " ".join(str(p) for p in parts)

    def knn_batch(self, ns_name: str, field: str, queries,
                  params) -> list[QueryResults]:
        """Batched KNN serving path: N query vectors answered by ONE device
        program (SURVEY.md §7 stage 8 — streaming arrivals fold into padded
        device batches; single-query selects cannot amortize dispatch)."""
        import numpy as np
        ns = self.get_namespace(ns_name)
        idef = ns.index_def(field)
        index = ns.get_index(field)
        if idef is None or not idef.is_vector or index is None:
            raise QueryError(f"'{field}' is not a float_vector index")
        # two-phase serving: the namespace lock covers only the device
        # DISPATCH (async through the tunnel); the blocking readback runs
        # unlocked so N concurrent clients overlap their device RTTs
        # (reference analog: per-connection coroutines never serialize the
        # server on one query, net/cproto/serverconnection.cc)
        with ns.lock:
            drain = index.select_batch_async(
                np.asarray(queries, dtype=np.float32), params)
        results = drain()
        with ns.lock:
            out = []
            for res in results:
                items = []
                for rid, rank in zip(res.ids, res.ranks
                                     if res.ranks is not None else []):
                    doc = ns.get_item(int(rid))
                    if doc is None:
                        continue
                    doc = {k: v for k, v in doc.items()
                           if ns.index_def(k) is None
                           or not ns.index_def(k).is_vector}
                    items.append(ResultItem(doc=doc, row_id=int(rid),
                                            rank=float(rank),
                                            ns_name=ns_name))
                out.append(QueryResults(ns_name=ns_name, items=items))
            return out

    def ft_batch(self, ns_name: str, field: str,
                 dsls: Sequence[str]) -> list[QueryResults]:
        """Batched full-text serving path: N DSL queries answered by ONE
        device program (ft/selector.process_batch) — the FT counterpart of
        knn_batch."""
        ns = self.get_namespace(ns_name)
        index = ns.get_index(field)
        from ..index.text import FullTextIndex
        if not isinstance(index, FullTextIndex):
            raise QueryError(f"'{field}' is not a full-text index")
        with ns.lock:
            index.commit()
            if index._steps or index._owner:
                # incremental delta present: the merging single-query path
                # handles overridden-row masking; batch per query
                from ..core.type_consts import CondType
                from ..ft.selector import FtSelectResult
                results = []
                for dsl in dsls:
                    r = index.select_key(CondType.EQ, (dsl,))
                    results.append(FtSelectResult(
                        r.ids, r.ranks, (r.aux or {}).get("matched_words",
                                                          set())))
            else:
                from ..ft.selector import FtSelector
                if index._selector is None:
                    index._selector = FtSelector(index.holder, index.cfg)
                # the committed holder is an immutable snapshot (rebuilds
                # replace the object) — release the namespace lock while
                # the batch scores so concurrent requests overlap device
                # dispatches and host merges (see Namespace.unlocked)
                sel = index._selector
                with ns.unlocked():
                    results = sel.process_batch(list(dsls))
            out = []
            for res in results:
                items = []
                for rid, rank in zip(res.ids, res.ranks):
                    doc = ns.get_item(int(rid))
                    if doc is None:
                        continue
                    items.append(ResultItem(doc=doc, row_id=int(rid),
                                            rank=float(rank),
                                            ns_name=ns_name))
                out.append(QueryResults(ns_name=ns_name, items=items))
            return out

    def update_query(self, q: Union[Query, str]) -> QueryResults:
        if isinstance(q, str):
            from ..query.sql import parse_sql
            q = parse_sql(q)
        return self._selecter.update(q)

    def delete_query(self, q: Union[Query, str]) -> int:
        if isinstance(q, str):
            from ..query.sql import parse_sql
            q = parse_sql(q)
        return self._selecter.delete(q)

    def explain(self, q: Query) -> dict:
        q.explain_ = True
        return self.select(q).explain or {}

    # ------------------------------------------------------------------
    # transactions
    # ------------------------------------------------------------------
    def new_transaction(self, ns_name: str) -> Transaction:
        self.get_namespace(ns_name)  # existence check
        return Transaction(self, ns_name)

    # ------------------------------------------------------------------
    # metadata
    # ------------------------------------------------------------------
    def put_meta(self, ns_name: str, key: str, value: str) -> None:
        self.get_namespace(ns_name).put_meta(key, value)

    def get_meta(self, ns_name: str, key: str) -> Optional[str]:
        return self.get_namespace(ns_name).get_meta(key)

    def enum_meta(self, ns_name: str) -> list[str]:
        return self.get_namespace(ns_name).enum_meta()

    def delete_meta(self, ns_name: str, key: str) -> None:
        self.get_namespace(ns_name).delete_meta(key)

    # ------------------------------------------------------------------
    # embedders (reference: core/embedding/embedder.cc; float_vector.md:98-150)
    # ------------------------------------------------------------------
    def register_embedder(self, tag: str, fn) -> None:
        """Register an embedding callable: fn(list[str]) -> list[vector].

        The reference calls an external HTTP embedder service; here any
        callable can serve (the HTTP connector in server/embedders.py builds
        one from an endpoint URL).
        """
        self._embedders[tag] = fn

    def _embed_cache_spec(self, tag: str) -> Optional[dict]:
        """#config type=embedders cache spec for a cache_tag; '*' matches
        any non-empty tag unless a specialization exists
        (reference: float_vector.md:229-287)."""
        if not tag:
            return None
        sect = self._config.get("embedders")
        caches = sect.get("caches", []) if isinstance(sect, dict) else \
            (sect if isinstance(sect, list) else [])
        spec = next((c for c in caches if c.get("cache_tag") == tag), None)
        if spec is None:
            spec = next((c for c in caches if c.get("cache_tag") == "*"),
                        None)
        return spec

    def _invoke_embedder(self, tag: str, fn, text: str):
        """One embedding call behind the hit_to_cache/max_cache_items
        result cache (reference: embedders cache, float_vector.md:229)."""
        spec = self._embed_cache_spec(tag)
        if not spec or not int(spec.get("max_cache_items", 1_000_000)):
            return fn([text])[0]
        cache, hits = self._embed_caches.setdefault(tag, ({}, {}))
        if text in cache:
            return cache[text]
        hit_to_cache = int(spec.get("hit_to_cache", 1))
        hits[text] = hits.get(text, 0) + 1
        vec = fn([text])[0]
        if hits[text] >= hit_to_cache:
            if len(cache) >= int(spec.get("max_cache_items", 1_000_000)):
                cache.pop(next(iter(cache)))
            cache[text] = vec
            hits.pop(text, None)
        return vec

    def _clear_embedders_cache(self, tag: str = "*") -> None:
        if tag == "*":
            self._embed_caches.clear()
        else:
            self._embed_caches.pop(tag, None)

    def _create_embeddings(self, target: str, batch_size: int = 100) -> None:
        """Run upsert embedders over EXISTING documents, batched through
        transactions (reference: create_embeddings action,
        float_vector.md:762-784; strategy rules apply per embedder)."""
        names = (list(self._namespaces) if target == "*" else [target])
        for name in names:
            ns = self._namespaces.get(name)
            if ns is None or not any(
                    d.vector_opts is not None
                    and d.vector_opts.embedding is not None
                    and d.vector_opts.embedding.fields
                    for d in ns.payload_type.indexes):
                continue
            with ns.lock:
                docs = [dict(doc) for doc in ns.items if doc is not None]
            tx = None
            pending = 0
            for doc in docs:
                try:
                    new = self._embed_upsert(name, doc)
                except ParamsError:
                    continue   # strict strategy on an already-filled vector
                if new is doc:
                    continue   # nothing embedded (strategy skipped it)
                if tx is None:
                    tx = self.new_transaction(name)
                tx.upsert(new)
                pending += 1
                if pending >= batch_size:
                    tx.commit()
                    tx, pending = None, 0
            if tx is not None:
                tx.commit()

    def embed_query(self, ns: Namespace, field: str, text: str) -> np.ndarray:
        idef = ns.index_def(field)
        if idef is None or idef.vector_opts is None or idef.vector_opts.embedding is None:
            raise QueryError(
                f"KNN by string requires an embedding config on index '{field}'")
        emb = idef.vector_opts.embedding
        fn = self._embedders.get(emb.cache_tag or emb.endpoint)
        if fn is None:
            from ..server.embedders import HttpEmbedder
            fn = HttpEmbedder(emb.endpoint)
            self._embedders[emb.cache_tag or emb.endpoint] = fn
        vec = self._invoke_embedder(emb.cache_tag, fn, text)
        return np.asarray(vec, dtype=np.float32)

    def _embed_upsert(self, ns_name: str, doc: dict,
                      precepts: Optional[list[str]] = None) -> dict:
        """Upsert-side auto-embedding (reference: embedder.cc upsert
        embedders; skip_embedding precepts per itemimpl.cc:555-575)."""
        ns = self._namespaces.get(ns_name)
        if ns is None:
            return doc
        from .payload import get_json_path, set_json_path
        from .precepts import skip_embedding_fields
        skip_all, skip_fields = skip_embedding_fields(precepts)
        if skip_all:
            return doc
        for idef in ns.payload_type.indexes:
            vo = idef.vector_opts
            if vo is None or vo.embedding is None or not vo.embedding.fields:
                continue
            if idef.name in skip_fields:
                continue
            emb = vo.embedding
            current = get_json_path(doc, idef.json_paths[0])
            if emb.strategy == "empty_only" and current:
                continue
            if emb.strategy == "strict" and current:
                # strict: the vector must come from the embedder only
                # (reference: float_vector.md embedding strategies)
                raise ParamsError(
                    f"index '{idef.name}' embedding strategy is 'strict': "
                    "documents must not carry the vector field")
            src = [str(get_json_path(doc, f) or "") for f in emb.fields]
            fn = self._embedders.get(emb.cache_tag or emb.endpoint)
            if fn is None:
                continue  # no embedder wired: leave the doc unchanged
            vec = self._invoke_embedder(emb.cache_tag, fn, " ".join(src))
            doc = dict(doc)
            set_json_path(doc, idef.json_paths[0], list(map(float, vec)))
        return doc

    # ------------------------------------------------------------------
    # config (reference: #config namespace, core/dbconfig.cc)
    # ------------------------------------------------------------------
    def get_config(self) -> dict:
        return self._config

    def update_config(self, section: str, value: Any) -> None:
        self._config[section] = value

    # ------------------------------------------------------------------
    # system namespaces (reference: reindexerimpl syncSystemNamespaces)
    # ------------------------------------------------------------------
    def _system_namespace(self, name: str) -> Namespace:
        ns = Namespace.__new__(Namespace)
        Namespace.__init__(ns, name="_sys_tmp")
        ns.name = name
        docs: list[dict] = []
        if name == "#namespaces":
            for n, real in self._namespaces.items():
                docs.append({"name": n,
                             "indexes": [d.to_dict() for d in real.index_defs()],
                             "items_count": real.item_count()})
        elif name == "#memstats":
            for n, real in self._namespaces.items():
                st = real.memstat()
                st["name"] = n
                docs.append(st)
        elif name == "#perfstats":
            for n, real in self._namespaces.items():
                row = {"name": n, **real.perf.stats()}
                # continuous-batching serving counters (query/dynbatch.py;
                # framework-native, no reference analog): how many device
                # dispatches the coalescer saved is batched_queries -
                # batched_dispatches
                batchers = getattr(real, "knn_batchers", None)
                if batchers:
                    row["batched_dispatches"] = sum(
                        b.batches for b in batchers.values())
                    row["batched_queries"] = sum(
                        b.queries for b in batchers.values())
                    row["max_coalesced_batch"] = max(
                        b.max_batch for b in batchers.values())
                docs.append(row)
        elif name == "#queriesperfstats":
            docs = [{"query": k, **v} for k, v in self._queries_perf.items()]
        elif name == "#config":
            for section, value in self._config.items():
                docs.append({"type": section, section: value})
        elif name == "#activitystats":
            docs = []
            for a in self._activity:
                d = dict(a)
                if not isinstance(d.get("query"), str):
                    d["query"] = self._normalize_query(d["query"])
                docs.append(d)
        elif name == "#clientsstats":
            # connected RPC clients (registered by net/rpc_server.py)
            docs = [dict(v) for v in getattr(self, "_clients", {}).values()]
        elif name == "#replicationstats":
            # leader-side stats when replication is active (reference:
            # #replicationstats, cluster/replication)
            state = getattr(self, "_replication_state", None)
            docs = []
            if state is not None:
                docs.append({
                    "type": "async",
                    "server_id": state.server_id,
                    "last_lsn": state.wal._next_lsn - 1,
                    "first_lsn": state.wal._first_lsn,
                    "wal_records": len(state.wal._records),
                    "namespaces": sorted(self._namespaces),
                })
            repl = getattr(self, "_async_replicator", None)
            if repl is not None:
                for node in getattr(repl, "nodes", []):
                    docs.append({"type": "node", **{
                        k: v for k, v in vars(node).items()
                        if isinstance(v, (str, int, float, bool))}})
        else:
            raise NotFoundError(f"unknown system namespace '{name}'")
        from .payload import IndexDef as _ID, IndexOpts as _IO
        from .type_consts import FieldType as _FT, IndexType as _IT
        # system ns rows are synthesized on the fly; no PK required for select
        for i, d in enumerate(docs):
            ns.items.append(d)
        return ns

    # ------------------------------------------------------------------
    # storage
    # ------------------------------------------------------------------
    def _load_from_storage(self) -> None:
        for name in self.storage.namespace_names():
            ns = Namespace(name, mesh_ctx=self.mesh_ctx)
            self._namespaces[name] = ns
            self.storage.load_namespace(ns)
            self.storage.attach_namespace(ns)
            if any(d.opts.expire_after for d in ns.index_defs()):
                self._ensure_ttl_thread()

    def flush(self) -> None:
        if self.storage is None:
            return
        for ns in self._namespaces.values():
            self.storage.flush_namespace(ns)

    def close(self) -> None:
        self._ttl_stop.set()
        if self._ttl_thread is not None:
            self._ttl_thread.join(timeout=2.0)
        self.flush()
        if self.storage is not None:
            self.storage.close()
