"""Namespace runtime — the "table" object.

Semantic equivalent of the reference `NamespaceImpl`
(cpp_src/core/namespace/namespaceimpl.h:133): owns the items array, the
index set, per-field columns, WAL hooks, TTL collection, metadata, and perf
counters. The modify pipeline mirrors `NamespaceImpl::modifyItem/doUpsert`
(namespaceimpl.cc:2545, :2321): PK lookup via the PK index, delete old index
values, write columns, insert new index values.

TPU-first twists vs the reference:
- indexed scalar fields live in vectorized numpy Columns (core/payload.py),
  so comparator fallback and sorting are batch ops, not per-row access;
- vector fields live in device arrays inside the vector index keeper, and
  mutations batch-flush to device (the analog of the reference's
  multithreaded tx vector inserter, namespace/tx_concurrent_inserter.h:160);
- readers are isolated by a version counter + RLock instead of shared/unique
  ns mutexes (P1 in SURVEY.md §2.4).
"""
from __future__ import annotations

import threading
import time
from contextlib import contextmanager
from typing import Any, Callable, Iterable, Optional

import numpy as np

from .errors import ConflictError, NotFoundError, ParamsError, QueryError
from .payload import (Column, IndexDef, PayloadType, get_json_path)
from .type_consts import CondType, FieldType, IndexType
from ..index.base import Index, SelectKeyResult
from ..index.factory import create_index
from ..index.scalar import TtlIndex


def _item_hash(doc: dict) -> int:
    """Stable 64-bit per-item checksum (reference: calculateItemChecksum /
    PayloadChecksum, namespaceimpl.cc:748 — XORed incrementally into the
    namespace dataHash). blake2b over canonical JSON so the hash is
    process- and insert-order-independent."""
    import hashlib
    import json
    blob = json.dumps(doc, sort_keys=True, separators=(",", ":"),
                      default=str).encode()
    return int.from_bytes(hashlib.blake2b(blob, digest_size=8).digest(),
                          "little")


class PerfCounters:
    """Per-namespace operation counters (reference: core/perfstatcounter.h)."""

    def __init__(self) -> None:
        self.counts: dict[str, int] = {}
        self.total_us: dict[str, float] = {}
        self.last_sec: dict[str, float] = {}

    def hit(self, op: str, dt_sec: float) -> None:
        self.counts[op] = self.counts.get(op, 0) + 1
        self.total_us[op] = self.total_us.get(op, 0.0) + dt_sec * 1e6

    def stats(self) -> dict:
        out = {}
        for op, cnt in self.counts.items():
            out[op] = {
                "total_queries_count": cnt,
                "total_avg_latency_us": self.total_us[op] / max(cnt, 1),
            }
        return out


class Namespace:
    def __init__(self, name: str, mesh_ctx=None):
        if not name or name.startswith("#"):
            # system namespaces are synthesized by the facade
            # (reference: system_ns_names.h)
            if not name:
                raise ParamsError("empty namespace name")
        self.name = name
        # device-mesh context (parallel/context.MeshContext): mesh-aware
        # indexes created under this namespace run mesh-resident (P8)
        self.mesh_ctx = mesh_ctx
        self.payload_type = PayloadType(name)
        self.indexes: list[Index] = []
        self.columns: dict[str, Column] = {}
        self.items: list[Optional[dict]] = []
        self.free_rows: list[int] = []
        self.meta: dict[str, str] = {}
        self.lock = threading.RLock()
        self.version = 0          # bumped on each mutation (reader snapshots)
        self.schema_version = 0   # bumped on index add/drop (metadata caches)
        # incremental XOR of per-item checksums (reference: repl_.dataHash,
        # namespaceimpl.cc:748,1968 — followers compare it against the
        # leader's to detect replication divergence cheaply)
        self.data_hash = 0
        self.perf = PerfCounters()
        self.schema: Optional[dict] = None  # JSON schema (reference SetSchema)
        # WAL observer hooks: fn(op, payload) — wired by storage/replication
        self.wal_hooks: list[Callable[[str, dict], None]] = []

    @contextmanager
    def unlocked(self):
        """Temporarily release ALL of this thread's holds on the namespace
        lock (and reacquire on exit). Used to overlap device round-trips in
        serving: device dispatch is async through the tunnel, so dropping
        the lock only for the blocking readback lets N concurrent clients
        pipeline their queries (the reference's per-connection coroutines
        never serialize the server on one query — cproto/serverconnection.cc).

        Isolation tradeoff (documented): while unlocked, a concurrent
        writer may commit, so a multi-condition query whose KNN drain sits
        inside the window reads at read-committed rather than per-query
        snapshot isolation. Every namespace accessor remains individually
        consistent (they take the lock internally). Disable with
        RX_TPU_OVERLAP_DEVICE_WAITS=0 to restore full query isolation."""
        import os
        if os.environ.get("RX_TPU_OVERLAP_DEVICE_WAITS", "1") in ("0",
                                                                  "false"):
            yield
            return
        n = 0
        try:
            while True:
                self.lock.release()
                n += 1
        except RuntimeError:
            pass
        try:
            yield
        finally:
            for _ in range(n):
                self.lock.acquire()

    # ------------------------------------------------------------------
    # index management (reference: NamespaceImpl::AddIndex/DropIndex/UpdateIndex)
    # ------------------------------------------------------------------
    def add_index(self, idef: IndexDef) -> None:
        with self.lock:
            if idef.name in self.payload_type:
                existing = self.payload_type.indexes[
                    self.payload_type.field_pos(idef.name)]
                if existing.to_dict() == idef.to_dict():
                    return  # idempotent re-add of identical def
                raise ConflictError(
                    f"index '{idef.name}' already exists with different definition")
            if idef.opts.is_pk and self.payload_type.pk_index() is not None:
                raise ConflictError(f"namespace '{self.name}' already has a PK index")
            self.payload_type.add(idef)
            index = create_index(idef, mesh_ctx=self.mesh_ctx)
            self.indexes.append(index)
            if not idef.is_vector and not idef.is_composite:
                col = Column(idef.field_type, idef.opts.is_array)
                self.columns[idef.name] = col
            # backfill from existing items
            for row, doc in enumerate(self.items):
                if doc is None:
                    continue
                vals = self._extract_values(doc, idef)
                self._set_column(idef, row, vals)
                index.upsert(row, vals)
            self._wal("add_index", idef.to_dict())
            self.version += 1
            self.schema_version += 1

    def update_index(self, idef: IndexDef) -> None:
        with self.lock:
            if idef.name not in self.payload_type:
                raise NotFoundError(f"index '{idef.name}' not found")
            self.drop_index(idef.name)
            self.add_index(idef)

    def drop_index(self, name: str) -> None:
        with self.lock:
            pos = self.payload_type.field_pos(name)
            if pos is None:
                raise NotFoundError(f"index '{name}' not found in ns '{self.name}'")
            if self.payload_type.indexes[pos].opts.is_pk:
                raise ParamsError("cannot drop PK index")
            self.payload_type.drop(name)
            self.indexes.pop(pos)
            self.columns.pop(name, None)
            self._wal("drop_index", {"name": name})
            self.version += 1
            self.schema_version += 1

    def index_defs(self) -> list[IndexDef]:
        return list(self.payload_type.indexes)

    def get_index(self, name: str) -> Optional[Index]:
        pos = self.payload_type.field_pos(name)
        return self.indexes[pos] if pos is not None else None

    def index_def(self, name: str) -> Optional[IndexDef]:
        pos = self.payload_type.field_pos(name)
        return self.payload_type.indexes[pos] if pos is not None else None

    # ------------------------------------------------------------------
    # item CRUD (reference: NamespaceImpl::modifyItem, namespaceimpl.cc:2545)
    # ------------------------------------------------------------------
    def _pk(self) -> tuple[int, IndexDef]:
        c = getattr(self, "_pk_cache", None)
        if c is not None and c[0] == self.schema_version:
            return c[1], c[2]
        pk = self.payload_type.pk_index()
        if pk is None:
            raise ParamsError(f"namespace '{self.name}' has no PK index")
        pos = self.payload_type.field_pos(pk.name)
        self._pk_cache = (self.schema_version, pos, pk)
        return pos, pk  # type: ignore[return-value]

    def _extract_values(self, doc: dict, idef: IndexDef) -> Any:
        if idef.is_composite:
            return tuple(get_json_path(doc, p) for p in idef.json_paths)
        vals: list = []
        for path in idef.json_paths:
            v = get_json_path(doc, path)
            if v is None:
                continue
            if isinstance(v, list) and not idef.is_vector:
                vals.extend(v)
            else:
                vals.append(v)
        if idef.is_vector:
            return vals[0] if vals else None
        if idef.is_fulltext:
            # per-field texts aligned with json_paths ("" for missing fields)
            # so the FT engine can attribute postings to fields correctly
            texts: list = []
            for path in idef.json_paths:
                v = get_json_path(doc, path)
                if v is None:
                    texts.append("")
                elif isinstance(v, list):
                    texts.append(" ".join(str(x) for x in v if x is not None))
                else:
                    texts.append(str(v))
            return texts
        if not vals:
            return None
        return vals if (idef.opts.is_array or len(vals) > 1) else vals[0]

    def _set_column(self, idef: IndexDef, row: int, vals: Any) -> None:
        col = self.columns.get(idef.name)
        if col is not None:
            col.set_row(row, vals)

    def find_by_pk(self, pk_value: Any) -> Optional[int]:
        pos, pkdef = self._pk()
        index = self.indexes[pos]
        first = getattr(index, "first_row", None)
        if first is not None:
            return first(pk_value)
        res = index.select_key(CondType.EQ, (pk_value,))
        if len(res.ids) == 0:
            return None
        return int(res.ids[0])

    def _row_of(self, doc: dict) -> tuple[Optional[int], Any]:
        _, pkdef = self._pk()
        pk_val = get_json_path(doc, pkdef.json_paths[0])
        if pk_val is None:
            raise QueryError(f"document misses PK field '{pkdef.json_paths[0]}'")
        return self.find_by_pk(pk_val), pk_val

    def upsert(self, doc: dict, mode: str = "upsert",
               precepts: Optional[list[str]] = None) -> int:
        """mode: upsert | insert | update (reference: ModifyMode).

        `precepts` are atomic on-update functions evaluated under the
        namespace lock (reference: setFieldsBasedOnPrecepts,
        namespaceimpl.cc:4191); computed values are written back into
        the caller's doc, matching the reference's item write-back."""
        t0 = time.perf_counter()
        with self.lock:
            if precepts:
                from .precepts import apply_precepts
                apply_precepts(self, doc, precepts)
            row, _ = self._row_of(doc)
            if mode == "insert" and row is not None:
                raise ConflictError("item already exists")
            if mode == "update" and row is None:
                raise NotFoundError("item not found")
            if row is None:
                row = self.free_rows.pop() if self.free_rows else len(self.items)
                if row == len(self.items):
                    self.items.append(None)
            else:
                self._delete_row_from_indexes(row)
            for idef, index in zip(self.payload_type.indexes, self.indexes):
                vals = self._extract_values(doc, idef)
                self._set_column(idef, row, vals)
                index.upsert(row, vals)
            if self.items[row] is not None:
                self.data_hash ^= _item_hash(self.items[row])
            self.data_hash ^= _item_hash(doc)
            self.items[row] = doc
            self.version += 1
            if self.wal_hooks:
                self._wal("upsert", {"row": row, "doc": doc})
            self.perf.hit("updates", time.perf_counter() - t0)
            return row

    def _delete_row_from_indexes(self, row: int) -> None:
        old = self.items[row]
        if old is None:
            return
        for idef, index in zip(self.payload_type.indexes, self.indexes):
            index.delete(row, self._extract_values(old, idef))

    def delete(self, doc: dict) -> bool:
        t0 = time.perf_counter()
        with self.lock:
            row, _ = self._row_of(doc)
            if row is None:
                return False
            self.delete_row(row)
            self.perf.hit("updates", time.perf_counter() - t0)
            return True

    def delete_row(self, row: int) -> None:
        with self.lock:
            if row >= len(self.items) or self.items[row] is None:
                return
            old_doc = self.items[row]
            self._delete_row_from_indexes(row)
            self.data_hash ^= _item_hash(old_doc)
            self.items[row] = None
            self.free_rows.append(row)
            self.version += 1
            # WAL carries the document so replay is row-id independent
            # (reference WAL records are LSN/PK addressed, wal/walrecord.h)
            self._wal("delete", {"row": row, "doc": old_doc})

    def truncate(self) -> None:
        with self.lock:
            self.items.clear()
            self.free_rows.clear()
            for index in self.indexes:
                index.clear()
            for col in self.columns.values():
                col.size = 0
            self.data_hash = 0
            self.version += 1
            self._wal("truncate", {})

    # ------------------------------------------------------------------
    # TTL collection (reference: ttlindex expiry thread)
    # ------------------------------------------------------------------
    def collect_expired(self, now: Optional[float] = None) -> int:
        removed = 0
        with self.lock:
            for index in self.indexes:
                if isinstance(index, TtlIndex):
                    for row in index.expired_rows(now):
                        self.delete_row(int(row))
                        removed += 1
        return removed

    # ------------------------------------------------------------------
    # helpers for the selecter
    # ------------------------------------------------------------------
    @property
    def rows_capacity(self) -> int:
        return len(self.items)

    def exists_mask(self) -> np.ndarray:
        # version-keyed cache: selects are far more frequent than writes and
        # a fresh O(n) allocation per query dominated the scalar-query
        # profile (readme.md:126 point-select headline). The cached array is
        # read-only; consumers combine it with `&`/`copy()`.
        cached = getattr(self, "_exists_cache", None)
        if cached is not None and cached[0] == self.version:
            return cached[1]
        mask = np.ones(len(self.items), dtype=np.bool_)
        for row in self.free_rows:
            mask[row] = False
        # rows may also be None without being in free_rows (defensive)
        mask.flags.writeable = False
        self._exists_cache = (self.version, mask)
        return mask

    def item_count(self) -> int:
        return len(self.items) - len(self.free_rows)

    def get_item(self, row: int) -> Optional[dict]:
        if 0 <= row < len(self.items):
            return self.items[row]
        return None

    def column_values(self, field: str) -> Optional[Column]:
        return self.columns.get(field)

    def doc_field_values(self, field: str) -> list:
        """Non-indexed field access: gather from raw docs (the analog of the
        reference's non-index field comparators over CJSON)."""
        out = []
        for doc in self.items:
            out.append(None if doc is None else get_json_path(doc, field))
        return out

    # ------------------------------------------------------------------
    # meta (reference: NamespaceImpl::PutMeta/GetMeta)
    # ------------------------------------------------------------------
    def put_meta(self, key: str, value: str) -> None:
        with self.lock:
            self.meta[key] = value
            self._wal("put_meta", {"key": key, "value": value})

    def get_meta(self, key: str) -> Optional[str]:
        return self.meta.get(key)

    def enum_meta(self) -> list[str]:
        return list(self.meta.keys())

    def delete_meta(self, key: str) -> None:
        with self.lock:
            self.meta.pop(key, None)
            self._wal("delete_meta", {"key": key})

    # ------------------------------------------------------------------
    def _wal(self, op: str, payload: dict) -> None:
        for hook in self.wal_hooks:
            hook(op, payload)

    def memstat(self) -> dict:
        return {
            "name": self.name,
            "items_count": self.item_count(),
            # reference: #memstats replication.data_hash (memstats.h)
            "replication": {"data_hash": self.data_hash},
            "indexes": [ix.memstat() for ix in self.indexes],
        }
