"""Network client: the application-level connector for server mode.

Semantic equivalent of the reference's language bindings over the network
(Go cproto connector, bindings/cproto/cproto.go + query builder query.go;
C++ client cpp_src/client/): the same Query builder objects execute against
a remote ReindexerServer — queries serialize to the JSON DSL
(query/dsl.py), results deserialize into QueryResults. The wire is the HTTP
API (the TPU build's serving edge; SURVEY.md §2.4 keeps the reference's
protocol surface only at the edge).
"""
from __future__ import annotations

import json
import urllib.parse
import urllib.request
from typing import Any, Optional, Sequence, Union

from .core.errors import (ConflictError, NotFoundError, ParamsError,
                          QueryError, ReindexerError)
from .core.payload import IndexDef
from .query.dsl import to_dsl
from .query.query import Query
from .query.results import (AggregationResult, FacetResult, QueryResults,
                            ResultItem)

_ERR_BY_CODE = {400: QueryError, 404: NotFoundError, 409: ConflictError}


class RemoteTransaction:
    def __init__(self, client: "RemoteReindexer", tx_id: str):
        self._c = client
        self._id = tx_id

    def upsert(self, doc: dict) -> "RemoteTransaction":
        self._c._call("PUT", f"/transactions/{self._id}/items", doc)
        return self

    def insert(self, doc: dict) -> "RemoteTransaction":
        self._c._call("POST", f"/transactions/{self._id}/items", doc)
        return self

    def update(self, doc: dict) -> "RemoteTransaction":
        self._c._call("PATCH", f"/transactions/{self._id}/items", doc)
        return self

    def delete(self, doc: dict) -> "RemoteTransaction":
        self._c._call("DELETE", f"/transactions/{self._id}/items", doc)
        return self

    def commit(self) -> None:
        self._c._call("POST", f"/transactions/{self._id}/commit")

    def rollback(self) -> None:
        self._c._call("POST", f"/transactions/{self._id}/rollback")


class RemoteReindexer:
    """Client facade mirroring the embedded `Reindexer` API."""

    def __init__(self, url: str, db: str, create: bool = True):
        self.base = url.rstrip("/")
        self.db = db
        if create:
            self._request("POST", "/api/v1/db", {"name": db},
                          ignore_codes=(409,))

    # --- transport ------------------------------------------------------
    def _request(self, method: str, path: str, body: Any = None,
                 ignore_codes: tuple = ()) -> dict:
        data = None
        if body is not None:
            data = (body if isinstance(body, bytes)
                    else json.dumps(body, default=str).encode())
        req = urllib.request.Request(self.base + path, data=data,
                                     method=method)
        req.add_header("Content-Type", "application/json")
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                return json.loads(resp.read().decode() or "{}")
        except urllib.error.HTTPError as e:
            if e.code in ignore_codes:
                return {}
            try:
                desc = json.loads(e.read().decode()).get("description", "")
            except Exception:
                desc = str(e)
            raise _ERR_BY_CODE.get(e.code, ReindexerError)(desc)

    def _call(self, method: str, path: str, body: Any = None) -> dict:
        return self._request(method, f"/api/v1/db/{self.db}{path}", body)

    # --- namespaces -----------------------------------------------------
    def open_namespace(self, name: str,
                       indexes: Sequence[IndexDef] = ()) -> None:
        self._call("POST", "/namespaces",
                   {"name": name,
                    "indexes": [d.to_dict() for d in indexes]})

    def drop_namespace(self, name: str) -> None:
        self._call("DELETE", f"/namespaces/{name}")

    def truncate_namespace(self, name: str) -> None:
        self._call("DELETE", f"/namespaces/{name}/truncate")

    def namespace_names(self) -> list[str]:
        resp = self._call("GET", "/namespaces")
        return [d["name"] for d in resp.get("items", [])]

    def add_index(self, ns: str, idef: IndexDef) -> None:
        self._call("POST", f"/namespaces/{ns}/indexes", idef.to_dict())

    def update_index(self, ns: str, idef: IndexDef) -> None:
        self._call("PUT", f"/namespaces/{ns}/indexes", idef.to_dict())

    def drop_index(self, ns: str, name: str) -> None:
        self._call("DELETE", f"/namespaces/{ns}/indexes/{name}")

    def index_defs(self, ns: str) -> list[IndexDef]:
        resp = self._call("GET", f"/namespaces/{ns}/indexes")
        return [IndexDef.from_dict(d) for d in resp.get("items", [])]

    # --- items ----------------------------------------------------------
    def upsert(self, ns: str, doc: dict) -> None:
        self._call("PUT", f"/namespaces/{ns}/items", doc)

    def insert(self, ns: str, doc: dict) -> None:
        self._call("POST", f"/namespaces/{ns}/items", doc)

    def update(self, ns: str, doc: dict) -> None:
        self._call("PATCH", f"/namespaces/{ns}/items", doc)

    def delete(self, ns: str, doc: dict) -> None:
        self._call("DELETE", f"/namespaces/{ns}/items", doc)

    # --- queries --------------------------------------------------------
    def select(self, q: Union[Query, str]) -> QueryResults:
        if isinstance(q, str):
            resp = self._call(
                "GET", "/query?q=" + urllib.parse.quote(q))
        else:
            resp = self._call("POST", "/query", to_dsl(q))
        return self._decode_results(
            resp, q.namespace if isinstance(q, Query) else "")

    def update_query(self, q: Query) -> QueryResults:
        resp = self._call("PUT", "/query", to_dsl(q))
        return self._decode_results(resp, q.namespace)

    def delete_query(self, q: Query) -> int:
        resp = self._call("DELETE", "/query", to_dsl(q))
        return int(resp.get("updated", 0))

    def _decode_results(self, resp: dict, ns: str) -> QueryResults:
        items = [ResultItem(doc=d, row_id=i, ns_name=ns)
                 for i, d in enumerate(resp.get("items", []))]
        aggs = []
        for a in resp.get("aggregations", []):
            ar = AggregationResult(a.get("type", ""),
                                   tuple(a.get("fields", ())))
            ar.value = a.get("value")
            ar.distincts = a.get("distincts", [])
            ar.facets = [FacetResult(tuple(f["values"]), f["count"])
                         for f in a.get("facets", [])]
            aggs.append(ar)
        return QueryResults(ns_name=ns, items=items,
                            total_count=resp.get("total_items"),
                            aggregations=aggs,
                            explain=resp.get("explain"))

    # --- meta / tx ------------------------------------------------------
    def put_meta(self, ns: str, key: str, value: str) -> None:
        self._call("PUT", f"/namespaces/{ns}/metabykey",
                   {"key": key, "value": value})

    def get_meta(self, ns: str, key: str) -> Optional[str]:
        try:
            return self._call("GET",
                              f"/namespaces/{ns}/metabykey/{key}")["value"]
        except NotFoundError:
            return None

    def new_transaction(self, ns: str) -> RemoteTransaction:
        resp = self._call("POST", f"/namespaces/{ns}/transactions/begin")
        return RemoteTransaction(self, resp["tx_id"])
