"""Binary RPC client.

Semantic equivalent of the reference's network binding
(bindings/cproto/cproto.go connection + Go query execution over cproto;
C++ client cpp_src/client/): a plain blocking socket client speaking the
framed varint protocol (net/protocol.py), with cursor-paged result
iteration (FetchResults analog).
"""
from __future__ import annotations

import json
import socket
import threading
from typing import Any, Iterator, Optional, Sequence, Union

from ..core import cjson
from ..core.errors import (ConflictError, NotFoundError, ParamsError,
                           QueryError, ReindexerError)
from ..core.payload import IndexDef
from ..query.dsl import to_dsl
from ..query.query import Query
from ..query.results import AggregationResult, QueryResults, ResultItem
from .protocol import Cmd, HEADER_SIZE, Status, pack_frame, unpack_header
from .serializer import decode_args, encode_args

_ERR_OF = {Status.QUERY_ERROR: QueryError, Status.PARAMS_ERROR: ParamsError,
           Status.NOT_FOUND: NotFoundError, Status.CONFLICT: ConflictError}


def _page_docs(page) -> list:
    """Result page: CJSON blob (one shared tag table) or legacy JSON list."""
    if isinstance(page, (bytes, bytearray)):
        return cjson.decode_docs(bytes(page))
    return [json.loads(p) for p in page]


class RpcTransaction:
    def __init__(self, client: "RpcReindexer", tx_id: int):
        self._c = client
        self._id = tx_id

    def upsert(self, doc: dict) -> "RpcTransaction":
        self._c._call(Cmd.TX_MODIFY, [self._id, 0, cjson.encode_doc(doc)])
        return self

    def insert(self, doc: dict) -> "RpcTransaction":
        self._c._call(Cmd.TX_MODIFY, [self._id, 1, cjson.encode_doc(doc)])
        return self

    def update(self, doc: dict) -> "RpcTransaction":
        self._c._call(Cmd.TX_MODIFY, [self._id, 2, cjson.encode_doc(doc)])
        return self

    def delete(self, doc: dict) -> "RpcTransaction":
        self._c._call(Cmd.TX_MODIFY, [self._id, 3, cjson.encode_doc(doc)])
        return self

    def commit(self) -> int:
        return int(self._c._call(Cmd.COMMIT_TX, [self._id])[0])

    def rollback(self) -> None:
        self._c._call(Cmd.ROLLBACK_TX, [self._id])


class RpcReindexer:
    """Client facade over the binary protocol (same API shape as
    client.RemoteReindexer / the embedded Reindexer)."""

    def __init__(self, host: str, port: int, db: str,
                 user: str = "", password: str = "",
                 fetch_limit: int = 100):
        self._sock = socket.create_connection((host, port), timeout=30)
        self._seq = 0
        self._lock = threading.Lock()
        self.fetch_limit = fetch_limit
        self._call(Cmd.LOGIN, [user, password, db])

    # --- transport ------------------------------------------------------
    def _call(self, cmd: Cmd, args: list) -> list:
        with self._lock:
            self._seq += 1
            seq = self._seq
            self._sock.sendall(pack_frame(seq, cmd, 0, encode_args(args)))
            head = self._recv_exact(HEADER_SIZE)
            rseq, rcmd, status, length = unpack_header(head)
            body = self._recv_exact(length) if length else b""
        if rseq != seq:
            raise ReindexerError(f"rpc sequence mismatch {rseq} != {seq}")
        out = decode_args(body) if body else []
        if status != Status.OK:
            msg = out[0] if out else "rpc error"
            raise _ERR_OF.get(Status(status), ReindexerError)(msg)
        return out

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("rpc connection closed")
            buf += chunk
        return buf

    def close(self) -> None:
        self._sock.close()

    # --- API --------------------------------------------------------------
    def ping(self) -> bool:
        return self._call(Cmd.PING, [])[0] == "pong"

    def open_namespace(self, name: str,
                       indexes: Sequence[IndexDef] = ()) -> None:
        self._call(Cmd.OPEN_NAMESPACE,
                   [name, json.dumps([d.to_dict() for d in indexes])])

    def drop_namespace(self, name: str) -> None:
        self._call(Cmd.DROP_NAMESPACE, [name])

    def truncate_namespace(self, name: str) -> None:
        self._call(Cmd.TRUNCATE_NAMESPACE, [name])

    def namespace_names(self) -> list[str]:
        return self._call(Cmd.ENUM_NAMESPACES, [])[0]

    def add_index(self, ns: str, idef: IndexDef) -> None:
        self._call(Cmd.ADD_INDEX, [ns, json.dumps(idef.to_dict())])

    def drop_index(self, ns: str, name: str) -> None:
        self._call(Cmd.DROP_INDEX, [ns, name])

    def upsert(self, ns: str, doc: dict) -> None:
        self._call(Cmd.MODIFY_ITEM, [ns, 0, cjson.encode_doc(doc)])

    def insert(self, ns: str, doc: dict) -> None:
        self._call(Cmd.MODIFY_ITEM, [ns, 1, cjson.encode_doc(doc)])

    def update(self, ns: str, doc: dict) -> None:
        self._call(Cmd.MODIFY_ITEM, [ns, 2, cjson.encode_doc(doc)])

    def delete(self, ns: str, doc: dict) -> None:
        self._call(Cmd.MODIFY_ITEM, [ns, 3, cjson.encode_doc(doc)])

    def select(self, q: Union[Query, str]) -> QueryResults:
        if isinstance(q, str):
            out = self._call(Cmd.SELECT_SQL, [q, self.fetch_limit, 1])
            ns = ""
        else:
            out = self._call(Cmd.SELECT_DSL,
                             [json.dumps(to_dsl(q), default=str),
                              self.fetch_limit, 1])
            ns = q.namespace
        req_id, total, count, page, ranks, aggs_json = out
        docs = _page_docs(page)
        items = [ResultItem(doc=d, row_id=i, ns_name=ns,
                            rank=(ranks[i] if ranks[i] else None))
                 for i, d in enumerate(docs)]
        # cursor-paged fetch of the remainder (reference: kCmdFetchResults)
        offset = len(items)
        while offset < count:
            fpage, franks = self._call(
                Cmd.FETCH_RESULTS, [req_id, offset, self.fetch_limit, 1])
            fdocs = _page_docs(fpage)
            for j, d in enumerate(fdocs):
                items.append(ResultItem(
                    doc=d, row_id=offset + j, ns_name=ns,
                    rank=(franks[j] if franks[j] else None)))
            if not fdocs:
                break
            offset += len(fdocs)
        self._call(Cmd.CLOSE_RESULTS, [req_id])
        aggs = []
        for a in json.loads(aggs_json):
            ar = AggregationResult(a.get("type", ""),
                                   tuple(a.get("fields", ())))
            ar.value = a.get("value")
            ar.distincts = a.get("distincts", [])
            aggs.append(ar)
        return QueryResults(ns_name=ns, items=items, total_count=total,
                            aggregations=aggs)

    def new_transaction(self, ns: str) -> RpcTransaction:
        tx_id = int(self._call(Cmd.BEGIN_TX, [ns])[0])
        return RpcTransaction(self, tx_id)

    def put_meta(self, ns: str, key: str, value: str) -> None:
        self._call(Cmd.PUT_META, [ns, key, value])

    def get_meta(self, ns: str, key: str) -> Optional[str]:
        return self._call(Cmd.GET_META, [ns, key])[0]
