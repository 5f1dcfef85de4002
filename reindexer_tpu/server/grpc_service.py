"""gRPC service (subset analog of the reference's optional ENABLE_GRPC
plane, cpp_src/server/grpc/reindexerservice.cc + server/proto/
reindexer.proto — same rpc names, reduced message set; contract:
reindexer_grpc.proto next to this file).

Implementation is codegen-free: a ~60-line proto3 wire codec (specs below
mirror the .proto) + grpcio generic handlers, so the server has no protoc
build step. Clients compile reindexer_grpc.proto with stock protoc/grpcio
tooling — tests do exactly that to prove wire compatibility.

Query results stream back as QueryResultsResponse.data containing either
JSON bytes or the per-namespace protobuf QueryResults encoding
(core/protobuf.py), matching the HTTP ?format=protobuf plane.
"""
from __future__ import annotations

import json
import os
from concurrent import futures
from typing import Any

from ..core.payload import IndexDef
from ..core.protobuf import encode_varint as _write_varint

SERVICE = "reindexer.grpc.Reindexer"

# ---------------------------------------------------------------------------
# minimal proto3 wire codec: spec = {field_num: (name, kind)} where kind is
# "string" | "bytes" | "int" (plain varint) | "string*" (repeated)
# ---------------------------------------------------------------------------


def _read_varint(b: bytes, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        x = b[i]
        i += 1
        out |= (x & 0x7F) << shift
        if not x & 0x80:
            return out, i
        shift += 7


def decode(b: bytes, spec: dict) -> dict:
    out: dict[str, Any] = {name: [] if kind.endswith("*") else None
                           for name, kind in spec.values()}
    i = 0
    while i < len(b):
        tag, i = _read_varint(b, i)
        num, wt = tag >> 3, tag & 7
        ent = spec.get(num)
        if wt == 0:
            v, i = _read_varint(b, i)
            if ent and ent[1] in ("int", "int*"):
                _store(out, ent, v)
        elif wt == 2:
            ln, i = _read_varint(b, i)
            raw = b[i: i + ln]
            i += ln
            if ent:
                name, kind = ent
                if kind.startswith("string"):
                    _store(out, ent, raw.decode("utf-8"))
                elif kind.startswith("bytes"):
                    _store(out, ent, raw)
        elif wt == 5:
            i += 4
        elif wt == 1:
            i += 8
        else:
            raise ValueError(f"bad wire type {wt}")
    return out


def _store(out: dict, ent: tuple, v: Any) -> None:
    name, kind = ent
    if kind.endswith("*"):
        out[name].append(v)
    else:
        out[name] = v


def encode(msg: dict, spec: dict) -> bytes:
    out = bytearray()
    for num, (name, kind) in spec.items():
        v = msg.get(name)
        if v is None or (kind.endswith("*") and not v):
            continue
        vals = v if kind.endswith("*") else [v]
        for x in vals:
            if kind.startswith("int"):
                if x == 0:
                    continue
                _write_varint(num << 3, out)
                _write_varint(int(x), out)
            else:
                data = x.encode("utf-8") if isinstance(x, str) else bytes(x)
                if not data:
                    continue
                _write_varint((num << 3) | 2, out)
                _write_varint(len(data), out)
                out += data
    return bytes(out)


# message specs (must match reindexer_grpc.proto)
ERROR = {1: ("code", "int"), 2: ("what", "string")}
DB_REQ = {1: ("dbName", "string")}
NS_REQ = {1: ("dbName", "string"), 2: ("nsName", "string")}
OPEN_NS = {1: ("dbName", "string"), 2: ("nsName", "string"),
           3: ("indexDefsJson", "string")}
ADD_INDEX = {1: ("dbName", "string"), 2: ("nsName", "string"),
             3: ("indexDefJson", "string")}
DROP_INDEX = {1: ("dbName", "string"), 2: ("nsName", "string"),
              3: ("indexName", "string")}
NAMES_RESP = {1: ("names", "string*")}
MODIFY = {1: ("dbName", "string"), 2: ("nsName", "string"),
          3: ("mode", "int"), 4: ("json", "string")}
SQL_REQ = {1: ("dbName", "string"), 2: ("sql", "string"),
           3: ("encoding", "int")}
QR_RESP = {1: ("data", "bytes"), 2: ("encoding", "int")}
META_REQ = {1: ("dbName", "string"), 2: ("nsName", "string"),
            3: ("key", "string")}
META_RESP = {1: ("metadata", "string")}
PUT_META = {1: ("dbName", "string"), 2: ("nsName", "string"),
            3: ("key", "string"), 4: ("value", "string")}
ENUM_META_REQ = {1: ("dbName", "string"), 2: ("nsName", "string")}
META_KEYS_RESP = {1: ("keys", "string*")}
PB_SCHEMA_REQ = {1: ("dbName", "string"), 2: ("namespaces", "string*")}
PB_SCHEMA_RESP = {1: ("protoStr", "string")}

_MODE_UPSERT, _MODE_INSERT, _MODE_UPDATE, _MODE_DELETE = 0, 1, 2, 3
_ENC_JSON, _ENC_PROTOBUF = 0, 1


def _ok() -> bytes:
    return encode({"code": 0}, ERROR)


def _err(e: Exception) -> bytes:
    return encode({"code": 1, "what": str(e)}, ERROR)


class GrpcReindexerServer:
    """Codegen-free gRPC front over a DBManager (server/http.py DBManager —
    the same multi-database root the HTTP plane uses)."""

    def __init__(self, mgr, host: str = "127.0.0.1", port: int = 0,
                 max_workers: int = 4):
        import grpc
        self._grpc = grpc
        self.mgr = mgr
        self._server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=max_workers))
        self._server.add_generic_rpc_handlers((self._handler(),))
        self.port = self._server.add_insecure_port(f"{host}:{port}")

    def start(self) -> None:
        self._server.start()

    def stop(self, grace: float = 0.5) -> None:
        self._server.stop(grace)

    # ------------------------------------------------------------------
    def _handler(self):
        grpc = self._grpc
        svc = self
        ident = lambda b: b

        unary = {
            "Connect": (DB_REQ, svc._connect),
            "CreateDatabase": (DB_REQ, svc._create_db),
            "OpenNamespace": (OPEN_NS, svc._open_ns),
            "DropNamespace": (NS_REQ, svc._drop_ns),
            "TruncateNamespace": (NS_REQ, svc._truncate_ns),
            "AddIndex": (ADD_INDEX, svc._add_index),
            "UpdateIndex": (ADD_INDEX, svc._update_index),
            "DropIndex": (DROP_INDEX, svc._drop_index),
            "EnumNamespaces": (DB_REQ, svc._enum_ns),
            "EnumDatabases": ({}, svc._enum_dbs),
            "GetMeta": (META_REQ, svc._get_meta),
            "PutMeta": (PUT_META, svc._put_meta),
            "EnumMeta": (ENUM_META_REQ, svc._enum_meta),
            "DeleteMeta": (META_REQ, svc._delete_meta),
            "GetProtobufSchema": (PB_SCHEMA_REQ, svc._pb_schema),
        }

        class Handler(grpc.GenericRpcHandler):
            def service(self, details):
                prefix = f"/{SERVICE}/"
                if not details.method.startswith(prefix):
                    return None
                name = details.method[len(prefix):]
                if name in unary:
                    spec, fn = unary[name]

                    def run(req, ctx, spec=spec, fn=fn):
                        try:
                            return fn(decode(req, spec))
                        except Exception as e:   # -> ErrorResponse
                            return _err(e)

                    return grpc.unary_unary_rpc_method_handler(
                        run, request_deserializer=ident,
                        response_serializer=ident)
                if name == "ExecSql":
                    def run_sql(req, ctx):
                        yield from svc._exec_sql(decode(req, SQL_REQ))
                    return grpc.unary_stream_rpc_method_handler(
                        run_sql, request_deserializer=ident,
                        response_serializer=ident)
                if name == "ModifyItem":
                    def run_modify(req_iter, ctx):
                        for raw in req_iter:
                            try:
                                svc._modify(decode(raw, MODIFY))
                                yield _ok()
                            except Exception as e:
                                yield _err(e)
                    return grpc.stream_stream_rpc_method_handler(
                        run_modify, request_deserializer=ident,
                        response_serializer=ident)
                return None

        return Handler()

    # --- method impls --------------------------------------------------
    def _db(self, req):
        return self.mgr.get(req["dbName"])

    def _connect(self, req) -> bytes:
        self.mgr.create(req["dbName"])
        return _ok()

    def _create_db(self, req) -> bytes:
        self.mgr.create(req["dbName"])
        return _ok()

    def _open_ns(self, req) -> bytes:
        defs = [IndexDef.from_dict(d)
                for d in json.loads(req["indexDefsJson"] or "[]")]
        self._db(req).open_namespace(req["nsName"], defs)
        return _ok()

    def _drop_ns(self, req) -> bytes:
        self._db(req).drop_namespace(req["nsName"])
        return _ok()

    def _truncate_ns(self, req) -> bytes:
        self._db(req).truncate_namespace(req["nsName"])
        return _ok()

    def _add_index(self, req) -> bytes:
        self._db(req).add_index(req["nsName"],
                                IndexDef.from_dict(
                                    json.loads(req["indexDefJson"])))
        return _ok()

    def _update_index(self, req) -> bytes:
        self._db(req).update_index(req["nsName"],
                                   IndexDef.from_dict(
                                       json.loads(req["indexDefJson"])))
        return _ok()

    def _drop_index(self, req) -> bytes:
        self._db(req).drop_index(req["nsName"], req["indexName"])
        return _ok()

    def _enum_ns(self, req) -> bytes:
        return encode({"names": self._db(req).namespace_names()}, NAMES_RESP)

    def _enum_dbs(self, req) -> bytes:
        return encode({"names": self.mgr.names()}, NAMES_RESP)

    def _modify(self, req) -> None:
        db = self._db(req)
        doc = json.loads(req["json"])
        mode = req["mode"] or 0
        if mode == _MODE_INSERT:
            db.insert(req["nsName"], doc)
        elif mode == _MODE_UPDATE:
            db.update(req["nsName"], doc)
        elif mode == _MODE_DELETE:
            db.delete(req["nsName"], doc)
        else:
            db.upsert(req["nsName"], doc)

    def _exec_sql(self, req):
        try:
            db = self._db(req)
            res = db.select(req["sql"])
            payload = {"items": res.docs(),
                       "query_total_items": len(res)}
            if res.total_count is not None:
                payload["total_items"] = res.total_count
            if (req["encoding"] or 0) == _ENC_PROTOBUF:
                from ..core.protobuf import encode_query_results
                ns = db.get_namespace(res.ns_name)
                data = encode_query_results(ns, payload)
            else:
                data = json.dumps(payload, ensure_ascii=False,
                                  default=str).encode("utf-8")
            yield encode({"data": data, "encoding": req["encoding"] or 0},
                         QR_RESP)
        except Exception as e:
            yield encode({"data": json.dumps(
                {"error": str(e)}).encode("utf-8")}, QR_RESP)

    def _get_meta(self, req) -> bytes:
        v = self._db(req).get_meta(req["nsName"], req["key"])
        return encode({"metadata": v or ""}, META_RESP)

    def _put_meta(self, req) -> bytes:
        self._db(req).put_meta(req["nsName"], req["key"], req["value"])
        return _ok()

    def _enum_meta(self, req) -> bytes:
        return encode({"keys": self._db(req).enum_meta(req["nsName"])},
                      META_KEYS_RESP)

    def _delete_meta(self, req) -> bytes:
        self._db(req).delete_meta(req["nsName"], req["key"])
        return _ok()

    def _pb_schema(self, req) -> bytes:
        from ..core.protobuf import schema_text
        db = self._db(req)
        nses = req["namespaces"] or db.namespace_names()
        return encode({"protoStr": schema_text(db, nses)}, PB_SCHEMA_RESP)


def proto_path() -> str:
    """Path of the .proto contract shipped with the package."""
    return os.path.join(os.path.dirname(__file__), "reindexer_grpc.proto")
