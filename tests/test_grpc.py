"""gRPC service plane: wire compatibility + end-to-end flows.

Drives the codegen-free server (server/grpc_service.py) with a real grpcio
channel. The shipped contract (server/reindexer_grpc.proto) is compiled
with stock protoc in-test to prove it is valid proto3 and matches the
hand-rolled message specs (reference analog: the optional ENABLE_GRPC
service, cpp_src/server/grpc/reindexerservice.cc).
"""
import json
import shutil
import subprocess

import pytest

grpc = pytest.importorskip("grpc")

from reindexer_tpu.server.grpc_service import (  # noqa: E402
    ADD_INDEX, DB_REQ, ERROR, GrpcReindexerServer, META_REQ, META_RESP,
    MODIFY, NAMES_RESP, OPEN_NS, PB_SCHEMA_REQ, PB_SCHEMA_RESP, QR_RESP,
    SERVICE, SQL_REQ, decode, encode, proto_path)
from reindexer_tpu.server.http import DBManager  # noqa: E402

IDENT = lambda b: b


@pytest.fixture()
def srv():
    mgr = DBManager()
    s = GrpcReindexerServer(mgr)
    s.start()
    yield s
    s.stop()


def _call(srv, method, req_bytes):
    with grpc.insecure_channel(f"127.0.0.1:{srv.port}") as ch:
        fn = ch.unary_unary(f"/{SERVICE}/{method}",
                            request_serializer=IDENT,
                            response_deserializer=IDENT)
        return fn(req_bytes)


def test_proto_contract_compiles():
    protoc = shutil.which("protoc")
    if protoc is None:
        pytest.skip("protoc not available")
    import os
    subprocess.run([protoc,
                    f"--proto_path={os.path.dirname(proto_path())}",
                    "--descriptor_set_out=/dev/null", proto_path()],
                   check=True)


def test_grpc_full_flow(srv):
    # connect/create + namespace DDL
    assert decode(_call(srv, "Connect",
                        encode({"dbName": "g1"}, DB_REQ)), ERROR)["code"] in (
        None, 0)
    defs = [{"name": "id", "json_paths": ["id"], "field_type": "int",
             "index_type": "hash", "is_pk": True},
            {"name": "title", "json_paths": ["title"],
             "field_type": "string", "index_type": "hash"}]
    r = decode(_call(srv, "OpenNamespace", encode(
        {"dbName": "g1", "nsName": "books",
         "indexDefsJson": json.dumps(defs)}, OPEN_NS)), ERROR)
    assert not r["code"], r

    # streaming ModifyItem upserts
    with grpc.insecure_channel(f"127.0.0.1:{srv.port}") as ch:
        fn = ch.stream_stream(f"/{SERVICE}/ModifyItem",
                              request_serializer=IDENT,
                              response_deserializer=IDENT)
        reqs = [encode({"dbName": "g1", "nsName": "books", "mode": 0,
                        "json": json.dumps({"id": i, "title": f"b{i}"})},
                       MODIFY) for i in range(5)]
        acks = [decode(b, ERROR) for b in fn(iter(reqs))]
    assert len(acks) == 5 and all(not a["code"] for a in acks)

    # ExecSql streaming results (JSON encoding)
    with grpc.insecure_channel(f"127.0.0.1:{srv.port}") as ch:
        fn = ch.unary_stream(f"/{SERVICE}/ExecSql",
                             request_serializer=IDENT,
                             response_deserializer=IDENT)
        chunks = [decode(b, QR_RESP) for b in fn(encode(
            {"dbName": "g1", "sql": "SELECT * FROM books WHERE id < 3"},
            SQL_REQ))]
    payload = json.loads(chunks[0]["data"])
    assert {d["id"] for d in payload["items"]} == {0, 1, 2}

    # meta round-trip
    decode(_call(srv, "PutMeta", encode(
        {"dbName": "g1", "nsName": "books", "key": "k", "value": "v7"},
        {1: ("dbName", "string"), 2: ("nsName", "string"),
         3: ("key", "string"), 4: ("value", "string")})), ERROR)
    got = decode(_call(srv, "GetMeta", encode(
        {"dbName": "g1", "nsName": "books", "key": "k"}, META_REQ)),
        META_RESP)
    assert got["metadata"] == "v7"

    # meta enumeration + delete
    from reindexer_tpu.server.grpc_service import (ENUM_META_REQ,
                                                   META_KEYS_RESP)
    keys = decode(_call(srv, "EnumMeta", encode(
        {"dbName": "g1", "nsName": "books"}, ENUM_META_REQ)), META_KEYS_RESP)
    assert keys["keys"] == ["k"]
    decode(_call(srv, "DeleteMeta", encode(
        {"dbName": "g1", "nsName": "books", "key": "k"}, META_REQ)), ERROR)
    keys = decode(_call(srv, "EnumMeta", encode(
        {"dbName": "g1", "nsName": "books"}, ENUM_META_REQ)), META_KEYS_RESP)
    assert keys["keys"] == []

    # namespaces enumeration + protobuf schema
    names = decode(_call(srv, "EnumNamespaces",
                         encode({"dbName": "g1"}, DB_REQ)), NAMES_RESP)
    assert "books" in names["names"]
    schema = decode(_call(srv, "GetProtobufSchema", encode(
        {"dbName": "g1", "namespaces": ["books"]}, PB_SCHEMA_REQ)),
        PB_SCHEMA_RESP)
    assert "message Books" in schema["protoStr"]

    # error surface: unknown namespace -> ErrorResponse, not a crash
    r = decode(_call(srv, "AddIndex", encode(
        {"dbName": "g1", "nsName": "nope",
         "indexDefJson": json.dumps(defs[0])}, ADD_INDEX)), ERROR)
    assert r["code"] == 1 and "nope" in r["what"]


def test_grpc_protobuf_encoding(srv):
    _call(srv, "Connect", encode({"dbName": "g2"}, DB_REQ))
    defs = [{"name": "id", "json_paths": ["id"], "field_type": "int",
             "index_type": "hash", "is_pk": True}]
    _call(srv, "OpenNamespace", encode(
        {"dbName": "g2", "nsName": "t",
         "indexDefsJson": json.dumps(defs)}, OPEN_NS))
    with grpc.insecure_channel(f"127.0.0.1:{srv.port}") as ch:
        fn = ch.stream_stream(f"/{SERVICE}/ModifyItem",
                              request_serializer=IDENT,
                              response_deserializer=IDENT)
        list(fn(iter([encode({"dbName": "g2", "nsName": "t", "mode": 0,
                              "json": json.dumps({"id": 41})}, MODIFY)])))
        qs = ch.unary_stream(f"/{SERVICE}/ExecSql",
                             request_serializer=IDENT,
                             response_deserializer=IDENT)
        chunks = [decode(b, QR_RESP) for b in qs(encode(
            {"dbName": "g2", "sql": "SELECT * FROM t", "encoding": 1},
            SQL_REQ))]
    assert chunks[0]["encoding"] == 1
    # parse the per-ns protobuf QueryResults: items field 1, id field 1
    body = chunks[0]["data"]
    item = decode(body, {1: ("item", "bytes")})["item"]
    got = decode(item, {1: ("id", "int")})
    assert got["id"] == 82           # zigzag(41)
