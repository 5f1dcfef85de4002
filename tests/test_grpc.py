"""gRPC service plane: wire compatibility + end-to-end flows.

Drives the codegen-free server (server/grpc_service.py) with a real grpcio
channel. The shipped contract (server/reindexer_grpc.proto) is a full
mirror of the reference proto (cpp_src/server/proto/reindexer.proto —
same rpc set, message names and field numbers); it is compiled with stock
protoc in-test to prove it is valid proto3 and matches the hand-rolled
message specs (reference analog: server/grpc/reindexerservice.cc).
"""
import json
import shutil
import subprocess

import pytest

grpc = pytest.importorskip("grpc")

from reindexer_tpu.server.grpc_service import (  # noqa: E402
    ADD_INDEX, ADD_NS, ADD_TX_ITEM, BEGIN_TX, CONNECT_REQ, DB_REQ,
    ENUM_META_REQ, ENUM_NS_REQ, ENUM_NS_RESP, ERROR, GrpcReindexerServer,
    META_KEYS_RESP, META_REQ, META_RESP, MODIFY, NAMES_RESP, OPEN_NS,
    PB_SCHEMA_REQ, PB_SCHEMA_RESP, QR_RESP, QUERY_REQ, SERVICE,
    SET_SCHEMA, SQL_REQ, TX_ID, TX_ID_RESP, decode, encode, proto_path)
from reindexer_tpu.server.http import DBManager  # noqa: E402

IDENT = lambda b: b

IDX_ID = {"name": "id", "jsonPaths": ["id"], "indexType": "hash",
          "fieldType": "int", "options": {"isPk": True}}
IDX_TITLE = {"name": "title", "jsonPaths": ["title"], "indexType": "hash",
             "fieldType": "string", "options": {}}


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


def _stream(srv, method, req_bytes):
    with grpc.insecure_channel(f"127.0.0.1:{srv.port}") as ch:
        fn = ch.unary_stream(f"/{SERVICE}/{method}",
                             request_serializer=IDENT,
                             response_deserializer=IDENT)
        return [decode(b, QR_RESP) for b in fn(req_bytes)]


def _bidi(srv, method, reqs):
    with grpc.insecure_channel(f"127.0.0.1:{srv.port}") as ch:
        fn = ch.stream_stream(f"/{SERVICE}/{method}",
                              request_serializer=IDENT,
                              response_deserializer=IDENT)
        return [decode(b, ERROR) for b in fn(iter(reqs))]


def _setup_books(srv, db="g1"):
    assert not decode(_call(srv, "Connect", encode(
        {"url": f"cproto://127.0.0.1:6534/{db}", "dbName": db},
        CONNECT_REQ)), ERROR)["code"]
    r = decode(_call(srv, "AddNamespace", encode(
        {"dbName": db,
         "namespace": {"name": "books",
                       "indexesDefinitions": [IDX_ID, IDX_TITLE]}},
        ADD_NS)), ERROR)
    assert not r["code"], r
    acks = _bidi(srv, "ModifyItem", [
        encode({"dbName": db, "nsName": "books", "mode": 0,
                "encodingType": 0,
                "data": json.dumps({"id": i, "title": f"b{i}"}).encode()},
               MODIFY) for i in range(5)])
    assert len(acks) == 5 and all(not a["code"] for a in acks)


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
    _setup_books(srv)

    # ExecSql: one QueryResultsResponse per item, options on the first
    chunks = _stream(srv, "ExecSql", encode(
        {"dbName": "g1", "sql": "SELECT * FROM books WHERE id < 3"},
        SQL_REQ))
    assert len(chunks) == 3
    assert chunks[0]["options"]["queryTotalItems"] == 3
    assert chunks[1]["options"] is None
    assert {json.loads(c["data"])["id"] for c in chunks} == {0, 1, 2}

    # Select: JSON-DSL query + withRank/withItemID flags
    dsl = {"namespace": "books", "filters": [
        {"field": "id", "cond": "le", "value": 1}],
        "sort": [{"field": "id", "desc": False}]}
    chunks = _stream(srv, "Select", encode(
        {"dbName": "g1",
         "query": {"encodingType": 0, "data": json.dumps(dsl).encode()},
         "flags": {"encodingType": 0, "withItemID": True}}, QUERY_REQ))
    docs = [json.loads(c["data"]) for c in chunks]
    assert [d["id"] for d in docs] == [0, 1]
    assert all("#rowid" in d for d in docs)

    # Update: set a field through an update query
    dsl_up = {"namespace": "books",
              "filters": [{"field": "id", "cond": "eq", "value": 4}],
              "update_fields": [{"name": "title", "values": ["patched"]}]}
    chunks = _stream(srv, "Update", encode(
        {"dbName": "g1",
         "query": {"encodingType": 0,
                   "data": json.dumps(dsl_up).encode()}}, QUERY_REQ))
    assert json.loads(chunks[0]["data"])["title"] == "patched"

    # Delete: removes matching docs, reports the count in options
    dsl_del = {"namespace": "books",
               "filters": [{"field": "id", "cond": "eq", "value": 0}]}
    chunks = _stream(srv, "Delete", encode(
        {"dbName": "g1",
         "query": {"encodingType": 0,
                   "data": json.dumps(dsl_del).encode()}}, QUERY_REQ))
    assert chunks[0]["options"]["totalItems"] == 1
    chunks = _stream(srv, "ExecSql", encode(
        {"dbName": "g1", "sql": "SELECT * FROM books"}, SQL_REQ))
    assert {json.loads(c["data"])["id"] for c in chunks} == {1, 2, 3, 4}

    # meta round-trip through the nested Metadata message
    decode(_call(srv, "PutMeta", encode(
        {"dbName": "g1", "metadata":
         {"nsName": "books", "key": "k", "value": "v7"}}, META_REQ)),
        ERROR)
    got = decode(_call(srv, "GetMeta", encode(
        {"dbName": "g1", "metadata": {"nsName": "books", "key": "k"}},
        META_REQ)), META_RESP)
    assert got["metadata"] == "v7"
    keys = decode(_call(srv, "EnumMeta", encode(
        {"dbName": "g1", "nsName": "books"}, ENUM_META_REQ)),
        META_KEYS_RESP)
    assert keys["keys"] == ["k"]
    decode(_call(srv, "DeleteMeta", encode(
        {"dbName": "g1", "metadata": {"nsName": "books", "key": "k"}},
        META_REQ)), ERROR)
    keys = decode(_call(srv, "EnumMeta", encode(
        {"dbName": "g1", "nsName": "books"}, ENUM_META_REQ)),
        META_KEYS_RESP)
    assert keys["keys"] == []

    # EnumNamespaces returns full Namespace definitions
    resp = decode(_call(srv, "EnumNamespaces", encode(
        {"dbName": "g1", "options": {"hideSystems": True}}, ENUM_NS_REQ)),
        ENUM_NS_RESP)
    books = [n for n in resp["namespacesDefinitions"]
             if n["name"] == "books"]
    assert books and {i["name"] for i in books[0]["indexesDefinitions"]} \
        >= {"id", "title"}
    pk = [i for i in books[0]["indexesDefinitions"] if i["name"] == "id"]
    assert pk[0]["options"]["isPk"] is True

    dbs = decode(_call(srv, "EnumDatabases", encode({}, {})), NAMES_RESP)
    assert "g1" in dbs["names"]

    # protobuf schema (field name `proto` per the reference contract)
    schema = decode(_call(srv, "GetProtobufSchema", encode(
        {"dbName": "g1", "namespaces": ["books"]}, PB_SCHEMA_REQ)),
        PB_SCHEMA_RESP)
    assert "message Books" in schema["proto"]

    # SetSchema round-trips without error
    r = decode(_call(srv, "SetSchema", encode(
        {"dbName": "g1", "schemaDefinitionRequest":
         {"nsName": "books", "jsonData": json.dumps(
             {"type": "object"})}}, SET_SCHEMA)), ERROR)
    assert not r["code"], r

    # structured DDL: AddIndex / DropIndex by definition
    r = decode(_call(srv, "AddIndex", encode(
        {"dbName": "g1", "nsName": "books", "definition":
         {"name": "year", "jsonPaths": ["year"], "indexType": "tree",
          "fieldType": "int", "options": {}}}, ADD_INDEX)), ERROR)
    assert not r["code"], r
    r = decode(_call(srv, "DropIndex", encode(
        {"dbName": "g1", "nsName": "books",
         "definition": {"name": "year"}}, ADD_INDEX)), ERROR)
    assert not r["code"], r

    # error surface: unknown namespace -> ErrorResponse, not a crash
    r = decode(_call(srv, "AddIndex", encode(
        {"dbName": "g1", "nsName": "nope", "definition": IDX_TITLE},
        ADD_INDEX)), ERROR)
    assert r["code"] and "nope" in r["what"]


def test_grpc_transactions(srv):
    _setup_books(srv, db="g3")
    resp = decode(_call(srv, "BeginTransaction", encode(
        {"dbName": "g3", "nsName": "books"}, BEGIN_TX)), TX_ID_RESP)
    assert resp["status"] is None and resp["id"]
    tx_id = resp["id"]
    acks = _bidi(srv, "AddTxItem", [
        encode({"id": tx_id, "mode": 0, "encodingType": 0,
                "data": json.dumps({"id": 100 + i,
                                    "title": f"tx{i}"}).encode()},
               ADD_TX_ITEM) for i in range(3)])
    assert all(not a["code"] for a in acks)
    # not visible before commit
    chunks = _stream(srv, "ExecSql", encode(
        {"dbName": "g3", "sql": "SELECT * FROM books WHERE id >= 100"},
        SQL_REQ))
    assert not (chunks[0]["options"]["queryTotalItems"] or 0)
    assert not decode(_call(srv, "CommitTransaction",
                            encode({"id": tx_id}, TX_ID)), ERROR)["code"]
    chunks = _stream(srv, "ExecSql", encode(
        {"dbName": "g3", "sql": "SELECT * FROM books WHERE id >= 100"},
        SQL_REQ))
    assert chunks[0]["options"]["queryTotalItems"] == 3

    # commit of an unknown tx -> errCodeTxDoesNotExist (31)
    r = decode(_call(srv, "CommitTransaction",
                     encode({"id": 9999}, TX_ID)), ERROR)
    assert r["code"] == 31

    # rollback drops staged writes
    resp = decode(_call(srv, "BeginTransaction", encode(
        {"dbName": "g3", "nsName": "books"}, BEGIN_TX)), TX_ID_RESP)
    _bidi(srv, "AddTxItem", [encode(
        {"id": resp["id"], "mode": 0, "encodingType": 0,
         "data": json.dumps({"id": 500, "title": "x"}).encode()},
        ADD_TX_ITEM)])
    decode(_call(srv, "RollbackTransaction",
                 encode({"id": resp["id"]}, TX_ID)), ERROR)
    chunks = _stream(srv, "ExecSql", encode(
        {"dbName": "g3", "sql": "SELECT * FROM books WHERE id = 500"},
        SQL_REQ))
    assert not (chunks[0]["options"]["queryTotalItems"] or 0)


def test_grpc_item_encodings(srv):
    """ModifyItem + result streams across JSON / CJSON / MSGPACK /
    PROTOBUF item encodings (EncodingType parity with the reference)."""
    db = "g4"
    _setup_books(srv, db=db)
    mgr_db = srv.mgr.get(db)
    ns = mgr_db.get_namespace("books")

    # protobuf item upsert (uses the served schema's field numbering)
    from reindexer_tpu.core.protobuf import decode_item, encode_item
    raw = encode_item(ns, {"id": 41, "title": "pb"})
    assert decode_item(ns, raw) == {"id": 41, "title": "pb"}
    acks = _bidi(srv, "ModifyItem", [encode(
        {"dbName": db, "nsName": "books", "mode": 0,
         "encodingType": 3, "data": raw}, MODIFY)])
    assert not acks[0]["code"], acks

    # cjson item upsert
    from reindexer_tpu.core.cjson import encode_doc
    acks = _bidi(srv, "ModifyItem", [encode(
        {"dbName": db, "nsName": "books", "mode": 0,
         "encodingType": 1, "data": encode_doc({"id": 42,
                                                "title": "cj"})}, MODIFY)])
    assert not acks[0]["code"], acks

    # msgpack item upsert (skipped when msgpack is absent)
    try:
        import msgpack
        acks = _bidi(srv, "ModifyItem", [encode(
            {"dbName": db, "nsName": "books", "mode": 0,
             "encodingType": 2,
             "data": msgpack.packb({"id": 43, "title": "mp"})}, MODIFY)])
        assert not acks[0]["code"], acks
        want_ids = {41, 42, 43}
    except ImportError:
        want_ids = {41, 42}

    # protobuf result stream round-trips the documents
    chunks = _stream(srv, "ExecSql", encode(
        {"dbName": db, "sql": "SELECT * FROM books WHERE id >= 41",
         "flags": {"encodingType": 3}}, SQL_REQ))
    got = {decode_item(ns, c["data"])["id"] for c in chunks}
    assert got == want_ids

    # msgpack result stream
    try:
        import msgpack
        chunks = _stream(srv, "ExecSql", encode(
            {"dbName": db, "sql": "SELECT * FROM books WHERE id = 41",
             "flags": {"encodingType": 2}}, SQL_REQ))
        assert msgpack.unpackb(chunks[0]["data"])["id"] == 41
    except ImportError:
        pass

    # cjson result stream
    from reindexer_tpu.core.cjson import decode_doc
    chunks = _stream(srv, "ExecSql", encode(
        {"dbName": db, "sql": "SELECT * FROM books WHERE id = 42",
         "flags": {"encodingType": 1}}, SQL_REQ))
    assert decode_doc(bytes(chunks[0]["data"]))["id"] == 42


def test_grpc_open_close_namespace(srv):
    db = "g5"
    _call(srv, "CreateDatabase", encode({"dbName": db}, DB_REQ))
    r = decode(_call(srv, "OpenNamespace", encode(
        {"dbName": db, "storageOptions": {"nsName": "plain",
                                          "enabled": False}}, OPEN_NS)),
        ERROR)
    assert not r["code"], r
    r = decode(_call(srv, "CloseNamespace", encode(
        {"dbName": db, "nsName": "plain"},
        {1: ("dbName", "string"), 2: ("nsName", "string")})), ERROR)
    assert not r["code"], r
