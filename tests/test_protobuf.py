"""Protobuf output plane: schema generation + wire encoding round-trip.

The hand-rolled proto3 encoder (core/protobuf.py) is validated against the
OFFICIAL protobuf toolchain: the served .proto schema is compiled with
stock `protoc` into a descriptor set, loaded into a runtime descriptor
pool, and the server's binary response is parsed with google.protobuf —
proving any client with the schema can consume the wire format (reference:
protobufbuilder.cc + httpserver.cc:936 GetProtobufSchema).
"""
import json
import shutil
import subprocess
import urllib.request

import numpy as np
import pytest

from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts, Query,
                           Reindexer, VectorMetric)
from reindexer_tpu.core.protobuf import (encode_query_results, schema_text)

protoc = shutil.which("protoc")


def _mkdb():
    db = Reindexer()
    db.open_namespace("events", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("score", "tree", "double"),
        IndexDef("name", "hash", "string"),
        IndexDef("flag", "-", "bool"),
        IndexDef("tags", "hash", "string", opts=IndexOpts(is_array=True)),
        IndexDef("vec", "vec_bf", vector_opts=FloatVectorOpts(
            dims=4, metric=VectorMetric.L2)),
    ])
    db.upsert("events", {"id": 1, "score": 2.5, "name": "alpha",
                         "flag": True, "tags": ["a", "b"],
                         "vec": [0.1, 0.2, 0.3, 0.4],
                         "note": "unindexed field"})
    db.upsert("events", {"id": -2, "score": -1.25, "name": "beta",
                         "flag": False, "tags": [],
                         "vec": [1.0, 0.0, 0.0, 0.0]})
    return db


def test_schema_text_shape():
    db = _mkdb()
    text = schema_text(db, ["events"])
    assert 'syntax = "proto3";' in text
    assert "message Events {" in text
    assert "sint64 id = 1;" in text
    assert "repeated string tags = 5;" in text
    assert "repeated float vec = 6;" in text
    assert "string _extra = 7;" in text
    assert "message QueryResults {" in text
    assert "repeated Events items = 1;" in text


def _parse_with_official(schema: str, payload: bytes):
    """Compile the served schema with protoc, parse with google.protobuf."""
    import os
    import tempfile
    from google.protobuf import descriptor_pb2, descriptor_pool, \
        message_factory
    with tempfile.TemporaryDirectory() as td:
        proto = os.path.join(td, "rx.proto")
        desc = os.path.join(td, "rx.desc")
        with open(proto, "w") as f:
            f.write(schema)
        subprocess.run([protoc, f"--proto_path={td}",
                        f"--descriptor_set_out={desc}", proto], check=True)
        with open(desc, "rb") as f:
            fds = descriptor_pb2.FileDescriptorSet.FromString(f.read())
    pool = descriptor_pool.DescriptorPool()
    for fd in fds.file:
        pool.Add(fd)
    md = pool.FindMessageTypeByName("QueryResults")
    cls = message_factory.GetMessageClass(md)
    return cls.FromString(payload)


@pytest.mark.skipif(protoc is None, reason="protoc not available")
def test_wire_roundtrip_via_protoc():
    db = _mkdb()
    res = db.select(Query("events").sort("id", True).req_total_count()
                .select("vectors()"))
    payload = {"items": res.docs(), "total_items": res.total_count,
               "query_total_items": res.total_count}
    body = encode_query_results(db.get_namespace("events"), payload)
    msg = _parse_with_official(schema_text(db, ["events"]), body)
    assert msg.total_items == 2
    assert len(msg.items) == 2
    first = msg.items[0]          # sorted desc by id -> id=1
    assert first.id == 1
    assert first.name == "alpha"
    assert first.flag is True
    assert list(first.tags) == ["a", "b"]
    assert np.allclose(list(first.vec), [0.1, 0.2, 0.3, 0.4], atol=1e-6)
    assert abs(first.score - 2.5) < 1e-9
    assert json.loads(first._extra) == {"note": "unindexed field"}
    second = msg.items[1]
    assert second.id == -2
    assert abs(second.score + 1.25) < 1e-9
    assert second.flag is False


@pytest.mark.skipif(protoc is None, reason="protoc not available")
def test_http_protobuf_endpoints():
    """End-to-end over HTTP: schema route + format=protobuf query route."""
    from reindexer_tpu.server.http import ReindexerServer
    srv = ReindexerServer(host="127.0.0.1", port=0)
    srv.mgr.dbs["testdb"] = _mkdb()
    srv.start()
    port = srv.port
    try:
        base = f"http://127.0.0.1:{port}/api/v1/db/testdb"
        with urllib.request.urlopen(f"{base}/protobuf_schema?ns=events") as r:
            schema = r.read().decode()
        assert "message Events" in schema
        url = (f"{base}/query?format=protobuf&q="
               + urllib.parse.quote("SELECT * FROM events WHERE id = 1"))
        with urllib.request.urlopen(url) as r:
            assert r.headers["Content-Type"].startswith(
                "application/protobuf")
            body = r.read()
        msg = _parse_with_official(schema, body)
        assert len(msg.items) == 1 and msg.items[0].name == "alpha"
    finally:
        srv.stop()


import urllib.parse  # noqa: E402  (used in the http test)
