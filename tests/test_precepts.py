"""Atomic on-update functions — precepts (reference: readme.md:1854-1861,
namespaceimpl.cc:4191-4257 setFieldsBasedOnPrecepts/GetSerial,
function/function.cc now/serial)."""
import json
import time
import urllib.request

import pytest

from reindexer_tpu import (IndexDef, IndexOpts, LogicError, Query, Reindexer)


def make_db(path=None):
    db = Reindexer(path) if path else Reindexer()
    db.open_namespace("docs", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("cnt", "hash", "int"),
        IndexDef("tags", "hash", "string", opts=IndexOpts(is_array=True)),
    ])
    return db


def get(db, pk):
    res = db.select(Query("docs").where("id", "=", pk))
    return res.docs()[0]


def test_serial_autoincrement():
    db = make_db()
    for i in range(1, 6):
        doc = {"id": 100 + i}
        db.upsert("docs", doc, precepts=["cnt=serial()"])
        # computed value written back into the caller's doc
        assert doc["cnt"] == i
        assert get(db, 100 + i)["cnt"] == i


def test_serial_persists_in_meta(tmp_path):
    db = make_db(str(tmp_path / "st"))
    db.upsert("docs", {"id": 1}, precepts=["cnt=serial()"])
    db.upsert("docs", {"id": 2}, precepts=["cnt=serial()"])
    assert db.get_namespace("docs").get_meta("_SERIAL_cnt") == "2"
    db.close()

    db2 = Reindexer(str(tmp_path / "st"))
    db2.open_namespace("docs", [])
    doc = {"id": 3}
    db2.upsert("docs", doc, precepts=["cnt=serial()"])
    assert doc["cnt"] == 3           # counter survived the restart
    db2.close()


def test_now_units():
    db = make_db()
    t0 = time.time()
    doc = {"id": 1}
    db.upsert("docs", doc,
              precepts=["ts=now()", "ts_ms=now(msec)", "ts_us=now(usec)",
                        "ts_ns=now(NSEC)"])
    t1 = time.time()
    stored = get(db, 1)
    assert t0 - 1 <= stored["ts"] <= t1 + 1
    assert t0 * 1e3 - 5 <= stored["ts_ms"] <= t1 * 1e3 + 5
    assert t0 * 1e6 <= stored["ts_us"] <= t1 * 1e6
    assert t0 * 1e9 <= stored["ts_ns"] <= t1 * 1e9


def test_literal_precept_and_bad_syntax():
    db = make_db()
    db.upsert("docs", {"id": 1}, precepts=["cnt=42", "note='hi'"])
    stored = get(db, 1)
    assert stored["cnt"] == 42 and stored["note"] == "hi"
    from reindexer_tpu.core.errors import ParamsError
    with pytest.raises(ParamsError):
        db.upsert("docs", {"id": 2}, precepts=["nonsense"])
    with pytest.raises(ParamsError):
        db.upsert("docs", {"id": 2}, precepts=["f=unknown_fn()"])


def test_precept_rejected_on_array_field():
    db = make_db()
    with pytest.raises(LogicError):
        db.upsert("docs", {"id": 1}, precepts=["tags=serial()"])


def test_sql_update_now_and_serial():
    db = make_db()
    db.upsert("docs", {"id": 1, "cnt": 0})
    db.upsert("docs", {"id": 2, "cnt": 0})
    t0 = int(time.time() * 1e3)
    db.update_query("UPDATE docs SET updated = now(msec) WHERE id = 1")
    stored = get(db, 1)
    assert t0 - 5 <= stored["updated"] <= int(time.time() * 1e3) + 5
    # serial() in UPDATE increments per matched row
    db.update_query("UPDATE docs SET cnt = serial()")
    vals = sorted(get(db, i)["cnt"] for i in (1, 2))
    assert vals == [1, 2]


def test_transaction_precepts():
    db = make_db()
    tx = db.new_transaction("docs")
    tx.upsert({"id": 1}, precepts=["cnt=serial()", "ts=now(msec)"])
    tx.upsert({"id": 2}, precepts=["cnt=serial()"])
    tx.commit()
    assert get(db, 1)["cnt"] == 1 and get(db, 2)["cnt"] == 2
    assert get(db, 1)["ts"] > 0


def test_skip_embedding_precept():
    from reindexer_tpu import FloatVectorOpts, VectorMetric
    from reindexer_tpu.core.payload import EmbeddingConfig
    db = Reindexer()
    db.open_namespace("emb", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("v", "vec_bf", vector_opts=FloatVectorOpts(
            dims=4, metric=VectorMetric.L2,
            embedding=EmbeddingConfig(fields=("txt",), endpoint="e1"))),
    ])
    calls = []

    def embedder(texts):
        calls.append(texts)
        return [[1.0, 2.0, 3.0, 4.0] for _ in texts]

    db.register_embedder("e1", embedder)
    db.upsert("emb", {"id": 1, "txt": "hello"})
    assert len(calls) == 1
    db.upsert("emb", {"id": 2, "txt": "world", "v": [0.0] * 4},
              precepts=["*=skip_embedding()"])
    assert len(calls) == 1           # embedder skipped
    db.upsert("emb", {"id": 3, "txt": "x", "v": [0.0] * 4},
              precepts=["v=skip_embedding()"])
    assert len(calls) == 1


def test_http_precepts():
    from reindexer_tpu.server.http import ReindexerServer
    srv = ReindexerServer(port=0)
    srv.start()
    try:
        base = f"http://127.0.0.1:{srv.port}/api/v1/db"

        def call(method, path, body=None):
            data = json.dumps(body).encode() if body is not None else None
            req = urllib.request.Request(base + path, data=data,
                                         method=method)
            req.add_header("Content-Type", "application/json")
            with urllib.request.urlopen(req) as resp:
                return json.loads(resp.read().decode())

        call("POST", "", {"name": "pdb"})
        call("POST", "/pdb/namespaces", {
            "name": "it", "indexes": [
                {"name": "id", "index_type": "hash", "field_type": "int",
                 "is_pk": True}]})
        out = call("PUT", "/pdb/namespaces/it/items"
                   "?precepts=cnt%3Dserial()&precepts=ts%3Dnow(msec)",
                   {"id": 7})
        assert out["items"][0]["cnt"] == 1
        assert out["items"][0]["ts"] > 0
        out = call("PUT", "/pdb/namespaces/it/items?precepts=cnt%3Dserial()",
                   {"id": 8})
        assert out["items"][0]["cnt"] == 2
    finally:
        srv.stop()


def test_rpc_precepts():
    from reindexer_tpu.net.rpc_client import RpcReindexer
    from reindexer_tpu.net.rpc_server import RpcServer
    srv = RpcServer(port=0)
    srv.start()
    try:
        c = RpcReindexer("127.0.0.1", srv.port, "rpcpdb")
        c.open_namespace("it", [
            IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))])
        doc = {"id": 1}
        c.upsert("it", doc, precepts=["cnt=serial()"])
        assert doc["cnt"] == 1       # computed item echoed back
        tx = c.new_transaction("it")
        tx.upsert({"id": 2}, precepts=["cnt=serial()"])
        tx.commit()
        res = c.select(Query("it").where("id", "=", 2))
        assert res.docs()[0]["cnt"] == 2
        c.close()
    finally:
        srv.stop()
