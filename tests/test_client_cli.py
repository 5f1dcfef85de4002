"""Network client + CLI tool tests (models the reference Go connector
behavioral tests and reindexer_tool dump/restore round-trip)."""
import io
import json

import pytest

from reindexer_tpu import IndexDef, IndexOpts, Query, Reindexer, NotFoundError
from reindexer_tpu.client import RemoteReindexer
from reindexer_tpu.server.http import ReindexerServer
from reindexer_tpu.tools.cli import dump, execute_line


@pytest.fixture(scope="module")
def server():
    srv = ReindexerServer(port=0)
    srv.start()
    yield srv
    srv.stop()


def test_remote_crud_and_query(server):
    c = RemoteReindexer(f"http://127.0.0.1:{server.port}", "clidb")
    c.open_namespace("r", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("year", "tree", "int"),
    ])
    for i in range(5):
        c.upsert("r", {"id": i, "year": 2000 + i})
    res = c.select(Query("r").where("year", ">", 2001).sort("id"))
    assert [d["id"] for d in res.docs()] == [2, 3, 4]
    res2 = c.select("SELECT * FROM r WHERE id = 1")
    assert res2.docs()[0]["year"] == 2001
    # aggregation over the wire
    res3 = c.select(Query("r").aggregate_sum("year"))
    assert res3.aggregations[0].value == sum(2000 + i for i in range(5))
    # meta
    c.put_meta("r", "mk", "mv")
    assert c.get_meta("r", "mk") == "mv"
    assert c.get_meta("r", "nope") is None
    # tx
    tx = c.new_transaction("r")
    tx.upsert({"id": 100, "year": 2100})
    tx.commit()
    assert len(c.select(Query("r"))) == 6
    # index listing round-trips definitions
    defs = {d.name for d in c.index_defs("r")}
    assert defs == {"id", "year"}
    # errors surface as typed exceptions
    with pytest.raises(NotFoundError):
        c.select(Query("missing_ns"))


def test_tx_batching_and_query_cache(server):
    """Go-connector analogs: tx items ship in bulk batches (one request
    per <=batch_size same-mode run), and the client query cache serves
    repeats without a request until a write invalidates the namespace."""
    c = RemoteReindexer(f"http://127.0.0.1:{server.port}", "clidb2",
                        cache_queries=8)
    c.open_namespace("b", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))])
    calls = []
    orig = c._call
    c._call = lambda m, p, body=None: (calls.append((m, p)),
                                       orig(m, p, body))[1]

    tx = c.new_transaction("b")
    for i in range(1200):
        tx.upsert({"id": i})
    tx.delete({"id": 0})
    tx.commit()
    item_calls = [x for x in calls if "/items" in x[1]]
    # 1200 upserts at batch 500 -> 3 PUTs; mode switch -> 1 DELETE
    assert len(item_calls) == 4, item_calls
    assert [m for m, _ in item_calls] == ["PUT", "PUT", "PUT", "DELETE"]
    assert len(c.select(Query("b"))) == 1199

    # cache: repeat select is served locally
    calls.clear()
    q = Query("b").where("id", "<", 10)
    r1 = c.select(q)
    r2 = c.select(Query("b").where("id", "<", 10))
    assert len([x for x in calls if "/query" in x[1]]) == 1
    assert r2 is r1
    # a write through this client invalidates the namespace's entries
    c.upsert("b", {"id": 5000})
    c.select(Query("b").where("id", "<", 10))
    assert len([x for x in calls if "/query" in x[1]]) == 2


def test_cli_dump_restore(tmp_path):
    db = Reindexer()
    db.open_namespace("d", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("name", "hash", "string"),
    ])
    for i in range(10):
        db.upsert("d", {"id": i, "name": f"n{i}"})
    db.put_meta("d", "k", "v")

    buf = io.StringIO()
    n = dump(db, None, buf)
    assert n == 10

    db2 = Reindexer()
    out = io.StringIO()
    for line in buf.getvalue().splitlines():
        execute_line(db2, line, out)
    assert len(db2.select(Query("d"))) == 10
    assert db2.get_meta("d", "k") == "v"
    defs = {d.name for d in db2.get_namespace("d").index_defs()}
    assert defs == {"id", "name"}


def test_cli_sql_and_commands():
    db = Reindexer()
    out = io.StringIO()
    execute_line(db, '\\namespaces add {"name": "c", "indexes": '
                 '[{"name": "id", "index_type": "hash", "field_type": '
                 '"int", "is_pk": true}]}', out)
    execute_line(db, '\\upsert c {"id": 1, "x": "y"}', out)
    execute_line(db, "SELECT * FROM c", out)
    lines = [l for l in out.getvalue().splitlines() if l.startswith("{")]
    assert json.loads(lines[0]) == {"id": 1, "x": "y"}


def test_cli_wal_dump():
    """\\dump wal prints replication log records from an LSN
    (reference: reindexer_tool WAL dump)."""
    import io
    from reindexer_tpu import Reindexer
    from reindexer_tpu.replication import ReplicationState
    from reindexer_tpu.tools.cli import execute_line
    db = Reindexer()
    ReplicationState(db)
    out = io.StringIO()
    execute_line(db, '\\namespaces add {"name": "w", "indexes": '
                 '[{"name": "id", "index_type": "hash", '
                 '"field_type": "int", "is_pk": true}]}', out)
    execute_line(db, '\\upsert w {"id": 1}', out)
    execute_line(db, '\\upsert w {"id": 2}', out)
    o1, o2 = io.StringIO(), io.StringIO()
    execute_line(db, "\\dump wal", o1)
    execute_line(db, "\\dump wal 2", o2)
    assert len(o1.getvalue().splitlines()) == 3
    assert len(o2.getvalue().splitlines()) == 1
