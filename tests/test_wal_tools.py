"""WAL-as-query surface (reference: wal/walselecter.cc) and the offline
storage repair tool (reference: cmd/reindexer_tool/repair_tool.cc)."""
import json
import os

import pytest

from reindexer_tpu import (IndexDef, IndexOpts, Query, QueryError, Reindexer)
from reindexer_tpu.core.errors import OutdatedWalError


IDX = [IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
       IndexDef("val", "tree", "int")]


def test_wal_select_basic():
    db = Reindexer()
    from reindexer_tpu.replication import ReplicationState
    ReplicationState(db)                     # attach the WAL ring
    db.open_namespace("a", IDX)
    for i in range(5):
        db.upsert("a", {"id": i, "val": i})
    db.delete("a", {"id": 3})

    res = db.select(Query("a").where("#lsn", ">", 0))
    docs = list(res.docs())
    ops = [d["op"] for d in docs]
    # 2 add_index + 5 upserts + 1 delete
    assert ops.count("upsert") == 5 and ops.count("delete") == 1
    lsns = [d["lsn"] for d in docs]
    assert lsns == sorted(lsns)
    # from mid-LSN: strictly after
    mid = lsns[3]
    res2 = db.select(Query("a").where("#lsn", ">", mid))
    assert all(d["lsn"] > mid for d in res2.docs())
    # >= is inclusive
    res3 = db.select(Query("a").where("#lsn", ">=", mid))
    assert min(d["lsn"] for d in res3.docs()) == mid
    # limit/offset respected
    res4 = db.select(Query("a").where("#lsn", ">", 0).limit(2))
    assert len(res4) == 2 and res4.total_count == len(docs)


def test_wal_select_filters_namespace():
    db = Reindexer()
    from reindexer_tpu.replication import ReplicationState
    ReplicationState(db)
    db.open_namespace("a", IDX)
    db.open_namespace("b", IDX)
    db.upsert("a", {"id": 1, "val": 1})
    db.upsert("b", {"id": 2, "val": 2})
    recs = [d for d in db.select(Query("b").where("#lsn", ">", 0)).docs()
            if d["op"] == "upsert"]
    assert len(recs) == 1 and recs[0]["ns"] == "b"


def test_wal_select_validation():
    db = Reindexer()
    db.open_namespace("a", IDX)
    with pytest.raises(QueryError):
        db.select(Query("a").where("#lsn", ">", 0).where("val", ">", 1))
    with pytest.raises(QueryError):
        db.select(Query("a").where("#lsn", "<", 10))


def test_wal_select_outdated():
    db = Reindexer()
    from reindexer_tpu.replication import ReplicationState
    rs = ReplicationState(db)
    rs.wal.capacity = 4
    db.open_namespace("a", IDX)
    for i in range(20):
        db.upsert("a", {"id": i, "val": i})
    with pytest.raises(OutdatedWalError):
        db.select(Query("a").where("#lsn", ">", 1))


def test_cli_wal_command(tmp_path):
    from reindexer_tpu.tools.cli import execute_line
    import io
    db = Reindexer()
    from reindexer_tpu.replication import ReplicationState
    ReplicationState(db)
    db.open_namespace("a", IDX)
    db.upsert("a", {"id": 1, "val": 7})
    out = io.StringIO()
    execute_line(db, "\\wal a 0", out)
    lines = [json.loads(ln) for ln in out.getvalue().splitlines()]
    assert any(r["op"] == "upsert" for r in lines)


def test_repair_tool(tmp_path):
    root = str(tmp_path / "store")
    db = Reindexer(root)
    db.open_namespace("a", IDX)
    for i in range(10):
        db.upsert("a", {"id": i, "val": i})
    db.close()

    # corrupt: torn WAL tail + a broken snapshot line + broken meta.json
    wal = os.path.join(root, "a", "wal.jsonl")
    with open(wal, "a", encoding="utf-8") as f:
        f.write('{"op": "upsert", "doc": {"id": 99')      # torn
    items = os.path.join(root, "a", "items.jsonl")
    if os.path.isfile(items):
        with open(items, "a", encoding="utf-8") as f:
            f.write("NOT JSON\n")
    meta = os.path.join(root, "a", "meta.json")
    with open(meta, "w", encoding="utf-8") as f:
        f.write("{broken")

    from reindexer_tpu.storage.engine import repair_storage
    report = repair_storage(root)
    assert "a" in report
    assert report["a"]["wal_dropped"] == 1
    assert "meta.json" in report["a"]["quarantined"]
    assert not report["a"]["ok"]

    # a repaired store loads cleanly and retains the valid rows
    db2 = Reindexer(root)
    res = db2.select(Query("a").where("val", ">=", 0))
    assert len(res) == 10
    db2.close()

    # idempotent: second run reports clean
    report2 = repair_storage(root)
    assert report2["a"]["ok"]


def test_cli_repair_flag(tmp_path, capsys):
    root = str(tmp_path / "s2")
    db = Reindexer(root)
    db.open_namespace("a", IDX)
    db.upsert("a", {"id": 1, "val": 1})
    db.close()
    from reindexer_tpu.tools.cli import main
    rc = main(["--dsn", f"builtin://{root}", "--repair"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["a"]["ok"]
