"""Persistence tests: snapshot + WAL replay + ANN cache reuse
(models reference storage tests + ann_storage_cache behavior)."""
import os

import numpy as np
import pytest

from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts, IndexType,
                           Query, Reindexer, VectorMetric)
from reindexer_tpu.index.vector.params import HnswSearchParams


def test_snapshot_and_wal_replay(tmp_path):
    path = str(tmp_path / "db")
    db = Reindexer(path)
    db.open_namespace("t", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("name", "hash", "string"),
    ])
    db.upsert("t", {"id": 1, "name": "a"})
    db.upsert("t", {"id": 2, "name": "b"})
    db.flush()                               # snapshot
    db.upsert("t", {"id": 3, "name": "c"})  # lands only in WAL
    db.delete("t", {"id": 1})
    db.put_meta("t", "k", "v")
    db.storage.close()

    db2 = Reindexer(path)
    res = db2.select(Query("t").sort("id"))
    assert [d["id"] for d in res.docs()] == [2, 3]
    assert db2.get_meta("t", "k") == "v"


def test_index_defs_persist(tmp_path):
    path = str(tmp_path / "db")
    db = Reindexer(path)
    db.open_namespace("t", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("year", "tree", "int"),
    ])
    db.upsert("t", {"id": 1, "year": 2020})
    db.flush()
    db.close()
    db2 = Reindexer(path)
    defs = {d.name: d for d in db2.get_namespace("t").index_defs()}
    assert set(defs) == {"id", "year"}
    assert defs["id"].opts.is_pk


def test_ann_cache_roundtrip(tmp_path, rng):
    path = str(tmp_path / "db")
    db = Reindexer(path)
    db.open_namespace("v", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("vec", IndexType.HNSW, vector_opts=FloatVectorOpts(
            dims=8, metric=VectorMetric.L2, m=8, ef_construction=32)),
    ])
    base = rng.normal(size=(80, 8)).astype(np.float32)
    for i in range(80):
        db.upsert("v", {"id": i, "vec": base[i].tolist()})
    q = rng.normal(size=8).astype(np.float32)
    before = db.select(Query("v").where_knn("vec", q,
                                            HnswSearchParams(k=5, ef=32)))
    db.close()
    assert os.path.isdir(os.path.join(path, "ann_cache"))

    db2 = Reindexer(path)
    idx = db2.get_namespace("v").get_index("vec")
    # cache applied -> no pending rebuild work
    assert len(idx._pending) == 0
    after = db2.select(Query("v").where_knn("vec", q,
                                            HnswSearchParams(k=5, ef=32)))
    assert [d["id"] for d in before.docs()] == [d["id"] for d in after.docs()]


def test_ann_cache_stale_dropped(tmp_path, rng):
    path = str(tmp_path / "db")
    db = Reindexer(path)
    db.open_namespace("v", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("vec", IndexType.HNSW, vector_opts=FloatVectorOpts(
            dims=4, metric=VectorMetric.L2, m=4, ef_construction=16)),
    ])
    for i in range(20):
        db.upsert("v", {"id": i, "vec": [float(i), 0, 0, 0]})
    db.select(Query("v").where_knn("vec", np.zeros(4, np.float32),
                                   HnswSearchParams(k=1, ef=8)))
    db.flush()
    # WAL-only extra write makes the cache stale on next boot
    db.upsert("v", {"id": 99, "vec": [99.0, 0, 0, 0]})
    db.storage.close()

    db2 = Reindexer(path)
    res = db2.select(Query("v").where_knn(
        "vec", np.asarray([99.0, 0, 0, 0], np.float32),
        HnswSearchParams(k=1, ef=8)))
    assert res.docs()[0]["id"] == 99


def test_ann_cache_not_clobbering_wal_updates(tmp_path, rng):
    """An upsert of an EXISTING doc after flush (item count unchanged) lands
    in the WAL; on reload the cached vectors must not clobber the replayed
    update (advisor finding: cache must apply BEFORE WAL replay)."""
    path = str(tmp_path / "db")
    db = Reindexer(path)
    db.open_namespace("v", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("vec", IndexType.HNSW, vector_opts=FloatVectorOpts(
            dims=4, metric=VectorMetric.L2, m=4, ef_construction=16)),
    ])
    for i in range(20):
        db.upsert("v", {"id": i, "vec": [float(i), 0, 0, 0]})
    db.select(Query("v").where_knn("vec", np.zeros(4, np.float32),
                                   HnswSearchParams(k=1, ef=8)))
    db.flush()
    # count-preserving update: doc 5 moves far away; only in the WAL
    db.upsert("v", {"id": 5, "vec": [500.0, 0, 0, 0]})
    db.storage.close()

    db2 = Reindexer(path)
    res = db2.select(Query("v").where_knn(
        "vec", np.asarray([500.0, 0, 0, 0], np.float32),
        HnswSearchParams(k=1, ef=8)))
    assert res.docs()[0]["id"] == 5, \
        "stale ANN cache served the pre-update vector"
    # and the old location must NOT still answer for doc 5
    near_old = db2.select(Query("v").where_knn(
        "vec", np.asarray([5.0, 0, 0, 0], np.float32),
        HnswSearchParams(k=1, ef=8)))
    assert near_old.docs()[0]["id"] != 5


def test_drop_namespace_removes_storage(tmp_path):
    path = str(tmp_path / "db")
    db = Reindexer(path)
    db.open_namespace("t", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))])
    db.upsert("t", {"id": 1})
    db.flush()
    db.drop_namespace("t")
    db2 = Reindexer(path)
    assert "t" not in db2.namespace_names()


def test_torn_wal_tail_skipped(tmp_path):
    """Crash-torn WAL/snapshot records are skipped, not fatal (reference:
    repair_tool semantics)."""
    path = str(tmp_path / "db")
    db = Reindexer(path)
    db.open_namespace("t", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))])
    db.upsert("t", {"id": 1})
    db.upsert("t", {"id": 2})
    db.storage.close()
    # simulate a torn append
    with open(f"{path}/t/wal.jsonl", "a", encoding="utf-8") as f:
        f.write('{"op": "upsert", "doc": {"id": 3')
    db2 = Reindexer(path)
    got = sorted(d["id"] for d in db2.select(Query("t")).docs())
    assert got == [1, 2]
