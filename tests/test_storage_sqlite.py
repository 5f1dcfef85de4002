"""SQLite storage engine (reference: the LevelDB IDataStorage backend,
storagefactory.cc DSN selection) — same behavioral surface as the JSONL
engine: snapshot + WAL replay, index/meta persistence, drop/rename,
ANN cache integration."""
import numpy as np

from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts, IndexType,
                           Query, Reindexer, VectorMetric)
from reindexer_tpu.index.vector.params import KnnSearchParams
from reindexer_tpu.storage.engine import SqliteStorage


def dsn(tmp_path):
    return "sqlite://" + str(tmp_path / "db")


def test_snapshot_and_wal_replay(tmp_path):
    db = Reindexer(dsn(tmp_path))
    assert isinstance(db.storage, SqliteStorage)
    db.open_namespace("t", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("name", "hash", "string")])
    for i in range(20):
        db.upsert("t", {"id": i, "name": f"n{i}"})
    db.flush()                       # snapshot
    for i in range(20, 30):
        db.upsert("t", {"id": i, "name": f"n{i}"})   # WAL-only
    db.delete("t", {"id": 5})
    db.put_meta("t", "k", "v")
    db.storage.close()

    db2 = Reindexer(dsn(tmp_path))
    got = sorted(d["id"] for d in db2.select(Query("t")).docs())
    assert got == [i for i in range(30) if i != 5]
    assert db2.get_meta("t", "k") == "v"
    assert db2.select(Query("t").where("name", "=", "n7")).docs()[0]["id"] == 7


def test_index_defs_persist(tmp_path):
    db = Reindexer(dsn(tmp_path))
    db.open_namespace("t", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))])
    db.add_index("t", IndexDef("score", "tree", "int"))
    db.upsert("t", {"id": 1, "score": 10})
    db.flush()
    db.storage.close()
    db2 = Reindexer(dsn(tmp_path))
    res = db2.select(Query("t").where("score", ">", 5))
    assert [d["id"] for d in res.docs()] == [1]


def test_drop_and_rename(tmp_path):
    db = Reindexer(dsn(tmp_path))
    db.open_namespace("a", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))])
    db.upsert("a", {"id": 1})
    db.flush()
    db.rename_namespace("a", "b")
    assert [d["id"] for d in db.select(Query("b")).docs()] == [1]
    db.drop_namespace("b")
    db.storage.close()
    db2 = Reindexer(dsn(tmp_path))
    assert "a" not in db2.namespace_names()
    assert "b" not in db2.namespace_names()


def test_ann_cache_roundtrip(tmp_path, rng):
    db = Reindexer(dsn(tmp_path))
    db.open_namespace("v", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("vec", IndexType.HNSW, vector_opts=FloatVectorOpts(
            dims=8, metric=VectorMetric.L2, m=8, ef_construction=32))])
    base = rng.normal(size=(50, 8)).astype(np.float32)
    for i in range(50):
        db.upsert("v", {"id": i, "vec": base[i].tolist()})
    q = rng.normal(size=8).astype(np.float32)
    want = [d["id"] for d in db.select(
        Query("v").where_knn("vec", q, KnnSearchParams(k=5))).docs()]
    db.flush()
    db.storage.close()
    db2 = Reindexer(dsn(tmp_path))
    got = [d["id"] for d in db2.select(
        Query("v").where_knn("vec", q, KnnSearchParams(k=5))).docs()]
    assert got == want


def test_transactional_wal_no_torn_tail(tmp_path):
    """sqlite WAL appends are transactional — a mid-write crash cannot
    leave a torn record (the jsonl engine tolerates; this engine
    prevents)."""
    db = Reindexer(dsn(tmp_path))
    db.open_namespace("t", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))])
    db.upsert("t", {"id": 1})
    # no flush: WAL only, then hard close
    db.storage.close()
    db2 = Reindexer(dsn(tmp_path))
    assert [d["id"] for d in db2.select(Query("t")).docs()] == [1]
