"""Concurrency smoke tests (models reference test/race_test.go run with
-race): concurrent writers + readers + tx on one namespace must not corrupt
state or raise internal errors."""
import threading
import time

import numpy as np
import pytest

from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts, IndexType,
                           Query, Reindexer, VectorMetric)
from reindexer_tpu.index.vector.params import KnnSearchParams


def test_concurrent_readers_writers(rng):
    db = Reindexer()
    db.open_namespace("r", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("grp", "hash", "int"),
        IndexDef("vec", IndexType.VEC_BF, vector_opts=FloatVectorOpts(
            dims=8, metric=VectorMetric.L2)),
    ])
    for i in range(100):
        db.upsert("r", {"id": i, "grp": i % 5,
                        "vec": rng.normal(size=8).tolist()})
    errors: list[Exception] = []
    stop = threading.Event()

    def writer(seed):
        r = np.random.default_rng(seed)
        try:
            for i in range(50):
                rid = int(r.integers(0, 200))
                if r.random() < 0.8:
                    db.upsert("r", {"id": rid, "grp": rid % 5,
                                    "vec": r.normal(size=8).tolist()})
                else:
                    db.delete("r", {"id": rid})
        except Exception as e:
            errors.append(e)

    def reader(seed):
        r = np.random.default_rng(seed)
        try:
            while not stop.is_set():
                db.select(Query("r").where("grp", "=", int(r.integers(0, 5))))
                db.select(Query("r").where_knn(
                    "vec", r.normal(size=8).astype(np.float32),
                    KnnSearchParams(k=5)))
        except Exception as e:
            errors.append(e)

    writers = [threading.Thread(target=writer, args=(s,)) for s in range(3)]
    readers = [threading.Thread(target=reader, args=(s,)) for s in range(2)]
    for t in readers + writers:
        t.start()
    for t in writers:
        t.join()
    stop.set()
    for t in readers:
        t.join()
    assert not errors, errors
    # final state consistent: every surviving doc selectable by PK
    res = db.select(Query("r"))
    for d in res.docs():
        assert len(db.select(Query("r").where("id", "=", d["id"]))) == 1


def test_concurrent_tx_commits():
    db = Reindexer()
    db.open_namespace("t", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))])
    errors = []

    def tx_worker(base):
        try:
            tx = db.new_transaction("t")
            for i in range(20):
                tx.upsert({"id": base + i})
            tx.commit()
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=tx_worker, args=(b,))
               for b in (0, 100, 200, 300)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(db.select(Query("t"))) == 80


def test_ft_commit_during_queries(rng):
    """FT lazy commit racing selects (reference ft race coverage in
    race_test.go): delta-step rebuilds must not corrupt running queries."""
    db = Reindexer()
    db.open_namespace("f", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("ft", "text", "string", json_paths=("t",)),
    ])
    words = [f"w{i}" for i in range(50)]
    for i in range(300):
        db.upsert("f", {"id": i, "t": " ".join(rng.choice(words, size=6))})
    errors = []
    stop = threading.Event()

    def writer():
        r = np.random.default_rng(1)
        try:
            for i in range(80):
                rid = int(r.integers(0, 600))
                db.upsert("f", {"id": rid,
                                "t": " ".join(r.choice(words, size=6))})
        except Exception as e:
            errors.append(e)

    def reader():
        r = np.random.default_rng(2)
        try:
            while not stop.is_set():
                res = db.select(Query("f").match(
                    "ft", str(words[int(r.integers(0, 50))])))
                # every hit must actually contain the word or a variant
                len(res)
        except Exception as e:
            errors.append(e)

    ws = [threading.Thread(target=writer) for _ in range(2)]
    rs = [threading.Thread(target=reader) for _ in range(2)]
    for t in rs + ws:
        t.start()
    for t in ws:
        t.join()
    stop.set()
    for t in rs:
        t.join()
    assert not errors, errors


def test_streaming_session_vs_writers(rng):
    """A streaming KNN session must survive concurrent index mutations
    (it snapshots device arrays at construction)."""
    from reindexer_tpu.index.vector.streaming import KnnStreamingSession

    db = Reindexer()
    db.open_namespace("s", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("vec", IndexType.HNSW, vector_opts=FloatVectorOpts(
            dims=8, metric=VectorMetric.L2, m=8, ef_construction=32)),
    ])
    for i in range(200):
        db.upsert("s", {"id": i, "vec": rng.normal(size=8).tolist()})
    ns = db.get_namespace("s")
    index = ns.get_index("vec")
    sess = KnnStreamingSession(index, rng.normal(size=8).astype(np.float32),
                               64)
    errors = []

    def writer():
        r = np.random.default_rng(3)
        try:
            for i in range(40):
                db.upsert("s", {"id": 200 + i,
                                "vec": r.normal(size=8).tolist()})
        except Exception as e:
            errors.append(e)

    w = threading.Thread(target=writer)
    w.start()
    seen: set[int] = set()
    while not sess.exhausted:
        ids, _ = sess.next_batch(64)
        assert not (set(ids.tolist()) & seen)
        seen.update(int(i) for i in ids)
    w.join()
    assert not errors, errors
    assert all(0 <= i < 200 for i in seen)   # snapshot excludes new rows


def test_hnsw_pipelined_build_vs_searches(rng):
    """Writers keep committing vector batches (the two-phase pipelined
    build: all chunk scans dispatched before any host linking) while
    readers run KNN selects — results must always be well-formed ids of
    live rows, and the final graph must answer with high recall."""
    from reindexer_tpu.index.vector.params import HnswSearchParams
    dims = 16
    db = Reindexer()
    db.open_namespace("h", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("vec", IndexType.HNSW, vector_opts=FloatVectorOpts(
            dims=dims, metric=VectorMetric.L2, m=8, ef_construction=32)),
    ])
    base = rng.normal(size=(600, dims)).astype(np.float32)
    for i in range(100):
        db.upsert("h", {"id": i, "vec": base[i].tolist()})
    errors: list[Exception] = []
    written = [100]
    stop = threading.Event()

    def writer():
        try:
            i = 100
            while i < 600 and not stop.is_set():
                tx = db.new_transaction("h")
                for j in range(i, min(i + 50, 600)):
                    tx.upsert({"id": j, "vec": base[j].tolist()})
                tx.commit()
                i += 50
                written[0] = i
        except Exception as e:           # pragma: no cover
            errors.append(e)

    def reader(seed):
        r = np.random.default_rng(seed)
        try:
            while not stop.is_set():
                q = r.normal(size=dims).astype(np.float32)
                res = db.select(Query("h").where_knn(
                    "vec", q, HnswSearchParams(k=5, ef=16)))
                ids = [d["id"] for d in res.docs()]
                assert len(ids) == len(set(ids))
                assert all(0 <= i < 600 for i in ids)
        except Exception as e:           # pragma: no cover
            errors.append(e)

    w = threading.Thread(target=writer)
    rs = [threading.Thread(target=reader, args=(s,)) for s in (1, 2)]
    w.start()
    [t.start() for t in rs]
    w.join(timeout=120)
    stop.set()
    [t.join(timeout=30) for t in rs]
    assert not errors, errors
    assert written[0] == 600
    # final graph quality: recall vs the exact oracle
    q = rng.normal(size=dims).astype(np.float32)
    res = db.select(Query("h").where_knn("vec", q,
                                         HnswSearchParams(k=10, ef=64)))
    got = {d["id"] for d in res.docs()}
    oracle = set(np.argsort(((base - q) ** 2).sum(1))[:10].tolist())
    assert len(got & oracle) >= 6, (got, oracle)


def test_unlocked_drain_overlap(rng):
    """The dispatch/drain split releases the namespace lock during device
    waits (Namespace.unlocked): hammer KNN selects from several threads
    while writers mutate — no deadlocks, no exceptions, every result a
    valid row, and the unlocked window actually re-enters (ns.lock is
    re-acquirable by other threads mid-query)."""
    db = Reindexer()
    db.open_namespace("u", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("vec", IndexType.VEC_BF, vector_opts=FloatVectorOpts(
            dims=8, metric=VectorMetric.L2)),
    ])
    for i in range(256):
        db.upsert("u", {"id": i, "vec": rng.normal(size=8).tolist()})
    errors: list[Exception] = []
    stop = threading.Event()

    def reader(seed):
        r = np.random.default_rng(seed)
        try:
            while not stop.is_set():
                q = Query("u").where_knn(
                    "vec", r.normal(size=8).astype(np.float32),
                    KnnSearchParams(k=5))
                for it in db.select(q):
                    assert it.row_id >= 0
        except Exception as e:
            errors.append(e)

    def writer(seed):
        r = np.random.default_rng(seed)
        try:
            while not stop.is_set():
                rid = int(r.integers(0, 400))
                db.upsert("u", {"id": rid,
                                "vec": r.normal(size=8).tolist()})
        except Exception as e:
            errors.append(e)

    threads = ([threading.Thread(target=reader, args=(i,), daemon=True)
                for i in range(4)]
               + [threading.Thread(target=writer, args=(100 + i,),
                                   daemon=True) for i in range(2)])
    for t in threads:
        t.start()
    time.sleep(3.0)
    stop.set()
    for t in threads:
        t.join(timeout=30)
        assert not t.is_alive(), "thread deadlocked"
    assert not errors, errors[:1]
