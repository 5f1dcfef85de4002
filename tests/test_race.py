"""Concurrency smoke tests (models reference test/race_test.go run with
-race): concurrent writers + readers + tx on one namespace must not corrupt
state or raise internal errors."""
import threading

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
