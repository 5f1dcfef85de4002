"""Continuous batching for concurrent KNN serving (query/dynbatch.py).

TPU-first serving feature: single-query selects that pile up behind an
in-flight device dispatch coalesce into ONE batched device program.
Correctness bar: batched results must be identical to the single-query
path for every engine."""
import threading
import time

import numpy as np
import pytest

from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts, IndexType,
                           Query, Reindexer, VectorMetric)
from reindexer_tpu.index.vector.params import (HnswSearchParams,
                                               KnnSearchParams)


def make_db(itype, n=800, dims=24, **vo):
    rng = np.random.default_rng(7)
    db = Reindexer()
    db.open_namespace("v", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("vec", itype, vector_opts=FloatVectorOpts(
            dims=dims, metric=VectorMetric.L2, **vo)),
    ])
    base = rng.normal(size=(n, dims)).astype(np.float32)
    tx = db.new_transaction("v")
    for i in range(n):
        tx.upsert({"id": i, "vec": base[i].tolist()})
    tx.commit()
    return db, rng.normal(size=(32, dims)).astype(np.float32)


def run_threads(db, queries, params, field="vec"):
    results = [None] * len(queries)
    errs = []

    def worker(i):
        try:
            res = db.select(Query("v").where_knn(field, queries[i], params))
            results[i] = ([d["id"] for d in res.docs()], res.ranks())
        except Exception as e:       # surface in the main thread
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(queries))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    return results


def slow_drain(index, delay=0.02):
    """Wrap select_batch_async so drains dwell in-flight — concurrent
    arrivals must queue and coalesce."""
    orig = index.select_batch_async

    def wrapped(queries, params):
        drain = orig(queries, params)

        def slow():
            time.sleep(delay)
            return drain()
        return slow
    index.select_batch_async = wrapped


@pytest.mark.parametrize("itype", [IndexType.VEC_BF, IndexType.HNSW])
def test_concurrent_equals_sequential(itype):
    vo = {"m": 8, "ef_construction": 64} if itype == IndexType.HNSW else {}
    db, queries = make_db(itype, **vo)
    params = (HnswSearchParams(k=10, ef=40) if itype == IndexType.HNSW
              else KnnSearchParams(k=10))
    # sequential ground truth (single-query path, batcher idle each time)
    want = []
    for q in queries:
        res = db.select(Query("v").where_knn("vec", q, params))
        want.append(([d["id"] for d in res.docs()], res.ranks()))

    index = db.get_namespace("v").get_index("vec")
    batchers = getattr(db.get_namespace("v"), "knn_batchers", {})
    st = next(iter(batchers.values()))
    q0, b0 = st.queries, st.batches
    assert st.max_batch == 1        # sequential pass: no coalescing

    slow_drain(index)
    got = run_threads(db, queries, params)
    for i, (w, g) in enumerate(zip(want, got)):
        if itype == IndexType.VEC_BF:
            # exact engine: batched path must be id-identical
            assert w[0] == g[0], f"query {i}: ids differ"
            np.testing.assert_allclose(w[1], g[1], rtol=1e-5)
        else:
            # ANN engine: the batched beam may run MORE iterations than a
            # solo query (the device loop's convergence test is shared
            # across the batch), so tails can differ — require >=90%
            # overlap per query
            overlap = len(set(w[0]) & set(g[0])) / len(w[0])
            assert overlap >= 0.9, f"query {i}: overlap {overlap}"

    assert st.queries - q0 == len(queries)
    # with a 20ms in-flight window and 32 concurrent threads, coalescing
    # must actually happen
    assert st.max_batch > 1
    assert st.batches - b0 < len(queries)
    # the counters surface in #perfstats (serving introspection)
    row = next(it.doc for it in db.select(Query("#perfstats"))
               if it.doc["name"] == "v")
    assert row["batched_queries"] == st.queries
    assert row["batched_dispatches"] == st.batches
    assert row["max_coalesced_batch"] == st.max_batch


def test_batching_respects_param_groups():
    db, queries = make_db(IndexType.VEC_BF)
    index = db.get_namespace("v").get_index("vec")
    slow_drain(index)
    results = [None] * 16
    params = [KnnSearchParams(k=5), KnnSearchParams(k=13)]

    def worker(i):
        res = db.select(Query("v").where_knn("vec", queries[i],
                                             params[i % 2]))
        results[i] = [d["id"] for d in res.docs()]

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(16):
        want = [d["id"] for d in db.select(
            Query("v").where_knn("vec", queries[i], params[i % 2])).docs()]
        assert results[i] == want
        assert len(results[i]) == (5 if i % 2 == 0 else 13)


def test_kill_switch(monkeypatch):
    monkeypatch.setenv("RX_TPU_DYNAMIC_BATCH", "0")
    db, queries = make_db(IndexType.VEC_BF, n=200)
    got = run_threads(db, queries[:8], KnnSearchParams(k=5))
    assert all(len(g[0]) == 5 for g in got)
    assert not getattr(db.get_namespace("v"), "knn_batchers", {})


def test_leader_error_propagates_not_wedges():
    db, queries = make_db(IndexType.VEC_BF, n=200)
    index = db.get_namespace("v").get_index("vec")
    orig = index.select_batch_async
    fail = {"on": True}

    def flaky(qs, params):
        if fail["on"]:
            raise RuntimeError("device exploded")
        return orig(qs, params)
    index.select_batch_async = flaky
    with pytest.raises(RuntimeError):
        db.select(Query("v").where_knn("vec", queries[0],
                                       KnnSearchParams(k=5)))
    fail["on"] = False
    # batcher must not stay busy after a leader failure
    res = db.select(Query("v").where_knn("vec", queries[1],
                                         KnnSearchParams(k=5)))
    assert len(res.docs()) == 5
