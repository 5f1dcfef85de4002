"""Streaming KNN tests (models reference streaming_knn_test.go +
hnsw_streaming_search_test.cc): KNN without k/radius on HNSW streams batches
until offset+limit survivors pass the scalar post-filters."""
import numpy as np
import pytest

from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts, IndexType,
                           Query, QueryError, Reindexer, VectorMetric)
from reindexer_tpu.index.vector.params import HnswSearchParams
from reindexer_tpu.index.vector.streaming import StreamingKnnEstimator


def test_estimator_matches_reference():
    # example from knn_streaming_estimator.h comment:
    # (50+20) * 100000 / 10000 = 700
    assert StreamingKnnEstimator.estimate_ef(10_000, 100_000, 50, 20) == 700
    # clamped to [100, 800]
    assert StreamingKnnEstimator.estimate_ef(100_000, 100_000, 0, 1) == 100
    assert StreamingKnnEstimator.estimate_ef(10, 100_000, 50, 50) == 800


@pytest.fixture
def db(rng):
    d = Reindexer()
    d.open_namespace("v", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("grp", "hash", "int"),
        IndexDef("vec", IndexType.HNSW, vector_opts=FloatVectorOpts(
            dims=8, metric=VectorMetric.L2, m=8, ef_construction=48)),
    ])
    base = rng.normal(size=(300, 8)).astype(np.float32)
    for i in range(300):
        d.upsert("v", {"id": i, "grp": i % 3, "vec": base[i].tolist()})
    d._base = base
    return d


def test_streaming_with_filter(db, rng):
    q_vec = rng.normal(size=8).astype(np.float32)
    res = db.select(Query("v")
                    .where("grp", "=", 1)
                    .where_knn("vec", q_vec, HnswSearchParams())
                    .limit(10))
    assert len(res) == 10
    assert all(d["grp"] == 1 for d in res.docs())
    # results come back in ascending L2 order
    ranks = [it.rank for it in res]
    assert ranks == sorted(ranks)
    # streamed top results must match the exact filtered oracle
    base = db._base
    d2 = np.sum((base - q_vec) ** 2, axis=1)
    order = np.argsort(d2)
    want = [int(i) for i in order if i % 3 == 1][:10]
    got = [d["id"] for d in res.docs()]
    overlap = len(set(got) & set(want))
    assert overlap >= 8   # ANN tolerance


def test_streaming_offset(db, rng):
    q_vec = rng.normal(size=8).astype(np.float32)
    full = db.select(Query("v").where("grp", "=", 0)
                     .where_knn("vec", q_vec, HnswSearchParams()).limit(20))
    paged = db.select(Query("v").where("grp", "=", 0)
                      .where_knn("vec", q_vec, HnswSearchParams())
                      .offset(5).limit(5))
    assert [d["id"] for d in paged.docs()] == \
        [d["id"] for d in full.docs()][5:10]


def test_continuation_is_incremental(db, rng):
    """True streaming continuation (reference ContinueStreamingSearch,
    hnswalg.h:1945): batches are disjoint, collectively match the exact
    top-N, and a continuation resumes the traversal instead of re-running
    it — two streamed batches cost no more device iterations than one
    fresh double-size search (+1 batch of slack), where the round-1
    re-search design cost ~2x."""
    from reindexer_tpu.index.vector.streaming import KnnStreamingSession

    q_vec = rng.normal(size=8).astype(np.float32)
    ns = db.get_namespace("v")
    index = ns.get_index("vec")

    s1 = KnnStreamingSession(index, q_vec, 64)
    ids_a, sc_a = s1.next_batch(64)
    it_a = s1.iters_total
    ids_b, sc_b = s1.next_batch(64)
    it_b = s1.iters_total - it_a

    # disjoint by the visited-bitset construction
    assert not set(ids_a.tolist()) & set(ids_b.tolist())
    # each batch ranked best-first; batch 2 strictly after batch 1
    assert list(sc_a) == sorted(sc_a, reverse=True)
    assert list(sc_b) == sorted(sc_b, reverse=True)
    assert sc_a[-1] >= sc_b[0]
    # union ~ exact top-(|a|+|b|) (small graph, beam covers it)
    base = db._base
    d2 = np.sum((base - q_vec) ** 2, axis=1)
    n = len(ids_a) + len(ids_b)
    want = set(np.argsort(d2)[:n].tolist())
    got = set(ids_a.tolist()) | set(ids_b.tolist())
    # at this depth the stream has consumed >half the 300-node graph —
    # beam quality degrades at the tail, as in any bounded-frontier ANN
    assert len(got & want) >= int(0.75 * n)

    s2 = KnnStreamingSession(index, q_vec, 64)
    s2.next_batch(128)
    it_fresh = s2.iters_total
    assert it_a + it_b <= it_fresh + max(it_a, it_b)


def test_session_survives_index_mutation(db, rng):
    """The session snapshots device arrays: concurrent upserts must not
    corrupt a running stream (ids stay valid for the snapshot)."""
    from reindexer_tpu.index.vector.streaming import KnnStreamingSession

    q_vec = rng.normal(size=8).astype(np.float32)
    ns = db.get_namespace("v")
    index = ns.get_index("vec")
    s = KnnStreamingSession(index, q_vec, 64)
    ids_a, _ = s.next_batch(64)
    db.upsert("v", {"id": 500, "grp": 0,
                    "vec": rng.normal(size=8).astype(np.float32).tolist()})
    ids_b, _ = s.next_batch(64)
    assert not set(ids_a.tolist()) & set(ids_b.tolist())
    assert all(0 <= i < 500 for i in ids_b.tolist())


def test_streaming_requires_hnsw(rng):
    d = Reindexer()
    d.open_namespace("b", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("vec", IndexType.VEC_BF, vector_opts=FloatVectorOpts(
            dims=4, metric=VectorMetric.L2)),
    ])
    d.upsert("b", {"id": 1, "vec": [0.0, 0, 0, 0]})
    with pytest.raises(QueryError):
        d.select(Query("b").where_knn(
            "vec", np.zeros(4, np.float32), HnswSearchParams()).limit(1))
