"""Hybrid FT+KNN tests (models reference unit/hybrid.cc + hybrid.md
semantics): RRF default fusion, RRF(rank_const=N), linear rerank expressions,
AND/OR combination, scalar post-filters."""
import numpy as np
import pytest

from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts, IndexType,
                           Query, Reindexer, VectorMetric)
from reindexer_tpu.index.vector.params import HnswSearchParams, KnnSearchParams


@pytest.fixture
def db(rng):
    d = Reindexer()
    d.open_namespace("h", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("txt", "text", "string", json_paths=("title",)),
        IndexDef("vec", IndexType.VEC_BF, vector_opts=FloatVectorOpts(
            dims=4, metric=VectorMetric.L2)),
    ])
    # ids 0..4 match FT "apple"; ids 3..7 are close to the query vector
    for i in range(10):
        title = "apple pie" if i < 5 else "banana split"
        vec = [float(i), 0.0, 0.0, 0.0]
        d.upsert("h", {"id": i, "title": title, "vec": vec})
    return d


QV = np.array([5.0, 0, 0, 0], dtype=np.float32)


def test_hybrid_default_rrf(db):
    res = db.select(Query("h")
                    .match("txt", "apple")
                    .op_or()
                    .where_knn("vec", QV, KnnSearchParams(k=4)))
    got = [d["id"] for d in res.docs()]
    # union of ft docs {0..4} and knn top4 around 5 -> includes both sets
    assert set(got) >= {0, 1, 2, 3, 4, 5, 6}
    # docs in BOTH streams (3, 4) must outrank single-stream docs via RRF
    both = {3, 4}
    top2 = set(got[:2])
    assert top2 == both
    # ranks exposed = fused RRF values, descending
    ranks = [it.rank for it in res]
    assert ranks == sorted(ranks, reverse=True)


def test_hybrid_rrf_rank_const(db):
    res = db.select(Query("h")
                    .match("txt", "apple")
                    .op_or()
                    .where_knn("vec", QV, KnnSearchParams(k=4))
                    .sort("RRF(rank_const=120)", desc=True))
    got = [d["id"] for d in res.docs()]
    assert set(got[:2]) == {3, 4}
    # rank = 1/(120+pos_ft) + 1/(120+pos_knn) <= 2/121
    for it in res:
        assert it.rank <= 2.0 / 121 + 1e-9


def test_hybrid_and_semantics(db):
    res = db.select(Query("h")
                    .match("txt", "apple")
                    .where_knn("vec", QV, KnnSearchParams(k=4)))
    got = {d["id"] for d in res.docs()}
    # AND: only docs present in both streams
    assert got == {3, 4}


def test_hybrid_linear_rerank(db):
    res = db.select(Query("h")
                    .match("txt", "apple")
                    .op_or()
                    .where_knn("vec", QV, KnnSearchParams(k=4))
                    .sort("30 * rank(txt) + 50 * rank(vec, 100.0) + 100",
                          desc=True))
    got = [d["id"] for d in res.docs()]
    # linear expr: L2 rank ascending-better but raw metric value used;
    # default 100 for missing knn -> ft-only docs get 50*100 boost
    assert len(got) == 7
    # ft-only docs (0,1,2) have rank(vec)=100 default -> dominate
    assert set(got[:3]) == {0, 1, 2}


def test_hybrid_with_scalar_filter(db):
    res = db.select(Query("h")
                    .match("txt", "apple")
                    .op_or()
                    .where_knn("vec", QV, KnnSearchParams(k=4))
                    .where("id", "<", 4))
    got = {d["id"] for d in res.docs()}
    assert got <= {0, 1, 2, 3}


def test_hybrid_merge_queries(db):
    q = (Query("h").match("txt", "apple").limit(2))
    q.merge(Query("h").where_knn("vec", QV, KnnSearchParams(k=2)))
    res = db.select(q)
    assert len(res) == 4
