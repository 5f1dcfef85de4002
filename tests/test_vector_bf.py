"""Brute-force vector index tests vs a NumPy exact-KNN oracle.

Models the reference suite's recall/ordering checks
(cpp_src/gtests/tests/unit/float_vector_index.cc: checkOrdering, dimension
errors, metric variants) — SURVEY.md §4 implication (a).
"""
import numpy as np
import pytest

from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts, KnnSearchParams,
                           ParamsError, Query, Reindexer, VectorMetric)


def np_oracle(base, query, metric, valid=None):
    """Exact KNN oracle. Returns (ranks best-first, ids)."""
    if metric == "l2":
        d = np.sum((base - query[None, :]) ** 2, axis=1)
        order = np.argsort(d, kind="stable")
        ranks = d
    else:
        b = base
        q = query
        if metric == "cosine":
            b = base / np.maximum(np.linalg.norm(base, axis=1, keepdims=True), 1e-30)
            q = query / max(np.linalg.norm(query), 1e-30)
        d = b @ q
        order = np.argsort(-d, kind="stable")
        ranks = d
    if valid is not None:
        order = order[valid[order]]
    return ranks[order], order


def make_db(metric, dims=32, n=300, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dims)).astype(np.float32)
    db = Reindexer()
    db.open_namespace("vecs", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("v", "vec_bf", vector_opts=FloatVectorOpts(
            dims=dims, metric=VectorMetric(metric))),
        IndexDef("grp", "hash", "int"),
    ])
    for i in range(n):
        db.upsert("vecs", {"id": i, "v": base[i].tolist(), "grp": i % 3})
    return db, base


@pytest.mark.parametrize("metric", ["l2", "inner_product", "cosine"])
def test_bf_matches_oracle(metric):
    db, base = make_db(metric)
    rng = np.random.default_rng(1)
    for _ in range(3):
        q = rng.normal(size=base.shape[1]).astype(np.float32)
        res = db.select(Query("vecs").where_knn("v", q, KnnSearchParams(k=10)))
        got_ids = [d["id"] for d in res.docs()]
        oracle_ranks, oracle_ids = np_oracle(base, q, metric)
        assert len(got_ids) == 10
        # exact engine must match oracle's top-10 as a set (ties may reorder)
        assert set(got_ids) == set(oracle_ids[:10].tolist())
        # ranks returned best-first and match oracle values
        ranks = res.ranks()
        np.testing.assert_allclose(ranks, oracle_ranks[:10], rtol=1e-4, atol=1e-4)


def test_bf_rank_order_l2_ascending():
    db, base = make_db("l2")
    q = base[5]
    res = db.select(Query("vecs").where_knn("v", q, KnnSearchParams(k=5)))
    ranks = res.ranks()
    assert ranks == sorted(ranks)
    assert res.docs()[0]["id"] == 5
    assert ranks[0] == pytest.approx(0.0, abs=1e-4)


def test_bf_with_scalar_filter():
    db, base = make_db("l2")
    q = np.zeros(base.shape[1], dtype=np.float32)
    res = db.select(Query("vecs")
                    .where("grp", "=", 1)
                    .where_knn("v", q, KnnSearchParams(k=50)))
    got = [d["id"] for d in res.docs()]
    assert all(i % 3 == 1 for i in got)
    # scalar filter applies AFTER knn (post-filter semantics)
    _, oracle_ids = np_oracle(base, q, "l2")
    top50 = oracle_ids[:50]
    expect = [int(i) for i in top50 if i % 3 == 1]
    assert got == expect


def test_bf_radius():
    db, base = make_db("l2", n=100)
    q = base[0]
    _, oracle_ids = np_oracle(base, q, "l2")
    d = np.sum((base - q[None, :]) ** 2, axis=1)
    ds = np.sort(d)
    radius = float((ds[9] + ds[10]) / 2)  # mid-gap cut avoids fp32 boundary ties
    res = db.select(Query("vecs").where_knn("v", q,
                                            KnnSearchParams(k=100, radius=radius)))
    got = sorted(d2["id"] for d2 in res.docs())
    expect = sorted(int(i) for i in np.flatnonzero(d < radius))
    assert got == expect


def test_bf_radius_only():
    db, base = make_db("inner_product", n=100)
    q = base[0]
    d = base @ q
    ds = np.sort(d)
    radius = float((ds[-5] + ds[-4]) / 2)  # mid-gap cut: top-4 above
    res = db.select(Query("vecs").where_knn("v", q, KnnSearchParams(radius=radius)))
    got = sorted(d2["id"] for d2 in res.docs())
    expect = sorted(int(i) for i in np.flatnonzero(d > radius))
    assert got == expect


def test_dims_mismatch():
    db, _ = make_db("l2", dims=16, n=10)
    with pytest.raises(ParamsError):
        db.select(Query("vecs").where_knn("v", np.zeros(8, np.float32),
                                          KnnSearchParams(k=3)))
    with pytest.raises(ParamsError):
        db.upsert("vecs", {"id": 999, "v": [0.0] * 9, "grp": 0})


def test_empty_vector_excluded():
    db, base = make_db("l2", n=20)
    db.upsert("vecs", {"id": 100, "grp": 0})  # no vector
    res = db.select(Query("vecs").where_knn(
        "v", np.zeros(base.shape[1], np.float32), KnnSearchParams(k=50)))
    assert 100 not in [d["id"] for d in res.docs()]
    assert len(res) == 20


def test_delete_excluded_from_knn():
    db, base = make_db("l2", n=20)
    db.delete("vecs", {"id": 7})
    res = db.select(Query("vecs").where_knn(
        "v", base[7], KnnSearchParams(k=20)))
    assert 7 not in [d["id"] for d in res.docs()]


def test_update_vector():
    db, base = make_db("l2", n=20)
    far = (base[0] + 100.0).astype(np.float32)
    db.upsert("vecs", {"id": 3, "v": far.tolist(), "grp": 0})
    res = db.select(Query("vecs").where_knn("v", far, KnnSearchParams(k=1)))
    assert res.docs()[0]["id"] == 3


def test_knn_params_validation():
    with pytest.raises(ParamsError):
        KnnSearchParams()
    with pytest.raises(ParamsError):
        KnnSearchParams(k=0)
    from reindexer_tpu import HnswSearchParams
    with pytest.raises(ParamsError):
        HnswSearchParams(k=10, ef=5)


def test_rank_sort_expression():
    db, base = make_db("l2")
    q = base[2]
    res = db.select(Query("vecs")
                    .where_knn("v", q, KnnSearchParams(k=10))
                    .sort("rank()", desc=False))
    ranks = res.ranks()
    # explicit rank() sort ascending = reversed best-first for L2?
    # rank values ascend; verify ordering is consistent
    assert ranks == sorted(ranks)


def test_vector_fields_excluded_from_output(rng):
    """float_vector fields are excluded from results unless requested via
    select_filter or vectors() (reference: float_vector.md:389-421)."""
    from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts,
                               IndexType, Query, Reindexer, VectorMetric)
    from reindexer_tpu.index.vector.params import KnnSearchParams
    db = Reindexer()
    db.open_namespace("vx", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("vec", IndexType.VEC_BF, vector_opts=FloatVectorOpts(
            dims=4, metric=VectorMetric.L2)),
    ])
    db.upsert("vx", {"id": 1, "vec": [1.0, 0, 0, 0], "x": "y"})
    doc = db.select(Query("vx").where("id", "=", 1)).docs()[0]
    assert "vec" not in doc and doc["x"] == "y"
    doc = db.select(Query("vx").where("id", "=", 1)
                    .select("*", "vectors()")).docs()[0]
    assert doc["vec"] == [1.0, 0, 0, 0]
    doc = db.select(Query("vx").where("id", "=", 1).select("vec")).docs()[0]
    assert doc["vec"] == [1.0, 0, 0, 0]


def test_knn_batch_api(rng):
    """Batched serving path: results must equal per-query selects."""
    from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts,
                               IndexType, Query, Reindexer, VectorMetric)
    from reindexer_tpu.index.vector.params import (HnswSearchParams,
                                                   KnnSearchParams)
    db = Reindexer()
    db.open_namespace("kb", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("bv", IndexType.VEC_BF, vector_opts=FloatVectorOpts(
            dims=8, metric=VectorMetric.L2)),
        IndexDef("hv", IndexType.HNSW, vector_opts=FloatVectorOpts(
            dims=8, metric=VectorMetric.L2, m=8, ef_construction=32)),
    ])
    base = rng.normal(size=(100, 8)).astype(np.float32)
    for i in range(100):
        db.upsert("kb", {"id": i, "bv": base[i].tolist(),
                         "hv": base[i].tolist()})
    queries = base[[3, 40, 77]] + 0.001
    batch = db.knn_batch("kb", "bv", queries, KnnSearchParams(k=5))
    assert len(batch) == 3
    for qi, want in enumerate([3, 40, 77]):
        got = [d["id"] for d in batch[qi].docs()]
        single = db.select(Query("kb").where_knn(
            "bv", queries[qi], KnnSearchParams(k=5)))
        assert got == [d["id"] for d in single.docs()]
        assert got[0] == want
    hb = db.knn_batch("kb", "hv", queries, HnswSearchParams(k=3, ef=16))
    for qi, want in enumerate([3, 40, 77]):
        assert hb[qi].docs()[0]["id"] == want


def test_array_vector_index(rng):
    """Multiple vectors per doc + best-match dedup
    (reference: float_vector.md:624-630)."""
    from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts,
                               IndexType, Query, Reindexer, VectorMetric)
    from reindexer_tpu.index.vector.params import KnnSearchParams
    db = Reindexer()
    db.open_namespace("av", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("vecs", IndexType.VEC_BF, opts=IndexOpts(is_array=True),
                 vector_opts=FloatVectorOpts(dims=4, metric=VectorMetric.L2)),
    ])
    db.upsert("av", {"id": 1, "vecs": [[0.0, 0, 0, 0], [10.0, 0, 0, 0]]})
    db.upsert("av", {"id": 2, "vecs": [[5.0, 0, 0, 0]]})
    db.upsert("av", {"id": 3, "vecs": []})
    q = np.zeros(4, np.float32)
    res = db.select(Query("av").where_knn("vecs", q, KnnSearchParams(k=3)))
    got = [d["id"] for d in res.docs()]
    # doc 1 has TWO vectors near/far; dedup keeps the best -> k=3 returns 2 docs
    assert got == [1, 2]
    ranks = [it.rank for it in res]
    assert ranks[0] == pytest.approx(0.0) and ranks[1] == pytest.approx(25.0)
    # update replaces the vector set
    db.upsert("av", {"id": 1, "vecs": [[100.0, 0, 0, 0]]})
    res2 = db.select(Query("av").where_knn("vecs", q, KnnSearchParams(k=3)))
    assert [d["id"] for d in res2.docs()] == [2, 1]


def test_bf_engine_v4_group_dispatch(monkeypatch, tmp_path):
    """B>64 multiple-of-64 select_batch rides the pipelined v4 kernel:
    force the TPU-only gate on CPU via interpret mode and check the
    reshape/overflow glue against the oracle."""
    import functools
    import jax.numpy as jnp
    from reindexer_tpu.index.vector import brute_force as bfmod
    from reindexer_tpu.index.vector.brute_force import BruteForceIndex
    from reindexer_tpu.core.payload import (IndexDef as IDef,
                                            FloatVectorOpts as FVO)
    from reindexer_tpu.core.type_consts import IndexType
    from reindexer_tpu.ops import pallas_select as ps

    real_v4 = ps.knn_scan_fused_v4
    monkeypatch.setattr(ps, "v4_available",
                        lambda n, d, k, q: n % 8192 == 0 and d % 128 == 0)
    monkeypatch.setattr(
        ps, "knn_scan_fused_v4",
        functools.partial(real_v4, interpret=True))

    rng = np.random.default_rng(5)
    n, d, B, k = 16384 - 3, 128, 128, 17
    idx = BruteForceIndex(IDef("v", IndexType.VEC_BF,
                               vector_opts=FVO(dims=d,
                                               metric=VectorMetric.L2)))
    base = rng.normal(size=(n, d)).astype(np.float32)
    idx.keeper.bulk_load(base)
    q = rng.normal(size=(B, d)).astype(np.float32)
    outs = idx.select_batch(q, KnnSearchParams(k=k))
    assert len(outs) == B
    for b in range(0, B, 21):
        dm = ((base - q[b]) ** 2).sum(1)
        want = set(np.argsort(dm)[:k].tolist())
        assert set(outs[b].ids.tolist()) == want
