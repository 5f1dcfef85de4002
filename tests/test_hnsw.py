"""HNSW engine tests: recall vs the exact BF oracle, deletes, metrics,
checkpoint roundtrip (models reference unit/float_vector_index.cc recall and
ordering checks, checkOrdering :32)."""
import numpy as np
import pytest

from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts, IndexType,
                           Query, Reindexer, VectorMetric)
from reindexer_tpu.index.vector.hnsw import HnswIndex
from reindexer_tpu.index.vector.params import HnswSearchParams


def make_index(dims=16, metric=VectorMetric.L2, m=8, efc=64):
    idef = IndexDef("vec", IndexType.HNSW, vector_opts=FloatVectorOpts(
        dims=dims, metric=metric, m=m, ef_construction=efc))
    return HnswIndex(idef)


def oracle_knn(base, valid_mask, q, k, metric):
    if metric == VectorMetric.L2:
        d = np.sum((base - q) ** 2, axis=1)
        d[~valid_mask] = np.inf
        return np.argsort(d)[:k]
    if metric == VectorMetric.COSINE:
        bn = base / np.maximum(np.linalg.norm(base, axis=1, keepdims=True), 1e-12)
        qn = q / max(np.linalg.norm(q), 1e-12)
        s = bn @ qn
    else:
        s = base @ q
    s[~valid_mask] = -np.inf
    return np.argsort(-s)[:k]


@pytest.mark.parametrize("metric", [VectorMetric.L2,
                                    VectorMetric.INNER_PRODUCT,
                                    VectorMetric.COSINE])
def test_hnsw_recall(metric, rng):
    n, dims, k = 600, 16, 10
    idx = make_index(dims=dims, metric=metric)
    base = rng.normal(size=(n, dims)).astype(np.float32)
    for i in range(n):
        idx.upsert(i, base[i])
    valid = np.ones(n, dtype=bool)

    hits = total = 0
    for t in range(20):
        q = rng.normal(size=dims).astype(np.float32)
        res = idx.select(q, HnswSearchParams(k=k, ef=64))
        want = set(oracle_knn(base, valid, q, k, metric).tolist())
        hits += len(set(res.ids.tolist()) & want)
        total += k
    recall = hits / total
    assert recall >= 0.9, f"recall {recall} too low for {metric}"


def test_hnsw_rank_values_l2(rng):
    idx = make_index(dims=8)
    base = rng.normal(size=(50, 8)).astype(np.float32)
    for i in range(50):
        idx.upsert(i, base[i])
    q = rng.normal(size=8).astype(np.float32)
    res = idx.select(q, HnswSearchParams(k=5, ef=32))
    # ranks are true L2^2 distances, ascending
    for rid, rank in zip(res.ids, res.ranks):
        np.testing.assert_allclose(rank, np.sum((base[rid] - q) ** 2),
                                   rtol=1e-4)
    assert list(res.ranks) == sorted(res.ranks)


def test_hnsw_delete_and_reinsert(rng):
    idx = make_index(dims=8)
    base = rng.normal(size=(100, 8)).astype(np.float32)
    for i in range(100):
        idx.upsert(i, base[i])
    q = base[7] + 0.001
    res = idx.select(q, HnswSearchParams(k=3, ef=32))
    assert res.ids[0] == 7
    idx.delete(7, None)
    res = idx.select(q, HnswSearchParams(k=3, ef=32))
    assert 7 not in res.ids
    # re-upsert revives the node
    idx.upsert(7, base[7])
    res = idx.select(q, HnswSearchParams(k=3, ef=32))
    assert res.ids[0] == 7


def test_hnsw_radius(rng):
    idx = make_index(dims=4)
    idx.upsert(0, [0.0, 0, 0, 0])
    idx.upsert(1, [1.0, 0, 0, 0])
    idx.upsert(2, [5.0, 0, 0, 0])
    res = idx.select(np.zeros(4, np.float32),
                     HnswSearchParams(k=3, ef=16, radius=2.0))
    assert set(res.ids.tolist()) == {0, 1}   # rank(L2^2) < 2.0


def test_hnsw_state_roundtrip(rng):
    idx = make_index(dims=8)
    base = rng.normal(size=(80, 8)).astype(np.float32)
    for i in range(80):
        idx.upsert(i, base[i])
    q = rng.normal(size=8).astype(np.float32)
    before = idx.select(q, HnswSearchParams(k=5, ef=32))
    state = idx.state_dict()
    idx2 = make_index(dims=8)
    idx2.load_state_dict(state)
    after = idx2.select(q, HnswSearchParams(k=5, ef=32))
    assert before.ids.tolist() == after.ids.tolist()


def test_hnsw_incremental_inserts(rng):
    """Graph stays searchable across multiple commit batches."""
    idx = make_index(dims=8)
    base = rng.normal(size=(300, 8)).astype(np.float32)
    for i in range(100):
        idx.upsert(i, base[i])
    idx.select(base[0], HnswSearchParams(k=1, ef=16))   # commits first 100
    for i in range(100, 300):
        idx.upsert(i, base[i])
    res = idx.select(base[250] + 0.0001, HnswSearchParams(k=1, ef=32))
    assert res.ids[0] == 250


def test_hnsw_via_query(rng):
    db = Reindexer()
    db.open_namespace("v", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("vec", IndexType.HNSW, vector_opts=FloatVectorOpts(
            dims=8, metric=VectorMetric.L2, m=8, ef_construction=32)),
    ])
    base = rng.normal(size=(60, 8)).astype(np.float32)
    for i in range(60):
        db.upsert("v", {"id": i, "vec": base[i].tolist()})
    res = db.select(Query("v").where_knn(
        "vec", base[17], HnswSearchParams(k=3, ef=16)))
    assert res.docs()[0]["id"] == 17


def test_hnsw_quantized_search(rng):
    """SQ8 traversal (reference: quantized HNSW storage) keeps recall."""
    from reindexer_tpu import QuantizationConfig
    idef = IndexDef("vec", IndexType.HNSW, vector_opts=FloatVectorOpts(
        dims=16, metric=VectorMetric.L2, m=8, ef_construction=64,
        quantization=QuantizationConfig(enabled=True, min_elements=64)))
    idx = HnswIndex(idef)
    base = rng.normal(size=(400, 16)).astype(np.float32)
    for i in range(400):
        idx.upsert(i, base[i])
    hits = total = 0
    for _ in range(10):
        q = rng.normal(size=16).astype(np.float32)
        res = idx.select(q, HnswSearchParams(k=10, ef=64))
        want = set(np.argsort(np.sum((base - q) ** 2, axis=1))[:10].tolist())
        hits += len(set(res.ids.tolist()) & want)
        total += 10
    assert idx._quant is not None and idx._quant.active
    assert hits / total >= 0.85, hits / total


def test_hnsw_recall_at_scale(rng):
    """Regression guard for search quality (classic W/C ef-search +
    heuristic reverse prune): recall@10 must stay hnswlib-class."""
    n, dims, k = 2000, 32, 10
    idx = make_index(dims=dims, metric=VectorMetric.INNER_PRODUCT,
                     m=16, efc=128)
    base = rng.normal(size=(n, dims)).astype(np.float32)
    for i in range(n):
        idx.upsert(i, base[i])
    idx.commit()
    queries = rng.normal(size=(16, dims)).astype(np.float32)
    scores, ids = idx._search_batch(queries, 64)
    oracle = np.argsort(-(queries @ base.T), axis=1)[:, :k]
    hits = sum(len(set(ids[i, :k].tolist()) & set(oracle[i].tolist()))
               for i in range(16))
    assert hits / (16 * k) >= 0.92, hits / (16 * k)


def test_hnsw_vector_update_relinks(rng):
    """Updating a vector re-inserts the node at its new position
    (reference: updatePoint link repair)."""
    idx = make_index(dims=8, m=8, efc=48)
    base = rng.normal(size=(200, 8)).astype(np.float32)
    for i in range(200):
        idx.upsert(i, base[i])
    idx.commit()
    # move node 5 to a far-away cluster location
    far = base[150] + np.asarray([8.0] * 8, np.float32)
    idx.upsert(5, far)
    res = idx.select(far + 0.001, HnswSearchParams(k=1, ef=32))
    assert res.ids[0] == 5
    # old position no longer matches node 5
    res2 = idx.select(base[5], HnswSearchParams(k=5, ef=32))
    assert res2.ids[0] != 5
