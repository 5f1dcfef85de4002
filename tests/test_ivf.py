"""IVF engine tests: recall vs BF oracle across nprobe, retraining, deletes
(models reference unit/float_vector_index.cc IVF cases + knn_bench configs)."""
import numpy as np
import pytest

from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts, IndexType,
                           Query, Reindexer, VectorMetric)
from reindexer_tpu.index.vector.ivf import IvfIndex
from reindexer_tpu.index.vector.params import IvfSearchParams


def make_index(dims=16, metric=VectorMetric.L2, nlist=16):
    idef = IndexDef("vec", IndexType.IVF, vector_opts=FloatVectorOpts(
        dims=dims, metric=metric, centroids_count=nlist))
    return IvfIndex(idef)


@pytest.mark.parametrize("metric", [VectorMetric.L2,
                                    VectorMetric.INNER_PRODUCT,
                                    VectorMetric.COSINE])
def test_ivf_recall_full_probe(metric, rng):
    """nprobe == nlist must reproduce the exact BF result."""
    n, dims, k = 400, 16, 10
    idx = make_index(dims=dims, metric=metric, nlist=8)
    base = rng.normal(size=(n, dims)).astype(np.float32)
    for i in range(n):
        idx.upsert(i, base[i])
    for _ in range(5):
        q = rng.normal(size=dims).astype(np.float32)
        res = idx.select(q, IvfSearchParams(k=k, nprobe=8))
        if metric == VectorMetric.L2:
            want = np.argsort(np.sum((base - q) ** 2, axis=1))[:k]
        elif metric == VectorMetric.COSINE:
            bn = base / np.linalg.norm(base, axis=1, keepdims=True)
            qn = q / np.linalg.norm(q)
            want = np.argsort(-(bn @ qn))[:k]
        else:
            want = np.argsort(-(base @ q))[:k]
        assert set(res.ids.tolist()) == set(want.tolist())


def test_ivf_nprobe_sweep_recall(rng):
    """Recall grows with nprobe (reference: nprobe sweep semantics)."""
    n, dims, k = 1000, 8, 10
    idx = make_index(dims=dims, nlist=32)
    base = rng.normal(size=(n, dims)).astype(np.float32)
    for i in range(n):
        idx.upsert(i, base[i])
    recalls = []
    queries = rng.normal(size=(10, dims)).astype(np.float32)
    for nprobe in (1, 4, 32):
        hits = 0
        for q in queries:
            res = idx.select(q, IvfSearchParams(k=k, nprobe=nprobe))
            want = set(np.argsort(np.sum((base - q) ** 2, axis=1))[:k].tolist())
            hits += len(set(res.ids.tolist()) & want)
        recalls.append(hits / (k * len(queries)))
    assert recalls[-1] == 1.0
    assert recalls[0] <= recalls[1] <= recalls[2] + 1e-9
    assert recalls[1] >= 0.5


def test_ivf_incremental_and_delete(rng):
    idx = make_index(dims=8, nlist=4)
    base = rng.normal(size=(200, 8)).astype(np.float32)
    for i in range(100):
        idx.upsert(i, base[i])
    idx.select(base[0], IvfSearchParams(k=1, nprobe=4))  # trains
    for i in range(100, 200):
        idx.upsert(i, base[i])
    res = idx.select(base[150], IvfSearchParams(k=1, nprobe=4))
    assert res.ids[0] == 150
    idx.delete(150, None)
    res = idx.select(base[150], IvfSearchParams(k=1, nprobe=4))
    assert res.ids[0] != 150


def test_ivf_rank_values(rng):
    idx = make_index(dims=4, nlist=2)
    idx.upsert(0, [0.0, 0, 0, 0])
    idx.upsert(1, [1.0, 0, 0, 0])
    idx.upsert(2, [3.0, 0, 0, 0])
    res = idx.select(np.zeros(4, np.float32), IvfSearchParams(k=3, nprobe=2))
    np.testing.assert_allclose(sorted(res.ranks), [0.0, 1.0, 9.0], atol=1e-5)


def test_ivf_state_roundtrip(rng):
    idx = make_index(dims=8, nlist=4)
    base = rng.normal(size=(100, 8)).astype(np.float32)
    for i in range(100):
        idx.upsert(i, base[i])
    q = rng.normal(size=8).astype(np.float32)
    before = idx.select(q, IvfSearchParams(k=5, nprobe=4))
    idx2 = make_index(dims=8, nlist=4)
    idx2.load_state_dict(idx.state_dict())
    after = idx2.select(q, IvfSearchParams(k=5, nprobe=4))
    assert before.ids.tolist() == after.ids.tolist()


def test_ivf_via_query(rng):
    db = Reindexer()
    db.open_namespace("v", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("vec", IndexType.IVF, vector_opts=FloatVectorOpts(
            dims=8, metric=VectorMetric.L2, centroids_count=4)),
    ])
    base = rng.normal(size=(60, 8)).astype(np.float32)
    for i in range(60):
        db.upsert("v", {"id": i, "vec": base[i].tolist()})
    res = db.select(Query("v").where_knn(
        "vec", base[17], IvfSearchParams(k=3, nprobe=4)))
    assert res.docs()[0]["id"] == 17


def test_ivf_select_batch(rng):
    idx = make_index(dims=8, nlist=8)
    base = rng.normal(size=(300, 8)).astype(np.float32)
    for i in range(300):
        idx.upsert(i, base[i])
    queries = base[[10, 150, 299]] + 0.0001
    batch = idx.select_batch(queries, IvfSearchParams(k=5, nprobe=8))
    assert len(batch) == 3
    for qi, want in enumerate([10, 150, 299]):
        single = idx.select(queries[qi], IvfSearchParams(k=5, nprobe=8))
        assert batch[qi].ids.tolist() == single.ids.tolist()
        assert batch[qi].ids[0] == want


def test_ivf_segment_scan_parity(rng, monkeypatch):
    """The probe-proportional segment path (list-contiguous reorder +
    scalar-prefetch block streaming, interpret mode on CPU) returns the
    same results as the masked full scan."""
    dims, nlist, n = 32, 8, 1200
    centers = rng.normal(size=(nlist, dims)).astype(np.float32)
    base = (centers[rng.integers(0, nlist, size=n)]
            + 0.1 * rng.normal(size=(n, dims))).astype(np.float32)
    qs = (centers[rng.integers(0, nlist, size=6)]
          + 0.1 * rng.normal(size=(6, dims))).astype(np.float32)

    def run(env):
        monkeypatch.setenv("RX_IVF_SEGMENTS", env)
        idx = make_index(dims=dims, nlist=nlist)
        for i, v in enumerate(base):
            idx.upsert(i, v)
        return [idx.select(q, IvfSearchParams(k=20, nprobe=nlist))
                for q in qs]

    seg = run("1")          # explicit opt-in: interpret-mode segments
    full = run("0")         # masked full scan
    for a, b in zip(seg, full):
        assert set(a.ids.tolist()) == set(b.ids.tolist())
        # two exact-but-different formulations (bf16x3 in-kernel dots vs
        # the masked scan): same sets, fp32-level rank noise
        np.testing.assert_allclose(np.sort(a.ranks), np.sort(b.ranks),
                                   rtol=2e-3, atol=2e-3)


def test_ivf_segment_scan_partial_probe(rng, monkeypatch):
    """Segment path at nprobe < nlist stays a subset of the full-probe
    result and hits the probed lists exactly."""
    dims, nlist, n = 32, 8, 900
    centers = 3.0 * rng.normal(size=(nlist, dims)).astype(np.float32)
    base = (centers[rng.integers(0, nlist, size=n)]
            + 0.05 * rng.normal(size=(n, dims))).astype(np.float32)
    monkeypatch.setenv("RX_IVF_SEGMENTS", "1")
    idx = make_index(dims=dims, nlist=nlist)
    for i, v in enumerate(base):
        idx.upsert(i, v)
    q = base[17] + 0.01 * rng.normal(size=dims).astype(np.float32)
    r1 = idx.select(q, IvfSearchParams(k=10, nprobe=1))
    rf = idx.select(q, IvfSearchParams(k=10, nprobe=nlist))
    # the nearest row shares a list with the query -> top hit agrees
    assert r1.ids[0] == rf.ids[0]
    assert set(r1.ids.tolist()) <= set(rf.ids.tolist()) or \
        len(set(r1.ids.tolist()) & set(rf.ids.tolist())) >= 5
