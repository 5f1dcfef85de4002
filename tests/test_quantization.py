"""SQ8 quantization tests (models reference quantization_tests.cc): the
quantized scan must closely reproduce the exact top-k, activate at
min_elements, and refresh on mutation."""
import numpy as np
import pytest

from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexType,
                           QuantizationConfig, VectorMetric)
from reindexer_tpu.index.vector.brute_force import BruteForceIndex
from reindexer_tpu.index.vector.params import KnnSearchParams


def make_index(dims=16, metric=VectorMetric.L2, min_elements=64):
    idef = IndexDef("vec", IndexType.VEC_BF, vector_opts=FloatVectorOpts(
        dims=dims, metric=metric,
        quantization=QuantizationConfig(enabled=True,
                                        min_elements=min_elements)))
    return BruteForceIndex(idef)


@pytest.mark.parametrize("metric", [VectorMetric.L2,
                                    VectorMetric.INNER_PRODUCT])
def test_quantized_topk_overlap(metric, rng):
    n, dims, k = 500, 16, 10
    idx = make_index(dims=dims, metric=metric)
    base = rng.normal(size=(n, dims)).astype(np.float32)
    for i in range(n):
        idx.upsert(i, base[i])
    hits = total = 0
    for _ in range(10):
        q = rng.normal(size=dims).astype(np.float32)
        res = idx.select(q, KnnSearchParams(k=k))
        assert idx._quant.active
        if metric == VectorMetric.L2:
            want = np.argsort(np.sum((base - q) ** 2, axis=1))[:k]
        else:
            want = np.argsort(-(base @ q))[:k]
        hits += len(set(res.ids.tolist()) & set(want.tolist()))
        total += k
    assert hits / total >= 0.9


def test_quantization_activates_at_threshold(rng):
    idx = make_index(dims=8, min_elements=50)
    base = rng.normal(size=(60, 8)).astype(np.float32)
    for i in range(40):
        idx.upsert(i, base[i])
    idx.select(base[0], KnnSearchParams(k=1))
    assert not idx._quant.active
    for i in range(40, 60):
        idx.upsert(i, base[i])
    idx.select(base[0], KnnSearchParams(k=1))
    assert idx._quant.active


def test_quantized_refresh_on_mutation(rng):
    idx = make_index(dims=8, min_elements=10)
    base = rng.normal(size=(30, 8)).astype(np.float32)
    for i in range(30):
        idx.upsert(i, base[i])
    idx.select(base[0], KnnSearchParams(k=1))
    assert idx._quant.active
    # new vector must be findable without waiting for full requantize
    v = rng.normal(size=8).astype(np.float32)
    idx.upsert(99, v)
    res = idx.select(v, KnnSearchParams(k=1))
    assert res.ids[0] == 99
    # deleted vector disappears from quantized results too
    idx.delete(99, None)
    res = idx.select(v, KnnSearchParams(k=1))
    assert res.ids[0] != 99


def test_quantized_memstat(rng):
    idx = make_index(dims=16, min_elements=10)
    for i in range(32):
        idx.upsert(i, rng.normal(size=16).astype(np.float32))
    idx.select(np.zeros(16, np.float32), KnnSearchParams(k=1))
    st = idx.memstat()
    assert st["quantized"]
    # uint8 codes = 1/4 the fp32 footprint
    assert st["quantized_size"] * 4 == st["data_size"]


def test_requantize_on_quantile_drift(rng):
    """NeedRequantize analog (reference: scalar_quantization/quantizer.h
    outlier test): data drifting outside the quantile grid triggers a full
    requantize (new lo/alpha), not just a re-encode."""
    idx = make_index(dims=8, min_elements=10)
    for i in range(16):
        idx.upsert(i, rng.normal(size=8).astype(np.float32))
    idx.select(np.zeros(8, np.float32), KnnSearchParams(k=1))
    q = idx._quant
    assert q.active
    lo0, alpha0 = np.asarray(q.lo).copy(), np.asarray(q.alpha).copy()
    # add a few far-outside-the-grid vectors (10x the data scale)
    for i in range(16, 20):
        idx.upsert(i, (10.0 + rng.normal(size=8)).astype(np.float32))
    res = idx.select(np.full(8, 10.0, np.float32), KnnSearchParams(k=4))
    # grid must have moved to cover the drifted data...
    hi0 = lo0 + alpha0 * 255.0
    hi1 = np.asarray(q.lo) + np.asarray(q.alpha) * 255.0
    assert (hi1 > hi0 + 1.0).any(), (hi0, hi1)
    # ...and the drifted vectors are the nearest to their own region
    assert set(res.ids.tolist()) == {16, 17, 18, 19}


def test_sq8_v3_engine_ladder_exact(monkeypatch, rng):
    """Engine-level sq8-v3 dispatch with the overflow ladder, forced on
    CPU via interpret: results stay EXACT whether or not the eps rungs
    overflow (the ladder reruns fp32 on flag), and the sticky mode
    downgrades cert -> fast after one overflow."""
    import functools
    from reindexer_tpu.ops import pallas_select as ps
    from reindexer_tpu.ops.pallas_select import TILE

    monkeypatch.setattr(ps, "v2_available",
                        lambda n, d, k, q: n % TILE == 0 and d % 128 == 0)
    monkeypatch.setattr(ps, "v3_available", lambda n, d, k, q: False)
    monkeypatch.setattr(ps, "v4_available", lambda n, d, k, q: False)
    monkeypatch.setattr(
        ps, "knn_scan_sq8_v3",
        functools.partial(ps.knn_scan_sq8_v3.__wrapped__, interpret=True))
    # the fp32 fallback rung must also run in interpret mode on CPU
    from reindexer_tpu.ops import pallas_scan as psc
    monkeypatch.setattr(psc, "fused_available", lambda n, d, k: False)

    n, d, k = TILE - 5, 128, 32
    idx = make_index(dims=d, min_elements=64)
    base = rng.normal(size=(n, d)).astype(np.float32)
    idx.keeper.bulk_load(base)
    idx._maybe_quantize()
    assert idx._quant is not None and idx._quant.active
    q = rng.normal(size=(3, d)).astype(np.float32)
    outs = idx.select_batch(q, KnnSearchParams(k=k))
    for b in range(3):
        dm = ((base - q[b]) ** 2).sum(1)
        want = set(np.argsort(dm)[:k].tolist())
        assert set(outs[b].ids.tolist()) == want


# ---------------------------------------------------------------------------
# reference-semantics approximate SQ8 (VERDICT r4 item: quantizer.h:11-75 —
# quantized scores, no exactness guarantee; opt-in via
# QuantizationConfig.mode)
# ---------------------------------------------------------------------------

def make_index_mode(mode, dims=16, metric=VectorMetric.L2, min_elements=64):
    idef = IndexDef("vec", IndexType.VEC_BF, vector_opts=FloatVectorOpts(
        dims=dims, metric=metric,
        quantization=QuantizationConfig(enabled=True,
                                        min_elements=min_elements,
                                        mode=mode)))
    return BruteForceIndex(idef)


def test_approx_sq8_mode_recall(rng):
    """Approx mode returns quantized top-k directly (no eps ladder, no
    exact fallback) with high-but-not-guaranteed recall."""
    n, dims, k = 2000, 16, 10
    base = rng.normal(size=(n, dims)).astype(np.float32)
    idx = make_index_mode("approx", dims=dims)
    for i, v in enumerate(base):
        idx.upsert(i, v)
    q = rng.normal(size=(dims,)).astype(np.float32)
    res = idx.select(q, KnnSearchParams(k=k))
    want = set(np.argsort(((base - q) ** 2).sum(1))[:k].tolist())
    recall = len(set(res.ids.tolist()) & want) / k
    assert recall >= 0.7, recall


def test_approx_rerank_scores_are_exact_fp32(rng):
    """approx_rerank: candidate set is approximate, but returned ranks are
    the true fp32 metric values of the returned ids."""
    n, dims, k = 1500, 16, 8
    base = rng.normal(size=(n, dims)).astype(np.float32)
    idx = make_index_mode("approx_rerank", dims=dims)
    for i, v in enumerate(base):
        idx.upsert(i, v)
    q = rng.normal(size=(dims,)).astype(np.float32)
    res = idx.select(q, KnnSearchParams(k=k))
    ids = res.ids.astype(int)
    true_d = ((base[ids] - q) ** 2).sum(1)
    np.testing.assert_allclose(res.ranks, true_d, rtol=1e-4, atol=1e-4)
    # ranks sorted ascending (L2)
    assert (np.diff(res.ranks) >= -1e-6).all()


def test_quantization_mode_validation():
    import pytest as _pytest
    from reindexer_tpu.core.errors import ParamsError
    with _pytest.raises(ParamsError):
        make_index_mode("bogus")


def test_quantization_mode_roundtrips_index_def():
    idef = IndexDef("vec", IndexType.VEC_BF, vector_opts=FloatVectorOpts(
        dims=8, quantization=QuantizationConfig(enabled=True,
                                                mode="approx")))
    d = idef.to_dict()
    back = IndexDef.from_dict(d)
    assert back.vector_opts.quantization.mode == "approx"
