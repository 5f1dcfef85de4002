"""Parity of the device-resident dense FT scorer (ft/device_dense.py)
against the host C++ merge across proximity / full-match / must / not
configurations — plus overflow fallback and batched routing.

Reference semantics under test: mergerimpl.h:95-124 (the same contract the
host score_merge_dense implements; tests/test_fulltext.py pins that against
the NumPy oracle)."""
import os

import numpy as np
import pytest

from reindexer_tpu.ft.config import FtFastConfig
from reindexer_tpu.ft.dataholder import FtDataHolder
from reindexer_tpu.ft.selector import FtSelector
from reindexer_tpu.ft import device_dense


def _mk(n_docs=1500, vocab_n=40, seed=3, doc_len=12, **cfg_kw):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(vocab_n)]
    zipf = np.minimum(rng.zipf(1.4, size=(n_docs, doc_len)) - 1, vocab_n - 1)
    docs = [(i, [" ".join(vocab[j] for j in zipf[i])])
            for i in range(n_docs)]
    cfg = FtFastConfig()
    for k, v in cfg_kw.items():
        setattr(cfg, k, v)
    holder = FtDataHolder(cfg, ["text"])
    holder.build(docs, n_docs)
    return FtSelector(holder, cfg), cfg


QUERIES = ["w0 w1", "w0", "+w0 +w2", "w1 -w0", "w0 w1 w2", "=w0 =w3",
           "w2 w2"]


def _by_id(res):
    return dict(zip(res.ids.tolist(), res.ranks.tolist()))


def _assert_same(a, b, q, ctx=""):
    assert sorted(a.ids.tolist()) == sorted(b.ids.tolist()), \
        f"ids diverge for {q!r} {ctx}"
    ra, rb = _by_id(a), _by_id(b)
    for d in ra:
        assert abs(ra[d] - rb[d]) <= 0.5, \
            f"rank diverges for {q!r} doc {d}: {ra[d]} vs {rb[d]} {ctx}"
    if len(a.ids):
        assert a.ids[0] == b.ids[0], f"top-1 diverges for {q!r} {ctx}"


@pytest.fixture()
def dense_env(monkeypatch):
    monkeypatch.setattr(device_dense, "DEVICE_MIN", 1)
    monkeypatch.setattr(device_dense, "DEVICE_MIN_SINGLE", 1)
    monkeypatch.setattr(device_dense, "DENSE_MIN_COUNT", 1)
    monkeypatch.setattr(device_dense, "DENSE_WORDS", 64)
    yield


@pytest.mark.parametrize("dist_w,fm", [(0.5, 1.1), (0.0, 1.0), (0.7, 1.3)])
def test_device_dense_matches_host(dense_env, monkeypatch, dist_w, fm):
    sel, cfg = _mk(distance_weight=dist_w, full_match_boost=fm)
    engaged = {"n": 0}
    orig = device_dense.FtDeviceDense.dispatch_batch

    def spy(self, *a, **k):
        engaged["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(device_dense.FtDeviceDense, "dispatch_batch", spy)
    got = [sel.process(q) for q in QUERIES]
    assert engaged["n"] > 0, "device dense path never engaged"

    monkeypatch.setenv("RX_FT_DEVICE_DENSE", "0")
    sel_host, _ = _mk(distance_weight=dist_w, full_match_boost=fm)
    want = [sel_host.process(q) for q in QUERIES]
    for q, a, b in zip(QUERIES, got, want):
        _assert_same(a, b, q, f"(dist_w={dist_w}, fm={fm})")


def test_device_dense_batch_matches_single(dense_env):
    sel, cfg = _mk()
    singles = [sel.process(q) for q in QUERIES]
    batched = sel.process_batch(QUERIES)
    for q, a, b in zip(QUERIES, singles, batched):
        _assert_same(a, b, q, "(batch vs single)")


def test_overflow_fallback_exact(dense_env, monkeypatch):
    """All-identical docs + tiny merge_limit: every candidate ties, the
    per-segment prune cannot certify the cut, and the query must fall back
    to the host merge — still returning the exact top-merge_k set."""
    n = 1500
    docs = [(i, ["w0 w1 w0"]) for i in range(n)]
    cfg = FtFastConfig()
    cfg.merge_limit = 8
    holder = FtDataHolder(cfg, ["text"])
    holder.build(docs, n)
    sel = FtSelector(holder, cfg)
    res = sel.process("w0 w1")
    assert len(res.ids) == 8
    # identical scores -> doc-ascending tie-break (reference order)
    assert res.ids.tolist() == list(range(8))


def test_rare_variant_falls_back(dense_env, monkeypatch):
    """A query with a non-resident (rare) variant word must not use the
    dense path; results equal the host merge."""
    monkeypatch.setattr(device_dense, "DENSE_WORDS", 2)   # only w-head
    sel, cfg = _mk()
    called = {"n": 0}
    orig = device_dense.FtDeviceDense.dispatch_batch

    def spy(self, *a, **k):
        called["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(device_dense.FtDeviceDense, "dispatch_batch", spy)
    res = sel.process("w0 w30")       # w30 is rare: not resident
    monkeypatch.setenv("RX_FT_DEVICE_DENSE", "0")
    sel_host, _ = _mk()
    want = sel_host.process("w0 w30")
    _assert_same(res, want, "w0 w30")


def test_batch_mixed_routing(dense_env):
    """process_batch with frequent + rare + NOT queries: every result
    matches the host-only per-query baseline."""
    sel, cfg = _mk()
    queries = ["w0 w1", "w25 w30", "w0", "-w0 w2", "w1 w2 w3"]
    batched = sel.process_batch(queries)

    os.environ["RX_FT_DEVICE_DENSE"] = "0"
    try:
        sel_host, _ = _mk()
        want = [sel_host.process(q) for q in queries]
    finally:
        os.environ.pop("RX_FT_DEVICE_DENSE", None)
    for q, a, b in zip(queries, batched, want):
        _assert_same(a, b, q, "(mixed batch)")


def test_merge_k_boundary_pruned():
    """merge_limit smaller than the match count with pruning active
    (m_per_seg < seg): the device cut equals the host cut exactly."""
    # distinct doc lengths -> distinct scores (no tie ambiguity)
    n = 1500
    rng = np.random.default_rng(11)
    docs = [(i, ["w0 w1 " + " ".join(f"f{rng.integers(0, 1000)}"
                                     for _ in range(
                                         int(rng.integers(1, 25)))),
                 ]) for i in range(n)]
    cfg = FtFastConfig()
    cfg.merge_limit = 64
    holder = FtDataHolder(cfg, ["text"])
    holder.build(docs, n)
    sel = FtSelector(holder, cfg)
    import unittest.mock as mock
    with mock.patch.object(device_dense, "DEVICE_MIN", 1), \
            mock.patch.object(device_dense, "DEVICE_MIN_SINGLE", 1), \
            mock.patch.object(device_dense, "DENSE_MIN_COUNT", 1):
        got = sel.process("w0 w1")
    os.environ["RX_FT_DEVICE_DENSE"] = "0"
    try:
        sel_host = FtSelector(holder, cfg)
        want = sel_host.process("w0 w1")
    finally:
        os.environ.pop("RX_FT_DEVICE_DENSE", None)
    assert len(got.ids) == len(want.ids) == 64
    assert got.ids.tolist() == want.ids.tolist()
    # packed download quantizes ranks to the reference's integer 0..255
    # scale (mergerimpl.h docRank) — ids/order stay exact
    np.testing.assert_allclose(got.ranks, want.ranks, atol=0.5)
