"""Native C++ component tests: the ft_native tokenizer must be available in
this environment and produce token streams identical to the Python path."""
import numpy as np
import pytest

from reindexer_tpu.csrc import load
from reindexer_tpu.ft.config import FtFastConfig
from reindexer_tpu.ft.dataholder import FtDataHolder
from reindexer_tpu.ft.tokenizer import tokenize


@pytest.fixture(scope="module")
def native():
    mod = load("_ft_native", "ft_native.cpp")
    assert mod is not None, "native toolchain must build ft_native"
    return mod


TEXTS = [
    "The quick brown fox, jumps over; the lazy dog!",
    "пример русского текста с Ёлками и ЗАГЛАВНЫМИ",
    "mixed-words under_score it's a+b c/d trailing- -leading",
    "numbers 123 and 45x67",
    "中文搜索 测试 abc中def 中-文 ここでテスト",
    "", "    ", "!!!",
]


def test_tokens_match_python(native):
    extra = "-/+_`'"
    for text in TEXTS:
        triples = [(0, 0, text)]
        vocab, tid_b, did_b, fid_b, pos_b = native.build_tokens(triples, extra)
        tids = np.frombuffer(tid_b, dtype=np.int64)
        got = [vocab[t] for t in tids]
        want = tokenize(text, extra)
        assert got == want, (text, got, want)


def test_positions_and_fields(native):
    triples = [(5, 0, "a b c"), (5, 1, "d e"), (7, 0, "f")]
    vocab, tid_b, did_b, fid_b, pos_b = native.build_tokens(triples, "-")
    assert np.frombuffer(did_b, dtype=np.int32).tolist() == [5, 5, 5, 5, 5, 7]
    assert np.frombuffer(fid_b, dtype=np.int32).tolist() == [0, 0, 0, 1, 1, 0]
    assert np.frombuffer(pos_b, dtype=np.int32).tolist() == [0, 1, 2, 0, 1, 0]


def test_holder_native_equals_python(rng):
    docs = [(i, [f"word{i} shared text number {i % 3}",
                 "second field body"]) for i in range(20)]
    cfg = FtFastConfig(stop_words={"text"})
    h_native = FtDataHolder(cfg, ["a", "b"])
    h_native.build(docs, 20)

    import reindexer_tpu.ft.dataholder as dh
    old = dh._NATIVE, dh._NATIVE_TRIED
    dh._NATIVE, dh._NATIVE_TRIED = None, True
    try:
        h_py = FtDataHolder(cfg, ["a", "b"])
        h_py.build(docs, 20)
    finally:
        dh._NATIVE, dh._NATIVE_TRIED = old

    assert list(h_native.words) == list(h_py.words)
    np.testing.assert_array_equal(h_native.word_start, h_py.word_start)
    np.testing.assert_array_equal(h_native.post_doc, h_py.post_doc)
    np.testing.assert_array_equal(h_native.post_field, h_py.post_field)
    np.testing.assert_array_equal(h_native.post_tf, h_py.post_tf)
    np.testing.assert_array_equal(h_native.post_minpos, h_py.post_minpos)
    np.testing.assert_array_equal(h_native.doc_words, h_py.doc_words)


def test_typo_dict_native_matches_python():
    from reindexer_tpu.csrc import load
    from reindexer_tpu.ft.typos import TypoDict
    native = load("_typos_native", "typos_native.cpp")
    assert native is not None
    words = ["black", "block", "quick", "fox", "он", "территория", "ab",
             "x" * 20]
    td = TypoDict(max_typos=2, max_typo_len=15)
    for wid, w in enumerate(words):
        td.add_word(w, wid)
    nmap = native.build_typo_dict(words, td.index_deletes, td.min_word_len,
                                  td.max_typo_len, td.max_candidates)
    assert set(nmap.keys()) == set(td.map.keys())
    for k in td.map:
        assert sorted(nmap[k]) == sorted(td.map[k]), k


def test_hnsw_connect_native_matches_python(rng):
    """The C++ link-maintenance loop must produce byte-identical graphs."""
    import reindexer_tpu.index.vector.hnsw as H
    from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexType,
                               VectorMetric)
    from reindexer_tpu.index.vector.params import HnswSearchParams

    def build(disable_native):
        old = H._HNSW_NATIVE, H._HNSW_NATIVE_TRIED
        if disable_native:
            H._HNSW_NATIVE, H._HNSW_NATIVE_TRIED = None, True
        try:
            idx = H.HnswIndex(IndexDef(
                "v", IndexType.HNSW, vector_opts=FloatVectorOpts(
                    dims=8, metric=VectorMetric.L2, m=4,
                    ef_construction=16)))
            base = np.random.default_rng(7).normal(
                size=(150, 8)).astype(np.float32)
            for i in range(150):
                idx.upsert(i, base[i])
            idx.commit()
            return idx
        finally:
            H._HNSW_NATIVE, H._HNSW_NATIVE_TRIED = old

    a = build(disable_native=False)
    assert H._hnsw_native_module() is not None
    b = build(disable_native=True)
    np.testing.assert_array_equal(a._links0, b._links0)
    for ua, ub in zip(a._upper, b._upper):
        np.testing.assert_array_equal(ua, ub)
    assert a._entry == b._entry and a._max_level == b._max_level


def test_native_phrase_parity(rng):
    """C++ verify_phrases must agree with the pure-Python phrase walk."""
    import os
    import numpy as np
    from reindexer_tpu.ft.config import FtFastConfig
    from reindexer_tpu.ft.dataholder import FtDataHolder
    from reindexer_tpu.ft.selector import FtSelector

    words = ["aa", "bb", "cc", "dd", "ee"]
    docs = [(i, [" ".join(rng.choice(words, size=rng.integers(4, 12)))])
            for i in range(300)]
    cfg = FtFastConfig()
    holder = FtDataHolder(cfg, ["text"])
    holder.build(docs, 300)
    if holder.native_module() is None or \
            not hasattr(holder.native_module(), "verify_phrases"):
        import pytest
        pytest.skip("no compiler for the native module")
    sel = FtSelector(holder, cfg)
    queries = ['"aa bb"', '"bb cc"~2', '"aa bb cc"', '"cc dd"~3']
    native = [sel.process(q) for q in queries]
    os.environ["RX_TPU_DISABLE_NATIVE"] = "1"
    try:
        import reindexer_tpu.ft.dataholder as dh
        # force the pure-Python fallback inside _verify_phrases
        saved = dh._NATIVE, dh._NATIVE_TRIED
        dh._NATIVE, dh._NATIVE_TRIED = None, True
        pure = [sel.process(q) for q in queries]
        dh._NATIVE, dh._NATIVE_TRIED = saved
    finally:
        os.environ.pop("RX_TPU_DISABLE_NATIVE", None)
    for q, a, b in zip(queries, native, pure):
        assert sorted(a.ids.tolist()) == sorted(b.ids.tolist()), \
            f"phrase parity broke for {q!r}"


def test_native_score_merge_parity(rng):
    """C++ score_merge (the host BM25 merge) must produce the same docs AND
    ranks as the device sorted-scan scorer across must/not/proximity/
    fullmatch/typo-variant query shapes."""
    import numpy as np
    from reindexer_tpu.ft.config import FtFastConfig
    from reindexer_tpu.ft.dataholder import FtDataHolder
    from reindexer_tpu.ft.selector import FtSelector

    words = [f"w{i}" for i in range(60)] + ["exact"]
    docs = [(i, [" ".join(rng.choice(words, size=rng.integers(3, 14)))])
            for i in range(400)]
    docs.append((400, ["exact"]))          # fullMatchBoost candidate
    cfg = FtFastConfig()
    holder = FtDataHolder(cfg, ["text"])
    holder.build(docs, 401)
    if holder.native_module() is None or \
            not hasattr(holder.native_module(), "score_merge"):
        import pytest
        pytest.skip("no compiler for the native module")
    sel = FtSelector(holder, cfg)
    queries = ["w1", "w1 w2", "w3 -w4", "+w5 +w6", "w7 w8 w9",
               "exact", "w1*", "w10~"]
    host = [sel.process(q) for q in queries]
    saved = sel.HOST_SCORE_MAX
    try:
        FtSelector.HOST_SCORE_MAX = 0     # force the device path
        dev = [sel.process(q) for q in queries]
    finally:
        FtSelector.HOST_SCORE_MAX = saved
    for q, a, b in zip(queries, host, dev):
        assert a.ids.tolist() == b.ids.tolist(), f"doc parity broke: {q!r}"
        np.testing.assert_allclose(a.ranks, b.ranks, rtol=1e-4,
                                   err_msg=f"rank parity broke: {q!r}")


def test_native_merge_three_way_parity(rng):
    """score_merge_dense == score_merge_runs == device sorted scorer on a
    corpus large enough to trip the dense router, across query shapes that
    exercise must/not/proximity/fullmatch and multi-variant merges."""
    import numpy as np
    from reindexer_tpu.ft.config import FtFastConfig
    from reindexer_tpu.ft.dataholder import FtDataHolder
    from reindexer_tpu.ft.dsl import parse_ft_dsl
    from reindexer_tpu.ft.selector import FtSelector

    words = [f"w{i}" for i in range(40)] + ["frequent", "also"]
    docs = []
    for i in range(600):
        toks = ["frequent"] if i % 2 == 0 else []
        if i % 3 == 0:
            toks.append("also")
        toks += list(rng.choice(words[:40], size=rng.integers(2, 9)))
        docs.append((i, [" ".join(toks)]))
    cfg = FtFastConfig()
    holder = FtDataHolder(cfg, ["text"])
    holder.build(docs, 600)
    if holder.native_module() is None or \
            not hasattr(holder.native_module(), "score_merge_dense"):
        import pytest
        pytest.skip("no compiler for the native module")
    sel = FtSelector(holder, cfg)
    queries = ["frequent", "frequent also", "frequent -w1", "+frequent +also",
               "frequent w2 w3", "w1*"]
    variants = {}
    for qs in queries:
        q = parse_ft_dsl(qs)
        prep = sel._prepare(q)
        t = len(prep["must"])
        dense = sel._score_host(q, prep, merge_k=100, use_prox=t > 1,
                                use_fm=True, n_pos_terms=t)
        saved = FtSelector.DENSE_MIN
        try:
            FtSelector.DENSE_MIN = 1 << 60     # force the heap-runs merge
            runs = sel._score_host(q, prep, merge_k=100, use_prox=t > 1,
                                   use_fm=True, n_pos_terms=t)
        finally:
            FtSelector.DENSE_MIN = saved
        variants[qs] = (dense, runs)
    # force the dense router for every query size in this test
    saved_min = FtSelector.DENSE_MIN
    saved_max = FtSelector.HOST_SCORE_MAX
    try:
        FtSelector.DENSE_MIN = 0
        for qs, (dense, runs) in variants.items():
            assert runs is not None
            q = parse_ft_dsl(qs)
            prep = sel._prepare(q)
            t = len(prep["must"])
            dense2 = sel._score_host(q, prep, merge_k=100, use_prox=t > 1,
                                     use_fm=True, n_pos_terms=t)
            assert dense2[1].tolist() == runs[1].tolist(), qs
            np.testing.assert_allclose(dense2[0], runs[0], rtol=1e-5,
                                       err_msg=qs)
        # device parity end-to-end (docs + normalized ranks)
        host_res = [sel.process(qs) for qs in queries]
        FtSelector.HOST_SCORE_MAX = 0
        dev_res = [sel.process(qs) for qs in queries]
    finally:
        FtSelector.DENSE_MIN = saved_min
        FtSelector.HOST_SCORE_MAX = saved_max
    for qs, a, b in zip(queries, host_res, dev_res):
        assert a.ids.tolist() == b.ids.tolist(), f"doc parity broke: {qs!r}"
        np.testing.assert_allclose(a.ranks, b.ranks, rtol=1e-4,
                                   err_msg=f"rank parity broke: {qs!r}")


def test_single_word_top_cache_consistency(rng):
    """The per-word materialized top-merge_k cache returns exactly what the
    uncached dense path returns, across repeats and an rboost change."""
    import numpy as np
    from reindexer_tpu.ft.config import FtFastConfig
    from reindexer_tpu.ft.dataholder import FtDataHolder
    from reindexer_tpu.ft.dsl import parse_ft_dsl
    from reindexer_tpu.ft.selector import FtSelector

    words = [f"w{i}" for i in range(30)] + ["frequent"]
    docs = []
    for i in range(500):
        toks = ["frequent"] if i % 2 == 0 else []
        toks += list(rng.choice(words[:30], size=rng.integers(2, 7)))
        docs.append((i, [" ".join(toks)]))
    cfg = FtFastConfig()
    holder = FtDataHolder(cfg, ["text"])
    holder.build(docs, 500)
    if holder.native_module() is None or \
            not hasattr(holder.native_module(), "score_merge_dense"):
        import pytest
        pytest.skip("no compiler for the native module")
    sel = FtSelector(holder, cfg)
    q = parse_ft_dsl("frequent")
    prep = sel._prepare(q)
    saved = FtSelector.DENSE_MIN
    try:
        FtSelector.DENSE_MIN = 0            # force the dense/cached route
        a = sel._score_host(q, prep, merge_k=64, use_prox=False,
                            use_fm=True, n_pos_terms=1)
        assert getattr(holder, "_single_top_cache", None), "cache not set"
        b = sel._score_host(q, prep, merge_k=64, use_prox=False,
                            use_fm=True, n_pos_terms=1)   # cache hit
        assert a[1].tolist() == b[1].tolist()
        np.testing.assert_array_equal(a[0], b[0])
        # different boost: same docs, scaled scores
        q2 = parse_ft_dsl("frequent^2")
        prep2 = sel._prepare(q2)
        c = sel._score_host(q2, prep2, merge_k=64, use_prox=False,
                            use_fm=True, n_pos_terms=1)
        if c is not None and prep2["run_len"][0] == prep["run_len"][0]:
            assert c[1].tolist() == b[1].tolist()
            np.testing.assert_allclose(c[0], 2.0 * b[0], rtol=1e-5)
    finally:
        FtSelector.DENSE_MIN = saved
