"""Cost-based condition ordering + AND short-circuit (reference:
QueryPreprocessor cost-based reorder, nsselecter/querypreprocessor.cc)."""
import numpy as np

from reindexer_tpu import IndexDef, IndexOpts, Query, Reindexer


def make_db():
    db = Reindexer()
    db.open_namespace("ns", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("grp", "hash", "int"),
    ])
    for i in range(200):
        db.upsert("ns", {"id": i, "grp": i % 10, "raw": f"r{i % 7}"})
    return db


def selectors(res):
    return res.explain["selectors"]


def test_indexed_condition_runs_first():
    db = make_db()
    # 'raw' is non-indexed (cost 40), 'grp' indexed (cost 10): the planner
    # must evaluate grp first even though raw is written first
    q = Query("ns").where("raw", "EQ", "r3").where("grp", "EQ", 4).explain()
    res = db.select(q)
    sel = selectors(res)
    order = [s["field"] for s in sel]
    assert order.index("grp") < order.index("raw"), order
    expect = {i for i in range(200) if i % 10 == 4 and i % 7 == 3}
    assert {it.doc["id"] for it in res} == expect


def test_and_short_circuit_skips_when_empty():
    db = make_db()
    q = (Query("ns").where("grp", "EQ", 99)       # matches nothing
         .where("raw", "EQ", "r3").explain())
    res = db.select(q)
    assert len(res) == 0
    sel = selectors(res)
    skipped = [s for s in sel if s.get("skipped")]
    assert skipped and skipped[0]["field"] == "raw", sel


def test_or_prevents_short_circuit():
    db = make_db()
    q = (Query("ns").where("grp", "EQ", 99)       # empty...
         .where("raw", "EQ", "nope")
         .op_or().where("grp", "EQ", 2).explain())  # ...revived by OR
    res = db.select(q)
    assert {it.doc["id"] for it in res} == {i for i in range(200)
                                            if i % 10 == 2}
    assert not [s for s in selectors(res) if s.get("skipped")]


def test_reorder_preserves_not_semantics():
    db = make_db()
    # NOT on a cheap indexed entry reorders before the raw comparator
    q = (Query("ns").where("raw", "EQ", "r1")
         .op_not().where("grp", "EQ", 8))
    got = {it.doc["id"] for it in db.select(q)}
    expect = {i for i in range(200) if i % 7 == 1 and i % 10 != 8}
    assert got == expect


def test_count_cached_query_cache():
    """count_cached totals are served from the per-ns query-count cache and
    invalidated on any namespace change (reference: QueryCountCache)."""
    db = make_db()
    q = (Query("ns").where("grp", "EQ", 4)
         .aggregate("count_cached").limit(0))
    r1 = db.select(q)
    assert r1.aggregations[0].value == 20

    # second run must come from the cache: instrument both evaluation
    # paths (mask algebra and the id-space fast path) to prove it
    sel = db._selecter
    orig = sel._eval_entries
    orig_fast = sel._fast_and_rows
    calls = []
    sel._eval_entries = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    sel._fast_and_rows = lambda *a, **k: (calls.append(1),
                                          orig_fast(*a, **k))[1]
    r2 = db.select(q)
    assert r2.aggregations[0].value == 20
    assert not calls, "cached count must not re-evaluate conditions"

    # a write bumps ns.version -> cache invalidated, fresh count
    db.upsert("ns", {"id": 1000, "grp": 4, "raw": "zz"})
    r3 = db.select(q)
    assert calls
    assert r3.aggregations[0].value == 21
    sel._eval_entries = orig
    sel._fast_and_rows = orig_fast


def test_join_preselect_cache():
    """Joined-ns preselect rows + hash table are cached until the joined
    namespace changes (reference: JoinCache / JoinPreResult)."""
    db = make_db()
    db.open_namespace("other", [
        IndexDef("oid", "hash", "int", opts=IndexOpts(is_pk=True)),
    ])
    for i in range(50):
        db.upsert("other", {"oid": i, "ref": i % 10, "flag": i % 2})

    def run():
        q = Query("ns")
        q.inner_join(Query("other").where("flag", "EQ", 0)).on(
            "grp", "EQ", "ref")
        return {it.doc["id"] for it in db.select(q)}

    expect = {i for i in range(200) if (i % 10) % 2 == 0}  # even refs only
    got1 = run()
    assert got1 == expect

    sel = db._selecter
    orig = sel._eval_entries
    joined_evals = []

    def spy(ns, *a, **k):
        if ns.name == "other":
            joined_evals.append(1)
        return orig(ns, *a, **k)

    sel._eval_entries = spy
    assert run() == expect
    assert not joined_evals, "join preselect must be cached"

    # writing to the joined ns invalidates the cache (ref=3 now matches)
    db.upsert("other", {"oid": 100, "ref": 3, "flag": 0})
    assert run() == expect | {i for i in range(200) if i % 10 == 3}
    assert joined_evals
    sel._eval_entries = orig


def test_background_ttl_expiry():
    """The TTL daemon removes expired rows without any query touching the
    namespace (reference: TTL index expiry thread, ttlindex.cc)."""
    import time as _t
    db = Reindexer()
    db.update_config("ttl_poll_interval_sec", 0.05)
    db.open_namespace("t", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("ts", "ttl", "int64", opts=IndexOpts(expire_after=1)),
    ])
    now = int(_t.time())
    db.upsert("t", {"id": 1, "ts": now - 100})    # long expired
    db.upsert("t", {"id": 2, "ts": now + 3600})   # fresh
    ns = db.get_namespace("t")
    deadline = _t.time() + 5.0
    while _t.time() < deadline and ns.item_count() != 1:
        _t.sleep(0.05)
    assert ns.item_count() == 1                   # expired without a select
    got = {it.doc["id"] for it in db.select(Query("t"))}
    assert got == {2}
    db.close()


def test_queries_perf_stats():
    """#queriesperfstats aggregates per normalized query (values stripped).
    Stats default off per the reference (dbconfig.h:72-75); enable via a
    #config upsert exactly like the reference tests (reindexertestapi.cc:468).
    """
    db = make_db()
    db.upsert("#config", {"type": "profiling",
                          "profiling": {"queriesperfstats": True}})
    for v in (1, 2, 3):
        db.select(Query("ns").where("grp", "EQ", v))
    db.select(Query("ns").where("grp", "LT", 5))
    stats = {it.doc["query"]: it.doc for it in db.select(Query("#queriesperfstats"))}
    eq = [v for k, v in stats.items() if " EQ ?" in k and "grp" in k]
    assert eq and eq[0]["total_queries_count"] == 3
    assert eq[0]["total_avg_latency_us"] > 0
    lt = [v for k, v in stats.items() if " LT ?" in k]
    assert lt and lt[0]["total_queries_count"] == 1


def test_selectivity_orders_indexed_conditions():
    """Within the indexed cost class, smaller posting-size estimates run
    first (reference: cost-based reorder with index stats)."""
    db = Reindexer()
    db.open_namespace("s", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("wide", "hash", "int"),    # 2 distinct values -> big postings
        IndexDef("narrow", "hash", "int"),  # 100 distinct -> small postings
    ])
    for i in range(400):
        db.upsert("s", {"id": i, "wide": i % 2, "narrow": i % 100})
    q = (Query("s").where("wide", "EQ", 0).where("narrow", "EQ", 7)
         .explain())
    res = db.select(q)
    order = [s["field"] for s in res.explain["selectors"]]
    assert order.index("narrow") < order.index("wide"), order
    assert {it.doc["id"] for it in res} == {
        i for i in range(400) if i % 2 == 0 and i % 100 == 7}


def test_range_selectivity_orders_tree_conditions():
    """Tree (ordered) indexes estimate range selectivity from the key
    distribution: a narrow range runs before a wide one (reference:
    ordered-index cost via distribution stats, querypreprocessor.cc)."""
    db = Reindexer()
    db.open_namespace("r", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("a", "tree", "int"),
        IndexDef("b", "tree", "int"),
    ])
    for i in range(500):
        db.upsert("r", {"id": i, "a": i, "b": i})
    # a < 490 matches ~490 rows; b < 10 matches 10 — b must run first
    q = (Query("r").where("a", "LT", 490).where("b", "LT", 10).explain())
    res = db.select(q)
    order = [s["field"] for s in res.explain["selectors"]]
    assert order.index("b") < order.index("a"), order
    assert {it.doc["id"] for it in res} == set(range(10))


def test_range_estimate_values():
    from reindexer_tpu.core.type_consts import CondType
    db = Reindexer()
    db.open_namespace("e", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("t", "tree", "int"),
    ])
    for i in range(100):
        db.upsert("e", {"id": i, "t": i})
    idx = db._namespaces["e"].get_index("t")
    assert idx.estimate_matches(CondType.LT, (25,)) == 25
    assert idx.estimate_matches(CondType.GE, (90,)) == 10
    assert idx.estimate_matches(CondType.RANGE, (10, 19)) == 10
    assert idx.estimate_matches(CondType.EQ, (5,)) == 1
