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
