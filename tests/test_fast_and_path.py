"""Equivalence tests for the id-space AND fast path (_fast_and_rows).

The fast path (executor.py _fast_and_rows) must be result-identical to the
whole-column mask algebra it bypasses (reference analog: the most selective
SelectIterator drives the scan, comparators only see its rows —
nsselecter.cc selectLoop). Every test runs the same query twice — fast path
enabled (default) and force-disabled — and compares ordered results.
"""
import numpy as np
import pytest

from reindexer_tpu import IndexDef, IndexOpts, Query, Reindexer
from reindexer_tpu.core.type_consts import CondType


def _results(db, q):
    return [(it.row_id, dict(it.doc)) for it in db.select(q)]


def _both_paths(db, q):
    sel = db._selecter
    fast_used = []
    orig = sel._fast_and_rows

    def spy(*a, **k):
        r = orig(*a, **k)
        fast_used.append(r is not None)
        return r

    sel._fast_and_rows = spy
    try:
        got_fast = _results(db, q)
    finally:
        sel._fast_and_rows = orig
    sel._fast_and_rows = lambda *a, **k: None
    try:
        got_mask = _results(db, q)
    finally:
        sel._fast_and_rows = orig
    return got_fast, got_mask, any(fast_used)


@pytest.fixture()
def db():
    rng = np.random.default_rng(7)
    d = Reindexer()
    d.open_namespace("ns", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("grp", "hash", "int"),
        IndexDef("year", "tree", "int"),
        IndexDef("name", "hash", "string"),
        IndexDef("tags", "hash", "int", opts=IndexOpts(is_array=True)),
    ])
    for i in range(400):
        doc = {"id": i, "grp": i % 7, "year": 2000 + i % 25,
               "name": f"n{i % 13}",
               "tags": [int(t) for t in rng.integers(0, 20, size=i % 4)]}
        if i % 11 == 0:
            doc.pop("name")  # sparse-ish: unset indexed field
        d.upsert("ns", doc)
    for i in range(0, 400, 17):
        d.delete("ns", {"id": i})
    return d


def test_conjunction_equivalence(db):
    q = (Query("ns").where("grp", "=", 3)
         .where("year", ">", 2010).where("id", "in", list(range(0, 400, 3))))
    fast, mask, used = _both_paths(db, q)
    assert used and fast == mask and fast


def test_not_entry_equivalence(db):
    q = (Query("ns").where("grp", "=", 2)
         .op_not().where("year", "<=", 2012))
    fast, mask, used = _both_paths(db, q)
    assert used and fast == mask


def test_array_field_probe(db):
    # array-indexed field as a non-driver probe entry
    q = Query("ns").where("grp", "=", 1).where("tags", "in", [3, 5])
    fast, mask, used = _both_paths(db, q)
    assert used and fast == mask


def test_array_field_driver_dedup(db):
    # array-indexed driver: one row can appear under several keys; the
    # fast path must not return duplicates (a second entry keeps the query
    # off the single-entry point fast path)
    q = Query("ns").where("tags", "in", [1, 2]).where("year", ">", 0)
    fast, mask, used = _both_paths(db, q)
    assert used and fast == mask
    rows = [r for r, _ in fast]
    assert len(rows) == len(set(rows))


def test_unset_field_equivalence(db):
    # rows with the 'name' field missing must behave identically
    q = Query("ns").where("grp", "=", 0).where("name", "=", "n0")
    fast, mask, used = _both_paths(db, q)
    assert used and fast == mask


def test_or_falls_back_to_mask_path(db):
    q = Query("ns").where("grp", "=", 1).op_or().where("grp", "=", 2)
    fast, mask, used = _both_paths(db, q)
    assert not used  # OR disqualifies the fast path
    assert fast == mask


def _both_or_paths(db, q):
    sel = db._selecter
    used = []
    orig = sel._fast_or_rows

    def spy(*a, **k):
        r = orig(*a, **k)
        used.append(r is not None)
        return r

    sel._fast_or_rows = spy
    try:
        got_fast = _results(db, q)
    finally:
        sel._fast_or_rows = orig
    sel._fast_or_rows = lambda *a, **k: None
    try:
        got_mask = _results(db, q)
    finally:
        sel._fast_or_rows = orig
    return got_fast, got_mask, any(used)


def test_pure_or_union_equivalence(db):
    q = (Query("ns").where("grp", "=", 1).op_or().where("grp", "=", 4)
         .op_or().where("name", "=", "n5"))
    fast, mask, used = _both_or_paths(db, q)
    assert used and fast == mask and fast


def test_or_with_array_arm(db):
    q = Query("ns").where("grp", "=", 2).op_or().where("tags", "in", [7])
    fast, mask, used = _both_or_paths(db, q)
    assert used and fast == mask
    rows = [r for r, _ in fast]
    assert len(rows) == len(set(rows))


def test_mixed_and_or_uses_mask_path(db):
    q = (Query("ns").where("grp", "=", 1).where("year", ">", 2005)
         .op_or().where("grp", "=", 2))
    fast, mask, used = _both_or_paths(db, q)
    assert not used  # AND+OR mix stays on the mask path
    assert fast == mask


def test_large_driver_falls_back(db):
    # driver estimate above the cap -> mask path (still correct)
    q = Query("ns").where("year", ">", 1990)
    fast, mask, _ = _both_paths(db, q)
    assert fast == mask


def test_join_probe_equivalence(db):
    db.open_namespace("other", [
        IndexDef("oid", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("g", "hash", "int"),
    ])
    for i in range(50):
        db.upsert("other", {"oid": i, "g": i % 7})
    q = (Query("ns").where("grp", "=", 4)
         .inner_join(Query("other").where("g", "=", 4))
         .on("grp", "=", "g"))
    fast, mask, used = _both_paths(db, q)
    assert used and fast == mask and fast


def test_join_on_array_field_matches_per_element(db):
    # reference semantics: the ON condition injects the left item's
    # VariantArray into the joined query (CondSet), so `ON tags = gid`
    # matches ANY element of the array (joinedselector.cc)
    db.open_namespace("g2", [
        IndexDef("gid", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("lab", "hash", "string"),
    ])
    for g in range(20):
        db.upsert("g2", {"gid": g, "lab": f"L{g % 5}"})
    q = (Query("ns").where("grp", "=", 3)
         .inner_join(Query("g2").where("lab", "=", "L2")).on("tags", "=", "gid"))
    got = sorted(it.doc["id"] for it in db.select(q))
    lset = {g for g in range(20) if g % 5 == 2}
    rng = np.random.default_rng(7)
    tags_of = {}
    for i in range(400):
        tags_of[i] = [int(t) for t in rng.integers(0, 20, size=i % 4)]
    deleted = set(range(0, 400, 17))
    expect = sorted(i for i in range(400)
                    if i % 7 == 3 and i not in deleted
                    and (set(tags_of[i]) & lset))
    assert got == expect and got


def test_limit_offset_sort_pagination(db):
    q = (Query("ns").where("grp", "=", 5).where("year", ">", 2005)
         .sort("year", desc=True).limit(5).offset(2))
    fast, mask, used = _both_paths(db, q)
    assert used and fast == mask


def test_fast_path_after_schema_change(db):
    # _fast_meta must refresh when the index set changes
    q = Query("ns").where("grp", "=", 3).where("year", ">", 2015)
    a, b, _ = _both_paths(db, q)
    assert a == b
    db.get_namespace("ns").add_index(IndexDef("extra", "hash", "int"))
    db.upsert("ns", {"id": 900, "grp": 3, "year": 2020, "extra": 1,
                     "name": "zz", "tags": []})
    q2 = (Query("ns").where("grp", "=", 3).where("year", ">", 2015)
          .where("extra", "=", 1))
    fast, mask, used = _both_paths(db, q2)
    assert used and fast == mask
    assert any(r == db.get_namespace("ns").find_by_pk(900) for r, _ in fast)


def test_uuid_pk_upsert_dedup():
    # regression: first_row must route through the subclass key packing
    # (UuidIndex keys postings by 128-bit ints, not canonical strings) —
    # a miss here made upserts duplicate instead of replace
    d = Reindexer()
    d.open_namespace("u", [
        IndexDef("id", "hash", "uuid", opts=IndexOpts(is_pk=True)),
        IndexDef("v", "hash", "int"),
    ])
    uid = "123e4567-e89b-12d3-a456-426614174000"
    d.upsert("u", {"id": uid, "v": 1})
    d.upsert("u", {"id": uid.upper(), "v": 2})  # same PK, different casing
    ns = d.get_namespace("u")
    assert ns.item_count() == 1
    r = [it.doc for it in d.select(Query("u").where("id", "=", uid))]
    assert len(r) == 1 and r[0]["v"] == 2
    assert d.delete("u", {"id": uid})
    assert ns.item_count() == 0


def test_random_conjunctions_match_mask_path(db):
    rng = np.random.default_rng(3)
    conds = [
        lambda r: ("grp", "=", int(rng.integers(0, 7))),
        lambda r: ("year", ">", int(rng.integers(2000, 2024))),
        lambda r: ("year", "<=", int(rng.integers(2001, 2025))),
        lambda r: ("name", "=", f"n{int(rng.integers(0, 13))}"),
        lambda r: ("id", "in", [int(x) for x in rng.integers(0, 400, 5)]),
        lambda r: ("tags", "in", [int(x) for x in rng.integers(0, 20, 3)]),
    ]
    for trial in range(40):
        picks = rng.choice(len(conds), size=int(rng.integers(1, 4)),
                           replace=False)
        q = Query("ns")
        for j, p in enumerate(picks):
            f, c, v = conds[p](rng)
            if j > 0 and rng.random() < 0.25:
                q = q.op_not().where(f, c, v)
            else:
                q = q.where(f, c, v)
        fast, mask, _ = _both_paths(db, q)
        assert fast == mask, f"trial {trial}: {q}"
