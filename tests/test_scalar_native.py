"""Oracle-equivalence suite for the native scalar conjunction lane.

csrc/scalar_native.cpp evaluates all-AND/NOT conjunctions in one C call by
walking the live Python engine structures (posting dicts, Column buffers).
Its safety contract (see the .cpp header) is: anything it cannot evaluate
EXACTLY like the Python paths must bail to them. These tests enforce the
contract from both sides:

  - when the native lane claims a result, it must equal BOTH the pure-Python
    fast path (query/executor.py _fast_and_rows) and the mask-algebra path;
  - shapes the lane must refuse (inexact value coercions, unsupported
    conditions/index kinds) still return mask-identical results via bail.

Reference analog being mirrored: the C++ selectLoop
(cpp_src/core/nsselecter/nsselecter.cc) driving comparators from the most
selective SelectIterator.
"""
import numpy as np
import pytest

from reindexer_tpu import IndexDef, IndexOpts, Query, Reindexer
from reindexer_tpu.core.type_consts import CondType
from reindexer_tpu.query import executor as ex

_mod = ex._scalar_native()
pytestmark = pytest.mark.skipif(
    _mod is None, reason="scalar_native failed to build (no compiler?)")


def _results(db, q):
    return [(it.row_id, dict(it.doc)) for it in db.select(q)]


def _three_paths(db, q):
    """Run the query via (native, python-fast, mask) and report whether the
    native lane produced the result (vs bailing)."""
    sel = db._selecter
    native_used = []
    orig_native = ex.Selecter._native_and_rows

    def spy(self, ns, query):
        r = orig_native(self, ns, query)
        native_used.append(r is not None)
        return r

    ex.Selecter._native_and_rows = spy
    try:
        got_native = _results(db, q)
    finally:
        ex.Selecter._native_and_rows = spy_off = orig_native
        del spy_off
    # pure-Python fast path: native lane force-bails
    ex.Selecter._native_and_rows = lambda self, ns, query: None
    try:
        got_pyfast = _results(db, q)
    finally:
        ex.Selecter._native_and_rows = orig_native
    # mask path: whole fast path force-bails
    orig_fast = sel._fast_and_rows
    sel._fast_and_rows = lambda *a, **k: None
    try:
        got_mask = _results(db, q)
    finally:
        sel._fast_and_rows = orig_fast
    return got_native, got_pyfast, got_mask, any(native_used)


def _check(db, q, expect_native=None):
    native, pyfast, mask, used = _three_paths(db, q)
    assert native == pyfast == mask, f"path divergence for {q}"
    if expect_native is not None:
        assert used == expect_native, (
            f"native used={used}, expected {expect_native} for {q}")
    return native, used


@pytest.fixture()
def db():
    rng = np.random.default_rng(11)
    d = Reindexer()
    d.open_namespace("ns", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("grp", "hash", "int"),
        IndexDef("year", "tree", "int"),
        IndexDef("price", "tree", "double"),
        IndexDef("rate", "hash", "double"),
        IndexDef("name", "hash", "string"),
        IndexDef("flag", "hash", "bool"),
        IndexDef("tags", "hash", "int", opts=IndexOpts(is_array=True)),
        IndexDef("score", "-", "int"),      # store index: column probes only
    ])
    for i in range(500):
        doc = {"id": i, "grp": i % 9, "year": 2000 + i % 25,
               "price": float(i) * 0.5, "rate": float(i % 40),
               "name": f"n{i % 13}", "flag": bool(i % 2),
               "tags": [int(t) for t in rng.integers(0, 20, size=i % 4)],
               "score": i % 100}
        if i % 11 == 0:
            doc.pop("name")     # sparse indexed string field
        if i % 13 == 0:
            doc.pop("rate")     # sparse indexed double field
        d.upsert("ns", doc)
    for i in range(0, 500, 19):
        d.delete("ns", {"id": i})
    return d


# ---------------------------------------------------------------------
# shapes the native lane must HANDLE (expect_native=True)
# ---------------------------------------------------------------------

def test_hash_eq_conjunction(db):
    q = Query("ns").where("grp", "=", 3).where("year", ">", 2010)
    r, _ = _check(db, q, expect_native=True)
    assert r


def test_set_driver_union(db):
    q = (Query("ns").where("id", "in", list(range(0, 500, 7)))
         .where("grp", "=", 4))
    _check(db, q, expect_native=True)


def test_tree_int_range_probe(db):
    q = (Query("ns").where("grp", "=", 2)
         .where("year", "range", [2005, 2015]))
    r, _ = _check(db, q, expect_native=True)
    assert r


def test_double_column_range(db):
    q = Query("ns").where("grp", "=", 1).where("price", "<", 120.5)
    r, _ = _check(db, q, expect_native=True)
    assert r


def test_double_hash_eq_with_exact_int(db):
    # int literal against a double hash index: stored key is float(v);
    # hash(7) == hash(7.0) makes the raw probe key-equal — native handles
    q = Query("ns").where("rate", "=", 7).where("grp", "=", 7)
    _check(db, q, expect_native=True)


def test_string_eq_and_set(db):
    q = Query("ns").where("name", "=", "n5").where("grp", "=", 5)
    _check(db, q, expect_native=True)
    q2 = Query("ns").where("name", "in", ["n1", "n2", "zz"]).where(
        "grp", "=", 1)
    _check(db, q2, expect_native=True)


def test_bool_field(db):
    q = Query("ns").where("flag", "=", True).where("grp", "=", 6)
    _check(db, q, expect_native=True)
    # int 1 against a bool index is key-equal (True == 1)
    q2 = Query("ns").where("flag", "=", 1).where("grp", "=", 6)
    _check(db, q2, expect_native=True)


def test_array_field_driver_and_probe(db):
    q = Query("ns").where("tags", "in", [3, 5]).where("year", ">", 2003)
    r, _ = _check(db, q, expect_native=True)
    rows = [rid for rid, _ in r]
    assert len(rows) == len(set(rows))  # multi-key driver must dedup
    q2 = Query("ns").where("grp", "=", 2).where("tags", "in", [7, 9])
    _check(db, q2, expect_native=True)


def test_allset_on_array(db):
    q = (Query("ns").where("tags", "allset", [1, 2])
         .where("year", ">", 1990))
    _check(db, q, expect_native=True)


def test_any_and_empty_conditions(db):
    q = Query("ns").where("grp", "=", 0).where("name", CondType.ANY, ())
    _check(db, q, expect_native=True)
    q2 = Query("ns").where("grp", "=", 0).where("name", CondType.EMPTY, ())
    _check(db, q2, expect_native=True)
    # ANY as the driver entry
    q3 = Query("ns").where("rate", CondType.ANY, ()).where("grp", "=", 3)
    _check(db, q3, expect_native=True)


def test_not_entries(db):
    q = (Query("ns").where("grp", "=", 2)
         .op_not().where("year", "<=", 2012))
    _check(db, q, expect_native=True)
    q2 = (Query("ns").where("grp", "=", 2)
          .op_not().where("name", "=", "n2"))
    _check(db, q2, expect_native=True)


def test_store_index_column_probe(db):
    # store ("-") index has no postings: native probes the numpy column
    q = Query("ns").where("grp", "=", 4).where("score", "<", 50)
    _check(db, q, expect_native=True)
    q2 = Query("ns").where("grp", "=", 4).where("score", "in", [22, 40, 58])
    _check(db, q2, expect_native=True)


def test_join_positions_probed_by_caller(db):
    db.open_namespace("other", [
        IndexDef("oid", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("g", "hash", "int"),
    ])
    for i in range(60):
        db.upsert("other", {"oid": i, "g": i % 9})
    q = (Query("ns").where("grp", "=", 4)
         .inner_join(Query("other").where("g", "=", 4))
         .on("grp", "=", "g"))
    r, _ = _check(db, q, expect_native=True)
    assert r


def test_deleted_rows_excluded(db):
    # rows deleted in the fixture (every 19th id) must never appear
    q = Query("ns").where("grp", "=", 0).where("year", ">", 1990)
    r, _ = _check(db, q, expect_native=True)
    assert all(rdoc["id"] % 19 != 0 for _, rdoc in r)


def test_schema_change_refreshes_native_meta(db):
    q = Query("ns").where("grp", "=", 3).where("year", ">", 2015)
    _check(db, q, expect_native=True)
    db.get_namespace("ns").add_index(IndexDef("extra", "hash", "int"))
    db.upsert("ns", {"id": 900, "grp": 3, "year": 2020, "extra": 1,
                     "name": "zz", "flag": True, "tags": [],
                     "price": 1.0, "rate": 1.0, "score": 1})
    q2 = (Query("ns").where("grp", "=", 3).where("year", ">", 2015)
          .where("extra", "=", 1))
    r, _ = _check(db, q2, expect_native=True)
    assert any(rdoc["id"] == 900 for _, rdoc in r)


def test_live_mutation_visibility(db):
    # the cached FieldMeta holds refs to in-place-mutated containers:
    # upserts/deletes between queries must be visible without a schema bump
    q = Query("ns").where("grp", "=", 5).where("year", "=", 2014)
    before, _ = _check(db, q, expect_native=True)
    db.upsert("ns", {"id": 901, "grp": 5, "year": 2014, "name": "nn",
                     "flag": False, "tags": [1], "price": 2.0,
                     "rate": 2.0, "score": 2})
    after, _ = _check(db, q, expect_native=True)
    assert len(after) == len(before) + 1
    db.delete("ns", {"id": 901})
    again, _ = _check(db, q, expect_native=True)
    assert [rid for rid, _ in again] == [rid for rid, _ in before]


# ---------------------------------------------------------------------
# shapes the native lane must REFUSE (bail; results still mask-identical)
# ---------------------------------------------------------------------

def test_float_literal_on_int_index_bails(db):
    # coerce_scalar truncates 3.7 -> 3 for an int hash key; the raw float
    # would probe a different dict slot — the lane must bail
    q = Query("ns").where("grp", "=", 3.7).where("year", ">", 2010)
    _check(db, q, expect_native=False)


def test_inexact_int_on_double_index_bails(db):
    big = (1 << 62) + 1  # not exactly representable as double
    q = Query("ns").where("rate", "=", big).where("grp", "=", 1)
    _check(db, q, expect_native=False)


def test_float_range_on_int_tree_bails(db):
    # Python truncates the bound through coerce; int compare vs 2010.5
    # differs from float compare — bail
    q = Query("ns").where("grp", "=", 3).where("year", ">", 2010.5)
    _check(db, q, expect_native=False)


def test_or_query_bails(db):
    q = Query("ns").where("grp", "=", 1).op_or().where("grp", "=", 2)
    _check(db, q, expect_native=False)


def test_like_bails(db):
    q = Query("ns").where("grp", "=", 1).where("name", "like", "n%")
    _check(db, q, expect_native=False)


def test_overflow_int_hash_probe_is_exact(db):
    # a >64-bit int probes the posting dict hash-exactly (Python ints are
    # unbounded; no such key -> empty result) — native handles it. The
    # overflow gate only matters for int64 COLUMN probes (range/store).
    q = Query("ns").where("grp", "=", 1 << 70).where("year", ">", 2000)
    r, _ = _check(db, q, expect_native=True)
    assert r == []


def test_overflow_int_column_probe_bails(db):
    # store-index column probe with a >int64 literal must bail
    q = Query("ns").where("grp", "=", 1).where("score", "<", 1 << 70)
    _check(db, q, expect_native=False)


def test_no_selective_driver_bails(db):
    # range-only conjunction: no hash/posting driver -> native bails,
    # Python fast path may also bail; mask path owns it either way
    q = Query("ns").where("year", ">", 2005).where("price", "<", 200.0)
    _check(db, q, expect_native=False)


# ---------------------------------------------------------------------
# randomized cross-path fuzz
# ---------------------------------------------------------------------

def test_random_conjunctions_three_way(db):
    rng = np.random.default_rng(23)
    conds = [
        lambda: ("grp", "=", int(rng.integers(0, 9))),
        lambda: ("year", ">", int(rng.integers(2000, 2024))),
        lambda: ("year", "<=", int(rng.integers(2001, 2025))),
        lambda: ("price", "range",
                 sorted(float(x) for x in rng.uniform(0, 250, 2))),
        lambda: ("rate", "=", int(rng.integers(0, 40))),
        lambda: ("name", "=", f"n{int(rng.integers(0, 13))}"),
        lambda: ("flag", "=", bool(rng.integers(0, 2))),
        lambda: ("id", "in", [int(x) for x in rng.integers(0, 500, 6)]),
        lambda: ("tags", "in", [int(x) for x in rng.integers(0, 20, 3)]),
        lambda: ("tags", "allset", [int(x) for x in rng.integers(0, 20, 2)]),
        lambda: ("score", "<", int(rng.integers(0, 100))),
        lambda: ("name", CondType.ANY, ()),
        lambda: ("rate", CondType.EMPTY, ()),
    ]
    native_hits = 0
    for trial in range(60):
        picks = rng.choice(len(conds), size=int(rng.integers(1, 5)),
                           replace=False)
        q = Query("ns")
        for j, p in enumerate(picks):
            f, c, v = conds[p]()
            if j > 0 and rng.random() < 0.25:
                q = q.op_not().where(f, c, v)
            else:
                q = q.where(f, c, v)
        native, pyfast, mask, used = _three_paths(db, q)
        assert native == pyfast == mask, f"trial {trial}: {q}"
        native_hits += used
    assert native_hits > 20  # the lane must actually engage, not just bail
