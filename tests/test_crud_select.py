"""CRUD + scalar select behavior tests.

Models the reference's Go behavioral suite (test/queries_test.go) at small
scale: every query is re-verified against a naive Python model (the analog
of queries_verifier.h).
"""
import numpy as np
import pytest

from reindexer_tpu import (CondType, IndexDef, IndexOpts, IndexType, FieldType,
                           Query, Reindexer, ConflictError, NotFoundError,
                           QueryError, StrictMode)


def make_db():
    db = Reindexer()
    db.open_namespace("items", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("year", "tree", "int"),
        IndexDef("name", "hash", "string"),
        IndexDef("price", "tree", "double"),
        IndexDef("genres", "hash", "int", opts=IndexOpts(is_array=True)),
        IndexDef("desc", "-", "string"),
    ])
    return db


DOCS = [
    {"id": 1, "year": 2005, "name": "alpha", "price": 1.5, "genres": [1, 2], "desc": "aa", "extra": 7},
    {"id": 2, "year": 2010, "name": "beta", "price": 2.5, "genres": [2, 3], "desc": "bb"},
    {"id": 3, "year": 2015, "name": "gamma", "price": 0.5, "genres": [], "desc": "cc", "extra": 3},
    {"id": 4, "year": 2020, "name": "alpha", "price": 9.5, "genres": [4], "desc": "dd"},
    {"id": 5, "year": 2020, "name": "delta", "price": 4.0, "genres": [1, 4], "desc": "ee"},
]


@pytest.fixture
def db():
    d = make_db()
    for doc in DOCS:
        d.upsert("items", doc)
    return d


def ids(res):
    return sorted(d["id"] for d in res.docs())


def test_upsert_select_eq(db):
    res = db.select(Query("items").where("id", "=", 3))
    assert ids(res) == [3]
    assert res.docs()[0]["name"] == "gamma"


def test_insert_conflict_and_update_missing(db):
    with pytest.raises(ConflictError):
        db.insert("items", {"id": 1, "year": 1999, "name": "x", "price": 0.0})
    with pytest.raises(NotFoundError):
        db.update("items", {"id": 99, "year": 1999, "name": "x", "price": 0.0})


def test_upsert_overwrites(db):
    db.upsert("items", {"id": 1, "year": 2001, "name": "omega", "price": 1.0, "genres": [9]})
    res = db.select(Query("items").where("id", "=", 1))
    assert res.docs()[0]["name"] == "omega"
    assert ids(db.select(Query("items").where("name", "=", "alpha"))) == [4]
    assert ids(db.select(Query("items").where("genres", "=", 9))) == [1]
    assert db.get_namespace("items").item_count() == 5


def test_delete(db):
    assert db.delete("items", {"id": 2}) is True
    assert db.delete("items", {"id": 2}) is False
    assert ids(db.select(Query("items"))) == [1, 3, 4, 5]


def test_range_conditions(db):
    assert ids(db.select(Query("items").where("year", ">", 2010))) == [3, 4, 5]
    assert ids(db.select(Query("items").where("year", ">=", 2010))) == [2, 3, 4, 5]
    assert ids(db.select(Query("items").where("year", "<", 2010))) == [1]
    assert ids(db.select(Query("items").where("year", "range", [2010, 2015]))) == [2, 3]


def test_composite_filter_and(db):
    q = Query("items").where("year", ">", 2009).where("name", "=", "alpha")
    assert ids(db.select(q)) == [4]


def test_or_and_not(db):
    q = Query("items").where("name", "=", "beta").op_or().where("name", "=", "delta")
    assert ids(db.select(q)) == [2, 5]
    q = Query("items").where("year", ">=", 2010).op_not().where("name", "=", "alpha")
    assert ids(db.select(q)) == [2, 3, 5]


def test_brackets(db):
    # year >= 2010 AND (name = alpha OR name = delta)
    q = (Query("items").where("year", ">=", 2010)
         .open_bracket().where("name", "=", "alpha")
         .op_or().where("name", "=", "delta").close_bracket())
    assert ids(db.select(q)) == [4, 5]


def test_set_and_allset_on_array(db):
    assert ids(db.select(Query("items").where("genres", "set", [3, 4]))) == [2, 4, 5]
    assert ids(db.select(Query("items").where("genres", "allset", [1, 4]))) == [5]


def test_any_empty_on_array(db):
    assert ids(db.select(Query("items").where("genres", CondType.ANY))) == [1, 2, 4, 5]
    assert ids(db.select(Query("items").where("genres", CondType.EMPTY))) == [3]


def test_store_index_comparator_fallback(db):
    assert ids(db.select(Query("items").where("desc", "=", "cc"))) == [3]
    assert ids(db.select(Query("items").where("desc", ">", "cc"))) == [4, 5]


def test_like(db):
    assert ids(db.select(Query("items").where("name", CondType.LIKE, "%eta"))) == [2]
    assert ids(db.select(Query("items").where("name", CondType.LIKE, "_lpha"))) == [1, 4]


def test_non_indexed_field(db):
    assert ids(db.select(Query("items").where("extra", ">", 5))) == [1]
    with pytest.raises(QueryError):
        db.select(Query("items").strict(StrictMode.INDEXES).where("extra", ">", 5))
    with pytest.raises(QueryError):
        db.select(Query("items").where("no_such_field", "=", 1))
    # strict none allows unknown fields
    res = db.select(Query("items").strict(StrictMode.NONE).where("no_such_field", "=", 1))
    assert len(res) == 0


def test_sort_limit_offset(db):
    res = db.select(Query("items").sort("price"))
    assert [d["id"] for d in res.docs()] == [3, 1, 2, 5, 4]
    res = db.select(Query("items").sort("price", desc=True).limit(2).offset(1))
    assert [d["id"] for d in res.docs()] == [5, 2]
    assert res.total_count is None
    res = db.select(Query("items").sort("price").req_total_count().limit(2))
    assert res.total_count == 5


def test_multi_sort(db):
    res = db.select(Query("items").sort("year", desc=True).sort("name"))
    assert [d["id"] for d in res.docs()] == [4, 5, 3, 2, 1]


def test_forced_sort(db):
    res = db.select(Query("items").sort("id", forced_values=[3, 1]))
    assert [d["id"] for d in res.docs()] == [3, 1, 2, 4, 5]


def test_sort_expression(db):
    res = db.select(Query("items").sort("price * 2 + year"))
    years_prices = [(d["year"] + d["price"] * 2) for d in res.docs()]
    assert years_prices == sorted(years_prices)


def test_aggregations(db):
    res = db.select(Query("items").aggregate_sum("price"))
    assert res.agg_results()[0]["value"] == pytest.approx(18.0)
    res = db.select(Query("items").aggregate_avg("year"))
    assert res.agg_results()[0]["value"] == pytest.approx(np.mean([2005, 2010, 2015, 2020, 2020]))
    res = db.select(Query("items").aggregate_min("price"))
    assert res.agg_results()[0]["value"] == 0.5
    res = db.select(Query("items").aggregate_max("price"))
    assert res.agg_results()[0]["value"] == 9.5


def test_facet(db):
    res = db.select(Query("items").aggregate_facet("year"))
    facets = {f["values"][0]: f["count"] for f in res.agg_results()[0]["facets"]}
    assert facets == {2005: 1, 2010: 1, 2015: 1, 2020: 2}


def test_facet_array_field(db):
    res = db.select(Query("items").aggregate_facet("genres"))
    facets = {f["values"][0]: f["count"] for f in res.agg_results()[0]["facets"]}
    assert facets == {1: 2, 2: 2, 3: 1, 4: 2}


def test_distinct(db):
    res = db.select(Query("items").distinct("name"))
    assert sorted(res.agg_results()[0]["distincts"]) == ["alpha", "beta", "delta", "gamma"]
    # one item per distinct value
    assert len(res) == 4


def test_select_filter(db):
    res = db.select(Query("items").where("id", "=", 1).select("id", "name"))
    assert res.docs()[0] == {"id": 1, "name": "alpha"}


def test_count_agg(db):
    res = db.select(Query("items").where("year", ">=", 2010).aggregate("count"))
    assert res.agg_results()[0]["value"] == 4


def test_update_query(db):
    res = db.update_query(Query("items").where("year", ">=", 2020).set("flagged", True))
    assert len(res) == 2
    assert ids(db.select(Query("items").where("flagged", "=", True))) == [4, 5]


def test_update_set_expression(db):
    db.update_query(Query("items").where("id", "=", 1).set_expression("price", "price * 2"))
    assert db.select(Query("items").where("id", "=", 1)).docs()[0]["price"] == 3.0


def test_delete_query(db):
    n = db.delete_query(Query("items").where("year", "<", 2015))
    assert n == 2
    assert ids(db.select(Query("items"))) == [3, 4, 5]


def test_between_fields(db):
    db.upsert("items", {"id": 6, "year": 2000, "name": "x", "price": 2000.0, "genres": []})
    q = Query("items").where_between_fields("price", "ge", "year")
    assert ids(db.select(q)) == [6]


def test_explain(db):
    exp = db.explain(Query("items").where("year", ">", 2010))
    assert exp["matched"] == 3
    assert any(s["field"] == "year" for s in exp["selectors"])


def test_transaction(db):
    tx = db.new_transaction("items")
    tx.upsert({"id": 10, "year": 2021, "name": "tx1", "price": 1.0, "genres": []})
    tx.upsert({"id": 11, "year": 2022, "name": "tx2", "price": 2.0, "genres": []})
    tx.delete({"id": 1})
    assert tx.commit() == 3
    assert ids(db.select(Query("items"))) == [2, 3, 4, 5, 10, 11]


def test_meta(db):
    db.put_meta("items", "k1", "v1")
    assert db.get_meta("items", "k1") == "v1"
    assert db.enum_meta("items") == ["k1"]
    db.delete_meta("items", "k1")
    assert db.get_meta("items", "k1") is None


def test_namespaces_lifecycle():
    db = Reindexer()
    db.open_namespace("a", [IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))])
    db.upsert("a", {"id": 1})
    db.rename_namespace("a", "b")
    assert db.namespace_names() == ["b"]
    db.truncate_namespace("b")
    assert len(db.select(Query("b"))) == 0
    db.drop_namespace("b")
    with pytest.raises(NotFoundError):
        db.select(Query("b"))


def test_system_namespaces(db):
    res = db.select(Query("#namespaces"))
    assert res.docs()[0]["name"] == "items"
    res = db.select(Query("#memstats"))
    assert res.docs()[0]["items_count"] == 5
    db.select(Query("items"))
    res = db.select(Query("#perfstats"))
    assert res.docs()[0]["selects"]["total_queries_count"] >= 1
    res = db.select(Query("#config"))
    assert any(d["type"] == "profiling" for d in res.docs())


def test_merge_queries(db):
    db.open_namespace("others", [IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))])
    db.upsert("others", {"id": 100})
    q = Query("items").where("id", "=", 1).merge(Query("others"))
    res = db.select(q)
    assert sorted(d["id"] for d in res.docs()) == [1, 100]


def test_add_index_backfill(db):
    # adding an index over existing docs backfills it
    db.add_index("items", IndexDef("extra", "tree", "int"))
    assert ids(db.select(Query("items").where("extra", ">", 5))) == [1]


def test_drop_index(db):
    db.drop_index("items", "year")
    # falls back to non-indexed comparator
    assert ids(db.select(Query("items").where("year", ">", 2010))) == [3, 4, 5]


def test_dwithin_non_indexed(db):
    db.upsert("items", {"id": 7, "year": 1, "name": "p", "price": 0.0,
                        "genres": [], "pt": [1.0, 1.0]})
    q = Query("items").dwithin("pt", (0.0, 0.0), 2.0)
    assert ids(db.select(q)) == [7]


def test_rtree_index():
    db = Reindexer()
    db.open_namespace("geo", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("pt", "rtree", "point"),
    ])
    db.upsert("geo", {"id": 1, "pt": [0.0, 0.0]})
    db.upsert("geo", {"id": 2, "pt": [5.0, 5.0]})
    res = db.select(Query("geo").dwithin("pt", (0.5, 0.5), 1.0))
    assert [d["id"] for d in res.docs()] == [1]


def test_ttl_index():
    import time
    db = Reindexer()
    db.open_namespace("sessions", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("ts", "ttl", "int64", opts=IndexOpts(expire_after=10)),
    ])
    now = int(time.time())
    db.upsert("sessions", {"id": 1, "ts": now - 100})   # expired
    db.upsert("sessions", {"id": 2, "ts": now})          # fresh
    res = db.select(Query("sessions"))
    assert [d["id"] for d in res.docs()] == [2]


def test_composite_index():
    db = Reindexer()
    db.open_namespace("c", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("a", "-", "int"),
        IndexDef("b", "-", "string"),
        IndexDef("a+b", "hash", "composite", json_paths=("a", "b")),
    ])
    db.upsert("c", {"id": 1, "a": 1, "b": "x"})
    db.upsert("c", {"id": 2, "a": 1, "b": "y"})
    db.upsert("c", {"id": 3, "a": 2, "b": "x"})
    res = db.select(Query("c").where("a+b", "=", [(1, "x")]))
    assert [d["id"] for d in res.docs()] == [1]


def test_equal_position():
    """Conditions on array fields correlated by array index
    (reference: equalPositions)."""
    from reindexer_tpu import IndexDef, IndexOpts, Query, Reindexer
    db = Reindexer()
    db.open_namespace("ep", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("sizes", "hash", "int", opts=IndexOpts(is_array=True)),
        IndexDef("prices", "hash", "int", opts=IndexOpts(is_array=True)),
    ])
    db.upsert("ep", {"id": 1, "sizes": [10, 20], "prices": [100, 200]})
    db.upsert("ep", {"id": 2, "sizes": [20, 10], "prices": [100, 200]})
    q = (Query("ep").where("sizes", "=", 10).where("prices", "=", 100)
         .equal_position("sizes", "prices"))
    got = sorted(d["id"] for d in db.select(q).docs())
    # only doc 1 has size=10 and price=100 at the SAME position (index 0)
    assert got == [1]
    # without equal_position both match
    q2 = Query("ep").where("sizes", "=", 10).where("prices", "=", 100)
    assert sorted(d["id"] for d in db.select(q2).docs()) == [1, 2]
    # DSL round-trip keeps the group
    from reindexer_tpu.query.dsl import parse_dsl, to_dsl
    q3 = parse_dsl(to_dsl(q))
    assert sorted(d["id"] for d in db.select(q3).docs()) == [1]


def test_composite_substitution():
    """AND EQ conditions covering a composite index's sub-fields collapse
    into one composite lookup (reference: QueryPreprocessor substitution)."""
    from reindexer_tpu import IndexDef, IndexOpts, Query, Reindexer
    db = Reindexer()
    db.open_namespace("cs", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("a", "-", "int"),
        IndexDef("b", "-", "string"),
        IndexDef("a+b", "hash", "composite", json_paths=("a", "b")),
    ])
    for i, (a, b) in enumerate([(1, "x"), (1, "y"), (2, "x"), (2, "y")]):
        db.upsert("cs", {"id": i, "a": a, "b": b})
    res = db.select(Query("cs").where("a", "=", 2).where("b", "=", "y"))
    assert [d["id"] for d in res.docs()] == [3]
    # substitution keeps other conditions intact
    res2 = db.select(Query("cs").where("a", "=", 1).where("b", "=", "x")
                     .where("id", "<", 10))
    assert [d["id"] for d in res2.docs()] == [0]
    # explain shows the composite selector
    res3 = db.select(Query("cs").where("a", "=", 1).where("b", "=", "y")
                     .explain())
    assert any(s["field"] == "a+b" for s in res3.explain["selectors"])


def test_embedding_strategies():
    """Upsert-side auto-embedding strategies (reference: float_vector.md
    embedding config: always / empty_only / strict)."""
    from reindexer_tpu import (EmbeddingConfig, FloatVectorOpts, IndexDef,
                               IndexOpts, IndexType, ParamsError, Query,
                               Reindexer, VectorMetric)
    from reindexer_tpu.index.vector.params import KnnSearchParams
    import numpy as np

    def fake_embedder(texts):
        return [[float(len(t)), 0.0, 0.0, 0.0] for t in texts]

    for strategy in ("always", "empty_only", "strict"):
        db = Reindexer()
        db.register_embedder("tag1", fake_embedder)
        db.open_namespace("e", [
            IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
            IndexDef("vec", IndexType.VEC_BF, vector_opts=FloatVectorOpts(
                dims=4, metric=VectorMetric.L2,
                embedding=EmbeddingConfig(endpoint="http://x", fields=("t",),
                                          cache_tag="tag1",
                                          strategy=strategy))),
        ])
        db.upsert("e", {"id": 1, "t": "abc"})          # embedded: [3,0,0,0]
        if strategy == "strict":
            import pytest as _pt
            with _pt.raises(ParamsError):
                db.upsert("e", {"id": 2, "t": "x", "vec": [9, 0, 0, 0]})
        else:
            db.upsert("e", {"id": 2, "t": "hello", "vec": [9.0, 0, 0, 0]})
            res = db.select(Query("e").where_knn(
                "vec", np.asarray([9.0, 0, 0, 0], np.float32),
                KnnSearchParams(k=1)).select("*", "vectors()"))
            doc = res.docs()[0]
            if strategy == "always":
                assert doc["vec"] == [5.0, 0.0, 0.0, 0.0]   # re-embedded
            else:
                assert doc["vec"] == [9.0, 0, 0, 0]          # kept
        # query-side embedding from text
        res = db.select(Query("e").where_knn("vec", "abc",
                                             KnnSearchParams(k=1)))
        assert res.docs()[0]["id"] in (1, 2)


def test_uuid_index_semantics():
    """UUID field type: canonical case-insensitive matching + validation
    (reference: dedicated UUID index, core/keyvalue/uuid.cc ParseUuid)."""
    from reindexer_tpu.core.errors import ParamsError

    db = Reindexer()
    db.open_namespace("u", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("uid", "hash", "uuid"),
    ])
    db.upsert("u", {"id": 1, "uid": "A1B2C3D4-0000-1111-2222-333344445555"})
    db.upsert("u", {"id": 2,
                    "uid": "a1b2c3d4000011112222333344445556"})  # no dashes
    # case-insensitive + format-insensitive lookup
    res = db.select(Query("u").where(
        "uid", "=", "a1b2c3d4-0000-1111-2222-333344445555"))
    assert [d["id"] for d in res.docs()] == [1]
    res = db.select(Query("u").where(
        "uid", "=", "A1B2C3D4-0000-1111-2222-333344445556"))
    assert [d["id"] for d in res.docs()] == [2]
    # the document round-trips its original spelling; the INDEX matches
    # canonically (deviation from the reference, which rewrites the payload
    # value to the parsed UUID)
    doc = db.select(Query("u").where("id", "=", 2)).docs()[0]
    assert doc["uid"] == "a1b2c3d4000011112222333344445556"
    with pytest.raises(ParamsError):
        db.upsert("u", {"id": 3, "uid": "not-a-uuid"})


def test_join_vectorized_parity(rng):
    """The columnar EQ-join probe must agree with the get_item dict fallback
    across unset fields, string keys, multi-condition ON, deleted rows, and
    LEFT joins (the fallback is forced by monkeypatching the fast path)."""
    from reindexer_tpu import IndexDef, IndexOpts, Query, Reindexer
    import reindexer_tpu.query.executor as ex

    db = Reindexer()
    db.open_namespace("m")
    db.open_namespace("j")
    db.add_index("m", IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)))
    db.add_index("m", IndexDef("fk", "hash", "int"))
    db.add_index("m", IndexDef("color", "hash", "string"))
    db.add_index("j", IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)))
    db.add_index("j", IndexDef("key", "hash", "int"))
    db.add_index("j", IndexDef("color", "hash", "string"))
    colors = ["red", "green", "blue"]
    for i in range(300):
        doc = {"id": i, "color": colors[i % 3]}
        if i % 7 != 0:           # some rows leave fk unset
            doc["fk"] = int(rng.integers(0, 40))
        db.upsert("m", doc)
    for i in range(120):
        doc = {"id": i, "color": colors[i % 3]}
        if i % 5 != 0:
            doc["key"] = int(rng.integers(0, 40))
        db.upsert("j", doc)
    db.delete("m", {"id": 17})
    db.delete("j", {"id": 3})

    queries = [
        Query("m").inner_join(Query("j")).on("fk", "EQ", "key").query,
        Query("m").inner_join(Query("j")).on("fk", "EQ", "key")
                  .on("color", "EQ", "color").query,
        Query("m").left_join(Query("j")).on("color", "EQ", "color").query,
        Query("m").inner_join(Query("j").where("key", "LT", 20))
                  .on("fk", "EQ", "key").query,
    ]
    for q in queries:
        q.limit(10**9)
        fast = [it.row_id for it in db.select(q)]
        orig = ex.Selecter._join_eq_vectorized
        ex.Selecter._join_eq_vectorized = lambda *a, **k: None
        try:
            slow = [it.row_id for it in db.select(q)]
        finally:
            ex.Selecter._join_eq_vectorized = orig
        assert fast == slow


def test_join_conjunction_threading(rng):
    """Joins probe only the running AND-conjunction's candidates
    (executor.py _eval_entry cand_mask); result sets must be identical to
    the full-row oracle, and an OR join must NOT be narrowed by the
    preceding conjunction."""
    from reindexer_tpu import IndexDef, IndexOpts, Query, Reindexer

    n, m = 3000, 200
    db = Reindexer()
    db.open_namespace("items", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("year", "tree", "int"),
        IndexDef("fk", "hash", "int"),
    ])
    db.open_namespace("other", [
        IndexDef("oid", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("grp", "hash", "int"),
    ])
    years = rng.integers(2000, 2025, size=n)
    fks = rng.integers(0, 2 * m, size=n)      # half the fks have no match
    tx = db.new_transaction("items")
    for i in range(n):
        tx.upsert({"id": i, "year": int(years[i]), "fk": int(fks[i])})
    tx.commit()
    grps = rng.integers(0, 10, size=m)
    tx = db.new_transaction("other")
    for i in range(m):
        tx.upsert({"oid": i, "grp": int(grps[i])})
    tx.commit()
    joinable = {i for i in range(m) if grps[i] == 3}

    # filter THEN inner join: the join sees a narrowed conjunction
    res = db.select(Query("items").where("year", ">", 2015)
                    .inner_join(Query("other").where("grp", "=", 3))
                    .on("fk", "=", "oid"))
    got = sorted(d["id"] for d in res.docs())
    assert got == sorted(i for i in range(n)
                         if years[i] > 2015 and fks[i] in joinable)

    # join first: exists fallback, same oracle
    res = db.select(Query("items")
                    .inner_join(Query("other").where("grp", "=", 3))
                    .on("fk", "=", "oid"))
    got = sorted(d["id"] for d in res.docs())
    assert got == sorted(i for i in range(n) if fks[i] in joinable)

    # OR join: must see rows OUTSIDE the preceding conjunction
    res = db.select(Query("items").where("year", "=", 2001)
                    .op_or()
                    .or_inner_join(Query("other").where("grp", "=", 3))
                    .on("fk", "=", "oid"))
    got = sorted(d["id"] for d in res.docs())
    assert got == sorted(i for i in range(n)
                         if years[i] == 2001 or fks[i] in joinable)

    # deletes respected inside the conjunction
    victims = got[:5]
    for vid in victims:
        db.delete("items", {"id": vid})
    res = db.select(Query("items").where("year", ">", 2015)
                    .inner_join(Query("other").where("grp", "=", 3))
                    .on("fk", "=", "oid"))
    got = sorted(d["id"] for d in res.docs())
    assert got == sorted(i for i in range(n)
                         if years[i] > 2015 and fks[i] in joinable
                         and i not in set(victims))


def test_rtree_grid_parity(rng):
    """The grid-bucketed DWithin (large bases) must match the exact
    vectorized scan bit-for-bit, across mutations and re-queries."""
    from reindexer_tpu.core.payload import IndexDef as _ID
    from reindexer_tpu.core.type_consts import CondType
    from reindexer_tpu.index.rtree import RTreeIndex, _GRID_MIN

    idx = RTreeIndex(_ID("pt", "rtree", "point"))
    idx._tree = None        # force the Python grid backend under test
    n = _GRID_MIN * 2
    pts = rng.uniform(-50, 50, size=(n, 2))
    for i in range(n):
        idx.upsert(i, pts[i])
    idx.delete(5, None)
    idx.upsert(7, [200.0, 200.0])          # outlier stretches the extent
    pts[7] = [200.0, 200.0]
    for center, dist in ([0.0, 0.0], 5.0), ([40.0, -40.0], 12.0), \
                        ([200.0, 200.0], 1.0), ([500.0, 0.0], 3.0):
        center = np.asarray(center)
        got = np.sort(idx.select_key(CondType.DWITHIN, (center, dist)).ids)
        assert idx._grid is not None
        d2 = ((pts - center) ** 2).sum(1)
        want = np.flatnonzero((d2 <= dist ** 2) & (np.arange(n) != 5))
        assert np.array_equal(got, want), (center, dist)
    # mutation invalidates and rebuilds
    idx.upsert(5, pts[5])
    got = np.sort(idx.select_key(
        CondType.DWITHIN, (np.zeros(2), 5.0)).ids)
    d2 = (pts ** 2).sum(1)
    assert np.array_equal(got, np.flatnonzero(d2 <= 25.0))
