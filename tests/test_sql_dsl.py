"""SQL + JSON-DSL parser tests (models reference sqlparser/dslparser suites;
behavior verified through end-to-end selects on a populated namespace)."""
import numpy as np
import pytest

from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts, IndexType,
                           Query, Reindexer, VectorMetric)
from reindexer_tpu.query.dsl import parse_dsl, to_dsl
from reindexer_tpu.query.sql import parse_sql


@pytest.fixture
def db(rng):
    d = Reindexer()
    d.open_namespace("items", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("year", "tree", "int"),
        IndexDef("name", "hash", "string"),
        IndexDef("vec", IndexType.VEC_BF, vector_opts=FloatVectorOpts(
            dims=4, metric=VectorMetric.L2)),
    ])
    for i in range(20):
        d.upsert("items", {"id": i, "year": 2000 + i,
                           "name": f"n{i % 3}",
                           "vec": [float(i), 0.0, 0.0, 0.0]})
    d.open_namespace("other", [
        IndexDef("oid", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("ref", "hash", "int"),
    ])
    for i in range(5):
        d.upsert("other", {"oid": i, "ref": i * 2})
    return d


def ids(res):
    return [d["id"] for d in res.docs()]


def test_sql_select_basic(db):
    res = db.select("SELECT * FROM items WHERE year > 2015 ORDER BY id LIMIT 3")
    assert ids(res) == [16, 17, 18]


def test_sql_in_and_or(db):
    res = db.select(
        "SELECT * FROM items WHERE id IN (1, 2, 3) OR year = 2010")
    assert sorted(ids(res)) == [1, 2, 3, 10]


def test_sql_brackets_not(db):
    res = db.select(
        "SELECT * FROM items WHERE year >= 2000 AND NOT (id IN (0,1,2,3,4,"
        "5,6,7,8,9,10,11,12,13,14))")
    assert sorted(ids(res)) == [15, 16, 17, 18, 19]


def test_sql_range_like(db):
    res = db.select("SELECT * FROM items WHERE id RANGE(2, 4)")
    assert sorted(ids(res)) == [2, 3, 4]
    res2 = db.select("SELECT * FROM items WHERE name LIKE 'n1%'")
    assert all(d["name"].startswith("n1") for d in res2.docs())


def test_sql_aggregations(db):
    res = db.select("SELECT COUNT(*) FROM items WHERE year < 2005")
    assert res.aggregations[0].value == 5
    res2 = db.select("SELECT SUM(id), MAX(id) FROM items")
    assert res2.aggregations[0].value == sum(range(20))
    assert res2.aggregations[1].value == 19


def test_sql_knn(db):
    res = db.select(
        "SELECT * FROM items WHERE KNN(vec, [5.0, 0.0, 0.0, 0.0], k=3)")
    assert ids(res)[0] == 5
    assert len(res) == 3


def test_sql_order_by_expr(db):
    res = db.select(
        "SELECT * FROM items WHERE id IN (1,2,3) ORDER BY 'id * -1'")
    assert ids(res) == [3, 2, 1]


def test_sql_update_delete(db):
    db.select("UPDATE items SET name = 'zz' WHERE id = 3")
    res = db.select("SELECT * FROM items WHERE name = 'zz'")
    assert ids(res) == [3]
    db.select("DELETE FROM items WHERE id = 3")
    assert len(db.select("SELECT * FROM items WHERE id = 3")) == 0


def test_sql_truncate(db):
    db.select("TRUNCATE other")
    assert len(db.select(Query("other"))) == 0


def test_sql_join(db):
    res = db.select(
        "SELECT * FROM items INNER JOIN other ON items.id = other.ref "
        "ORDER BY id")
    # other.ref = 0,2,4,6,8 -> items with those ids
    assert ids(res) == [0, 2, 4, 6, 8]


def test_sql_explain(db):
    res = db.select("EXPLAIN SELECT * FROM items WHERE id = 1")
    assert res.explain is not None
    assert res.explain["matched"] == 1


def test_dsl_roundtrip(db):
    q = (Query("items").where("year", ">", 2010)
         .op_or().where("id", "in", [1, 2])
         .sort("id", desc=True).limit(5).offset(1)
         .aggregate_sum("id"))
    d = to_dsl(q)
    q2 = parse_dsl(d)
    r1 = db.select(q)
    r2 = db.select(q2)
    assert ids(r1) == ids(r2)
    assert r1.aggregations[0].value == r2.aggregations[0].value


def test_dsl_knn_and_bracket(db):
    d = {
        "namespace": "items",
        "filters": [
            {"op": "AND", "filters": [
                {"field": "year", "cond": "ge", "value": 2000},
                {"op": "NOT", "field": "id", "cond": "set", "value": [0, 1]},
            ]},
            {"field": "vec", "cond": "knn", "value": [3.0, 0, 0, 0],
             "params": {"k": 5}},
        ],
        "limit": 5,
    }
    res = db.select(parse_dsl(d))
    got = ids(res)
    assert 0 not in got and 1 not in got
    assert got[0] == 3


def test_dsl_join(db):
    d = {
        "namespace": "items",
        "filters": [
            {"join_query": {
                "type": "inner", "namespace": "other",
                "filters": [{"field": "oid", "cond": "lt", "value": 3}],
                "on": [{"left_field": "id", "cond": "eq",
                        "right_field": "ref"}],
            }},
        ],
    }
    res = db.select(parse_dsl(d))
    assert sorted(ids(res)) == [0, 2, 4]


def test_sql_suggest(db):
    from reindexer_tpu.query.suggest import suggest
    assert "items" in suggest(db, "SELECT * FROM it")
    got = suggest(db, "SELECT * FROM items WHERE ye")
    assert "year" in got
    assert "SELECT" in suggest(db, "SEL")


def test_config_actions(db):
    # rebuild_ivf_index action routes to the index (reference action command)
    from reindexer_tpu import FloatVectorOpts, IndexDef, IndexType, VectorMetric
    db.open_namespace("cfgv", [
        IndexDef("id", "hash", "int",
                 opts=__import__("reindexer_tpu").IndexOpts(is_pk=True)),
        IndexDef("v", IndexType.IVF, vector_opts=FloatVectorOpts(
            dims=4, metric=VectorMetric.L2, centroids_count=2)),
    ])
    for i in range(10):
        db.upsert("cfgv", {"id": i, "v": [float(i), 0, 0, 0]})
    db.upsert("#config", {"type": "action", "action": {
        "command": "rebuild_ivf_index", "namespace": "cfgv", "index": "v"}})
    ix = db.get_namespace("cfgv").get_index("v")
    assert ix.centroids is not None
