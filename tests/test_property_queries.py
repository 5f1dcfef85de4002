"""Property-style random query verification.

Models the reference's randomized query suites (Go test/queries_test.go +
C++ fixtures/queries_verifier.h): generate random documents and random
queries, execute through the engine, and re-verify every result against a
naive pure-Python model evaluated over the raw documents.
"""
import numpy as np
import pytest

from reindexer_tpu import (IndexDef, IndexOpts, Query, Reindexer)
from reindexer_tpu.core.type_consts import CondType, OpType

N_DOCS = 300
N_QUERIES = 60

FIELDS = {
    "age": lambda r: int(r.integers(0, 50)),
    "score": lambda r: float(np.round(r.normal(50, 20), 2)),
    "color": lambda r: str(r.choice(["red", "green", "blue", "black"])),
    "tags": lambda r: [int(x) for x in
                       r.choice(20, size=r.integers(0, 4), replace=False)],
    "flag": lambda r: bool(r.integers(0, 2)),
}


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(1234)
    db = Reindexer()
    db.open_namespace("p", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("age", "tree", "int"),
        IndexDef("score", "tree", "double"),
        IndexDef("color", "hash", "string"),
        IndexDef("tags", "hash", "int", opts=IndexOpts(is_array=True)),
        # flag + extra intentionally NOT indexed (comparator fallback path)
    ])
    docs = []
    for i in range(N_DOCS):
        doc = {"id": i}
        for f, gen in FIELDS.items():
            if rng.random() < 0.9:
                doc[f] = gen(rng)
        docs.append(doc)
        db.upsert("p", doc)
    return db, docs, rng


def _matches(doc, field, cond, values):
    v = doc.get(field)
    if cond == CondType.ANY:
        return v is not None and v != []
    if cond == CondType.EMPTY:
        return v is None or v == []
    if v is None:
        return False
    vals = v if isinstance(v, list) else [v]
    if not vals:
        return False
    if cond == CondType.EQ:
        return any(x == values[0] for x in vals)
    if cond == CondType.SET:
        return any(x in values for x in vals)
    if cond == CondType.ALLSET:
        return all(any(x == t for x in vals) for t in values)
    if cond == CondType.LT:
        return any(x < values[0] for x in vals)
    if cond == CondType.LE:
        return any(x <= values[0] for x in vals)
    if cond == CondType.GT:
        return any(x > values[0] for x in vals)
    if cond == CondType.GE:
        return any(x >= values[0] for x in vals)
    if cond == CondType.RANGE:
        return any(values[0] <= x <= values[1] for x in vals)
    raise AssertionError(cond)


def _random_entry(rng):
    field = str(rng.choice(["age", "score", "color", "tags", "flag"]))
    if field == "color":
        cond = CondType(rng.choice([CondType.EQ, CondType.SET]))
        vals = [str(c) for c in rng.choice(
            ["red", "green", "blue", "black", "white"],
            size=(1 if cond == CondType.EQ else int(rng.integers(1, 4))),
            replace=False)]
    elif field == "flag":
        cond = CondType.EQ
        vals = [bool(rng.integers(0, 2))]
    elif field == "tags":
        cond = CondType(rng.choice([CondType.SET, CondType.ANY,
                                    CondType.EMPTY, CondType.ALLSET]))
        vals = [] if cond in (CondType.ANY, CondType.EMPTY) else \
            [int(x) for x in rng.choice(20, size=int(rng.integers(1, 3)),
                                        replace=False)]
    else:
        cond = CondType(rng.choice([CondType.EQ, CondType.LT, CondType.LE,
                                    CondType.GT, CondType.GE,
                                    CondType.RANGE]))
        lo = int(rng.integers(0, 50)) if field == "age" else \
            float(np.round(rng.normal(50, 20), 2))
        if cond == CondType.RANGE:
            hi = lo + (int(rng.integers(0, 20)) if field == "age"
                       else abs(float(np.round(rng.normal(0, 20), 2))))
            vals = [lo, hi]
        else:
            vals = [lo]
    return field, cond, vals


def test_random_queries_match_model(world):
    db, docs, rng = world
    for qi in range(N_QUERIES):
        n_conds = int(rng.integers(1, 4))
        q = Query("p")
        model = [(OpType.AND, None)]
        entries = []
        for ci in range(n_conds):
            op = OpType.AND if ci == 0 else OpType(
                rng.choice([OpType.AND, OpType.OR, OpType.NOT]))
            field, cond, vals = _random_entry(rng)
            if op == OpType.OR:
                q.op_or()
            elif op == OpType.NOT:
                q.op_not()
            q.where(field, cond, vals)
            entries.append((op, field, cond, vals))

        # model evaluation (same left-fold semantics as the entries tree)
        want = set()
        for doc in docs:
            verdict = None
            for op, field, cond, vals in entries:
                m = _matches(doc, field, cond, vals)
                if verdict is None:
                    verdict = (not m) if op == OpType.NOT else m
                elif op == OpType.AND:
                    verdict = verdict and m
                elif op == OpType.OR:
                    verdict = verdict or m
                else:
                    verdict = verdict and not m
            if verdict:
                want.add(doc["id"])

        got = {d["id"] for d in db.select(q).docs()}
        assert got == want, (
            f"query {qi} mismatch: entries={entries} "
            f"extra={got - want} missing={want - got}")


def test_random_sort_limit_offset(world):
    db, docs, rng = world
    for _ in range(20):
        field = str(rng.choice(["age", "score", "id"]))
        desc = bool(rng.integers(0, 2))
        off = int(rng.integers(0, 10))
        lim = int(rng.integers(1, 20))
        res = db.select(Query("p").where("age", ">=", 0)
                        .sort(field, desc).offset(off).limit(lim))
        got = [d["id"] for d in res.docs()]
        subset = [d for d in docs if d.get("age") is not None]
        default = float("-inf")
        keyed = sorted(
            subset, key=lambda d: (d.get(field) if d.get(field) is not None
                                   else default),
            reverse=desc)
        want_vals = [d.get(field) for d in keyed][off:off + lim]
        got_vals = [next(d.get(field) for d in docs if d["id"] == g)
                    for g in got]
        assert got_vals == want_vals, (field, desc, off, lim)


def test_random_aggregations(world):
    db, docs, rng = world
    for _ in range(10):
        field, cond, vals = _random_entry(rng)
        q = Query("p").where(field, cond, vals) \
            .aggregate_sum("age").aggregate_min("score").aggregate_max("age")
        res = db.select(q)
        match = [d for d in docs if _matches(d, field, cond, vals)]
        ages = [d["age"] for d in match if d.get("age") is not None]
        scores = [d["score"] for d in match if d.get("score") is not None]
        assert res.aggregations[0].value == pytest.approx(sum(ages))
        if scores:
            assert res.aggregations[1].value == pytest.approx(min(scores))
        if ages:
            assert res.aggregations[2].value == pytest.approx(max(ages))
