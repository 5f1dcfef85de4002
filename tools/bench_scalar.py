"""Scalar-query microbench vs the reference's headline CPU numbers.

The reference publishes (readme.md:126-128, 1 CPU core): point select
`WHERE id='?'` up to 500K qps; composite filter `year > 2010 AND name =
'str' AND id IN (...)` up to 50K qps; filter + join up to 20K qps. This
host is also 1 core, so the comparison is apples-to-apples hardware; the
language density difference (CPython host runtime vs C++) is the honest
deviation being measured.

Scalar paths never touch the device — force CPU so a wedged tunnel can't
hang the run.

Usage: python tools/bench_scalar.py [n=100000] [seconds=3]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from reindexer_tpu import IndexDef, IndexOpts, Query, Reindexer


def bench(fn, seconds):
    """qps over a fixed wall budget (one warm call first)."""
    fn(0)
    n = 0
    t0 = time.perf_counter()
    stop = t0 + seconds
    while time.perf_counter() < stop:
        fn(n)
        n += 1
    return n / (time.perf_counter() - t0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    rng = np.random.default_rng(0)
    db = Reindexer()
    db.open_namespace("items", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("year", "tree", "int"),
        IndexDef("name", "hash", "string"),
        IndexDef("fk", "hash", "int"),
    ])
    names = [f"name{i}" for i in range(1000)]
    years = rng.integers(2000, 2025, size=n)
    nix = rng.integers(0, len(names), size=n)
    t0 = time.perf_counter()
    tx = db.new_transaction("items")
    for i in range(n):
        tx.upsert({"id": i, "year": int(years[i]), "name": names[nix[i]],
                   "fk": i % 1000})
    tx.commit()
    db.open_namespace("other", [
        IndexDef("oid", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("grp", "hash", "int"),
    ])
    tx = db.new_transaction("other")
    for i in range(1000):
        tx.upsert({"oid": i, "grp": i % 10})
    tx.commit()
    print(f"# ingest {n}+1000 docs in {time.perf_counter()-t0:.1f}s",
          flush=True)

    ids = rng.integers(0, n, size=65536)

    # 1) point select by PK (reference: up to 500K qps / core)
    q_point = bench(lambda i: db.select(
        Query("items").where("id", "=", int(ids[i % len(ids)]))), seconds)

    # SQL surface of the same point select (parse + plan included)
    q_point_sql = bench(lambda i: db.select(
        f"SELECT * FROM items WHERE id = {int(ids[i % len(ids)])}"), seconds)

    # 2) composite filter (reference: up to 50K qps / core)
    in_sets = [[int(x) for x in rng.integers(0, n, size=10)]
               for _ in range(256)]
    q_comp = bench(lambda i: db.select(
        Query("items").where("year", ">", 2010)
        .where("name", "=", names[i % 100])
        .where("id", "in", in_sets[i % len(in_sets)])), seconds)

    # 3) filter + inner join (reference: up to 20K qps / core)
    q_join = bench(lambda i: db.select(
        Query("items").where("year", ">", 2015)
        .where("name", "=", names[i % 100])
        .inner_join(Query("other").where("grp", "=", i % 10))
        .on("fk", "=", "oid").limit(20)), seconds)

    print(f"# scalar n={n}: point={q_point:.0f} qps (sql {q_point_sql:.0f})"
          f" composite={q_comp:.0f} qps join={q_join:.0f} qps"
          f" | reference 1-core targets: 500K / 50K / 20K", flush=True)


if __name__ == "__main__":
    main()
