"""Sharding proxy tests (models reference test/sharding/ +
sharding_base_test.cc): key routing, pinned vs distributed selects, ranked
merge, distributed aggregations."""
import numpy as np
import pytest

from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts, IndexType,
                           Query, Reindexer, VectorMetric)
from reindexer_tpu.index.vector.params import KnnSearchParams
from reindexer_tpu.sharding import (NamespaceShardingConfig, ShardKeyRange,
                                    ShardSpec, ShardedReindexer)


@pytest.fixture
def cluster():
    shards = [Reindexer() for _ in range(3)]
    cfg = NamespaceShardingConfig(
        namespace="items", index="location",
        shards=(
            ShardSpec(0, values=("msk",)),
            ShardSpec(1, values=("spb",)),
            ShardSpec(2, ranges=(ShardKeyRange("a", "l"),)),
        ),
        default_shard=0)
    sr = ShardedReindexer(shards, [cfg])
    sr.open_namespace("items", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("location", "hash", "string"),
        IndexDef("score", "tree", "int"),
        IndexDef("vec", IndexType.VEC_BF, vector_opts=FloatVectorOpts(
            dims=4, metric=VectorMetric.L2)),
    ])
    for i in range(30):
        loc = ["msk", "spb", "kazan"][i % 3]
        sr.upsert("items", {"id": i, "location": loc, "score": i,
                            "vec": [float(i), 0, 0, 0]})
    return sr, shards


def test_key_routing(cluster):
    sr, shards = cluster
    # msk docs landed on shard 0, spb on 1, kazan (range a..l) on 2
    assert all(d["location"] == "msk"
               for d in shards[0].select(Query("items")).docs())
    assert all(d["location"] == "spb"
               for d in shards[1].select(Query("items")).docs())
    assert all(d["location"] == "kazan"
               for d in shards[2].select(Query("items")).docs())
    assert len(shards[0].select(Query("items"))) == 10


def test_pinned_select(cluster):
    sr, _ = cluster
    res = sr.select(Query("items").where("location", "=", "spb"))
    assert len(res) == 10
    assert all(d["location"] == "spb" for d in res.docs())


def test_distributed_select_sorted(cluster):
    sr, _ = cluster
    res = sr.select(Query("items").where("score", ">=", 10)
                    .sort("score", desc=True).limit(5))
    scores = [d["score"] for d in res.docs()]
    assert scores == [29, 28, 27, 26, 25]


def test_distributed_offset(cluster):
    sr, _ = cluster
    res = sr.select(Query("items").sort("score").offset(10).limit(5))
    assert [d["score"] for d in res.docs()] == [10, 11, 12, 13, 14]


def test_distributed_knn_merge(cluster):
    sr, _ = cluster
    res = sr.select(Query("items").where_knn(
        "vec", np.asarray([7.0, 0, 0, 0], np.float32),
        KnnSearchParams(k=3)))
    got = [d["id"] for d in res.docs()]
    assert got[0] == 7
    assert set(got) == {6, 7, 8}


def test_distributed_aggregations(cluster):
    sr, _ = cluster
    res = sr.select(Query("items").aggregate_sum("score"))
    assert res.aggregations[0].value == sum(range(30))
    res2 = sr.select(Query("items").aggregate_max("score"))
    assert res2.aggregations[0].value == 29
    res3 = sr.select(Query("items").distinct("location"))
    assert set(res3.aggregations[0].distincts) == {"msk", "spb", "kazan"}


def test_local_select(cluster):
    sr, _ = cluster
    res = sr.select(Query("items").local())
    assert len(res) == 10   # only this_shard (0)


def test_delete_query_distributed(cluster):
    sr, _ = cluster
    n = sr.delete_query(Query("items").where("score", "<", 3))
    assert n == 3
    assert len(sr.select(Query("items"))) == 27


def test_sql_through_proxy(cluster):
    sr, _ = cluster
    res = sr.select("SELECT * FROM items WHERE location = 'msk' ORDER BY id")
    assert len(res) == 10


def test_runtime_resharding(cluster):
    """apply_sharding_config control request (reference: sharding.md:17-60
    runtime resharding): rows migrate to their new owners, routing follows
    the new config, and selects stay correct throughout."""
    sr, shards = cluster
    new_cfg = NamespaceShardingConfig(
        namespace="items", index="location",
        shards=(
            ShardSpec(0, values=("spb",)),          # msk and spb SWAP
            ShardSpec(1, values=("msk",)),
            ShardSpec(2, ranges=(ShardKeyRange("a", "l"),)),
        ),
        default_shard=2)
    moved = sr.apply_sharding_config([new_cfg])
    assert moved == {"items": 20}     # 10 msk + 10 spb rows moved
    assert all(d["location"] == "spb"
               for d in shards[0].select(Query("items")).docs())
    assert all(d["location"] == "msk"
               for d in shards[1].select(Query("items")).docs())
    assert len(shards[1].select(Query("items"))) == 10
    # new writes route by the new config
    sr.upsert("items", {"id": 100, "location": "msk", "score": 1,
                        "vec": [0.0, 0, 0, 0]})
    assert 100 in [d["id"] for d in shards[1].select(Query("items")).docs()]
    # pinned + distributed selects see one consistent world
    res = sr.select(Query("items").where("location", "=", "msk"))
    assert len(res) == 11
    assert len(sr.select(Query("items"))) == 31


def test_resharding_validation(cluster):
    sr, _ = cluster
    from reindexer_tpu.core.errors import ParamsError
    with pytest.raises(ParamsError):
        sr.apply_sharding_config([NamespaceShardingConfig(
            namespace="items", index="location",
            shards=(ShardSpec(7, values=("x",)),))])
    with pytest.raises(ParamsError):
        sr.apply_sharding_config([NamespaceShardingConfig(
            namespace="items", index="location",
            shards=(ShardSpec(0, values=("x",)),
                    ShardSpec(1, values=("x",))))])
