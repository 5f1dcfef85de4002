"""Embedder result caches + embedding actions (reference:
float_vector.md:229-287 cache config, :762-784 create_embeddings,
:785-799 clear_embedders_cache)."""
import numpy as np
import pytest

from reindexer_tpu import (EmbeddingConfig, FloatVectorOpts, IndexDef,
                           IndexOpts, IndexType, Query, Reindexer,
                           VectorMetric)
from reindexer_tpu.index.vector.params import KnnSearchParams


class CountingEmbedder:
    def __init__(self):
        self.calls = 0

    def __call__(self, texts):
        self.calls += 1
        return [[float(len(t)), 1.0, 0.0, 0.0] for t in texts]


def make_db(emb, strategy="always"):
    db = Reindexer()
    db.register_embedder("tagA", emb)
    db.open_namespace("e", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("vec", IndexType.VEC_BF, vector_opts=FloatVectorOpts(
            dims=4, metric=VectorMetric.L2,
            embedding=EmbeddingConfig(endpoint="http://x", fields=("t",),
                                      cache_tag="tagA",
                                      strategy=strategy))),
    ])
    return db


def knn_text(db, text):
    return db.select(Query("e").where_knn("vec", text, KnnSearchParams(k=3)))


def test_cache_disabled_without_config():
    emb = CountingEmbedder()
    db = make_db(emb)
    db.upsert("e", {"id": 1, "t": "abc"})
    knn_text(db, "abc")
    knn_text(db, "abc")
    assert emb.calls == 3      # no #config embedders section => no caching


def test_cache_hit_to_cache_and_clear():
    emb = CountingEmbedder()
    db = make_db(emb)
    db.upsert("#config", {"type": "embedders", "embedders": {
        "caches": [{"cache_tag": "*", "max_cache_items": 100,
                    "hit_to_cache": 1}]}})
    db.upsert("e", {"id": 1, "t": "abc"})   # embeds + caches "abc"
    knn_text(db, "abc")                     # cache hit (same source text)
    knn_text(db, "abc")
    assert emb.calls == 1
    knn_text(db, "zz")
    knn_text(db, "zz")
    assert emb.calls == 2                   # second "zz" cached

    # clear_embedders_cache action drops the cache
    db.upsert("#config", {"type": "action", "action": {
        "command": "clear_embedders_cache", "cache_tag": "*"}})
    knn_text(db, "abc")
    assert emb.calls == 3


def test_cache_hit_to_cache_threshold():
    emb = CountingEmbedder()
    db = make_db(emb)
    db.upsert("#config", {"type": "embedders", "embedders": {
        "caches": [{"cache_tag": "tagA", "max_cache_items": 100,
                    "hit_to_cache": 2}]}})
    knn_text(db, "qq")     # 1st request: not cached yet
    knn_text(db, "qq")     # 2nd request: executes, then caches
    knn_text(db, "qq")     # 3rd: cache hit
    assert emb.calls == 2


def test_cache_specialization_beats_star():
    emb = CountingEmbedder()
    db = make_db(emb)
    db.upsert("#config", {"type": "embedders", "embedders": {
        "caches": [{"cache_tag": "*", "max_cache_items": 100,
                    "hit_to_cache": 1},
                   {"cache_tag": "tagA", "max_cache_items": 0}]}})
    knn_text(db, "abc")
    knn_text(db, "abc")
    # specialization max_cache_items=0 disables caching for tagA
    assert emb.calls == 2


def test_create_embeddings_action():
    emb = CountingEmbedder()
    db = make_db(emb, strategy="empty_only")
    # bypass the embedder on ingest: carry explicit vectors
    db.upsert("e", {"id": 1, "t": "abc", "vec": [9.0, 9, 9, 9]})
    assert emb.calls == 0
    ns = db.get_namespace("e")
    # a doc with an EMPTY vector slips in (e.g. pre-embedding data)
    ns.upsert({"id": 2, "t": "hello"})
    db.upsert("#config", {"type": "action", "action": {
        "command": "create_embeddings", "namespace": "*", "batch_size": 10}})
    res = db.select(Query("e").where_knn(
        "vec", np.asarray([5.0, 1, 0, 0], np.float32),
        KnnSearchParams(k=2)).select("*", "vectors()"))
    docs = {d["id"]: d["vec"] for d in res.docs()}
    assert docs[2] == [5.0, 1.0, 0.0, 0.0]   # embedded by the action
    assert docs[1] == [9.0, 9, 9, 9]         # empty_only kept the original
