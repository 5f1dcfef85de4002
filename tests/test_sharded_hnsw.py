"""Distributed HNSW over the virtual mesh: sharded beams + collective merge
must match per-shard sequential searches."""
import numpy as np
import jax.numpy as jnp
import pytest

from reindexer_tpu import FloatVectorOpts, IndexDef, IndexType, VectorMetric
from reindexer_tpu.index.vector.hnsw import HnswIndex
from reindexer_tpu.parallel.mesh import make_mesh
from reindexer_tpu.parallel.sharded_hnsw import (build_sharded_hnsw,
                                                 shard_hnsw_state)


def test_sharded_hnsw_matches_sequential(rng):
    n_shards, per_shard, dims, k, ef = 4, 300, 16, 10, 32
    mesh = make_mesh(n_shards, axis_names=("shards",))
    base = rng.normal(size=(n_shards * per_shard, dims)).astype(np.float32)
    indexes = []
    for s in range(n_shards):
        ix = HnswIndex(IndexDef("v", IndexType.HNSW,
                                vector_opts=FloatVectorOpts(
                                    dims=dims, metric=VectorMetric.L2,
                                    m=8, ef_construction=48)))
        for i in range(per_shard):
            ix.upsert(i, base[s * per_shard + i])
        ix.commit()
        indexes.append(ix)

    cap = max(ix.keeper.capacity for ix in indexes)
    data, sq, links0, upper, entries, n_upper = shard_hnsw_state(
        mesh, indexes, cap)
    fn = build_sharded_hnsw(mesh, ef=ef, expand=2,
                            metric=VectorMetric.L2, n_upper=n_upper)

    queries = rng.normal(size=(8, dims)).astype(np.float32)
    scores, ids = fn(jnp.asarray(queries), data, sq, links0, upper, entries)
    scores, ids = np.asarray(scores), np.asarray(ids)

    # sequential oracle: search every shard, merge by score
    from reindexer_tpu.index.vector.params import HnswSearchParams
    for qi in range(len(queries)):
        merged = []
        for s, ix in enumerate(indexes):
            res = ix.select(queries[qi], HnswSearchParams(k=k, ef=ef))
            for rid, rank in zip(res.ids, res.ranks):
                merged.append((float(rank), s * cap + int(rid)))
        merged.sort()
        want = [i for _, i in merged[:k]]
        got = ids[qi][:k].tolist()
        # allow ANN-level tolerance: require strong overlap
        overlap = len(set(got) & set(want))
        assert overlap >= k - 2, (qi, got, want)

    # global ids map back to the right shard rows
    for qi in range(len(queries)):
        for g in ids[qi][:k]:
            s, local = divmod(int(g), cap)
            assert 0 <= s < n_shards and local < per_shard
            # result vector matches the original data row
            np.testing.assert_allclose(
                np.asarray(data[g]), base[s * per_shard + local], rtol=1e-6)


def test_sharded_hnsw_ip_uneven_shards(rng):
    """IP metric + shards of different sizes (pack pads to a common cap):
    the collective merge must agree with the per-shard sequential oracle
    and never emit ids from a shard's padding region."""
    sizes = [260, 180, 96, 24]
    n_shards, dims, k, ef = len(sizes), 16, 8, 32
    mesh = make_mesh(n_shards, axis_names=("shards",))
    offs = np.cumsum([0] + sizes)
    base = rng.normal(size=(offs[-1], dims)).astype(np.float32)
    indexes = []
    for s, sz in enumerate(sizes):
        ix = HnswIndex(IndexDef("v", IndexType.HNSW,
                                vector_opts=FloatVectorOpts(
                                    dims=dims, metric=VectorMetric.INNER_PRODUCT,
                                    m=8, ef_construction=48)))
        for i in range(sz):
            ix.upsert(i, base[offs[s] + i])
        ix.commit()
        indexes.append(ix)

    cap = max(ix.keeper.capacity for ix in indexes)
    data, sq, links0, upper, entries, n_upper = shard_hnsw_state(
        mesh, indexes, cap)
    fn = build_sharded_hnsw(mesh, ef=ef, expand=2,
                            metric=VectorMetric.INNER_PRODUCT,
                            n_upper=n_upper)
    queries = rng.normal(size=(6, dims)).astype(np.float32)
    scores, ids = fn(jnp.asarray(queries), data, sq, links0, upper, entries)
    scores, ids = np.asarray(scores), np.asarray(ids)

    from reindexer_tpu.index.vector.params import HnswSearchParams
    for qi in range(len(queries)):
        merged = []
        for s, ix in enumerate(indexes):
            res = ix.select(queries[qi], HnswSearchParams(k=k, ef=ef))
            for rid, rank in zip(res.ids, res.ranks):
                merged.append((-float(rank), s * cap + int(rid)))  # IP: desc
        merged.sort()
        want = [i for _, i in merged[:k]]
        got = ids[qi][:k].tolist()
        assert len(set(got) & set(want)) >= k - 2, (qi, got, want)
        for g in got:
            s, local = divmod(int(g), cap)
            assert local < sizes[s], "id from a shard's padding region"
        # scores sorted descending, finite over the valid prefix
        valid = scores[qi][ids[qi] >= 0]
        assert np.all(np.diff(valid) <= 1e-6)
