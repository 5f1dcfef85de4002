"""Multi-device sharded KNN vs the single-device oracle (8 virtual CPU devices)."""
import jax
import numpy as np
import pytest

from reindexer_tpu.core.type_consts import VectorMetric
from reindexer_tpu.parallel.mesh import make_mesh, pad_rows_to_multiple, replicate, shard_rows
from reindexer_tpu.parallel.sharded_knn import build_sharded_knn


@pytest.mark.parametrize("metric", [VectorMetric.L2, VectorMetric.INNER_PRODUCT])
def test_sharded_knn_matches_oracle(metric, rng):
    n_dev = len(jax.devices())
    assert n_dev == 8
    mesh = make_mesh(axis_names=("shards",))
    n, d, q_n, k = 1000, 32, 4, 10
    base = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(q_n, d)).astype(np.float32)

    base_p = pad_rows_to_multiple(base, n_dev * 8)
    valid = np.zeros(base_p.shape[0], dtype=bool)
    valid[:n] = True
    sq = np.sum(base_p * base_p, axis=1).astype(np.float32)

    fn = build_sharded_knn(mesh, k=k, metric=metric)
    scores, ids = fn(replicate(mesh, queries),
                     shard_rows(mesh, base_p),
                     shard_rows(mesh, valid),
                     shard_rows(mesh, sq))
    scores, ids = np.asarray(scores), np.asarray(ids)

    # oracle
    if metric == VectorMetric.L2:
        dmat = ((queries[:, None, :] - base[None, :, :]) ** 2).sum(-1)
        oracle = np.argsort(dmat, axis=1)[:, :k]
    else:
        dmat = queries @ base.T
        oracle = np.argsort(-dmat, axis=1)[:, :k]
    for qi in range(q_n):
        assert set(ids[qi].tolist()) == set(oracle[qi].tolist())


def test_sharded_knn_2d_mesh(rng):
    mesh = make_mesh(axis_names=("shards", "batch"), shape=(4, 2))
    n, d, k = 512, 16, 5
    base = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(8, d)).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    sq = np.sum(base * base, axis=1).astype(np.float32)
    fn = build_sharded_knn(mesh, k=k, metric=VectorMetric.L2,
                           batch_axis="batch")
    from jax.sharding import NamedSharding, PartitionSpec as P
    scores, ids = fn(jax.device_put(queries, NamedSharding(mesh, P("batch", None))),
                     shard_rows(mesh, base),
                     shard_rows(mesh, valid),
                     shard_rows(mesh, sq))
    ids = np.asarray(ids)
    dmat = ((queries[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    oracle = np.argsort(dmat, axis=1)[:, :k]
    for qi in range(8):
        assert set(ids[qi].tolist()) == set(oracle[qi].tolist())
