"""Pallas fused scan correctness (interpret mode on CPU): must match the
XLA knn_scan / NumPy oracle exactly."""
import numpy as np
import jax.numpy as jnp
import pytest

from reindexer_tpu.core.type_consts import VectorMetric
from reindexer_tpu.ops.pallas_scan import TILE, knn_scan_fused


@pytest.mark.parametrize("metric", [VectorMetric.L2,
                                    VectorMetric.INNER_PRODUCT])
def test_fused_scan_matches_oracle(metric, rng):
    n, d, Q, k = 2 * TILE, 128, 8, 10
    base = rng.normal(size=(n, d)).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    valid[5] = False
    q = rng.normal(size=(Q, d)).astype(np.float32)
    sq = np.sum(base * base, axis=1).astype(np.float32)

    scores, ids = knn_scan_fused(
        jnp.asarray(q), jnp.asarray(base), jnp.asarray(valid),
        jnp.asarray(sq), k, metric, interpret=True)
    ids = np.asarray(ids)

    if metric == VectorMetric.L2:
        dm = ((q[:, None, :] - base[None, :, :]) ** 2).sum(-1)
        dm[:, ~valid] = np.inf
        want = np.argsort(dm, axis=1)[:, :k]
    else:
        sm = q @ base.T
        sm[:, ~valid] = -np.inf
        want = np.argsort(-sm, axis=1)[:, :k]
    for b in range(Q):
        assert set(ids[b].tolist()) == set(want[b].tolist())
        assert 5 not in ids[b]
