"""Pallas fused scan correctness (interpret mode on CPU): must match the
XLA knn_scan / NumPy oracle exactly, including the zeroed-invalid-rows
validity contract and the L2 score values."""
import numpy as np
import jax.numpy as jnp
import pytest

from reindexer_tpu.core.type_consts import VectorMetric
from reindexer_tpu.ops.pallas_scan import (SQ_EFF_BIG, TILE, knn_scan_fused,
                                           knn_scan_fused_single,
                                           knn_scan_fused_sq8)


def _sq_eff(base, valid, metric):
    sq = np.sum(base * base, axis=1).astype(np.float32)
    eff = sq if metric == VectorMetric.L2 else np.zeros_like(sq)
    return np.where(valid, eff, np.float32(SQ_EFF_BIG))


@pytest.mark.parametrize("metric", [VectorMetric.L2,
                                    VectorMetric.INNER_PRODUCT])
def test_fused_scan_matches_oracle(metric, rng):
    n, d, Q, k = 2 * TILE, 128, 8, 10
    base = rng.normal(size=(n, d)).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    valid[5] = False
    base[5] = 0.0                       # contract: invalid rows are zeroed
    q = rng.normal(size=(Q, d)).astype(np.float32)

    scores, ids = knn_scan_fused(
        jnp.asarray(q), jnp.asarray(base),
        jnp.asarray(_sq_eff(base, valid, metric)), k, metric, interpret=True)
    ids = np.asarray(ids)
    scores = np.asarray(scores)

    if metric == VectorMetric.L2:
        dm = ((q[:, None, :] - base[None, :, :]) ** 2).sum(-1)
        dm[:, ~valid] = np.inf
        want = np.argsort(dm, axis=1)[:, :k]
        want_scores = -np.take_along_axis(dm, ids, axis=1)
    else:
        sm = q @ base.T
        sm[:, ~valid] = -np.inf
        want = np.argsort(-sm, axis=1)[:, :k]
        want_scores = np.take_along_axis(sm, ids, axis=1)
    for b in range(Q):
        assert set(ids[b].tolist()) == set(want[b].tolist())
        assert 5 not in ids[b]
    assert np.allclose(scores, want_scores, rtol=1e-4, atol=1e-3)


def test_fused_scan_fewer_valid_than_k(rng):
    n, d, Q, k = 2 * TILE, 128, 4, 64
    base = np.zeros((n, d), dtype=np.float32)
    valid = np.zeros(n, dtype=bool)
    base[:7] = rng.normal(size=(7, d)).astype(np.float32)
    valid[:7] = True
    q = rng.normal(size=(Q, d)).astype(np.float32)
    scores, ids = knn_scan_fused(
        jnp.asarray(q), jnp.asarray(base),
        jnp.asarray(_sq_eff(base, valid, VectorMetric.L2)),
        k, VectorMetric.L2, interpret=True)
    ids = np.asarray(ids)
    for b in range(Q):
        got = [i for i in ids[b].tolist() if i >= 0]
        assert sorted(got) == list(range(7))
        assert (ids[b][7:] == -1).all()


def test_fused_matches_brute_force_index_path(rng):
    """End-to-end parity: the BruteForceIndex result is identical whether
    the fused path applies or not (CPU runs the XLA path — this pins the
    keeper's zero-on-remove contract via the interpret-mode kernel)."""
    from reindexer_tpu.core.type_consts import VectorMetric as VM
    from reindexer_tpu.index.vector.keeper import VectorKeeper

    kp = VectorKeeper(128, VM.L2, start_size=TILE, zero_on_remove=True)
    vecs = rng.normal(size=(300, 128)).astype(np.float32)
    for i in range(300):
        kp.set(i, vecs[i])
    kp.flush()
    kp.remove(17)
    kp.remove(42)
    kp.flush()
    data = np.asarray(kp.data)
    assert (data[17] == 0).all() and (data[42] == 0).all()
    eff = np.asarray(kp.sq_eff())
    assert eff[17] >= SQ_EFF_BIG / 2 and eff[42] >= SQ_EFF_BIG / 2
    q = rng.normal(size=(2, 128)).astype(np.float32)
    scores, ids = knn_scan_fused(
        jnp.asarray(q), kp.data, kp.sq_eff(), 10, VM.L2, interpret=True)
    ids = np.asarray(ids)
    dm = ((q[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
    dm[:, [17, 42]] = np.inf
    want = np.argsort(dm, axis=1)[:, :10]
    for b in range(2):
        assert set(ids[b].tolist()) == set(want[b].tolist())


@pytest.mark.parametrize("metric", [VectorMetric.L2,
                                    VectorMetric.INNER_PRODUCT])
def test_fused_single_matches_oracle(metric, rng):
    """Single-orientation variant: same contract, validity via sq_eff only
    (invalid rows need NOT be zeroed)."""
    n, d, Q, k = 2 * TILE, 128, 8, 10
    base = rng.normal(size=(n, d)).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    valid[5] = False                     # data NOT zeroed — sq_eff carries it
    q = rng.normal(size=(Q, d)).astype(np.float32)

    scores, ids = knn_scan_fused_single(
        jnp.asarray(q), jnp.asarray(base),
        jnp.asarray(_sq_eff(base, valid, metric)), k, metric, interpret=True)
    ids = np.asarray(ids)
    scores = np.asarray(scores)

    if metric == VectorMetric.L2:
        dm = ((q[:, None, :] - base[None, :, :]) ** 2).sum(-1)
        dm[:, ~valid] = np.inf
        want = np.argsort(dm, axis=1)[:, :k]
        want_scores = -np.take_along_axis(dm, ids, axis=1)
    else:
        sm = q @ base.T
        sm[:, ~valid] = -np.inf
        want = np.argsort(-sm, axis=1)[:, :k]
        want_scores = np.take_along_axis(sm, ids, axis=1)
    for b in range(Q):
        assert set(ids[b].tolist()) == set(want[b].tolist())
        assert 5 not in ids[b]
    assert np.allclose(scores, want_scores, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("metric", [VectorMetric.L2,
                                    VectorMetric.INNER_PRODUCT])
def test_fused_sq8_matches_quantized_oracle(metric, rng):
    """SQ8 fused kernel returns the same quantized scores/ids as a float64
    NumPy reconstruction of the affine-code scan."""
    n, d, Q, k = 2 * TILE, 128, 8, 10
    base = rng.normal(size=(n, d)).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    valid[7] = False
    q = rng.normal(size=(Q, d)).astype(np.float32)
    lo = np.quantile(base, 0.001, axis=0).astype(np.float32)
    hi = np.quantile(base, 0.999, axis=0).astype(np.float32)
    alpha = np.maximum((hi - lo) / 255.0, 1e-12).astype(np.float32)
    codes = np.clip(np.round((np.clip(base, lo, hi + alpha) - lo) / alpha),
                    0, 255).astype(np.uint8)
    sq = np.sum(base * base, axis=1).astype(np.float32)
    sqe = np.where(valid,
                   sq if metric == VectorMetric.L2 else np.zeros_like(sq),
                   np.float32(SQ_EFF_BIG))

    scores, ids = knn_scan_fused_sq8(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(lo),
        jnp.asarray(alpha), jnp.asarray(sqe), k, metric, interpret=True)
    ids = np.asarray(ids)
    scores = np.asarray(scores)

    # float64 oracle of the quantized score
    dots = (q.astype(np.float64) * alpha) @ codes.T.astype(np.float64) \
        + (q.astype(np.float64) @ lo.astype(np.float64))[:, None]
    if metric == VectorMetric.L2:
        sm = 2.0 * dots - sq - np.sum(
            q.astype(np.float64) ** 2, axis=1, keepdims=True)
    else:
        sm = dots
    sm[:, ~valid] = -np.inf
    want = np.argsort(-sm, axis=1)[:, :k]
    want_scores = np.take_along_axis(sm, ids, axis=1)
    for b in range(Q):
        assert set(ids[b].tolist()) == set(want[b].tolist())
        assert 7 not in ids[b]
    assert np.allclose(scores, want_scores, rtol=1e-4, atol=1e-2)


def test_zero_vector_nudge(rng):
    """A legitimate all-zero vector stays searchable under the fused-scan
    contract (the keeper nudges it off exact zero)."""
    from reindexer_tpu.core.type_consts import VectorMetric as VM
    from reindexer_tpu.index.vector.keeper import VectorKeeper

    kp = VectorKeeper(128, VM.L2, start_size=TILE, zero_on_remove=True)
    kp.set(0, np.zeros(128, dtype=np.float32))
    kp.set(1, np.ones(128, dtype=np.float32))
    kp.flush()
    q = np.zeros((1, 128), dtype=np.float32)
    scores, ids = knn_scan_fused(
        jnp.asarray(q), kp.data, kp.sq_eff(), 2, VM.L2, interpret=True)
    ids = np.asarray(ids)[0].tolist()
    assert ids[0] == 0 and ids[1] == 1
