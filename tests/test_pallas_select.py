"""v2 fused-selection scan correctness (interpret mode on CPU): exact vs
NumPy oracles, including the SQ8-thresholded exact path, validity contract,
few-valid edge cases, and the overflow flag."""
import numpy as np
import jax.numpy as jnp
import pytest

from reindexer_tpu.core.type_consts import VectorMetric
from reindexer_tpu.ops.pallas_scan import SQ_EFF_BIG
from reindexer_tpu.ops.pallas_select import (TILE, knn_scan_fused_v2,
                                             knn_scan_sq8_v2, v2_available)


@pytest.mark.parametrize("metric", [VectorMetric.L2,
                                    VectorMetric.INNER_PRODUCT])
def test_v2_matches_oracle(metric, rng):
    n, d, Q, k = 2 * TILE, 128, 8, 10
    base = rng.normal(size=(n, d)).astype(np.float32)
    base[5] = 0.0                       # zeroed-invalid contract
    q = rng.normal(size=(Q, d)).astype(np.float32)
    scores, ids, flag = knn_scan_fused_v2(
        jnp.asarray(q), jnp.asarray(base), k, metric, interpret=True)
    ids, scores = np.asarray(ids), np.asarray(scores)
    assert float(flag) <= 0.0
    if metric == VectorMetric.L2:
        dm = ((q[:, None, :] - base[None, :, :]) ** 2).sum(-1)
        dm[:, 5] = np.inf
        want = np.argsort(dm, axis=1)[:, :k]
        want_scores = -np.take_along_axis(dm, ids, axis=1)
    else:
        sm = q @ base.T
        sm[:, 5] = -np.inf
        want = np.argsort(-sm, axis=1)[:, :k]
        want_scores = np.take_along_axis(sm, ids, axis=1)
    for b in range(Q):
        assert set(ids[b].tolist()) == set(want[b].tolist())
        assert 5 not in ids[b]
    assert np.allclose(scores, want_scores, rtol=1e-4, atol=1e-3)


def test_v2_fewer_valid_than_k(rng):
    n, d, Q, k = 2 * TILE, 128, 4, 64
    base = np.zeros((n, d), dtype=np.float32)
    base[:7] = rng.normal(size=(7, d)).astype(np.float32)
    q = rng.normal(size=(Q, d)).astype(np.float32)
    scores, ids, flag = knn_scan_fused_v2(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True)
    ids = np.asarray(ids)
    for b in range(Q):
        got = [i for i in ids[b].tolist() if i >= 0]
        assert sorted(got) == list(range(7))
        assert (ids[b][7:] == -1).all()


@pytest.mark.parametrize("metric", [VectorMetric.L2,
                                    VectorMetric.INNER_PRODUCT])
def test_v2_sq8_exact(metric, rng):
    """The SQ8-thresholded path returns the EXACT fp32 top-k (the certified
    eps bound keeps the quantized block threshold a superset). Clustered
    base: the bound is certified but conservative — when block-maxima
    spreads are small relative to eps (pure isotropic noise), the kernel
    flags capacity overflow instead of silently truncating (see
    test_v2_overflow_flag_on_mass_ties for the flag path)."""
    n, d, Q, k = 2 * TILE, 128, 8, 10
    # BLOCK-COHERENT clusters (rows of one 64-block share a center, like an
    # IVF/graph-locality layout): block maxima spread across blocks far
    # exceeds the certified quantization eps, so the kept set fits the slot
    # capacity. Isotropic noise does NOT have that property — the kernel
    # then flags and production falls back to the exact fp32 scan.
    n_blocks = n // 64
    centers = rng.normal(size=(n_blocks, d)).astype(np.float32) * 10.0
    base = (np.repeat(centers, 64, axis=0)
            + 0.3 * rng.normal(size=(n, d))).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    valid[7] = False
    base[7] = 0.0
    q = (centers[rng.integers(0, n_blocks, size=Q)]
         + 0.3 * rng.normal(size=(Q, d))).astype(np.float32)
    lo = np.quantile(base[valid], 0.001, axis=0).astype(np.float32)
    hi = np.quantile(base[valid], 0.999, axis=0).astype(np.float32)
    alpha = np.maximum((hi - lo) / 255.0, 1e-12).astype(np.float32)
    codes = np.clip(np.round((np.clip(base, lo, hi) - lo) / alpha),
                    0, 255).astype(np.uint8)
    deq = lo + alpha * codes
    err = np.abs(base[valid] - deq[valid]).max(axis=0).astype(np.float32)
    sq = (base * base).sum(1).astype(np.float32)
    sqe = np.where(valid, sq if metric == VectorMetric.L2 else 0.0,
                   np.float32(SQ_EFF_BIG)).astype(np.float32)
    scores, ids, flag = knn_scan_sq8_v2(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(lo),
        jnp.asarray(alpha), jnp.asarray(err), jnp.asarray(sqe),
        jnp.asarray(base), k, metric, interpret=True)
    ids, scores = np.asarray(ids), np.asarray(scores)
    assert float(flag) <= 0.0
    if metric == VectorMetric.L2:
        dm = ((q[:, None, :] - base[None, :, :]) ** 2).sum(-1)
        dm[:, 7] = np.inf
        want = np.argsort(dm, axis=1)[:, :k]
        want_scores = -np.take_along_axis(dm, ids, axis=1)
    else:
        sm = q @ base.T
        sm[:, 7] = -np.inf
        want = np.argsort(-sm, axis=1)[:, :k]
        want_scores = np.take_along_axis(sm, ids, axis=1)
    # the kernel is exact w.r.t. its own f32 dot-form scores (2 q.b -
    # |b|^2); at this clustered geometry those carry f32 accumulation
    # error ~eps*|2 q.b| ~ 1e4*1e-7 that can legitimately swap rows whose
    # TRUE gap is smaller (any f32 dot-form engine — faiss included —
    # deviates from an f64 diff-form oracle there), so boundary rows
    # within the formulation resolution of the kth score are accepted
    scale = float(np.abs(q @ base.T).max())
    tol = 64.0 * np.finfo(np.float32).eps * scale
    ref = dm if metric == VectorMetric.L2 else -sm
    for b in range(Q):
        got, exp = set(ids[b].tolist()), set(want[b].tolist())
        kth = ref[b, want[b][-1]]
        for r in got.symmetric_difference(exp):
            assert abs(ref[b, r] - kth) <= tol, (b, r, ref[b, r], kth)
    # scores carry bf16x3 error RELATIVE TO THE INTERMEDIATES (|2 q.b| ~
    # 1e4 for this clustered data), so the absolute tolerance scales with
    # the dot magnitude, not the final distance
    assert np.allclose(scores, want_scores, atol=8e-6 * scale)


def test_v2_sq8_fast_eps_isotropic(rng):
    """Isotropic noise overflows the CERTIFIED eps margin (the engine's
    ladder then sticks to the 12-sigma fast bound); the fast mode must run
    flag-clean there and still return the exact fp32 top-k (candidates are
    scored exactly in sweep B; only the kept-set guarantee is
    probabilistic — at 12 sigma a miss needs an astronomically small tail event)."""
    n, d, Q, k = 2 * TILE, 128, 8, 10
    base = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(Q, d)).astype(np.float32)
    lo = np.quantile(base, 0.001, axis=0).astype(np.float32)
    hi = np.quantile(base, 0.999, axis=0).astype(np.float32)
    alpha = np.maximum((hi - lo) / 255.0, 1e-12).astype(np.float32)
    codes = np.clip(np.round((np.clip(base, lo, hi) - lo) / alpha),
                    0, 255).astype(np.uint8)
    deq = lo + alpha * codes
    resid = np.abs(base - deq)
    err = resid.max(axis=0).astype(np.float32)
    ms = (resid * resid).mean(axis=0).astype(np.float32)
    sqe = (base * base).sum(1).astype(np.float32)
    args = (jnp.asarray(q), jnp.asarray(codes), jnp.asarray(lo),
            jnp.asarray(alpha), jnp.asarray(err), jnp.asarray(sqe),
            jnp.asarray(base), k, VectorMetric.L2)
    _, _, flag_cert = knn_scan_sq8_v2(*args, interpret=True)
    assert float(flag_cert) > 0.0     # cert margin overflows on this data
    scores, ids, flag = knn_scan_sq8_v2(*args, interpret=True,
                                        eps_mode="fast",
                                        ms_dims=jnp.asarray(ms))
    assert float(flag) <= 0.0
    ids = np.asarray(ids)
    dm = ((q[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    want = np.argsort(dm, axis=1)[:, :k]
    for b in range(Q):
        assert set(ids[b].tolist()) == set(want[b].tolist())


def test_v2_overflow_flag_on_mass_ties(rng):
    """Thousands of identical vectors tie every block max — the kernel must
    RAISE the overflow flag rather than silently truncate."""
    n, d, Q, k = 2 * TILE, 128, 4, 32
    one = rng.normal(size=(d,)).astype(np.float32)
    base = np.tile(one, (n, 1))
    q = rng.normal(size=(Q, d)).astype(np.float32)
    _, _, flag = knn_scan_fused_v2(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True)
    assert float(flag) > 0.0


def test_v2_availability_gate():
    assert not v2_available(TILE * 2 + 1, 128, 10, 8)     # non-divisible n
    assert not v2_available(TILE * 8, 96, 10, 8)          # dims not 128-mult
    assert not v2_available(TILE * 8, 128, 125, 8)        # k too large


@pytest.mark.parametrize("metric", [VectorMetric.L2,
                                    VectorMetric.INNER_PRODUCT])
@pytest.mark.parametrize("chunk_tiles", [1, 2])
def test_v3_matches_oracle(metric, chunk_tiles, rng):
    from reindexer_tpu.ops.pallas_select import knn_scan_fused_v3
    n, d, Q, k = 2 * TILE, 128, 8, 10
    base = rng.normal(size=(n, d)).astype(np.float32)
    base[5] = 0.0                       # zeroed-invalid contract
    q = rng.normal(size=(Q, d)).astype(np.float32)
    scores, ids, flag = knn_scan_fused_v3(
        jnp.asarray(q), jnp.asarray(base), k, metric, interpret=True,
        chunk_tiles=chunk_tiles)
    ids, scores = np.asarray(ids), np.asarray(scores)
    assert float(flag) <= 0.0
    if metric == VectorMetric.L2:
        dm = ((q[:, None, :] - base[None, :, :]) ** 2).sum(-1)
        dm[:, 5] = np.inf
        want = np.argsort(dm, axis=1)[:, :k]
        want_scores = -np.take_along_axis(dm, ids, axis=1)
    else:
        sm = q @ base.T
        sm[:, 5] = -np.inf
        want = np.argsort(-sm, axis=1)[:, :k]
        want_scores = np.take_along_axis(sm, ids, axis=1)
    for b in range(Q):
        assert set(ids[b].tolist()) == set(want[b].tolist())
        assert 5 not in ids[b]
    assert np.allclose(scores, want_scores, rtol=1e-4, atol=1e-3)


def test_v3_fewer_valid_than_k(rng):
    from reindexer_tpu.ops.pallas_select import knn_scan_fused_v3
    n, d, Q, k = 2 * TILE, 128, 4, 64
    base = np.zeros((n, d), dtype=np.float32)
    base[:7] = rng.normal(size=(7, d)).astype(np.float32)
    q = rng.normal(size=(Q, d)).astype(np.float32)
    scores, ids, flag = knn_scan_fused_v3(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True)
    ids = np.asarray(ids)
    for b in range(Q):
        got = [i for i in ids[b].tolist() if i >= 0]
        assert sorted(got) == list(range(7))
        assert (ids[b][7:] == -1).all()


def test_v3_clustered_boundary(rng):
    """Clustered data (catastrophic-cancellation scores, dense boundary):
    the selection must match the fp64 oracle up to fp32 evaluation noise.
    The hw twin of this test caught onehot_take's arithmetic Dekker split
    being fused away under --xla_allow_excess_precision (196/200 wrong)."""
    from reindexer_tpu.ops.pallas_select import knn_scan_fused_v3
    n, d, Q, k = 2 * TILE, 128, 8, 100
    base = (rng.normal(size=(n, d)) * 0.05 + rng.normal(size=(1, d))
            ).astype(np.float32)
    q = (rng.normal(size=(Q, d)) * 0.05 + base[0]).astype(np.float32)
    scores, ids, flag = knn_scan_fused_v3(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True)
    ids = np.asarray(ids)
    assert float(flag) <= 0.0
    dm = ((q[:, None, :].astype(np.float64)
           - base[None, :, :].astype(np.float64)) ** 2).sum(-1)
    mag = float(np.abs(base).max() ** 2 * d)
    tol = 64.0 * mag * 2.0 ** -24
    for b in range(Q):
        kth = np.sort(dm[b])[k - 1]
        got = set(ids[b].tolist())
        wnt = set(np.argsort(dm[b])[:k].tolist())
        assert all(dm[b][i] <= kth + tol for i in got - wnt)
        assert all(dm[b][i] >= kth - tol for i in wnt - got)


@pytest.mark.parametrize("metric", [VectorMetric.L2,
                                    VectorMetric.INNER_PRODUCT])
def test_sq8_v3_twinsweep_matches_v2(metric, rng):
    """The twin-phase single-kernel SQ8 path returns the same exact top-k
    as the two-kernel v2 pair on block-coherent clustered data."""
    from reindexer_tpu.ops.pallas_select import knn_scan_sq8_v3
    n, d, Q, k = 2 * TILE, 128, 8, 10
    n_blocks = n // 64
    centers = rng.normal(size=(n_blocks, d)).astype(np.float32) * 10.0
    base = (np.repeat(centers, 64, axis=0)
            + 0.3 * rng.normal(size=(n, d))).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    valid[7] = False
    base[7] = 0.0
    q = (centers[rng.integers(0, n_blocks, size=Q)]
         + 0.3 * rng.normal(size=(Q, d))).astype(np.float32)
    lo = np.quantile(base[valid], 0.001, axis=0).astype(np.float32)
    hi = np.quantile(base[valid], 0.999, axis=0).astype(np.float32)
    alpha = np.maximum((hi - lo) / 255.0, 1e-12).astype(np.float32)
    codes = np.clip(np.round((np.clip(base, lo, hi) - lo) / alpha),
                    0, 255).astype(np.uint8)
    deq = lo + alpha * codes
    err = np.abs(base[valid] - deq[valid]).max(axis=0).astype(np.float32)
    sq = (base * base).sum(1).astype(np.float32)
    sqe = np.where(valid, sq if metric == VectorMetric.L2 else 0.0,
                   np.float32(SQ_EFF_BIG)).astype(np.float32)
    args = (jnp.asarray(q), jnp.asarray(codes), jnp.asarray(lo),
            jnp.asarray(alpha), jnp.asarray(err), jnp.asarray(sqe),
            jnp.asarray(base), k, metric)
    s2, i2, f2 = knn_scan_sq8_v2(*args, interpret=True)
    s3, i3, f3 = knn_scan_sq8_v3(*args, interpret=True)
    assert float(f3) <= 0.0
    s2, i2 = np.asarray(s2), np.asarray(i2)
    s3, i3 = np.asarray(s3), np.asarray(i3)
    for b in range(Q):
        assert set(i3[b].tolist()) == set(i2[b].tolist())
        assert 7 not in i3[b]
    assert np.allclose(np.sort(s3, axis=1), np.sort(s2, axis=1),
                       rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("metric", [VectorMetric.L2,
                                    VectorMetric.INNER_PRODUCT])
def test_v3_bitonic_tail(metric, rng):
    """tail='bitonic' (in-kernel full sort of the 1024 fine candidates)
    returns the same top-k as tail='xla', sorted descending."""
    from reindexer_tpu.ops.pallas_select import knn_scan_fused_v3
    n, d, Q, k = 2 * TILE, 128, 8, 100
    base = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(Q, d)).astype(np.float32)
    sx, ix, fx = knn_scan_fused_v3(
        jnp.asarray(q), jnp.asarray(base), k, metric, interpret=True)
    sb, ib, fb = knn_scan_fused_v3(
        jnp.asarray(q), jnp.asarray(base), k, metric, interpret=True,
        tail="bitonic")
    assert float(fb) <= 0.0
    sx, ix = np.asarray(sx), np.asarray(ix)
    sb, ib = np.asarray(sb), np.asarray(ib)
    for b in range(Q):
        assert set(ib[b].tolist()) == set(ix[b].tolist())
        assert (np.diff(sb[b]) <= 1e-6).all()      # descending
    assert np.allclose(np.sort(sb, axis=1), np.sort(sx, axis=1),
                       rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("metric", [VectorMetric.L2,
                                    VectorMetric.INNER_PRODUCT])
@pytest.mark.parametrize("bits", [32, 20])
def test_v4_pipelined_matches_oracle(metric, bits, rng):
    """The pipelined multi-batch kernel returns exactly the per-batch v3
    results: every batch r's selection runs interleaved with batch r+1's
    sweep over the SAME limb buffer — any read-after-overwrite bug shows
    up as cross-batch contamination here."""
    from reindexer_tpu.ops.pallas_select import knn_scan_fused_v4
    n, d, R, Q, k = 2 * TILE, 128, 3, 8, 10
    base = rng.normal(size=(n, d)).astype(np.float32)
    base[5] = 0.0
    q = rng.normal(size=(R, Q, d)).astype(np.float32)
    scores, ids, flag = knn_scan_fused_v4(
        jnp.asarray(q), jnp.asarray(base), k, metric, interpret=True,
        bits=bits)
    ids, scores = np.asarray(ids), np.asarray(scores)
    assert float(flag) <= 0.0
    for r in range(R):
        if metric == VectorMetric.L2:
            dm = ((q[r][:, None, :] - base[None, :, :]) ** 2).sum(-1)
            dm[:, 5] = np.inf
            want = np.argsort(dm, axis=1)[:, :k]
            want_scores = -np.take_along_axis(dm, ids[r], axis=1)
        else:
            sm = q[r] @ base.T
            sm[:, 5] = -np.inf
            want = np.argsort(-sm, axis=1)[:, :k]
            want_scores = np.take_along_axis(sm, ids[r], axis=1)
        for b in range(Q):
            assert set(ids[r][b].tolist()) == set(want[b].tolist())
            assert 5 not in ids[r][b]
        assert np.allclose(scores[r], want_scores, rtol=1e-4, atol=1e-3)
        assert (np.diff(scores[r], axis=1) <= 1e-6).all()


def test_v4_xla_tail_and_fewer_valid(rng):
    from reindexer_tpu.ops.pallas_select import knn_scan_fused_v4
    n, d, R, Q, k = 2 * TILE, 128, 2, 4, 64
    base = np.zeros((n, d), dtype=np.float32)
    base[:7] = rng.normal(size=(7, d)).astype(np.float32)
    q = rng.normal(size=(R, Q, d)).astype(np.float32)
    scores, ids, flag = knn_scan_fused_v4(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True, tail="xla")
    ids = np.asarray(ids)
    for r in range(R):
        for b in range(Q):
            got = [i for i in ids[r][b].tolist() if i >= 0]
            assert sorted(got) == list(range(7))
            assert (ids[r][b][7:] == -1).all()


def test_v4_f32_park_matches_limb(rng):
    """park='f32' (scores scratch, in-register split at compaction) is
    bit-identical to the limb layout."""
    from reindexer_tpu.ops.pallas_select import knn_scan_fused_v4
    n, d, R, Q, k = 2 * TILE, 128, 2, 8, 50
    base = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(R, Q, d)).astype(np.float32)
    sl, il, _ = knn_scan_fused_v4(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True)
    sf, if_, ff = knn_scan_fused_v4(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True, park="f32")
    assert float(ff) <= 0.0
    assert (np.asarray(il) == np.asarray(if_)).all()
    assert np.allclose(np.asarray(sl), np.asarray(sf), rtol=0, atol=0)


def test_v4_stack_park_matches_limb(rng):
    """park='stack' (sublane-stacked limbs, 2-MXU-pass compaction dots)
    is bit-identical to the separate-limb layout."""
    from reindexer_tpu.ops.pallas_select import knn_scan_fused_v4
    n, d, R, Q, k = 2 * TILE, 128, 2, 8, 50
    base = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(R, Q, d)).astype(np.float32)
    sl, il, _ = knn_scan_fused_v4(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True)
    ss, is_, fs = knn_scan_fused_v4(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True, park="stack")
    assert float(fs) <= 0.0
    assert (np.asarray(il) == np.asarray(is_)).all()
    assert np.allclose(np.asarray(sl), np.asarray(ss), rtol=0, atol=0)


@pytest.mark.parametrize("chunk_tiles", [1, 2])
def test_v3_stack_park_matches_limb(chunk_tiles, rng):
    from reindexer_tpu.ops.pallas_select import knn_scan_fused_v3
    n, d, Q, k = 2 * TILE, 128, 8, 100
    base = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(Q, d)).astype(np.float32)
    sl, il, _ = knn_scan_fused_v3(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True, chunk_tiles=chunk_tiles)
    ss, is_, fs = knn_scan_fused_v3(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True, chunk_tiles=chunk_tiles, park="stack")
    assert float(fs) <= 0.0
    assert (np.asarray(il) == np.asarray(is_)).all()
    assert np.allclose(np.asarray(sl), np.asarray(ss), rtol=0, atol=0)


def test_v4_stack_b20_matches_limb_b32(rng):
    """The EXACT production combination for batched dispatch (ADVICE r3):
    brute_force._dispatch_scan sends every B>64 select through
    knn_scan_fused_v4 with v4_tuning() = park='stack', bits=20 — that
    pairing must stay id-exact vs the limb/32-bit reference."""
    from reindexer_tpu.ops.pallas_select import knn_scan_fused_v4
    n, d, R, Q, k = 2 * TILE, 128, 2, 8, 50
    base = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(R, Q, d)).astype(np.float32)
    sl, il, _ = knn_scan_fused_v4(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True)
    ss, is_, fs = knn_scan_fused_v4(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True, park="stack", bits=20)
    assert float(fs) <= 0.0
    assert (np.asarray(il) == np.asarray(is_)).all()
    assert np.allclose(np.asarray(sl), np.asarray(ss), rtol=0, atol=0)


def test_v4_ct_superchunk_matches_ct1(rng):
    """Compaction super-chunking (ct tiles per one-hot dot, RX_TPU_V4_CT)
    must be bit-identical to the per-tile formulation: same parked limbs,
    same threshold, only the dot granularity changes."""
    from reindexer_tpu.ops.pallas_select import knn_scan_fused_v4
    n, d, R, Q, k = 4 * TILE, 128, 2, 8, 50
    base = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(R, Q, d)).astype(np.float32)
    sl, il, _ = knn_scan_fused_v4(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True, park="stack", bits=20)
    for ct in (2, 4):
        ss, is_, fs = knn_scan_fused_v4(
            jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
            interpret=True, park="stack", bits=20, ct=ct)
        assert float(fs) <= 0.0
        assert (np.asarray(il) == np.asarray(is_)).all(), ct
        assert np.allclose(np.asarray(sl), np.asarray(ss), rtol=0,
                           atol=0), ct


def test_v3_stack_b20_matches_limb_b32(rng):
    """The production tuning (park=stack, bits=20) must stay id-exact vs
    the limb/32-bit reference: a coarser radix threshold only admits
    extra candidate blocks (overflow is flag-guarded)."""
    from reindexer_tpu.ops.pallas_select import knn_scan_fused_v3
    n, d, Q, k = 2 * TILE, 128, 8, 100
    base = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(Q, d)).astype(np.float32)
    sl, il, _ = knn_scan_fused_v3(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True)
    ss, is_, fs = knn_scan_fused_v3(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True, park="stack", bits=20)
    assert float(fs) <= 0.0
    assert (np.asarray(il) == np.asarray(is_)).all()
    assert np.allclose(np.asarray(sl), np.asarray(ss), rtol=0, atol=0)


def test_sq8_v3_bits20_matches_b32(rng):
    """bits=20 on the sq8 twin-phase kernel: same exact results as the
    32-bit radix (a coarser threshold only widens the candidate set) on
    block-coherent data where the certified eps fits the slot capacity."""
    from reindexer_tpu.ops.pallas_select import knn_scan_sq8_v3
    n, d, Q, k = 2 * TILE, 128, 8, 20
    rng2 = np.random.default_rng(11)
    n_blocks = n // 64
    centers = rng2.normal(size=(n_blocks, d)).astype(np.float32) * 10.0
    base = (np.repeat(centers, 64, axis=0)
            + 0.3 * rng2.normal(size=(n, d))).astype(np.float32)
    q = (centers[rng2.integers(0, n_blocks, size=Q)]
         + 0.3 * rng2.normal(size=(Q, d))).astype(np.float32)
    lo = np.quantile(base, 0.001, axis=0).astype(np.float32)
    hi = np.quantile(base, 0.999, axis=0).astype(np.float32)
    alpha = np.maximum((hi - lo) / 255.0, 1e-12).astype(np.float32)
    codes = np.clip(np.round((np.clip(base, lo, hi) - lo) / alpha),
                    0, 255).astype(np.uint8)
    deq = lo + alpha * codes
    err = np.abs(base - deq).max(axis=0).astype(np.float32)
    sq = (base * base).sum(1).astype(np.float32)
    outs = []
    for bits in (32, 20):
        s, i, fl = knn_scan_sq8_v3(
            jnp.asarray(q), jnp.asarray(codes), jnp.asarray(lo),
            jnp.asarray(alpha), jnp.asarray(err), jnp.asarray(sq),
            jnp.asarray(base), k, VectorMetric.L2,
            interpret=True, eps_mode="cert", bits=bits)
        outs.append((np.asarray(s), np.asarray(i), float(fl)))
    (s32, i32, f32f), (s20, i20, f20) = outs
    assert f32f <= 0.0 and f20 <= 0.0
    assert (i32 == i20).all()
    assert np.allclose(s32, s20, rtol=0, atol=0)


def test_v4_bytes_park_matches_limb(rng):
    """park='bytes' (i8 byte-plane compaction, bit-exact i32 moves) equals
    the limb layout bit for bit."""
    from reindexer_tpu.ops.pallas_select import knn_scan_fused_v4
    n, d, R, Q, k = 2 * TILE, 128, 2, 8, 50
    base = rng.normal(size=(n, d)).astype(np.float32)
    base[3] = 0.0
    q = rng.normal(size=(R, Q, d)).astype(np.float32)
    sl, il, _ = knn_scan_fused_v4(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True)
    sb, ib, fb = knn_scan_fused_v4(
        jnp.asarray(q), jnp.asarray(base), k, VectorMetric.L2,
        interpret=True, park="bytes")
    assert float(fb) <= 0.0
    assert (np.asarray(il) == np.asarray(ib)).all()
    assert np.allclose(np.asarray(sl), np.asarray(sb), rtol=0, atol=0)


# ---------------------------------------------------------------------------
# round 5: approx-SQ8 pipelined kernel (codes-only, i8 MXU)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("metric", [VectorMetric.L2, VectorMetric.INNER_PRODUCT])
def test_sq8_approx_v4_matches_quantized_oracle(metric, rng):
    """knn_scan_approx_sq8_v4 returns the exact top-k of ITS quantized
    scores (fac*s_q*(qa_i8 . codes_i8) - sq_eff): the f32 per-query scale is
    monotone, so the shared limb selection is exact in the quantized
    domain. Reference semantics: quantizer.h:11-75 (approx ranking)."""
    from reindexer_tpu.ops.pallas_select import knn_scan_approx_sq8_v4
    N, D, QB, K, R = 16384, 128, 8, 37, 2
    base = rng.normal(size=(N, D)).astype(np.float32)
    q = rng.normal(size=(R, QB, D)).astype(np.float32)
    lo = base.min(0)
    alpha = np.maximum((base.max(0) - lo) / 255.0, 1e-12).astype(np.float32)
    codes = np.clip(np.round((base - lo[None]) / alpha[None]), 0,
                    255).astype(np.uint8)
    codes_i8 = (codes.astype(np.int32) - 128).astype(np.int8)
    # engine contract (keeper.sq_eff): |b|^2 for L2, 0 for IP/cos
    sq_eff = ((base * base).sum(1) if metric == VectorMetric.L2
              else np.zeros(N)).astype(np.float32)
    s, i, flag = knn_scan_approx_sq8_v4(
        jnp.asarray(q), jnp.asarray(codes_i8),
        jnp.asarray(lo.astype(np.float32)), jnp.asarray(alpha),
        jnp.asarray(sq_eff), K, metric, interpret=True)
    assert float(flag) == 0.0
    s, i = np.asarray(s), np.asarray(i)
    fac = 2.0 if metric == VectorMetric.L2 else 1.0
    # oracle of the SAME integer arithmetic
    qa = q * alpha[None, None, :]
    s_q = np.maximum(np.abs(qa).max(2), 1e-30) / 127.0
    qa_i8 = np.round(qa / s_q[:, :, None]).astype(np.int8)
    s_int = np.einsum("rqd,nd->rqn", qa_i8.astype(np.int64),
                      codes_i8.astype(np.int64))
    s_or = (fac * s_q[:, :, None] * s_int.astype(np.float64)
            - (sq_eff[None, None, :] if metric == VectorMetric.L2 else 0.0))
    oi = np.argsort(-s_or, axis=2, kind="stable")[:, :, :K]
    for r in range(R):
        for b in range(QB):
            assert set(i[r, b].tolist()) == set(oi[r, b].tolist()), (r, b)
    # user-facing scores approximate the dequantized scores
    b_deq = lo[None] + alpha[None] * codes.astype(np.float32)
    dots = np.einsum("rqd,nd->rqn", q, b_deq)
    s_deq = (fac * dots
             - (sq_eff[None, None, :] + (q * q).sum(2)[:, :, None]
                if metric == VectorMetric.L2 else 0.0))
    for r in range(R):
        for b in range(QB):
            got = s[r, b]
            want = s_deq[r, b][i[r, b]]
            scale = np.abs(s_deq[r, b]).max() + 1e-9
            assert np.max(np.abs(got - want)) / scale < 0.02


def test_sq8_approx_v4_invalid_rows(rng):
    """Zeroed/invalid rows (sq_eff = +big) never appear in approx results."""
    from reindexer_tpu.ops.pallas_select import knn_scan_approx_sq8_v4
    from reindexer_tpu.ops.pallas_scan import SQ_EFF_BIG
    N, D, K = 16384, 128, 20
    base = rng.normal(size=(N, D)).astype(np.float32)
    invalid = rng.choice(N, size=N // 2, replace=False)
    sq_eff = (base * base).sum(1).astype(np.float32)
    sq_eff[invalid] += SQ_EFF_BIG
    lo = base.min(0)
    alpha = np.maximum((base.max(0) - lo) / 255.0, 1e-12).astype(np.float32)
    codes_i8 = (np.clip(np.round((base - lo[None]) / alpha[None]), 0, 255)
                .astype(np.int32) - 128).astype(np.int8)
    q = rng.normal(size=(1, 8, D)).astype(np.float32)
    s, i, flag = knn_scan_approx_sq8_v4(
        jnp.asarray(q), jnp.asarray(codes_i8),
        jnp.asarray(lo.astype(np.float32)), jnp.asarray(alpha),
        jnp.asarray(sq_eff), K, VectorMetric.L2, interpret=True)
    i = np.asarray(i)[0]
    bad = set(invalid.tolist())
    assert not any(int(x) in bad for row in i for x in row if x >= 0)
