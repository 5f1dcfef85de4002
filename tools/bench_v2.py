"""On-chip benchmark: v2 fused-selection scan vs v1 at the headline shape.

Floor-over-rounds methodology (the chip is time-sliced with co-tenants):
each round times a 100-iteration device program; we report the min across
rounds spread over time. Usage: python tools/bench_v2.py [n_rounds]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from reindexer_tpu.core.type_consts import VectorMetric
from reindexer_tpu.ops import pallas_scan as v1
from reindexer_tpu.ops import pallas_select as v2

N, D, Q, K = 131072, 128, 64, 100
ITERS = 100
HBM_GBS = 819.0


def timed(fn, *args, rounds=8, sleep=2.0):
    outs = fn(*args)
    jax.block_until_ready(outs)
    best = float("inf")
    vals = []
    for r in range(rounds):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            outs = fn(*args)
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / ITERS
        vals.append(dt)
        best = min(best, dt)
        time.sleep(sleep)
    return best, vals


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(Q, D)).astype(np.float32))
    sq = jnp.sum(base * base, axis=1)
    metric = VectorMetric.L2
    sol = N * D * 4 / (HBM_GBS * 1e9)
    print(f"# sol(one fp32 sweep) = {sol*1e3:.3f} ms", flush=True)

    # --- correctness on-chip first
    t0 = time.time()
    s2, i2, fl = v2.knn_scan_fused_v2(q, base, K, metric)
    jax.block_until_ready((s2, i2, fl))
    print(f"# v2 compile+run {time.time()-t0:.1f}s flag={float(fl)}",
          flush=True)
    s1, i1 = v1.knn_scan_fused(q, base, sq, K, metric)
    jax.block_until_ready((s1, i1))
    # truth = numpy float64 oracle (v1's dual-orientation rounding deviates
    # on a few boundary candidates; v2's single-orientation scores do not)
    qn, bn = np.asarray(q), np.asarray(base)
    dm = ((qn[:, None, :] - bn[None, :, :]) ** 2).sum(-1)
    want = np.argsort(dm, axis=1)[:, :K]
    a, b = np.asarray(i1), np.asarray(i2)
    m1 = sum(set(a[r].tolist()) != set(want[r].tolist()) for r in range(Q))
    m2 = sum(set(b[r].tolist()) != set(want[r].tolist()) for r in range(Q))
    print(f"# vs oracle: v1 mismatches {m1}/{Q}, v2 mismatches {m2}/{Q}",
          flush=True)
    assert m2 == 0, "v2 must match the oracle"

    best1, v1s = timed(v1.knn_scan_fused, q, base, sq, K, metric,
                       rounds=rounds)
    print(f"# v1 best {best1*1e3:.3f} ms frac={sol/best1:.3f} "
          f"rounds={[f'{x*1e3:.2f}' for x in v1s]}", flush=True)
    best2, v2s = timed(v2.knn_scan_fused_v2, q, base, K, metric,
                       rounds=rounds)
    print(f"# v2 best {best2*1e3:.3f} ms frac={sol/best2:.3f} "
          f"rounds={[f'{x*1e3:.2f}' for x in v2s]}", flush=True)

    # stage split: sweep A alone
    qp = v1._pad_queries(q)
    bestA, _ = timed(v2.sweep_bmax, qp, base, metric, rounds=max(3, rounds // 2))
    print(f"# sweepA best {bestA*1e3:.3f} ms", flush=True)
    bm = v2.sweep_bmax(qp, base, metric)
    eps = jnp.zeros((qp.shape[0], 1), jnp.float32)
    bestB, _ = timed(v2.select_sweep, qp, base, bm, eps, K, metric,
                     rounds=max(3, rounds // 2))
    print(f"# sweepB best {bestB*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
