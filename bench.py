#!/usr/bin/env python
"""Headline benchmark: brute-force KNN QPS/chip vs the hardware roofline.

BASELINE.md config #1: 100k x 128 (SIFT-shaped) base, L2, top-100. The
north-star target (BASELINE.json) is >=70% of the matmul/HBM roofline on
TPU v5e for the brute-force engine, so `vs_baseline` reports the achieved
fraction of the speed-of-light latency (1.0 = roofline, target >= 0.7).

Prints ONE JSON line:
    {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": fraction}

Extra per-engine numbers go to stderr so the driver contract stays intact.
"""
import argparse
import json
import sys
import time

import numpy as np


# TPU v5e per-chip specs (public: cloud.google.com/tpu/docs/v5e)
V5E_HBM_GBS = 819e9          # bytes/s
V5E_BF16_FLOPS = 197e12
V5E_FP32_FLOPS = V5E_BF16_FLOPS / 4  # MXU fp32 via multi-pass bf16


def roofline_latency_s(n_rows: int, dims: int, batch: int, dtype_bytes: int,
                       flops_peak: float) -> float:
    """Speed-of-light latency for one batched scan: max(HBM, MXU) time."""
    bytes_scanned = n_rows * dims * dtype_bytes
    flops = 2.0 * batch * n_rows * dims
    return max(bytes_scanned / V5E_HBM_GBS, flops / flops_peak)


def bench_bf(n=100_000, dims=128, batch=64, k=100, iters=20, smoke=False):
    import jax
    import jax.numpy as jnp
    from reindexer_tpu.core.type_consts import VectorMetric
    from reindexer_tpu.ops.distance import knn_scan

    if smoke:
        n, iters = 10_000, 3

    rng = np.random.default_rng(0)
    cap = 1 << (int(np.ceil(np.log2(n))))
    base = np.zeros((cap, dims), dtype=np.float32)
    base[:n] = rng.normal(size=(n, dims)).astype(np.float32)
    valid = np.zeros(cap, dtype=bool)
    valid[:n] = True
    sq = np.sum(base * base, axis=1).astype(np.float32)
    queries = rng.normal(size=(batch, dims)).astype(np.float32)

    base_d = jnp.asarray(base)
    valid_d = jnp.asarray(valid)
    sq_d = jnp.asarray(sq)
    # R independent query batches folded into ONE device program so the
    # measurement amortizes dispatch latency (the axon tunnel adds ~10ms RTT
    # per call; production serving batches the same way)
    q_all = jnp.asarray(rng.normal(size=(iters, batch, dims)).astype(np.float32))

    @jax.jit
    def run_all(qs):
        return jax.lax.map(
            lambda q: knn_scan(q, base_d, valid_d, sq_d, k, VectorMetric.L2), qs)

    out = run_all(q_all)   # warmup/compile
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    out = run_all(q_all)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    qps = batch / dt
    sol = roofline_latency_s(cap, dims, batch, 4, V5E_FP32_FLOPS)
    frac = sol / dt

    dev = jax.devices()[0]
    print(f"# device={dev} n={n} cap={cap} dims={dims} batch={batch} k={k} "
          f"lat={dt*1e3:.3f}ms sol={sol*1e3:.3f}ms", file=sys.stderr)
    return {
        "metric": "bf_knn_qps_per_chip_100k_128_l2_top100",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(frac, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny fast run")
    args = ap.parse_args()
    result = bench_bf(smoke=args.smoke)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
