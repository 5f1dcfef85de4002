"""Phase breakdown of the IVF segment path on the real chip: where do the
~290 ms per 16-query batch at 1M x 768 go? (bench_ivf1m r4 measured qps
flat ~55 across nprobe, i.e. fixed overheads swamp the probe-proportional
DMA.)

Run: python tools/probe_ivf_phases.py [--n 250000]
"""
import argparse
import sys
import time

import numpy as np


def floors(fn, rounds=5, pause=0.3):
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
        time.sleep(pause)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=250_000)
    ap.add_argument("--dims", type=int, default=768)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from reindexer_tpu.core.payload import IndexDef, FloatVectorOpts
    from reindexer_tpu.core.type_consts import IndexType, VectorMetric
    from reindexer_tpu.index.vector.ivf import IvfIndex, probe_centroids
    from reindexer_tpu.index.vector.params import IvfSearchParams

    n, dims, B = args.n, args.dims, args.batch
    rng = np.random.default_rng(12)
    centers = rng.normal(size=(1024, dims)).astype(np.float32)
    assign = rng.integers(0, 1024, size=n)
    base = (centers[assign]
            + 0.35 * rng.normal(size=(n, dims))).astype(np.float32)
    idx = IvfIndex(IndexDef("vec", IndexType.IVF,
                            vector_opts=FloatVectorOpts(
                                dims=dims, metric=VectorMetric.COSINE,
                                centroids_count=1024)))
    t0 = time.perf_counter()
    idx.keeper.bulk_load(base)
    idx._grow(n)
    idx._train()
    idx._rebuild_csr()
    print(f"# train {time.perf_counter()-t0:.1f}s", file=sys.stderr,
          flush=True)

    queries = rng.normal(size=(B, dims)).astype(np.float32)
    q = np.stack([idx.keeper.prepare_query(v) for v in queries])
    qd = jnp.asarray(q)

    for nprobe in (8, 128):
        params = IvfSearchParams(k=100, nprobe=nprobe)
        idx.select_batch(queries, params)      # warm compile

        # phase a: stage-1 probe dispatch + host readback
        dt_a = floors(lambda: np.asarray(probe_centroids(
            qd, idx.centroids, nprobe, idx.metric)))
        probes = np.asarray(probe_centroids(qd, idx.centroids, nprobe,
                                            idx.metric))

        # phase b: host expansion (the python loop inside _stage2_segments)
        from reindexer_tpu.ops.ivf_kernels import SEG_BLK
        def expand():
            blk_cnt = idx._seg_blocks[probes]
            lens = np.diff(idx._list_start)
            per_q = blk_cnt.sum(axis=1)
            sq_ = 1 << int(np.ceil(np.log2(max(int(per_q.max()), 1))))
            sq_ = max(sq_, 4)
            starts = np.full((B, sq_), idx._pad_block, dtype=np.int32)
            counts = np.zeros((B, sq_), dtype=np.int32)
            for b in range(B):
                o = 0
                for p in range(nprobe):
                    li = probes[b, p]
                    nb = int(blk_cnt[b, p])
                    fb = int(idx._seg_first_block[li])
                    starts[b, o:o + nb] = np.arange(fb, fb + nb,
                                                    dtype=np.int32)
                    rem = int(lens[li])
                    for j in range(nb):
                        counts[b, o + j] = min(rem - j * SEG_BLK, SEG_BLK)
                    o += nb
            return starts, counts
        dt_b = floors(expand, rounds=3)

        # phase c+d: full select_batch (dispatch + drain)
        dt_full = floors(lambda: idx.select_batch(queries, params))

        # phase c alone: dispatch only (async handle, no drain)
        dt_c = floors(lambda: idx.select_batch_async(queries, params))

        print(f"# nprobe={nprobe}: probe+readback {dt_a*1e3:.1f}ms | "
              f"host expand {dt_b*1e3:.1f}ms | dispatch(all) "
              f"{dt_c*1e3:.1f}ms | full {dt_full*1e3:.1f}ms "
              f"({B/dt_full:.0f} qps)", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
