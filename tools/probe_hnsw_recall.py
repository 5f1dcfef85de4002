"""VERDICT r4 #4: HNSW graph quality at low ef on the 20k bench config.

The forward heuristic (getNeighborsByHeuristic2 semantics) and the
reverse-overflow heuristic re-run are already reference-faithful
(ops/hnsw_kernels.heuristic_select, csrc/hnsw_native.cpp). This probe
asks WHY recall@10 is 0.93 @ef=64 on the bench config — implementation
or data/metric regime? The bench config is INNER_PRODUCT over
UN-normalized isotropic gaussians: a non-metric regime where graph
navigability is known-poor (top-10 by IP concentrates on large-norm
hubs). Matrix:

  base     M=16 efC=128            (the bench build)
  efc256   M=16 efC=256            (candidate breadth)
  m24      M=24 efC=128            (degree)
  noheur   M=16 efC=128, forward diversity pruning OFF (top-m closest)
  normed   M=16 efC=128, SAME vectors L2-normalized (cosine regime
           control: if recall jumps, the gap is the metric/data, not
           the build)

Run: python tools/probe_hnsw_recall.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np


def run_variant(name, base, queries, m, efc, use_heuristic, k=10):
    from reindexer_tpu.core.payload import IndexDef as _ID, FloatVectorOpts
    from reindexer_tpu.core.type_consts import IndexType, VectorMetric
    from reindexer_tpu.index.vector.hnsw import HnswIndex

    n, dims = base.shape
    idx = HnswIndex(_ID("vec", IndexType.HNSW, vector_opts=FloatVectorOpts(
        dims=dims, metric=VectorMetric.INNER_PRODUCT, m=m,
        ef_construction=efc)))
    idx._use_heuristic = use_heuristic
    t0 = time.perf_counter()
    idx.keeper.bulk_load(base)
    idx._grow(n)
    idx._pending = dict(enumerate(base))
    idx.commit()
    build_s = time.perf_counter() - t0
    sims = queries @ base.T
    oracle = np.argsort(-sims, axis=1)[:, :k]
    batch = len(queries)
    out = [f"# {name} (M={m} efC={efc} heur={int(use_heuristic)}) "
           f"build={build_s:.1f}s:"]
    for ef in (32, 64, 128, 256):
        scores, ids = idx._search_batch(queries, ef)
        hits = sum(len(set(ids[i, :k].tolist()) & set(oracle[i].tolist()))
                   for i in range(batch))
        out.append(f"ef{ef}={hits/(batch*k):.3f}")
    # degree stats: diversity pruning leaves lists underfull by design
    deg = (idx._links0[:n] >= 0).sum(1)
    out.append(f"deg0 mean={deg.mean():.1f} p10={np.percentile(deg,10):.0f}")
    print(" ".join(out), flush=True)


def main():
    rng = np.random.default_rng(1)          # SAME seed as bench_hnsw
    n, dims, batch = 20_000, 96, 64
    base = rng.normal(size=(n, dims)).astype(np.float32)
    queries = rng.normal(size=(batch, dims)).astype(np.float32)

    run_variant("base", base, queries, 16, 128, True)
    run_variant("efc256", base, queries, 16, 256, True)
    run_variant("m24", base, queries, 24, 128, True)
    run_variant("noheur", base, queries, 16, 128, False)
    bn = base / np.linalg.norm(base, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    run_variant("normed", bn.astype(np.float32), qn.astype(np.float32),
                16, 128, True)
    print("# DONE", flush=True)


if __name__ == "__main__":
    main()
