"""On-chip measurement: FT device-dense frequent-word scoring at 1M docs
(VERDICT r3 #5 gate: frequent 2-term >= 200 qps batched vs the 28-35 qps
host floor).

Builds the bench_ft1m corpus (same seed), runs frequent 2-term queries
through the device-dense path batched at several widths, reports qps floors,
and cross-checks two queries against the host merge.

Run: python tools/bench_ft_dense.py [--docs 1000000]
"""
import argparse
import os
import sys
import time

import numpy as np


def floors(fn, rounds=6, pause=0.5):
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
        time.sleep(pause)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    args = ap.parse_args()

    from reindexer_tpu.ft.config import FtFastConfig
    from reindexer_tpu.ft.dataholder import FtDataHolder
    from reindexer_tpu.ft.selector import FtSelector

    n_docs = args.docs
    rng = np.random.default_rng(4)
    vocab = [f"w{i}" for i in range(100_000)]
    zipf = np.minimum(rng.zipf(1.3, size=(n_docs, 30)) - 1, len(vocab) - 1)
    docs = [(i, [" ".join(vocab[j] for j in zipf[i])])
            for i in range(n_docs)]
    cfg = FtFastConfig()
    holder = FtDataHolder(cfg, ["text"])
    t0 = time.perf_counter()
    holder.build(docs, n_docs)
    print(f"# build {time.perf_counter()-t0:.1f}s "
          f"postings={holder.num_postings}", file=sys.stderr, flush=True)
    sel = FtSelector(holder, cfg)

    freq = [f"w{rng.integers(0, 5)} w{rng.integers(5, 20)}"
            for _ in range(64)]
    # warm: matrices build/upload + program compile
    t0 = time.perf_counter()
    r = sel.process(freq[0])
    print(f"# warm single (build+upload+compile): "
          f"{time.perf_counter()-t0:.1f}s results={len(r.ids)}",
          file=sys.stderr, flush=True)
    # the single-query route keeps G<2M on the host by design
    # (DEVICE_MIN_SINGLE); force-build the resident matrices so the
    # dispatch/drain split below measures the device path directly
    dd = sel._device_dense()
    assert dd is not None and dd.ensure_built(), "dense build failed"
    print(f"# dense resident words={len(dd.wid2slot)} cap={dd.cap}",
          file=sys.stderr, flush=True)

    # dispatch/drain split at B=16 to see where time goes
    preps = [sel._prepare(sel_parse(q)) for q in freq[:16]]
    packs = [dd.pack_query(p) for p in preps]
    assert all(p is not None for p in packs), "not all packable!"
    mk = min(cfg.merge_limit, dd.cap)
    h = dd.dispatch_batch(packs, mk, True, True)   # warm this shape
    import jax
    jax.block_until_ready(h[:2])

    def disp():
        return dd.dispatch_batch(packs, mk, True, True)

    dt_disp = floors(lambda: jax.block_until_ready(disp()[:2]), rounds=5)
    print(f"# device compute only [B=16]: {dt_disp*1e3:.1f}ms "
          f"({dt_disp*1e3/16:.2f}ms/q)", file=sys.stderr, flush=True)
    dt_full = floors(lambda: jax.device_get(disp()), rounds=5)
    print(f"# compute+download [B=16]: {dt_full*1e3:.1f}ms "
          f"({dt_full*1e3/16:.2f}ms/q)", file=sys.stderr, flush=True)

    for B in (16, 32, 64):
        qs = freq[:B]
        sel.process_batch(qs)      # warm shape
        dt = floors(lambda: sel.process_batch(qs), rounds=5)
        print(f"# process_batch B={B}: {dt*1e3:.1f}ms "
              f"({B/dt:.1f} qps)", file=sys.stderr, flush=True)

    # single-query serving
    dt = floors(lambda: sel.process(freq[1]), rounds=5)
    print(f"# single process: {dt*1e3:.1f}ms ({1/dt:.1f} qps)",
          file=sys.stderr, flush=True)

    # host floor for comparison + parity check on 2 queries
    os.environ["RX_FT_DEVICE_DENSE"] = "0"
    sel2 = FtSelector(holder, cfg)
    for q in freq[:2]:
        a = sel.process(q)
        b = sel2.process(q)
        same = sorted(a.ids.tolist()) == sorted(b.ids.tolist())
        dr = (np.abs(a.ranks - b.ranks).max()
              if same and len(a.ids) else -1.0)
        print(f"# parity {q!r}: ids_same={same} max_rank_diff={dr:.4f} "
              f"n={len(a.ids)}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    sel2.process(freq[2])
    print(f"# host single: {(time.perf_counter()-t0)*1e3:.1f}ms",
          file=sys.stderr, flush=True)
    os.environ.pop("RX_FT_DEVICE_DENSE", None)
    print("exit=0", file=sys.stderr, flush=True)


def sel_parse(q):
    from reindexer_tpu.ft.dsl import parse_ft_dsl
    return parse_ft_dsl(q)


if __name__ == "__main__":
    main()
