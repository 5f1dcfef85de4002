"""VERDICT r4 #9: re-measure the FT frequent SINGLE-term host/device
crossover now that packed i32 downloads exist.

The routing (selector._try_dense) keeps single-TERM queries on the host
C++ merge unconditionally; DEVICE_MIN_SINGLE (2M gathered postings) was
set from pre-packing RTT math. This probe times, per single frequent
word across the zipf head (a ladder of posting counts G):

  host-cold : sel.process(word) with the per-word top-k cache cleared
              every round (the cache makes repeats ~free; only colds
              cost anything in production)
  device    : one packed [B=1] device-dense dispatch+drain of the same
              query (bypasses the routing guard)

and prints the measured crossover. Run on the real chip:
  python tools/probe_ft_single_xover.py [--docs 1000000]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def floors(fn, rounds=6, pause=0.4):
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
    from reindexer_tpu.ft.dsl import parse_ft_dsl
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
    dd = sel._device_dense()
    assert dd is not None and dd.ensure_built(), "dense build failed"
    mk = min(cfg.merge_limit, dd.cap)
    import jax

    # ladder of single words spanning the zipf head, by gathered postings
    probe_words = []
    for w in [f"w{i}" for i in (0, 1, 2, 4, 8, 16, 32, 64, 128)]:
        prep = sel._prepare(parse_ft_dsl(w))
        if prep is None:
            continue
        probe_words.append((w, prep, int(prep["G"])))
    probe_words.sort(key=lambda t: t[2])

    print("# word | G(postings) | host-cold ms | device ms | winner",
          file=sys.stderr, flush=True)
    xover = None
    for w, prep, G in probe_words:
        pack = dd.pack_query(prep)
        if pack is None:
            print(f"# {w}: not resident (G={G}) -> host only",
                  file=sys.stderr, flush=True)
            continue
        # warm the device shape once
        jax.device_get(dd.dispatch_batch([pack], mk, True, True,
                                         packed=True))

        def dev():
            jax.device_get(dd.dispatch_batch([pack], mk, True, True,
                                             packed=True))

        dt_dev = floors(dev)

        def host_cold():
            holder._single_top_cache = {}
            sel2.process(w)

        os.environ["RX_FT_DEVICE_DENSE"] = "0"
        sel2 = FtSelector(holder, cfg)
        sel2.process(w)          # warm AB cache etc.
        dt_host = floors(host_cold)
        os.environ.pop("RX_FT_DEVICE_DENSE", None)
        win = "device" if dt_dev < dt_host else "host"
        if win == "device" and xover is None:
            xover = G
        print(f"# {w} | {G} | {dt_host*1e3:.1f} | {dt_dev*1e3:.1f} | {win}",
              file=sys.stderr, flush=True)
    print(f"# first device win at G={xover}", file=sys.stderr, flush=True)
    print("# DONE", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
