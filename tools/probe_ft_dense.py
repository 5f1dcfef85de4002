"""On-chip cost probes for the FT device-resident dense BM25 design
(VERDICT r3 #5: move frequent-word scoring onto the device).

Measures, on the real chip through the tunnel:
  1. device->host download bandwidth (the design ships ~20k (doc,score)
     pairs per query back to the host)
  2. host->device upload bandwidth (per-query idx/weight uploads are tiny)
  3. the dense kernel: gather T*V resident [cap] rows, weighted
     variant-max, 2-term prox combine, per-segment top-M selection,
     bit-level binary search for the exact merge_k-th threshold
     (reference semantics: mergerimpl.h bounded merge at merge_limit).

Run: python tools/probe_ft_dense.py
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp


def floor_time(fn, reps=5, rounds=6, pause=0.0):
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        dt = (time.perf_counter() - t0) / reps
        best = min(best, dt)
        if pause:
            time.sleep(pause)
    return best


def bw_probes():
    for mb in (1, 4, 16, 64):
        n = mb * (1 << 18)
        x = jnp.zeros((n,), jnp.float32)
        x.block_until_ready()
        dt = floor_time(lambda: np.asarray(x), reps=3, rounds=4)
        print(f"# download {mb}MB: {dt*1e3:.1f}ms = {mb/dt:.1f} MB/s",
              file=sys.stderr, flush=True)
    h = np.zeros((16 << 18,), np.float32)
    dt = floor_time(lambda: jax.device_put(h).block_until_ready(),
                    reps=3, rounds=4)
    print(f"# upload 16MB: {dt*1e3:.1f}ms = {16/dt:.1f} MB/s",
          file=sys.stderr, flush=True)


B, T, V = 16, 2, 2
CAP = 1 << 20
G = 64
SEG = 1024
NSEG = CAP // SEG
M = 64
MERGE_K = 20000


@functools.partial(jax.jit, static_argnames=("with_select",))
def dense_score(SW, MP, idx, w, with_select=True):
    # rows: [B,T,V,cap] gathered from [G,cap] — chunked over cap to bound
    # the intermediate (full materialization at B=16 is 512MB)
    def chunk(c, acc):
        sl = jax.lax.dynamic_slice(SW, (0, c * (CAP // 8)), (G, CAP // 8))
        ml = jax.lax.dynamic_slice(MP, (0, c * (CAP // 8)), (G, CAP // 8))
        rows = sl[idx]                     # [B,T,V,cap/8]
        mrows = ml[idx]
        at = jnp.max(w[..., None] * rows, axis=2)        # [B,T,c]
        mt = jnp.min(mrows, axis=2)                      # [B,T,c]
        s0, s1 = at[:, 0], at[:, 1]
        m0, m1 = mt[:, 0], mt[:, 1]
        dist = jnp.maximum(jnp.abs(m1 - m0), 1.0)
        both = (s0 > 0) & (s1 > 0)
        att1 = jnp.where(both, s1 * (0.5 + 0.5 / dist), s1)
        sc = jnp.where(s0 > 0, s0, 0.0) + jnp.where(s1 > 0, att1, 0.0)
        return jax.lax.dynamic_update_slice(acc, sc, (0, c * (CAP // 8)))

    scores = jax.lax.fori_loop(
        0, 8, chunk, jnp.zeros((B, CAP), jnp.float32))
    if not with_select:
        return scores.sum()
    segs = scores.reshape(B, NSEG, SEG)
    top_v, top_i = jax.lax.top_k(segs, M)          # [B,NSEG,M]
    cand = top_v.reshape(B, NSEG * M)
    bits = jax.lax.bitcast_convert_type(cand, jnp.uint32)

    def bstep(_, lh):
        lo, hi = lh
        mid = (lo + hi) // 2
        cnt = jnp.sum(bits >= mid[:, None], axis=1)
        ge = cnt >= MERGE_K
        return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)

    lo0 = jnp.zeros((B,), jnp.uint32)
    hi0 = jnp.full((B,), jnp.uint32(0x7F800000))
    lo, hi = jax.lax.fori_loop(0, 31, bstep, (lo0, hi0))
    thr = jax.lax.bitcast_convert_type(lo, jnp.float32)
    cnt = jnp.sum(bits >= lo[:, None], axis=1)
    # overflow check: a segment whose M-th value still clears thr may hold
    # >M survivors -> host fallback
    ovf = jnp.any(top_v[:, :, M - 1] >= thr[:, None], axis=1)
    docs = (jnp.arange(NSEG, dtype=jnp.int32)[None, :, None] * SEG
            + top_i.astype(jnp.int32))
    return top_v, docs, thr, cnt, ovf


def main():
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    bw_probes()
    rng = np.random.default_rng(0)
    SW = jnp.asarray(rng.random((G, CAP), np.float32))
    MP = jnp.asarray(rng.integers(0, 1000, (G, CAP)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, G, (B, T, V)).astype(np.int32))
    w = jnp.asarray(rng.random((B, T, V), np.float32))

    t0 = time.perf_counter()
    r = dense_score(SW, MP, idx, w, with_select=False)
    r.block_until_ready()
    print(f"# compile score-only: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    dt = floor_time(
        lambda: dense_score(SW, MP, idx, w,
                            with_select=False).block_until_ready())
    print(f"# score-only [B={B},cap={CAP}]: {dt*1e3:.2f}ms "
          f"({dt*1e3/B:.3f}ms/q)", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    out = dense_score(SW, MP, idx, w, with_select=True)
    jax.block_until_ready(out)
    print(f"# compile full: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    dt = floor_time(
        lambda: jax.block_until_ready(
            dense_score(SW, MP, idx, w, with_select=True)))
    print(f"# full select (no download) [B={B}]: {dt*1e3:.2f}ms "
          f"({dt*1e3/B:.3f}ms/q)", file=sys.stderr, flush=True)

    def full_fetch():
        tv, docs, thr, cnt, ovf = dense_score(SW, MP, idx, w)
        return (np.asarray(tv), np.asarray(docs), np.asarray(thr),
                np.asarray(cnt), np.asarray(ovf))

    dt = floor_time(full_fetch, reps=3, rounds=5)
    tv, docs, thr, cnt, ovf = full_fetch()
    print(f"# full + download [B={B}] ({tv.nbytes+docs.nbytes>>20}MB): "
          f"{dt*1e3:.2f}ms ({dt*1e3/B:.3f}ms/q) cnt={cnt[:4]} "
          f"thr={thr[:2]} ovf={ovf.sum()}", file=sys.stderr, flush=True)

    # host-side finish: mask + sort ~merge_k pairs per query
    t0 = time.perf_counter()
    for b_ in range(B):
        m = tv[b_].reshape(-1) >= thr[b_]
        vv, dd = tv[b_].reshape(-1)[m], docs[b_].reshape(-1)[m]
        key = ((~vv.view(np.uint32)).astype(np.uint64) << 32) | dd.astype(
            np.uint64)
        order = np.argsort(key)[:MERGE_K]
        _ = vv[order], dd[order]
    dt_h = (time.perf_counter() - t0) / B
    print(f"# host finish: {dt_h*1e3:.2f}ms/q", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
