"""Approx-SQ8 pipelined kernel (knn_scan_approx_sq8_v4) vs exact v4 and
the old v1 quantized scan, interleaved sampling at the bench shape.
Also reports recall@k of the approx ranking vs the exact fp32 top-k.

Usage: python tools/bench_sq8_approx.py [rounds]
"""
import sys, time
import os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from reindexer_tpu.core.type_consts import VectorMetric
from reindexer_tpu.ops.pallas_select import (knn_scan_fused_v4,
                                             knn_scan_approx_sq8_v4)
from reindexer_tpu.ops.pallas_scan import knn_scan_fused_sq8

M = VectorMetric.L2
rng = np.random.default_rng(0)
N, D, QB, K, R = 131072, 128, 64, 100, 8
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 12
SOL = 0.082
base = rng.normal(size=(N, D)).astype(np.float32)
lo = base.min(0)
alpha = np.maximum((base.max(0) - lo) / 255.0, 1e-12).astype(np.float32)
codes = np.clip(np.round((base - lo[None]) / alpha[None]), 0,
                255).astype(np.uint8)
codes_i8 = (codes.astype(np.int32) - 128).astype(np.int8)
sq_eff = (base * base).sum(1).astype(np.float32)

bd = jnp.asarray(base)
cd = jnp.asarray(codes)
cd8 = jnp.asarray(codes_i8)
lod = jnp.asarray(lo.astype(np.float32))
ad = jnp.asarray(alpha)
sqd = jnp.asarray(sq_eff)
q_flat = jnp.asarray(rng.normal(size=(192, QB, D)).astype(np.float32))


def red(outs):
    return jax.tree_util.tree_map(
        lambda x: jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)),
                                    x.astype(jnp.float32), 0.0)), outs)


def make_exact():
    @jax.jit
    def run(qq):
        return red(jax.lax.map(
            lambda g: knn_scan_fused_v4(g, bd, K, M, park="stack",
                                        bits=20)[:2], qq))
    return run


def make_approx():
    @jax.jit
    def run(qq):
        return red(jax.lax.map(
            lambda g: knn_scan_approx_sq8_v4(g, cd8, lod, ad, sqd, K,
                                             M)[:2], qq))
    return run


def make_v1sq8():
    @jax.jit
    def run(qq):
        return red(jax.lax.map(
            lambda g: knn_scan_fused_sq8(
                g.reshape(-1, D), cd, lod, ad, sqd, K, M)[:2],
            qq.reshape(qq.shape[0], R * QB, D).reshape(
                qq.shape[0], R, QB, D)))
    return run


VARIANTS = [("exact_v4", make_exact()), ("approx_v4", make_approx())]

qs = q_flat.reshape(192 // R, R, QB, D)
states = []
for label, run in VARIANTS:
    t0 = time.time()
    try:
        np.asarray(jax.tree_util.tree_leaves(run(qs[:1]))[0])
        np.asarray(jax.tree_util.tree_leaves(run(qs))[0])
    except Exception as e:
        print(f"# [{label}] FAILED {type(e).__name__}: {e}", flush=True)
        continue
    print(f"# [{label}] compiled {time.time()-t0:.0f}s", flush=True)
    states.append([label, run, float("inf"), float("inf")])

# recall@K of approx vs exact on one group
se, ie, _ = knn_scan_fused_v4(qs[0], bd, K, M, park="stack", bits=20)
sa, ia, fl = knn_scan_approx_sq8_v4(qs[0], cd8, lod, ad, sqd, K, M)
ie, ia = np.asarray(ie), np.asarray(ia)
rec = np.mean([len(set(ia[r, b].tolist()) & set(ie[r, b].tolist())) / K
               for r in range(R) for b in range(QB)])
print(f"# approx recall@{K} vs exact: {rec:.4f} flag={float(fl):.0f}",
      flush=True)

for rd in range(ROUNDS):
    for st in states:
        label, run, ts, tb = st
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(run(qs[:1]))[0])
        st[2] = min(ts, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(run(qs))[0])
        st[3] = min(tb, time.perf_counter() - t0)
    cur = ", ".join(f"{st[0]}={max(st[3]-st[2],1e-9)/(192-R)*1e3:.3f}"
                    for st in states)
    print(f"# round {rd}: {cur}", flush=True)
    time.sleep(2.0)

print("# ---- final floors (ms/batch)")
for label, run, ts, tb in states:
    dt = max(tb - ts, 1e-9) / (192 - R) * 1e3
    print(f"# [{label}]: {dt:.3f} ms/batch frac={SOL/dt:.3f}", flush=True)
print("# DONE", flush=True)
