"""sq8-v3 twin-phase kernel on hw: exactness (fast + cert eps) + timing
vs fp32 v3, chunked numpy oracle (1-core host: no 4GB allocations)."""
import sys, time
import os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from reindexer_tpu.core.type_consts import VectorMetric
from reindexer_tpu.ops.pallas_select import (knn_scan_sq8_v3,
                                             knn_scan_fused_v3)

M = VectorMetric.L2
rng = np.random.default_rng(0)
N, D, QB, K = 131072, 128, 64, 100
ITERS, SMALL = 120, 8
base = rng.normal(size=(N, D)).astype(np.float32)
lo = np.quantile(base, 0.001, axis=0).astype(np.float32)
hi = np.quantile(base, 0.999, axis=0).astype(np.float32)
alpha = np.maximum((hi - lo) / 255.0, 1e-12).astype(np.float32)
codes = np.clip(np.round((np.clip(base, lo, hi) - lo) / alpha),
                0, 255).astype(np.uint8)
deq = lo + alpha * codes
err = np.abs(base - deq).max(axis=0).astype(np.float32)
ms = np.mean((base - deq) ** 2, axis=0).astype(np.float32)
sqe = (base * base).sum(1).astype(np.float32)

bd = jnp.asarray(base)
cd = jnp.asarray(codes)
qs = jnp.asarray(rng.normal(size=(ITERS, QB, D)).astype(np.float32))
lod, ald, erd, sed, msd = map(jnp.asarray, (lo, alpha, err, sqe, ms))

qn = np.asarray(qs[0])
# chunked oracle (8 queries at a time: 8*131072*128*4 = 537 MB transient)
want = []
for b0 in range(0, QB, 8):
    dm = ((qn[b0:b0 + 8, None, :] - base[None, :, :]) ** 2).sum(-1)
    want.append(np.argpartition(dm, K, axis=1)[:, :K])
want = np.concatenate(want, 0)
print("# oracle ready", flush=True)

for mode in ("fast", "cert"):
    t0 = time.time()
    s, i3, fl = knn_scan_sq8_v3(qs[0], cd, lod, ald, erd, sed, bd, K, M,
                                eps_mode=mode, ms_dims=msd)
    i3 = np.asarray(i3)
    print(f"# sq8v3 {mode} compile+run {time.time()-t0:.1f}s "
          f"flag={float(fl)}", flush=True)
    if float(fl) > 0.0:
        print(f"# sq8v3 {mode}: overflow -> ladder fallback (expected on "
              "isotropic data for cert)", flush=True)
        continue
    bad = sum(set(i3[b].tolist()) != set(want[b].tolist())
              for b in range(QB))
    print(f"# sq8v3 {mode} oracle mismatches: {bad}/{QB}", flush=True)

def red(outs):
    return jax.tree_util.tree_map(
        lambda x: jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)),
                                    x.astype(jnp.float32), 0.0)), outs)

@jax.jit
def run_sq8(qq):
    return red(jax.lax.map(
        lambda q: knn_scan_sq8_v3(q, cd, lod, ald, erd, sed, bd, K, M,
                                  eps_mode="fast", ms_dims=msd)[:2], qq))

@jax.jit
def run_f32(qq):
    return red(jax.lax.map(lambda q: knn_scan_fused_v3(q, bd, K, M)[:2],
                           qq))

def floor_time(fn, rounds=8):
    np.asarray(jax.tree_util.tree_leaves(fn(qs[:SMALL]))[0])
    np.asarray(jax.tree_util.tree_leaves(fn(qs))[0])
    ts = tb = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(qs[:SMALL]))[0])
        ts = min(ts, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(qs))[0])
        tb = min(tb, time.perf_counter() - t0)
        time.sleep(2.0)
    return (tb - ts) / (ITERS - SMALL)

for name, fn, sol in (("sq8-v3", run_sq8, 0.0437), ("fp32-v3", run_f32,
                                                    0.082)):
    dt = floor_time(fn) * 1e3
    print(f"# {name}: {dt:.3f} ms  frac(own sol)={sol/dt:.3f} "
          f"frac(fp32 sol)={0.082/dt:.3f}", flush=True)
