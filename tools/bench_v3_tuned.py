"""v3 + sq8-v3 tuned-variant validation on hw: id-exactness of the
production tuning (park=stack, bits=20) against the 32-bit limb
reference, plus floor-differenced timings (bench shape 131072x128,
64-query batch, k=100)."""
import sys, time
import os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from reindexer_tpu.core.type_consts import VectorMetric
from reindexer_tpu.ops.pallas_select import knn_scan_fused_v3, knn_scan_sq8_v3

M = VectorMetric.L2
rng = np.random.default_rng(0)
N, D, QB, K = 131072, 128, 64, 100
GROUPS, SMALL = 192, 16
base = rng.normal(size=(N, D)).astype(np.float32)
bd = jnp.asarray(base)
qs = jnp.asarray(rng.normal(size=(GROUPS, QB, D)).astype(np.float32))

lo = np.quantile(base, 0.001, axis=0).astype(np.float32)
hi = np.quantile(base, 0.999, axis=0).astype(np.float32)
alpha = np.maximum((hi - lo) / 255.0, 1e-12).astype(np.float32)
codes = np.clip(np.round((np.clip(base, lo, hi) - lo) / alpha),
                0, 255).astype(np.uint8)
deq = lo + alpha * codes
err = np.abs(base - deq).max(axis=0).astype(np.float32)
ms = np.mean((base - deq) ** 2, axis=0).astype(np.float32)
sq = (base * base).sum(1).astype(np.float32)
codes_d, lo_d, alpha_d = jnp.asarray(codes), jnp.asarray(lo), jnp.asarray(alpha)
err_d, ms_d, sq_d = jnp.asarray(err), jnp.asarray(ms), jnp.asarray(sq)


def red(outs):
    return jax.tree_util.tree_map(
        lambda x: jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)),
                                    x.astype(jnp.float32), 0.0)), outs)


def floor_time(fn, *extra, rounds=8):
    # device arrays ride as ARGUMENTS (closed-over device arrays embed
    # into the remote-compile payload — CLAUDE.md tunnel rule)
    np.asarray(jax.tree_util.tree_leaves(fn(qs[:SMALL], *extra))[0])
    np.asarray(jax.tree_util.tree_leaves(fn(qs, *extra))[0])
    ts = tb = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(qs[:SMALL], *extra))[0])
        ts = min(ts, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(qs, *extra))[0])
        tb = min(tb, time.perf_counter() - t0)
        time.sleep(2.0)
    return (tb - ts) / (GROUPS - SMALL) * 1e3


# ---- exactness: tuned v3 vs limb/32 reference on 4 batches
i_ref = None
for label, kw in (("limb b32", {}),
                  ("stack b20", {"park": "stack", "bits": 20})):
    t0 = time.time()
    s1, i1, f1 = knn_scan_fused_v3(qs[0], bd, K, M, **kw)
    ct = time.time() - t0
    i1 = np.asarray(i1)
    bad = -1
    if i_ref is None:
        i_ref = i1
    else:
        bad = sum(set(i1[b].tolist()) != set(i_ref[b].tolist())
                  for b in range(QB))

    @jax.jit
    def run(qq, b):
        return red(jax.lax.map(
            lambda g: knn_scan_fused_v3(g, b, K, M, **kw)[:2], qq))
    dt = floor_time(run, bd)
    print(f"# v3[{label}]: {dt:.3f} ms/batch frac={0.082/dt:.3f} "
          f"mismatch={bad} flag={float(f1)} (compile {ct:.0f}s)",
          flush=True)

# ---- sq8 twin-phase: bits=20 vs 32 (isotropic data overflows the eps
# ladder — verify BOTH rungs still flag identically, then time the fast
# rung anyway for the record)
for bits in (32, 20):
    t0 = time.time()
    s, i, fl = knn_scan_sq8_v3(qs[0], codes_d, lo_d, alpha_d, err_d,
                               sq_d, bd, K, M, eps_mode="fast",
                               ms_dims=ms_d, bits=bits)
    ct = time.time() - t0
    print(f"# sq8v3[b{bits}]: flag={float(fl):.0f} (compile {ct:.0f}s)",
          flush=True)

    @jax.jit
    def run(qq, c, lo, al, ed, s_, b, ms_):
        return red(jax.lax.map(
            lambda g: knn_scan_sq8_v3(g, c, lo, al, ed, s_, b, K, M,
                                      eps_mode="fast", ms_dims=ms_,
                                      bits=bits)[:2], qq))
    dt = floor_time(run, codes_d, lo_d, alpha_d, err_d, sq_d, bd, ms_d)
    print(f"# sq8v3[b{bits}]: {dt:.3f} ms/batch frac={0.082/dt:.3f}",
          flush=True)
print("# DONE", flush=True)
