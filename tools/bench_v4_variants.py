"""v4 round D: stack park timing + exactness (trimmed relaunch)."""
import sys, time
import os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from reindexer_tpu.core.type_consts import VectorMetric
from reindexer_tpu.ops.pallas_select import knn_scan_fused_v4

M = VectorMetric.L2
rng = np.random.default_rng(0)
N, D, QB, K, R = 131072, 128, 64, 100, 8
GROUPS, SMALL = 24, 2
base = rng.normal(size=(N, D)).astype(np.float32)
bd = jnp.asarray(base)
qs = jnp.asarray(rng.normal(size=(GROUPS, R, QB, D)).astype(np.float32))

def red(outs):
    return jax.tree_util.tree_map(
        lambda x: jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)),
                                    x.astype(jnp.float32), 0.0)), outs)

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
    return (tb - ts) / ((GROUPS - SMALL) * R) * 1e3

def floor_time_r(kw, R2, groups):
    """Variant with a different pipeline depth R2 (192 batches)."""
    qs2 = qs.reshape(-1, QB, D)[:groups * R2].reshape(groups, R2, QB, D)
    @jax.jit
    def run(qq):
        return red(jax.lax.map(
            lambda g: knn_scan_fused_v4(g, bd, K, M, **kw)[:2], qq))
    sm = qs2[:1]
    np.asarray(jax.tree_util.tree_leaves(run(sm))[0])
    np.asarray(jax.tree_util.tree_leaves(run(qs2))[0])
    ts = tb = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(run(sm))[0])
        ts = min(ts, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(run(qs2))[0])
        tb = min(tb, time.perf_counter() - t0)
        time.sleep(2.0)
    return (tb - ts) / ((groups - 1) * R2) * 1e3

i0 = None
for label, kw in (("stack b20", {"park": "stack", "bits": 20}),
                  ("stack b32", {"park": "stack"}),
                  ("limb ref", {}),
                  ("stack sweeponly", {"park": "stack", "ablate": "sweep"}),
                  ("stack +compact", {"park": "stack",
                                      "ablate": "compact"})):
    t0 = time.time()
    s1, i1, f1 = knn_scan_fused_v4(qs[0], bd, K, M, **kw)
    ct = time.time() - t0
    bad = -1
    if not kw.get("ablate"):
        i1 = np.asarray(i1)
        if i0 is None:
            i0 = i1
        bad = sum(set(i1[r, b].tolist()) != set(i0[r, b].tolist())
                  for r in range(R) for b in range(QB))
    @jax.jit
    def run(qq):
        return red(jax.lax.map(
            lambda g: knn_scan_fused_v4(g, bd, K, M, **kw)[:2], qq))
    dt = floor_time(run)
    print(f"# v4[{label}]: {dt:.3f} ms/batch frac={0.082/dt:.3f} "
          f"mismatch={bad} flag={float(f1)} (compile {ct:.0f}s)",
          flush=True)

# pipeline-depth sweep: the drain round costs selection/R per batch
for label, kw in (("bytes b32", {"park": "bytes"}),):
    t0 = time.time()
    try:
        s1, i1, f1 = knn_scan_fused_v4(qs[0], bd, K, M, **kw)
        ct = time.time() - t0
        i1 = np.asarray(i1)
        bad = sum(set(i1[r, b].tolist()) != set(i0[r, b].tolist())
                  for r in range(R) for b in range(QB))
        @jax.jit
        def run(qq):
            return red(jax.lax.map(
                lambda g: knn_scan_fused_v4(g, bd, K, M, **kw)[:2], qq))
        dt = floor_time(run)
        print(f"# v4[{label}]: {dt:.3f} ms/batch frac={0.082/dt:.3f} "
              f"mismatch={bad} (compile {ct:.0f}s)", flush=True)
    except Exception as e:
        print(f"# v4[{label}]: FAILED {type(e).__name__}: {e}", flush=True)

for R2, groups in ((24, 8), (16, 12)):
    dt = floor_time_r({"park": "stack"}, R2, groups)
    print(f"# v4[stack R={R2}]: {dt:.3f} ms/batch frac={0.082/dt:.3f}",
          flush=True)
print("# DONE", flush=True)
