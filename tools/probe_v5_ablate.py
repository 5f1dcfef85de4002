"""Fine-grained v4 selection ablation (round 5): where do the ~0.19 ms
of per-batch selection compute actually go? Interleaved sampling (same
protocol as bench_v4_matrix.py) over ablation stop-points and operand
substitutions of the production stack/b20 R8 kernel:

  sweep       sweep + limb park only
  thresh      + radix threshold / prefix ranks
  nodot       + compaction operand builds (sel one-hot, aug, slices),
                MXU dot replaced by one elementwise combine
  eyesel      + compaction dot against a broadcast identity (NO rank
                slice / one-hot compare build)
  noreduce    + real compaction dot, limb-sum reduce skipped
  compact     + full compaction (dot + reduce + accumulate)
  fine_fgm    + fine fgm group maxima + radix + prefix ranks
  fine_chunk  + fine 2nd compaction (8 chunk dots)
  full        + bitonic + emit (production)

Usage: python tools/probe_v5_ablate.py [rounds]
"""
import sys, time
import os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from reindexer_tpu.core.type_consts import VectorMetric
from reindexer_tpu.ops.pallas_select import knn_scan_fused_v4

M = VectorMetric.L2
rng = np.random.default_rng(0)
N, D, QB, K = 131072, 128, 64, 100
R = 8
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 12
SOL = 0.082
base = rng.normal(size=(N, D)).astype(np.float32)
bd = jnp.asarray(base)
q_flat = jnp.asarray(rng.normal(size=(192, QB, D)).astype(np.float32))

KW = {"park": "stack", "bits": 20}
VARIANTS = [
    ("sweep",      {**KW, "ablate": "sweep"}),
    ("thresh",     {**KW, "ablate": "thresh"}),
    ("nodot",      {**KW, "ablate": "nodot"}),
    ("eyesel",     {**KW, "ablate": "eyesel"}),
    ("noreduce",   {**KW, "ablate": "noreduce"}),
    ("compact",    {**KW, "ablate": "compact"}),
    ("fine_fgm",   {**KW, "ablate": "fine_fgm"}),
    ("fine_chunk", {**KW, "ablate": "fine_chunk"}),
    ("full",       KW),
]


def red(outs):
    return jax.tree_util.tree_map(
        lambda x: jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)),
                                    x.astype(jnp.float32), 0.0)), outs)


def make_run(kw):
    @jax.jit
    def run(qq, b):
        return red(jax.lax.map(
            lambda g: knn_scan_fused_v4(g, b, K, M, **kw)[:2], qq))
    groups = 192 // R
    qs = q_flat.reshape(groups, R, QB, D)
    return run, qs


states = []
for label, kw in VARIANTS:
    t0 = time.time()
    try:
        run, qs = make_run(kw)
        np.asarray(jax.tree_util.tree_leaves(run(qs[:1], bd))[0])
        np.asarray(jax.tree_util.tree_leaves(run(qs, bd))[0])
    except Exception as e:
        print(f"# v5ab[{label}]: FAILED {type(e).__name__}: {e}",
              flush=True)
        continue
    print(f"# v5ab[{label}]: compiled {time.time()-t0:.0f}s", flush=True)
    states.append([label, run, qs, float("inf"), float("inf")])

for r in range(ROUNDS):
    for st in states:
        label, run, qs, ts, tb = st
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(run(qs[:1], bd))[0])
        st[3] = min(ts, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(run(qs, bd))[0])
        st[4] = min(tb, time.perf_counter() - t0)
    cur = ", ".join(
        f"{st[0]}={max(st[4]-st[3],1e-9)/(192-R)*1e3:.3f}" for st in states)
    print(f"# round {r}: {cur}", flush=True)
    time.sleep(2.0)

print("# ---- final floors (ms/batch, frac of 0.082ms roofline)")
prev = 0.0
for label, run, qs, ts, tb in states:
    dt = max(tb - ts, 1e-9) / (192 - R) * 1e3
    print(f"# v5ab[{label}]: {dt:.3f} ms/batch frac={SOL/dt:.3f} "
          f"marginal={dt-prev:+.3f}", flush=True)
    prev = dt
print("# DONE", flush=True)
