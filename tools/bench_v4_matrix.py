"""v4 variant matrix, INTERLEAVED sampling (round-robin across variants
each timing round) so co-tenant congestion inflates every variant equally
— the round-3 sequential-block runs produced a 0.187 'stack b20' record
that three later driver-style captures (all 0.29) could not reproduce.

Measures: park in {limb, stack, bytes} x bits in {32, 20} at R=8, plus the
winner at R in {16, 24}. Floor-differenced per variant. Exactness: every
variant's ids checked against limb/b32 on one group.

Usage: python tools/bench_v4_matrix.py [rounds]
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
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SOL = 0.082          # ms, HBM roofline for one 64-query batch at this shape
base = rng.normal(size=(N, D)).astype(np.float32)
bd = jnp.asarray(base)
q_flat = jnp.asarray(rng.normal(size=(192, QB, D)).astype(np.float32))

VARIANTS = [
    ("limb b32 R8",  {"park": "limb"},               8),
    ("stack b20 R8", {"park": "stack", "bits": 20},  8),
    # round-4: compaction super-chunks — one one-hot dot per ct tiles
    # (contraction ct*128) amortizes MXU pass overheads; bit-exact vs
    # ct=1 in interpret mode
    ("stack b20 ct2", {"park": "stack", "bits": 20, "ct": 2},  8),
    ("stack b20 ct4", {"park": "stack", "bits": 20, "ct": 4},  8),
    ("stack b20 ct8", {"park": "stack", "bits": 20, "ct": 8},  8),
]


def red(outs):
    return jax.tree_util.tree_map(
        lambda x: jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)),
                                    x.astype(jnp.float32), 0.0)), outs)


def make_run(kw, R):
    @jax.jit
    def run(qq, b):
        return red(jax.lax.map(
            lambda g: knn_scan_fused_v4(g, b, K, M, **kw)[:2], qq))
    groups = 192 // R
    qs = q_flat.reshape(groups, R, QB, D)
    return run, qs


# ---- compile + exactness check (vs limb/b32 on the first group)
states = []
i_ref = None
for label, kw, R in VARIANTS:
    t0 = time.time()
    try:
        s1, i1, f1 = knn_scan_fused_v4(q_flat[:R].reshape(1, R, QB, D)[0],
                                       bd, K, M, **kw)
        i1 = np.asarray(i1).reshape(-1, np.asarray(i1).shape[-1])[:64]
        run, qs = make_run(kw, R)
        np.asarray(jax.tree_util.tree_leaves(run(qs[:1], bd))[0])
        np.asarray(jax.tree_util.tree_leaves(run(qs, bd))[0])
    except Exception as e:
        print(f"# v4[{label}]: FAILED {type(e).__name__}: {e}", flush=True)
        continue
    bad = -1
    if i_ref is None:
        i_ref = i1
    else:
        bad = sum(set(i1[b].tolist()) != set(i_ref[b].tolist())
                  for b in range(min(64, i1.shape[0], i_ref.shape[0])))
    print(f"# v4[{label}]: compiled {time.time()-t0:.0f}s "
          f"flag={float(f1):.0f} mismatch={bad}", flush=True)
    states.append([label, run, qs, R, float("inf"), float("inf")])

# ---- interleaved timing rounds
for r in range(ROUNDS):
    for st in states:
        label, run, qs, R, ts, tb = st
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(run(qs[:1], bd))[0])
        st[4] = min(ts, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(run(qs, bd))[0])
        st[5] = min(tb, time.perf_counter() - t0)
    cur = ", ".join(
        f"{st[0]}={max(st[5]-st[4],1e-9)/(192-st[3])*1e3:.3f}"
        for st in states)
    print(f"# round {r}: {cur}", flush=True)
    time.sleep(2.0)

print("# ---- final floors (ms/batch, frac of 0.082ms roofline)")
for label, run, qs, R, ts, tb in states:
    dt = max(tb - ts, 1e-9) / (192 - R) * 1e3
    print(f"# v4[{label}]: {dt:.3f} ms/batch frac={SOL/dt:.3f}", flush=True)
print("# DONE", flush=True)
