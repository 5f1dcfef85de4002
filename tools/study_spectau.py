"""Speculative row-threshold (carried-tau) feasibility study — VERDICT r4
#1 asked for a fused sweep+selection kernel seeded by the previous batch's
k-th score. Before building it, this study measures the quantity that
decides it: for a per-query threshold tau predicted from the PREVIOUS
batch (distinct queries, same distribution), how often does

  undercount:  count(rows >= tau) < k          (tau too high -> rerun)
  overflow:    count(blocks with max >= tau) > S_SLOTS - MARGIN
                                               (tau too low -> rerun)

happen at the bench shape (131072 x 128, k=100, Q=64/batch)? The window
between the two failure modes is [kth, kth - (S-k-margin)*spacing]; with
the measured inter-rank spacing ~0.067 score units and cross-query kth
prediction residual sigma ~0.5-1.0, the analysis says the window is ~1-2
sigma wide — this script measures the actual failure-rate curve over a
safety-margin (delta) grid, using exact kth scores from the production v4
kernel and exact counts on device.

Also measures: rows >= tau_b where tau_b = (k+4)-th block max (the FREE
in-batch row bound) — whether the fine stage's 1024-candidate budget has
slack.

Usage: python tools/study_spectau.py [n_batches]
"""
import sys, time
import os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import functools
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from reindexer_tpu.core.type_consts import VectorMetric
from reindexer_tpu.ops.pallas_select import knn_scan_fused_v4, sweep_bmax, MARGIN, S_SLOTS
from reindexer_tpu.ops.pallas_scan import _pad_queries

M = VectorMetric.L2
rng = np.random.default_rng(0)
N, D, QB, K, R = 131072, 128, 64, 100, 8
NB = int(sys.argv[1]) if len(sys.argv) > 1 else 48
base = rng.normal(size=(N, D)).astype(np.float32)
bd = jnp.asarray(base)
q_all = rng.normal(size=(NB, QB, D)).astype(np.float32)
qd = jnp.asarray(q_all)
m_hat = float((base * base).sum(1).mean())

# ---- exact kth scores per query (v4 kernel, batched) — raw s form
# (2 q.b - |b|^2, NO -|q|^2 completion: kernels threshold in this form)
kth = np.zeros((NB, QB), np.float32)
for g0 in range(0, NB, R):
    g = min(R, NB - g0)
    qs = qd[g0:g0 + g]
    if g < R:
        qs = jnp.concatenate([qs, qd[:R - g]], 0)
    s, i, fl = knn_scan_fused_v4(qs, bd, K, M, park="stack", bits=20)
    s = np.asarray(s)[:g]
    qn = np.asarray(qs)[:g]
    corr = (qn * qn).sum(2)[:, :, None]
    kth[g0:g0 + g] = s[:, :, K - 1] + corr[:, :, 0]   # undo the -|q|^2
print(f"# kth computed for {NB} batches; kth mean {kth.mean():.2f} "
      f"std {kth.std():.2f}", flush=True)

# ---- per-batch counts: rows >= tau and blocks >= tau, on device
@functools.partial(jax.jit, static_argnames=())
def counts_for(q, taus):
    qf = _pad_queries(q)
    bm = sweep_bmax(qf, bd, M)                     # [G, Qn]
    # rows: stream scores in chunks to bound memory
    def chunk(c, acc):
        t0 = c * 8192
        tile = jax.lax.dynamic_slice(bd, (t0, 0), (8192, D))
        s = 2.0 * (qf @ tile.T) - jnp.sum(tile * tile, 1)[None, :]
        return acc + jnp.sum(s >= taus[:, None], axis=1)
    rows = jax.lax.fori_loop(0, N // 8192, chunk,
                             jnp.zeros((qf.shape[0],), jnp.int32))
    blocks = jnp.sum(bm.T >= taus[:, None], axis=1)
    return rows, blocks


# predictor: linear fit kth ~ a*|q| + b on the PREVIOUS batch
qnorm = np.linalg.norm(q_all, axis=2)              # [NB, QB]
DELTAS = [0.0, 0.5, 1.0, 1.5, 2.0, 3.0]
stats = {d: {"under": 0, "over": 0, "rows": [], "blocks": []}
         for d in DELTAS}
resids = []
taub_rows = []
for r in range(1, NB):
    x, y = qnorm[r - 1], kth[r - 1]
    A = np.stack([x, np.ones_like(x)], 1)
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    pred = coef[0] * qnorm[r] + coef[1]
    resids.append(pred - kth[r])
    # tau_b row-count probe (free in-batch bound): (K+4)th block max
    qf = _pad_queries(qd[r])
    bm = np.asarray(sweep_bmax(qf, bd, M)).T[:QB]  # [QB, G]
    taub = np.sort(bm, 1)[:, -(K + MARGIN)]
    rows_b, _ = jax.device_get(counts_for(qd[r], jnp.asarray(
        np.concatenate([taub, np.zeros(QB, np.float32) + 1e9]))[:64]))
    taub_rows.extend(np.asarray(rows_b)[:QB].tolist())
    for d in DELTAS:
        taus = (pred - d).astype(np.float32)
        rows, blocks = jax.device_get(counts_for(qd[r], jnp.asarray(
            np.concatenate([taus, np.zeros(QB, np.float32)]))[:64]))
        rows, blocks = np.asarray(rows)[:QB], np.asarray(blocks)[:QB]
        st = stats[d]
        st["under"] += int((rows < K).sum())
        st["over"] += int((blocks > S_SLOTS - MARGIN).sum())
        st["rows"].extend(rows.tolist())
        st["blocks"].extend(blocks.tolist())
    if r % 8 == 0:
        print(f"# batch {r}/{NB}", flush=True)

res = np.concatenate(resids)
nq = (NB - 1) * QB
print(f"# predictor residual (pred - kth): mean {res.mean():+.3f} "
      f"std {res.std():.3f} p5 {np.percentile(res,5):+.3f} "
      f"p95 {np.percentile(res,95):+.3f}", flush=True)
tb = np.asarray(taub_rows)
print(f"# rows >= tau_b (free in-batch (k+4)th-bmax bound): "
      f"mean {tb.mean():.0f} p99 {np.percentile(tb,99):.0f} "
      f"max {tb.max()}", flush=True)
print(f"# delta | P(under) | P(over) | mean rows | mean blocks | p99 blocks")
for d in DELTAS:
    st = stats[d]
    rw, bl = np.asarray(st["rows"]), np.asarray(st["blocks"])
    print(f"# {d:5.1f} | {st['under']/nq:8.4f} | {st['over']/nq:7.4f} | "
          f"{rw.mean():9.1f} | {bl.mean():11.1f} | {np.percentile(bl,99):6.0f}",
          flush=True)
print("# spacing check: mean (k..k+25 row-score span)/25 =", flush=True)
print("# DONE", flush=True)
