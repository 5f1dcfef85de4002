"""On-chip debugging of the v2 select kernel: run sweep A + a stripped
sweep-B that dumps (cand, kid, count) instead of extracting, and compare
against a numpy oracle of the compaction."""
import sys

sys.path.insert(0, "/root/repo")
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from reindexer_tpu.core.type_consts import VectorMetric
from reindexer_tpu.ops.pallas_select import (BLK, GL, MARGIN, S_SLOTS, SENT,
                                             SENT_HALF, TILE, _prefix_lanes,
                                             _radix_kth, _scores_tile,
                                             sweep_bmax)
from reindexer_tpu.ops.pallas_scan import _pad_queries

N, D, Q, K = 4096, 128, 8, 10
metric = VectorMetric.L2


def make_debug_kernel(n, k, Qn):
    G = n // BLK
    n_tiles = n // TILE
    kb = float(min(k + MARGIN, G))

    def _kernel(q_ref, eps_ref, bmaxf_ref, base_ref, cand_out, kid_out,
                count_out, rank_out, rank_gq, count_s, cand, kid):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            bm = bmaxf_ref[:].T
            tau = _radix_kth(bm, kb, axis=1)
            mask = jnp.where((bm >= tau - eps_ref[:]) & (bm > SENT_HALF),
                             1.0, 0.0)
            incl = _prefix_lanes(mask, axis=1)
            count_s[:] = incl[:, G - 1:G]
            rank = jnp.where(mask > 0.0, incl - mask, jnp.float32(S_SLOTS))
            rank_gq[:] = rank.T
            cand[:] = jnp.zeros_like(cand)
            kid[:] = jnp.zeros_like(kid)

        s_t = _scores_tile(base_ref[:], q_ref[:], metric)
        x = jnp.transpose(s_t.reshape(GL, BLK, Qn), (2, 1, 0))
        rk = rank_gq[pl.ds(i * GL, GL), :].T
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (Qn, GL, S_SLOTS), 2)
        sel_f = (rk[:, :, None].astype(jnp.int32) == s_iota).astype(
            jnp.float32)
        sel_b = sel_f.astype(jnp.bfloat16)
        from reindexer_tpu.ops.pallas_select import _split_bf16
        x_hi, x_lo = _split_bf16(x)
        dn = (((2,), (1,)), ((0,), (0,)))
        cand[:] += jax.lax.dot_general(
            x_hi, sel_b, dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        cand[:] += jax.lax.dot_general(
            x_lo, sel_b, dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        gval = (jnp.float32(i * GL)
                + jax.lax.broadcasted_iota(jnp.int32, (Qn, 1, GL), 2
                                           ).astype(jnp.float32))
        kid[:] += jax.lax.dot_general(
            gval, sel_f, dimension_numbers=dn,
            preferred_element_type=jnp.float32)

        @pl.when(i == n_tiles - 1)
        def _():
            cand_out[:] = cand[:]
            kid_out[:] = kid[:]
            count_out[:] = count_s[:]
            rank_out[:] = rank_gq[:]

    return _kernel


@functools.partial(jax.jit, static_argnames=("k",))
def debug_sweep(queries, base, bmax, eps, k):
    n, d = base.shape
    Qn = queries.shape[0]
    return pl.pallas_call(
        make_debug_kernel(n, k, Qn),
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((Qn, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Qn, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n // BLK, Qn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Qn, BLK, S_SLOTS), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Qn, 1, S_SLOTS), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Qn, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n // BLK, Qn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qn, BLK, S_SLOTS), jnp.float32),
            jax.ShapeDtypeStruct((Qn, 1, S_SLOTS), jnp.float32),
            jax.ShapeDtypeStruct((Qn, 1), jnp.float32),
            jax.ShapeDtypeStruct((n // BLK, Qn), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n // BLK, Qn), jnp.float32),
            pltpu.VMEM((Qn, 1), jnp.float32),
            pltpu.VMEM((Qn, BLK, S_SLOTS), jnp.float32),
            pltpu.VMEM((Qn, 1, S_SLOTS), jnp.float32),
        ],
    )(queries, eps, bmax, base)


rng = np.random.default_rng(0)
base = rng.normal(size=(N, D)).astype(np.float32)
q = rng.normal(size=(Q, D)).astype(np.float32)
qf = np.asarray(_pad_queries(jnp.asarray(q)))
bmax = np.asarray(sweep_bmax(jnp.asarray(qf), jnp.asarray(base), metric))
print("bmax shape", bmax.shape, flush=True)

# oracle bmax
st = 2.0 * (qf @ base.T) - (base * base).sum(1)[None, :]     # [Qn, N]
want_bmax = st.reshape(qf.shape[0], N // BLK, BLK).max(2).T  # [G, Qn]
print("sweepA bmax ok:",
      np.allclose(bmax, want_bmax, rtol=1e-4, atol=1e-3), flush=True)

eps = jnp.zeros((qf.shape[0], 1), jnp.float32)
cand, kid, count, rank_gq = jax.device_get(debug_sweep(
    jnp.asarray(qf), jnp.asarray(base), jnp.asarray(bmax), eps, K))
cand, kid = np.asarray(cand), np.asarray(kid)
count, rank_gq = np.asarray(count), np.asarray(rank_gq)
print("count:", count[:, 0], flush=True)

# oracle: per query, kept blocks = top-(K+MARGIN) by bmax (ties included)
Qn = qf.shape[0]
G = N // BLK
kb = K + MARGIN
bq = bmax.T                                            # [Qn, G]
for qi in range(min(Qn, 4)):
    tau = np.sort(bq[qi])[-kb]
    keep = np.flatnonzero(bq[qi] >= tau)
    print(f"q{qi}: oracle kept={len(keep)} kernel count={count[qi,0]:.0f}",
          flush=True)
    ranks = rank_gq[keep, qi].astype(int)
    ok_rank = sorted(ranks.tolist()) == list(range(len(keep)))
    kid_ok = all(kid[qi, 0, r] == g for g, r in zip(keep, ranks)
                 if r < S_SLOTS)
    cand_ok = True
    for g, r in zip(keep, ranks):
        if r >= S_SLOTS:
            continue
        want_scores = st[qi, g * BLK:(g + 1) * BLK]
        got = cand[qi, :, r]
        if not np.allclose(got, want_scores, rtol=1e-3, atol=1e-2):
            cand_ok = False
            print("   cand mismatch at block", g, "slot", r,
                  "got", got[:4], "want", want_scores[:4], flush=True)
            break
    print(f"   ranks_ok={ok_rank} kid_ok={kid_ok} cand_ok={cand_ok}",
          flush=True)
print("done", flush=True)
