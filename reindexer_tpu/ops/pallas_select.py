"""Fused brute-force KNN with IN-KERNEL selection (v2/v3 scans).

Replaces the v1 two-piece design (ops/pallas_scan.py: Pallas sweep
materializing [Q, N] partial scores + a ~0.4 ms XLA selection epilogue)
with kernels whose selection runs entirely in VMEM. Three generations,
all sharing the radix-threshold + rank-one-hot compaction + fine-stage
machinery (gathers are the TPU anti-pattern; matmuls are the pattern):

  v2 (sweep_bmax + select_sweep): two kernels, two base reads — sweep A
     emits per-64-row block maxima, sweep B thresholds them (32-bit
     monotone-int bisection), recomputes tile scores and compacts kept
     blocks with the one-hot MXU contraction, then runs a fine per-8
     stage and emits. The fallback when v3's scratch doesn't fit.
  v3 (onesweep_select): ONE base read — each sweep step parks the tile's
     scores in VMEM scratch pre-transposed and pre-split into 3 exact
     bf16 limbs (the transpose/split hide under the tile DMA), and the
     final grid step runs the whole selection from scratch with zero
     extra HBM traffic. tail="bitonic" additionally sorts the fine
     candidates in-kernel (55-stage roll/shuffle network), emitting
     [Q, 128] directly instead of exporting 1024 candidates to an XLA
     top_k.
  sq8 v3 (twinsweep_select_sq8): ONE twin-phase kernel — phase 0 sweeps
     the uint8 codes (1/4 the HBM bytes) into quantized block maxima,
     the boundary step picks the eps-widened threshold, phase 1 sweeps
     the fp32 base compacting kept blocks' EXACT scores (overlapped with
     its DMA).

Exactness: any row in the true top-k lives in a block whose max >= the k-th
best score, and at most k blocks satisfy that (distinct scores), so keeping
the top-(k+margin) blocks by bmax is a superset (margin absorbs sweep-A vs
sweep-B rounding, as v1's MARGIN did). The SQ8 path thresholds with a
CERTIFIED per-query error bound eps = fac * sum_d |q_d| * e_d (e_d = max
per-dim dequantization error, tracked at quantize time), then scores
candidates EXACTLY from the fp32 base — quantization accelerates the scan
without giving up the exact-top-k contract (the reference compensates with
per-vector corrective offsets instead: scalar_quantization/quantizer.h:11-75).
Ties/eps can overflow the S-slot capacity; the kernel then raises an output
flag and the caller reruns the v1 path (astronomically rare for fp32).

Replaces the same reference path as v1: tools/distances/l2_dist.cc:38-280 +
heap select (hnswlib/bruteforce.cc).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.type_consts import VectorMetric
from .pallas_scan import _dot3, _dot2, _pad_queries

def v4_tuning():
    """Deployment-tunable kwargs for the pipelined v4 kernel, resolved
    from env at call time (callers pass **v4_tuning() so the jit static
    args reflect the measured-best variant without signature churn).
    RX_TPU_V4_PARK: limb|stack|bytes|f32; RX_TPU_V4_BITS: radix width.

    Defaults = the measured-best exact variant (2026-08-18 INTERLEAVED
    on-chip matrix, tools/bench_v4_matrix.py — variants round-robin per
    timing round so congestion is shared; limb reproduced its historical
    0.311 in the same run): limb b32 0.311 / stack b32 0.293 /
    stack b20 0.283 / bytes b32 0.296 / bytes b20 0.290 ms/batch, all
    cross-variant id-exact, overflow flag 0. (An earlier sequential-block
    run printed stack b20 = 0.187; three driver-style captures and the
    interleaved matrix could not reproduce it — retracted, see
    docs/performance.md.) bits=20 keeps the exactness contract: a coarser
    radix threshold can only ADMIT more candidate blocks; a slot overflow
    raises the kernel flag and the engine reruns via the exact ladder
    (tests/test_quantization.py::test_sq8_v3_engine_ladder_exact,
    test_pallas_select.py overflow flag tests)."""
    import os
    kw = {"park": os.environ.get("RX_TPU_V4_PARK", "stack"),
          "bits": int(os.environ.get("RX_TPU_V4_BITS", "20"))}
    ct = int(os.environ.get("RX_TPU_V4_CT", "1"))
    if ct > 1:        # compaction super-chunking (stack park only)
        kw["ct"] = ct
    return kw


def sq8_tuning():
    """Deployment-tunable kwargs for the twin-phase SQ8 kernel
    (knn_scan_sq8_v3) — the single source of truth for the SQ8 radix
    default so engine (index/vector/brute_force.py) and bench call sites
    cannot drift apart. bits=20 mirrors v4_tuning's rationale: a coarser
    radix threshold only ADMITS more candidates; overflow raises the
    kernel flag and the engine reruns via the exact ladder."""
    import os
    return {"bits": int(os.environ.get("RX_TPU_SQ8_BITS", "20"))}


SENT = -1e30                 # in-kernel invalid/empty sentinel (NEVER -inf:
                             # 0 * -inf = NaN in the one-hot contractions)
SENT_HALF = -5e29
BLK = 64                     # selection block (rows per bmax entry)
TILE = 8192                  # base rows per grid step (16384 measured no
#                              better in a clean window; 8192 keeps DMA
#                              pipelining granularity)
GL = TILE // BLK             # blocks per tile
S_SLOTS = 128                # compacted block capacity (>= k + margin)
S2 = 128                     # fine-stage slot capacity
MARGIN = 4                   # sweep-A vs sweep-B rounding absorption
INT_MIN = np.int32(-2147483648)


def _key_i32(x):
    """Monotone f32 -> signed i32 map (float order == int order)."""
    s = pltpu.bitcast(x, jnp.int32)
    return jnp.where(s >= 0, s, INT_MIN - s)


def _unkey_f32(m):
    s = jnp.where(m >= 0, m, INT_MIN - m)
    return pltpu.bitcast(s, jnp.float32)


RADIX_BITS = 20    # threshold resolution: truncating the low bits only
#                    LOWERS tau (count >= kth still holds -> still a
#                    superset); inflation is bounded by the slot capacity,
#                    whose overflow raises the kernel flag


def _radix_kth(keys, kth, axis, bits=32):
    """Value of the `kth`-largest element of `keys` (f32) along `axis`
    (keepdims), via high-bit bisection on the monotone-int image:
    count(keys >= result) >= kth always; with bits=32 the result is
    exactly the kth-largest value, with fewer bits a slightly smaller
    threshold (serial in-kernel iterations cost ~1us each)."""
    m = _key_i32(keys)
    shape = list(keys.shape)
    shape[axis] = 1
    u0 = jnp.zeros(shape, jnp.int32)

    def step(j, u):
        bitv = jnp.left_shift(jnp.int32(1), 31 - j)
        u_try = jnp.bitwise_or(u, bitv)
        mt = jnp.bitwise_xor(u_try, INT_MIN)
        cnt = jnp.sum(jnp.where(m >= mt, 1.0, 0.0), axis=axis,
                      keepdims=True)
        return jnp.where(cnt >= kth, u_try, u)

    u = jax.lax.fori_loop(0, bits, step, u0)
    return _unkey_f32(jnp.bitwise_xor(u, INT_MIN))


def _prefix_lanes(x, axis):
    """Inclusive prefix sum along a lane axis via log-step rolls."""
    n = x.shape[axis]
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    sh = 1
    while sh < n:
        rolled = pltpu.roll(x, sh, axis=axis)
        x = x + jnp.where(lanes >= sh, rolled, 0.0)
        sh *= 2
    return x


def _trunc16(x):
    """Top 16 bits of an f32 (exactly bf16-representable). Bit masking, not
    arithmetic: the (x - bf16(x)) round-trip is fused away under
    --xla_allow_excess_precision (measured: scores quantized to bf16 ulps
    on-chip while exact in interpret mode); the integer AND is opaque."""
    return pltpu.bitcast(
        jnp.bitwise_and(pltpu.bitcast(x, jnp.int32),
                        jnp.int32(-65536)), jnp.float32)


def _split3_bf16(x):
    """BITWISE-EXACT 3-limb bf16 split of f32: hi/mid are bit-truncated
    (bf16-exact), lo holds the remaining <= 8 mantissa bits (also bf16-
    exact), so hi + mid + lo reconstructs x exactly in f32 accumulation.
    A 2-limb split leaves ~2^-17 relative error — enough to swap the k-th
    and (k+1)-th candidate at dense score boundaries (observed 1/64
    queries at the 131k bench shape)."""
    hi = _trunc16(x)
    r = x - hi
    mid = _trunc16(r)
    lo = r - mid
    return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
            lo.astype(jnp.bfloat16))


def _scores_tile(tile, q, metric):
    """Exact transposed scores s_t f32[T, Q]: 2*q.b - |b|^2 for L2 (the
    per-query -|q|^2 completion is rank-invariant, added by the wrapper),
    q.b for IP/cosine. Zeroed (invalid) rows -> SENT."""
    dots_t = _dot3(tile, q)                       # [T, Q]
    sumsq = jnp.sum(tile * tile, axis=1, keepdims=True)
    s_t = (2.0 * dots_t - sumsq) if metric == VectorMetric.L2 else dots_t
    return jnp.where(sumsq > 0.0, jnp.maximum(s_t, SENT), SENT)


# ---------------------------------------------------------------------------
# sweep A: block maxima only
# ---------------------------------------------------------------------------

def _make_bmax_kernel(metric):
    # bmax is emitted in [G, Q] layout: Mosaic requires output block lane
    # dims divisible by 128 (or full) — [GL, Qn] blocks qualify via the
    # full-Qn lane dim; the select kernel transposes once in VMEM.
    def _kernel(q_ref, base_ref, bmax_ref):
        s_t = _scores_tile(base_ref[:], q_ref[:], metric)
        bmax_ref[:] = jnp.max(
            s_t.reshape(GL, BLK, s_t.shape[1]), axis=1)           # [GL, Q]
    return _kernel


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def sweep_bmax(queries, base, metric, interpret=False):
    """bmax f32[Q, N/BLK] from one base read (no ps materialization)."""
    n, d = base.shape
    Qn = queries.shape[0]
    return pl.pallas_call(
        _make_bmax_kernel(metric),
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((Qn, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GL, Qn), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // BLK, Qn), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )(queries, base)


def _make_bmax_sq8_kernel(metric):
    l2 = metric == VectorMetric.L2

    def _kernel(qa_ref, shift_ref, codes_ref, sqe_ref, bmax_ref):
        c = codes_ref[:].astype(jnp.int32).astype(jnp.float32)
        dots_t = _dot2(c, qa_ref[:])                       # [T, Q]
        s_t = (2.0 * dots_t if l2 else dots_t) - sqe_ref[:]
        s_t = jnp.maximum(s_t + shift_ref[:], SENT)
        bmax_ref[:] = jnp.max(
            s_t.reshape(GL, BLK, s_t.shape[1]), axis=1)           # [GL, Q]
    return _kernel


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def sweep_bmax_sq8(q_alpha, shift, codes, sq_eff, metric, interpret=False):
    """Quantized bmax from the uint8 codes (1/4 the HBM bytes of fp32).
    `shift` f32[1, Q] = fac * q.lo aligns the affine-code scores with the
    exact fp32 scores so one eps bound covers the difference; sq_eff is the
    EXACT |b|^2 (+big for invalid rows)."""
    n, d = codes.shape
    Qn = q_alpha.shape[0]
    return pl.pallas_call(
        _make_bmax_sq8_kernel(metric),
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((Qn, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GL, Qn), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // BLK, Qn), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )(q_alpha, shift, codes, sq_eff[:, None])


# ---------------------------------------------------------------------------
# sweep B: threshold + compaction + fine select + extraction, one kernel
# ---------------------------------------------------------------------------

def _make_select_kernel(n, k, metric, Qn, xla_tail, ablate=''):
    G = n // BLK
    n_tiles = n // TILE
    kb = float(min(k + MARGIN, G))      # blocks to keep (threshold rank)
    kf = float(min(k + MARGIN, 8 * S_SLOTS))
    log_s = S_SLOTS.bit_length() - 1

    # cand rows: BLK score rows + 2 block-id rows (ghi/glo) + pad to 8-mult
    CR = BLK + 8

    def _kernel(q_ref, eps_ref, bmaxf_ref, base_ref, out_s_ref, out_i_ref,
                flag_ref, rank_gq, count_s, cand, rank2_s):
        i = pl.program_id(0)

        # ---- step 0: threshold + global block ranks (VMEM only)
        @pl.when(i == 0)
        def _():
            bm = bmaxf_ref[:].T                                # [Q, G]
            tau = _radix_kth(bm, kb, axis=1, bits=RADIX_BITS)  # [Q, 1]
            mask = jnp.where(
                (bm >= tau - eps_ref[:]) & (bm > SENT_HALF), 1.0, 0.0)
            incl = _prefix_lanes(mask, axis=1)
            count_s[:] = incl[:, G - 1:G]
            # unmasked blocks get rank >= S_SLOTS -> dropped by the one-hot
            rank = jnp.where(mask > 0.0, incl - mask,
                             jnp.float32(S_SLOTS))
            rank_gq[:] = rank.T                                # [G, Q]
            cand[:] = jnp.zeros_like(cand)

        # ---- every step: exact scores + rank-one-hot compaction.
        # ONE batched dot per step: the 3 exact bf16 limbs concatenate
        # along the CONTRACTION axis (hi|mid|lo x sel|sel|sel sums the
        # three limb products in one pass), and two AUGMENTED ROWS carry
        # the block-id pieces (ghi/glo <= 255, bf16-exact) through the
        # same contraction — per-q batched small matmuls are issue-bound,
        # so dot COUNT, not FLOPs, is the cost (5 dots/step at TILE 2048
        # measured v2 1.7x slower than v1).
        s_t = _scores_tile(base_ref[:], q_ref[:], metric)      # [T, Q]
        x = jnp.transpose(s_t.reshape(GL, BLK, Qn), (2, 1, 0))  # [Q, c, gl]
        rk = rank_gq[pl.ds(i * GL, GL), :].T                   # [Q, GL]
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (Qn, GL, S_SLOTS), 2)
        sel_b = (rk[:, :, None].astype(jnp.int32) == s_iota).astype(
            jnp.bfloat16)                                      # [Q, GL, S]
        dn = (((2,), (1,)), ((0,), (0,)))
        hi, mid, lo = _split3_bf16(x)
        gid = (jnp.float32(i * GL)
               + jax.lax.broadcasted_iota(jnp.int32, (Qn, 1, GL), 2
                                          ).astype(jnp.float32))
        ghi = jnp.floor(gid * (1.0 / 256.0))            # <= 7
        glo = gid - 256.0 * ghi                         # <= 255
        aug = jnp.concatenate([ghi, glo,
                               jnp.zeros((Qn, CR - BLK - 2, GL),
                                         jnp.float32)],
                              axis=1).astype(jnp.bfloat16)   # [Q, CR-BLK, GL]
        zpad = jnp.zeros((Qn, CR - BLK, GL), jnp.bfloat16)
        x3 = jnp.concatenate(
            [jnp.concatenate([hi, aug], axis=1),
             jnp.concatenate([mid, zpad], axis=1),
             jnp.concatenate([lo, zpad], axis=1)], axis=2)  # [Q, CR, 3GL]
        sel3 = jnp.concatenate([sel_b] * 3, axis=1)         # [Q, 3GL, S]
        cand[:] += jax.lax.dot_general(
            x3, sel3, dimension_numbers=dn,
            preferred_element_type=jnp.float32)

        # ---- last step: fine stage + extraction
        @pl.when(i == n_tiles - 1)
        def _():
            if ablate == "noepi":      # measurement ablation: sweep only
                out_s_ref[:] = jnp.zeros_like(out_s_ref)
                out_i_ref[:] = jnp.zeros_like(out_i_ref)
                flag_ref[:] = count_s[:1, :1] * 0.0
                return
            _fine_emit(cand, count_s, rank2_s, out_s_ref, out_i_ref,
                       flag_ref, k, kf, Qn, xla_tail)

    return _kernel


def _sub_xor(x, d):
    """Partner array across SUBLANES at XOR distance d (1, 2 or 4 of 8)
    via static slices + concat (Mosaic has no sublane roll; static sublane
    slicing is in the verified capability set)."""
    if d == 4:
        return jnp.concatenate([x[:, 4:8], x[:, 0:4]], axis=1)
    if d == 2:
        return jnp.concatenate([x[:, 2:4], x[:, 0:2],
                                x[:, 6:8], x[:, 4:6]], axis=1)
    return jnp.concatenate([x[:, 1:2], x[:, 0:1], x[:, 3:4], x[:, 2:3],
                            x[:, 5:6], x[:, 4:5], x[:, 7:8], x[:, 6:7]],
                           axis=1)


def _bitonic_desc_1024(keys, rid, Qn):
    """Full descending bitonic sort of [Qn, 8, 128] (keys f32, rid f32
    payload; ties keep the lower flat position, so equal keys never
    duplicate or drop a payload). Flat order p = sublane*128 + lane;
    lane-stride partners are two pltpu.rolls + a select, sublane-stride
    partners are static slice shuffles. 55 compare-exchange stages over
    0.26 MB operands — replaces the XLA top_k tail (measured ~0.1 ms of
    per-op launch overhead) with ~us of VPU work inside the kernel."""
    SL = 128
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (Qn, 8, SL), 2)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (Qn, 8, SL), 1)
    p = s_iota * SL + l_iota

    def partner(x, j):
        if j < SL:
            lo = pltpu.roll(x, SL - j, axis=2)     # x[l + j] at lane l
            hi = pltpu.roll(x, j, axis=2)          # x[l - j] at lane l
            return jnp.where((l_iota & j) == 0, lo, hi)
        return _sub_xor(x, j // SL)

    size = 2
    while size <= 1024:
        j = size // 2
        while j >= 1:
            kp = partner(keys, j)
            rp = partner(rid, j)
            low = (p & j) == 0
            km = low == ((p & size) == 0)
            pred = (keys > kp) | ((keys == kp) & low)
            # XNOR, not where(km, pred, ~pred): Mosaic rejects selects on
            # i1 operands ("unsupported target bitwidth for truncation")
            take_self = km == pred
            keys = jnp.where(take_self, keys, kp)
            rid = jnp.where(take_self, rid, rp)
            j //= 2
        size *= 2
    return keys, rid


def _fine_emit(cand, count_s, rank2_s, out_s_ref, out_i_ref, flag_ref,
               k, kf, Qn, xla_tail, bits=RADIX_BITS, stack=False,
               ablate=""):
    """Fine per-8 selection + emission from the compacted candidate buffer
    (`cand` scratch ref [Qn, BLK+8, S_SLOTS], block ids in the augmented
    rows). Shared between the v2 select kernel and the v3 one-sweep
    kernel — both reach their last grid step holding the same buffer."""
    dn = (((2,), (1,)), ((0,), (0,)))
    count = count_s[:]                                  # [Q, 1]
    # kept-block id per slot, FREE from the augmented rows
    kid2d = (256.0 * cand[:, BLK:BLK + 1, :]
             + cand[:, BLK + 1:BLK + 2, :])             # [Q, 1, S]
    # fine layout: group g2 = ch*S + s holds cand[:, ch*8:(ch+1)*8,
    # s] — chunk ch of the fine lanes is EXACTLY a static sublane
    # slice of cand, so nothing [Q, 8, 8S]-shaped ever materializes
    # (an 8x-unrolled chunk loop allocated per-iteration
    # temporaries -> 29 MB VMEM OOM; fori reuses buffers).
    # Mosaic also cannot broadcast [Q,1,1] over sublanes AND lanes
    # in one op — predicates build on [Q,1,L] rows first, and the
    # consumer broadcasts over sublanes only.
    s_r = jax.lax.broadcasted_iota(jnp.int32, (Qn, 1, S_SLOTS), 2)
    valid_r = s_r.astype(jnp.float32) < count[:, :, None]

    fgm = jnp.concatenate(
        [jnp.max(jnp.where(valid_r, cand[:, ch * 8:(ch + 1) * 8, :],
                           SENT), axis=1, keepdims=True)
         for ch in range(8)], axis=2)                  # [Q, 1, 8S]
    tau2 = _radix_kth(fgm, kf, axis=2, bits=bits)
    mask2 = jnp.where((fgm >= tau2) & (fgm > SENT_HALF), 1.0, 0.0)
    incl2 = _prefix_lanes(mask2, axis=2)
    count2 = incl2[:, :, 8 * S_SLOTS - 1:]             # [Q, 1, 1]
    # staged through scratch: Mosaic lacks dynamic_slice on VALUES,
    # but ref reads at 128-multiple lane offsets are fine
    rank2_s[:] = jnp.where(mask2 > 0.0, incl2 - mask2,
                           jnp.float32(S2))            # [Q, 1, 8S]
    if ablate == "fine_fgm":   # measurement: stop after fgm+radix+ranks
        out_s_ref[:] = jnp.zeros_like(out_s_ref)
        out_i_ref[:] = jnp.zeros_like(out_i_ref)
        flag_ref[:] = count2[:1, :, 0] * 0.0
        return

    # second compaction: fori so chunk temporaries are reused; the
    # same augmented-row trick folds the rid pieces into the ONE
    # dot: rows 8..11 carry khi, klo, occupancy and chunk weight
    s2_iota = jax.lax.broadcasted_iota(
        jnp.int32, (Qn, S_SLOTS, S2), 2)
    khi_a = jnp.floor(kid2d * (1.0 / 256.0))           # [Q, 1, S]
    klo_a = kid2d - 256.0 * khi_a
    ones_a = jnp.ones((Qn, 1, S_SLOTS), jnp.float32)

    def chunk(ch, out2a):
        r2c = rank2_s[:, :, pl.ds(ch * S_SLOTS, S_SLOTS)]
        sel2b = (jnp.transpose(r2c, (0, 2, 1)).astype(jnp.int32)
                 == s2_iota).astype(jnp.bfloat16)      # [Q, S, S2]
        xc = jnp.where(valid_r, cand[pl.ds(0, Qn),
                                     pl.ds(ch * 8, 8), :], SENT)
        h2, m2, l2 = _split3_bf16(xc)
        chrow = ch.astype(jnp.float32) + jnp.zeros(
            (Qn, 1, S_SLOTS), jnp.float32)
        if stack:
            # limbs stacked along SUBLANES: [Q, 32, S] x [Q, S, S2] is
            # ONE MXU pass per q-chunk (the contraction-concat form pads
            # each of its 3 blocks to a pass); limb sums move to the
            # tiny [Q, 8, S2] outputs
            aug2 = jnp.concatenate(
                [khi_a, klo_a, ones_a, chrow,
                 jnp.zeros((Qn, 4, S_SLOTS), jnp.float32)],
                axis=1).astype(jnp.bfloat16)           # [Q, 8, S]
            x2s = jnp.concatenate([h2, m2, l2, aug2], axis=1)
            o3 = jax.lax.dot_general(
                x2s, sel2b, dimension_numbers=dn,
                preferred_element_type=jnp.float32)    # [Q, 32, S2]
            vals = o3[:, :8, :] + o3[:, 8:16, :] + o3[:, 16:24, :]
            return out2a + jnp.concatenate(
                [vals, o3[:, 24:32, :]], axis=1)
        aug2 = jnp.concatenate(
            [khi_a, klo_a, ones_a, chrow,
             jnp.zeros((Qn, 4, S_SLOTS), jnp.float32)],
            axis=1).astype(jnp.bfloat16)               # [Q, 8, S]
        zp2 = jnp.zeros((Qn, 8, S_SLOTS), jnp.bfloat16)
        x2 = jnp.concatenate(
            [jnp.concatenate([h2, aug2], axis=1),
             jnp.concatenate([m2, zp2], axis=1),
             jnp.concatenate([l2, zp2], axis=1)], axis=2)
        sel23 = jnp.concatenate([sel2b] * 3, axis=1)   # [Q, 3S, S2]
        return out2a + jax.lax.dot_general(
            x2, sel23, dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    out2a = jax.lax.fori_loop(
        0, 8, chunk, jnp.zeros((Qn, 16, S2), jnp.float32))
    if ablate == "fine_chunk":   # measurement: stop after 2nd compaction
        out_s_ref[:] = (jnp.zeros_like(out_s_ref)
                        + out2a[:, 0:1, :out_s_ref.shape[2]] * 0.0)
        out_i_ref[:] = jnp.zeros_like(out_i_ref)
        flag_ref[:] = out2a[:1, 0:1, 0] * 0.0
        return
    out2 = out2a[:, :8, :]
    kidc = (256.0 * out2a[:, 8:9, :] + out2a[:, 9:10, :])
    occ = out2a[:, 10:11, :]
    chw = out2a[:, 11:12, :]
    c2b = (jax.lax.broadcasted_iota(jnp.int32, (Qn, 8, S2), 1)
           .astype(jnp.float32))
    ridc = (64.0 * kidc + 8.0 * chw) * occ + c2b * (
        occ + jnp.zeros((Qn, 1, S2), jnp.float32))
    s2r = jax.lax.broadcasted_iota(jnp.int32, (Qn, 1, S2), 2)
    valid2_r = s2r.astype(jnp.float32) < count2
    out2 = jnp.where(valid2_r, out2, SENT)
    over = jnp.maximum(count - float(S_SLOTS),
                       count2[:, :, 0] - float(S2))    # [Q, 1]
    if xla_tail == "bitonic":
        # full in-kernel descending bitonic sort of the 1024 candidates:
        # the kernel emits [Q, 1, 128] sorted scores/ids directly, killing
        # the XLA tail's ~0.1 ms of tiny-op launch overhead
        ks, rs = _bitonic_desc_1024(out2, ridc, Qn)
        out_s_ref[:] = ks[:, 0:1, :]
        out_i_ref[:] = rs[:, 0:1, :].astype(jnp.int32)
        flag_ref[:] = jnp.max(over, axis=0, keepdims=True)
        return
    if xla_tail:
        # export the [Q, 8, S2] compacted candidates + row ids; the
        # caller's lax.top_k over 8*S2 lanes replaces the serial
        # in-kernel extraction (k fori iterations of reduce+mask)
        out_s_ref[:] = out2
        out_i_ref[:] = ridc.astype(jnp.int32)
        flag_ref[:] = jnp.max(over, axis=0, keepdims=True)
        return
    s2l = jax.lax.broadcasted_iota(jnp.int32, (Qn, 8, S2), 2)

    # iterative top-k extraction (lowest flat position on ties)
    pos = (jax.lax.broadcasted_iota(jnp.int32, (Qn, 8, S2), 1) * S2
           + s2l)
    kl = jax.lax.broadcasted_iota(jnp.int32, (Qn, 1, out_s_ref.shape[2]), 2)

    def ext(j, carry):
        o2, rs, ri = carry
        m1 = jnp.max(o2, axis=1, keepdims=True)
        m = jnp.max(m1, axis=2, keepdims=True)         # [Q, 1, 1]
        # (o2 == m) decomposed so no op broadcasts both axes:
        # column holds the max AND element equals the column max
        hit = (o2 == m1) & (m1 == m)
        p1 = jnp.min(jnp.where(hit, pos, jnp.int32(1 << 30)),
                     axis=1, keepdims=True)
        p = jnp.min(p1, axis=2, keepdims=True)         # [Q, 1, 1]
        at = (pos == p1) & (p1 == p) & (m1 == m)
        rv1 = jnp.sum(jnp.where(at, ridc, 0.0), axis=1,
                      keepdims=True)
        rv = jnp.sum(rv1, axis=2, keepdims=True)       # [Q, 1, 1]
        sel_j = kl == j
        rs = jnp.where(sel_j, m, rs)
        ri = jnp.where(sel_j, rv, ri)
        o2 = jnp.where(at, SENT, o2)
        return o2, rs, ri

    rs0 = jnp.full((Qn, 1, out_s_ref.shape[2]), SENT, jnp.float32)
    ri0 = jnp.zeros((Qn, 1, out_s_ref.shape[2]), jnp.float32)
    _, rs, ri = jax.lax.fori_loop(0, k, ext, (out2, rs0, ri0))
    out_s_ref[:] = rs
    out_i_ref[:] = ri.astype(jnp.int32)
    flag_ref[:] = jnp.max(over, axis=0, keepdims=True)


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "interpret", "xla_tail",
                                    "ablate"))
def select_sweep(queries, base, bmax, eps, k, metric, interpret=False,
                 xla_tail=True, ablate=""):
    """Exact top-k from (bmax, eps) candidates + one fp32 base sweep.

    queries f32[Qn, D] (pow2-padded), base f32[N, D] (invalid rows zeroed),
    bmax f32[N/64, Qn] from sweep_bmax / sweep_bmax_sq8, eps f32[Qn, 1]
    (0 when bmax is exact; the certified score-error bound otherwise).
    xla_tail=True (default): the kernel exports the compacted [Qn, 8, S2]
    candidate scores + row ids and the caller's tiny lax.top_k finishes —
    the serial in-kernel extraction (k fori rounds) costs more than one
    XLA top_k over 8*S2 lanes. Returns (scores, ids, flag f32[1,1]);
    flag > 0 => slot overflow, caller must rerun the v1 path. Scores are
    the uncorrected s_t form (L2: 2 q.b - |b|^2)."""
    n, d = base.shape
    Qn = queries.shape[0]
    kpad = 128
    oshape = (Qn, 8, S2) if xla_tail is True else (Qn, 1, kpad)
    return pl.pallas_call(
        _make_select_kernel(n, k, metric, Qn, xla_tail, ablate),
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
            pl.BlockSpec(oshape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(oshape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(oshape, jnp.float32),
            jax.ShapeDtypeStruct(oshape, jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n // BLK, Qn), jnp.float32),   # rank_gq
            pltpu.VMEM((Qn, 1), jnp.float32),          # count_s
            pltpu.VMEM((Qn, BLK + 8, S_SLOTS), jnp.float32),  # cand (+ids)
            pltpu.VMEM((Qn, 1, 8 * S_SLOTS), jnp.float32),  # rank2_s
        ],
        # the one-kernel design trades scratch residency for zero HBM
        # round-trips; the default 16 MB scoped-vmem limit is a compiler
        # knob, not the physical size — raise it (v5e VMEM is far larger)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )(queries, eps, bmax, base)


# ---------------------------------------------------------------------------
# v3: ONE sweep — scores live in VMEM scratch, selection reads them back
# ---------------------------------------------------------------------------

def _make_onesweep_kernel(n, k, metric, Qn, xla_tail, chunk_tiles,
                          park="limb", ablate='', bits=32):
    G = n // BLK
    n_tiles = n // TILE
    kb = float(min(k + MARGIN, G))
    kf = float(min(k + MARGIN, 8 * S_SLOTS))
    CR = BLK + 8
    CG = GL * chunk_tiles          # blocks per compaction dot
    CT = TILE * chunk_tiles        # rows per compaction dot
    stack = park == "stack"

    def _kernel(q_ref, base_ref, out_s_ref, out_i_ref, flag_ref,
                hi_s, mid_s, lo_s, bmax_s, rank_gq, count_s, cand,
                rank2_s):
        i = pl.program_id(0)

        # ---- every step: score the tile ONCE; park it PRE-TRANSPOSED and
        # PRE-SPLIT (3 exact bf16 limbs) in scratch. The transpose + limb
        # split measured as the bulk of the final-phase compaction cost;
        # here they hide under the tile DMA (sweep had ~0.04 ms headroom)
        s_t = _scores_tile(base_ref[:], q_ref[:], metric)      # [T, Q]
        bmax_s[pl.ds(i * GL, GL), :] = jnp.max(
            s_t.reshape(GL, BLK, Qn), axis=1)                  # [GL, Q]
        tr = jnp.transpose(s_t.reshape(GL, BLK, Qn), (2, 1, 0))
        hi, mid, lo = _split3_bf16(tr)                         # [Q, c, GL]
        if stack:
            hi_s[:, :, pl.ds(i * GL, GL)] = jnp.concatenate(
                [hi, mid, lo], axis=1)                         # [Q, 3c, GL]
        else:
            hi_s[:, :, pl.ds(i * GL, GL)] = hi
            mid_s[:, :, pl.ds(i * GL, GL)] = mid
            lo_s[:, :, pl.ds(i * GL, GL)] = lo

        # ---- last step: the whole selection, zero extra HBM traffic
        @pl.when(i == n_tiles - 1)
        def _():
            if ablate == "sweep":      # measurement ablation: sweep only
                out_s_ref[:] = jnp.zeros_like(out_s_ref)
                out_i_ref[:] = jnp.zeros_like(out_i_ref)
                flag_ref[:] = bmax_s[:1, :1] * 0.0
                return
            bm = bmax_s[:].T                                   # [Q, G]
            tau = _radix_kth(bm, kb, axis=1, bits=bits)        # [Q, 1]
            # eps = 0: bmax came from the SAME s_t values the compaction
            # re-reads (single sweep -> no cross-sweep rounding at all)
            # (coarser bits only LOWER tau -> admit extra blocks; still
            # exact, overflow guarded by the flag)
            mask = jnp.where((bm >= tau) & (bm > SENT_HALF), 1.0, 0.0)
            incl = _prefix_lanes(mask, axis=1)
            count_s[:] = incl[:, G - 1:G]
            rank = jnp.where(mask > 0.0, incl - mask,
                             jnp.float32(S_SLOTS))
            rank_gq[:] = rank.T                                # [G, Q]

            dn = (((2,), (1,)), ((0,), (0,)))
            s_iota = jax.lax.broadcasted_iota(
                jnp.int32, (Qn, CG, S_SLOTS), 2)

            def comp(t, acc):
                # limbs are pre-transposed/pre-split by the sweep phase;
                # THREE dots share ONE sel_b (the compaction measured
                # VPU-bound on operand construction, not dot-issue-bound)
                rk = rank_gq[pl.ds(t * CG, CG), :].T           # [Q, CG]
                sel_b = (rk[:, :, None].astype(jnp.int32)
                         == s_iota).astype(jnp.bfloat16)       # [Q, CG, S]
                gid = ((t * CG).astype(jnp.float32)
                       + jax.lax.broadcasted_iota(
                           jnp.int32, (Qn, 1, CG), 2).astype(jnp.float32))
                ghi = jnp.floor(gid * (1.0 / 256.0))           # <= 7
                glo = gid - 256.0 * ghi                        # <= 255
                if stack:
                    # sublane-stacked limbs: ONE [Q, 3c+2, CG] x
                    # [Q, CG, S] dot (2 MXU passes per q-chunk vs 3)
                    stk = hi_s[:, :, pl.ds(t * CG, CG)]        # [Q, 3c, CG]
                    aug2 = jnp.concatenate(
                        [ghi, glo], axis=1).astype(jnp.bfloat16)
                    xs = jnp.concatenate([stk, aug2], axis=1)
                    o3 = jax.lax.dot_general(
                        xs, sel_b, dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
                    out = (o3[:, :BLK, :] + o3[:, BLK:2 * BLK, :]
                           + o3[:, 2 * BLK:3 * BLK, :])
                    out = jnp.concatenate(
                        [out, o3[:, 3 * BLK:, :],
                         jnp.zeros((Qn, CR - BLK - 2, S_SLOTS),
                                   jnp.float32)], axis=1)
                    return acc + out
                hi = hi_s[:, :, pl.ds(t * CG, CG)]             # [Q, c, CG]
                mid = mid_s[:, :, pl.ds(t * CG, CG)]
                lo = lo_s[:, :, pl.ds(t * CG, CG)]
                aug = jnp.concatenate(
                    [ghi, glo, jnp.zeros((Qn, CR - BLK - 2, CG),
                                         jnp.float32)],
                    axis=1).astype(jnp.bfloat16)
                hi_aug = jnp.concatenate([hi, aug], axis=1)    # [Q, CR, CG]
                out = jax.lax.dot_general(
                    hi_aug, sel_b, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                ml = jax.lax.dot_general(
                    mid, sel_b, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                ml += jax.lax.dot_general(
                    lo, sel_b, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                out += jnp.concatenate(
                    [ml, jnp.zeros((Qn, CR - BLK, S_SLOTS), jnp.float32)],
                    axis=1)
                return acc + out

            cand[:] = jax.lax.fori_loop(
                0, n_tiles // chunk_tiles, comp,
                jnp.zeros((Qn, CR, S_SLOTS), jnp.float32))
            if ablate == "nofine":     # ablation: skip the fine stage
                out_s_ref[:] = jnp.zeros_like(out_s_ref)
                out_i_ref[:] = jnp.zeros_like(out_i_ref)
                flag_ref[:] = count_s[:1, :1] * 0.0
                return
            _fine_emit(cand, count_s, rank2_s, out_s_ref, out_i_ref,
                       flag_ref, k, kf, Qn, xla_tail, bits=bits,
                       stack=stack)

    return _kernel


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "interpret", "xla_tail",
                                    "chunk_tiles", "park", "ablate", "bits"))
def onesweep_select(queries, base, k, metric, interpret=False,
                    xla_tail=True, chunk_tiles=2, park="limb", ablate="",
                    bits=32):
    """Exact top-k in ONE base read: every tile's scores are parked in a
    [N, Qn] f32 VMEM scratch (the 100 MB scoped-vmem knob makes the
    131072 x 64 bench shape's 33.5 MB resident), and the final grid step
    runs threshold + compaction + fine select entirely from scratch.
    Versus v2 this removes sweep B's base re-read, its score recompute,
    and one kernel launch. Same output contract as select_sweep."""
    if park not in ("limb", "stack"):   # v4-only park modes (bytes/f32)
        park = "limb"
    n, d = base.shape
    Qn = queries.shape[0]
    kpad = 128
    oshape = (Qn, 8, S2) if xla_tail is True else (Qn, 1, kpad)
    G = n // BLK
    if park == "stack":
        park_shapes = [
            pltpu.VMEM((Qn, 3 * BLK, G), jnp.bfloat16),  # hi|mid|lo
            pltpu.VMEM((8, 8, 128), jnp.bfloat16),     # unused
            pltpu.VMEM((8, 8, 128), jnp.bfloat16)]     # unused
    else:
        park_shapes = [
            pltpu.VMEM((Qn, BLK, G), jnp.bfloat16),    # hi_s
            pltpu.VMEM((Qn, BLK, G), jnp.bfloat16),    # mid_s
            pltpu.VMEM((Qn, BLK, G), jnp.bfloat16)]    # lo_s
    return pl.pallas_call(
        _make_onesweep_kernel(n, k, metric, Qn, xla_tail, chunk_tiles,
                              park, ablate, bits),
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((Qn, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(oshape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(oshape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(oshape, jnp.float32),
            jax.ShapeDtypeStruct(oshape, jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=park_shapes + [
            pltpu.VMEM((G, Qn), jnp.float32),          # bmax_s
            pltpu.VMEM((G, Qn), jnp.float32),          # rank_gq
            pltpu.VMEM((Qn, 1), jnp.float32),          # count_s
            pltpu.VMEM((Qn, BLK + 8, S_SLOTS), jnp.float32),  # cand
            pltpu.VMEM((Qn, 1, 8 * S_SLOTS), jnp.float32),    # rank2_s
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )(queries, base)


@functools.partial(jax.jit, static_argnames=("k", "metric", "interpret",
                                             "chunk_tiles", "tail", "park",
                                             "bits"))
def knn_scan_fused_v3(queries, base, k, metric, interpret=False,
                      chunk_tiles=2, tail="bitonic", park="limb", bits=32):
    """Exact top-k, ONE base sweep, selection entirely in VMEM. Same
    result contract as knn_scan_fused_v2 (scores higher-better, -inf/-1
    padded, overflow flag). tail: "xla" exports 1024 compacted candidates
    for a lax.top_k outside; "bitonic" sorts them in-kernel and emits
    [Q, 128] directly."""
    qf = _pad_queries(queries)
    s3, i3, flag = onesweep_select(qf, base, k, metric, interpret,
                                   xla_tail=(True if tail == "xla"
                                             else tail),
                                   chunk_tiles=chunk_tiles, park=park,
                                   bits=bits)
    corr = (-jnp.sum(qf * qf, axis=1, keepdims=True)[:, :1]
            if metric == VectorMetric.L2 else jnp.float32(0.0))
    return _finish_v2(s3, i3, flag, k, queries.shape[0], corr)


V3_SCRATCH_BUDGET = 72 * 1024 * 1024   # limb scratch cap (3 bf16 limb
#                                        arrays = 6 bytes per score):
#                                        leaves room for base tiles +
#                                        compaction operands under the
#                                        110 MB limit


def v3_available(n: int, dims: int, k: int, n_queries: int) -> bool:
    """Geometry gate for the one-sweep path: v2's gate plus the scores
    scratch must fit VMEM alongside the compaction operands."""
    import os
    if os.environ.get("RX_TPU_FUSED_V3", "") in ("0", "false"):
        return False
    if not v2_available(n, dims, k, n_queries):
        return False
    Qn = 8
    while Qn < n_queries:
        Qn *= 2
    return n * Qn * 6 <= V3_SCRATCH_BUDGET


# ---------------------------------------------------------------------------
# SQ8 v3: ONE twin-phase kernel — codes sweep (1/4 bytes) for thresholds,
# fp32 sweep for exact compaction, fine+emit; no inter-kernel round trip
# ---------------------------------------------------------------------------

def _make_twinsweep_sq8_kernel(n, k, metric, Qn, xla_tail, bits=32):
    G = n // BLK
    n_tiles = n // TILE
    kb = float(min(k + MARGIN, G))
    kf = float(min(k + MARGIN, 8 * S_SLOTS))
    CR = BLK + 8
    l2 = metric == VectorMetric.L2

    def _kernel(q_ref, eps_ref, qa_ref, shift_ref, codes_ref, sqe_ref,
                base_ref, out_s_ref, out_i_ref, flag_ref,
                bmax_s, rank_gq, count_s, cand, rank2_s):
        i = pl.program_id(0)

        # ---- phase 0 (i < n_tiles): quantized bmax from the uint8 codes
        @pl.when(i < n_tiles)
        def _():
            c = codes_ref[:].astype(jnp.int32).astype(jnp.float32)
            dots_t = _dot2(c, qa_ref[:])                       # [T, Q]
            s_t = (2.0 * dots_t if l2 else dots_t) - sqe_ref[:]
            s_t = jnp.maximum(s_t + shift_ref[:], SENT)
            bmax_s[pl.ds(i * GL, GL), :] = jnp.max(
                s_t.reshape(GL, BLK, Qn), axis=1)              # [GL, Q]

        # ---- phase boundary: eps-widened threshold + global block ranks
        @pl.when(i == n_tiles - 1)
        def _():
            bm = bmax_s[:].T                                   # [Q, G]
            tau = _radix_kth(bm, kb, axis=1, bits=bits)        # [Q, 1]
            mask = jnp.where(
                (bm >= tau - eps_ref[:]) & (bm > SENT_HALF), 1.0, 0.0)
            incl = _prefix_lanes(mask, axis=1)
            count_s[:] = incl[:, G - 1:G]
            rank = jnp.where(mask > 0.0, incl - mask,
                             jnp.float32(S_SLOTS))
            rank_gq[:] = rank.T                                # [G, Q]
            cand[:] = jnp.zeros_like(cand)

        # ---- phase 1 (i >= n_tiles): EXACT fp32 scores + rank-one-hot
        # compaction, overlapped with the base DMA (v2 sweep B fused in)
        @pl.when(i >= n_tiles)
        def _():
            t = i - n_tiles
            s_t = _scores_tile(base_ref[:], q_ref[:], metric)  # [T, Q]
            x = jnp.transpose(s_t.reshape(GL, BLK, Qn), (2, 1, 0))
            rk = rank_gq[pl.ds(t * GL, GL), :].T               # [Q, GL]
            s_iota = jax.lax.broadcasted_iota(
                jnp.int32, (Qn, GL, S_SLOTS), 2)
            sel_b = (rk[:, :, None].astype(jnp.int32) == s_iota).astype(
                jnp.bfloat16)                                  # [Q, GL, S]
            dn = (((2,), (1,)), ((0,), (0,)))
            hi, mid, lo = _split3_bf16(x)
            gid = ((t * GL).astype(jnp.float32)
                   + jax.lax.broadcasted_iota(jnp.int32, (Qn, 1, GL), 2
                                              ).astype(jnp.float32))
            ghi = jnp.floor(gid * (1.0 / 256.0))               # <= 7
            glo = gid - 256.0 * ghi                            # <= 255
            aug = jnp.concatenate([ghi, glo,
                                   jnp.zeros((Qn, CR - BLK - 2, GL),
                                             jnp.float32)],
                                  axis=1).astype(jnp.bfloat16)
            zpad = jnp.zeros((Qn, CR - BLK, GL), jnp.bfloat16)
            x3 = jnp.concatenate(
                [jnp.concatenate([hi, aug], axis=1),
                 jnp.concatenate([mid, zpad], axis=1),
                 jnp.concatenate([lo, zpad], axis=1)], axis=2)
            sel3 = jnp.concatenate([sel_b] * 3, axis=1)        # [Q, 3GL, S]
            cand[:] += jax.lax.dot_general(
                x3, sel3, dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        @pl.when(i == 2 * n_tiles - 1)
        def _():
            _fine_emit(cand, count_s, rank2_s, out_s_ref, out_i_ref,
                       flag_ref, k, kf, Qn, xla_tail, bits=bits)

    return _kernel


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "interpret", "xla_tail",
                                    "bits"))
def twinsweep_select_sq8(queries, eps, q_alpha, shift, codes, sq_eff, base,
                         k, metric, interpret=False, xla_tail=True,
                         bits=32):
    """Exact top-k at SQ8 threshold cost in ONE kernel: the first n_tiles
    grid steps sweep the uint8 codes (1/4 the HBM bytes) into quantized
    block maxima; the boundary step radix-selects the eps-widened block
    threshold; the remaining steps sweep the fp32 base, compacting kept
    blocks' EXACT scores with the rank-one-hot contraction (overlapped
    with the base DMA). Versus the v2 pair (sweep_bmax_sq8 + select_sweep)
    this removes one kernel launch and the bmax HBM round trip."""
    n, d = base.shape
    Qn = queries.shape[0]
    kpad = 128
    oshape = (Qn, 8, S2) if xla_tail is True else (Qn, 1, kpad)
    G = n // BLK
    n_tiles = n // TILE
    return pl.pallas_call(
        _make_twinsweep_sq8_kernel(n, k, metric, Qn, xla_tail, bits),
        grid=(2 * n_tiles,),
        in_specs=[
            pl.BlockSpec((Qn, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Qn, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Qn, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda i: (jnp.minimum(i, n_tiles - 1),
                                               0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (jnp.minimum(i, n_tiles - 1),
                                               0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda i: (jnp.maximum(i - n_tiles, 0),
                                               0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(oshape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(oshape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(oshape, jnp.float32),
            jax.ShapeDtypeStruct(oshape, jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, Qn), jnp.float32),          # bmax_s
            pltpu.VMEM((G, Qn), jnp.float32),          # rank_gq
            pltpu.VMEM((Qn, 1), jnp.float32),          # count_s
            pltpu.VMEM((Qn, BLK + 8, S_SLOTS), jnp.float32),  # cand
            pltpu.VMEM((Qn, 1, 8 * S_SLOTS), jnp.float32),    # rank2_s
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )(queries, eps, q_alpha, shift, codes, sq_eff[:, None], base)


# ---------------------------------------------------------------------------
# v4: software-pipelined batches — selection of batch r-1 interleaved with
# the sweep of batch r inside ONE kernel (single limb buffer)
# ---------------------------------------------------------------------------

def _make_pipelined_kernel(n, k, metric, Qn, R, bits, xla_tail, park,
                           ablate='', ct=1, sq8=False):
    G = n // BLK
    n_tiles = n // TILE
    kb = float(min(k + MARGIN, G))
    kf = float(min(k + MARGIN, 8 * S_SLOTS))
    CR = BLK + 8
    f32_park = park == "f32"

    bytes_park = park == "bytes"

    def _body(i, score_tile, out_s_ref, out_i_ref, flag_ref,
              hi_s, mid_s, lo_s, bmax_s, rank_gq, count_s, cand,
              rank2_s, flag_acc, flag_tmp):
        r = i // n_tiles
        t = i % n_tiles
        # bytes park: mid_s doubles as the i32 byte-plane accumulator
        # [Qn, 4*BLK + 8, S_SLOTS] (4 value planes + ghi/glo/occ rows)
        candb = mid_s

        @pl.when(i == 0)
        def _():
            flag_acc[:] = jnp.zeros_like(flag_acc)

        # ---- selection of batch r-1 FIRST: compaction chunk t consumes
        # limb tile t before this step's sweep overwrites it (same-ref
        # program order is a real dependency for Mosaic)
        if ablate not in ("sweep", "sweepnt"):
            @pl.when(r >= 1)
            def _():
                @pl.when(t == 0)
                def _():
                    prev = jnp.remainder(r - 1, 2)
                    bm = bmax_s[pl.ds(prev * G, G), :].T       # [Q, G]
                    tau = _radix_kth(bm, kb, axis=1, bits=bits)
                    mask = jnp.where((bm >= tau) & (bm > SENT_HALF),
                                     1.0, 0.0)
                    incl = _prefix_lanes(mask, axis=1)
                    count_s[:] = incl[:, G - 1:G]
                    rank = jnp.where(mask > 0.0, incl - mask,
                                     jnp.float32(S_SLOTS))
                    rank_gq[:] = rank.T                        # [G, Q]
                    if bytes_park:
                        candb[:] = jnp.zeros_like(candb)
                    else:
                        cand[:] = jnp.zeros_like(cand)

                if ablate != "thresh" and park == "stack" and ct > 1:
                    # compaction SUPER-CHUNKS: one dot per ct tiles
                    # (contraction ct*GL instead of GL) amortizes MXU
                    # pass overheads; memory-safe under the same
                    # overwrite discipline — at step (r, t=ct*c) the
                    # selection consumes limb lanes [t*GL, (t+ct)*GL) of
                    # batch r-1 BEFORE the sweeps of steps t..t+ct-1
                    # overwrite them one tile at a time
                    @pl.when(jnp.remainder(t, ct) == 0)
                    def _():
                        CTL = ct * GL
                        dn = (((2,), (1,)), ((0,), (0,)))
                        stk = hi_s[:, :, pl.ds(t * GL, CTL)]   # [Q,*,CTL]
                        rk = rank_gq[pl.ds(t * GL, CTL), :].T  # [Q, CTL]
                        s_iota = jax.lax.broadcasted_iota(
                            jnp.int32, (Qn, CTL, S_SLOTS), 2)
                        sel_b = (rk[:, :, None].astype(jnp.int32)
                                 == s_iota).astype(jnp.bfloat16)
                        gid = ((t * GL).astype(jnp.float32)
                               + jax.lax.broadcasted_iota(
                                   jnp.int32, (Qn, 1, CTL), 2).astype(
                                       jnp.float32))
                        ghi = jnp.floor(gid * (1.0 / 256.0))   # <= 7
                        glo = gid - 256.0 * ghi                # <= 255
                        aug2 = jnp.concatenate(
                            [ghi, glo], axis=1).astype(jnp.bfloat16)
                        xs = jnp.concatenate([stk, aug2], axis=1)
                        o3 = jax.lax.dot_general(
                            xs, sel_b, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
                        out = (o3[:, :BLK, :] + o3[:, BLK:2 * BLK, :]
                               + o3[:, 2 * BLK:3 * BLK, :])
                        out = jnp.concatenate(
                            [out, o3[:, 3 * BLK:, :],
                             jnp.zeros((Qn, CR - BLK - 2, S_SLOTS),
                                       jnp.float32)], axis=1)
                        cand[:] += out
                elif ablate != "thresh":
                    dn = (((2,), (1,)), ((0,), (0,)))
                    s_iota = jax.lax.broadcasted_iota(
                        jnp.int32, (Qn, GL, S_SLOTS), 2)
                    if park in ("stack", "bytes"):
                        stk = hi_s[:, :, pl.ds(t * GL, GL)]    # [Q,*,GL]
                    elif f32_park:
                        # f32 scratch (4 B/score of VMEM traffic vs the
                        # 6 B limb layout); exact 3-limb split rebuilt
                        # in-register here
                        hi, mid, lo = _split3_bf16(
                            hi_s[:, :, pl.ds(t * GL, GL)])
                    else:
                        hi = hi_s[:, :, pl.ds(t * GL, GL)]     # [Q, c, GL]
                        mid = mid_s[:, :, pl.ds(t * GL, GL)]
                        lo = lo_s[:, :, pl.ds(t * GL, GL)]
                    rk = rank_gq[pl.ds(t * GL, GL), :].T       # [Q, GL]
                    sel_b = (rk[:, :, None].astype(jnp.int32)
                             == s_iota).astype(jnp.bfloat16)   # [Q, GL, S]
                    gid = ((t * GL).astype(jnp.float32)
                           + jax.lax.broadcasted_iota(
                               jnp.int32, (Qn, 1, GL), 2).astype(
                                   jnp.float32))
                    ghi = jnp.floor(gid * (1.0 / 256.0))       # <= 7
                    glo = gid - 256.0 * ghi                    # <= 255
                    if bytes_park:
                        # scores move as the FOUR i8 byte planes of the
                        # f32 bitcast (offset -128 into signed range):
                        # i32 accumulation is bit-exact — no limb splits
                        # at all — and the i8 MXU runs at 2x bf16 rate
                        u = pltpu.bitcast(stk, jnp.int32)      # [Q, c, GL]
                        planes = [
                            ((jnp.right_shift(u, 8 * kk) & jnp.int32(255))
                             - 128).astype(jnp.int8)
                            for kk in range(4)]
                        aug_i = jnp.concatenate(
                            [ghi.astype(jnp.int32).astype(jnp.int8),
                             (glo.astype(jnp.int32) - 128).astype(jnp.int8),
                             jnp.ones((Qn, 1, GL), jnp.int8)], axis=1)
                        xb = jnp.concatenate(planes + [aug_i], axis=1)
                        sel_i = (rk[:, :, None].astype(jnp.int32)
                                 == s_iota).astype(jnp.int8)   # [Q, GL, S]
                        o = jax.lax.dot_general(
                            xb, sel_i, dimension_numbers=dn,
                            preferred_element_type=jnp.int32)  # [Q,4c+3,S]
                        candb[:, 0:4 * BLK + 3, :] += o
                    elif park == "stack":
                        # limbs pre-stacked along SUBLANES: ONE dot of
                        # [Q, 3c+2, GL] x [Q, GL, S] = 2 MXU passes per
                        # q-tile instead of 3 (each separate limb dot
                        # pads its rows to a full pass); the limb sum
                        # happens on the [Q, c, S] outputs (VPU adds)
                        aug2 = jnp.concatenate(
                            [ghi, glo], axis=1).astype(jnp.bfloat16)
                        xs = jnp.concatenate([stk, aug2], axis=1)
                        if ablate == "nodot":
                            # measurement: full operand builds, the MXU
                            # dot + limb reduce replaced by one cheap
                            # elementwise combine (keeps builds live)
                            cand[:] += (xs[:, :CR, :S_SLOTS].astype(
                                jnp.float32)
                                * sel_b[:, :CR, :].astype(jnp.float32))
                        elif ablate == "eyesel":
                            # measurement: dot against a broadcast
                            # identity selector — removes the rank
                            # slice/transpose + one-hot compare build
                            eye = (jax.lax.broadcasted_iota(
                                jnp.int32, (1, GL, S_SLOTS), 1)
                                == jax.lax.broadcasted_iota(
                                    jnp.int32, (1, GL, S_SLOTS), 2)
                            ).astype(jnp.bfloat16)
                            sel_e = jnp.broadcast_to(
                                eye, (Qn, GL, S_SLOTS))
                            o3 = jax.lax.dot_general(
                                xs, sel_e, dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
                            out = (o3[:, :BLK, :] + o3[:, BLK:2 * BLK, :]
                                   + o3[:, 2 * BLK:3 * BLK, :])
                            out = jnp.concatenate(
                                [out, o3[:, 3 * BLK:, :],
                                 jnp.zeros((Qn, CR - BLK - 2, S_SLOTS),
                                           jnp.float32)], axis=1)
                            cand[:] += out
                        elif ablate == "noreduce":
                            # measurement: dot kept, limb-sum reduce +
                            # concat replaced by a direct slice accumulate
                            o3 = jax.lax.dot_general(
                                xs, sel_b, dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
                            cand[:] += o3[:, :CR, :]
                        else:
                            o3 = jax.lax.dot_general(
                                xs, sel_b, dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
                            out = (o3[:, :BLK, :] + o3[:, BLK:2 * BLK, :]
                                   + o3[:, 2 * BLK:3 * BLK, :])
                            out = jnp.concatenate(
                                [out, o3[:, 3 * BLK:, :],
                                 jnp.zeros((Qn, CR - BLK - 2, S_SLOTS),
                                           jnp.float32)], axis=1)
                            cand[:] += out
                    else:
                        aug = jnp.concatenate(
                            [ghi, glo, jnp.zeros((Qn, CR - BLK - 2, GL),
                                                 jnp.float32)],
                            axis=1).astype(jnp.bfloat16)
                        hi_aug = jnp.concatenate([hi, aug], axis=1)
                        out = jax.lax.dot_general(
                            hi_aug, sel_b, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
                        ml = jax.lax.dot_general(
                            mid, sel_b, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
                        ml += jax.lax.dot_general(
                            lo, sel_b, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
                        out += jnp.concatenate(
                            [ml, jnp.zeros((Qn, CR - BLK, S_SLOTS),
                                           jnp.float32)], axis=1)
                        cand[:] += out

                @pl.when(t == n_tiles - 1)
                def _():
                    if ablate in ("thresh", "compact"):
                        out_s_ref[:] = jnp.zeros_like(out_s_ref)
                        out_i_ref[:] = jnp.zeros_like(out_i_ref)
                        flag_tmp[:] = count_s[:1, :1] * 0.0
                    else:
                        if bytes_park:
                            # reassemble f32 bit-exactly from the byte
                            # planes (+128*occ undoes the signed offset;
                            # empty slots decode to 0.0 and are masked by
                            # the fine stage's slot<count predicate)
                            occ = candb[:, 4 * BLK + 2:4 * BLK + 3, :]
                            off = 128 * occ                    # [Q, 1, S]
                            b0 = candb[:, 0:BLK, :] + off
                            b1 = candb[:, BLK:2 * BLK, :] + off
                            b2 = candb[:, 2 * BLK:3 * BLK, :] + off
                            b3 = candb[:, 3 * BLK:4 * BLK, :] + off
                            val = (b0 | jnp.left_shift(b1, 8)
                                   | jnp.left_shift(b2, 16)
                                   | jnp.left_shift(b3, 24))
                            vf = pltpu.bitcast(val, jnp.float32)
                            ghi_o = candb[:, 4 * BLK:4 * BLK + 1, :]
                            glo_o = candb[:, 4 * BLK + 1:4 * BLK + 2,
                                          :] + off
                            cand[:] = jnp.concatenate(
                                [vf, ghi_o.astype(jnp.float32),
                                 glo_o.astype(jnp.float32),
                                 jnp.zeros((Qn, CR - BLK - 2, S_SLOTS),
                                           jnp.float32)], axis=1)
                        _fine_emit(cand, count_s, rank2_s, out_s_ref,
                                   out_i_ref, flag_tmp, k, kf, Qn,
                                   xla_tail, bits=bits,
                                   stack=(park in ("stack", "bytes")),
                                   ablate=ablate)
                    flag_acc[:] = jnp.maximum(flag_acc[:], flag_tmp[:])
        else:
            @pl.when((r >= 1) & (t == n_tiles - 1))
            def _():
                out_s_ref[:] = jnp.zeros_like(out_s_ref)
                out_i_ref[:] = jnp.zeros_like(out_i_ref)

        # ---- sweep of batch r (rounds 0..R-1): score tile t, park limbs
        @pl.when(r < R)
        def _():
            s_t = score_tile()                                 # [T, Q]
            cur = jnp.remainder(r, 2)
            bmax_s[pl.ds(cur * G + t * GL, GL), :] = jnp.max(
                s_t.reshape(GL, BLK, Qn), axis=1)              # [GL, Q]
            if ablate == "sweepnt":    # ablation: no transpose/park
                return
            tr = jnp.transpose(s_t.reshape(GL, BLK, Qn), (2, 1, 0))
            if f32_park or bytes_park:
                hi_s[:, :, pl.ds(t * GL, GL)] = tr
            elif park == "stack":
                hi, mid, lo = _split3_bf16(tr)                 # [Q, c, GL]
                hi_s[:, :, pl.ds(t * GL, GL)] = jnp.concatenate(
                    [hi, mid, lo], axis=1)                     # [Q, 3c, GL]
            else:
                hi, mid, lo = _split3_bf16(tr)                 # [Q, c, GL]
                hi_s[:, :, pl.ds(t * GL, GL)] = hi
                mid_s[:, :, pl.ds(t * GL, GL)] = mid
                lo_s[:, :, pl.ds(t * GL, GL)] = lo

        @pl.when(i == (R + 1) * n_tiles - 1)
        def _():
            flag_ref[:] = flag_acc[:]

    if sq8:
        # approx-SQ8 scoring: int8 codes x int8 quantized query on the MXU
        # (i8 pairs run at 2x bf16 rate), scaled per query and corrected by
        # the exact |b|^2 column. The integer dot is exact; the f32 scale
        # is a per-query monotone map, so the selection machinery (which is
        # exact for ANY f32 scores) returns the true top-k of the QUANTIZED
        # scores — the reference's approx SQ8 semantics (quantizer.h:11-75)
        def _kernel(qa_ref, sqsc_ref, base_ref, sqs_ref, *rest):
            def score_tile():
                di = jax.lax.dot_general(
                    base_ref[:], qa_ref[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)          # [T, Q]
                return jnp.maximum(
                    di.astype(jnp.float32) * sqsc_ref[0:1, :]
                    - sqs_ref[:], SENT)
            _body(pl.program_id(0), score_tile, *rest)
    else:
        def _kernel(q_ref, base_ref, *rest):
            def score_tile():
                return _scores_tile(base_ref[:], q_ref[:], metric)
            _body(pl.program_id(0), score_tile, *rest)
    return _kernel


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "interpret", "bits",
                                    "xla_tail", "park", "ablate", "ct"))
def pipelined_select(queries, base, k, metric, interpret=False, bits=32,
                     xla_tail="bitonic", park="limb", ablate="", ct=1):
    """Exact top-k for R query batches in ONE kernel launch: round r's
    sweep (tile DMA + scoring + limb parking) runs while round r's
    selection steps consume batch r-1's parked limbs chunk-by-chunk —
    compaction chunk t reads limb tile t immediately before the sweep
    overwrites it, so one limb buffer serves all batches and the sweep's
    HBM time hides entirely under selection compute (drain round R runs
    the last batch's selection alone).

    queries f32[R, Qn, D] (Qn pow2-padded), base f32[N, D] (invalid rows
    zeroed). Returns (scores [R, Qn, ...], ids, flag f32[1,1] max over
    batches). Same per-batch contract as onesweep_select."""
    R, Qn, d = queries.shape
    n = base.shape[0]
    if ct > 1:
        assert park == "stack", "ct>1 implemented for stack park only"
        assert (n // TILE) % ct == 0, "ct must divide n_tiles"
    kpad = 128
    oshape = (Qn, 8, S2) if xla_tail is True else (Qn, 1, kpad)
    full_o = (R * Qn,) + oshape[1:]
    G = n // BLK
    n_tiles = n // TILE

    def q_idx(i):
        return (jnp.minimum(i // n_tiles, R - 1), 0)

    def b_idx(i):
        return (jnp.where(i // n_tiles >= R, n_tiles - 1, i % n_tiles), 0)

    def o_idx(i):
        return (jnp.maximum(i // n_tiles, 1) - 1, 0, 0)

    f32_park = park == "f32"
    if f32_park:
        park_shapes = [
            pltpu.VMEM((Qn, BLK, G), jnp.float32),     # scores (f32 park)
            pltpu.VMEM((8, 8, 128), jnp.bfloat16),     # unused
            pltpu.VMEM((8, 8, 128), jnp.bfloat16)]     # unused
    elif park == "bytes":
        park_shapes = [
            pltpu.VMEM((Qn, BLK, G), jnp.float32),     # scores (f32 park)
            pltpu.VMEM((Qn, 4 * BLK + 8, S_SLOTS),
                       jnp.int32),                     # byte-plane accum
            pltpu.VMEM((8, 8, 128), jnp.bfloat16)]     # unused
    elif park == "stack":
        park_shapes = [
            pltpu.VMEM((Qn, 3 * BLK, G), jnp.bfloat16),  # hi|mid|lo
            pltpu.VMEM((8, 8, 128), jnp.bfloat16),     # unused
            pltpu.VMEM((8, 8, 128), jnp.bfloat16)]     # unused
    else:
        park_shapes = [
            pltpu.VMEM((Qn, BLK, G), jnp.bfloat16),    # hi_s
            pltpu.VMEM((Qn, BLK, G), jnp.bfloat16),    # mid_s
            pltpu.VMEM((Qn, BLK, G), jnp.bfloat16)]    # lo_s
    outs = pl.pallas_call(
        _make_pipelined_kernel(n, k, metric, Qn, R, bits, xla_tail, park,
                               ablate, ct=ct),
        grid=((R + 1) * n_tiles,),
        in_specs=[
            pl.BlockSpec((Qn, d), q_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), b_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(oshape, o_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(oshape, o_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(full_o, jnp.float32),
            jax.ShapeDtypeStruct(full_o, jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=park_shapes + [
            pltpu.VMEM((2 * G, Qn), jnp.float32),      # bmax_s (ping-pong)
            pltpu.VMEM((G, Qn), jnp.float32),          # rank_gq
            pltpu.VMEM((Qn, 1), jnp.float32),          # count_s
            pltpu.VMEM((Qn, BLK + 8, S_SLOTS), jnp.float32),  # cand
            pltpu.VMEM((Qn, 1, 8 * S_SLOTS), jnp.float32),    # rank2_s
            pltpu.VMEM((1, 1), jnp.float32),           # flag_acc
            pltpu.VMEM((1, 1), jnp.float32),           # flag_tmp
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )(queries.reshape(R * Qn, d), base)
    s3, i3, flag = outs
    return (s3.reshape((R,) + oshape), i3.reshape((R,) + oshape), flag)


@functools.partial(jax.jit, static_argnames=("k", "metric", "interpret",
                                             "bits", "tail", "park",
                                             "ablate", "ct"))
def knn_scan_fused_v4(queries, base, k, metric, interpret=False, bits=32,
                      tail="bitonic", park="limb", ablate="", ct=1):
    """Exact top-k for a [R, Qb, D] stack of query batches, pipelined
    through ONE kernel launch (see pipelined_select). Same per-batch
    result contract as knn_scan_fused_v3; flag is the max over batches
    (one overflow reruns the whole group — overflow is the rare rung).
    Returns (scores [R, Qb, k], ids [R, Qb, k], flag)."""
    R, Qb, d = queries.shape
    qf = jax.vmap(_pad_queries)(queries)                  # [R, Qn, D]
    s3, i3, flag = pipelined_select(
        qf, base, k, metric, interpret, bits=bits,
        xla_tail=(True if tail == "xla" else tail), park=park,
        ablate=ablate, ct=ct)
    corr = (-jnp.sum(qf * qf, axis=2, keepdims=True)[:, :, :1]
            if metric == VectorMetric.L2 else
            jnp.zeros((R, qf.shape[1], 1), jnp.float32))
    if s3.shape[2] == 8:               # xla tail: compacted [R, Q, 8, S2]
        Qn = s3.shape[1]
        flat = s3.reshape(R, Qn, 8 * S2)
        rid = i3.reshape(R, Qn, 8 * S2)
        s, pos = jax.lax.top_k(flat, k)
        ids = jnp.take_along_axis(rid, pos, axis=2)
    else:
        s = s3[:, :, 0, :k]
        ids = i3[:, :, 0, :k]
    ids = jnp.where(s > SENT_HALF, ids, -1)
    s = jnp.where(ids >= 0, s + corr, -jnp.inf)
    return s[:, :Qb], ids[:, :Qb], flag[0, 0]


def v4_available(n: int, dims: int, k: int, n_queries: int) -> bool:
    """Geometry gate for the pipelined path (per-batch width)."""
    import os
    if os.environ.get("RX_TPU_FUSED_V4", "") in ("0", "false"):
        return False
    return v3_available(n, dims, k, n_queries)


# ---------------------------------------------------------------------------
# v4-sq8 APPROX: the pipelined kernel over int8 codes only — 1/4 the HBM
# bytes, i8 MXU scoring, NO fp32 pass, NO eps ladder (VERDICT r4 #2: the
# reference's SQ8 exists to LOWER search cost, float_vector.md:291)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "interpret", "bits",
                                    "xla_tail", "park"))
def pipelined_select_sq8(qa_i8, sqscale, codes_i8, sqs, k, metric,
                         interpret=False, bits=RADIX_BITS,
                         xla_tail="bitonic", park="stack"):
    """pipelined_select over uint8 codes with int8-quantized queries:
    qa_i8 i8[R, Qn, D] (round(q*alpha / s_q)), sqscale f32[R, Qn]
    (fac * s_q per query), codes_i8 i8[N, D] (codes - 128), sqs f32[N, 1]
    (exact |b|^2 / +big invalid). Scores = fac*s_q*(qa_i8 . codes_i8) - sqs
    — the quantized-score ranking, selected exactly by the shared limb
    machinery. Returns (scores [R, Qn, ...], ids, flag)."""
    R, Qn, d = qa_i8.shape
    n = codes_i8.shape[0]
    kpad = 128
    oshape = (Qn, 8, S2) if xla_tail is True else (Qn, 1, kpad)
    full_o = (R * Qn,) + oshape[1:]
    G = n // BLK
    n_tiles = n // TILE

    def q_idx(i):
        return (jnp.minimum(i // n_tiles, R - 1), 0)

    def s_idx(i):
        # sqscale ships [R*8, Qn] (8 replicated sublane rows per batch:
        # Mosaic needs the trailing block dims >= (8, 128) or full)
        return (jnp.minimum(i // n_tiles, R - 1), 0)

    def b_idx(i):
        return (jnp.where(i // n_tiles >= R, n_tiles - 1, i % n_tiles), 0)

    def o_idx(i):
        return (jnp.maximum(i // n_tiles, 1) - 1, 0, 0)

    park_shapes = [
        pltpu.VMEM((Qn, 3 * BLK, G), jnp.bfloat16),  # hi|mid|lo (stack)
        pltpu.VMEM((8, 8, 128), jnp.bfloat16),       # unused
        pltpu.VMEM((8, 8, 128), jnp.bfloat16)]       # unused
    outs = pl.pallas_call(
        _make_pipelined_kernel(n, k, metric, Qn, R, bits, xla_tail, park,
                               sq8=True),
        grid=((R + 1) * n_tiles,),
        in_specs=[
            pl.BlockSpec((Qn, d), q_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Qn), s_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), b_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), b_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(oshape, o_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(oshape, o_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(full_o, jnp.float32),
            jax.ShapeDtypeStruct(full_o, jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=park_shapes + [
            pltpu.VMEM((2 * G, Qn), jnp.float32),      # bmax_s (ping-pong)
            pltpu.VMEM((G, Qn), jnp.float32),          # rank_gq
            pltpu.VMEM((Qn, 1), jnp.float32),          # count_s
            pltpu.VMEM((Qn, BLK + 8, S_SLOTS), jnp.float32),  # cand
            pltpu.VMEM((Qn, 1, 8 * S_SLOTS), jnp.float32),    # rank2_s
            pltpu.VMEM((1, 1), jnp.float32),           # flag_acc
            pltpu.VMEM((1, 1), jnp.float32),           # flag_tmp
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )(qa_i8.reshape(R * Qn, d),
      jnp.broadcast_to(sqscale[:, None, :], (R, 8, Qn)).reshape(R * 8, Qn),
      codes_i8, sqs)
    s3, i3, flag = outs
    return (s3.reshape((R,) + oshape), i3.reshape((R,) + oshape), flag)


@functools.partial(jax.jit, static_argnames=("k", "metric", "interpret",
                                             "bits", "tail"))
def knn_scan_approx_sq8_v4(queries, codes_i8, lo, alpha, sq_eff, k, metric,
                           interpret=False, bits=RADIX_BITS,
                           tail="bitonic"):
    """APPROX top-k by quantized score, pipelined over the uint8 codes
    ONLY (no fp32 base read at all — 1/4 the HBM bytes; scoring rides the
    i8 MXU at 2x bf16 rate). queries f32[R, Qb, D]. The query quantizes to
    int8 per query (q*alpha scaled by s_q = max|q*alpha|/127); the returned
    scores are the dequantized approx scores (reference SQ8 approx
    semantics, scalar_quantization/quantizer.h:11-75: quantized ranking,
    no exactness contract — `mode=approx_rerank` re-scores exactly).
    Returns (scores [R, Qb, k], ids, flag); flag > 0 = slot overflow,
    caller reruns the v1 quantized path."""
    R, Qb, d = queries.shape
    qf = jax.vmap(_pad_queries)(queries)                  # [R, Qn, D]
    fac = 2.0 if metric == VectorMetric.L2 else 1.0
    qa = qf * alpha[None, None, :]
    s_q = jnp.maximum(jnp.max(jnp.abs(qa), axis=2), 1e-30) / 127.0
    qa_i8 = jnp.round(qa / s_q[:, :, None]).astype(jnp.int8)
    sqscale = fac * s_q                                    # [R, Qn]
    # rank-invariant per-query completion: q.b_deq = q.lo + qa.c where
    # c = c' + 128 — the kernel ranks by fac*s_q*(qa_i8 . c'); user scores
    # add fac*(q.lo + 128*s_q*sum(qa_i8)) (+ -|q|^2 for L2)
    bracket = fac * (
        jnp.einsum("rqd,d->rq", qf, lo)
        + 128.0 * s_q * jnp.sum(qa_i8.astype(jnp.float32), axis=2))
    corr = (bracket - jnp.sum(qf * qf, axis=2)
            if metric == VectorMetric.L2 else bracket)     # [R, Qn]
    s3, i3, flag = pipelined_select_sq8(
        qa_i8, sqscale, codes_i8, sq_eff[:, None], k, metric, interpret,
        bits=bits, xla_tail=(True if tail == "xla" else tail))
    if s3.shape[2] == 8:               # xla tail: compacted [R, Q, 8, S2]
        Qn = s3.shape[1]
        flat = s3.reshape(R, Qn, 8 * S2)
        rid = i3.reshape(R, Qn, 8 * S2)
        s, pos = jax.lax.top_k(flat, k)
        ids = jnp.take_along_axis(rid, pos, axis=2)
    else:
        s = s3[:, :, 0, :k]
        ids = i3[:, :, 0, :k]
    ids = jnp.where(s > SENT_HALF, ids, -1)
    s = jnp.where(ids >= 0, s + corr[:, :, None], -jnp.inf)
    return s[:, :Qb], ids[:, :Qb], flag[0, 0]


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

def _finish_v2(s3, i3, flag, k, Q_in, corr):
    if s3.shape[1] == 8:               # xla_tail: compacted [Q, 8, S2]
        Qn = s3.shape[0]
        flat = s3.reshape(Qn, 8 * S2)
        rid = i3.reshape(Qn, 8 * S2)
        s, pos = jax.lax.top_k(flat, k)
        ids = jnp.take_along_axis(rid, pos, axis=1)
    else:
        s = s3[:, 0, :k]
        ids = i3[:, 0, :k]
    ids = jnp.where(s > SENT_HALF, ids, -1)
    s = jnp.where(ids >= 0, s + corr, -jnp.inf)
    return s[:Q_in], ids[:Q_in], flag[0, 0]


@functools.partial(jax.jit, static_argnames=("k", "metric", "interpret"))
def knn_scan_fused_v2(queries, base, k, metric, interpret=False):
    """Exact top-k, two base sweeps, zero XLA epilogue. Same result contract
    as pallas_scan.knn_scan_fused (higher-better scores, -inf/-1 padded)
    plus an overflow flag (0.0 in the overwhelmingly common case)."""
    qf = _pad_queries(queries)
    bmax = sweep_bmax(qf, base, metric, interpret)
    eps = jnp.zeros((qf.shape[0], 1), jnp.float32)
    s3, i3, flag = select_sweep(qf, base, bmax, eps, k, metric, interpret)
    corr = (-jnp.sum(qf * qf, axis=1, keepdims=True)[:, :1]
            if metric == VectorMetric.L2 else jnp.float32(0.0))
    return _finish_v2(s3, i3, flag, k, queries.shape[0], corr)


FAST_EPS_SIGMA = 12.0     # tail multiplier for the probabilistic eps mode
#                           (clip residuals make the error distribution
#                           heavy-tailed; 12x the RMS measured zero misses
#                           at the 131k/k=100 bench shape)


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "interpret", "eps_mode"))
def knn_scan_sq8_v2(queries, codes, lo, alpha, err_dims, sq_eff, base, k,
                    metric, interpret=False, eps_mode="cert", ms_dims=None):
    """EXACT top-k at SQ8 scan cost: the threshold sweep reads the uint8
    codes (1/4 the HBM bytes); candidates are scored exactly from the fp32
    base in sweep B. err_dims f32[D] = max per-dim |b - dequant(b)| over
    valid rows (QuantizedStore tracks it).

    eps_mode="cert": the threshold widens by eps = fac * sum_d |q_d| *
    err_d, a certified bound on the quantized-vs-exact score difference,
    so the kept-block set provably covers the true top-k (exact by
    construction). On weakly structured data the certified margin can
    overflow the slot capacity (flag > 0).

    eps_mode="fast": eps = FAST_EPS_SIGMA * fac * sqrt(sum_d q_d^2 ms_d)
    where ms_d is the MEAN-SQUARE per-dim residual (QuantizedStore.ms_dims)
    — the per-row score error fac*q.r has variance fac^2 sum q_d^2 E[r_d^2]
    for a random row, so a 12-sigma margin keeps the true top-k with
    overwhelming probability while staying far tighter than the certified
    worst-case sum (which clip outliers inflate ~100x). Candidates are
    still scored EXACTLY from the fp32 base — this is the reference's
    "quantized select + corrective rescore" fidelity model
    (scalar_quantization/quantizer.h:11-75) with the rescore fused into
    sweep B instead of a row gather (gathers are the TPU anti-pattern).
    The kept-SET guarantee alone becomes probabilistic; on dense-boundary
    data (large k, isotropic scores) even this margin can overflow the
    slot capacity — the flag then sends the caller down the exact-fp32
    rung of the ladder. Returns (scores, ids, flag) like
    knn_scan_fused_v2."""
    qf = _pad_queries(queries)
    fac = 2.0 if metric == VectorMetric.L2 else 1.0
    q_alpha = qf * alpha[None, :]
    shift = fac * jnp.dot(qf, lo,
                          preferred_element_type=jnp.float32)[None, :]
    if eps_mode == "fast":
        ms = (ms_dims if ms_dims is not None
              else jnp.square(err_dims) / 3.0)
        eps = FAST_EPS_SIGMA * fac * jnp.sqrt(
            jnp.sum(jnp.square(qf) * ms[None, :], axis=1, keepdims=True))
    else:
        eps = fac * jnp.sum(jnp.abs(qf) * err_dims[None, :], axis=1,
                            keepdims=True)
    bmax = sweep_bmax_sq8(q_alpha, shift, codes, sq_eff, metric, interpret)
    s3, i3, flag = select_sweep(qf, base, bmax, eps, k, metric, interpret)
    corr = (-jnp.sum(qf * qf, axis=1, keepdims=True)[:, :1]
            if metric == VectorMetric.L2 else jnp.float32(0.0))
    return _finish_v2(s3, i3, flag, k, queries.shape[0], corr)


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "interpret", "eps_mode",
                                    "bits"))
def knn_scan_sq8_v3(queries, codes, lo, alpha, err_dims, sq_eff, base, k,
                    metric, interpret=False, eps_mode="cert", ms_dims=None,
                    bits=32):
    """knn_scan_sq8_v2's contract (EXACT top-k, quantized threshold sweep
    + exact fp32 candidate scoring, cert/fast eps ladder) in ONE twin-phase
    kernel — see twinsweep_select_sq8."""
    qf = _pad_queries(queries)
    fac = 2.0 if metric == VectorMetric.L2 else 1.0
    q_alpha = qf * alpha[None, :]
    shift = fac * jnp.dot(qf, lo,
                          preferred_element_type=jnp.float32)[None, :]
    if eps_mode == "fast":
        ms = (ms_dims if ms_dims is not None
              else jnp.square(err_dims) / 3.0)
        eps = FAST_EPS_SIGMA * fac * jnp.sqrt(
            jnp.sum(jnp.square(qf) * ms[None, :], axis=1, keepdims=True))
    else:
        eps = fac * jnp.sum(jnp.abs(qf) * err_dims[None, :], axis=1,
                            keepdims=True)
    s3, i3, flag = twinsweep_select_sq8(qf, eps, q_alpha, shift, codes,
                                        sq_eff, base, k, metric, interpret,
                                        bits=bits)
    corr = (-jnp.sum(qf * qf, axis=1, keepdims=True)[:, :1]
            if metric == VectorMetric.L2 else jnp.float32(0.0))
    return _finish_v2(s3, i3, flag, k, queries.shape[0], corr)


def v2_available(n: int, dims: int, k: int, n_queries: int) -> bool:
    """Geometry gate for the v2 path (callers must also hold the
    zeroed-invalid-rows contract — the vector keeper does)."""
    import os
    if os.environ.get("RX_TPU_FUSED_V2", "") in ("0", "false"):
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    Qn = 8
    while Qn < n_queries:
        Qn *= 2
    return (n % TILE == 0 and dims % 128 == 0 and Qn <= 128
            and k + MARGIN <= S_SLOTS and (k + MARGIN) * BLK * 2 < n)
