"""Device-resident dense BM25 for frequent (zipf-head) words.

VERDICT r3 #5: the heaviest FT queries — 2+ frequent terms with millions of
gathered postings — ran on the 1-core host at its ~50 MB/query memory-stream
floor (28-35 qps at 1M docs). This module moves them onto the TPU:

* Build once per holder revision: for the top-G most frequent vocabulary
  words, fold the query-independent per-posting rank PR = A + idf*B
  (selector._ab_arrays, the same factorization the host C++ dense merge
  consumes) into device-resident dense matrices
      S[g, d] = max over postings of word g in doc d of PR        (0 absent)
      M[g, d] = min over postings of word g in doc d of minpos    (BIG absent)
  Max/min commute with the per-run constant rboost, so a query's per-term
  subrank fold is exact: smax[t, d] = max_v rboost_v * S[slot_v, d].

* Query: gather the [B, T, V] slot rows chunk-by-chunk over cap, run the
  reference combine (proximity carry, must/not, full-match boost —
  /root/reference/cpp_src/core/ft/ft_fast/mergerimpl.h:95-124 semantics,
  identical to csrc/ft_native.cpp score_merge_dense), then select the top
  merge_k on device: per-segment top-M prune + one (score desc, doc asc)
  key sort over the pruned candidates. A per-query overflow flag (a segment
  whose M-th value still clears the global threshold) forces that query
  back to the host path, keeping the exactness contract.

Eligibility is decided by the selector: every variant word of every term
must be resident (zipf-head queries expand to head words; anything with a
rare-variant tail falls back to the host merge), default field parameters
only (PR folds the field boosts), and the gather must be large enough that
the device sweep beats the host's ~20 ns/posting stream.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np

_POS_BIG = 1.0e9
_SEG = 1024          # selection segment width (docs)
_M_PER_SEG = 64      # candidates kept per segment


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, str(default)))
    except ValueError:
        return default


DENSE_WORDS = _env_int("RX_FT_DENSE_WORDS", 64)
# a word must carry this many postings to earn residency
DENSE_MIN_COUNT = _env_int("RX_FT_DENSE_MINC", 256)
# minimum gathered postings before the device dense path engages (below
# this the host C++ merge wins against a dispatch round-trip)
DEVICE_MIN = _env_int("RX_FT_DEVICE_MIN", 1 << 19)
# single-query crossover is higher: one dispatch+drain round-trip (~35ms
# through the tunnel) vs the host dense merge at ~20ns/posting (measured
# 23.6ms at G=1.2M) — host wins singles until ~2M gathered postings
DEVICE_MIN_SINGLE = _env_int("RX_FT_DEVICE_MIN_SINGLE", 1 << 21)
_MAX_T = 8
_MAX_V = 8


def _pow2(n: int, floor: int) -> int:
    c = floor
    while c < n:
        c *= 2
    return c


def _score_core(S, M, FW, searched, idx, w, notm, must,
                n_must, n_pos, scalars,
                T: int, V: int, merge_k: int,
                use_prox: bool, use_fm: bool, chunks: int,
                seg: int, m_per_seg: int, packed: bool = False,
                doc_off=None):
    """S/M: [G+1, cap] resident folds; FW: [F, cap] field word counts;
    idx [B,T,V] i32 slots (G = padding), w [B,T,V] f32 rboost (0 = pad),
    notm/must [B,T] bool, n_must/n_pos [B] i32,
    scalars = [c1, c2, fm_boost, min_rank] f32.
    Returns (top scores [B, merge_k] f32, top docs [B, merge_k] i32
    (-1 = none), overflow [B] bool); with packed=True the scores/docs
    pair is replaced by ONE i32 array (normalized rank byte << 24 |
    doc, -1 = none) — the tunnel's device->host download is the
    serving bottleneck at ~33 MB/s, and the reference's own rank
    contract is an integer 0..255 (mergerimpl.h:107 docRank), so the
    byte rank halves the bytes without leaving reference fidelity.
    The min_rank cut happens HERE in exact f32 (same arithmetic as
    selector.normalize_ranks), so returned doc SETS stay exact.
    `doc_off` (traced scalar) globalizes doc ids when S/M hold a doc
    PARTITION — the mesh shard_map path (doc-sharded dense FT)."""
    import jax
    import jax.numpy as jnp
    if True:
        B = idx.shape[0]
        cap = S.shape[1]
        C = cap // chunks
        c1, c2, fm_boost = scalars[0], scalars[1], scalars[2]

        def chunk(ci, acc):
            off = ci * C
            Sb = jax.lax.dynamic_slice(S, (0, off), (S.shape[0], C))
            rows = Sb[idx]                              # [B,T,V,C]
            at = jnp.max(w[..., None] * rows, axis=2)   # [B,T,C]
            if use_prox:
                Mb = jax.lax.dynamic_slice(M, (0, off), (M.shape[0], C))
                mt = jnp.min(Mb[idx], axis=2)           # [B,T,C]
            docsum = jnp.zeros((B, C), jnp.float32)
            excl = jnp.zeros((B, C), jnp.bool_)
            must_cnt = jnp.zeros((B, C), jnp.int32)
            pos_cnt = jnp.zeros((B, C), jnp.int32)
            if use_prox:
                carry = jnp.zeros((B, C), jnp.float32)
                hasp = jnp.zeros((B, C), jnp.bool_)
            for t in range(T):
                s = at[:, t]
                present = s > 0.0
                if use_prox:
                    m = mt[:, t]
                    dist = jnp.maximum(jnp.abs(m - carry), 1.0)
                    att = jnp.where(hasp, s * (c1 + c2 / dist), s)
                else:
                    att = s
                nm = notm[:, t][:, None]
                mu = must[:, t][:, None]
                add = present & ~nm
                docsum = docsum + jnp.where(add, att, 0.0)
                pos_cnt = pos_cnt + add.astype(jnp.int32)
                excl = excl | (present & nm)
                must_cnt = must_cnt + (present & mu).astype(jnp.int32)
                if use_prox:
                    carry = jnp.where(add, m, carry)
                    hasp = hasp | add
            ok = (~excl) & (must_cnt == n_must[:, None]) & (docsum > 0.0)
            score = jnp.where(ok, docsum, 0.0)
            if use_fm:
                FWb = jax.lax.dynamic_slice(FW, (0, off), (FW.shape[0], C))
                fm_doc = jnp.any(searched[:, None, None]
                                 & (FWb[None] == n_pos[:, None, None]),
                                 axis=1)                       # [B, C]
                fm = fm_doc & (pos_cnt == n_pos[:, None])
                score = jnp.where(fm, score * fm_boost, score)
            return jax.lax.dynamic_update_slice(acc, score, (0, off))

        scores = jax.lax.fori_loop(
            0, chunks, chunk, jnp.zeros((B, cap), jnp.float32))

        # --- top-merge_k selection: per-segment prune + one key sort
        nseg = cap // seg
        off32 = (jnp.int32(0) if doc_off is None
                 else jnp.asarray(doc_off, jnp.int32))
        if m_per_seg == seg:
            # lossless: no pruning — sort everything (small corpora or
            # merge_k close to cap)
            cand_v = scores
            cand_d = jnp.broadcast_to(
                jnp.arange(cap, dtype=jnp.int32)[None] + off32, (B, cap))
            top_v = None
        else:
            segs = scores.reshape(B, nseg, seg)
            top_v, top_i = jax.lax.top_k(segs, m_per_seg)   # [B,nseg,m]
            cand_v = top_v.reshape(B, nseg * m_per_seg)
            cand_d = (jnp.arange(nseg, dtype=jnp.int32)[None, :, None] * seg
                      + top_i.astype(jnp.int32) + off32).reshape(
                          B, nseg * m_per_seg)
        # sort by (score desc, doc asc): scores are >= 0, so the f32 bit
        # pattern as i32 is order-isomorphic; negate for descending
        kv = -jax.lax.bitcast_convert_type(cand_v, jnp.int32)
        kv, cd = jax.lax.sort((kv, cand_d), num_keys=2)
        kk = min(merge_k, cand_v.shape[1])
        sel_v = jax.lax.bitcast_convert_type(-kv[:, :kk], jnp.float32)
        sel_d = cd[:, :kk]
        if kk < merge_k:
            sel_v = jnp.pad(sel_v, ((0, 0), (0, merge_k - kk)))
            sel_d = jnp.pad(sel_d, ((0, 0), (0, merge_k - kk)))
        if top_v is None:
            ovf = jnp.zeros((B,), jnp.bool_)
        else:
            # the cut value: 0 when fewer candidates exist than merge_k
            # (then EVERY positive doc must be returned and a full segment
            # implies possible loss)
            kth = sel_v[:, merge_k - 1]                 # [B]
            # overflow: a segment's M-th survivor is positive and would
            # still make the global cut — that segment may hide >M
            # qualifying docs
            segm = top_v[:, :, m_per_seg - 1]
            ovf = jnp.any((segm > 0.0) & (segm >= kth[:, None]), axis=1)
        sel_d = jnp.where(sel_v > 0.0, sel_d, -1)
        if packed:
            return _pack_rows(sel_v, sel_d, scalars), ovf
        return sel_v, sel_d, ovf


def _pack_rows(sel_v, sel_d, scalars):
    """sel_v sorted desc -> packed i32 rank-byte|doc rows; mirrors
    normalize_ranks + the min_rank cut in exact f32."""
    import jax.numpy as jnp
    smax = sel_v[:, :1]
    rank = sel_v * (255.0 / jnp.maximum(smax, 1e-30))
    keep = (sel_d >= 0) & (rank >= scalars[3])
    byte = jnp.clip(jnp.round(rank), 0.0, 255.0).astype(jnp.int32)
    return jnp.where(keep, (byte << 24) | sel_d, jnp.int32(-1))


def _build_score_fn():
    import jax
    dense_score_select = functools.partial(
        jax.jit,
        static_argnames=("T", "V", "merge_k", "use_prox", "use_fm",
                         "chunks", "seg", "m_per_seg", "packed"))(
        _score_core)
    return dense_score_select


def _build_mesh_score_fn(mesh, shard_axis: str, T: int, V: int,
                         merge_k: int, use_prox: bool, use_fm: bool,
                         chunks: int, seg: int, m_per_seg: int,
                         packed: bool):
    """Doc-sharded dense scorer (VERDICT r4 #3: dense FT under mesh):
    every shard scores its cap/S doc partition of the resident matrices
    and selects its local top-merge_k; an all_gather + one more
    (score desc, doc asc) key sort merges — the wire carries
    O(merge_k * S) words per query, not doc rows. Overflow is the OR of
    the per-shard flags (a local k-th is <= the global k-th, so the
    per-shard test stays conservative)."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local_fn(S, M, FW, searched, idx, w, notm, must, n_must, n_pos,
                 scalars):
        off = jax.lax.axis_index(shard_axis) * S.shape[1]
        sv, sd, ovf = _score_core(
            S, M, FW, searched, idx, w, notm, must, n_must, n_pos,
            scalars, T=T, V=V, merge_k=merge_k, use_prox=use_prox,
            use_fm=use_fm, chunks=chunks, seg=seg, m_per_seg=m_per_seg,
            packed=False, doc_off=off)
        all_v = jax.lax.all_gather(sv, shard_axis, axis=1, tiled=True)
        all_d = jax.lax.all_gather(sd, shard_axis, axis=1, tiled=True)
        kv = -jax.lax.bitcast_convert_type(all_v, jnp.int32)
        # absent docs carry id -1: map to +inf key so they sort last
        kv = jnp.where(all_d >= 0, kv, jnp.int32(2**31 - 1))
        kv, dd = jax.lax.sort((kv, all_d), num_keys=2)
        sel_v = jax.lax.bitcast_convert_type(-kv[:, :merge_k], jnp.float32)
        sel_d = dd[:, :merge_k]
        sel_v = jnp.where(sel_d >= 0, sel_v, 0.0)
        sel_d = jnp.where(sel_v > 0.0, sel_d, -1)
        ovf_all = jax.lax.all_gather(ovf, shard_axis, axis=0, tiled=True)
        ovf_any = jnp.any(ovf_all.reshape(
            mesh.shape[shard_axis], -1), axis=0)
        if packed:
            return _pack_rows(sel_v, sel_d, scalars), ovf_any
        return sel_v, sel_d, ovf_any

    spec_cap = P(None, shard_axis)
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(spec_cap, spec_cap, spec_cap, P(), P(None, None, None),
                  P(None, None, None), P(None, None), P(None, None),
                  P(None), P(None), P(None)),
        out_specs=((P(None, None), P(None)) if packed
                   else (P(None, None), P(None, None), P(None))),
        check_vma=False,
    )
    return jax.jit(fn)


_score_fn = None


def _get_score_fn():
    global _score_fn
    if _score_fn is None:
        _score_fn = _build_score_fn()
    return _score_fn


class FtDeviceDense:
    """Per-holder device-resident dense score/minpos matrices for the
    frequent-word head, plus the batched query entry point."""

    def __init__(self, holder, cfg, selector):
        self.holder = holder
        self.cfg = cfg
        self.selector = selector
        self.wid2slot: dict[int, int] = {}
        self.S = None            # [G+1, cap] f32 device
        self.M = None            # [G+1, cap] f32 device (BIG absent)
        self.cap = 0
        self._built_key = None
        self._mesh = None        # doc-sharded residency (mesh mode)
        self._mesh_fw = None
        self._mesh_fns: dict = {}

    # ------------------------------------------------------------------
    def ensure_built(self) -> bool:
        """(Re)build the resident matrices for the current holder revision
        and default field parameters. Returns False when the corpus has no
        head words worth residency."""
        import jax.numpy as jnp
        from .dsl import FtDslQuery
        from .dataholder import _pad_pow2 as _cap_pow2

        h = self.holder
        if h.total_docs == 0 or not len(h.words):
            return False
        fb, bb, bw, pb, pw = self.selector._field_params(FtDslQuery())
        self.selector._ab_arrays(fb, bb, bw, pb, pw)
        key = h._ab_cache[0]
        if self._built_key == key:
            return self.S is not None
        self._built_key = key
        PR = h._ab_cache[3]

        counts = np.diff(h.word_start)
        # residency threshold: a word must carry enough postings that the
        # device sweep beats streaming them on host
        import sys
        mod = sys.modules[__name__]
        min_count = max(mod.DENSE_MIN_COUNT, h.total_docs // 256)
        order = np.argsort(-counts, kind="stable")
        head = [int(wid) for wid in order[: mod.DENSE_WORDS]
                if counts[wid] >= min_count]
        if not head:
            self.S = self.M = None
            return False

        cap = _cap_pow2(max(len(h.doc_words), 1))
        G = len(head)
        S = np.zeros((G + 1, cap), np.float32)
        M = np.full((G + 1, cap), _POS_BIG, np.float32)
        minpos = h.post_minpos
        for g, wid in enumerate(head):
            s, e = int(h.word_start[wid]), int(h.word_start[wid + 1])
            docs = h.post_doc[s:e]
            starts = np.flatnonzero(np.diff(docs) != 0) + 1
            starts = np.concatenate([[0], starts])
            lead = docs[starts]
            S[g, lead] = np.maximum.reduceat(PR[s:e], starts)
            M[g, lead] = np.minimum.reduceat(
                minpos[s:e].astype(np.float32), starts)
        self.wid2slot = {wid: g for g, wid in enumerate(head)}
        self.cap = cap
        ctx = getattr(self.selector, "mesh_ctx", None)
        if ctx is not None and cap % ctx.n_shards == 0:
            # doc-sharded residency: the cap axis partitions over the mesh
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(ctx.mesh, P(None, ctx.shard_axis))
            self.S = jax.device_put(jnp.asarray(S), sh)
            self.M = jax.device_put(jnp.asarray(M), sh)
            self._mesh = ctx
        else:
            self.S = jnp.asarray(S)
            self.M = jnp.asarray(M)
            self._mesh = None
        self._searched = jnp.asarray(fb[: h.field_words.shape[0]] > 0.0)
        self._mesh_fw = None
        return True

    # ------------------------------------------------------------------
    def pack_query(self, prep: dict) -> Optional[dict]:
        """Map a prepared query's posting runs onto resident slots.
        Returns None when any variant word is not resident (host path)."""
        h = self.holder
        if self.S is None:
            return None
        T = len(prep["must"])
        if T > _MAX_T:
            return None
        wids = np.searchsorted(h.word_start, prep["run_start"],
                               side="right") - 1
        slots = np.empty(len(wids), np.int32)
        for i, wid in enumerate(wids):
            g = self.wid2slot.get(int(wid))
            if g is None:
                return None
            slots[i] = g
        per_term: list[list[tuple[int, float]]] = [[] for _ in range(T)]
        tb, tl = prep["term_boost"], prep["term_lenb"]
        for i, t in enumerate(prep["run_term"]):
            rb = float(prep["run_w"][i] * tb[t] * tl[t])
            per_term[int(t)].append((int(slots[i]), rb))
        V = max((len(v) for v in per_term), default=0)
        if V > _MAX_V or V == 0:
            return None
        return {"per_term": per_term, "T": T, "V": V,
                "must": prep["must"], "notm": prep["notm"],
                "n_must": int(prep["must"].sum()),
                "n_pos": int((~prep["notm"]).sum())}

    # ------------------------------------------------------------------
    def dispatch_batch(self, packs: list[dict], merge_k: int,
                       use_prox: bool, use_fm: bool, packed: bool = False):
        """Run a batch of packed queries in ONE device program. Returns
        DEVICE arrays (scores [B, merge_k] f32, docs [B, merge_k] i32,
        ovf [B] bool) — drain with jax.device_get when needed; callers must
        re-route ovf rows to the host merge. With packed=True (requires
        self.packable) the pair collapses to one i32 rank-byte|doc array
        (half the ~33 MB/s tunnel download; see dense_score_select)."""
        import jax.numpy as jnp

        h, cfg = self.holder, self.cfg
        B = _pow2(len(packs), 1)
        T = _pow2(max(p["T"] for p in packs), 2)
        V = _pow2(max(p["V"] for p in packs), 1)
        G = self.S.shape[0] - 1
        idx = np.full((B, T, V), G, np.int32)
        w = np.zeros((B, T, V), np.float32)
        notm = np.zeros((B, T), np.bool_)
        must = np.zeros((B, T), np.bool_)
        n_must = np.zeros(B, np.int32)
        n_pos = np.full(B, -1, np.int32)
        for b, p in enumerate(packs):
            for t, lst in enumerate(p["per_term"]):
                for v, (slot, rb) in enumerate(lst):
                    idx[b, t, v] = slot
                    w[b, t, v] = rb
            notm[b, : p["T"]] = p["notm"]
            must[b, : p["T"]] = p["must"]
            n_must[b] = p["n_must"]
            n_pos[b] = p["n_pos"] if p["n_pos"] > 0 else -1
        scalars = np.asarray(
            [1.0 - cfg.distance_weight,
             cfg.distance_boost * cfg.distance_weight,
             cfg.full_match_boost, cfg.min_rank], np.float32)
        dev = h.device_arrays()
        # the selection geometry sizes against the PER-DEVICE cap slice
        # (mesh mode doc-shards the resident matrices)
        cap_loc = (self.cap // self._mesh.n_shards
                   if self._mesh is not None else self.cap)
        seg = min(_SEG, cap_loc)
        mk = min(merge_k, self.cap)
        mk_loc = min(mk, cap_loc)
        # per-segment prune depth: ~3x the expected per-segment survivor
        # count so random fluctuation rarely trips the overflow fallback;
        # m == seg disables pruning entirely (lossless sort)
        m_per_seg = min(seg, max(_M_PER_SEG,
                                 (3 * mk_loc * seg + cap_loc - 1)
                                 // cap_loc))
        # bound the gathered chunk intermediate [B,T,V,C] to ~64MB
        rows = B * T * V
        chunks = 1
        while (cap_loc // chunks) > seg \
                and rows * (cap_loc // chunks) * 4 > (1 << 26):
            chunks *= 2
        if self._mesh is not None:
            return self._dispatch_mesh(
                idx, w, notm, must, n_must, n_pos, scalars, dev,
                T=T, V=V, mk=mk, mk_loc=mk_loc, use_prox=use_prox,
                use_fm=use_fm, chunks=chunks, seg=seg,
                m_per_seg=m_per_seg, packed=packed)
        fn = _get_score_fn()
        if packed:
            assert self.packable, "packed mode needs cap <= 2^23"
            pk, ovf = fn(
                self.S, self.M, dev["field_words"], self._searched,
                jnp.asarray(idx), jnp.asarray(w), jnp.asarray(notm),
                jnp.asarray(must), jnp.asarray(n_must), jnp.asarray(n_pos),
                jnp.asarray(scalars),
                T=T, V=V, merge_k=mk, use_prox=use_prox, use_fm=use_fm,
                chunks=chunks, seg=seg, m_per_seg=m_per_seg, packed=True)
            return pk, ovf
        sv, sd, ovf = fn(
            self.S, self.M, dev["field_words"], self._searched,
            jnp.asarray(idx), jnp.asarray(w), jnp.asarray(notm),
            jnp.asarray(must), jnp.asarray(n_must), jnp.asarray(n_pos),
            jnp.asarray(scalars),
            T=T, V=V, merge_k=mk, use_prox=use_prox, use_fm=use_fm,
            chunks=chunks, seg=seg, m_per_seg=m_per_seg)
        return sv, sd, ovf

    def _dispatch_mesh(self, idx, w, notm, must, n_must, n_pos, scalars,
                       dev, *, T, V, mk, mk_loc, use_prox, use_fm,
                       chunks, seg, m_per_seg, packed):
        """Doc-sharded dispatch (see _build_mesh_score_fn)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        ctx = self._mesh
        fw = dev["field_words"]
        if self._mesh_fw is None or self._mesh_fw[0] is not fw:
            self._mesh_fw = (fw, jax.device_put(
                fw, NamedSharding(ctx.mesh, P(None, ctx.shard_axis))))
        key = (T, V, mk, use_prox, use_fm, chunks, seg, m_per_seg, packed)
        fn = getattr(self, "_mesh_fns", None)
        if fn is None:
            self._mesh_fns = {}
        fn = self._mesh_fns.get(key)
        if fn is None:
            fn = _build_mesh_score_fn(
                ctx.mesh, ctx.shard_axis, T=T, V=V, merge_k=mk,
                use_prox=use_prox, use_fm=use_fm, chunks=chunks, seg=seg,
                m_per_seg=m_per_seg, packed=packed)
            self._mesh_fns[key] = fn
        return fn(self.S, self.M, self._mesh_fw[1], self._searched,
                  jnp.asarray(idx), jnp.asarray(w), jnp.asarray(notm),
                  jnp.asarray(must), jnp.asarray(n_must),
                  jnp.asarray(n_pos), jnp.asarray(scalars))

    @property
    def packable(self) -> bool:
        """The packed download encodes docs in 24 bits and reserves the
        all-ones word for "none": safe while cap <= 2^23 (doc ids then
        never fill the low 24 bits)."""
        return self.cap <= (1 << 23)

    @staticmethod
    def unpack_row(pk_row: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """One packed i32 row -> (ranks f32 0..255, docs i64), valid
        prefix only (rows are sorted rank desc / doc asc on device)."""
        valid = pk_row != -1
        pk = pk_row[valid].astype(np.int64)
        ranks = ((pk >> 24) & 0xFF).astype(np.float32)
        docs = pk & 0xFFFFFF
        return ranks, docs

    def score_batch(self, packs: list[dict], merge_k: int, use_prox: bool,
                    use_fm: bool):
        """Synchronous wrapper over dispatch_batch (host np results)."""
        import jax
        sv, sd, ovf = self.dispatch_batch(packs, merge_k, use_prox, use_fm)
        sv, sd, ovf = jax.device_get((sv, sd, ovf))
        return np.asarray(sv), np.asarray(sd), np.asarray(ovf)
