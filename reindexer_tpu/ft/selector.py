"""FT query pipeline: variant expansion (host) -> device scoring -> merge.

Semantic equivalent of the reference Selector
(cpp_src/core/ft/ft_fast/selecterimpl.h:631 Process, selecter.h:149-168
tryToCorrectTypos/transliterate/stem/addSynonyms): each DSL term expands into
dictionary *variants* — exact word, prefix/suffix matches, typo candidates,
stem-prefix matches, transliteration, keyboard layout, synonyms — each with
its base relevancy proc (FtSubTermProcs). The variants select CSR posting
ranges; the device scorer (scorer.py) folds them into ranked docs.

Partial-match relevancy mirrors ftconfig.h:183-185:
    proc = fullMatch - partialMatchDecrease * unmatched / matched
clamped to prefixMin/suffixMin.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from .config import FtFastConfig
from .dataholder import FtDataHolder
from .dsl import FtDslQuery, FtTerm, parse_ft_dsl
from .scorer import idf_host, score_and_merge
from .stemmer import get_stemmer
from .mmseg import segmenter_for_config
from .tokenizer import tokenize
from .variants import SynonymsMap, kblayout_variants, translit_variants

_MAX_VARIANT_WORDS = 1024
_MIN_STEM_LEN = 3


def _pad_pow2(n: int, floor: int = 64) -> int:
    c = floor
    while c < n:
        c *= 2
    return c


def normalize_ranks(docs: np.ndarray, scores: np.ndarray, min_rank: float,
                    ) -> tuple[np.ndarray, np.ndarray]:
    """docRank = sum*255/allmax + minRank cut (mergerimpl.h:107)."""
    allmax = float(scores[0]) if len(scores) else 1.0
    ranks = scores * (255.0 / max(allmax, 1e-30))
    keep = ranks >= min_rank
    return docs[keep].astype(np.int64), ranks[keep].astype(np.float32)


@dataclasses.dataclass
class FtSelectResult:
    ids: np.ndarray            # int64 doc rows, best rank first
    ranks: np.ndarray          # float32 0..255 (reference rank scale)
    matched_words: set         # vocabulary words that produced matches
    holder: Optional[FtDataHolder] = None
    # vocabulary word ids behind matched_words: with the holder they
    # resolve source-offset areas for highlight/snippet (areaholder.h)
    matched_wids: set = dataclasses.field(default_factory=set)
    # field indices actually searched (None = all): areas exclude fields
    # the query did not target (reference: per-field merge areas)
    searched_fields: Optional[set] = None


class FtSelector:
    def __init__(self, holder: FtDataHolder, cfg: FtFastConfig,
                 mesh_ctx=None):
        self.holder = holder
        self.cfg = cfg
        self.synonyms = SynonymsMap(cfg.synonyms)
        # device-resident field-param vectors cached per DSL field signature
        # (5 small arrays otherwise re-uploaded every query)
        self._fp_cache: dict = {}
        # engine-integrated sharding (parallel/context.MeshContext): when
        # set, the default scorer runs doc-sharded over the mesh with a
        # collective rank merge (parallel/sharded_ft.py) — the same
        # process() API the single-chip path serves
        self.mesh_ctx = mesh_ctx
        self._mesh_fns: dict = {}
        # device-resident dense scorer for frequent words (device_dense.py)
        self._ddense = None

    # ------------------------------------------------------------------
    def process(self, dsl: str, normalize: bool = True) -> FtSelectResult:
        q = parse_ft_dsl(dsl)
        return self.process_query(q, normalize=normalize)

    def _prepare(self, q: FtDslQuery) -> Optional[dict]:
        """Host half of a query: synonym/stop handling, variant expansion,
        gather-array construction, per-term vectors. Returns None when the
        query cannot match anything."""
        h = self.holder
        cfg = self.cfg
        if h.total_docs == 0 or not len(h.words):
            return None

        # CJK query terms split into per-character phrase groups (mirror of
        # the index-side unigram split, tokenizer._split_cjk)
        q = self._cjk_expand(q)

        # multi-word synonym spans add alternative variant terms
        terms = list(q.terms)
        patterns = [t.pattern for t in terms]
        for start, end, alts in self.synonyms.multi_matches(patterns):
            for alt in alts:
                for tok in tokenize(alt, cfg.extra_word_symbols,
                    segmenter_for_config(cfg)):
                    terms.append(dataclasses.replace(
                        terms[start], pattern=tok, phrase_group=-1,
                        op="or" if terms[start].op != "not" else "not"))

        # drop stop-word query terms (reference: stop words skipped in query)
        terms = [t for t in terms
                 if t.pattern not in cfg.stop_words
                 and t.pattern not in cfg.morpheme_stop_words]
        if not terms:
            return None

        # --- expand variants per term: word_id -> proc (max if several)
        variants: list[dict[int, float]] = [self._expand(t) for t in terms]
        if not any(variants):
            return None

        # --- collect per-(term, variant-word) posting runs. Each run is a
        # CONTIGUOUS doc-sorted CSR range [start, start+len) — the host merge
        # (csrc score_merge_runs) consumes them sort-free, and the device
        # gather arrays materialize lazily from them (_gather_arrays) only
        # when a device path actually runs.
        run_start_p, run_len_p, run_term_p = [], [], []
        run_w_p, run_idf_p = [], []
        matched_words: set = set()
        matched_wids: set = set()
        bm25_type = cfg.bm25.bm25_type
        for t_idx, var in enumerate(variants):
            if not var:
                continue
            wids = np.fromiter(var.keys(), dtype=np.int64, count=len(var))
            procs = np.fromiter(var.values(), dtype=np.float32, count=len(var))
            idfs = idf_host(h.total_docs, h.word_ndocs[wids], bm25_type)
            starts = h.word_start[wids]
            ends = h.word_start[wids + 1]
            lens = (ends - starts).astype(np.int64)
            total = int(lens.sum())
            if total == 0:
                continue
            if terms[t_idx].op != "not":
                for w in wids:
                    matched_words.add(h.words[w])
                    matched_wids.add(int(w))
            nz = lens > 0
            run_start_p.append(starts[nz].astype(np.int64))
            run_len_p.append(lens[nz])
            run_term_p.append(np.full(int(nz.sum()), t_idx, dtype=np.int32))
            run_w_p.append((procs[nz] / 100.0).astype(np.float32))
            run_idf_p.append(idfs[nz].astype(np.float32))

        if not run_start_p:
            return None
        run_start = np.concatenate(run_start_p)
        run_len = np.concatenate(run_len_p)
        n_terms = len(terms)
        term_boost = np.ones(n_terms, dtype=np.float32)
        term_lenb = np.ones(n_terms, dtype=np.float32)
        must = np.zeros(n_terms, dtype=np.bool_)
        notm = np.zeros(n_terms, dtype=np.bool_)
        for i, t in enumerate(terms):
            term_boost[i] = t.boost
            term_lenb[i] = self._term_len_bound(t.term_len_boost)
            must[i] = (t.op == "must") or t.phrase_group >= 0
            notm[i] = t.op == "not"
        return {
            "terms": terms, "variants": variants,
            "matched_words": matched_words,
            "matched_wids": matched_wids,
            "run_start": run_start, "run_len": run_len,
            "run_term": np.concatenate(run_term_p),
            "run_w": np.concatenate(run_w_p),
            "run_idf": np.concatenate(run_idf_p),
            "G": int(run_len.sum()),
            "term_boost": term_boost, "term_lenb": term_lenb,
            "must": must, "notm": notm,
        }

    @staticmethod
    def _gather_arrays(prep: dict) -> dict:
        """Materialize the flat device gather arrays (g_idx/g_term/g_w/g_idf)
        from the posting runs; cached in the prep dict (host-merge queries
        never pay this)."""
        if "g_idx" not in prep:
            rs, rl = prep["run_start"], prep["run_len"]
            prep["g_idx"] = (
                np.concatenate([np.arange(s, s + l, dtype=np.int32)
                                for s, l in zip(rs, rl)])
                if len(rs) else np.empty(0, dtype=np.int32))
            prep["g_term"] = np.repeat(prep["run_term"], rl)
            prep["g_w"] = np.repeat(prep["run_w"], rl).astype(np.float32)
            prep["g_idf"] = np.repeat(prep["run_idf"], rl).astype(np.float32)
        return prep

    def process_query(self, q: FtDslQuery, normalize: bool = True,
                      _prep: Optional[dict] = None) -> FtSelectResult:
        h = self.holder
        cfg = self.cfg
        bm25_type = cfg.bm25.bm25_type
        empty = FtSelectResult(np.empty(0, dtype=np.int64),
                               np.empty(0, dtype=np.float32), set(), h)
        prep = self._prepare(q) if _prep is None else _prep
        if prep is None:
            return empty
        terms = prep["terms"]
        variants = prep["variants"]
        matched_words = prep["matched_words"]

        def _padded_gather():
            self._gather_arrays(prep)
            g_idx, g_term = prep["g_idx"], prep["g_term"]
            g_w, g_idf = prep["g_w"], prep["g_idf"]
            gpad = _pad_pow2(len(g_idx))
            pad = gpad - len(g_idx)
            if pad:
                g_idx = np.concatenate([g_idx,
                                        np.zeros(pad, dtype=np.int32)])
                g_term = np.concatenate([g_term,
                                         np.zeros(pad, dtype=np.int32)])
                g_w = np.concatenate([g_w, np.zeros(pad, dtype=np.float32)])
                g_idf = np.concatenate([g_idf,
                                        np.zeros(pad, dtype=np.float32)])
            return g_idx, g_term, g_w, g_idf

        # --- per-term parameter vectors padded to a shape bucket
        t_count = _pad_pow2(len(terms), 2)

        def padt(a, fill=0):
            out = np.full(t_count, fill, dtype=a.dtype)
            out[: len(a)] = a
            return out

        term_boost = padt(prep["term_boost"], 1)
        term_lenb = padt(prep["term_lenb"], 1)
        must = padt(prep["must"], False)
        notm = padt(prep["notm"], False)

        fp_key = tuple((f.name, f.boost, f.sum_rank) for f in q.fields)
        cached = self._fp_cache.get(fp_key)
        if cached is None:
            import jax.numpy as _jnp
            cached = tuple(_jnp.asarray(a) for a in self._field_params(q))
            if len(self._fp_cache) < 64:
                self._fp_cache[fp_key] = cached
        fb, bb, bw, pb, pw = cached

        import jax.numpy as jnp
        from .dataholder import _pad_pow2 as _cap_pow2
        cap = _cap_pow2(max(len(h.doc_words), 1))
        merge_k = min(cfg.merge_limit, cap)
        # term-proximity boost only matters for multi-term queries
        # (mergerimpl.h:179 — attenuates later terms far from earlier ones)
        use_prox = cfg.distance_weight > 0.0 and len(terms) > 1
        # fullMatchBoost: field length == positive-term count (merger.h:101)
        n_pos_terms = int((~prep["notm"]).sum())
        use_fm = cfg.full_match_boost != 1.0 and n_pos_terms > 0
        sum_fields = [f.name for f in q.fields if f.sum_rank]
        # mesh-resident mode: the default scorer runs doc-sharded with a
        # collective rank merge (the fielded sum-ranks variant falls back
        # to the single-device program)
        sharded = (self.mesh_ctx is not None
                   and not (cfg.sum_ranks_by_fields_ratio > 0 and sum_fields)
                   and cap % self.mesh_ctx.n_shards == 0)
        dev = None if sharded else h.device_arrays()
        host = dense = None
        if not (cfg.sum_ranks_by_fields_ratio > 0 and sum_fields):
            # frequent-word queries whose variants are all device-resident
            # run the dense device scorer (device_dense.py, VERDICT r3 #5;
            # under mesh the resident matrices doc-shard and the per-shard
            # top-k merges collectively — _build_mesh_score_fn)
            dense = self._try_dense(q, prep, merge_k, use_prox, use_fm,
                                    normalize=normalize)
            if dense is not None and dense[0] == "norm":
                # device already normalized + min_rank-cut (packed
                # download); no phrase queries take this route
                _, ranks, docs = dense
                return FtSelectResult(docs, ranks, matched_words, h,
                                      matched_wids=prep["matched_wids"])
            if dense is None and not sharded:
                host = self._score_host(q, prep, merge_k=merge_k,
                                        use_prox=use_prox, use_fm=use_fm,
                                        n_pos_terms=n_pos_terms)
        if sharded and dense is None:
            scores, docs = self._score_sharded(
                prep, t_count, (term_boost, term_lenb, must, notm),
                (fb, bb, bw, pb, pw), merge_k, use_prox, use_fm,
                n_pos_terms)
        elif dense is not None:
            scores, docs = dense[1], dense[2]
        elif host is not None:
            scores, docs = host
        elif cfg.sum_ranks_by_fields_ratio > 0 and sum_fields:
            # field-rank summation (fulltext.md:118-128 '+'-marked fields)
            sum_mask = np.zeros(len(fb), dtype=np.bool_)
            for i, name in enumerate(h.field_names):
                if name in sum_fields:
                    sum_mask[i] = True
            from .scorer import score_and_merge_fielded
            g_idx, g_term, g_w, g_idf = _padded_gather()
            scores, docs = score_and_merge_fielded(
                jnp.asarray(g_idx), jnp.asarray(g_term), jnp.asarray(g_w),
                jnp.asarray(g_idf),
                dev["post_doc"], dev["post_field"], dev["post_tf"],
                dev["post_minpos"], dev["doc_words"],
                jnp.asarray(fb), jnp.asarray(bb), jnp.asarray(bw),
                jnp.asarray(pb), jnp.asarray(pw),
                jnp.asarray(term_boost), jnp.asarray(term_lenb),
                jnp.asarray(must), jnp.asarray(notm), jnp.asarray(sum_mask),
                cfg.bm25.k1, cfg.bm25.b, h.avg_doc_len,
                t_count, len(fb), cap, merge_k, bm25_type,
                float(cfg.sum_ranks_by_fields_ratio),
                dist_w=cfg.distance_weight, dist_b=cfg.distance_boost,
                use_proximity=use_prox,
                field_words=dev["field_words"], n_terms=n_pos_terms,
                fm_boost=cfg.full_match_boost, use_fullmatch=use_fm)
        else:
            # sorted/segmented-scan path by default (no [T, cap] dense
            # accumulator, no serial TPU scatter); RX_TPU_FT_DENSE=1 keeps
            # the legacy dense formulation available for comparison
            if os.environ.get("RX_TPU_FT_DENSE", "") in ("1", "true"):
                fn = score_and_merge
            else:
                from .scorer import score_and_merge_sorted as fn
            g_idx, g_term, g_w, g_idf = _padded_gather()
            scores, docs = fn(
                jnp.asarray(g_idx), jnp.asarray(g_term), jnp.asarray(g_w),
                jnp.asarray(g_idf),
                dev["post_doc"], dev["post_field"], dev["post_tf"],
                dev["post_minpos"], dev["doc_words"],
                jnp.asarray(fb), jnp.asarray(bb), jnp.asarray(bw),
                jnp.asarray(pb), jnp.asarray(pw),
                jnp.asarray(term_boost), jnp.asarray(term_lenb),
                jnp.asarray(must), jnp.asarray(notm),
                cfg.bm25.k1, cfg.bm25.b, h.avg_doc_len,
                t_count, cap, merge_k, bm25_type,
                dist_w=cfg.distance_weight, dist_b=cfg.distance_boost,
                use_proximity=use_prox,
                field_words=dev["field_words"], n_terms=n_pos_terms,
                fm_boost=cfg.full_match_boost, use_fullmatch=use_fm)
        import jax
        from ..core.rdxcontext import check_cancel
        check_cancel()          # between device dispatch and drain
        scores, docs = jax.device_get((scores, docs))
        scores, docs = np.asarray(scores), np.asarray(docs)
        keep = docs >= 0
        scores, docs = scores[keep], docs[keep]
        if len(docs) == 0:
            return empty

        # --- phrase verification on host (positions CSR)
        if q.phrase_distance:
            pmask = self._verify_phrases(q, terms, variants, docs)
            scores, docs = scores[pmask], docs[pmask]
            if len(docs) == 0:
                return empty

        wids = prep["matched_wids"]
        searched = None
        if q.fields:
            fbv = self._field_params(q)[0]
            searched = {i for i in range(len(h.field_names)) if fbv[i] > 0}
        if not normalize:
            # raw docRank sums (merged/normalized by the caller — the
            # incremental-step merge in index/text.py)
            return FtSelectResult(docs.astype(np.int64),
                                  scores.astype(np.float32),
                                  matched_words, h, matched_wids=wids,
                                  searched_fields=searched)
        docs, ranks = normalize_ranks(docs, scores, cfg.min_rank)
        return FtSelectResult(docs, ranks, matched_words, h,
                              matched_wids=wids, searched_fields=searched)

    # ------------------------------------------------------------------
    # Mesh-resident scoring (engine-integrated P8): postings doc-sharded
    # over the mesh, per-query gathers split per shard on host, BM25 +
    # proximity/full-match boosts computed locally per chip, ranks merged
    # with one all_gather + top_k (parallel/sharded_ft.build_sharded_bm25).
    # ------------------------------------------------------------------
    def _mesh_pack(self):
        """Doc-sharded posting arrays, cached on the holder (rebuilt only
        when the holder rebuilds — holders are immutable once built)."""
        import jax.numpy as jnp
        from .dataholder import _pad_pow2 as _cap_pow2
        from ..parallel.sharded_ft import shard_postings
        h, ctx = self.holder, self.mesh_ctx
        pack = getattr(h, "_mesh_pack_cache", None)
        if pack is not None and pack["ctx"] is ctx:
            return pack
        S = ctx.n_shards
        cap = _cap_pow2(max(len(h.doc_words), 1))
        cps = cap // S
        packed, dw, remap_shard, remap_local, ppad, fw = shard_postings(
            h, S, cps)
        sh = ctx.shard_rows
        pack = {
            "ctx": ctx, "cps": cps,
            "remap_shard": remap_shard, "remap_local": remap_local,
            "post_doc": sh(jnp.asarray(packed["post_doc"])),
            "post_field": sh(jnp.asarray(packed["post_field"])),
            "post_tf": sh(jnp.asarray(packed["post_tf"])),
            "post_minpos": sh(jnp.asarray(packed["post_minpos"])),
            "doc_words": sh(jnp.asarray(dw)),
            "field_words": sh(jnp.asarray(fw)),
        }
        h._mesh_pack_cache = pack
        return pack

    def _score_sharded(self, prep, t_count, term_arrays, fp, merge_k,
                       use_prox, use_fm, n_pos_terms):
        import jax.numpy as jnp
        from ..parallel.sharded_ft import build_sharded_bm25
        h, cfg, ctx = self.holder, self.cfg, self.mesh_ctx
        term_boost, term_lenb, must, notm = term_arrays
        fb, bb, bw, pb, pw = fp
        pack = self._mesh_pack()
        S, cps = ctx.n_shards, pack["cps"]
        self._gather_arrays(prep)
        g_idx = prep["g_idx"]
        # split the global gather list per doc shard (vectorized: stable
        # sort by shard, then per-shard positional fill)
        s_of = pack["remap_shard"][g_idx]
        loc = pack["remap_local"][g_idx]
        counts = np.bincount(s_of, minlength=S)
        Gp = _pad_pow2(max(int(counts.max()), 1))
        order = np.argsort(s_of, kind="stable")
        offs = np.zeros(S, dtype=np.int64)
        np.cumsum(counts[:-1], out=offs[1:])
        within = np.arange(len(g_idx), dtype=np.int64) - offs[s_of[order]]
        rows = s_of[order]

        def scat(src, dtype):
            out = np.zeros((S, Gp), dtype=dtype)
            out[rows, within] = src[order]
            return out

        sg_idx = scat(loc, np.int32)
        sg_term = scat(prep["g_term"], np.int32)
        sg_w = scat(prep["g_w"], np.float32)
        sg_idf = scat(prep["g_idf"], np.float32)

        key = (t_count, cps, merge_k, cfg.bm25.bm25_type, use_prox, use_fm,
               n_pos_terms)
        fn = self._mesh_fns.get(key)
        if fn is None:
            fn = build_sharded_bm25(
                ctx.mesh, t_count, cps, merge_k, cfg.bm25.bm25_type,
                shard_axis=ctx.shard_axis,
                dist_w=cfg.distance_weight, dist_b=cfg.distance_boost,
                use_proximity=use_prox, n_terms=n_pos_terms,
                fm_boost=cfg.full_match_boost, use_fullmatch=use_fm)
            self._mesh_fns[key] = fn
        sh = ctx.shard_rows
        scalars = np.asarray([cfg.bm25.k1, cfg.bm25.b, h.avg_doc_len],
                             np.float32)
        return fn(sh(jnp.asarray(sg_idx)), sh(jnp.asarray(sg_term)),
                  sh(jnp.asarray(sg_w)), sh(jnp.asarray(sg_idf)),
                  pack["post_doc"], pack["post_field"], pack["post_tf"],
                  pack["post_minpos"], pack["doc_words"],
                  pack["field_words"],
                  fb, bb, bw, pb, pw,
                  jnp.asarray(term_boost), jnp.asarray(term_lenb),
                  jnp.asarray(must), jnp.asarray(notm),
                  jnp.asarray(scalars))

    # ------------------------------------------------------------------
    # Host C++ merge for small/medium gathers (csrc/ft_native.cpp
    # score_merge — the reference's CPU Merger analog, mergerimpl.h:95-124).
    # The device sorted path pays a pow2-padded bitonic sort + ~30ms
    # dispatch RTT; a 1-core merge runs ~1ms at 1e5 postings and ~215ms at
    # ~2e6 (measured round 2 on the 1M-doc zipf corpus) vs ~600ms for the
    # 2^21-wide device sort through the tunnel — host wins through 2M.
    # Deployments with a local (non-tunneled) chip can lower this.
    HOST_SCORE_MAX = int(os.environ.get("RX_FT_HOST_MAX", str(1 << 23)))
    # above this many gathered postings the dense [T, cap] doc-major merge
    # beats the k-way heap merge (branchy interleave ~25ns/posting vs
    # streaming writes ~5ns + an O(cap) combine pass)
    DENSE_MIN = int(os.environ.get("RX_FT_DENSE_MIN", str(1 << 17)))

    def _ab_arrays(self, fb, bb, bw, pb, pw):
        """Query-independent per-posting affine score parts (cached on the
        holder): subTermRank = w*tb*tlb * (A[p] + beta*B[p]) with
        A = fb*(1-bw)*posrank, B = fb*bb*bw*X*posrank, beta = idf (rx/
        classic) or 1 (word_count). One vectorized pass over the postings
        at first use (~0.3s at 18M) turns the merge's per-posting math into
        two fused multiply-adds."""
        h, cfg = self.holder, self.cfg
        key = (tuple(fb), tuple(bb), tuple(bw), tuple(pb), tuple(pw),
               cfg.bm25.k1, cfg.bm25.b, round(h.avg_doc_len, 6),
               cfg.bm25.bm25_type, h.num_postings)
        cached = getattr(h, "_ab_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1], cached[2]
        fld = h.post_field
        minpos = h.post_minpos.astype(np.float32)
        # pos2rank piecewise (ftconfig.h:126-144), vectorized
        p = minpos
        p2r = np.where(
            p <= 10, 1.0 - p / 100.0,
            np.where(p <= 100, 0.9 - p / 1000.0,
                     np.where(p <= 1000, 0.8 - p / 10000.0,
                              np.where(p <= 10000, 0.7 - p / 100000.0,
                                       np.where(p <= 100000, 0.6 - p / 1e6,
                                                0.5))))).astype(np.float32)
        fbv, bbv, bwv = fb[fld], bb[fld], bw[fld]
        posrank = (1.0 - pw[fld]) + p2r * pb[fld] * pw[fld]
        k1, b = cfg.bm25.k1, cfg.bm25.b
        wdoc = np.maximum(h.doc_words[h.post_doc], 1.0)
        if cfg.bm25.bm25_type == "word_count":
            X = h.post_tf
        else:
            tfq = (h.post_tf / wdoc if cfg.bm25.bm25_type == "classic"
                   else h.post_tf)
            X = tfq * (k1 + 1.0) / (tfq + k1 * (1.0 - b
                                                + b * wdoc / h.avg_doc_len))
        A = np.ascontiguousarray(fbv * (1.0 - bwv) * posrank, np.float32)
        B = np.ascontiguousarray(fbv * bbv * bwv * X * posrank, np.float32)
        # fully-folded rank PR = A + idf_word*B: idf is a corpus statistic
        # (word_ndocs/total_docs), so PR is query-independent too — the
        # dense merge then reads ONE float per posting instead of two
        if cfg.bm25.bm25_type == "word_count":
            beta = np.float32(1.0)
        else:
            widf = idf_host(h.total_docs, h.word_ndocs,
                            cfg.bm25.bm25_type).astype(np.float32)
            beta = np.repeat(widf, np.diff(h.word_start))
        PR = np.ascontiguousarray(A + beta * B, np.float32)
        h._ab_cache = (key, A, B, PR)
        return A, B

    def _score_host(self, q, prep, merge_k: int, use_prox: bool,
                    use_fm: bool, n_pos_terms: int):
        from .dataholder import _native_module
        native = _native_module()
        if native is None or not hasattr(native, "score_merge_runs"):
            return None
        if prep["G"] > self.HOST_SCORE_MAX:
            return None
        h, cfg = self.holder, self.cfg
        # dense merge when postings dwarf the per-doc combine/memset cost
        # and the [T, cap] accumulator stays modest
        t_real = len(prep["must"])
        entry = native.score_merge_runs
        dense = (prep["G"] >= self.DENSE_MIN
                 and hasattr(native, "score_merge_dense")
                 and prep["G"] >= h.total_docs // 4
                 and t_real * h.total_docs <= (1 << 26))
        if dense:
            entry = native.score_merge_dense
        fb, bb, bw, pb, pw = self._field_params(q)
        bm25_code = {"rx": 0, "classic": 1, "word_count": 2}.get(
            cfg.bm25.bm25_type, 0)
        fw = np.ascontiguousarray(h.field_words, dtype=np.int32)
        extra = ()
        run_idf = np.ascontiguousarray(prep["run_idf"], np.float32)
        if dense:
            self._ab_arrays(fb, bb, bw, pb, pw)
            if cfg.bm25.bm25_type == "word_count":
                run_idf = np.ones_like(run_idf)    # beta=1: B carries tf
            extra = (None, None, self.holder._ab_cache[3])
        # materialized per-word top-merge_k for frequent singles: a
        # single-term single-run ranking is a pure function of the word
        # up to the positive query scale rboost (which rank normalization
        # cancels), so the ~1M-posting C++ pass runs once per (word,
        # holder revision) — zipf-head singles go from ~20 ms to a dict
        # hit. Keyed on the AB-cache key (field params + postings count =
        # holder revision), the run span, merge_k and the fm/boost knobs.
        single = (t_real == 1 and len(prep["run_start"]) == 1
                  and not use_prox and dense and merge_k > 0
                  and not prep["notm"][0])
        skey = None
        if single:
            skey = (self.holder._ab_cache[0],
                    int(prep["run_start"][0]), int(prep["run_len"][0]),
                    int(merge_k), bool(use_fm), bm25_code,
                    float(prep["term_boost"][0]),
                    float(prep["term_lenb"][0]))
            cache = getattr(h, "_single_top_cache", None)
            if cache is None:
                cache = h._single_top_cache = {}
            hit = cache.get(skey)
            if hit is not None:
                docs0, scores0, rb0 = hit
                rb = float(prep["run_w"][0] * prep["term_boost"][0]
                           * prep["term_lenb"][0])
                if rb != rb0:
                    scores0 = scores0 * np.float32(rb / rb0)
                return scores0, docs0
        docs_raw, scores_raw = entry(
            np.ascontiguousarray(prep["run_start"], np.int64),
            np.ascontiguousarray(prep["run_len"], np.int64),
            np.ascontiguousarray(prep["run_term"], np.int32),
            np.ascontiguousarray(prep["run_w"], np.float32),
            run_idf,
            h.post_doc, h.post_field, h.post_tf, h.post_minpos,
            h.doc_words,
            np.ascontiguousarray(fb, np.float32),
            np.ascontiguousarray(bb, np.float32),
            np.ascontiguousarray(bw, np.float32),
            np.ascontiguousarray(pb, np.float32),
            np.ascontiguousarray(pw, np.float32),
            np.ascontiguousarray(prep["term_boost"], np.float32),
            np.ascontiguousarray(prep["term_lenb"], np.float32),
            np.ascontiguousarray(prep["must"], np.uint8),
            np.ascontiguousarray(prep["notm"], np.uint8),
            float(cfg.bm25.k1), float(cfg.bm25.b), float(h.avg_doc_len),
            bm25_code,
            float(cfg.distance_weight), float(cfg.distance_boost),
            1 if use_prox else 0,
            fw, int(fw.shape[0]), int(fw.shape[1]),
            int(n_pos_terms), 1 if use_fm else 0,
            float(cfg.full_match_boost), int(merge_k), *extra)
        docs = np.frombuffer(docs_raw, dtype=np.int32)
        scores = np.frombuffer(scores_raw, dtype=np.float32)
        if skey is not None:
            rb = float(prep["run_w"][0] * prep["term_boost"][0]
                       * prep["term_lenb"][0])
            cache[skey] = (docs, scores, rb)
            while len(cache) > 64:          # frequent words are few
                cache.pop(next(iter(cache)))
        return scores, docs

    def warm_frequent_singles(self, limit: int) -> int:
        """Pre-materialize the per-word top-k cache for the zipf head.

        A cold frequent single-term query is a ~20 ms/1M-posting 1-core
        host stream (measured round 5, docs/performance.md crossover
        table); the result is a pure function of the word + holder
        revision, so running the head words once at commit time turns
        every later cold single into a dict hit. Only words that would
        take the dense merge (>= DENSE_MIN postings) qualify — smaller
        words are already ~ms on the host. Returns the number warmed.
        """
        if limit <= 0 or self.mesh_ctx is not None:
            return 0
        h = self.holder
        if getattr(h, "word_start", None) is None or len(h.word_start) < 2:
            return 0
        counts = np.diff(h.word_start)
        eligible = np.nonzero(counts >= self.DENSE_MIN)[0]
        if eligible.size == 0:
            return 0
        order = eligible[np.argsort(counts[eligible])[::-1]][:limit]
        warmed = 0
        for wid in order:
            try:
                self.process(h.word_of(int(wid)))
                warmed += 1
            except Exception:
                continue   # a head word that fails to parse is skipped
        return warmed

    # ------------------------------------------------------------------
    # Device-resident dense scorer for frequent words (device_dense.py):
    # the reference's heaviest merges (multi-term zipf-head queries,
    # mergerimpl.h:95-124) move from the 1-core host stream onto the chip.
    # ------------------------------------------------------------------
    def _device_dense(self):
        if os.environ.get("RX_FT_DEVICE_DENSE", "1") in ("0", "false"):
            return None
        if self.mesh_ctx is not None:
            from .dataholder import _pad_pow2 as _cap_pow2
            if (_cap_pow2(max(len(self.holder.doc_words), 1))
                    % self.mesh_ctx.n_shards != 0):
                return None   # tiny corpus: cap won't shard evenly
        if self._ddense is None:
            from .device_dense import FtDeviceDense
            self._ddense = FtDeviceDense(self.holder, self.cfg, self)
        return self._ddense

    def _try_dense(self, q, prep, merge_k: int, use_prox: bool,
                   use_fm: bool, normalize: bool = True):
        """Single-query device-dense route; None -> host/device fallback.
        Single-TERM queries always stay on host: its one-pass merge +
        per-word materialized top-k cache beat a device round-trip.
        Returns ("norm", ranks, docs) when the device also normalized +
        min_rank-cut (packed download: half the tunnel bytes), else
        ("raw", scores, docs)."""
        import jax
        from .device_dense import DEVICE_MIN_SINGLE
        if (prep.get("_no_dense") or q.fields
                or len(prep["must"]) < 2
                or prep["G"] < DEVICE_MIN_SINGLE):
            return None
        dd = self._device_dense()
        if dd is None or not dd.ensure_built():
            return None
        pack = dd.pack_query(prep)
        if pack is None:
            return None
        packed = normalize and not q.phrase_distance and dd.packable
        if packed:
            pk, ovf = jax.device_get(dd.dispatch_batch(
                [pack], merge_k, use_prox, use_fm, packed=True))
            if bool(np.asarray(ovf)[0]):
                prep["_no_dense"] = True  # exactness fallback
                return None
            ranks, docs = dd.unpack_row(np.asarray(pk)[0])
            return "norm", ranks, docs
        sv, sd, ovf = dd.score_batch([pack], merge_k, use_prox, use_fm)
        if bool(ovf[0]):
            prep["_no_dense"] = True      # exactness fallback
            return None
        return "raw", sv[0], sd[0]

    # ------------------------------------------------------------------
    def process_batch(self, dsls: list[str]) -> list[FtSelectResult]:
        """Batched serving path: N DSL queries share ONE device program by
        occupying disjoint term-id blocks (scorer.score_and_merge_batch).
        Default field weights only (per-query @field lists fall back to
        per-query execution)."""
        h, cfg = self.holder, self.cfg
        empty = FtSelectResult(np.empty(0, dtype=np.int64),
                               np.empty(0, dtype=np.float32), set(), h)
        queries = [parse_ft_dsl(d) for d in dsls]
        if any(q.fields for q in queries):
            return [self.process_query(q) for q in queries]
        preps = [self._prepare(q) for q in queries]
        live = [i for i, p in enumerate(preps) if p is not None]
        if not live:
            return [empty for _ in queries]

        # routing: small gathers merge on host (C++ score_merge, ~1ms/query);
        # big ones group into pow2 gather-size BUCKETS with one device
        # program per bucket — the stacked program pads every query's sort
        # to the bucket max, so without bucketing one frequent word (zipf
        # skew: median G ~1e2, max ~1e6) taxes the whole batch
        from .dataholder import _native_module
        native = _native_module()
        host_ok = native is not None and hasattr(native, "score_merge_runs")
        # frequent queries whose variant words are all device-resident run
        # the dense device scorer in ONE stacked program (device_dense.py)
        from .device_dense import DEVICE_MIN as _DD_MIN
        dense_pairs, dense_set = [], set()
        dd = None
        if any(preps[i]["G"] >= _DD_MIN for i in live):
            dd = self._device_dense()
            if dd is not None and not dd.ensure_built():
                dd = None
        if dd is not None:
            for i in live:
                if preps[i]["G"] >= _DD_MIN and len(preps[i]["must"]) >= 2:
                    pack = dd.pack_query(preps[i])
                    if pack is not None:
                        dense_pairs.append((i, pack))
                        dense_set.add(i)
        small, big = [], []
        for i in live:
            if i in dense_set:
                continue
            if host_ok and preps[i]["G"] <= self.HOST_SCORE_MAX:
                small.append(i)
            else:
                big.append(i)

        # dispatch the dense-frequent program before anything blocks (its
        # device work pipelines behind bucket dispatches + host merges)
        dense_handle = None
        dense_packed = False
        if dense_pairs:
            prox_d = (cfg.distance_weight > 0.0
                      and any(len(preps[i]["terms"]) > 1
                              for i, _ in dense_pairs))
            # packed download (rank byte | doc in one i32) halves the
            # ~33 MB/s tunnel drain — the batched-serving bottleneck;
            # phrase queries need raw scores for post-verify renormalize
            dense_packed = (dd.packable and not any(
                queries[i].phrase_distance for i, _ in dense_pairs))
            dense_handle = dd.dispatch_batch(
                [p for _, p in dense_pairs],
                min(cfg.merge_limit, dd.cap), prox_d,
                cfg.full_match_boost != 1.0, packed=dense_packed)

        out: list[Optional[FtSelectResult]] = [empty] * len(queries)
        buckets: dict[int, list[int]] = {}
        for i in big:
            buckets.setdefault(_pad_pow2(preps[i]["G"]), []).append(i)
        dev = h.device_arrays() if big else None
        import jax.numpy as jnp
        fb = bb = bw = pb = pw = None
        if big:
            fb, bb, bw, pb, pw = self._field_params(queries[live[0]])
        # dispatch every bucket before blocking on any result (device work
        # pipelines behind the host merges below)
        staged = []
        for G, idxs in sorted(buckets.items()):
            t_count = _pad_pow2(max(len(preps[i]["terms"]) for i in idxs), 2)
            n_q = _pad_pow2(len(idxs), 2)
            cap = dev["cap"]
            merge_k = min(cfg.merge_limit, cap)
            use_prox = (cfg.distance_weight > 0.0
                        and any(len(preps[i]["terms"]) > 1 for i in idxs))
            if os.environ.get("RX_TPU_FT_DENSE", "") in ("1", "true"):
                scores, docs = self._batch_dense(
                    preps, idxs, n_q, t_count, cap, merge_k,
                    fb, bb, bw, pb, pw, dev, use_prox)
            else:
                scores, docs = self._batch_sorted(
                    preps, idxs, n_q, t_count, cap, merge_k,
                    fb, bb, bw, pb, pw, dev, use_prox)
            staged.append((idxs, scores, docs))

        for i in small:
            out[i] = self.process_query(queries[i], _prep=preps[i])

        import jax
        from ..core.rdxcontext import check_cancel
        for idxs, scores, docs in staged:
            check_cancel()      # between device dispatch and drain
            scores, docs = jax.device_get((scores, docs))
            scores, docs = np.asarray(scores), np.asarray(docs)
            for j, i in enumerate(idxs):
                q, p = queries[i], preps[i]
                s, d = scores[j], docs[j]
                keep = d >= 0
                s, d = s[keep], d[keep]
                if q.phrase_distance and len(d):
                    pm = self._verify_phrases(q, p["terms"], p["variants"],
                                              d)
                    s, d = s[pm], d[pm]
                d2, ranks = normalize_ranks(d, s, cfg.min_rank)
                out[i] = FtSelectResult(d2, ranks, p["matched_words"], h,
                                        matched_wids=p["matched_wids"])

        if dense_handle is not None and dense_packed:
            pk, ovf = jax.device_get(dense_handle)
            pk, ovf = np.asarray(pk), np.asarray(ovf)
            for j, (i, _) in enumerate(dense_pairs):
                q, p = queries[i], preps[i]
                if bool(ovf[j]):
                    p["_no_dense"] = True      # exactness fallback
                    out[i] = self.process_query(q, _prep=p)
                    continue
                ranks, d2 = dd.unpack_row(pk[j])
                out[i] = FtSelectResult(d2, ranks, p["matched_words"], h,
                                        matched_wids=p["matched_wids"])
        elif dense_handle is not None:
            sv, sdc, ovf = jax.device_get(dense_handle)
            sv, sdc, ovf = np.asarray(sv), np.asarray(sdc), np.asarray(ovf)
            for j, (i, _) in enumerate(dense_pairs):
                q, p = queries[i], preps[i]
                if bool(ovf[j]):
                    p["_no_dense"] = True      # exactness fallback
                    out[i] = self.process_query(q, _prep=p)
                    continue
                s, d = sv[j], sdc[j]
                keep = d >= 0
                s, d = s[keep], d[keep]
                if q.phrase_distance and len(d):
                    pm = self._verify_phrases(q, p["terms"], p["variants"],
                                              d)
                    s, d = s[pm], d[pm]
                d2, ranks = normalize_ranks(d, s, cfg.min_rank)
                out[i] = FtSelectResult(d2, ranks, p["matched_words"], h,
                                        matched_wids=p["matched_wids"])
        return out

    def _batch_sorted(self, preps, live, n_q, t_count, cap, merge_k,
                      fb, bb, bw, pb, pw, dev, use_prox):
        """Stacked [n_q, G] build for the sorted/segmented batch scorer —
        O(n_q*G) memory, no dense [n_q*t_count, cap] accumulator."""
        import jax.numpy as jnp
        cfg = self.cfg
        h = self.holder
        for i in live:
            self._gather_arrays(preps[i])
        G = _pad_pow2(max(len(preps[i]["g_idx"]) for i in live))
        g_idx = np.zeros((n_q, G), np.int32)
        g_term = np.zeros((n_q, G), np.int32)
        g_w = np.zeros((n_q, G), np.float32)
        g_idf = np.zeros((n_q, G), np.float32)
        term_boost = np.ones((n_q, t_count), np.float32)
        term_lenb = np.ones((n_q, t_count), np.float32)
        must = np.zeros((n_q, t_count), np.bool_)
        notm = np.zeros((n_q, t_count), np.bool_)
        n_pos = np.full(n_q, -1, np.int32)     # -1: never full-matches
        for j, i in enumerate(live):           # row j <-> query live[j]
            p = preps[i]
            n_pos[j] = int((~p["notm"]).sum()) or -1
            g = len(p["g_idx"])
            g_idx[j, :g] = p["g_idx"]
            g_term[j, :g] = p["g_term"]
            g_w[j, :g] = p["g_w"]
            g_idf[j, :g] = p["g_idf"]
            nt = len(p["terms"])
            term_boost[j, :nt] = p["term_boost"]
            term_lenb[j, :nt] = p["term_lenb"]
            must[j, :nt] = p["must"]
            notm[j, :nt] = p["notm"]
        from .scorer import score_and_merge_batch_sorted
        return score_and_merge_batch_sorted(
            jnp.asarray(g_idx), jnp.asarray(g_term), jnp.asarray(g_w),
            jnp.asarray(g_idf),
            dev["post_doc"], dev["post_field"], dev["post_tf"],
            dev["post_minpos"], dev["doc_words"],
            jnp.asarray(fb), jnp.asarray(bb), jnp.asarray(bw),
            jnp.asarray(pb), jnp.asarray(pw),
            jnp.asarray(term_boost), jnp.asarray(term_lenb),
            jnp.asarray(must), jnp.asarray(notm),
            cfg.bm25.k1, cfg.bm25.b, h.avg_doc_len,
            t_count, cap, merge_k, cfg.bm25.bm25_type,
            dist_w=cfg.distance_weight, dist_b=cfg.distance_boost,
            use_proximity=use_prox,
            field_words=dev["field_words"], n_terms=jnp.asarray(n_pos),
            fm_boost=cfg.full_match_boost,
            use_fullmatch=cfg.full_match_boost != 1.0)

    def _batch_dense(self, preps, live, n_q, t_count, cap, merge_k,
                     fb, bb, bw, pb, pw, dev, use_prox):
        """Legacy dense-accumulator batch (RX_TPU_FT_DENSE=1)."""
        import jax.numpy as jnp
        cfg = self.cfg
        h = self.holder
        parts_idx, parts_term, parts_w, parts_idf = [], [], [], []
        term_boost = np.ones(n_q * t_count, dtype=np.float32)
        term_lenb = np.ones(n_q * t_count, dtype=np.float32)
        must = np.zeros(n_q * t_count, dtype=np.bool_)
        notm = np.zeros(n_q * t_count, dtype=np.bool_)
        n_pos = np.full(n_q, -1, dtype=np.int32)   # -1: never full-matches
        for j, i in enumerate(live):           # row j <-> query live[j]
            p = self._gather_arrays(preps[i])
            n_pos[j] = int((~p["notm"]).sum()) or -1
            off = j * t_count
            parts_idx.append(p["g_idx"])
            parts_term.append(p["g_term"] + off)
            parts_w.append(p["g_w"])
            parts_idf.append(p["g_idf"])
            nt = len(p["terms"])
            term_boost[off: off + nt] = p["term_boost"]
            term_lenb[off: off + nt] = p["term_lenb"]
            must[off: off + nt] = p["must"]
            notm[off: off + nt] = p["notm"]
        g_idx = np.concatenate(parts_idx)
        g_term = np.concatenate(parts_term)
        g_w = np.concatenate(parts_w)
        g_idf = np.concatenate(parts_idf)
        gpad = _pad_pow2(len(g_idx))
        if gpad > len(g_idx):
            pad = gpad - len(g_idx)
            g_idx = np.concatenate([g_idx, np.zeros(pad, np.int32)])
            g_term = np.concatenate([g_term, np.zeros(pad, np.int32)])
            g_w = np.concatenate([g_w, np.zeros(pad, np.float32)])
            g_idf = np.concatenate([g_idf, np.zeros(pad, np.float32)])
        from .scorer import score_and_merge_batch
        return score_and_merge_batch(
            jnp.asarray(g_idx), jnp.asarray(g_term), jnp.asarray(g_w),
            jnp.asarray(g_idf),
            dev["post_doc"], dev["post_field"], dev["post_tf"],
            dev["post_minpos"], dev["doc_words"],
            jnp.asarray(fb), jnp.asarray(bb), jnp.asarray(bw),
            jnp.asarray(pb), jnp.asarray(pw),
            jnp.asarray(term_boost), jnp.asarray(term_lenb),
            jnp.asarray(must), jnp.asarray(notm),
            cfg.bm25.k1, cfg.bm25.b, h.avg_doc_len,
            n_q, t_count, cap, merge_k, cfg.bm25.bm25_type,
            dist_w=cfg.distance_weight, dist_b=cfg.distance_boost,
            use_proximity=use_prox,
            field_words=dev["field_words"],
            n_terms=jnp.asarray(n_pos),
            fm_boost=cfg.full_match_boost,
            use_fullmatch=cfg.full_match_boost != 1.0)

    # ------------------------------------------------------------------
    def _cjk_expand(self, q: FtDslQuery) -> FtDslQuery:
        from .tokenizer import _split_cjk
        seg = segmenter_for_config(self.cfg)
        split = lambda pat: _split_cjk(pat, self.cfg.extra_word_symbols, seg)
        needs = any(len(split(t.pattern)) > 1 for t in q.terms)
        if not needs:
            return q
        out = FtDslQuery(fields=q.fields,
                         phrase_distance=dict(q.phrase_distance))
        next_gid = max(out.phrase_distance, default=-1) + 1
        for t in q.terms:
            parts = split(t.pattern)
            if len(parts) == 1:
                if t.phrase_group >= 0:
                    # keep ordering consistent with spliced CJK positions
                    t = dataclasses.replace(t,
                                            phrase_pos=t.phrase_pos * 1000)
                out.terms.append(t)
                continue
            if t.phrase_group >= 0:
                # splice characters into the existing phrase keeping order
                for j, p in enumerate(parts):
                    out.terms.append(dataclasses.replace(
                        t, pattern=p, exact=True,
                        phrase_pos=t.phrase_pos * 1000 + j))
            else:
                gid = next_gid
                next_gid += 1
                out.phrase_distance[gid] = 1
                op = "not" if t.op == "not" else "must"
                for j, p in enumerate(parts):
                    out.terms.append(dataclasses.replace(
                        t, pattern=p, op=op, exact=True,
                        phrase_group=gid, phrase_pos=j))
        return out

    def _term_len_bound(self, k: float) -> float:
        """bound(termLenBoost, weight, boost) (ftconfig.h:146)."""
        f = self.cfg.default_field
        return (1.0 - f.term_len_weight) + k * f.term_len_boost * f.term_len_weight

    def _field_params(self, q: FtDslQuery):
        names = self.holder.field_names
        fpad = _pad_pow2(max(len(names), 1), 8)
        fb = np.zeros(fpad, dtype=np.float32)
        bb = np.ones(fpad, dtype=np.float32)
        bw = np.full(fpad, self.cfg.default_field.bm25_weight, dtype=np.float32)
        pb = np.ones(fpad, dtype=np.float32)
        pw = np.full(fpad, self.cfg.default_field.position_weight,
                     dtype=np.float32)
        sel = {f.name: f.boost for f in q.fields} if q.fields else None
        all_fields = sel is None or "*" in (sel or {})
        for i, name in enumerate(names):
            fcfg = self.cfg.fields.get(name, self.cfg.default_field)
            bb[i] = fcfg.bm25_boost
            bw[i] = fcfg.bm25_weight
            pb[i] = fcfg.position_boost
            pw[i] = fcfg.position_weight
            if all_fields:
                fb[i] = (sel or {}).get("*", 1.0)
            elif name in sel:
                fb[i] = sel[name]
        return fb, bb, bw, pb, pw

    # ------------------------------------------------------------------
    # variant expansion (reference: Selector::prepareVariants)
    # ------------------------------------------------------------------
    def _expand(self, t: FtTerm) -> dict[int, float]:
        h, cfg, procs = self.holder, self.cfg, self.cfg.procs
        out: dict[int, float] = {}

        def add(wid: Optional[int], proc: float) -> None:
            if wid is not None and proc > out.get(wid, 0.0) \
                    and len(out) < _MAX_VARIANT_WORDS:
                out[wid] = proc

        pat = t.pattern
        add(h.word_id(pat), float(procs.full_match))
        if t.exact:
            return out

        if t.prefix or t.suffix:
            matched = max(len(pat), 1)
            if t.prefix and not t.suffix:
                for wid in h.prefix_match_ids(pat):
                    unmatched = len(h.word_of(wid)) - len(pat)
                    add(wid, max(float(procs.prefix_min),
                                 procs.full_match
                                 - cfg.partial_match_decrease * unmatched / matched))
            elif t.suffix and not t.prefix:
                for wid in h.suffix_match_ids(pat):
                    unmatched = len(h.word_of(wid)) - len(pat)
                    add(wid, max(float(procs.suffix_min),
                                 procs.full_match
                                 - cfg.partial_match_decrease * unmatched / matched))
            else:
                # *term*: contains — scan vocab (bounded)
                cnt = 0
                for wid, w in enumerate(h.words):
                    if pat in w:
                        unmatched = len(w) - len(pat)
                        add(wid, max(float(procs.suffix_min),
                                     procs.full_match
                                     - cfg.partial_match_decrease * unmatched / matched))
                        cnt += 1
                        if cnt >= _MAX_VARIANT_WORDS:
                            break

        if t.typos:
            td = h.typo_dict
            for wid, ntypos in td.candidates(pat, h.word_id, h.word_of).items():
                # reference proc formula (variants/typos.h:82-86): penalty
                # scales with the typo count and shrinks for longer words
                wlen = len(h.word_of(wid))
                add(wid, max(1.0, procs.typo
                             - procs.typo_penalty * ntypos
                             / max((wlen - ntypos) / 3.0, 1.0)))

        # stem variants as prefix searches (reference: selecterimpl.h:204-220)
        if not t.prefix and not t.suffix:
            stem_proc = float(procs.full_match - procs.stemmer_penalty)
            for lang in cfg.stemmers:
                st = get_stemmer(lang)
                if st is None:
                    continue
                stem = st(pat)
                if len(stem) < _MIN_STEM_LEN or stem == pat:
                    continue
                for wid in h.prefix_match_ids(stem):
                    w = h.word_of(wid)
                    # guard against wildly longer words
                    if len(w) - len(stem) <= 4:
                        add(wid, stem_proc)

        if cfg.enable_translit:
            for v in translit_variants(pat):
                add(h.word_id(v), float(procs.translit))
        if cfg.enable_kb_layout:
            for v in kblayout_variants(pat):
                add(h.word_id(v), float(procs.kblayout))
        for alt in self.synonyms.for_term(pat):
            for tok in tokenize(alt, cfg.extra_word_symbols,
                    segmenter_for_config(cfg)):
                add(h.word_id(tok), float(procs.synonyms))
        return out

    # ------------------------------------------------------------------
    # phrase verification (host, positions CSR)
    # ------------------------------------------------------------------
    def _verify_phrases(self, q: FtDslQuery, terms: list[FtTerm],
                        variants: list[dict[int, float]],
                        docs: np.ndarray) -> np.ndarray:
        h = self.holder
        groups: dict[int, list[int]] = {}
        for i, t in enumerate(terms):
            if t.phrase_group >= 0:
                groups.setdefault(t.phrase_group, []).append(i)
        mask = np.ones(len(docs), dtype=np.bool_)
        native = h.native_module()
        use_native = (native is not None
                      and hasattr(native, "verify_phrases"))
        for gid, tidx in groups.items():
            tidx.sort(key=lambda i: terms[i].phrase_pos)
            dist = q.phrase_distance.get(gid, 1)
            if use_native:
                # batched C++ walk over the positions CSR (reference:
                # PhraseMerger, ft_fast/phrasemerger*.h) — one call per
                # phrase group for ALL candidate docs
                slot_ranges = [
                    np.ascontiguousarray(
                        np.asarray([h.posting_range(w)
                                    for w in variants[ti]],
                                   dtype=np.int64).reshape(-1, 2))
                    for ti in tidx]
                raw = native.verify_phrases(
                    np.ascontiguousarray(h.post_doc, dtype=np.int32),
                    np.ascontiguousarray(h.post_field, dtype=np.int32),
                    np.ascontiguousarray(h.pos_start, dtype=np.int64),
                    np.ascontiguousarray(h.pos_flat, dtype=np.int32),
                    np.ascontiguousarray(docs, dtype=np.int32),
                    slot_ranges, int(dist))
                mask &= np.frombuffer(raw, dtype=np.uint8).astype(bool)
                continue
            # pure-Python fallback (semantically identical; tests enforce)
            for di, doc in enumerate(docs):
                if not mask[di]:
                    continue
                if not self._phrase_in_doc(int(doc), tidx, variants, dist):
                    mask[di] = False
        return mask

    def _phrase_in_doc(self, doc: int, tidx: list[int],
                       variants: list[dict[int, float]], dist: int) -> bool:
        h = self.holder
        # field -> list of position sets per slot
        per_slot: list[dict[int, np.ndarray]] = []
        for ti in tidx:
            fields: dict[int, list[np.ndarray]] = {}
            for wid in variants[ti]:
                s, e = h.posting_range(wid)
                lo = s + int(np.searchsorted(h.post_doc[s:e], doc, "left"))
                hi = s + int(np.searchsorted(h.post_doc[s:e], doc, "right"))
                for p in range(lo, hi):
                    fields.setdefault(int(h.post_field[p]), []).append(
                        h.positions_of(p))
            if not fields:
                return False
            per_slot.append({f: np.unique(np.concatenate(v))
                             for f, v in fields.items()})
        for f in per_slot[0]:
            cur = per_slot[0][f]
            ok = True
            for nxt_slot in per_slot[1:]:
                nxt = nxt_slot.get(f)
                if nxt is None:
                    ok = False
                    break
                # need next position within (0, dist] after some current pos
                hits = []
                for d in range(1, dist + 1):
                    hits.append(nxt[np.isin(nxt, cur + d)])
                cur = np.unique(np.concatenate(hits)) if hits else np.empty(0)
                if len(cur) == 0:
                    ok = False
                    break
            if ok:
                return True
        return False
