"""Distributed BM25 over the virtual device mesh: sharded scoring must match
the single-chip scorer exactly (IDF from global doc freqs)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reindexer_tpu.ft.config import FtFastConfig
from reindexer_tpu.ft.dataholder import FtDataHolder
from reindexer_tpu.ft.scorer import idf_host, score_and_merge
from reindexer_tpu.parallel.mesh import make_mesh
from reindexer_tpu.parallel.sharded_ft import (build_sharded_bm25,
                                               shard_postings)


def test_sharded_bm25_matches_single_chip(rng):
    n_docs = 64
    vocab = [f"w{i}" for i in range(40)]
    docs = [(i, [" ".join(rng.choice(vocab, size=12))])
            for i in range(n_docs)]
    cfg = FtFastConfig()
    holder = FtDataHolder(cfg, ["text"])
    holder.build(docs, n_docs)

    # one query term: all postings of word "w1" (+ "w2" as second term)
    terms = []
    for t_idx, w in enumerate(["w1", "w2"]):
        wid = holder.word_id(w)
        if wid is None:
            continue
        s, e = holder.posting_range(wid)
        idf = idf_host(holder.total_docs,
                       holder.word_ndocs[np.asarray([wid])], "rx")[0]
        terms.append((t_idx, np.arange(s, e, dtype=np.int32), idf))
    g_idx = np.concatenate([t[1] for t in terms])
    g_term = np.concatenate([np.full(len(t[1]), t[0], dtype=np.int32)
                             for t in terms])
    g_w = np.ones(len(g_idx), dtype=np.float32)
    g_idf = np.concatenate([np.full(len(t[1]), t[2], dtype=np.float32)
                            for t in terms])
    gpad = 64
    pad = gpad - len(g_idx)
    g_idx_p = np.concatenate([g_idx, np.zeros(pad, np.int32)])
    g_term_p = np.concatenate([g_term, np.zeros(pad, np.int32)])
    g_w_p = np.concatenate([g_w, np.zeros(pad, np.float32)])
    g_idf_p = np.concatenate([g_idf, np.zeros(pad, np.float32)])

    t_count, merge_k = 2, 16
    fpad = 8
    fb = np.zeros(fpad, np.float32)
    fb[0] = 1.0
    bb = np.ones(fpad, np.float32)
    bw = np.full(fpad, 0.1, np.float32)
    pb = np.ones(fpad, np.float32)
    pw = np.full(fpad, 0.1, np.float32)
    tb = np.ones(t_count, np.float32)
    tlb = np.ones(t_count, np.float32)
    must = np.zeros(t_count, bool)
    notm = np.zeros(t_count, bool)

    # single-chip reference
    dev = holder.device_arrays()
    s1, i1 = score_and_merge(
        jnp.asarray(g_idx_p), jnp.asarray(g_term_p), jnp.asarray(g_w_p),
        jnp.asarray(g_idf_p),
        dev["post_doc"], dev["post_field"], dev["post_tf"],
        dev["post_minpos"], dev["doc_words"],
        jnp.asarray(fb), jnp.asarray(bb), jnp.asarray(bw), jnp.asarray(pb),
        jnp.asarray(pw), jnp.asarray(tb), jnp.asarray(tlb),
        jnp.asarray(must), jnp.asarray(notm),
        cfg.bm25.k1, cfg.bm25.b, holder.avg_doc_len,
        t_count, dev["cap"], merge_k, "rx")
    s1, i1 = np.asarray(s1), np.asarray(i1)

    # sharded over the virtual mesh
    n_shards = 4
    cap_per = 32   # 64 docs + padding -> 32 per shard over 4 shards? 64/4=16
    cap_per = 16
    mesh = make_mesh(n_shards, axis_names=("shards",))
    packed, dw, remap_shard, remap_local, ppad, fw = shard_postings(
        holder, n_shards, cap_per)
    # rebuild per-shard gathers from the global gather list
    G = 32
    sg_idx = np.zeros((n_shards, G), np.int32)
    sg_term = np.zeros((n_shards, G), np.int32)
    sg_w = np.zeros((n_shards, G), np.float32)
    sg_idf = np.zeros((n_shards, G), np.float32)
    fill = [0] * n_shards
    for j in range(len(g_idx)):
        s = remap_shard[g_idx[j]]
        p = fill[s]
        sg_idx[s, p] = remap_local[g_idx[j]]
        sg_term[s, p] = g_term[j]
        sg_w[s, p] = g_w[j]
        sg_idf[s, p] = g_idf[j]
        fill[s] += 1

    fn = build_sharded_bm25(mesh, t_count, cap_per, merge_k, "rx")
    scalars = np.asarray([cfg.bm25.k1, cfg.bm25.b, holder.avg_doc_len],
                         np.float32)
    s2, i2 = fn(jnp.asarray(sg_idx), jnp.asarray(sg_term),
                jnp.asarray(sg_w), jnp.asarray(sg_idf),
                jnp.asarray(packed["post_doc"]),
                jnp.asarray(packed["post_field"]),
                jnp.asarray(packed["post_tf"]),
                jnp.asarray(packed["post_minpos"]),
                jnp.asarray(dw), jnp.asarray(fw),
                jnp.asarray(fb), jnp.asarray(bb), jnp.asarray(bw),
                jnp.asarray(pb), jnp.asarray(pw), jnp.asarray(tb),
                jnp.asarray(tlb), jnp.asarray(must), jnp.asarray(notm),
                jnp.asarray(scalars))
    s2, i2 = np.asarray(s2), np.asarray(i2)

    valid1 = i1 >= 0
    valid2 = i2 >= 0
    assert valid1.sum() == valid2.sum()
    np.testing.assert_allclose(s2[valid2], s1[valid1], rtol=1e-5)
    assert i2[valid2].tolist() == i1[valid1].tolist()


def test_sharded_bm25_three_terms_uneven_fill(rng):
    """3-term query, non-uniform term weights, and a deliberately
    underfilled last shard (n_docs not a multiple of cap_per_shard):
    sharded scoring must stay exactly equal to the single-chip merge."""
    n_docs = 50                       # 4 shards x cap 16 -> last holds 2
    n_shards, cap_per = 4, 16
    vocab = [f"w{i}" for i in range(25)]
    docs = [(i, [" ".join(rng.choice(vocab, size=10))])
            for i in range(n_docs)]
    cfg = FtFastConfig()
    holder = FtDataHolder(cfg, ["text"])
    holder.build(docs, n_docs)

    t_count, merge_k = 3, 20
    weights = [1.0, 0.7, 0.4]
    terms = []
    for t_idx, w in enumerate(["w1", "w2", "w3"]):
        wid = holder.word_id(w)
        assert wid is not None
        s, e = holder.posting_range(wid)
        idf = idf_host(holder.total_docs,
                       holder.word_ndocs[np.asarray([wid])], "rx")[0]
        terms.append((t_idx, np.arange(s, e, dtype=np.int32), idf))
    g_idx = np.concatenate([t[1] for t in terms])
    g_term = np.concatenate([np.full(len(t[1]), t[0], dtype=np.int32)
                             for t in terms])
    g_w = np.concatenate([np.full(len(t[1]), weights[t[0]], np.float32)
                          for t in terms])
    g_idf = np.concatenate([np.full(len(t[1]), t[2], dtype=np.float32)
                            for t in terms])
    gpad = 1
    while gpad < len(g_idx):
        gpad *= 2
    pad = gpad - len(g_idx)
    g_idx_p = np.concatenate([g_idx, np.zeros(pad, np.int32)])
    g_term_p = np.concatenate([g_term, np.zeros(pad, np.int32)])
    g_w_p = np.concatenate([g_w, np.zeros(pad, np.float32)])
    g_idf_p = np.concatenate([g_idf, np.zeros(pad, np.float32)])

    fpad = 8
    fb = np.zeros(fpad, np.float32)
    fb[0] = 1.0
    bb = np.ones(fpad, np.float32)
    bw = np.full(fpad, 0.1, np.float32)
    pb = np.ones(fpad, np.float32)
    pw = np.full(fpad, 0.1, np.float32)
    tb = np.ones(t_count, np.float32)
    tlb = np.ones(t_count, np.float32)
    must = np.zeros(t_count, bool)
    notm = np.zeros(t_count, bool)

    dev = holder.device_arrays()
    s1, i1 = score_and_merge(
        jnp.asarray(g_idx_p), jnp.asarray(g_term_p), jnp.asarray(g_w_p),
        jnp.asarray(g_idf_p),
        dev["post_doc"], dev["post_field"], dev["post_tf"],
        dev["post_minpos"], dev["doc_words"],
        jnp.asarray(fb), jnp.asarray(bb), jnp.asarray(bw), jnp.asarray(pb),
        jnp.asarray(pw), jnp.asarray(tb), jnp.asarray(tlb),
        jnp.asarray(must), jnp.asarray(notm),
        cfg.bm25.k1, cfg.bm25.b, holder.avg_doc_len,
        t_count, dev["cap"], merge_k, "rx")
    s1, i1 = np.asarray(s1), np.asarray(i1)

    mesh = make_mesh(n_shards, axis_names=("shards",))
    packed, dw, remap_shard, remap_local, ppad, fw = shard_postings(
        holder, n_shards, cap_per)
    G = gpad
    sg_idx = np.zeros((n_shards, G), np.int32)
    sg_term = np.zeros((n_shards, G), np.int32)
    sg_w = np.zeros((n_shards, G), np.float32)
    sg_idf = np.zeros((n_shards, G), np.float32)
    fill = [0] * n_shards
    for j in range(len(g_idx)):
        s = remap_shard[g_idx[j]]
        p = fill[s]
        sg_idx[s, p] = remap_local[g_idx[j]]
        sg_term[s, p] = g_term[j]
        sg_w[s, p] = g_w[j]
        sg_idf[s, p] = g_idf[j]
        fill[s] += 1

    fn = build_sharded_bm25(mesh, t_count, cap_per, merge_k, "rx")
    scalars = np.asarray([cfg.bm25.k1, cfg.bm25.b, holder.avg_doc_len],
                         np.float32)
    s2, i2 = fn(jnp.asarray(sg_idx), jnp.asarray(sg_term),
                jnp.asarray(sg_w), jnp.asarray(sg_idf),
                jnp.asarray(packed["post_doc"]),
                jnp.asarray(packed["post_field"]),
                jnp.asarray(packed["post_tf"]),
                jnp.asarray(packed["post_minpos"]),
                jnp.asarray(dw), jnp.asarray(fw),
                jnp.asarray(fb), jnp.asarray(bb), jnp.asarray(bw),
                jnp.asarray(pb), jnp.asarray(pw), jnp.asarray(tb),
                jnp.asarray(tlb), jnp.asarray(must), jnp.asarray(notm),
                jnp.asarray(scalars))
    s2, i2 = np.asarray(s2), np.asarray(i2)

    valid1 = i1 >= 0
    valid2 = i2 >= 0
    assert valid1.sum() == valid2.sum() and valid1.sum() > 0
    np.testing.assert_allclose(s2[valid2], s1[valid1], rtol=1e-5)
    assert i2[valid2].tolist() == i1[valid1].tolist()
