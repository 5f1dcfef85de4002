"""Mesh mode must actually SCALE, not just match the oracle (VERDICT r4
weak #5): the resident state of a mesh-attached index has to be
row-partitioned across every device (per-shard bytes ∝ n/S — the layout
that makes the shard_map scan's per-device work ∝ n/S, the reference's
shard-by-rows model, cpp_src/core/shardingproxy.cc), and the jitted
shard_map selects must reuse pow2-bucketed compile keys instead of
compiling per distinct k.
"""
import numpy as np
import pytest

from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts, IndexType,
                           Query, Reindexer, VectorMetric)
from reindexer_tpu import QuantizationConfig
from reindexer_tpu.index.vector.params import BruteForceSearchParams
from reindexer_tpu.parallel.context import make_mesh_context

S = 8


@pytest.fixture(scope="module")
def ctx():
    return make_mesh_context(S)


def _defs(dims, **vo):
    return [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("vec", IndexType.VEC_BF,
                 vector_opts=FloatVectorOpts(dims=dims, **vo)),
    ]


def _fill(db, ns, base):
    tx = db.new_transaction(ns)
    for i, v in enumerate(base):
        tx.upsert({"id": i, "vec": v.tolist()})
    tx.commit()


def _shard_rows(arr):
    """Distinct devices holding the array and the per-device row counts."""
    shards = arr.addressable_shards
    devs = {sh.device for sh in shards}
    rows = sorted(sh.data.shape[0] for sh in shards)
    return devs, rows


def test_bf_mesh_state_is_row_partitioned(ctx, rng):
    n, dims = 4096, 16
    base = rng.normal(size=(n, dims)).astype(np.float32)
    db = Reindexer(mesh=ctx)
    db.open_namespace("sc", _defs(dims, metric=VectorMetric.L2))
    _fill(db, "sc", base)
    kp = db.get_namespace("sc").get_index("vec").keeper
    kp.flush()                   # materialize pending rows on the mesh
    assert kp.count == n and kp.capacity >= n
    for arr in (kp.data, kp.valid, kp.sq):
        devs, rows = _shard_rows(arr)
        assert len(devs) == S, "resident array must span every device"
        # equal row partitions of the capacity => per-shard scan work n/S
        assert rows == [kp.capacity // S] * S


def test_bf_mesh_per_shard_rows_track_n(ctx, rng):
    """Doubling n doubles the per-shard partition (work ∝ n/S, not ∝ n)."""
    dims = 16
    per_shard = {}
    for n in (2048, 4096):
        base = np.random.default_rng(n).normal(
            size=(n, dims)).astype(np.float32)
        db = Reindexer(mesh=ctx)
        db.open_namespace(f"sc{n}", _defs(dims, metric=VectorMetric.L2))
        _fill(db, f"sc{n}", base)
        kp = db.get_namespace(f"sc{n}").get_index("vec").keeper
        kp.flush()
        _, rows = _shard_rows(kp.data)
        assert kp.count == n
        assert rows == [kp.capacity // S] * S
        per_shard[n] = rows[0]
    assert per_shard[4096] == 2 * per_shard[2048]


def test_bf_mesh_jit_keys_bucket_pow2(ctx, rng):
    """Distinct k values inside one pow2 bucket share ONE shard_map
    compile (CLAUDE.md recompile rule; VERDICT r4 weak #5)."""
    n, dims = 1024, 16
    base = rng.normal(size=(n, dims)).astype(np.float32)
    db = Reindexer(mesh=ctx)
    db.open_namespace("sk", _defs(dims, metric=VectorMetric.L2))
    _fill(db, "sk", base)
    idx = db.get_namespace("sk").get_index("vec")
    q = rng.normal(size=(dims,)).astype(np.float32)
    d2 = ((base - q) ** 2).sum(1)
    for k in (5, 7, 8):           # one bucket: kpad=8
        res = db.select(Query("sk").where_knn(
            "vec", q, BruteForceSearchParams(k=k)))
        assert [d["id"] for d in res.docs()] == np.argsort(d2)[:k].tolist()
    assert len(idx._mesh_fns) == 1
    for k in (9, 12, 16):         # one more bucket: kpad=16
        db.select(Query("sk").where_knn("vec", q,
                                        BruteForceSearchParams(k=k)))
    assert len(idx._mesh_fns) == 2


def test_bf_mesh_sq8_codes_are_row_partitioned(ctx, rng):
    """The sharded SQ8 codes layout (VERDICT r4 #3): approx mode's resident
    uint8 codes partition like the fp32 rows — the quantized sweep's
    per-shard bytes are n/S/4, not a per-call reshard."""
    n, dims = 4096, 16
    base = rng.normal(size=(n, dims)).astype(np.float32)
    db = Reindexer(mesh=ctx)
    db.open_namespace("sq", _defs(
        dims, metric=VectorMetric.L2,
        quantization=QuantizationConfig(enabled=True, mode="approx",
                                        min_elements=256)))
    _fill(db, "sq", base)
    idx = db.get_namespace("sq").get_index("vec")
    q = rng.normal(size=(dims,)).astype(np.float32)
    res = db.select(Query("sq").where_knn("vec", q,
                                          BruteForceSearchParams(k=10)))
    assert len(res.docs()) == 10   # engage the quantized mesh path first
    assert idx._quant is not None and idx._quant.active
    devs, rows = _shard_rows(idx._quant.codes)
    assert len(devs) == S
    assert rows == [idx.keeper.capacity // S] * S
