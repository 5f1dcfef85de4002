"""Worker for the 2-process local-cluster test (tests/test_multihost.py).

Each process owns 4 virtual CPU devices; jax.distributed joins them into one
8-device runtime (the single-host stand-in for SURVEY §2.4's multi-host DCN
plane — same code path a real multi-host TPU deployment uses). Runs the
sharded KNN select + a distributed BM25-style psum leg across the
process-spanning mesh and oracle-checks both.

Usage: multihost_worker.py <process_id> <num_processes> <coordinator_port>
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
# the launcher (tests/test_multihost.py) sets JAX_PLATFORMS=cpu and
# --xla_force_host_platform_device_count=4 in the environment BEFORE the
# interpreter starts: any in-process env mutation is too late when site
# hooks import jax at startup
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax  # noqa: E402

try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from reindexer_tpu.parallel.mesh import (  # noqa: E402
    global_put, init_distributed, make_mesh)

# NOTE: reindexer_tpu.ops.distance builds a device constant at import time,
# which would initialize the XLA backend — import compute modules only
# AFTER jax.distributed is up
assert init_distributed(f"127.0.0.1:{port}", nproc, pid)
from reindexer_tpu.core.type_consts import VectorMetric  # noqa: E402
from reindexer_tpu.parallel.sharded_knn import build_sharded_knn  # noqa: E402
assert jax.device_count() == 4 * nproc, jax.device_count()
assert jax.local_device_count() == 4

from jax.sharding import PartitionSpec as P  # noqa: E402

mesh = make_mesh()                      # spans both processes
rng = np.random.default_rng(7)          # identical data in every process
n, d, Q, k = 1024, 32, 4, 10
base = rng.normal(size=(n, d)).astype(np.float32)
valid = np.ones(n, dtype=bool)
valid[5] = False
sq = (base * base).sum(1).astype(np.float32)
q = rng.normal(size=(Q, d)).astype(np.float32)

base_g = global_put(mesh, base, P("shards", None))
valid_g = global_put(mesh, valid, P("shards"))
sq_g = global_put(mesh, sq, P("shards"))
q_g = global_put(mesh, q, P(None, None))

fn = build_sharded_knn(mesh, k, VectorMetric.L2)
scores, ids = fn(q_g, base_g, valid_g, sq_g)
ids = np.asarray(jax.device_get(ids))

dm = ((q[:, None, :] - base[None, :, :]) ** 2).sum(-1)
dm[:, ~valid] = np.inf
want = np.argsort(dm, axis=1)[:, :k]
for b in range(Q):
    assert set(ids[b].tolist()) == set(want[b].tolist()), (b, ids[b], want[b])

# distributed BM25-style leg: per-shard partial term-frequency scores summed
# with a cross-host psum (the collective the sharded FT merge rides)
from jax import shard_map  # noqa: E402
import jax.numpy as jnp  # noqa: E402

tf = rng.poisson(1.0, size=(n,)).astype(np.float32)
tf_g = global_put(mesh, tf, P("shards"))


def bm25_sum(tf_loc):
    part = jnp.sum(tf_loc / (tf_loc + 1.2), keepdims=True)
    return jax.lax.psum(part, "shards")


got = float(np.asarray(jax.device_get(shard_map(
    bm25_sum, mesh=mesh, in_specs=(P("shards"),), out_specs=P(None),
    check_vma=False)(tf_g)))[0])
want_sum = float((tf / (tf + 1.2)).sum())
assert abs(got - want_sum) < 1e-2 * max(1.0, abs(want_sum)), (got, want_sum)

# ---- engine-level leg (VERDICT r4 #3): the SAME `Reindexer(mesh=...)`
# facade the single-host mesh tests drive, now over a process-spanning
# mesh — every process executes the identical SPMD program and holds the
# identical host-side payload (the reference analog: every shard node runs
# the same proxied query plan, core/shardingproxy.cc).
from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts,  # noqa: E402
                           IndexType, Query, Reindexer)
from reindexer_tpu.index.vector.params import BruteForceSearchParams  # noqa: E402
from reindexer_tpu.parallel.context import MeshContext  # noqa: E402

ctx = MeshContext(mesh, "shards")
db = Reindexer(mesh=ctx)
db.open_namespace("items", [
    IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
    IndexDef("grp", "hash", "int"),
    IndexDef("vec", IndexType.VEC_BF, vector_opts=FloatVectorOpts(
        dims=d, metric=VectorMetric.L2)),
])
tx = db.new_transaction("items")
for i in range(n):
    tx.upsert({"id": i, "grp": i % 3, "vec": base[i].tolist()})
tx.commit()
res = db.select(Query("items").where_knn(
    "vec", q[0], BruteForceSearchParams(k=k)))
got = [doc["id"] for doc in res.docs()]
dm2 = ((q[0][None, :] - base) ** 2).sum(-1)
want2 = np.argsort(dm2)[:k]
assert set(got) == set(want2.tolist()), (got, want2)

# filtered KNN through the executor (mask algebra: the KNN entry yields
# its top-k mask, AND-composed with the scalar filter — reference
# semantics: hybrid conditions intersect, query/executor.py)
res = db.select(Query("items").where("grp", "=", 1)
                .where_knn("vec", q[1], BruteForceSearchParams(k=k)))
got = [doc["id"] for doc in res.docs()]
dm3 = ((q[1][None, :] - base) ** 2).sum(-1)
want3 = [i for i in np.argsort(dm3)[:k].tolist() if i % 3 == 1]
assert set(got) == set(want3), (got, want3)

print(f"MULTIHOST_OK pid={pid} devices={jax.device_count()}", flush=True)
