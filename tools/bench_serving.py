"""Concurrent serving benchmark through the REAL HTTP server.

Measures single-stream vs N concurrent-connection qps for (a) single-query
KNN via SQL /query (the executor path: dispatch under the namespace lock,
drain outside it) and (b) hybrid KNN+FT RRF queries. The two-phase
dispatch/drain split should let N clients overlap their device round trips
(target: >= 3x single-stream on the tunnel-RTT-bound workload).

Usage: python tools/bench_serving.py [n=65536] [dims=128] [conns=8]
                                     [index=vec_bf|hnsw] [metric=l2|ip]

index=hnsw at n=1M is the VERDICT round-3 configuration: clustered
normalized vectors (the deep1m data model), ingested through REAL
namespace transactions in 100k-doc chunks (each commit flushes a chunk
into the pipelined exact-scan build).
"""
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def post_sql(port, db, sql):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v1/db/{db}/sqlquery",
        data=sql.encode(), method="POST",
        headers={"Content-Type": "text/plain"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def run_clients(port, sqls, conns, seconds=12.0):
    """Each client loops its SQL queries over ONE keep-alive connection for
    `seconds`; returns total qps. Errors don't kill the client (it reopens
    the connection and keeps going) — they are counted and reported, so a
    failing server shows up as an error count, not a fake qps number."""
    import http.client
    stop = time.time() + seconds
    counts = [0] * conns
    errs = []

    import socket as _socket

    def fresh_conn():
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        c.connect()
        c.sock.setsockopt(_socket.IPPROTO_TCP, _socket.TCP_NODELAY, 1)
        return c

    def client(ci):
        i = ci
        conn = fresh_conn()
        while time.time() < stop:
            sql = sqls[i % len(sqls)]
            try:
                conn.request("POST", "/api/v1/db/bench/sqlquery",
                             body=sql.encode(),
                             headers={"Content-Type": "text/plain"})
                r = conn.getresponse()
                body = r.read()
                if r.status != 200:
                    raise RuntimeError(f"HTTP {r.status}: {body[:200]!r}")
                json.loads(body)
                counts[ci] += 1
            except Exception as e:      # pragma: no cover
                errs.append(e)
                try:
                    conn.close()
                except Exception:
                    pass
                try:
                    conn = fresh_conn()
                except Exception:
                    time.sleep(0.05)
            i += 1
        conn.close()

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(conns)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        print(f"# run_clients: {len(errs)} errors, first: {errs[0]!r}",
              flush=True)
    return sum(counts) / (time.time() - t0)


def run_clients_rpc(port, sqls, conns, seconds=12.0):
    """RPC-plane analog of run_clients: each client thread owns ONE binary
    RPC connection (RpcReindexer pool of 1) and loops SQL selects."""
    from reindexer_tpu.net.rpc_client import RpcReindexer
    stop = time.time() + seconds
    counts = [0] * conns
    errs = []

    def client(ci):
        i = ci
        cl = RpcReindexer("127.0.0.1", port, "bench", conns=1)
        while time.time() < stop:
            try:
                cl.select(sqls[i % len(sqls)])
                counts[ci] += 1
            except Exception as e:      # pragma: no cover
                errs.append(e)
                time.sleep(0.05)
            i += 1
        cl.close()

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(conns)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        print(f"# run_clients_rpc: {len(errs)} errors, first: {errs[0]!r}",
              flush=True)
    return sum(counts) / (time.time() - t0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    conns = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    index = sys.argv[4] if len(sys.argv) > 4 else "vec_bf"
    metric = sys.argv[5] if len(sys.argv) > 5 else "l2"
    plane = sys.argv[6] if len(sys.argv) > 6 else "http"   # http|rpc|both

    from reindexer_tpu import (FloatVectorOpts, IndexDef, IndexOpts,
                               IndexType, VectorMetric)
    from reindexer_tpu.server.http import ReindexerServer

    srv = ReindexerServer(port=0)
    srv.start()
    port = srv.port
    db = srv.mgr.create("bench")
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(500)]
    itype = {"hnsw": IndexType.HNSW, "ivf": IndexType.IVF}.get(
        index, IndexType.VEC_BF)
    vm = VectorMetric.INNER_PRODUCT if metric == "ip" else VectorMetric.L2
    vopts = dict(dims=dims, metric=vm)
    if index == "ivf":
        # sqrt(n) lists, the bench_ivf1m convention
        vopts["centroids_count"] = max(64, int(n ** 0.5))
    db.open_namespace("items", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("vec", itype, vector_opts=FloatVectorOpts(**vopts)),
        IndexDef("text", "text", "string"),
    ])
    if index in ("hnsw", "ivf"):
        # clustered normalized data (the deep1m model — HNSW on isotropic
        # gaussians is the degenerate no-structure case)
        nc = 1024
        centers = rng.normal(size=(nc, dims)).astype(np.float32)
        base = (centers[rng.integers(0, nc, size=n)]
                + 0.25 * rng.normal(size=(n, dims)).astype(np.float32))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        base = base.astype(np.float32)
    else:
        base = rng.normal(size=(n, dims)).astype(np.float32)
    texts = np.random.default_rng(1).integers(0, len(words), size=(n, 6))
    t0 = time.time()
    for c0 in range(0, n, 100_000):
        tx = db.new_transaction("items")
        for i in range(c0, min(c0 + 100_000, n)):
            tx.upsert({"id": i, "vec": base[i].tolist(),
                       "text": " ".join(words[j] for j in texts[i])})
        tx.commit()
        print(f"# chunk {c0 + 100_000:>8}/{n} at {time.time()-t0:.0f}s",
              flush=True)
    print(f"# loaded {n} docs in {time.time()-t0:.1f}s", flush=True)

    if index == "hnsw":
        qvecs = [(base[int(j)] + 0.05 * rng.normal(size=dims)
                  ).astype(np.float32)
                 for j in rng.integers(0, n, size=32)]
    else:
        qvecs = [rng.normal(size=dims).astype(np.float32)
                 for _ in range(32)]
    # nprobe rides the SQL for IVF so the serving numbers are at a
    # realistic recall point (generic KNN params default nprobe=1)
    extra = ", nprobe=16" if index == "ivf" else ""
    knn_sqls = [
        "SELECT id FROM items WHERE KNN(vec, [" +
        ",".join(f"{v:.4f}" for v in q) + f"], k=10{extra}) LIMIT 10"
        for q in qvecs]
    hybrid_sqls = [
        "SELECT id FROM items WHERE KNN(vec, [" +
        ",".join(f"{v:.4f}" for v in q) + f"], k=50{extra}) AND text = '" +
        words[i % 50] + "' LIMIT 10"
        for i, q in enumerate(qvecs)]

    # warm the dynamic-batch shape buckets (deployment warmup: the batcher
    # pads coalesced dispatches to B in dynbatch.BUCKETS; compile each
    # bucket once so serving never hits a remote compile). Params must
    # match what the SQL path constructs — dynbatch keys on the params
    # fingerprint.
    from reindexer_tpu.index.vector.params import (IvfSearchParams,
                                                   KnnSearchParams)
    from reindexer_tpu.query import dynbatch
    ix = db.get_namespace("items").get_index("vec")
    t0 = time.time()
    for kk in (10, 50):
        pp = (IvfSearchParams(k=kk, nprobe=16) if index == "ivf"
              else KnnSearchParams(k=kk))
        for b in dynbatch.BUCKETS:
            qb = np.stack([qvecs[i % len(qvecs)] for i in range(b)])
            ix.select_batch(qb.astype(np.float32), pp)
    print(f"# warmed dynbatch buckets {dynbatch.BUCKETS} in "
          f"{time.time()-t0:.1f}s", flush=True)

    if plane in ("http", "both"):
        for name, sqls in (("knn", knn_sqls), ("hybrid", hybrid_sqls)):
            post_sql(port, "bench", sqls[0])      # warm
            q1 = run_clients(port, sqls, 1)
            qn = run_clients(port, sqls, conns)
            print(f"# serving {name}: 1-conn {q1:.1f} qps, {conns}-conn "
                  f"{qn:.1f} qps, speedup {qn/max(q1,1e-9):.2f}x", flush=True)
    if plane in ("rpc", "both"):
        from reindexer_tpu.net.rpc_server import RpcServer
        rsrv = RpcServer(mgr=srv.mgr)
        rsrv.start()
        for name, sqls in (("knn", knn_sqls), ("hybrid", hybrid_sqls)):
            run_clients_rpc(rsrv.port, sqls, 1, seconds=2.0)   # warm
            q1 = run_clients_rpc(rsrv.port, sqls, 1)
            qn = run_clients_rpc(rsrv.port, sqls, conns)
            print(f"# serving-rpc {name}: 1-conn {q1:.1f} qps, {conns}-conn "
                  f"{qn:.1f} qps, speedup {qn/max(q1,1e-9):.2f}x", flush=True)
        rsrv.stop()
    srv.stop()


if __name__ == "__main__":
    main()
