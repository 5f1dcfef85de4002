"""Binary RPC protocol tests (models reference cproto behavior:
bindings/cproto + server/rpcserver.cc verbs, cursor paging, tx, errors)."""
import numpy as np
import pytest

from reindexer_tpu import (IndexDef, IndexOpts, NotFoundError, Query,
                           QueryError)
from reindexer_tpu.net.rpc_client import RpcReindexer
from reindexer_tpu.net.rpc_server import RpcServer
from reindexer_tpu.net.serializer import decode_args, encode_args


def test_serializer_roundtrip():
    vals = [0, 1, -1, 2**40, -(2**40), 3.5, -0.25, "строка", b"\x00\xff",
            True, False, None, [1, "a", [2.5, None]], []]
    assert decode_args(encode_args(vals)) == vals


@pytest.fixture(scope="module")
def server():
    srv = RpcServer(port=0)
    srv.start()
    yield srv
    srv.stop()


@pytest.fixture
def client(server):
    c = RpcReindexer("127.0.0.1", server.port, "rpcdb")
    yield c
    c.close()


IDX = [IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
       IndexDef("year", "tree", "int")]


def test_rpc_crud_select(client):
    assert client.ping()
    client.open_namespace("r", IDX)
    for i in range(10):
        client.upsert("r", {"id": i, "year": 2000 + i})
    assert "r" in client.namespace_names()
    res = client.select(Query("r").where("year", ">", 2005).sort("id"))
    assert [d["id"] for d in res.docs()] == [6, 7, 8, 9]
    res2 = client.select("SELECT * FROM r WHERE id = 3")
    assert res2.docs()[0]["year"] == 2003
    # aggregations over the wire
    res3 = client.select(Query("r").aggregate_sum("year"))
    assert res3.aggregations[0].value == sum(2000 + i for i in range(10))
    client.delete("r", {"id": 3})
    assert len(client.select(Query("r").where("id", "=", 3))) == 0


def test_rpc_cursor_paging(server):
    c = RpcReindexer("127.0.0.1", server.port, "rpcdb", fetch_limit=7)
    try:
        c.open_namespace("big", IDX)
        for i in range(50):
            c.upsert("big", {"id": i, "year": i})
        res = c.select(Query("big").sort("id"))
        assert len(res) == 50
        assert [d["id"] for d in res.docs()] == list(range(50))
    finally:
        c.close()


def test_rpc_tx(client):
    client.open_namespace("t", IDX)
    tx = client.new_transaction("t")
    tx.upsert({"id": 100, "year": 2100})
    tx.upsert({"id": 101, "year": 2101})
    assert tx.commit() == 2
    assert len(client.select(Query("t"))) == 2
    tx2 = client.new_transaction("t")
    tx2.upsert({"id": 102, "year": 2102})
    tx2.rollback()
    assert len(client.select(Query("t"))) == 2


def test_rpc_meta_and_errors(client):
    client.open_namespace("m", IDX)
    client.put_meta("m", "k", "v")
    assert client.get_meta("m", "k") == "v"
    with pytest.raises(NotFoundError):
        client.drop_namespace("missing_ns")
    with pytest.raises(QueryError):
        client.select("THIS IS NOT SQL")


def test_replication_over_rpc(server):
    from reindexer_tpu import Reindexer
    from reindexer_tpu.replication import (AsyncReplicator, ReplicationState,
                                           RpcLeaderChannel)
    leader = server.mgr.create("repldb")
    state = ReplicationState(leader)
    leader.open_namespace("t", IDX)
    leader.upsert("t", {"id": 1, "year": 2001})
    leader.upsert("t", {"id": 2, "year": 2002})
    follower = Reindexer()
    chan = RpcLeaderChannel("127.0.0.1", server.port, "repldb")
    repl = AsyncReplicator(follower, chan)
    repl.sync_once()
    assert sorted(d["id"] for d in follower.select(Query("t")).docs()) == [1, 2]


def test_clientsstats_registration():
    """#clientsstats lists connected RPC clients and drops them on
    disconnect (reference: clientsstats.h)."""
    import time
    from reindexer_tpu import IndexDef, IndexOpts, Query
    from reindexer_tpu.net.rpc_client import RpcReindexer
    from reindexer_tpu.net.rpc_server import RpcServer
    srv = RpcServer()
    srv.start()
    try:
        cl = RpcReindexer("127.0.0.1", srv.port, db="cdb")
        cl.open_namespace("n", [IndexDef("id", "hash", "int",
                                         opts=IndexOpts(is_pk=True))])
        cl.upsert("n", {"id": 1})
        db = srv.mgr.get("cdb")
        rows = db.select(Query("#clientsstats")).docs()
        assert len(rows) == 1 and rows[0]["recv_bytes"] > 0
        cl.close()
        deadline = time.time() + 3
        while time.time() < deadline and db.select(Query("#clientsstats")).docs():
            time.sleep(0.05)
        assert db.select(Query("#clientsstats")).docs() == []
    finally:
        srv.stop()


def test_pooled_client_concurrency(server):
    """Concurrent selects/writes through ONE client must spread over the
    connection pool (cursors and txs are connection-affine) and stay
    correct under interleaving."""
    import threading
    c = RpcReindexer("127.0.0.1", server.port, "pooldb", conns=3)
    c.open_namespace("p", [IndexDef("id", "hash", "int",
                                    opts=IndexOpts(is_pk=True)),
                           IndexDef("grp", "hash", "int")])
    for i in range(300):
        c.upsert("p", {"id": i, "grp": i % 3})
    errors = []

    def reader(g):
        try:
            for _ in range(15):
                res = c.select(Query("p").where("grp", "=", g))
                ids = [it.doc["id"] for it in res]
                assert len(ids) >= 100 and all(i % 3 == g for i in ids)
        except Exception as e:           # pragma: no cover
            errors.append(e)

    def writer():
        try:
            for j in range(300, 360):
                tx = c.new_transaction("p")
                tx.upsert({"id": j, "grp": j % 3})
                tx.commit()
        except Exception as e:           # pragma: no cover
            errors.append(e)

    ts = [threading.Thread(target=reader, args=(g,)) for g in (0, 1, 2)]
    ts.append(threading.Thread(target=writer))
    [t.start() for t in ts]
    [t.join(timeout=60) for t in ts]
    assert not errors, errors
    assert c._created >= 2      # the pool actually grew under concurrency
    res = c.select(Query("p"))
    assert len(res) == 360
    c.close()


def test_rpc_event_subscription(client):
    """Events on the RPC plane (VERDICT r4 #8): SubscribeUpdates verb +
    pushed kCmdUpdates frames (reference: rpcserver.cc:1226-1248,1378,
    cproto.h kCmdSubscribeUpdates=90/kCmdUpdates=91)."""
    import time
    client.open_namespace("ev_ns", IDX)
    client.open_namespace("ev_other", IDX)
    sub = client.subscribe_updates(namespaces=("ev_ns",),
                                   event_types=("upsert", "delete"))
    try:
        client.upsert("ev_ns", {"id": 1, "year": 2001})
        client.upsert("ev_other", {"id": 2, "year": 2002})   # filtered out
        client.delete("ev_ns", {"id": 1})
        got = []
        deadline = time.time() + 5.0
        while len(got) < 2 and time.time() < deadline:
            got.extend(sub.poll(timeout=0.2))
        types = [(e["namespace"], e["type"]) for e in got]
        assert ("ev_ns", "upsert") in types, types
        assert ("ev_ns", "delete") in types, types
        assert all(e["namespace"] == "ev_ns" for e in got), types
        # lsn is monotone
        lsns = [e["lsn"] for e in got]
        assert lsns == sorted(lsns)
    finally:
        sub.close()


def test_rpc_event_unsubscribe_stops_stream(client):
    import time
    client.open_namespace("ev_ns2", IDX)
    sub = client.subscribe_updates(namespaces=("ev_ns2",))
    client.upsert("ev_ns2", {"id": 1, "year": 1})
    deadline = time.time() + 5.0
    got = []
    while not got and time.time() < deadline:
        got.extend(sub.poll(timeout=0.2))
    assert got
    sub.close()
    time.sleep(0.1)
    client.upsert("ev_ns2", {"id": 2, "year": 2})
    time.sleep(0.3)
    assert sub.poll(timeout=0.2) == []


def test_rpc_concurrent_selects(server):
    """Selects run OFF the event loop (worker pool) so connections overlap;
    per-connection ordering and cursor isolation must survive N threads
    hammering mixed selects + writes concurrently."""
    import threading

    setup = RpcReindexer("127.0.0.1", server.port, "rpcdb")
    setup.open_namespace("conc", IDX)
    for i in range(200):
        setup.upsert("conc", {"id": i, "year": 1900 + i})
    errs = []

    def worker(tid):
        try:
            c = RpcReindexer("127.0.0.1", server.port, "rpcdb", conns=1)
            for j in range(25):
                lo = (tid * 7 + j) % 150
                res = c.select(Query("conc").where(
                    "year", ">", 1900 + lo).sort("id").limit(10))
                ids = [d["id"] for d in res.docs()]
                assert ids == list(range(lo + 1, lo + 11)), (tid, j, ids)
                if j % 5 == 0:
                    c.upsert("conc", {"id": 500 + tid, "year": 1899})
            c.close()
        except Exception as e:           # surface in the main thread
            errs.append((tid, e))

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    setup.close()
    assert not errs, errs
