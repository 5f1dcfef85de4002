"""Events subscription + async replication tests.

Models the reference multi-node tests run in-process (ServerControl pattern,
gtests fixtures/servercontrol.h): leader/follower topologies on one host,
wait_sync polling (test/helpers/wait_sync.go), force-sync ladder, cascade
topology, and the events stream (events/ subsystem)."""
import time

import pytest

from reindexer_tpu import IndexDef, IndexOpts, Query, Reindexer
from reindexer_tpu.events import EventsObserver, EventSubscriberConfig
from reindexer_tpu.replication import (AsyncReplicator, HttpLeaderChannel,
                                       LeaderChannel, ReplicationState)


def make_leader():
    db = Reindexer()
    state = ReplicationState(db)
    db.open_namespace("t", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("name", "hash", "string"),
    ])
    return db, state


# --- events ----------------------------------------------------------------

def test_events_subscription():
    db = Reindexer()
    obs = EventsObserver()
    obs.attach_db(db)
    db.open_namespace("e", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))])
    sub = obs.subscribe(EventSubscriberConfig(namespaces=("e",)))
    db.upsert("e", {"id": 1})
    db.upsert("e", {"id": 2})
    db.delete("e", {"id": 1})
    evs = sub.poll(timeout=1.0)
    types = [e.type for e in evs]
    assert types == ["upsert", "upsert", "delete"]
    assert evs[0].payload["doc"]["id"] == 1
    lsns = [e.lsn for e in evs]
    assert lsns == sorted(lsns)


def test_events_filtering():
    db = Reindexer()
    obs = EventsObserver()
    obs.attach_db(db)
    db.open_namespace("a", [IndexDef("id", "hash", "int",
                                     opts=IndexOpts(is_pk=True))])
    db.open_namespace("b", [IndexDef("id", "hash", "int",
                                     opts=IndexOpts(is_pk=True))])
    sub = obs.subscribe(EventSubscriberConfig(namespaces=("a",),
                                              event_types=("upsert",)))
    db.upsert("a", {"id": 1})
    db.upsert("b", {"id": 1})
    db.delete("a", {"id": 1})
    evs = sub.poll(timeout=0.5)
    assert len(evs) == 1 and evs[0].namespace == "a" \
        and evs[0].type == "upsert"


# --- replication -----------------------------------------------------------

def test_online_replication():
    leader, state = make_leader()
    follower = Reindexer()
    repl = AsyncReplicator(follower, LeaderChannel(state))

    leader.upsert("t", {"id": 1, "name": "a"})
    leader.upsert("t", {"id": 2, "name": "b"})
    repl.sync_once()   # first round: force sync (lsn 0 predates hooks? no —
                       # ring holds everything) or online replay
    assert repl.wait_sync(state, timeout=1) or repl.sync_once() is None
    res = follower.select(Query("t").sort("id"))
    assert [d["id"] for d in res.docs()] == [1, 2]

    leader.delete("t", {"id": 1})
    leader.put_meta("t", "k", "v")
    repl.sync_once()
    assert [d["id"] for d in follower.select(Query("t")).docs()] == [2]
    assert follower.get_meta("t", "k") == "v"


def test_force_sync_of_preexisting_leader_data():
    """A ReplicationState attached AFTER the leader already holds data (e.g.
    restored from storage, or lazily created on the first poll) must force
    a fresh follower to snapshot-sync rather than report 'up to date'
    (advisor finding on WalTracker.since(0))."""
    db = Reindexer()
    db.open_namespace("t", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))])
    for i in range(5):
        db.upsert("t", {"id": i})
    state = ReplicationState(db)          # attach late: ring never saw them
    follower = Reindexer()
    repl = AsyncReplicator(follower, LeaderChannel(state))
    repl.sync_once()
    assert repl.force_syncs == 1
    assert len(follower.select(Query("t")).docs()) == 5
    # afterwards: plain online replay, no repeated force syncs
    db.upsert("t", {"id": 100})
    repl.sync_once()
    repl.sync_once()
    assert repl.force_syncs == 1
    assert len(follower.select(Query("t")).docs()) == 6


def test_force_sync_after_ring_overflow():
    leader, state = make_leader()
    state.wal.capacity = 10
    for i in range(50):
        leader.upsert("t", {"id": i, "name": str(i)})
    follower = Reindexer()
    repl = AsyncReplicator(follower, LeaderChannel(state))
    repl.sync_once()   # lsn window lost -> snapshot
    assert repl.force_syncs == 1
    assert len(follower.select(Query("t")).docs()) == 50
    # back to online replay afterwards
    leader.upsert("t", {"id": 100, "name": "x"})
    repl.sync_once()
    assert repl.force_syncs == 1
    assert len(follower.select(Query("t")).docs()) == 51


def test_replication_thread_and_cascade():
    leader, state = make_leader()
    mid = Reindexer()
    mid_state = ReplicationState(mid)
    r1 = AsyncReplicator(mid, LeaderChannel(state), poll_interval=0.01)
    leaf = Reindexer()
    r2 = AsyncReplicator(leaf, LeaderChannel(mid_state), poll_interval=0.01)
    r1.start()
    r2.start()
    try:
        for i in range(10):
            leader.upsert("t", {"id": i, "name": f"n{i}"})
        assert r1.wait_sync(state, timeout=5)
        deadline = time.time() + 5
        while time.time() < deadline:
            if len(leaf._namespaces) and \
                    len(leaf.select(Query("t")).docs()) == 10:
                break
            time.sleep(0.02)
        assert len(leaf.select(Query("t")).docs()) == 10
        assert r1.stats()["applied"] > 0
    finally:
        r1.stop()
        r2.stop()


def test_replication_over_http():
    from reindexer_tpu.server.http import ReindexerServer
    srv = ReindexerServer(port=0)
    srv.start()
    try:
        leader = srv.mgr.create("rdb")
        state = ReplicationState(leader)
        leader.open_namespace("t", [
            IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))])
        leader.upsert("t", {"id": 1})
        leader.upsert("t", {"id": 2})

        follower = Reindexer()
        chan = HttpLeaderChannel(f"http://127.0.0.1:{srv.port}", "rdb")
        repl = AsyncReplicator(follower, chan)
        repl.sync_once()
        assert sorted(d["id"] for d in
                      follower.select(Query("t")).docs()) == [1, 2]
    finally:
        srv.stop()


def test_replicationstats_system_ns():
    """#replicationstats reports leader WAL state when replication is on."""
    import jax
    from reindexer_tpu import IndexDef, IndexOpts, Query, Reindexer
    from reindexer_tpu.replication import ReplicationState
    db = Reindexer()
    ReplicationState(db, server_id=5)
    db.open_namespace("r", [IndexDef("id", "hash", "int",
                                     opts=IndexOpts(is_pk=True))])
    for i in range(4):
        db.upsert("r", {"id": i})
    rows = db.select(Query("#replicationstats")).docs()
    assert rows and rows[0]["server_id"] == 5
    assert rows[0]["last_lsn"] >= 4 and "r" in rows[0]["namespaces"]


def test_chunked_force_sync_over_http_and_rpc():
    """Chunked snapshot verbs over both wire transports (reference:
    GetSnapshot/FetchSnapshot RPC, rpcserver.cc:1382-1384; chunks applied
    via tx, namespace/snapshot/snapshot.h)."""
    from reindexer_tpu.net.rpc_server import RpcServer
    from reindexer_tpu.replication import RpcLeaderChannel
    from reindexer_tpu.server.http import ReindexerServer

    srv = ReindexerServer(port=0)
    srv.start()
    rpc = RpcServer(mgr=srv.mgr)
    rpc.start()
    try:
        db = srv.mgr.create("repldb")
        db.open_namespace("t", [
            IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))])
        for i in range(2500):
            db.upsert("t", {"id": i})

        f1 = Reindexer()
        r1 = AsyncReplicator(f1, HttpLeaderChannel(
            f"http://127.0.0.1:{srv.port}", "repldb"))
        r1.SNAPSHOT_CHUNK = 400
        r1.sync_once()
        assert r1.force_syncs == 1 and r1.force_sync_chunks == 7
        assert len(f1.select(Query("t")).docs()) == 2500

        f2 = Reindexer()
        r2 = AsyncReplicator(f2, RpcLeaderChannel(
            "127.0.0.1", rpc.port, "repldb"))
        r2.SNAPSHOT_CHUNK = 1000
        r2.sync_once()
        assert r2.force_sync_chunks == 3
        assert len(f2.select(Query("t")).docs()) == 2500
        # online replay continues after the chunked force sync
        db.upsert("t", {"id": 9999})
        r1.sync_once()
        r2.sync_once()
        assert len(f1.select(Query("t")).docs()) == 2501
        assert len(f2.select(Query("t")).docs()) == 2501
        assert r1.force_syncs == 1 and r2.force_syncs == 1
    finally:
        rpc.stop()
        srv.stop()


def test_snapshot_force_sync_under_load():
    """Chunked force-sync racing live writes (reference breadth:
    cascade_replication_test.cc force-sync-under-load): a follower
    snapshot-syncs while a writer thread keeps mutating the leader; the
    follower must converge to the leader's final state via snapshot + WAL
    catch-up with no torn/duplicated rows."""
    import threading

    db = Reindexer()
    db.open_namespace("t", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("name", "hash", "string"),
    ])
    for i in range(200):
        db.upsert("t", {"id": i, "name": f"n{i}"})
    state = ReplicationState(db)        # attached late => follower must
    #                                     snapshot-sync, not WAL catch-up

    stop = threading.Event()
    errors = []

    def writer():
        j = 200
        while not stop.is_set():
            try:
                db.upsert("t", {"id": j % 400, "name": f"w{j}"})
                if j % 7 == 0:
                    db.delete("t", {"id": (j * 13) % 200})
                j += 1
            except Exception as e:          # pragma: no cover
                errors.append(e)
                return

    th = threading.Thread(target=writer, daemon=True)
    th.start()
    try:
        follower = Reindexer()
        repl = AsyncReplicator(follower, LeaderChannel(state))
        repl.sync_once()                    # force sync races the writer
        assert repl.force_syncs >= 1
        for _ in range(50):                 # catch-up ladder under load
            repl.sync_once()
    finally:
        stop.set()
        th.join(timeout=10)
    assert not errors
    # quiesce and converge
    for _ in range(20):
        repl.sync_once()
        lead = {d["id"]: d["name"]
                for d in db.select(Query("t").limit(10 ** 9)).docs()}
        folw = {d["id"]: d["name"]
                for d in follower.select(Query("t").limit(10 ** 9)).docs()}
        if lead == folw:
            break
        time.sleep(0.02)
    assert lead == folw


def test_reshard_under_write():
    """Runtime resharding racing writers (reference breadth:
    sharding_base_test.cc): apply_sharding_config migrates rows while
    writer threads keep upserting; afterwards every row lives on exactly
    the shard the new config routes it to, and nothing is lost."""
    import threading

    from reindexer_tpu.sharding import (NamespaceShardingConfig, ShardSpec,
                                        ShardedReindexer)

    shards = [Reindexer() for _ in range(2)]
    cfg = NamespaceShardingConfig(
        namespace="items", index="loc",
        shards=(ShardSpec(0, values=("a",)), ShardSpec(1, values=("b",))),
        default_shard=0)
    sr = ShardedReindexer(shards, [cfg])
    sr.open_namespace("items", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("loc", "hash", "string"),
    ])
    for i in range(100):
        sr.upsert("items", {"id": i, "loc": "a" if i % 2 else "b"})

    stop = threading.Event()
    errors = []
    written = []

    def writer(base):
        j = 0
        while not stop.is_set() and j < 500:
            i = base + j
            try:
                sr.upsert("items", {"id": i, "loc": "a" if i % 2 else "b"})
                written.append(i)
            except Exception as e:          # pragma: no cover
                errors.append(e)
                return
            j += 1

    threads = [threading.Thread(target=writer, args=(1000 * (t + 1),),
                                daemon=True) for t in range(2)]
    for th in threads:
        th.start()
    # swap the shard assignment mid-write
    new_cfg = NamespaceShardingConfig(
        namespace="items", index="loc",
        shards=(ShardSpec(0, values=("b",)), ShardSpec(1, values=("a",))),
        default_shard=1)
    sr.apply_sharding_config([new_cfg])
    stop.set()
    for th in threads:
        th.join(timeout=30)
    assert not errors
    # every written row exists exactly once, on the shard the NEW config
    # routes its key to (rows written mid-migration may land either side of
    # the cutover, so re-route any stragglers with one more apply)
    sr.apply_sharding_config([new_cfg])
    all_ids = set(range(100)) | set(written)
    seen = {}
    for si, sh in enumerate(shards):
        for d in sh.select(Query("items").limit(10 ** 9)).docs():
            assert d["id"] not in seen, f"duplicate row {d['id']}"
            seen[d["id"]] = (si, d["loc"])
    assert set(seen) == all_ids
    for rid, (si, loc) in seen.items():
        want = 1 if loc == "a" else 0
        assert si == want, (rid, si, loc)


def test_data_hash_divergence_forces_resync():
    """Data integrity check (reference: replication.md:67-70 DataHash):
    a follower whose data silently diverged must detect the checksum
    mismatch and force-resync."""
    leader, state = make_leader()
    follower = Reindexer()
    repl = AsyncReplicator(follower, LeaderChannel(state))
    leader.upsert("t", {"id": 1, "name": "a"})
    leader.upsert("t", {"id": 2, "name": "b"})
    repl.sync_once()
    assert follower.get_namespace("t").data_hash \
        == leader.get_namespace("t").data_hash

    # corrupt the follower BEHIND the replicator's back
    follower.get_namespace("t").upsert({"id": 2, "name": "CORRUPT"})
    assert follower.get_namespace("t").data_hash \
        != leader.get_namespace("t").data_hash
    repl.sync_once()       # mismatch round 1 (streak guard)
    repl.sync_once()       # mismatch round 2 -> force resync
    assert repl.data_hash_mismatches == 1
    docs = {d["id"]: d["name"]
            for d in follower.select(Query("t")).docs()}
    assert docs == {1: "a", 2: "b"}
    assert follower.get_namespace("t").data_hash \
        == leader.get_namespace("t").data_hash
