"""RAFT cluster over real TCP sockets (reference: cluster verbs ride cproto,
rpcserver.cc:1387-1389; test topology mirrors cluster_operation_*.cc +
cascade_replication_test.cc run on localhost ports)."""
import threading
import time

import pytest

from reindexer_tpu import IndexDef, IndexOpts, Query, Reindexer, ReindexerError
from reindexer_tpu.cluster import Role, wait_leader
from reindexer_tpu.net.cluster_transport import make_tcp_cluster

IDX = [IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))]


@pytest.fixture
def tcp_cluster():
    nodes, servers = make_tcp_cluster(3)
    yield nodes, servers
    for n in nodes:
        n.stop()
    for s in servers:
        s.stop()


def _wait_all_applied(nodes, ns, want_ids, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            if all(sorted(d["id"] for d in n.select(Query(ns)).docs())
                   == want_ids for n in nodes if n.alive):
                return True
        except Exception:
            pass
        time.sleep(0.05)
    return False


def test_tcp_election_and_writes(tcp_cluster):
    nodes, _ = tcp_cluster
    leader = wait_leader(nodes)
    assert leader is not None
    follower = next(n for n in nodes if n.role != Role.LEADER)
    # write through a follower proxies over TCP to the leader
    follower.open_namespace("t", IDX)
    follower.upsert("t", {"id": 1})
    leader.upsert("t", {"id": 2})
    assert _wait_all_applied(nodes, "t", [1, 2])


def test_tcp_leader_socket_kill_failover(tcp_cluster):
    """Socket-level kill = network partition/process death: the remaining
    majority elects a new leader and keeps accepting writes."""
    nodes, servers = tcp_cluster
    leader = wait_leader(nodes)
    assert leader is not None
    leader.open_namespace("f", IDX)
    leader.upsert("f", {"id": 1})
    assert _wait_all_applied(nodes, "f", [1])
    servers[leader.server_id].stop()   # partition the leader's socket
    leader.kill()                      # and freeze its raft loop
    survivors = [n for n in nodes if n.alive]
    new_leader = wait_leader(survivors, timeout=8)
    assert new_leader is not None and new_leader is not leader
    new_leader.upsert("f", {"id": 2})
    assert _wait_all_applied(survivors, "f", [1, 2])


def test_tcp_leader_kill_under_write_load(tcp_cluster):
    """Leader dies mid-stream: writers retry through the new leader; every
    acknowledged write survives on the remaining quorum (reference:
    cluster_operation_proxy tests with online writers)."""
    nodes, servers = tcp_cluster
    leader = wait_leader(nodes)
    assert leader is not None
    leader.open_namespace("w", IDX)
    acked: list[int] = []
    errors: list[str] = []
    stop_at = 60

    def writer():
        follower = next(n for n in nodes if n is not leader)
        for i in range(stop_at):
            try:
                follower.upsert("w", {"id": i})
                acked.append(i)
            except ReindexerError as e:
                errors.append(str(e))
            time.sleep(0.005)

    th = threading.Thread(target=writer)
    th.start()
    time.sleep(0.1)                    # let some writes land
    servers[leader.server_id].stop()
    leader.kill()
    th.join(timeout=30)
    survivors = [n for n in nodes if n.alive]
    # generous timeouts: under full-suite load on the 1-core box the
    # election/replication timers stretch (the test passes alone in ~3s)
    new_leader = wait_leader(survivors, timeout=20)
    assert new_leader is not None
    assert len(acked) > 0
    # every ACKED write must be present on all surviving nodes
    deadline = time.time() + 15
    while time.time() < deadline:
        got = [sorted(d["id"] for d in n.select(Query("w")).docs())
               for n in survivors]
        if all(set(acked) <= set(g) for g in got):
            break
        time.sleep(0.05)
    for n, g in zip(survivors, got):
        missing = set(acked) - set(g)
        assert not missing, f"node {n.server_id} lost acked writes {missing}"


def test_tcp_frozen_node_refuses_verbs(tcp_cluster):
    """node.kill() with the socket still up = frozen process: peers see verb
    failures, elect around it, and it catches up after revive."""
    nodes, _ = tcp_cluster
    leader = wait_leader(nodes)
    assert leader is not None
    leader.open_namespace("z", IDX)
    follower = next(n for n in nodes if n is not leader)
    follower.kill()
    for i in range(5):
        leader.upsert("z", {"id": i})
    follower.revive()
    deadline = time.time() + 5
    while time.time() < deadline:
        if len(follower.select(Query("z")).docs()) == 5:
            break
        time.sleep(0.05)
    assert sorted(d["id"] for d in follower.select(Query("z")).docs()) \
        == [0, 1, 2, 3, 4]


def test_cascade_replication_chain():
    """Cascade topology (reference: cascade_replication_test.cc): leader ->
    mid follower -> leaf follower, each hop an async replicator; writes at
    the top propagate to the leaf, including after a mid force-sync."""
    from reindexer_tpu.replication import (AsyncReplicator, LeaderChannel,
                                           ReplicationState)
    top = Reindexer()
    top_state = ReplicationState(top)
    top.open_namespace("c", IDX)
    mid = Reindexer()
    r1 = AsyncReplicator(mid, LeaderChannel(top_state))
    for i in range(10):
        top.upsert("c", {"id": i})
    r1.sync_once()
    mid_state = ReplicationState(mid)    # attach AFTER data: seeds the ring
    leaf = Reindexer()
    r2 = AsyncReplicator(leaf, LeaderChannel(mid_state))
    r2.sync_once()                       # force-syncs the pre-ring data
    assert len(leaf.select(Query("c")).docs()) == 10
    top.upsert("c", {"id": 100})
    r1.sync_once()
    r2.sync_once()
    assert len(leaf.select(Query("c")).docs()) == 11
