"""RAFT sync-cluster tests (models reference unit/cluster_operation_*.cc:
N-node in-process clusters, election, quorum writes, failover)."""
import time

import pytest

from reindexer_tpu import IndexDef, IndexOpts, Query, ReindexerError
from reindexer_tpu.cluster import (ClusterNode, Role, make_cluster,
                                   wait_leader)

IDX = [IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))]


@pytest.fixture
def cluster():
    nodes = make_cluster(3)
    yield nodes
    for n in nodes:
        n.stop()


def test_single_leader_elected(cluster):
    leader = wait_leader(cluster)
    assert leader is not None
    assert sum(1 for n in cluster if n.role == Role.LEADER) == 1
    info = leader.raft_info()
    assert info["role"] == "leader" and info["term"] >= 1


def test_write_through_any_node(cluster):
    leader = wait_leader(cluster)
    assert leader is not None
    follower = next(n for n in cluster if n.role != Role.LEADER)
    # writes via a follower proxy to the leader and replicate everywhere
    follower.open_namespace("c", IDX)
    follower.upsert("c", {"id": 1})
    leader.upsert("c", {"id": 2})
    for n in cluster:
        got = sorted(d["id"] for d in n.select(Query("c")).docs())
        assert got == [1, 2], f"node {n.server_id} diverged: {got}"


def test_failover_reelection(cluster):
    leader = wait_leader(cluster)
    assert leader is not None
    leader.open_namespace("f", IDX)
    leader.upsert("f", {"id": 1})
    leader.kill()
    survivors = [n for n in cluster if n.alive]
    new_leader = wait_leader(survivors, timeout=5)
    assert new_leader is not None and new_leader is not leader
    # cluster still accepts quorum writes (2/3 alive)
    new_leader.upsert("f", {"id": 2})
    for n in survivors:
        assert sorted(d["id"] for d in n.select(Query("f")).docs()) == [1, 2]


def test_no_quorum_rejects_writes(cluster):
    leader = wait_leader(cluster)
    assert leader is not None
    leader.open_namespace("q", IDX)
    for n in cluster:
        if n is not leader:
            n.kill()
    with pytest.raises(ReindexerError):
        leader.upsert("q", {"id": 1})
    # the failed write must NOT be applied locally (quorum-commit rule:
    # uncommitted records never reach the engine — no divergence)
    assert leader.select(Query("q")).docs() == []
    assert leader.applied_index == leader.commit_index


def test_stale_term_append_rejected(cluster):
    from reindexer_tpu.cluster import LogRecord
    leader = wait_leader(cluster)
    assert leader is not None
    leader.open_namespace("s", IDX)
    leader.upsert("s", {"id": 1})
    follower = next(n for n in cluster if n.role != Role.LEADER)
    # a deposed leader writing with an old term must be refused
    stale = LogRecord(index=len(follower.log) + 1, term=follower.term - 1,
                      ns="s", op="upsert", payload={"doc": {"id": 99}})
    assert follower.append_record(stale) is False
    assert all(d["id"] != 99 for d in follower.select(Query("s")).docs())


def test_revived_node_catches_up(cluster):
    leader = wait_leader(cluster)
    assert leader is not None
    follower = next(n for n in cluster if n.role != Role.LEADER)
    leader.open_namespace("r", IDX)
    follower.kill()
    for i in range(5):
        leader.upsert("r", {"id": i})
    follower.revive()
    deadline = time.time() + 5
    while time.time() < deadline:
        try:
            if len(follower.select(Query("r"))) == 5:
                break
        except Exception:
            pass
        time.sleep(0.05)
    assert len(follower.select(Query("r"))) == 5


def test_manual_leader_transfer(cluster):
    """set_leader_node action (reference: replication.md:498-505)."""
    old = wait_leader(cluster)
    target = next(n for n in cluster if n.server_id != old.server_id)
    # the action rides #config on ANY node (reference: upsert #config)
    old.db.upsert("#config", {"type": "action", "action": {
        "command": "set_leader_node", "server_id": target.server_id}})
    deadline = time.time() + 5
    while time.time() < deadline:
        if target.role == Role.LEADER:
            break
        time.sleep(0.02)
    assert target.role == Role.LEADER
    # the cluster still accepts writes through the new leader
    target.open_namespace("m", IDX)
    target.upsert("m", {"id": 1})
    time.sleep(0.2)
    assert sum(1 for n in cluster if n.role == Role.LEADER) == 1


def test_set_leader_unknown_node(cluster):
    from reindexer_tpu import ParamsError
    leader = wait_leader(cluster)
    with pytest.raises(ParamsError):
        leader.db.upsert("#config", {"type": "action", "action": {
            "command": "set_leader_node", "server_id": 99}})
