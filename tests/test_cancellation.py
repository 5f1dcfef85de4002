"""Per-query cancellation / deadline propagation (core/rdxcontext.py).

Reference semantics: cpp_src/core/rdxcontext.h — every call carries a
cancellation token; checkpoints raise errCanceled/errTimeout; the cgo
binding cancels via a context watcher."""
import threading
import time

import numpy as np
import pytest

from reindexer_tpu import (IndexDef, IndexOpts, Query, QueryCanceledError,
                           QueryTimeoutError, Reindexer, rdxcontext)


def make_db(n=2000):
    db = Reindexer()
    db.open_namespace("items", [
        IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
        IndexDef("val", "tree", "int"),
    ])
    rng = np.random.default_rng(0)
    for i in range(n):
        db.upsert("items", {"id": i, "val": int(rng.integers(0, 100))})
    return db


def test_expired_deadline_raises():
    db = make_db(200)
    with pytest.raises(QueryTimeoutError):
        with rdxcontext.context(timeout_ms=0.0):
            time.sleep(0.002)
            db.select(Query("items").where("val", ">", 10))


def test_pre_canceled_raises():
    db = make_db(200)
    ev = threading.Event()
    ev.set()
    with pytest.raises(QueryCanceledError):
        db.select(Query("items").where("val", ">", 10), cancel=ev)


def test_select_kwarg_timeout():
    db = make_db(200)
    # generous deadline: must NOT raise
    res = db.select(Query("items").where("val", ">", 10), timeout_ms=30000)
    assert len(res) > 0


def test_cancel_mid_flight():
    """Cancel a long select from another thread: the per-entry checkpoint
    inside the executor observes the token and aborts."""
    db = make_db(2000)
    ctx = rdxcontext.RdxContext()
    raised = {}

    # a condition whose evaluation is artificially slowed so the canceling
    # thread always wins the race
    orig = rdxcontext.check_cancel
    state = {"n": 0}

    def slow_check():
        state["n"] += 1
        time.sleep(0.01)
        orig()

    def run():
        try:
            with rdxcontext.context(ctx=ctx):
                rdxcontext._current.get()
                import reindexer_tpu.query.executor as ex
                old = ex.check_cancel
                ex.check_cancel = slow_check
                try:
                    db.select(Query("items")
                              .where("val", ">", 1)
                              .where("val", "<", 99)
                              .where("val", ">=", 2)
                              .where("id", ">", 0))
                finally:
                    ex.check_cancel = old
        except QueryCanceledError as e:
            raised["err"] = e

    t = threading.Thread(target=run)
    t.start()
    time.sleep(0.015)
    ctx.cancel()
    t.join(timeout=10)
    assert not t.is_alive()
    assert "err" in raised, "select was not canceled mid-flight"


def test_nested_contexts_restore():
    with rdxcontext.context(timeout_ms=10000) as outer:
        with rdxcontext.context(timeout_ms=50) as inner:
            assert rdxcontext.current() is inner
        assert rdxcontext.current() is outer
    assert rdxcontext.current() is None


def test_http_timeout_param():
    """?timeout_ms= on the query route maps an expired deadline to 408."""
    import json
    import urllib.request
    import urllib.error
    from reindexer_tpu.server.http import ReindexerServer

    srv = ReindexerServer(port=0)
    srv.start()
    try:
        port = srv.port
        urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/db", method="POST",
            data=json.dumps({"name": "testdb"}).encode()))
        db = srv.mgr.get("testdb")
        db.open_namespace("items", [
            IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
            IndexDef("val", "tree", "int")])
        for i in range(300):
            db.upsert("items", {"id": i, "val": i % 7})
        url = (f"http://127.0.0.1:{port}/api/v1/db/testdb/query"
               f"?q=SELECT%20*%20FROM%20items&timeout_ms=30000")
        with urllib.request.urlopen(url) as r:
            assert r.status == 200
            json.loads(r.read())
        # an (effectively) pre-expired deadline
        url0 = (f"http://127.0.0.1:{port}/api/v1/db/testdb/query"
                f"?q=SELECT%20*%20FROM%20items&timeout_ms=0.000001")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(url0)
        assert ei.value.code == 408
    finally:
        srv.stop()


def test_rpc_timeout_arg():
    """The cproto SELECT verbs accept an optional deadline; an expired one
    surfaces client-side as QueryCanceledError."""
    from reindexer_tpu.net.rpc_server import RpcServer
    from reindexer_tpu.net.rpc_client import RpcReindexer

    srv = RpcServer(port=0)
    srv.start()
    try:
        cli = RpcReindexer("127.0.0.1", srv.port, "testdb")
        cli.open_namespace("items", [
            IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True)),
            IndexDef("val", "tree", "int")])
        for i in range(50):
            cli.upsert("items", {"id": i, "val": i % 7})
        res = cli.select("SELECT * FROM items LIMIT 3", timeout_ms=30000)
        assert len(res) == 3
        with pytest.raises(QueryCanceledError):
            cli.select("SELECT * FROM items", timeout_ms=0.000001)
        cli.close()
    finally:
        srv.stop()
