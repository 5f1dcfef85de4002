"""HTTP server tests (models the reference REST API behavior,
server/httpserver.cc routes; JSON wire format)."""
import json
import urllib.request

import pytest

from reindexer_tpu.server.http import ReindexerServer


@pytest.fixture(scope="module")
def server():
    srv = ReindexerServer(port=0)
    srv.start()
    yield srv
    srv.stop()


def call(srv, method, path, body=None):
    url = f"http://127.0.0.1:{srv.port}{path}"
    data = None
    if body is not None:
        data = (json.dumps(body) if not isinstance(body, str)
                else body).encode()
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def test_check(server):
    code, body = call(server, "GET", "/api/v1/check")
    assert code == 200 and body["status"] == "OK"


def test_full_crud_flow(server):
    code, _ = call(server, "POST", "/api/v1/db", {"name": "testdb"})
    assert code == 200
    code, body = call(server, "GET", "/api/v1/db")
    assert "testdb" in body["items"]

    code, _ = call(server, "POST", "/api/v1/db/testdb/namespaces", {
        "name": "items",
        "indexes": [
            {"name": "id", "index_type": "hash", "field_type": "int",
             "is_pk": True},
            {"name": "year", "index_type": "tree", "field_type": "int"},
        ]})
    assert code == 200

    code, _ = call(server, "PUT", "/api/v1/db/testdb/namespaces/items/items",
                   [{"id": 1, "year": 2020}, {"id": 2, "year": 2021}])
    assert code == 200

    code, body = call(server, "GET",
                      "/api/v1/db/testdb/namespaces/items/items?limit=10")
    assert code == 200 and len(body["items"]) == 2

    # SQL via GET
    code, body = call(
        server, "GET",
        "/api/v1/db/testdb/query?q=SELECT%20*%20FROM%20items%20WHERE%20year%3D2021")
    assert code == 200
    assert [d["id"] for d in body["items"]] == [2]

    # DSL via POST
    code, body = call(server, "POST", "/api/v1/db/testdb/query", {
        "namespace": "items",
        "filters": [{"field": "id", "cond": "eq", "value": 1}]})
    assert code == 200 and body["items"][0]["year"] == 2020

    # meta
    code, _ = call(server, "PUT",
                   "/api/v1/db/testdb/namespaces/items/metabykey",
                   {"key": "k1", "value": "v1"})
    assert code == 200
    code, body = call(server, "GET",
                      "/api/v1/db/testdb/namespaces/items/metabykey/k1")
    assert body["value"] == "v1"

    # indexes listing
    code, body = call(server, "GET",
                      "/api/v1/db/testdb/namespaces/items/indexes")
    assert {d["name"] for d in body["items"]} == {"id", "year"}


def test_transactions(server):
    call(server, "POST", "/api/v1/db", {"name": "txdb"})
    call(server, "POST", "/api/v1/db/txdb/namespaces", {
        "name": "t", "indexes": [{"name": "id", "index_type": "hash",
                                  "field_type": "int", "is_pk": True}]})
    code, body = call(server, "POST",
                      "/api/v1/db/txdb/namespaces/t/transactions/begin")
    assert code == 200
    tx = body["tx_id"]
    call(server, "PUT", f"/api/v1/db/txdb/transactions/{tx}/items",
         [{"id": 10}, {"id": 11}])
    # not visible before commit
    code, body = call(server, "GET",
                      "/api/v1/db/txdb/query?q=SELECT%20*%20FROM%20t")
    assert len(body["items"]) == 0
    call(server, "POST", f"/api/v1/db/txdb/transactions/{tx}/commit")
    code, body = call(server, "GET",
                      "/api/v1/db/txdb/query?q=SELECT%20*%20FROM%20t")
    assert len(body["items"]) == 2


def test_error_codes(server):
    code, body = call(server, "GET", "/api/v1/db/nope/query?q=SELECT")
    assert code == 404
    call(server, "POST", "/api/v1/db", {"name": "errdb"})
    code, body = call(server, "GET", "/api/v1/db/errdb/query?q=NOT%20SQL")
    assert code == 400


def test_metrics(server):
    url = f"http://127.0.0.1:{server.port}/metrics"
    with urllib.request.urlopen(url) as resp:
        text = resp.read().decode()
    assert "reindexer_items_count" in text
    assert "reindexer_queries_total" in text
    assert "reindexer_avg_latency_seconds" in text
    assert "reindexer_memstats_data_size_bytes" in text
    assert "reindexer_uptime_seconds" in text
    assert "# TYPE reindexer_queries_total counter" in text


def test_pprof_debug_routes(server):
    """pprof analogs (reference: server/pprof routes): thread dump +
    sampled collapsed stacks."""
    base = f"http://127.0.0.1:{server.port}/debug/pprof"
    with urllib.request.urlopen(f"{base}/threads") as resp:
        text = resp.read().decode()
    assert "--- thread" in text
    with urllib.request.urlopen(f"{base}/profile?seconds=0.2") as resp:
        resp.read()          # sampling completes without error


def test_sql_convert(server):
    code, body = call(server, "POST", "/api/v1/query/convert/sql",
                      "SELECT * FROM items WHERE id = 1")
    assert code == 200
    assert body["namespace"] == "items"
    assert body["filters"][0]["field"] == "id"


def test_auth_roles():
    from reindexer_tpu.server.auth import AuthManager
    from reindexer_tpu.server.http import ReindexerServer
    import base64

    auth = AuthManager()
    auth.add_user("root", "rootpw", {"*": "owner"})
    auth.add_user("reader", "readpw", {"*": "data_read"})
    srv = ReindexerServer(port=0, auth=auth)
    srv.start()
    try:
        def call_auth(method, path, user=None, pw=None, body=None):
            url = f"http://127.0.0.1:{srv.port}{path}"
            data = json.dumps(body).encode() if body is not None else None
            req = urllib.request.Request(url, data=data, method=method)
            req.add_header("Content-Type", "application/json")
            if user:
                tok = base64.b64encode(f"{user}:{pw}".encode()).decode()
                req.add_header("Authorization", f"Basic {tok}")
            try:
                with urllib.request.urlopen(req) as resp:
                    return resp.status
            except urllib.error.HTTPError as e:
                return e.code

        # no credentials -> 401
        assert call_auth("GET", "/api/v1/db") == 401
        # wrong password -> 401
        assert call_auth("GET", "/api/v1/db", "root", "nope") == 401
        # owner can create
        assert call_auth("POST", "/api/v1/db", "root", "rootpw",
                         {"name": "authdb"}) == 200
        assert call_auth("POST", "/api/v1/db/authdb/namespaces", "root",
                         "rootpw", {"name": "n", "indexes": [
                             {"name": "id", "index_type": "hash",
                              "field_type": "int", "is_pk": True}]}) == 200
        # reader can read but not write
        assert call_auth("GET", "/api/v1/db", "reader", "readpw") == 200
        assert call_auth("PUT", "/api/v1/db/authdb/namespaces/n/items",
                         "reader", "readpw", {"id": 1}) == 403
        assert call_auth("PUT", "/api/v1/db/authdb/namespaces/n/items",
                         "root", "rootpw", {"id": 1}) == 200
    finally:
        srv.stop()


def test_auth_per_route_roles():
    """Per-route role matrix (reference: httpserver.cc getDB<kRole...>;
    dbmanager.cc:89,152 owner gates for db create/drop)."""
    from reindexer_tpu.server.auth import AuthManager
    from reindexer_tpu.server.http import ReindexerServer
    import base64

    auth = AuthManager()
    auth.add_user("root", "rootpw", {"*": "owner"})
    auth.add_user("admin", "adminpw", {"*": "db_admin"})
    auth.add_user("writer", "writepw", {"*": "data_write"})
    auth.add_user("reader", "readpw", {"*": "data_read"})
    srv = ReindexerServer(port=0, auth=auth)
    srv.start()
    try:
        def call_auth(method, path, user, pw, body=None, raw=None):
            url = f"http://127.0.0.1:{srv.port}{path}"
            data = raw if raw is not None else (
                json.dumps(body).encode() if body is not None else None)
            req = urllib.request.Request(url, data=data, method=method)
            req.add_header("Content-Type", "application/json")
            tok = base64.b64encode(f"{user}:{pw}".encode()).decode()
            req.add_header("Authorization", f"Basic {tok}")
            try:
                with urllib.request.urlopen(req) as resp:
                    return resp.status
            except urllib.error.HTTPError as e:
                return e.code

        assert call_auth("POST", "/api/v1/db", "root", "rootpw",
                         {"name": "rdb"}) == 200
        ns_body = {"name": "n", "indexes": [
            {"name": "id", "index_type": "hash", "field_type": "int",
             "is_pk": True}]}
        # data_write may write items but NOT create/drop/rename namespaces
        assert call_auth("POST", "/api/v1/db/rdb/namespaces", "writer",
                         "writepw", ns_body) == 403
        assert call_auth("POST", "/api/v1/db/rdb/namespaces", "admin",
                         "adminpw", ns_body) == 200
        for m in ("POST", "PUT", "PATCH"):
            assert call_auth(m, "/api/v1/db/rdb/namespaces/n/items",
                             "writer", "writepw", {"id": 1}) == 200, m
        # rename is a GET in the route table but still db_admin
        assert call_auth("GET", "/api/v1/db/rdb/namespaces/n/rename/m",
                         "writer", "writepw") == 403
        assert call_auth("GET", "/api/v1/db/rdb/namespaces/n/rename/m",
                         "reader", "readpw") == 403
        assert call_auth("GET", "/api/v1/db/rdb/namespaces/n/rename/m",
                         "admin", "adminpw") == 200
        assert call_auth("GET", "/api/v1/db/rdb/namespaces/m/rename/n",
                         "admin", "adminpw") == 200
        # index DDL needs db_admin, not data_write
        idx = {"name": "x", "index_type": "hash", "field_type": "int"}
        assert call_auth("POST", "/api/v1/db/rdb/namespaces/n/indexes",
                         "writer", "writepw", idx) == 403
        assert call_auth("POST", "/api/v1/db/rdb/namespaces/n/indexes",
                         "admin", "adminpw", idx) == 200
        # truncate needs db_admin
        assert call_auth("DELETE", "/api/v1/db/rdb/namespaces/n/truncate",
                         "writer", "writepw") == 403
        # SQL statement type gates the role: UPDATE via sqlquery for reader
        assert call_auth("POST", "/api/v1/db/rdb/sqlquery", "reader",
                         "readpw", raw=b"UPDATE n SET id = 9") == 403
        assert call_auth("POST", "/api/v1/db/rdb/sqlquery", "reader",
                         "readpw", raw=b"SELECT * FROM n") == 200
        # GET /query with UPDATE SQL is write-gated too
        import urllib.parse as _up
        q = _up.quote("UPDATE n SET id = 9")
        assert call_auth("GET", f"/api/v1/db/rdb/query?q={q}",
                         "reader", "readpw") == 403
        assert call_auth("GET", f"/api/v1/db/rdb/query?q={q}",
                         "writer", "writepw") == 200
        # database drop requires owner (db_admin is not enough)
        assert call_auth("DELETE", "/api/v1/db/rdb", "admin",
                         "adminpw") == 403
        # database create requires owner
        assert call_auth("POST", "/api/v1/db", "admin", "adminpw",
                         {"name": "nope"}) == 403
        assert call_auth("DELETE", "/api/v1/db/rdb", "root", "rootpw") == 200
    finally:
        srv.stop()


def test_rpc_per_verb_roles():
    """RPC per-verb role gates (reference: rpcserver.cc getDB(ctx, kRole...))
    + owner-only implicit database creation (dbmanager.cc:89)."""
    from reindexer_tpu.net.rpc_client import RpcReindexer
    from reindexer_tpu.net.rpc_server import RpcServer
    from reindexer_tpu.server.auth import AuthManager
    from reindexer_tpu import IndexDef, IndexOpts, ReindexerError
    import pytest

    auth = AuthManager()
    auth.add_user("root", "rootpw", {"*": "owner"})
    auth.add_user("writer", "writepw", {"*": "data_write"})
    auth.add_user("reader", "readpw", {"*": "data_read"})
    srv = RpcServer(auth=auth)
    srv.start()
    try:
        # non-owner LOGIN cannot implicitly create a database
        with pytest.raises(ReindexerError):
            RpcReindexer("127.0.0.1", srv.port, "newdb", "writer", "writepw")
        root = RpcReindexer("127.0.0.1", srv.port, "newdb", "root", "rootpw")
        root.open_namespace("n", [IndexDef("id", "hash", "int",
                                           opts=IndexOpts(is_pk=True))])
        root.upsert("n", {"id": 1})
        writer = RpcReindexer("127.0.0.1", srv.port, "newdb",
                              "writer", "writepw")
        writer.upsert("n", {"id": 2})          # data_write: ok
        with pytest.raises(ReindexerError):    # DDL needs db_admin
            writer.drop_namespace("n")
        reader = RpcReindexer("127.0.0.1", srv.port, "newdb",
                              "reader", "readpw")
        assert len(reader.select("SELECT * FROM n")) == 2
        with pytest.raises(ReindexerError):    # writes need data_write
            reader.upsert("n", {"id": 3})
        with pytest.raises(ReindexerError):    # UPDATE SQL is write-gated
            reader.select("UPDATE n SET id = 9")
    finally:
        srv.stop()


def test_events_long_poll(server):
    call(server, "POST", "/api/v1/db", {"name": "evdb"})
    call(server, "POST", "/api/v1/db/evdb/namespaces", {
        "name": "e", "indexes": [{"name": "id", "index_type": "hash",
                                  "field_type": "int", "is_pk": True}]})
    code, body = call(server, "POST", "/api/v1/db/evdb/events",
                      {"namespaces": ["e"], "event_types": ["upsert"]})
    assert code == 200
    sub = body["subscription_id"]
    call(server, "PUT", "/api/v1/db/evdb/namespaces/e/items", {"id": 1})
    code, body = call(server, "GET",
                      f"/api/v1/db/evdb/events/{sub}?timeout_ms=2000")
    assert code == 200
    assert any(e["type"] == "upsert" and e["item"]["id"] == 1
               for e in body["events"])
    code, _ = call(server, "DELETE", f"/api/v1/db/evdb/events/{sub}")
    assert code == 200


def test_batch_endpoints(server):
    call(server, "POST", "/api/v1/db", {"name": "bdb"})
    call(server, "POST", "/api/v1/db/bdb/namespaces", {
        "name": "b", "indexes": [
            {"name": "id", "index_type": "hash", "field_type": "int",
             "is_pk": True},
            {"name": "txt", "index_type": "text", "field_type": "string"},
            {"name": "vec", "index_type": "vec_bf",
             "config": {"dimension": 4, "metric": "l2"}}]})
    call(server, "PUT", "/api/v1/db/bdb/namespaces/b/items", [
        {"id": 1, "txt": "alpha words", "vec": [0.0, 0, 0, 0]},
        {"id": 2, "txt": "beta words", "vec": [1.0, 0, 0, 0]}])
    code, body = call(server, "POST", "/api/v1/db/bdb/namespaces/b/knn_batch",
                      {"field": "vec", "queries": [[0.0, 0, 0, 0],
                                                   [1.0, 0, 0, 0]],
                       "params": {"k": 1}})
    assert code == 200
    assert body["results"][0]["items"][0]["id"] == 1
    assert body["results"][1]["items"][0]["id"] == 2
    code, body = call(server, "POST", "/api/v1/db/bdb/namespaces/b/ft_batch",
                      {"field": "txt", "queries": ["alpha", "beta"]})
    assert code == 200
    assert body["results"][0]["items"][0]["id"] == 1
    assert body["results"][1]["items"][0]["id"] == 2


def test_server_rediscovers_databases(tmp_path):
    root = str(tmp_path / "srvroot")
    srv = ReindexerServer(port=0, storage_root=root)
    srv.start()
    try:
        call(srv, "POST", "/api/v1/db", {"name": "persisted"})
        call(srv, "POST", "/api/v1/db/persisted/namespaces", {
            "name": "n", "indexes": [{"name": "id", "index_type": "hash",
                                      "field_type": "int", "is_pk": True}]})
        call(srv, "PUT", "/api/v1/db/persisted/namespaces/n/items",
             {"id": 7})
    finally:
        srv.stop()

    srv2 = ReindexerServer(port=0, storage_root=root)
    srv2.start()
    try:
        code, body = call(srv2, "GET", "/api/v1/db")
        assert "persisted" in body["items"]
        code, body = call(srv2, "GET",
                          "/api/v1/db/persisted/query?q=SELECT%20*%20FROM%20n")
        assert body["items"][0]["id"] == 7
    finally:
        srv2.stop()


def raw_call(srv, method, path, data=None, headers=None):
    url = f"http://127.0.0.1:{srv.port}{path}"
    req = urllib.request.Request(url, data=data, method=method)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    with urllib.request.urlopen(req) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


def test_msgpack_wire_format(server):
    """format=msgpack / Accept + msgpack request bodies (reference: per-
    format builders, core/cjson msgpack codec + httpserver format param)."""
    msgpack = pytest.importorskip("msgpack")
    call(server, "POST", "/api/v1/db", {"name": "mpdb"})
    call(server, "POST", "/api/v1/db/mpdb/namespaces", {
        "name": "ms", "indexes": [
            {"name": "id", "index_type": "hash", "field_type": "int",
             "is_pk": True}]})
    # write items with a msgpack body
    payload = msgpack.packb([{"id": 1, "tag": "a"}, {"id": 2, "tag": "b"}])
    code, ctype, _ = raw_call(
        server, "PUT", "/api/v1/db/mpdb/namespaces/ms/items", payload,
        {"Content-Type": "application/x-msgpack"})
    assert code == 200
    # read them back as msgpack (query param)
    code, ctype, raw = raw_call(
        server, "GET", "/api/v1/db/mpdb/namespaces/ms/items?format=msgpack")
    assert code == 200 and "msgpack" in ctype
    body = msgpack.unpackb(raw)
    assert {d["id"] for d in body["items"]} == {1, 2}
    # Accept-header negotiation on the query route
    code, ctype, raw = raw_call(
        server, "GET", "/api/v1/db/mpdb/query?q=SELECT%20*%20FROM%20ms",
        headers={"Accept": "application/x-msgpack"})
    assert code == 200 and "msgpack" in ctype
    assert len(msgpack.unpackb(raw)["items"]) == 2


def test_csv_export(server):
    """format=csv-file renders items as CSV (reference: csvbuilder.cc)."""
    call(server, "POST", "/api/v1/db", {"name": "csvdb"})
    call(server, "POST", "/api/v1/db/csvdb/namespaces", {
        "name": "cs", "indexes": [
            {"name": "id", "index_type": "hash", "field_type": "int",
             "is_pk": True}]})
    call(server, "PUT", "/api/v1/db/csvdb/namespaces/cs/items",
         [{"id": 1, "name": "x", "tags": ["a", "b"]},
          {"id": 2, "name": "y"}])
    code, ctype, raw = raw_call(
        server, "GET",
        "/api/v1/db/csvdb/query?q=SELECT%20*%20FROM%20cs&format=csv-file")
    assert code == 200 and "csv" in ctype
    lines = raw.decode().strip().splitlines()
    assert lines[0].split(",")[:2] == ["id", "name"]
    assert len(lines) == 3
    assert '"[""a"", ""b""]"' in lines[1]


def test_face_ui(server):
    import urllib.request
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/face/") as r:
        body = r.read().decode()
    assert "reindexer_tpu" in body and "<html" in body
    # root redirects to the face
    req = urllib.request.Request(f"http://127.0.0.1:{server.port}/")
    with urllib.request.urlopen(req) as r:
        assert "<html" in r.read().decode()


def test_concurrent_mixed_format_requests(server):
    """Concurrent clients with different response formats on keep-alive
    connections must not cross-contaminate (per-request _fmt/_pb_ns
    state lives on a per-connection handler instance)."""
    import threading
    import urllib.request
    base = f"http://127.0.0.1:{server.port}/api/v1/db/testdb"
    call(server, "POST", "/api/v1/db", {"name": "testdb"})
    call(server, "POST", "/api/v1/db/testdb/namespaces",
         {"name": "cc", "indexes": [
             {"name": "id", "json_paths": ["id"], "field_type": "int",
              "index_type": "hash", "is_pk": True}]})
    for i in range(50):
        call(server, "POST", "/api/v1/db/testdb/namespaces/cc/items",
             {"id": i})
    errors = []

    def worker(fmt):
        try:
            for _ in range(25):
                url = (f"{base}/query?q=SELECT%20*%20FROM%20cc"
                       + (f"&format={fmt}" if fmt else ""))
                with urllib.request.urlopen(url) as r:
                    ct = r.headers["Content-Type"]
                    body = r.read()
                if fmt == "protobuf":
                    assert ct.startswith("application/protobuf"), ct
                elif fmt == "msgpack":
                    assert "msgpack" in ct, ct
                else:
                    assert "json" in ct, ct
                    assert b'"items"' in body
        except Exception as e:        # pragma: no cover
            errors.append(e)

    ts = [threading.Thread(target=worker, args=(f,))
          for f in (None, "protobuf", "msgpack", None)]
    [t.start() for t in ts]
    [t.join(timeout=60) for t in ts]
    assert not errors, errors


def test_tls_and_md5crypt_auth(tmp_path):
    """HTTPS listener + md5crypt-stored credentials (reference: server
    ENABLE_OPENSSL https + dbmanager md5crypt passwords)."""
    import json
    import ssl
    import subprocess
    import urllib.request

    from reindexer_tpu.server.auth import AuthManager, md5crypt
    from reindexer_tpu.server.http import ReindexerServer

    cert = tmp_path / "cert.pem"
    key = tmp_path / "key.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "1",
         "-subj", "/CN=localhost"],
        check=True, capture_output=True)
    auth = AuthManager({"alice": {"hash": md5crypt("s3cret", "somesalt"),
                                  "roles": {"*": "owner"}}})
    srv = ReindexerServer(port=0, auth=auth, certfile=str(cert),
                          keyfile=str(key))
    srv.start()
    try:
        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        url = f"https://127.0.0.1:{srv.port}/api/v1/db"
        import base64
        ok = base64.b64encode(b"alice:s3cret").decode()
        req = urllib.request.Request(url, headers={
            "Authorization": f"Basic {ok}"})
        with urllib.request.urlopen(req, context=ctx) as r:
            assert r.status == 200
            json.loads(r.read())
        bad = base64.b64encode(b"alice:wrong").decode()
        req = urllib.request.Request(url, headers={
            "Authorization": f"Basic {bad}"})
        try:
            urllib.request.urlopen(req, context=ctx)
            assert False, "bad password must be rejected"
        except urllib.error.HTTPError as e:
            assert e.code == 401
    finally:
        srv.stop()


def test_tracing_spans():
    """OTel-analog spans (reference: tracing.go): an HTTP request produces
    a server span with a child Reindexer.Query span sharing its trace."""
    import json as _json
    import urllib.request

    from reindexer_tpu import tracing
    from reindexer_tpu.server.http import ReindexerServer

    exp = tracing.InMemoryExporter()
    tracing.configure(exp)
    srv = ReindexerServer(port=0)
    try:
        srv.start()
        db = srv.mgr.create("t")
        from reindexer_tpu import IndexDef, IndexOpts
        db.open_namespace("items", [
            IndexDef("id", "hash", "int", opts=IndexOpts(is_pk=True))])
        db.upsert("items", {"id": 1})
        url = (f"http://127.0.0.1:{srv.port}/api/v1/db/t/sqlquery")
        req = urllib.request.Request(url, data=b"SELECT * FROM items",
                                     method="POST")
        with urllib.request.urlopen(req) as r:
            _json.loads(r.read())
    finally:
        srv.stop()
        tracing.configure(None)
    names = [s["name"] for s in exp.spans]
    assert "Reindexer.Query" in names
    assert "HTTP POST" in names
    child = next(s for s in exp.spans if s["name"] == "Reindexer.Query")
    parent = next(s for s in exp.spans if s["name"] == "HTTP POST")
    assert child["trace_id"] == parent["trace_id"]
    assert child["parent_span_id"] == parent["span_id"]
    assert child["end_time_unix_nano"] >= child["start_time_unix_nano"]
