"""PooledOpener: keep-alive connection reuse per host (F3 scale target),
contract parity with default_opener, and end-to-end stage use over real
sockets on loopback (no external network)."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from raven_spark.operators.http import PooledOpener, _fetch_one


class _CountingServer(ThreadingHTTPServer):
    """Counts accepted TCP connections — with HTTP/1.1 keep-alive, one
    connection serves many requests, so the count IS the reuse metric."""

    daemon_threads = True

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.connections = 0
        self.requests = 0


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"  # keep-alive by default

    def setup(self):
        super().setup()
        self.server.connections += 1

    def _body(self, data: bytes, status: int = 200, extra: dict | None = None):
        self.server.requests += 1
        self.send_response(status)
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        if self.path == "/redir":
            self._body(b"", 302, {"Location": "/ok"})
        elif self.path == "/badredir":
            self._body(b"", 301, {"Location": "http://127.0.0.1:99999/x"})
        elif self.path == "/lowredir":
            # lowercase header name: legal per RFC 7230, must be followed
            self.server.requests += 1
            self.send_response(302)
            self.send_header("location", "/ok")
            self.send_header("Content-Length", "0")
            self.end_headers()
        elif self.path == "/404":
            self._body(b"nope", 404)
        elif self.path == "/big":
            self._body(b"A" * 200_000, 200)
        elif self.path == "/close":
            self.close_connection = True
            self._body(b"<html><body>bye</body></html>", 200, {"Connection": "close"})
        else:
            self._body(b"<html><body>hello pooled</body></html>")

    def do_POST(self):
        n = int(self.headers.get("Content-Length") or 0)
        echo = self.rfile.read(n)
        self._body(b"<html><body>" + echo + b"</body></html>")

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def server():
    srv = _CountingServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv
    finally:
        srv.shutdown()
        srv.server_close()


def test_connection_reuse_per_host(server):
    """N sequential requests to one host ride ONE TCP connection."""
    op = PooledOpener()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    for i in range(6):
        status, hdrs, body, ctype = op(f"{base}/p{i}", method="GET")
        assert status == 200 and b"hello pooled" in body
    assert server.requests == 6
    assert server.connections == 1
    assert op.connections_opened == 1
    op.close()


def test_distinct_hosts_get_distinct_connections(server):
    """127.0.0.1 and localhost are distinct pool keys (host-keyed)."""
    op = PooledOpener()
    port = server.server_address[1]
    for host in ("127.0.0.1", "localhost", "127.0.0.1", "localhost"):
        status, *_ = op(f"http://{host}:{port}/x", method="GET")
        assert status == 200
    assert server.connections == 2
    assert op.connections_opened == 2
    op.close()


def test_contract_parity_status_and_redirect(server):
    """4xx comes back as a response (no raise), GET redirects are
    followed — same observable contract as default_opener."""
    op = PooledOpener()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    status, hdrs, body, ctype = op(f"{base}/404", method="GET")
    assert status == 404 and body == b"nope"
    status, _h, body, _c = op(f"{base}/redir", method="GET")
    assert status == 200 and b"hello pooled" in body
    assert "text/html" in ctype
    op.close()


def test_connection_close_header_drops_pooled_socket(server):
    """A Connection: close response must not poison the pool: the next
    request transparently opens a fresh connection."""
    op = PooledOpener()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    assert op(f"{base}/close", method="GET")[0] == 200
    assert op(f"{base}/ok", method="GET")[0] == 200
    assert op.connections_opened == 2  # close honored, reconnect clean
    op.close()


def test_stale_socket_retries_once_fresh(server):
    """Server restarts between requests -> stale keep-alive socket; the
    opener must retry once on a fresh connection instead of erroring."""
    op = PooledOpener()
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    assert op(f"{base}/a", method="GET")[0] == 200
    # kill the live server, start a fresh one on the SAME port
    server.shutdown()
    server.server_close()
    srv2 = _CountingServer(("127.0.0.1", port), _Handler)
    t = threading.Thread(target=srv2.serve_forever, daemon=True)
    t.start()
    try:
        status, _h, body, _c = op(f"{base}/b", method="GET")
        assert status == 200 and b"hello pooled" in body
    finally:
        srv2.shutdown()
        srv2.server_close()
    op.close()


def test_pool_lru_eviction(server):
    op = PooledOpener(max_hosts=1)
    port = server.server_address[1]
    for host in ("127.0.0.1", "localhost", "127.0.0.1"):
        assert op(f"http://{host}:{port}/x", method="GET")[0] == 200
    # cap=1: every host switch evicts -> 3 opens, server saw 3 connections
    assert op.connections_opened == 3
    op.close()


def test_fetch_one_with_pooled_opener(server):
    """The retry matrix composes with the pooled opener unchanged."""
    op = PooledOpener()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    s, c, _d, att, raw, hdrs, ct, _ms = _fetch_one(op, f"{base}/ok", "GET", {}, None, 2, 1, 0)
    assert (s, c, att) == (200, 200, 1)
    s, c, _d, att, *_ = _fetch_one(op, f"{base}/404", "GET", {}, None, 2, 3, 0)
    assert (s, c, att) == (404, 400, 1)  # fast-fail, no retry
    op.close()


def test_pickle_roundtrip_drops_live_sockets(server):
    import pickle

    op = PooledOpener(max_hosts=7)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    assert op(f"{base}/x", method="GET")[0] == 200
    clone = pickle.loads(pickle.dumps(op))
    assert clone.max_hosts == 7 and clone.connections_opened == 0
    assert clone(f"{base}/y", method="GET")[0] == 200
    op.close()
    clone.close()


def test_http_stage_over_real_sockets(spark, server):
    """http_fetch_stage with PooledOpener against the loopback server:
    real sockets through mapInPandas, one partition -> one worker pool."""
    from raven_spark.operators.http import http_fetch_stage

    base = f"http://127.0.0.1:{server.server_address[1]}"
    urls = [f"{base}/page{i}" for i in range(5)]
    df = spark.createDataFrame(
        [(u, u, i, "127.0.0.1", 1, 0, 100, 0, 0, 0) for i, u in enumerate(urls)],
        "url string, url_canon string, url_hash long, host string, host_hash long, "
        "salt_bucket int, priority int, depth int, round_added int, deferred_count int",
    ).coalesce(1)
    out = http_fetch_stage(df, PooledOpener(), max_retry=0).collect()
    assert len(out) == 5
    assert all(r["result_code"] == 200 for r in out)
    assert all(r["text"] == "hello pooled" for r in out)
    # 5 requests from one worker partition: connection count well under
    # request count proves in-worker reuse (warmup may add a socket)
    assert server.requests >= 5
    assert server.connections <= 2


def test_malformed_redirect_is_oserror_not_crash(server):
    """Regression (code-review r3): a hostile Location (port 99999) must
    surface as OSError (-> retry-matrix code 800), never escape the
    Opener contract and kill the fetch task."""
    op = PooledOpener()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    with pytest.raises(OSError):
        op(f"{base}/badredir", timeout_s=2)
    # and through the retry matrix: code 800, task alive
    status, code, *_ = _fetch_one(op, f"{base}/badredir", "GET", {}, None, 2, 0, 0)
    assert code == 800
    op.close()


def test_lowercase_location_header_followed(server):
    """Regression (code-review r3): header names are case-insensitive;
    a lowercase 'location:' must still be followed."""
    op = PooledOpener()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    status, hdrs, data, ctype = op(f"{base}/lowredir", timeout_s=2)
    assert status == 200 and b"hello pooled" in data
    assert ctype and "text/html" in ctype
    op.close()


def test_invalid_scheme_is_oserror():
    op = PooledOpener()
    for bad in ("mailto:x@y.example", "http:///nopath", "ftp://h.example/x"):
        with pytest.raises(OSError):
            op(bad, timeout_s=1)
    op.close()


def test_bounded_read_truncates_and_drops_connection(server):
    """Regression (code-review r4): max_bytes caps the body AT THE READ.
    An oversize body is truncated to the cap, and the keep-alive
    connection is dropped (unread bytes would poison the next request on
    it); an in-cap body keeps the connection pooled."""
    op = PooledOpener()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    status, _h, body, _c = op(f"{base}/big", method="GET", max_bytes=10_000)
    assert status == 200 and len(body) == 10_000
    # oversize read dropped the pooled socket: the next request opens a
    # fresh connection and still gets a clean response
    status, _h, body, _c = op(f"{base}/p1", method="GET", max_bytes=10_000)
    assert status == 200 and b"hello pooled" in body
    assert op.connections_opened == 2
    # in-cap body: connection stays pooled across requests
    for _ in range(3):
        status, _h, body, _c = op(f"{base}/p2", method="GET", max_bytes=10_000)
        assert status == 200
    assert op.connections_opened == 2
    op.close()


def test_default_opener_bounded_read(server):
    from raven_spark.operators.http import default_opener

    base = f"http://127.0.0.1:{server.server_address[1]}"
    status, _h, body, _c = default_opener(f"{base}/big", max_bytes=4_096)
    assert status == 200 and len(body) == 4_096
    status, _h, body, _c = default_opener(f"{base}/p1")
    assert status == 200 and b"hello pooled" in body
