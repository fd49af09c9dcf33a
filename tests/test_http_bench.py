"""Real-HTTP fetch-stage measurement (VERDICT r4 item 7).

The PooledOpener was connection-count tested but never bench-recorded:
this closes the last untested seam between the sandbox posture
(SyntheticFetcher join) and the production posture (http_fetch_stage
over real sockets). A loopback ThreadingHTTPServer serves the SYNTHETIC
CORPUS bytes; the same scheduled frontier then runs through BOTH paths
and the test prints one parseable line

    # http_bench urls=... http_urls_per_sec=... reuse_rate=...
      synthetic_urls_per_sec=...

whose numbers are recorded in BASELINE.md (fetch-seam row). Loopback
has no network latency, so http_urls_per_sec here measures the ENGINE
side of the socket path (opener pooling, header parse, charset decode,
Arrow batching) — the part we own; wire latency at crawl scale is
politeness-bounded anyway.
"""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

N_PAGES = 2000
PARTS = 4


class _CorpusServer(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self, addr, handler, pages: dict):
        super().__init__(addr, handler)
        self.pages = pages
        self.connections = 0
        self.requests = 0
        self._lock = threading.Lock()


class _CorpusHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    # headers and body go out as two small writes; with Nagle on, the
    # second waits ~40ms for the client's delayed ACK (measured: 30
    # urls/s with, wire-speed without). Handler-class attribute — this
    # is socketserver.StreamRequestHandler's knob.
    disable_nagle_algorithm = True

    def setup(self):
        super().setup()
        with self.server._lock:
            self.server.connections += 1

    def do_GET(self):
        with self.server._lock:
            self.server.requests += 1
        body = self.server.pages.get(self.path)
        if body is None:
            body = b"nope"
            self.send_response(404)
        else:
            self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def corpus_server(spark):
    from raven_spark.sources.corpus import generate_pages

    rows = (
        generate_pages(spark, N_PAGES, seed=42)
        .select("url", "html")
        .collect()
    )
    pages = {f"/p{i}": bytes(r["html"]) for i, r in enumerate(rows)}
    srv = _CorpusServer(("127.0.0.1", 0), _CorpusHandler, pages)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv
    finally:
        srv.shutdown()
        srv.server_close()


def _frontier(spark, urls):
    return spark.createDataFrame(
        [(u, u, i, "127.0.0.1", 1, i % PARTS, 100, 0, 0, 0) for i, u in enumerate(urls)],
        "url string, url_canon string, url_hash long, host string, host_hash long, "
        "salt_bucket int, priority int, depth int, round_added int, deferred_count int",
    ).repartition(PARTS, "salt_bucket")


@pytest.mark.http_server_bench
def test_http_fetch_stage_bench_vs_synthetic(spark, corpus_server):
    from raven_spark.operators.fetch import PassthroughFetcher, fetch_stage
    from raven_spark.operators.http import PooledOpener, http_fetch_stage
    from raven_spark.sources.corpus import generate_pages

    base = f"http://127.0.0.1:{corpus_server.server_address[1]}"
    urls = [f"{base}/p{i}" for i in range(N_PAGES)]
    df = _frontier(spark, urls).persist()
    df.count()

    # warm both paths once (worker spawn + JIT excluded, bench.py's rule)
    http_fetch_stage(df.limit(64), PooledOpener(), max_retry=0).count()
    c0, r0 = corpus_server.connections, corpus_server.requests

    t0 = time.time()
    out = http_fetch_stage(df, PooledOpener(), max_retry=0)
    n_ok = out.filter(F.col("result_code") == 200).count()
    http_wall = time.time() - t0
    assert n_ok == N_PAGES
    reqs = corpus_server.requests - r0
    conns = max(corpus_server.connections - c0, 1)
    reuse = reqs / conns

    # synthetic twin: same frontier SHAPE, but url_canon must hit the
    # corpus join key (the corpus's own urls), not the loopback paths
    corpus = generate_pages(spark, N_PAGES, seed=42).persist()
    syn_urls = [r["url"] for r in corpus.select("url").collect()]
    sdf = _frontier(spark, syn_urls).persist()
    sdf.count()
    fetcher = PassthroughFetcher(corpus)
    fetch_stage(sdf.limit(64), fetcher, default_max_retry=0).count()
    t0 = time.time()
    n_syn = (
        fetch_stage(sdf, fetcher, default_max_retry=0)
        .filter(F.col("result_code") == 200)
        .count()
    )
    syn_wall = time.time() - t0
    assert n_syn == N_PAGES
    corpus.unpersist()
    sdf.unpersist()
    df.unpersist()

    print(
        f"\n# http_bench urls={N_PAGES} "
        f"http_urls_per_sec={N_PAGES / http_wall:.0f} "
        f"reuse_rate={reuse:.0f} conns={conns} "
        f"synthetic_urls_per_sec={n_syn / syn_wall:.0f}"
    )
    # contract: every url succeeded over real sockets, and keep-alive
    # actually pooled (hundreds of requests per TCP connection, not ~1)
    assert reuse > 20, (reqs, conns)
