"""Production HTTP fetch stage — the real-network twin of fetch.py's
synthetic path, sharing the reference's retry matrix and charset pipeline
exactly (crawler.rs:25-148):

- attempts = max_retry + 1 (crawler.rs:113-138)
- 5xx -> retry until budget exhausted -> ServerError 500
- timeout -> retry until budget exhausted -> TimeoutError 600
- 4xx -> fail IMMEDIATELY, no retry (crawler.rs:110-112) -> 400
- other I/O error -> fail immediately (crawler.rs:140-144) -> 800
- per-attempt sleep honored BEFORE every attempt incl. retries
  (crawler.rs:42-45) — safe here because the scheduled frontier is
  partitioned by salt_bucket (host-local partitions), so a sleep only
  delays that host's own partition, never a whole executor's unrelated
  work; the window-budget cap in politeness.py bounds total rows per host
  per round independently
- charset conversion + conflict check (C1-C4) -> codes 700, via the same
  convert_and_decode used by the synthetic stage

The HTTP client is an injected ``opener`` callable so the stage is fully
unit-testable without a network:

    opener(url, method, headers, body, timeout_s) ->
        (status:int, headers:dict, body:bytes, content_type:str|None)
    raising TimeoutError for timeouts, OSError for transport errors.

``default_opener`` implements it over urllib (stdlib; no extra deps).
This module performs NO network I/O at import or plan time; I/O happens
only inside executor tasks when a real opener is passed.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raven_spark.functions.charset import (
    CharsetConversionError,
    convert_and_decode,
    normalize_charset,
)
from raven_spark.functions.mime import is_text_mime, parse_content_type
from raven_spark.functions.text import extract_links, extract_text
from raven_spark.operators.fetch import (
    CODE_CHARSET,
    CODE_CLIENT_ERROR,
    CODE_NOT_MODIFIED,
    CODE_OTHER,
    CODE_SERVER_ERROR,
    CODE_SUCCESS,
    CODE_TIMEOUT,
    FETCH_OUTPUT_COLUMNS,
    RESULT_LABELS,
)

Opener = Callable[..., tuple]


def default_opener(url, method="GET", headers=None, body=None, timeout_s=1,
                   max_bytes=None):
    """stdlib urllib opener implementing the Opener contract.

    ``max_bytes`` bounds the body AT THE READ (``resp.read(n)``), so a
    hostile endpoint streaming gigabytes never materializes more than the
    cap in the Python worker — truncating after a full ``read()`` would
    protect nothing. None = unbounded (page-fetch parity with the
    reference, which reads whole bodies)."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, method=method, headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            data = resp.read(max_bytes) if max_bytes is not None else resp.read()
            hdrs = dict(resp.headers.items())
            return resp.status, hdrs, data, hdrs.get("Content-Type")
    except urllib.error.HTTPError as e:  # 4xx/5xx come back as a response
        data = e.read() if e.fp else b""
        hdrs = dict(e.headers.items()) if e.headers else {}
        return e.code, hdrs, data, hdrs.get("Content-Type")
    except TimeoutError:
        raise
    except urllib.error.URLError as e:
        if isinstance(getattr(e, "reason", None), TimeoutError):
            raise TimeoutError(str(e)) from e
        raise OSError(str(e)) from e


class PooledOpener:
    """Opener with per-host keep-alive connection reuse (stdlib
    http.client) — the F3 scale target: at real-crawl scale a fresh
    TCP+TLS handshake per request dominates small fetches, so connections
    are pooled per (scheme, host, port) and reused across every row a
    Python worker processes (workers are long-lived across batches).

    Contract-identical to ``default_opener`` (status, headers, body,
    content_type; TimeoutError on timeouts, OSError on transport errors),
    including GET-redirect following. Pickles clean: the pool is
    per-process state, dropped on serialization and rebuilt lazily on the
    executor, so the object can be shipped into mapInPandas freely.

    A stale keep-alive socket (server closed between reuses) surfaces as
    RemoteDisconnected/ECONNRESET — retried ONCE on a fresh connection,
    which is the standard idempotent-replay rule; a fresh-connection
    failure propagates as OSError (code 800 upstream). The pool is a
    small LRU (default 32 hosts) because scheduled partitions are
    host-local (salt_bucket): a task touches few distinct hosts.
    """

    MAX_REDIRECTS = 5

    def __init__(self, max_hosts: int = 32):
        self.max_hosts = max_hosts
        self._conns: "OrderedDict" = None  # type: ignore[assignment]
        self.connections_opened = 0  # test/metrics visibility

    def __getstate__(self):
        return {"max_hosts": self.max_hosts}

    def __setstate__(self, state):
        self.max_hosts = state["max_hosts"]
        self._conns = None
        self.connections_opened = 0

    def _pool(self):
        if self._conns is None:
            from collections import OrderedDict

            self._conns = OrderedDict()
        return self._conns

    def _connect(self, scheme: str, host: str, port: int | None, timeout_s: float):
        import http.client

        pool = self._pool()
        key = (scheme, host, port)
        conn = pool.pop(key, None)
        if conn is None:
            cls = http.client.HTTPSConnection if scheme == "https" else http.client.HTTPConnection
            conn = cls(host, port, timeout=timeout_s)
            self.connections_opened += 1
        pool[key] = conn  # move-to-end: LRU order
        while len(pool) > self.max_hosts:
            _, old = pool.popitem(last=False)
            old.close()
        conn.timeout = timeout_s
        if getattr(conn, "sock", None) is not None:
            conn.sock.settimeout(timeout_s)
            self._nodelay(conn.sock)
        return key, conn

    @staticmethod
    def _nodelay(sock) -> None:
        # Nagle + delayed-ACK interaction costs ~40ms per small write
        # pair (request headers + POST body; measured end-to-end in
        # tests/test_http_bench.py: 30 urls/s with Nagle vs wire-speed
        # without) — a crawler's writes are small and latency-bound, so
        # TCP_NODELAY is the correct posture on every pooled socket
        import socket as _socket

        try:
            sock.setsockopt(_socket.IPPROTO_TCP, _socket.TCP_NODELAY, 1)
        except (OSError, AttributeError):
            pass

    def _drop(self, key) -> None:
        conn = self._pool().pop(key, None)
        if conn is not None:
            conn.close()

    def close(self) -> None:
        for conn in self._pool().values():
            conn.close()
        self._pool().clear()

    @staticmethod
    def _hget(hdrs: dict, name: str):
        """Case-insensitive header lookup (RFC 7230: field names are
        case-insensitive on the wire; urllib matched insensitively, a
        plain dict.get would not)."""
        lname = name.lower()
        for k, v in hdrs.items():
            if k.lower() == lname:
                return v
        return None

    def __call__(self, url, method="GET", headers=None, body=None, timeout_s=1,
                 max_bytes=None):
        import http.client
        from urllib.parse import urljoin, urlsplit

        headers = dict(headers or {})
        for _hop in range(self.MAX_REDIRECTS + 1):
            # URL parsing must stay inside the Opener contract: a hostile
            # redirect Location (port 99999, 'http:///x', 'mailto:')
            # raises ValueError/InvalidURL here — surface it as OSError
            # (code 800 downstream) like default_opener, never crash the
            # whole mapInPandas task
            try:
                parts = urlsplit(url)
                host, port = parts.hostname, parts.port
            except ValueError as e:
                raise OSError(f"invalid URL {url!r}: {e}") from e
            if not host or parts.scheme not in ("http", "https"):
                raise OSError(f"invalid URL {url!r}: no http(s) host")
            path = parts.path or "/"
            if parts.query:
                path += "?" + parts.query
            reused_first = True
            while True:
                key, conn = self._connect(parts.scheme, host, port, timeout_s)
                was_fresh = conn.sock is None
                try:
                    if was_fresh:
                        # connect eagerly so the FIRST request's socket
                        # gets TCP_NODELAY too, not just reused ones
                        conn.connect()
                        self._nodelay(conn.sock)
                    conn.request(method, path, body=body, headers=headers)
                    resp = conn.getresponse()
                    if max_bytes is not None:
                        # bounded read: cap allocation at the socket. Read
                        # one extra byte to detect overflow; an oversize
                        # body leaves unread bytes on the connection, which
                        # would poison keep-alive reuse -> drop it.
                        data = resp.read(max_bytes + 1)
                        if len(data) > max_bytes:
                            data = data[:max_bytes]
                            self._drop(key)
                    else:
                        data = resp.read()
                    hdrs = dict(resp.getheaders())
                    if resp.will_close:
                        self._drop(key)
                    break
                except TimeoutError:
                    self._drop(key)
                    raise
                except (http.client.HTTPException, OSError, ValueError) as e:
                    self._drop(key)
                    # silent replay is only safe for idempotent methods: a
                    # stale-keep-alive POST may already have been processed
                    # by the server before the reset
                    replayable = method in ("GET", "HEAD")
                    if was_fresh or not reused_first or not replayable:
                        raise OSError(str(e)) from e
                    reused_first = False  # stale keep-alive: one fresh retry
            status = resp.status
            loc = self._hget(hdrs, "Location")
            if status in (301, 302, 303, 307, 308) and loc and _hop < self.MAX_REDIRECTS:
                url = urljoin(url, loc)
                if status == 303 or (status in (301, 302) and method == "POST"):
                    method, body = "GET", None  # urllib redirect semantics
                    # ...including urllib's header hygiene: the follow-up
                    # GET must not advertise the dropped body
                    headers = {k: v for k, v in headers.items()
                               if k.lower() not in ("content-type", "content-length")}
                continue
            return status, hdrs, data, self._hget(hdrs, "Content-Type")
        return status, hdrs, data, self._hget(hdrs, "Content-Type")


def form_body(params: dict | None) -> bytes | None:
    """POST form body: url-encoded ``body_params`` with SORTED keys — the
    same canonical order as F1's query strings (§2.1 determinism; the
    reference sends HashMap-ordered forms via client.post(url).form(...),
    crawler.rs:49, which is unreproducible)."""
    if not params:
        return None
    from urllib.parse import urlencode

    return urlencode(sorted(params.items())).encode("ascii")


_FORM_CONTENT_TYPE = "application/x-www-form-urlencoded"


def _fetch_one(opener: Opener, url, method, headers, body, timeout_s, max_retry, sleep_s):
    """One row's fetch-with-retry; returns
    (status, code, detail, attempts, raw_body, resp_headers, content_type, fetch_ms)."""
    attempts = 0
    t0 = time.monotonic()
    while True:
        attempts += 1
        if sleep_s:
            time.sleep(sleep_s)  # before EVERY attempt (crawler.rs:42-45)
        try:
            status, hdrs, raw, ctype = opener(
                url, method=method, headers=headers, body=body, timeout_s=timeout_s
            )
        except TimeoutError:
            if attempts <= max_retry:
                continue
            ms = int((time.monotonic() - t0) * 1000)
            return 0, CODE_TIMEOUT, f"timeout after {attempts} attempts", attempts, None, None, None, ms
        except OSError as e:
            ms = int((time.monotonic() - t0) * 1000)
            return 0, CODE_OTHER, f"connection error: {e}"[:200], attempts, None, None, None, ms
        ms = int((time.monotonic() - t0) * 1000)
        if status == 304:  # conditional revalidation hit: success-class,
            # empty body by protocol; the prior capture stays authoritative
            return status, CODE_NOT_MODIFIED, "", attempts, b"", hdrs, ctype, ms
        if 400 <= status < 500:  # fail fast, no retry (crawler.rs:110-112)
            return status, CODE_CLIENT_ERROR, f"client error: {status}", attempts, raw, hdrs, ctype, ms
        if status >= 500:
            if attempts <= max_retry:
                continue
            return status, CODE_SERVER_ERROR, f"server error: {status} after retries", attempts, raw, hdrs, ctype, ms
        return status, CODE_SUCCESS, "", attempts, raw, hdrs, ctype, ms


def http_fetch_stage(
    scheduled: DataFrame,
    opener: Opener = default_opener,
    output_charset: str = "utf-8",
    input_charset: str | None = None,
    timeout_s: int = 1,
    max_retry: int = 0,
    sleep_s: float = 0.0,
    method: str = "GET",
    headers: dict | None = None,
    body_params: dict | None = None,
) -> DataFrame:
    """scheduled frontier rows -> fetch results via real HTTP.

    Same output schema as fetch.fetch_stage; per-row frontier columns
    ``timeout_s``/``max_retry``/``sleep_s``/``method``/``body_params``
    override the stage defaults when present.

    POST parity (T8 end-to-end, crawler.rs:49): a POST row's
    ``body_params`` map is sent as a url-encoded form body (sorted keys,
    F1 canonical order) with ``Content-Type: application/x-www-form-
    urlencoded`` — unless the config already sets an explicit Content-Type
    header, which wins.

    Encoding parity (C1/C2, crawler.rs:150-176): ``input_charset``
    overrides the response header's charset and supplies the text/plain
    fallback when Content-Type is missing; ``output_charset`` is the
    conversion target (conflict -> code 700).
    """
    in_fields = [f for f in scheduled.schema.fields if not f.name.startswith("_")]
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in in_fields)
    out_schema += ", " + FETCH_OUTPUT_COLUMNS
    keep_cols = [f.name for f in in_fields]
    out_label = normalize_charset(output_charset) or "utf-8"
    in_label = normalize_charset(input_charset) if input_charset else None
    base_hdrs = dict(headers or {})
    has_ctype_hdr = any(k.lower() == "content-type" for k in base_hdrs)
    default_body = form_body(body_params)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            urls = pdf["url_canon"].to_numpy(dtype=object)
            row_timeout = pdf["timeout_s"] if "timeout_s" in pdf else None
            row_retry = pdf["max_retry"] if "max_retry" in pdf else None
            row_sleep = pdf["sleep_s"] if "sleep_s" in pdf else None
            row_method = pdf["method"] if "method" in pdf else None
            row_body = pdf["body_params"] if "body_params" in pdf else None
            row_inm = pdf["if_none_match"] if "if_none_match" in pdf else None
            row_ims = pdf["if_modified_since"] if "if_modified_since" in pdf else None

            cols: dict[str, list] = {k: [] for k in (
                "status", "result_code", "detail", "attempts", "fetch_ms",
                "content_type", "charset", "resp_headers", "html", "text", "links")}
            def _cell(series, i, default):
                # per-row override columns may hold nulls (discovery rows
                # carry no request fields) -> fall back to stage defaults
                if series is None:
                    return default
                v = series.iloc[i]
                return default if v is None or v != v else v

            for i in range(n):
                meth = _cell(row_method, i, method)
                # body AND its Content-Type exist only for POST rows: a GET
                # row in a config that declares body_params must not carry a
                # form Content-Type header for a body that is never sent
                body = None
                if meth == "POST":
                    row_bp = _cell(row_body, i, None)
                    body = form_body(row_bp) if row_bp is not None else default_body
                hdrs = base_hdrs
                if body is not None and not has_ctype_hdr:
                    hdrs = {**base_hdrs, "Content-Type": _FORM_CONTENT_TYPE}
                inm = _cell(row_inm, i, None)
                ims = _cell(row_ims, i, None)
                if inm is not None or ims is not None:
                    hdrs = dict(hdrs)
                    if inm is not None:
                        hdrs["If-None-Match"] = inm
                    if ims is not None:
                        hdrs["If-Modified-Since"] = ims
                status, code, detail, attempts, raw, rhdrs, ctype, ms = _fetch_one(
                    opener,
                    urls[i],
                    method=meth,
                    headers=hdrs,
                    body=body,
                    timeout_s=int(_cell(row_timeout, i, timeout_s)),
                    max_retry=int(_cell(row_retry, i, max_retry)),
                    sleep_s=float(_cell(row_sleep, i, sleep_s)),
                )
                mime = charset = text = None
                links = None
                if code == CODE_SUCCESS and raw is not None:
                    mime, cs = parse_content_type(ctype, fallback_charset=in_label)
                    if is_text_mime(mime):
                        try:
                            # convert_and_decode returns the requested
                            # out_label or raises — the raise IS C3's
                            # code-700 conflict (crawler.rs:91-108)
                            html_str, _converted, _actual = convert_and_decode(raw, cs, out_label)
                            charset = out_label
                            text = extract_text(html_str)
                            links = extract_links(html_str)
                        except CharsetConversionError as e:
                            code, detail = CODE_CHARSET, str(e)[:200]
                elif raw is not None:
                    mime, _cs = parse_content_type(ctype, fallback_charset=in_label)
                cols["status"].append(status)
                cols["result_code"].append(code)
                cols["detail"].append(detail)
                cols["attempts"].append(attempts)
                cols["fetch_ms"].append(ms)
                cols["content_type"].append(mime)
                cols["charset"].append(charset)
                # lowercase keys: header names are case-insensitive on the
                # wire; a canonical spelling keeps map lookups deterministic
                cols["resp_headers"].append(
                    {str(k).lower(): str(v) for k, v in rhdrs.items()} if rhdrs else None
                )
                cols["html"].append(raw)
                cols["text"].append(text)
                cols["links"].append(links)

            out = pdf[keep_cols].copy()
            out["status"] = cols["status"]
            out["result_code"] = cols["result_code"]
            out["result_label"] = [RESULT_LABELS[int(c)] for c in cols["result_code"]]
            out["error_detail"] = cols["detail"]
            out["fetch_ms"] = cols["fetch_ms"]
            out["attempts"] = cols["attempts"]
            out["content_type"] = cols["content_type"]
            out["charset"] = cols["charset"]
            out["response_headers"] = cols["resp_headers"]
            out["html"] = cols["html"]
            out["text"] = cols["text"]
            out["links"] = cols["links"]
            yield out

    return scheduled.mapInPandas(run, out_schema)


class HttpFetcher:
    """Fetcher-protocol adapter for the HTTP stage, so CrawlEngine can be
    constructed with real-network fetching by swapping one argument —
    the same seam the reference swaps in tests (crawler.rs:228-230)."""

    def __init__(self, opener: Opener = default_opener, **stage_kwargs):
        self.opener = opener
        self.stage_kwargs = stage_kwargs

    def resolve(self, scheduled: DataFrame) -> DataFrame:
        return scheduled  # identity: no corpus join, I/O happens in-stage

    def fetch(self, scheduled: DataFrame) -> DataFrame:
        return http_fetch_stage(scheduled, self.opener, **self.stage_kwargs)


def http_fetcher_for(config, opener: Opener | None = None) -> "HttpFetcher":
    """HttpFetcher wired from a RavenConfig — every request knob the
    reference's crawler takes from the config (crawler.rs:25-50,150-176)
    becomes a stage default here; per-row frontier columns (config-seeded
    runs, plans/round.REQUEST_COLUMNS) still override per task.

    Defaults to the pooled keep-alive opener: connections amortize across
    every row a worker fetches (F3's 'one session per batch' target)."""
    req = config.request
    return HttpFetcher(
        opener=opener if opener is not None else PooledOpener(),
        method=req.method,
        headers=dict(req.headers),
        timeout_s=req.timeout_s,
        max_retry=req.max_retry,
        sleep_s=float(config.sleep_s or 0),
        input_charset=req.encoding_in,
        output_charset=req.encoding_out,
    )


def with_conditional_headers(
    frontier: DataFrame,
    prior_pages: DataFrame,
    hash_col: str = "url_hash",
) -> DataFrame:
    """Attach conditional-request columns (``if_none_match`` /
    ``if_modified_since``) to a frontier from the latest prior capture's
    response headers — the revalidation half of recrawl: paired with
    ``EngineOptions.seen_ttl_rounds`` (which reopens the URL), a 304
    answer costs headers instead of the body.

    The prior side keeps only captures that CARRY a validator (a later
    error or bare-304 capture must not shadow the stored ETag — RFC 9110
    allows 304 responses without one) and reduces to one row per url_hash
    with a map-side partial max_by on (round, content-hash tiebreak) —
    same skew posture as snapshots.latest_snapshot — then joins on the
    8-byte hash. Rows with no validator-bearing prior capture get nulls
    -> plain GET. Pre-existing validator columns on the frontier (e.g.
    re-queued deferrals from an earlier round) are dropped first: the
    join re-derives them, and a second copy would make the downstream
    select ambiguous.
    """
    etag = F.element_at(F.col("response_headers"), "etag")
    lm = F.element_at(F.col("response_headers"), "last-modified")
    payload = F.struct(etag.alias("etag"), lm.alias("lm"))
    ordkey = F.struct(
        (F.coalesce(F.col("round"), F.lit(-1)) if "round" in prior_pages.columns
         else F.lit(0)).alias("r"),
        F.xxhash64(payload).alias("tb"),  # content tiebreak, never a latency
    )
    latest = (
        prior_pages.filter(F.col("response_headers").isNotNull())
        .filter(etag.isNotNull() | lm.isNotNull())
        .groupBy(hash_col)
        .agg(F.max_by(payload, ordkey).alias("__v"))
        .select(
            hash_col,
            F.col("__v.etag").alias("if_none_match"),
            F.col("__v.lm").alias("if_modified_since"),
        )
    )
    stale = [c for c in ("if_none_match", "if_modified_since") if c in frontier.columns]
    if stale:
        frontier = frontier.drop(*stale)
    return frontier.join(latest, on=hash_col, how="left")


def supports_max_bytes(opener) -> bool:
    """True when an (injected) opener DECLARES a ``max_bytes`` kwarg.
    Callers that bound bodies (robots/sitemap fetchers) use this to
    decide whether the cap is enforced AT THE SOCKET by the opener or
    only by their post-read slice. Deliberately does NOT count bare
    ``**kwargs``: a forwarding opener would pass the surprise kwarg to
    an inner fetch that may not accept it (TypeError escaping the
    fetch loop), while treating it as unbounded merely costs the
    socket-level cap — the slice still applies."""
    import inspect

    try:
        return "max_bytes" in inspect.signature(opener).parameters
    except (TypeError, ValueError):
        return False
