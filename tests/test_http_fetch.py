"""HTTP fetch stage with an injected fake opener (no network): the
reference's retry matrix (crawler.rs:25-148) replayed over real I/O
control flow, plus robots.txt parsing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raven_spark.operators.http import HttpFetcher, _fetch_one, http_fetch_stage
from raven_spark.operators.politeness import parse_robots_txt, robots_rules_df


class FakeOpener:
    """Scripted responses per url; records attempt counts."""

    def __init__(self, script):
        self.script = script  # url -> list of responses / exceptions
        self.calls: dict[str, int] = {}

    def __call__(self, url, method="GET", headers=None, body=None, timeout_s=1):
        i = self.calls.get(url, 0)
        self.calls[url] = i + 1
        seq = self.script[url]
        item = seq[min(i, len(seq) - 1)]
        if isinstance(item, Exception):
            raise item
        return item


OK_HTML = (200, {}, b"<html><body><p>hello <a href='https://x/next'>n</a></p></body></html>",
           "text/html; charset=utf-8")
SJIS_BODY = "<p>テスト</p>".encode("shift_jis")


def _sched(spark, urls):
    return spark.createDataFrame(
        [(u, u, i, f"h{i}", i, 0, 100, 0, 0, 0) for i, u in enumerate(urls)],
        "url string, url_canon string, url_hash long, host string, host_hash long, "
        "salt_bucket int, priority int, depth int, round_added int, deferred_count int",
    )


def test_fetch_one_retry_matrix():
    op = FakeOpener({
        "https://a/ok": [OK_HTML],
        "https://a/404": [(404, {}, b"nope", "text/plain")],
        "https://a/500then": [(500, {}, b"", None), OK_HTML],
        "https://a/500always": [(500, {}, b"boom", "text/plain")],
        "https://a/timeout": [TimeoutError("t"), TimeoutError("t")],
        "https://a/conn": [OSError("refused")],
    })
    # success, 1 attempt
    s, c, _, att, raw, hdrs, ct, _ = _fetch_one(op, "https://a/ok", "GET", {}, None, 1, 1, 0)
    assert (s, c, att) == (200, 200, 1)
    # 4xx: immediate failure, exactly ONE call even with retry budget
    s, c, d, att, *_ = _fetch_one(op, "https://a/404", "GET", {}, None, 1, 3, 0)
    assert (s, c, att) == (404, 400, 1) and op.calls["https://a/404"] == 1
    # 5xx then ok: recovered on attempt 2
    s, c, _, att, *_ = _fetch_one(op, "https://a/500then", "GET", {}, None, 1, 1, 0)
    assert (s, c, att) == (200, 200, 2)
    # 5xx always: attempts = max_retry + 1
    s, c, _, att, *_ = _fetch_one(op, "https://a/500always", "GET", {}, None, 1, 2, 0)
    assert (s, c, att) == (500, 500, 3) and op.calls["https://a/500always"] == 3
    # timeout exhausts budget -> code 600, status 0
    s, c, _, att, *_ = _fetch_one(op, "https://a/timeout", "GET", {}, None, 1, 1, 0)
    assert (s, c, att) == (0, 600, 2)
    # transport error: immediate -> 800
    s, c, _, att, *_ = _fetch_one(op, "https://a/conn", "GET", {}, None, 1, 3, 0)
    assert (s, c, att) == (0, 800, 1)


def _scripted_opener(script):
    """Closure-based opener (cloudpickle ships it by VALUE to executors —
    a test-module class would fail to unpickle there)."""

    def opener(url, method="GET", headers=None, body=None, timeout_s=1):
        item = script[url]
        if isinstance(item, Exception):
            raise item
        return item

    return opener


def test_http_stage_end_to_end(spark):
    op = _scripted_opener({
        "https://a/ok": OK_HTML,
        "https://a/sjis": (200, {}, SJIS_BODY, "text/html; charset=shift_jis"),
        "https://a/err": (503, {}, "érror".encode("latin-1"), "text/plain; charset=iso-8859-1"),
    })
    df = _sched(spark, ["https://a/ok", "https://a/sjis", "https://a/err"])
    out = {r["url_canon"]: r for r in http_fetch_stage(df, op, max_retry=0).collect()}

    ok = out["https://a/ok"]
    assert ok["result_code"] == 200 and ok["text"] == "hello n"
    assert ok["links"] == ["https://x/next"]

    sjis = out["https://a/sjis"]
    assert sjis["result_code"] == 200
    assert bytes(sjis["html"]) == SJIS_BODY  # raw bytes preserved (input_hint html)
    assert sjis["charset"] == "utf-8" and sjis["text"] == "テスト"  # converted product

    err = out["https://a/err"]
    assert err["result_code"] == 500 and err["status"] == 503
    # raw error body kept (detail carries the taxonomy; text stays null)
    assert bytes(err["html"]).decode("latin-1") == "érror" and err["text"] is None


def test_http_stage_response_headers(spark):
    """response_headers round-trip (CrawlerResult.response_header,
    result.rs:96): a known header survives into the pages schema with
    lowercased keys."""
    op = _scripted_opener({
        "https://a/ok": (200, {"Content-Type": "text/html; charset=utf-8",
                               "X-Cache": "HIT", "ETag": '"abc"'},
                         b"<p>hi</p>", "text/html; charset=utf-8"),
    })
    df = _sched(spark, ["https://a/ok"])
    row = http_fetch_stage(df, op).collect()[0]
    assert row["response_headers"]["x-cache"] == "HIT"
    assert row["response_headers"]["etag"] == '"abc"'


def test_form_body_exact_bytes():
    """form_body: url-encoded, SORTED keys (F1 canonical order)."""
    from raven_spark.operators.http import form_body

    assert form_body({"zkey": "z v", "akey": "a&b"}) == b"akey=a%26b&zkey=z+v"
    assert form_body({}) is None and form_body(None) is None


def test_http_stage_post_form_body(spark):
    """T8 end-to-end (crawler.rs:49): POST rows send url-encoded
    body_params (sorted keys) with the form Content-Type; GET rows send no
    body. The opener runs in a Python WORKER process, so the assertion is
    encoded in its response: it echoes what it received and 500s on any
    contract violation — the driver asserts on the collected rows."""
    expected = b"akey=a%26b&zkey=z+v"

    def opener(url, method="GET", headers=None, body=None, timeout_s=1):
        ok_html = b"<p>ok</p>"
        if url.endswith("/post"):
            good = (
                method == "POST"
                and body == expected
                and (headers or {}).get("Content-Type") == "application/x-www-form-urlencoded"
            )
        else:
            good = method == "GET" and body is None and "Content-Type" not in (headers or {})
        status = 200 if good else 500
        return status, {}, ok_html, "text/html; charset=utf-8"

    base = _sched(spark, ["https://a/post", "https://a/get"])
    df = base.withColumn(
        "method", F.when(F.col("url_canon").contains("post"), F.lit("POST")).otherwise(F.lit("GET"))
    ).withColumn(
        "body_params",
        F.when(
            F.col("url_canon").contains("post"),
            F.create_map(F.lit("zkey"), F.lit("z v"), F.lit("akey"), F.lit("a&b")),
        ),
    )
    out = {r["url_canon"]: r for r in http_fetch_stage(df, opener).collect()}
    assert out["https://a/post"]["result_code"] == 200, out["https://a/post"]["error_detail"]
    assert out["https://a/get"]["result_code"] == 200


def test_http_stage_encoding_directive(spark):
    """Encoding{input, output} wired end-to-end (crawler.rs:150-176):
    - input_charset overrides the header charset and supplies the
      text/plain fallback when Content-Type is missing;
    - output_charset is the conversion target."""
    body_sjis = "テスト one".encode("shift_jis")
    op = _scripted_opener({
        # no Content-Type at all -> text/plain + configured input charset
        "https://a/noct": (200, {}, body_sjis, None),
        # header lies (says utf-8) -> configured input charset wins
        "https://a/liar": (200, {}, body_sjis, "text/html; charset=utf-8"),
    })
    df = _sched(spark, ["https://a/noct", "https://a/liar"])
    out = {r["url_canon"]: r for r in http_fetch_stage(
        df, op, input_charset="shift_jis", output_charset="utf-8"
    ).collect()}
    assert out["https://a/noct"]["content_type"] == "text/plain"
    assert out["https://a/noct"]["result_code"] == 200
    assert "テスト" in (out["https://a/noct"]["text"] or "")
    assert "テスト" in (out["https://a/liar"]["text"] or "")
    # without the directive the lying header makes decoding fail or mangle
    out2 = {r["url_canon"]: r for r in http_fetch_stage(df, op).collect()}
    assert out2["https://a/liar"]["text"] != out["https://a/liar"]["text"]


def test_http_fetcher_protocol(spark):
    op = _scripted_opener({"https://a/ok": OK_HTML})
    f = HttpFetcher(opener=op)
    df = _sched(spark, ["https://a/ok"])
    assert f.resolve(df) is df
    rows = f.fetch(df).collect()
    assert rows[0]["result_code"] == 200


# --- robots.txt parsing ------------------------------------------------------

ROBOTS = """
# comments ignored
User-agent: *
Disallow: /private/
Allow: /private/pub/
Crawl-delay: 2

User-agent: raven
Disallow: /raven-only/
"""


def test_parse_robots_star():
    allow, deny, delay = parse_robots_txt(ROBOTS, agent="otherbot")
    assert allow == ["/private/pub/"] and deny == ["/private/"] and delay == 2


def test_parse_robots_specific_agent_wins():
    allow, deny, delay = parse_robots_txt(ROBOTS, agent="raven")
    assert deny == ["/raven-only/"] and allow == [] and delay is None


def test_parse_robots_empty_and_missing():
    assert parse_robots_txt(None) == ([], [], None)
    assert parse_robots_txt("") == ([], [], None)
    assert parse_robots_txt("User-agent: *\nDisallow:") == ([], [], None)


def test_robots_rules_df(spark):
    texts = spark.createDataFrame(
        [("h1.example", ROBOTS), ("h2.example", None)],
        "host string, robots_txt string",
    )
    rows = {r["host"]: r for r in robots_rules_df(texts).collect()}
    assert rows["h1.example"]["deny"] == ["/private/"]
    assert rows["h1.example"]["crawl_delay_s"] == 2
    assert rows["h2.example"]["deny"] == []


def test_conditional_get_304(spark):
    """Conditional revalidation: rows carrying if_none_match /
    if_modified_since send the validators; a 304 answer is success-class
    (result_code 304, label not_modified, empty body, NO text overwrite,
    no retry); rows without validators fetch normally."""
    from raven_spark.operators.http import HttpFetcher

    def opener(url, method="GET", headers=None, body=None, timeout_s=1):
        h = headers or {}
        if h.get("If-None-Match") == 'W/"v1"' or "If-Modified-Since" in h:
            return 304, {"ETag": 'W/"v1"'}, b"", None
        return 200, {"ETag": 'W/"v1"', "Content-Type": "text/html"}, b"<p>fresh body</p>", "text/html"

    rows = [
        ("https://h.example/a", 'W/"v1"', None),                      # etag hit
        ("https://h.example/b", None, "Mon, 01 Jan 2026 00:00:00 GMT"),  # date hit
        ("https://h.example/c", None, None),                          # plain GET
    ]
    scheduled = spark.createDataFrame(
        rows, "url_canon string, if_none_match string, if_modified_since string"
    )
    out = {r["url_canon"]: r for r in
           HttpFetcher(opener=opener).fetch(scheduled).collect()}
    a, b, c = (out[f"https://h.example/{k}"] for k in "abc")
    assert a["result_code"] == 304 and a["result_label"] == "not_modified"
    assert a["attempts"] == 1 and a["text"] is None and bytes(a["html"] or b"") == b""
    assert b["result_code"] == 304
    assert c["result_code"] == 200 and c["text"] == "fresh body"


def test_with_conditional_headers_join(spark):
    from raven_spark.operators.http import with_conditional_headers

    prior = spark.createDataFrame(
        [
            (1, 0, 5, {"etag": 'W/"old"', "last-modified": "Sun"}),
            (1, 1, 9, {"etag": 'W/"new"'}),          # later round wins
            (2, 0, 1, {"content-type": "text/html"}),  # no validators -> nulls
        ],
        "url_hash long, round int, fetch_ms int, response_headers map<string,string>",
    )
    frontier = spark.createDataFrame([(1,), (2,), (3,)], "url_hash long")
    got = {r["url_hash"]: (r["if_none_match"], r["if_modified_since"])
           for r in with_conditional_headers(frontier, prior).collect()}
    assert got[1] == ('W/"new"', None)
    assert got[2] == (None, None)
    assert got[3] == (None, None)  # never captured
