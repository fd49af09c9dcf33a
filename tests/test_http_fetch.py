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
    s, c, _, att, raw, ct, _ = _fetch_one(op, "https://a/ok", "GET", {}, None, 1, 1, 0)
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
