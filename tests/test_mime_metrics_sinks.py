"""Coverage for the remaining SURVEY §2 operators:
C1 MIME resolution (mime.rs:135-212 + crawler.rs:62-73 fallbacks),
M3 task-metrics projection (raven_task_metrics.rs:39-123, units fixed),
P1 persist fan-out (raven_crawl_task.rs:44-84: every sink written, fail
only when ALL fail, partial failures recorded as data)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raven_spark.functions.mime import is_text_mime, parse_content_type
from raven_spark.config import RavenConfig, RavenRequest
from raven_spark.engine import CrawlEngine, EngineOptions
from raven_spark.operators.fetch import SyntheticFetcher
from raven_spark.sources.corpus import generate_pages, seed_urls


# --- C1: MIME resolution -----------------------------------------------------

def test_parse_content_type_matrix():
    # text/* with charset param
    assert parse_content_type("text/html; charset=Shift_JIS") == ("text/html", "shift_jis")
    # quoted charset, case folding
    assert parse_content_type('Text/HTML; charset="UTF-8"') == ("text/html", "utf-8")
    # application text-bodied types keep charset
    assert parse_content_type("application/json; charset=utf-8") == ("application/json", "utf-8")
    # known binary types carry no charset
    assert parse_content_type("image/jpeg") == ("image/jpeg", None)
    assert parse_content_type("application/pdf; charset=utf-8") == ("application/pdf", None)
    # missing header: octet-stream (crawler.rs:73) unless input charset
    # configured -> text/plain fallback (crawler.rs:163-176)
    assert parse_content_type(None) == ("application/octet-stream", None)
    assert parse_content_type(None, "euc-jp") == ("text/plain", "euc-jp")
    # configured input charset BEATS the header's (crawler.rs:150-161)
    assert parse_content_type("text/html; charset=utf-8", "shift_jis") == ("text/html", "shift_jis")
    # garbage header
    assert parse_content_type("%%%") == ("application/octet-stream", None)


def test_is_text_mime_gates_charset_pipeline():
    assert is_text_mime("text/html") and is_text_mime("application/json")
    assert not is_text_mime("image/png") and not is_text_mime("application/pdf")


# --- M3: task metrics projection --------------------------------------------

def test_task_metrics_units_and_shape(spark):
    from raven_spark.operators.metrics import task_metrics

    results = spark.createDataFrame(
        [("https://a/x", 200, "success", "", 120),
         ("https://a/y", 600, "timeout_error", "timeout after retries", 2000)],
        "url_canon string, result_code int, result_label string, "
        "error_detail string, fetch_ms bigint",
    ).withColumn("persist_ms", F.lit(35))
    rows = {r["url"]: r for r in task_metrics(
        results, "runA", 3, "2026-08-17T00:00:00Z", persist_ms_col="persist_ms"
    ).collect()}
    ok = rows["https://a/x"]
    # units: everything ms (the reference's seconds-vs-ms bug fixed, and
    # persist duration is the PERSIST duration, not a copy of request ms —
    # raven_task_metrics.rs:85-91 bug not carried over)
    assert ok["crawler_duration_millis"] == 120
    assert ok["persist_duration_millis"] == 35
    assert ok["total_duration_millis"] == 155
    assert ok["result_label"] == "success" and ok["round"] == 3
    t = rows["https://a/y"]
    assert t["result_code"] == 600 and t["total_duration_millis"] == 2035


# --- P1: persist fan-out -----------------------------------------------------

class FailingSink:
    """Catalog-protocol sink that always raises."""

    def append(self, name, df, round_no):
        raise IOError("disk on fire")

    def read(self, name, upto_round=None):
        return None

    def exists(self, name):
        return False

    def last_round(self, name):
        return None


def test_persist_fanout_partial_failure_recorded(spark, tmp_path):
    corpus = generate_pages(spark, 100, seed=42).persist()
    cfg = RavenConfig(
        name="fanout",
        request=RavenRequest(url="https://x/", max_retry=1),
        host_budget_per_round=50,
        max_rounds=1,
    )
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "s"), SyntheticFetcher(corpus, seed=42),
        options=EngineOptions(expected_total_urls=1024, shuffle_partitions=4,
                              extra_sinks=[FailingSink()]),
    )
    stats = eng.run(seed_urls=seed_urls(10, 100), max_rounds=1)
    # run SUCCEEDS (>=1 sink ok) and the failure is recorded as data
    assert stats[0]["tasks"] == 10
    assert len(stats[0]["persist_errors"]) == 1
    assert "FailingSink" in stats[0]["persist_errors"][0]
    assert eng.table("pages").count() == 10  # primary sink intact
    corpus.unpersist()


def test_all_sinks_failed_raises_code_1000(spark, tmp_path, monkeypatch):
    corpus = generate_pages(spark, 60, seed=42).persist()
    cfg = RavenConfig(
        name="allfail",
        request=RavenRequest(url="https://x/"),
        host_budget_per_round=50,
        max_rounds=1,
    )
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "s2"), SyntheticFetcher(corpus, seed=42),
        options=EngineOptions(expected_total_urls=1024, shuffle_partitions=4),
    )
    eng.bootstrap(seed_urls(5, 60))
    # then make the PRIMARY (only) sink fail -> all sinks down -> code 1000
    monkeypatch.setattr(eng.catalog, "append", FailingSink().append)
    with pytest.raises(Exception, match="1000|all sinks"):
        eng.run_round(0)
    corpus.unpersist()


def test_sniff_mime_magic_bytes(spark):
    from pyspark.sql import functions as F

    from raven_spark.functions.mime import payload_mime_report

    cases = [
        (1, bytes.fromhex("89504E470D0A1A0A") + b"rest", "image/png", "image/png"),
        (2, bytes.fromhex("FFD8FFE000104A46") + b"x", "image/jpeg", "text/html"),
        (3, b"GIF89a;;;;", "image/gif", "image/gif"),
        (4, b"%PDF-1.7 blah", "application/pdf", None),
        (5, bytes.fromhex("1F8B08000000") + b"z", "application/gzip", "application/gzip"),
        (6, b"PK\x03\x04zipdata", "application/zip", "application/zip; charset=binary"),
        (7, b"RIFF\x00\x00\x00\x00WEBPVP8 ", "image/webp", "image/webp"),
        (8, b"RIFF\x00\x00\x00\x00WAVEfmt ", "audio/wav", "audio/wav"),
        (9, b"\x00\x00\x00\x18ftypmp42more", "video/mp4", "video/mp4"),
        (10, b"ID3\x04tag", "audio/mpeg", "audio/mpeg"),
        (11, b"<!DOCTYPE html><html>", "text/html", "text/html"),
        (12, b"<?xml version='1.0'?>", "text/html", "application/xml"),
        (13, b"random plain bytes", "application/octet-stream", "text/plain"),
        (14, b"RIFF\x00\x00\x00\x00AVI LIST", "application/octet-stream", "video/avi"),
    ]
    df = spark.createDataFrame(
        [(i, b, d) for i, b, _, d in cases],
        "doc_id long, payload binary, ct string",
    )
    out = {r["id"]: r for r in payload_mime_report(df, declared_col="ct").collect()}
    for i, _, want, declared in cases:
        assert out[i]["sniffed_mime"] == want, (i, out[i])
        if declared is None:
            assert out[i]["mismatch"] is None
    # mismatch flag: declared main type compared after ;-param strip
    assert out[6]["mismatch"] is False
    assert out[2]["mismatch"] is True
    # zero exchanges
    plan = payload_mime_report(df, declared_col="ct")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
