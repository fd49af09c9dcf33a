"""Synthetic corpus determinism + fetch-stage retry matrix + charset
pipeline + byte-identical text invariant."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from raven_spark.functions.text import extract_text
from raven_spark.operators.fetch import (
    CODE_CLIENT_ERROR,
    CODE_SERVER_ERROR,
    CODE_SUCCESS,
    CODE_TIMEOUT,
    PassthroughFetcher,
    SyntheticFetcher,
    fetch_stage,
)
from raven_spark.plans.round import frontier_from_urls
from raven_spark.sources.corpus import generate_pages, seed_urls

N_PAGES = 400


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_pages(spark, N_PAGES, seed=42).persist()


def test_corpus_deterministic_across_parallelism(spark):
    a = generate_pages(spark, 100, seed=42).orderBy("url").collect()
    b = (
        generate_pages(spark, 100, seed=42)
        .repartition(7)
        .orderBy("url")
        .collect()
    )
    assert [r["url"] for r in a] == [r["url"] for r in b]
    assert [bytes(r["html"]) for r in a] == [bytes(r["html"]) for r in b]
    assert [r["text"] for r in a] == [r["text"] for r in b]


def test_corpus_schema_and_charsets(corpus):
    rows = corpus.collect()
    assert len(rows) == N_PAGES
    langs = {r["lang"] for r in rows}
    assert langs == {"en", "ja", "ru", "de"}
    charsets = {r["charset"] for r in rows}
    assert {"shift_jis", "euc-jp", "windows-1251", "utf-8"} <= charsets
    # golden text is the pinned extraction of the decoded html
    import codecs

    py_codec = {"shift_jis": "shift_jis", "euc-jp": "euc-jp", "windows-1251": "cp1251", "utf-8": "utf-8"}
    for r in rows[:50]:
        html_str = bytes(r["html"]).decode(py_codec[r["charset"]], errors="replace")
        assert extract_text(html_str) == r["text"]


def test_corpus_host_skew(corpus):
    counts = sorted(
        (r["cnt"] for r in corpus.groupBy("host").agg(F.count("*").alias("cnt")).collect()),
        reverse=True,
    )
    assert counts[0] > 3 * counts[len(counts) // 2]  # Zipf head is heavy


def _frontier_for(spark, corpus_df, n, max_retry=0):
    urls = [r["url"] for r in corpus_df.select("url").limit(n).collect()]
    f = frontier_from_urls(spark, urls)
    return f.withColumn("max_retry", F.lit(max_retry))


def test_fetch_all_success_with_passthrough(spark, corpus):
    frontier = _frontier_for(spark, corpus, 60)
    res = fetch_stage(frontier, PassthroughFetcher(corpus)).collect()
    assert len(res) == 60
    assert all(r["result_code"] == CODE_SUCCESS for r in res)
    assert all(r["charset"] == "utf-8" for r in res)


def test_fetch_byte_identical_text(spark, corpus):
    """input_hint invariant: extracted text == golden corpus text, byte for
    byte, through the whole Spark pipeline (incl. shift_jis/euc-jp pages)."""
    frontier = _frontier_for(spark, corpus, 120)
    res = fetch_stage(frontier, PassthroughFetcher(corpus))
    joined = res.alias("r").join(corpus.alias("c"), F.col("r.url_canon") == F.col("c.url"))
    bad = joined.filter(
        (F.col("r.text") != F.col("c.text"))
        | F.col("r.text").isNull()
    ).count()
    assert bad == 0
    # byte-level: encode both sides and compare binary
    cmp = joined.select(
        (F.encode(F.col("r.text"), "UTF-8") == F.encode(F.col("c.text"), "UTF-8")).alias("eq")
    )
    assert cmp.filter(~F.col("eq")).count() == 0


def test_fetch_retry_matrix(spark, corpus):
    """Reference retry semantics (crawler.rs:110-146): with max_retry=0 the
    then-ok behaviors fail (codes 500/600); with max_retry=1 they recover
    with attempts=2; 404s never retry in either case."""
    fetcher = SyntheticFetcher(corpus, seed=42, failure_pct=(20, 10, 10, 5, 5))
    f0 = _frontier_for(spark, corpus, 200, max_retry=0)
    r0 = {r["url_canon"]: r for r in fetch_stage(f0, fetcher).collect()}
    f1 = _frontier_for(spark, corpus, 200, max_retry=1)
    r1 = {r["url_canon"]: r for r in fetch_stage(f1, fetcher).collect()}

    codes0 = {c: sum(1 for r in r0.values() if r["result_code"] == c) for c in (200, 400, 500, 600)}
    assert codes0[CODE_CLIENT_ERROR] > 0 and codes0[CODE_SERVER_ERROR] > 0 and codes0[CODE_TIMEOUT] > 0

    recovered = 0
    for url, a in r0.items():
        b = r1[url]
        if a["result_code"] == CODE_SERVER_ERROR and b["result_code"] == CODE_SUCCESS:
            assert b["attempts"] == 2  # succeeded on the retry
            recovered += 1
        if a["result_code"] == CODE_CLIENT_ERROR:
            # 4xx fails immediately, no retry, in both runs (crawler.rs:110-112)
            assert b["result_code"] == CODE_CLIENT_ERROR
            assert b["attempts"] == 1
    assert recovered > 0


def test_fetch_deterministic(spark, corpus):
    fetcher = SyntheticFetcher(corpus, seed=42)
    f = _frontier_for(spark, corpus, 100)
    a = sorted((r["url_canon"], r["result_code"], r["fetch_ms"]) for r in fetch_stage(f, fetcher).collect())
    b = sorted((r["url_canon"], r["result_code"], r["fetch_ms"]) for r in fetch_stage(f, fetcher).collect())
    assert a == b


def test_seed_urls_canonicalize_to_corpus(spark, corpus):
    """Seeds are messy spellings; after canonicalization they must resolve
    to real corpus pages."""
    from raven_spark.functions.urls import canonicalize_url

    seeds = seed_urls(20, N_PAGES, seed=42)
    canon = {canonicalize_url(u) for u in seeds}
    present = {r["url"] for r in corpus.select("url").collect()}
    assert canon <= present
