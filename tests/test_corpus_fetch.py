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


def test_resolve_chooser_prepared_no_broadcast_of_scheduled(spark, corpus):
    """VERDICT r1 #5: once prepare() has run, resolve() must use the
    bucketed sort-merge path (no broadcast of the scheduled side) and
    produce results identical to the broadcast path."""
    frontier = _frontier_for(spark, corpus, 150)

    bc = SyntheticFetcher(corpus, seed=42, prefer_broadcast=True)
    expected = sorted(
        (r["url_canon"], r["result_code"], r["status"], r["text"])
        for r in fetch_stage(frontier, bc).collect()
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        smj = SyntheticFetcher(corpus, seed=42).prepare(num_partitions=8)
        resolved = smj.resolve(frontier)
        plan = resolved._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan, plan
        got = sorted(
            (r["url_canon"], r["result_code"], r["status"], r["text"])
            for r in fetch_stage(frontier, smj).collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == expected


def test_fetch_output_charset_directive(spark, corpus):
    """Encoding{output} on the synthetic path (crawler.rs:86-108): ja pages
    (kana/kanji) cannot ENCODE to windows-1252 -> code 700 (C3 conflict);
    shift_jis pages round-trip shift_jis -> euc-jp fine (both cover JIS
    X 0208). Decode never errors (WHATWG replacement semantics); only the
    encode-to-output can conflict."""
    langs = {r["url"]: r["lang"] for r in corpus.select("url", "lang").collect()}
    urls = [u for u, l in langs.items() if l in ("ja", "en")][:120]
    frontier = frontier_from_urls(spark, urls)
    res = fetch_stage(frontier, PassthroughFetcher(corpus), output_charset="windows-1252").collect()
    ja = [r for r in res if langs[r["url_canon"]] == "ja"]
    en = [r for r in res if langs[r["url_canon"]] == "en"]
    assert ja and en
    from raven_spark.operators.fetch import CODE_CHARSET

    assert all(r["result_code"] == CODE_CHARSET for r in ja)
    assert all(r["result_code"] == CODE_SUCCESS and r["charset"] == "windows-1252" for r in en)

    # euc-jp target: ja pages convert cleanly, charset column records it
    ja_urls = [u for u, l in langs.items() if l == "ja"][:40]
    res2 = fetch_stage(
        frontier_from_urls(spark, ja_urls), PassthroughFetcher(corpus), output_charset="euc-jp"
    ).collect()
    assert res2 and all(
        r["result_code"] == CODE_SUCCESS and r["charset"] == "euc-jp" for r in res2
    )


def test_fetch_input_charset_override(spark, corpus):
    """Encoding{input} (crawler.rs:150-161): the configured input charset
    OVERRIDES the response header's. Forcing utf-8 on shift_jis bodies
    decodes with WHATWG replacement chars — the extracted text diverges
    from the golden corpus text, proving the override fired."""
    sjis = corpus.filter(F.col("charset") == "shift_jis").select("url", "text").limit(40).collect()
    assert sjis
    golden = {r["url"]: r["text"] for r in sjis}
    frontier = frontier_from_urls(spark, list(golden))
    res = fetch_stage(
        frontier, PassthroughFetcher(corpus), input_charset="utf-8"
    ).collect()
    assert res
    for r in res:
        assert r["result_code"] == CODE_SUCCESS
        assert r["text"] != golden[r["url_canon"]]
        assert "�" in r["text"]  # replacement chars: mojibake happened
    # control: without the override the header charset decodes cleanly
    res2 = fetch_stage(frontier, PassthroughFetcher(corpus)).collect()
    assert all(r["text"] == golden[r["url_canon"]] for r in res2)


def test_fetch_response_headers_column(spark, corpus):
    """response_headers (result.rs:96) present on the synthetic path:
    content-type round-trips; no-response rows (timeouts) carry NULL."""
    fetcher = SyntheticFetcher(corpus, seed=42, failure_pct=(0, 30, 0, 0, 0))
    frontier = _frontier_for(spark, corpus, 150, max_retry=0)
    res = fetch_stage(frontier, fetcher).collect()
    ok = [r for r in res if r["result_code"] == CODE_SUCCESS]
    t_out = [r for r in res if r["result_code"] == CODE_TIMEOUT]
    assert ok and t_out
    assert all(
        r["response_headers"]["content-type"].startswith("text/html")
        for r in ok
    )
    assert all(r["response_headers"] is None for r in t_out)
