"""Structured-Streaming surface (streaming/ingest.py): incremental link
frontier and windowed host-rate metrics over the pages table, checked
for batch/streaming parity on identical input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raven_spark.functions.urls import with_url_identity
from raven_spark.streaming.ingest import (
    _links_from_html_bytes,
    host_rate_metrics,
    read_pages_stream,
    streaming_link_frontier,
)

N_PAGES = 300


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    """Two parquet file-drops (micro-batches) of the synthetic corpus,
    strict input_hint schema."""
    from raven_spark.sources.corpus import generate_pages

    root = str(tmp_path_factory.mktemp("pages_stream"))
    pages = generate_pages(spark, N_PAGES, n_hosts=12, seed=7).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    pages.filter(F.xxhash64("url") % 2 == 0).coalesce(1).write.parquet(root, mode="append")
    pages.filter(F.xxhash64("url") % 2 != 0).coalesce(1).write.parquet(root, mode="append")
    return root


def _run_to_memory(df, name, output_mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_frontier_matches_batch_identity(spark, pages_dir):
    stream = read_pages_stream(spark, pages_dir, max_files_per_trigger=1)
    _run_to_memory(
        streaming_link_frontier(stream, watermark="10 minutes"),
        "frontier_sink", "append",
    )
    got = spark.table("frontier_sink")
    # batch replay of the same semantics: explode links -> identity ->
    # one row per url_hash
    batch = (
        with_url_identity(
            spark.read.parquet(pages_dir)
            .select(F.explode(_links_from_html_bytes(F.col("html"))).alias("url"))
        )
        .select("url_canon", "url_hash", "host", "salt_bucket")
        .distinct()
    )
    got_set = {
        (r["url_canon"], r["url_hash"], r["host"], r["salt_bucket"])
        for r in got.select("url_canon", "url_hash", "host", "salt_bucket").collect()
    }
    want_set = {tuple(r) for r in batch.collect()}
    # streaming dedup is within-watermark: every batch-distinct identity
    # must appear, and no identity outside the batch set may appear
    assert set(t[1] for t in got_set) == set(t[1] for t in want_set)
    assert got_set == want_set
    # within-watermark dedup actually collapsed re-discoveries
    assert got.count() < spark.read.parquet(pages_dir).select(
        F.explode(_links_from_html_bytes(F.col("html")))
    ).count()


def test_host_rate_metrics_window_counts(spark, pages_dir):
    stream = read_pages_stream(spark, pages_dir)
    _run_to_memory(
        host_rate_metrics(stream, window="10 minutes", watermark="5 minutes"),
        "rates_sink", "append",
    )
    got = spark.table("rates_sink")
    batch = (
        with_url_identity(spark.read.parquet(pages_dir))
        .groupBy(F.window("warc_ts", "10 minutes").alias("w"), "host")
        .agg(F.count(F.lit(1)).alias("n_pages"), F.sum(F.length("html")).alias("bytes"))
        .select(F.col("w.start").alias("window_start"), "host", "n_pages", "bytes")
    )
    want = {(r["window_start"], r["host"]): (r["n_pages"], r["bytes"]) for r in batch.collect()}
    got_d = {(r["window_start"], r["host"]): (r["n_pages"], r["bytes"]) for r in got.collect()}
    # append mode only emits windows the watermark closed; availableNow
    # over a finite directory closes all but the trailing window(s), so
    # every EMITTED row must match the batch aggregate exactly, and most
    # windows must have been emitted
    assert got_d, "no windows emitted"
    for k, v in got_d.items():
        assert want[k] == v
    assert len(got_d) >= len(want) - len({h for (_, h) in want})
