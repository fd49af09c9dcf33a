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
