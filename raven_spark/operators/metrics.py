"""Metrics projections (M2-M4): fetch results -> metrics rows -> run
summary. Pure select/when column algebra — zero Python.

Shapes mirror CrawlerMetrics (metrics.rs:16-30) and RavenCrawlTaskMetrics
(raven_task_metrics.rs:14-36), partitioned by date(crawl_ts) ≡ the daily
ES indexes (metrics.rs:75, raven_task_metrics.rs:121).

Reference bugs intentionally FIXED here (SURVEY.md §2 M3):
- success-path persist_duration_millis in the reference copies the
  *request* duration (raven_task_metrics.rs:85-91); we record the real
  persist timing column.
- the reference stores timeout durations in seconds in one table
  (metrics.rs:46) and milliseconds in the other (raven_task_metrics.rs:
  71-73); we use milliseconds everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crawler_metrics(results: DataFrame, run_name: str, round_no: int, crawl_ts) -> DataFrame:
    """CrawlerMetrics::new equivalent (metrics.rs:33-91)."""
    return results.select(
        F.lit(run_name).alias("run_name"),
        F.lit(round_no).alias("round"),
        F.spark_partition_id().alias("partition_id"),  # per-partition lineage
        F.col("url_canon").alias("url"),
        F.col("host"),
        F.col("result_code"),
        F.col("result_label"),
        F.col("error_detail"),
        F.col("fetch_ms").alias("request_duration_millis"),
        (F.col("attempts") - 1).alias("retry_count"),
        F.col("status"),
        F.lit(crawl_ts).cast("timestamp").alias("crawl_ts"),
        F.to_date(F.lit(crawl_ts)).alias("metric_date"),
    )


def task_metrics(
    results: DataFrame,
    run_name: str,
    round_no: int,
    crawl_ts,
    persist_ms_col: str | None = None,
) -> DataFrame:
    """RavenCrawlTaskMetrics::new equivalent (raven_task_metrics.rs:39-123),
    units fixed to ms everywhere."""
    persist_ms = F.col(persist_ms_col) if persist_ms_col else F.lit(0)
    return results.select(
        F.lit(run_name).alias("name"),
        F.lit(round_no).alias("round"),
        F.col("url_canon").alias("url"),
        F.col("result_code"),
        F.col("result_label"),
        F.col("error_detail").alias("result_detail"),
        F.col("fetch_ms").alias("crawler_duration_millis"),
        persist_ms.cast("bigint").alias("persist_duration_millis"),
        (F.col("fetch_ms") + persist_ms).cast("bigint").alias("total_duration_millis"),
        F.lit(crawl_ts).cast("timestamp").alias("date"),
        F.to_date(F.lit(crawl_ts)).alias("metric_date"),
    )


def run_summary(results: DataFrame) -> DataFrame:
    """Run-summary aggregation (runner.rs:113-152): tasks, failures,
    persist errors — a 3-measure grouped aggregate. Success class is
    {200, 304}: a conditional revalidation hit (fetch.py
    CODE_NOT_MODIFIED, an engine addition) confirms the capture is still
    valid — reporting it as failure would make a healthy revalidating
    crawl look broken."""
    ok = F.col("result_code").isin(200, 304)
    return results.agg(
        F.count(F.lit(1)).alias("tasks"),
        F.sum(F.when(~ok, 1).otherwise(0)).alias("failed"),
        F.sum(F.when(F.col("result_code") == 1000, 1).otherwise(0)).alias("persist_errors"),
        F.sum(F.when(ok, 1).otherwise(0)).alias("succeeded"),
        F.avg("fetch_ms").alias("avg_fetch_ms"),
    )
