"""SparkSession factory tuned for the sandbox (local[N]) and for scale.

All knobs that matter at 100 TB are set here once so every entry point
(tests, bench, driver contract) builds the same session:

- AQE on (runtime re-plan: skew joins, partition coalescing)
- Arrow on (every Python crossing is a vectorized batch, never per-row)
- shuffle.partitions sized to the local core count; on a real cluster this
  is overridden to ~2-3x total cores (AQE coalesces the excess)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "raven_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` maps to ``local[N]``; on a real cluster the master URL comes
    from spark-submit and this argument is ignored by Spark.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 512 rows x ~18 KB bodies = ~9 MB Arrow batches: A/B'd 256/512/
        # 2048/8192 on the fetch stage — small batches pipeline the JVM
        # scan/write with the Python kernel and cap per-worker memory;
        # 8192 (150 MB batches) was 2.6x slower than 512
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # dictionary encoding is pure waste on ~20 KB unique binary bodies
        # (the dominant write volume); string dims lose a little, bodies
        # win a lot
        .config("spark.sql.parquet.enableDictionary", "false")
        # zstd(1) over snappy for parquet: measured 6x faster encode AND
        # 40% smaller files on the body-dominated pages table in this
        # environment — parquet's snappy path runs pure-Java (no native
        # hadoop lib here, ~50 MB/s/core) while zstd-jni is native. On a
        # cluster with native snappy the gap narrows but zstd still wins
        # bytes-on-disk, which at 100 TB is the scan AND storage bill.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.hadoop.parquet.compression.codec.zstd.level", "1")
        # 32 MB scan splits: enough input partitions that a python-kernel
        # stage over a multi-GB scan runs several task waves per core (wave
        # quantization at the default 128 MB starves half the cores on the
        # last wave at high parallelism)
        .config("spark.sql.files.maxPartitionBytes", os.environ.get("RAVEN_MAX_PART_BYTES", str(32 * 1024 * 1024)))
        # 16 MB parquet row groups (default 128 MB): with ~18 KB unique
        # bodies each writer task buffers a whole row group in heap before
        # flushing — at 16 concurrent writers that's ~2 GB of churn and the
        # flush serializes encode behind buffering. 16 MB groups flush 8x
        # more often, pipelining encode with I/O: pages_write dropped
        # 25-45% across 4 A/B runs with IDENTICAL bytes (+0.08% metadata);
        # 64 MB and maxRecordsPerFile were washes or losers (BASELINE.md
        # round-4 A/B). Scan side: derived reads are column-pruned (never
        # the body column), and 16 MB groups align 2-per-32 MB split.
        .config("spark.hadoop.parquet.block.size", str(16 * 1024 * 1024))
    )
    env_extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for pair in filter(None, env_extra.split(";")):
        k, _, v = pair.partition("=")
        builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
