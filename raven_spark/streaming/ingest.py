"""Structured-Streaming surface over the crawl's page store.

A long-running crawl is naturally a stream: the fetch engine appends
page files to the catalog continuously, and downstream consumers —
frontier builders, politeness monitors, corpus curators — want to react
per micro-batch instead of rescanning the table. The reference is a
strictly batch/round binary (runner.rs drives rounds to completion);
this module is the Spark-first extension of the same semantics:

- ``read_pages_stream``: file-source stream over the pages table
  (input_hint schema: url, warc_ts, html, text, lang). File sources
  scale to catalog-backed tables by swapping in the Iceberg streaming
  source behind the same schema; the sandbox has no Iceberg runtime, so
  the file source is the tested path (same quarantine as
  sources/catalog.py).
- ``streaming_link_frontier``: the incremental version of
  plans/round.discovered_frontier — outlink extraction + RFC-3986
  canonicalization + xxhash64 identity per micro-batch, with
  within-watermark streaming dedup. State stays bounded: the watermark
  bounds the dedup store to the late-data horizon; cross-horizon
  dedup authority remains the Bloom URL-seen set (operators/seen.py),
  exactly like the batch engine where round-local dedup is a
  min-aggregate and history lives in the Bloom.
- ``host_rate_metrics``: watermarked tumbling-window fetch counts/bytes
  per host — the live politeness dashboard (is any host exceeding its
  budget?). Append-mode capable, so windows finalize exactly once.

All transformations are the SAME column expressions the batch plans
use (functions/urls.with_url_identity, functions/text.extract_links),
so batch/streaming parity is structural, not re-implemented — the
parity test asserts the streaming output row-set equals the batch
operator on identical input.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from raven_spark.functions.text import extract_links
from raven_spark.functions.urls import with_url_identity
# input_hint five columns only — the streaming source reads the strict
# page schema, not the generator's convenience extras
PAGE_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


@pandas_udf(T.ArrayType(T.StringType()))
def _links_from_html_bytes(html: pd.Series) -> pd.Series:
    """Outlinks straight from raw page bytes: decode with errors=replace
    (href values are URL syntax — ASCII-safe across the corpus charsets;
    full charset resolution is the batch fetch stage's job,
    operators/fetch.py) then reuse the pinned extractor."""
    return html.map(
        lambda b: extract_links(b.decode("utf-8", errors="replace")),
        na_action="ignore",
    )


def read_pages_stream(
    spark: SparkSession, root: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a directory of pages parquet files
    (input_hint schema). ``max_files_per_trigger`` bounds micro-batch
    size for backpressure."""
    reader = spark.readStream.schema(PAGE_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(root)


def streaming_link_frontier(
    pages: DataFrame,
    watermark: str = "30 minutes",
    salt_buckets: int = 256,
) -> DataFrame:
    """Incremental frontier delta: per micro-batch, explode outlinks,
    canonicalize, attach identity/salt columns, and drop duplicate
    url_hash within the watermark horizon.

    Output: (url, url_canon, url_hash, host, host_hash, salt_bucket,
    discovered_ts). Downstream the engine subtracts the Bloom seen-set
    as usual; the streaming dedup only collapses the (high-multiplicity)
    within-horizon re-discoveries so the state store holds
    O(new URLs per horizon), not O(all URLs ever).
    """
    links = (
        pages.withWatermark("warc_ts", watermark)
        .select(
            F.col("warc_ts").alias("discovered_ts"),
            F.explode(_links_from_html_bytes(F.col("html"))).alias("url"),
        )
    )
    out = with_url_identity(links, salt_buckets=salt_buckets)
    return out.select(
        "url", "url_canon", "url_hash", "host", "host_hash", "salt_bucket",
        "discovered_ts",
    ).dropDuplicatesWithinWatermark(["url_hash"])


def host_rate_metrics(
    pages: DataFrame,
    window: str = "1 minute",
    watermark: str = "5 minutes",
    salt_buckets: int = 256,
) -> DataFrame:
    """Tumbling-window per-host page counts and byte volume — the
    politeness/budget monitor. Watermarked so append-mode sinks emit
    each (window, host) row exactly once when the window closes."""
    with_host = with_url_identity(
        pages.withWatermark("warc_ts", watermark), salt_buckets=salt_buckets
    )
    return (
        with_host.groupBy(F.window("warc_ts", window).alias("w"), F.col("host"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length("html")).alias("bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_pages",
            "bytes",
        )
    )


def read_warc_stream(
    spark: SparkSession,
    root: str,
    warc_types: tuple[str, ...] = ("response",),
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming WARC ingest: new .warc(.gz) files landing under
    ``root`` become record rows per micro-batch — the archive-ingest
    counterpart of ``read_pages_stream`` (a live crawl DELIVERS WARC
    files continuously; CC publishes a crawl as ~10^5 of them, and
    ingesting as-they-land beats re-listing a growing directory).

    Same kernel as the batch reader (``sources/warc._record_scan`` —
    one framing implementation, two sources), same one-file-per-task
    granularity: the binaryFile stream source lists whole files per
    trigger, so a micro-batch is N files == N tasks and
    ``max_files_per_trigger`` IS the backpressure knob. Downstream the
    result chains into ``warc_pages_stream`` / the frontier exactly
    like the batch table."""
    from raven_spark.sources.warc import READ_SCHEMA, _record_scan

    files = _binary_file_stream(spark, root, max_files_per_trigger)
    wanted = tuple(w.lower() for w in warc_types)
    tz = spark.conf.get("spark.sql.session.timeZone")
    return files.select("path", "content").mapInPandas(
        _record_scan(wanted, tz), READ_SCHEMA
    )


def _binary_file_stream(
    spark: SparkSession, root: str, max_files_per_trigger: int | None
) -> DataFrame:
    """binaryFile stream source shared by the WARC/CDX ingest readers.
    Streaming sources require an explicit schema; binaryFile's is fixed
    by the format (path, modificationTime, length, content)."""
    binary_file_schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    reader = spark.readStream.format("binaryFile").schema(binary_file_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(root)


def cdx_index_stream(
    spark: SparkSession,
    root: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming CDX build: index new WARC files as they land — the
    archive's random-access layer kept current with the crawl instead
    of rebuilt by a batch sweep (CC's own pipeline appends cdxj
    per-file as WARCs close). The index transformation IS the batch
    ``cdx_index`` applied to a stream source — one kernel, so stream/
    batch row-identity holds by construction (and is parity-tested);
    this function only owns the reader setup. Sink the result into the
    ``write_cdx`` layout per micro-batch (foreachBatch) for the
    pruning reads."""
    from raven_spark.sources.cdx import cdx_index

    files = _binary_file_stream(spark, root, max_files_per_trigger)
    return cdx_index(files)


def warc_pages_stream(
    spark: SparkSession,
    root: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming WARC ingest decoded to the input_hint page shape
    (url, warc_ts, html, text, lang) — the same two Arrow stages as
    the batch ``warc_pages_table`` (shared ``_decode_pages_scan``), so
    a corpus ingested live is byte-identical to one imported after the
    fact (tested). Feed this straight into ``streaming_link_frontier``
    or ``host_rate_metrics`` for a WARC-driven live pipeline."""
    from raven_spark.functions.text import lang_id_col
    from raven_spark.sources.warc import _PAGES_SCHEMA, _decode_pages_scan

    records = read_warc_stream(
        spark, root, max_files_per_trigger=max_files_per_trigger
    )
    pages = records.mapInPandas(_decode_pages_scan(), _PAGES_SCHEMA)
    return pages.withColumn("lang", lang_id_col(F.col("text")))


def streaming_exact_dedup(
    pages: DataFrame,
    watermark_delay: str = "10 minutes",
    text_col: str = "text",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Streaming exact content dedup — the incremental twin of
    operators/dedup.exact_dedup (q09), for corpora that arrive as a
    stream of page files instead of a finished table: drop every page
    whose dedup-normalized text hash was already seen within the
    watermark horizon.

    Identity is the SAME 8-byte key the batch operator and clean_corpus
    use (xxhash64 over dedup.norm_text_col), so a doc the stream keeps
    is exactly the doc the batch pass would elect canonical when both
    see the same horizon. State stays bounded the ingest-module way:
    ``dropDuplicatesWithinWatermark`` keyed on the content hash evicts
    keys once the watermark passes their horizon (plain dropDuplicates
    would keep hash state forever unless the event-time column joined
    the key — the 3.5+ within-watermark variant is the bounded form);
    CROSS-horizon dedup authority remains the Bloom/cuckoo URL-seen
    family (operators/seen.py) exactly as in the batch engine — the
    stream handles the hot window, the filter handles history.

    Pages with NULL text pass through unconditionally (they carry no
    content identity; the fetch taxonomy, not the dedup pass, owns
    them).

    Output schema: the input plus ``content_hash`` (bigint).
    """
    from raven_spark.operators.dedup import norm_text_col

    hashed = pages.withColumn(
        "content_hash", F.xxhash64(norm_text_col(F.col(text_col)))
    ).withWatermark(ts_col, watermark_delay)
    with_text = hashed.filter(
        F.col(text_col).isNotNull()
    ).dropDuplicatesWithinWatermark(["content_hash"])
    passthrough = hashed.filter(F.col(text_col).isNull())
    return with_text.unionByName(passthrough)
