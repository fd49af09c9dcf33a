"""CDX index over WARC files — the random-access layer of a web archive
(the public Common-Crawl / OpenWayback "capture index": one row per
record with its byte range in the .warc.gz, keyed by SURT).

Why it exists at 100 TB: a WARC corpus is only scannable, not seekable —
"give me this URL's capture" without an index is a full scan. The CDX
row (surt, ts, file, offset, length, digest) turns that into (a) a range
predicate on the SURT-sorted index (everything under a registrable
domain is ONE contiguous key range — see functions/urls.surt_col) and
(b) one HTTP Range GET of [offset, offset+length) per record: gzip
members decompress standalone, which is precisely why CC writes one
record per member. The index is ~100 bytes/record vs ~50 KB/record of
WARC — 10^3 smaller, so it broadcast-joins or sorts cheaply where the
corpus itself never could.

Build (``cdx_index``): one pass over the files — binaryFile (file ==
task, the CC split convention) → per-member offset scan
(``iter_gzip_members_with_offsets``) → HTTP parse for status/mime →
SHA-1/Base32 payload digest (the CDX spec's digest form) — all inside
``mapInPandas``; SURT is added JVM-side afterwards so the key matches
``surt_col`` exactly (one shared definition, q45's oracle replays it).

Fetch (``random_access_fetch``): validates the index the way a reader
uses it — each record is re-read FROM ITS (offset, length) SLICE ALONE,
in a different task than the one that built the index (the ranges cross
a real shuffle). In-sandbox the "range GET" is a bytes slice of the blob
joined back by file name; on a real cluster the same (file, offset,
length) triples drive object-store Range requests — the arithmetic this
module tests is the part that must be right.

Reference note: the reference engine keeps fetched bodies only in its
sinks (s3.rs:12-43, local_file.rs) with no random-access index; CDX is
a Spark-side extension of the P-family for archive-scale reads.
"""

from __future__ import annotations

import gzip
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from raven_spark.sources.warc import (
    iter_gzip_members_with_offsets,
    iter_records_with_extents,
    parse_http_response,
    sha1_b32,
)

INDEX_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("digest", T.StringType()),
    T.StructField("offset", T.LongType()),
    T.StructField("length", T.LongType()),
    T.StructField("warc_file", T.StringType()),
])


# CDX digest form: SHA-1, RFC 4648 Base32 (what CC's cdxj carries as
# ``sha1:...``); one shared definition with the WARC writer's
# WARC-Payload-Digest stamping.
_sha1_b32 = sha1_b32


def cdx_records(file_name: str, data: bytes) -> list[tuple]:
    """One WARC file's bytes → CDX rows (pure Python, unit-testable).

    gzip-member files: one row per member (offset/length = the member's
    compressed extent — the Range a reader fetches; CC layout is one
    record per member, and a multi-record member indexes each record at
    the member's extent, which still fetches correctly). Plain files:
    one row per record at its literal byte extent. The digest is over
    the HTTP payload (decoded body) for responses, the raw block
    otherwise — the CDX convention."""
    rows: list[tuple] = []

    def emit(off: int, length: int, rec: dict) -> None:
        h = rec["headers"]
        wtype = h.get("warc-type", "").lower()
        if wtype == "response":
            status, hh, body = parse_http_response(rec["block"])
            mime = (hh.get("content-type") or "").split(";")[0].strip() or None
        else:
            status, body = 0, rec["block"]
            mime = (h.get("content-type") or "").split(";")[0].strip() or None
        rows.append((
            h.get("warc-target-uri"),
            h.get("warc-date"),
            wtype,
            mime,
            status,
            _sha1_b32(body),
            off,
            length,
            file_name,
        ))

    if data[:2] == b"\x1f\x8b":
        for off, length, member in iter_gzip_members_with_offsets(data):
            for _rs, _rl, rec in iter_records_with_extents(member):
                emit(off, length, rec)
    else:
        for rs, rl, rec in iter_records_with_extents(data):
            emit(rs, rl, rec)
    return rows


def cdx_index(
    files: DataFrame,
    file_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """(file, content) blobs → the CDX index DataFrame, SURT-keyed.

    One Arrow stage builds every row; ``surt`` is then pure JVM column
    algebra over the canonicalized URL (the SAME ``surt_col`` the rest
    of the engine sorts by, so index ranges and frontier keys agree).
    Sort/partition the result by ``surt`` at write time to get the
    contiguous per-domain ranges the module doc promises."""
    from raven_spark.functions.urls import canonicalize_udf, surt_col

    def scan(pdfs: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out: list[tuple] = []
            for name, content in zip(pdf[file_col], pdf[content_col]):
                out.extend(cdx_records(str(name), bytes(content)))
            yield pd.DataFrame(
                out, columns=[f.name for f in INDEX_SCHEMA.fields]
            )

    idx = files.select(file_col, content_col).mapInPandas(scan, INDEX_SCHEMA)
    return idx.withColumn(
        "surt",
        F.when(
            F.col("url").isNotNull(),
            surt_col(canonicalize_udf(F.col("url"))),
        ),
    )


def cdx_index_from_files(spark: SparkSession, path: str) -> DataFrame:
    """Convenience: glob of WARC files → CDX index (binaryFile source,
    file == task — the split convention read_warc uses and why)."""
    return cdx_index(spark.read.format("binaryFile").load(path))


def write_cdx(
    index: DataFrame,
    out_dir: str,
    prefix_len: int = 4,
) -> None:
    """Persist a CDX index as parquet PARTITIONED by SURT prefix and
    sorted by full SURT within files — the layout that turns "give me
    every capture under example.com" into a partition-pruned, row-group-
    skippable range read (the module-doc promise made concrete).

    Why partition by a PREFIX, not the registrable domain: partition
    values must be low-cardinality (10^7 domains would mean 10^7
    directories); a ``prefix_len``-char SURT prefix caps partitions at
    ~36^k while still clustering each domain into exactly one partition
    (SURT keys sort host-reversed, so one domain == one contiguous key
    range == one prefix bucket unless it straddles — the full sort
    within files gives parquet min/max stats for the residual pruning).
    Scale: the index is ~100 bytes/record, so even 10^11 captures sort
    ~10 TB — a routine exchange keyed by (prefix, surt).
    """
    out = index.withColumn(
        "surt_prefix", F.substring(F.col("surt"), 1, prefix_len)
    )
    (
        out.repartition(F.col("surt_prefix"))
        .sortWithinPartitions("surt_prefix", "surt", "warc_file", "offset")
        .write.mode("overwrite")
        .partitionBy("surt_prefix")
        .parquet(out_dir)
    )


def read_cdx(
    spark: SparkSession,
    path: str,
    surt_starts_with: str | None = None,
    prefix_len: int | None = None,
) -> DataFrame:
    """Read a ``write_cdx`` layout; ``surt_starts_with`` narrows to one
    domain/prefix range and reaches the scan as BOTH a partition filter
    (startswith on surt_prefix — prunes directories whether the query
    key is shorter or longer than the stored prefix) and a data filter
    (on the sorted surt column, skipping row groups via min/max stats)
    — plan-asserted in tests.

    ``prefix_len`` defaults to the layout's OWN stored length (probed
    from one partition value — a 1-row job against pruned metadata):
    a mismatched hardcoded length would silently prune every partition
    and read as "domain has no captures", which is the one failure mode
    an index must never have."""
    df = spark.read.parquet(path)
    if surt_starts_with is not None:
        if prefix_len is None:
            row = df.select(F.length("surt_prefix").alias("n")).first()
            prefix_len = int(row["n"]) if row else len(surt_starts_with)
        df = df.where(
            F.col("surt_prefix").startswith(surt_starts_with[:prefix_len])
        ).where(F.col("surt").startswith(surt_starts_with))
    return df


def revisit_resolve(index: DataFrame) -> DataFrame:
    """Payload-digest deduplication over a CDX index — the WARC
    "revisit" convention (ISO 28500 §6.7; what Common Crawl's dedup
    produces): within each digest group the EARLIEST capture is the
    canonical record, every later capture of the same payload is a
    revisit that references it, so an archive stores each distinct
    payload's bytes once no matter how many URLs × recrawls carried it.

    Input: ``cdx_index`` rows (response records are resolved; other
    record types pass through with ``is_revisit`` null — revisit
    semantics only apply to captures). Output: the input columns plus

    - ``is_revisit`` — false for the group's canonical capture
    - ``canon_url`` / ``canon_warc_date`` / ``canon_warc_file`` /
      ``canon_offset`` — the referenced original (WARC-Refers-To-*
      fields of a revisit record)
    - ``n_captures`` — group size (1 == unique payload)

    Canonical pick is a total order — row_number over (parsed
    WARC-Date, url, warc_file, offset): the date is PARSED to an
    instant, not compared as a raw string, because real crawls carry
    non-Z zone offsets ('+09:00' renders lexicographically after an
    earlier '...Z' instant) and malformed/missing dates — unparseable
    dates sort LAST (a dateless capture must never beat a dated one),
    and the remaining fields break exact-instant ties. row_number
    (not min-equality) guarantees EXACTLY one canonical per group even
    when two index rows are byte-identical (duplicate captures inside
    one multi-record gzip member share an extent), keeping the
    store-bytes-once accounting n_captures - revisits == 1 exact.
    Output is partitioning-independent, the engine-wide invariant.

    Scale shape: ONE exchange and ONE pass over the input subtree — an
    unordered aggregate window over ``(is_response, digest)`` (20-byte
    Base32 keys; the index is ~100 bytes/row, 10^3 smaller than the
    corpus, so even a 10^11-capture crawl's index shuffles in ~10 TB —
    this is exactly the job CC runs to emit its dedup'd crawls). No
    self-join, and deliberately NOT a filter-responses + union-the-rest
    shape: Spark plans a union of two filters over the same source as
    TWO executions of that source, which for a CDX built in-plan means
    scanning the WARC corpus twice. Folding the response predicate into
    the window partition key keeps one subtree; non-response rows ride
    the same shuffle (they are a ~0% fraction of a crawl's index) and
    get their revisit fields nulled afterwards. min(struct) + count
    share the one shuffle/sort. Payload bytes never move — only index
    rows do.
    """
    from pyspark.sql.window import Window

    is_resp = F.col("warc_type").eqNullSafe(F.lit("response"))
    parsed_ts = F.coalesce(
        F.try_to_timestamp(F.col("warc_date")),
        F.lit("9999-12-31 23:59:59").cast("timestamp"),
    )
    w = Window.partitionBy(is_resp, "digest")
    w_ord = w.orderBy(
        parsed_ts, F.col("url"), F.col("warc_file"), F.col("offset")
    )
    null_if_not_resp = lambda c: F.when(is_resp, c)  # noqa: E731
    # all window expressions in ONE projection: chained withColumns
    # re-derive the computed partition key per call, which Catalyst
    # cannot prove equal across Window nodes — it would plan one
    # exchange + sort PER column instead of one total (verified via
    # explain). first(col) over w_ord is the canonical row's value at
    # every row of the group.
    return index.select(
        "*",
        null_if_not_resp(F.row_number().over(w_ord) > 1).alias("is_revisit"),
        null_if_not_resp(F.count(F.lit(1)).over(w)).alias("n_captures"),
        null_if_not_resp(F.first("url").over(w_ord)).alias("canon_url"),
        null_if_not_resp(
            F.first("warc_date").over(w_ord)
        ).alias("canon_warc_date"),
        null_if_not_resp(
            F.first("warc_file").over(w_ord)
        ).alias("canon_warc_file"),
        null_if_not_resp(F.first("offset").over(w_ord)).alias("canon_offset"),
    )


FETCH_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("digest", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("warc_file", T.StringType()),
    T.StructField("offset", T.LongType()),
])


def random_access_fetch(
    files: DataFrame,
    index: DataFrame,
    file_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Fetch every indexed record via its (offset, length) range alone.

    The index side is reduced to (file, offset, length) triples grouped
    per file (~24 bytes/record — the collect_list is the per-file index
    slice, NOT the corpus), then joined to the file blobs so each task
    slices only its own file's ranges. Each slice must decompress and
    parse STANDALONE — exactly the contract a Range-GET reader relies
    on; any off-by-one in the index breaks this loudly. Emits the parsed
    payload + a recomputed digest so callers can assert digest equality
    against the index (the end-to-end "the index is honest" check)."""
    # distinct BEFORE grouping: a multi-record member (e.g. a whole-
    # file-gzip WARC — one member, k records) indexes every record at
    # the member's extent, and fetching that extent once already yields
    # all k records. Without the dedupe the fetch would decompress the
    # member k times and emit k^2 rows. (Callers joining fetch results
    # back to such an index need the digest in the key — (file, offset)
    # alone is only unique for one-record-per-member layouts like CC's
    # and this module's own writer.)
    ranges = (
        index.select("warc_file", "offset", "length").distinct()
        .groupBy("warc_file")
        .agg(F.collect_list(F.struct("offset", "length")).alias("ranges"))
    )
    joined = files.select(
        F.col(file_col).alias("warc_file"), F.col(content_col).alias("content")
    ).join(ranges, "warc_file")

    def fetch(pdfs: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out: list[tuple] = []
            for fname, content, ranges_ in zip(
                pdf["warc_file"], pdf["content"], pdf["ranges"]
            ):
                blob = bytes(content)
                for r in ranges_:
                    off, length = int(r["offset"]), int(r["length"])
                    piece = blob[off:off + length]
                    raw = (
                        gzip.decompress(piece)
                        if piece[:2] == b"\x1f\x8b" else piece
                    )
                    for _s, _l, rec in iter_records_with_extents(raw):
                        status, _hh, body = parse_http_response(rec["block"])
                        out.append((
                            rec["headers"].get("warc-target-uri"),
                            status,
                            _sha1_b32(body),
                            body,
                            fname,
                            off,
                        ))
            yield pd.DataFrame(
                out, columns=[f.name for f in FETCH_SCHEMA.fields]
            )

    return joined.mapInPandas(fetch, FETCH_SCHEMA)
