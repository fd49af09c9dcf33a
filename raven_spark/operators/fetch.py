"""The fetch stage: Arrow-batched mapInPandas with the reference's retry
matrix, charset pipeline, and error-as-data taxonomy.

Reference semantics carried over exactly (crawler.rs:25-148):
- attempts = max_retry + 1
- 5xx -> retry while retry_count < max_retry, then ServerError (code 500)
  (crawler.rs:113-119)
- timeout -> retry, then TimeoutError (code 600) (crawler.rs:121-138)
- 4xx -> fail IMMEDIATELY, no retry (code 400) (crawler.rs:110-112)
- other I/O errors -> fail immediately (code 800) (crawler.rs:140-144)
- charset conflict after conversion -> code 700 (crawler.rs:91-108)
- 4xx/5xx error bodies force-converted to UTF-8 (crawler.rs:111,114)
- codes 400/500/600/700/800 from result.rs:32-40; labels result.rs:42-50;
  PersistFailed 1000 from task_error.rs:27-39

The retry loop lives INSIDE the batch (a per-row attempt counter applied
vectorized), never as Spark task retry — Spark retries whole partitions,
which would re-fetch politeness-budgeted hosts (§4.1).

``Fetcher`` is the injection seam (trait Crawler, crawler.rs:16-20 — the
reference swaps it in tests the same way, crawler.rs:228-230):
- ``SyntheticFetcher`` resolves URLs against the synthetic pages corpus by
  a distributed JOIN on url_canon (the Spark-first in-sandbox "network"),
  then applies a seeded failure model keyed on url_hash — deterministic
  across runs AND rounds.
- ``HttpFetcher`` (prod) would perform real I/O inside the same batch
  loop; it shares every line of the retry/charset/error code path.
"""

from __future__ import annotations

from typing import Iterator, Protocol

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from raven_spark.functions.charset import (
    CharsetConversionError,
    convert_and_decode,
    normalize_charset,
)
from raven_spark.functions.mime import is_text_mime, parse_content_type
from raven_spark.functions.text import extract_links, extract_text

# result_code domain (result.rs:32-40 + task_error.rs:27-32)
CODE_SUCCESS = 200
# 304 is an engine ADDITION beyond the reference taxonomy (result.rs:42-50
# has no conditional requests): a not-modified revalidation is success-
# class (the capture is still valid) but must not overwrite text/html.
CODE_NOT_MODIFIED = 304
CODE_CLIENT_ERROR = 400
CODE_SERVER_ERROR = 500
CODE_TIMEOUT = 600
CODE_CHARSET = 700
CODE_OTHER = 800
CODE_PERSIST_FAILED = 1000

RESULT_LABELS = {  # result.rs:42-50, task_error labels (+304 addition)
    CODE_SUCCESS: "success",
    CODE_NOT_MODIFIED: "not_modified",
    CODE_CLIENT_ERROR: "client_error",
    CODE_SERVER_ERROR: "server_error",
    CODE_TIMEOUT: "timeout_error",
    CODE_CHARSET: "charset_conversion_error",
    CODE_OTHER: "other_error",
    CODE_PERSIST_FAILED: "persist_failed",
}

# Unified fetch-output columns (both the synthetic and HTTP stages).
# `html` is the RAW fetched bytes (input_hint schema: html:binary), `text`
# the utf-8 extraction. The reference persists the charset-CONVERTED body
# (result.rs:120-131); we run the identical conversion/validation in the
# kernel (codes 700 on failure, C1-C4) but persist WARC-style raw bytes +
# converted text — at 10^10 pages, echoing a converted body through Arrow
# and storing it doubles the largest byte stream in the whole engine for
# information that is a deterministic function of (html, charset).
FETCH_OUTPUT_COLUMNS = (
    "status int, result_code int, result_label string, error_detail string, "
    "fetch_ms bigint, attempts int, content_type string, charset string, "
    "response_headers map<string,string>, "
    "html binary, text string, links array<string>"
)


class Fetcher(Protocol):
    """The injection seam (≡ trait Crawler, crawler.rs:16-20)."""

    def resolve(self, scheduled: DataFrame) -> DataFrame:
        """Attach resolution columns ``_body binary, _content_type string``
        (nulls = host unreachable / 404). For HTTP this is identity."""
        ...

    def make_behavior(self):
        """Return a PICKLABLE closure (no DataFrame/SparkContext refs —
        it ships to executors) mapping url_hash -> behavior codes:
        0=ok 1=500-then-ok 2=timeout-then-ok 3=404 4=500-always
        5=other-error"""
        ...


_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix(x: np.ndarray, seed: int) -> np.ndarray:
    x = (x.view(np.uint64) ^ np.uint64(seed * 0x9E3779B1)) & _M64
    x = ((x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)) & _M64
    return x ^ (x >> np.uint64(33))


class SyntheticFetcher:
    """Deterministic in-sandbox fetcher.

    resolve(): distributed left join scheduled -> corpus on url_canon.
    The corpus side is big (the whole synthetic web) so this is a real
    shuffle join on purpose — it IS the sandbox's network. AQE handles
    the skewed hot hosts.

    Failure model (FIXTURES.md §6): behavior = f(url_hash, seed), with
    rates: 2% 500-then-ok, 1% timeout-then-ok, 2% 404, 1% 500-always,
    0.5% other-error; 'then-ok' behaviors succeed on attempt 2.
    """

    def __init__(
        self,
        corpus: DataFrame,
        seed: int = 42,
        failure_pct: tuple[float, ...] = (2, 1, 2, 1, 0.5),
        prefer_broadcast: bool | None = None,
    ):
        self.seed = seed
        self.failure_pct = failure_pct
        self.prefer_broadcast = prefer_broadcast
        self._corpus = corpus.select(
            F.col("url").alias("url_canon"),
            F.col("html").alias("_body"),
            F.concat(
                F.lit("text/html; charset="), F.coalesce(F.col("charset"), F.lit("utf-8"))
            ).alias("_content_type"),
        )
        self._prepared = False

    def prepare(self, num_partitions: int) -> "SyntheticFetcher":
        """Hash-partition + sort + cache the corpus ON THE JOIN KEY once,
        so every round's sort-merge join exchanges/sorts only the small
        scheduled side — the Spark analogue of a page store bucketed by
        url (an Iceberg table bucket-partitioned on url_canon), where the
        bucketing cost is paid at ingest, not per crawl round."""
        self._corpus = (
            self._corpus.repartition(num_partitions, "url_canon")
            .sortWithinPartitions("url_canon")
            .persist()
        )
        self._corpus.count()  # materialize the bucketed store
        self._prepared = True
        return self

    def resolve(self, scheduled: DataFrame) -> DataFrame:
        """Left-join semantics with ZERO shuffle of the page store, with a
        per-round join-strategy chooser:

        - **bucketed path** (after ``prepare()``): the corpus is already
          hash-partitioned + sorted + cached on url_canon, so a plain
          ``scheduled LEFT JOIN corpus`` plans as a sort-merge join that
          exchanges/sorts ONLY the scheduled side — bodies never shuffle,
          and no broadcast of the scheduled set ever happens. This is the
          scale-safe default: at 10^10 URLs a round's scheduled set
          (millions of rows × frontier columns) would blow a broadcast and
          the driver.
        - **broadcast path** (un-prepared corpus): broadcast the scheduled
          side and STREAM the corpus scan through a BroadcastHashJoin
          (inner part), plus a broadcast anti-join on the column-pruned
          url_canon scan for the unmatched 404 rows. Correct only while
          the scheduled side is broadcast-small; used for one-shot runs
          where paying the prepare() materialization isn't worth it.

        ``prefer_broadcast`` at construction forces one path for tests.
        """
        use_broadcast = (
            self.prefer_broadcast
            if self.prefer_broadcast is not None
            else not self._prepared
        )
        if not use_broadcast:
            return scheduled.join(self._corpus, on="url_canon", how="left")
        inner = self._corpus.join(F.broadcast(scheduled), on="url_canon", how="inner")
        missing = (
            scheduled.join(self._corpus.select("url_canon"), on="url_canon", how="left_anti")
            .withColumn("_body", F.lit(None).cast("binary"))
            .withColumn("_content_type", F.lit(None).cast("string"))
        )
        return inner.unionByName(missing.select(inner.columns))

    def make_behavior(self):
        seed, pct = self.seed, self.failure_pct

        def behavior(url_hash: np.ndarray) -> np.ndarray:
            u = (_mix(url_hash.astype(np.int64), seed) % np.uint64(10000)).astype(np.float64) / 100.0
            out = np.zeros(len(u), dtype=np.int64)
            edges = np.cumsum(pct)
            out[u < edges[4]] = 5
            out[u < edges[3]] = 4
            out[u < edges[2]] = 3
            out[u < edges[1]] = 2
            out[u < edges[0]] = 1
            return out

        return behavior


class PassthroughFetcher:
    """All-success resolver over a corpus — failure model disabled."""

    def __init__(self, corpus: DataFrame):
        self._inner = SyntheticFetcher(corpus, failure_pct=(0, 0, 0, 0, 0))

    def prepare(self, num_partitions: int) -> "PassthroughFetcher":
        self._inner.prepare(num_partitions)
        return self

    def resolve(self, scheduled: DataFrame) -> DataFrame:
        return self._inner.resolve(scheduled)

    def make_behavior(self):
        def behavior(url_hash: np.ndarray) -> np.ndarray:
            return np.zeros(len(url_hash), dtype=np.int64)

        return behavior


def _simulated_ms(url_hash: np.ndarray, attempts: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic fetch timing: 10-210ms per attempt (timing capture F6;
    wall clock would break reproducibility, so synthetic time is hashed)."""
    base = (_mix(url_hash.astype(np.int64), seed + 7) % np.uint64(200) + np.uint64(10)).astype(np.int64)
    return base * attempts


FETCH_STRUCT = T.StructType([
    T.StructField("status", T.IntegerType()),
    T.StructField("result_code", T.IntegerType()),
    T.StructField("result_label", T.StringType()),
    T.StructField("error_detail", T.StringType()),
    T.StructField("fetch_ms", T.LongType()),
    T.StructField("attempts", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("charset", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("links", T.ArrayType(T.StringType())),
])


def fetch_stage(
    scheduled: DataFrame,
    fetcher: Fetcher,
    output_charset: str = "utf-8",
    seed: int = 42,
    default_max_retry: int = 0,
    input_charset: str | None = None,
) -> DataFrame:
    """scheduled frontier rows -> fetch results (errors as data).

    Plan: fetcher.resolve (join) -> STRUCT-RETURNING pandas UDF. The body
    bytes cross Arrow exactly ONCE (JVM -> Python as UDF input); the
    output struct carries only the small result columns + text + links,
    and the raw body is re-attached JVM-side as `html` by a plain
    projection — at 18 KB/page this halves the engine's Arrow traffic
    versus echoing bodies back through the Python worker.
    """
    resolved = fetcher.resolve(scheduled)
    keep_cols = [c for c in resolved.columns if not c.startswith("_")]
    behavior_fn = fetcher.make_behavior()
    out_label = normalize_charset(output_charset) or "utf-8"
    # configured input charset (Encoding{input}, encoding.rs:5-8): overrides
    # the header charset AND supplies the text/plain fallback when the
    # Content-Type header is missing/unparseable (crawler.rs:150-176)
    in_label = normalize_charset(input_charset) if input_charset else None

    def kernel(bodies_s: pd.Series, ctypes_s: pd.Series, url_hash_s: pd.Series,
               max_retry_s: pd.Series) -> pd.DataFrame:
        n = len(bodies_s)
        url_hash = url_hash_s.to_numpy(dtype=np.int64)
        max_retry = max_retry_s.to_numpy(dtype=np.int64)
        beh = behavior_fn(url_hash)
        missing = bodies_s.isna().to_numpy()

        # --- vectorized retry matrix (crawler.rs:110-146) -------------
        status = np.full(n, 200, dtype=np.int64)
        code = np.full(n, CODE_SUCCESS, dtype=np.int64)
        attempts = np.ones(n, dtype=np.int64)
        detail = np.full(n, "", dtype=object)

        # 404 for corpus-missing urls and behavior-3 rows: fail fast
        is_404 = missing | (beh == 3)
        status[is_404] = 404
        code[is_404] = CODE_CLIENT_ERROR
        detail[is_404] = "client error: 404"

        # 500-then-ok@1: succeeds iff a retry budget exists
        then_ok = (beh == 1) & ~is_404
        recovered = then_ok & (max_retry >= 1)
        attempts[recovered] = 2
        exhausted = then_ok & (max_retry < 1)
        status[exhausted] = 500
        code[exhausted] = CODE_SERVER_ERROR
        attempts[exhausted] = max_retry[exhausted] + 1
        detail[exhausted] = "server error: 500 after retries"

        # timeout-then-ok@1
        t_ok = (beh == 2) & ~is_404
        t_rec = t_ok & (max_retry >= 1)
        attempts[t_rec] = 2
        t_exh = t_ok & (max_retry < 1)
        status[t_exh] = 0
        code[t_exh] = CODE_TIMEOUT
        attempts[t_exh] = max_retry[t_exh] + 1
        detail[t_exh] = "timeout after retries"

        # 500-always: exhaust the whole budget
        s_always = (beh == 4) & ~is_404
        status[s_always] = 500
        code[s_always] = CODE_SERVER_ERROR
        attempts[s_always] = max_retry[s_always] + 1
        detail[s_always] = "server error: 500 after retries"

        # other I/O error: immediate (crawler.rs:140-144)
        other = (beh == 5) & ~is_404
        status[other] = 0
        code[other] = CODE_OTHER
        detail[other] = "connection error"

        ok = code == CODE_SUCCESS

        # --- charset + extraction pipeline (C1-C4) --------------------
        text_out: list = [None] * n
        links_out: list = [None] * n
        ctype_out: list = [None] * n
        charset_out: list = [None] * n
        bodies = bodies_s.to_numpy(dtype=object)
        ctypes = ctypes_s.to_numpy(dtype=object)
        for i in np.flatnonzero(ok):
            mime, cs = parse_content_type(ctypes[i], fallback_charset=in_label)
            ctype_out[i] = mime
            if is_text_mime(mime):
                try:
                    # one decode: conversion VALIDATION (C2/C3) + the utf-8
                    # text product. C3's code-700 path IS convert_and_decode
                    # raising — it returns the requested out_label or raises
                    # (no separate post-check needed; a conversion that can't
                    # produce the configured output charset is the conflict,
                    # crawler.rs:91-108)
                    html_str, _converted, _actual = convert_and_decode(
                        bytes(bodies[i]), cs, out_label
                    )
                except CharsetConversionError as e:
                    code[i] = CODE_CHARSET
                    detail[i] = str(e)[:200]
                    continue
                charset_out[i] = out_label
                text_out[i] = extract_text(html_str)
                links_out[i] = extract_links(html_str)

        return pd.DataFrame({
            "status": status,
            "result_code": code,
            "result_label": [RESULT_LABELS[int(c)] for c in code],
            "error_detail": detail,
            "fetch_ms": _simulated_ms(url_hash, attempts, seed),
            "attempts": attempts,
            "content_type": ctype_out,
            "charset": charset_out,
            "text": text_out,
            "links": links_out,
        })

    from pyspark.sql.functions import pandas_udf

    fetch_udf = pandas_udf(kernel, FETCH_STRUCT)
    retry_col = (
        F.coalesce(F.col("max_retry"), F.lit(default_max_retry))
        if "max_retry" in resolved.columns
        else F.lit(default_max_retry)
    )
    return resolved.withColumn(
        "__f", fetch_udf(F.col("_body"), F.col("_content_type"), F.col("url_hash"), retry_col)
    ).select(
        *keep_cols,
        F.col("__f.status").alias("status"),
        F.col("__f.result_code").alias("result_code"),
        F.col("__f.result_label").alias("result_label"),
        F.col("__f.error_detail").alias("error_detail"),
        F.col("__f.fetch_ms").alias("fetch_ms"),
        F.col("__f.attempts").alias("attempts"),
        F.col("__f.content_type").alias("content_type"),
        F.col("__f.charset").alias("charset"),
        # response headers (CrawlerResult.response_header, result.rs:96):
        # the synthetic "network" serves exactly one header, Content-Type —
        # built JVM-side from the resolved column, no Arrow round-trip.
        # status 0 = no HTTP response happened -> NULL map.
        F.when(
            F.col("__f.status") != 0,
            F.map_filter(
                F.create_map(F.lit("content-type"), F.col("_content_type")),
                lambda _, v: v.isNotNull(),
            ),
        ).alias("response_headers"),
        # raw bytes re-attached JVM-side: never crossed back through Arrow.
        # status 0 = no HTTP response happened (timeout / transport error)
        F.when(F.col("__f.status") != 0, F.col("_body")).alias("html"),
        F.col("__f.text").alias("text"),
        F.col("__f.links").alias("links"),
    )
