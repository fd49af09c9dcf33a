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

from raven_spark.functions.charset import (
    CharsetConversionError,
    convert_and_decode,
    normalize_charset,
)
from raven_spark.functions.mime import is_text_mime, parse_content_type
from raven_spark.functions.text import extract_links, extract_text

# result_code domain (result.rs:32-40 + task_error.rs:27-32)
CODE_SUCCESS = 200
CODE_CLIENT_ERROR = 400
CODE_SERVER_ERROR = 500
CODE_TIMEOUT = 600
CODE_CHARSET = 700
CODE_OTHER = 800
CODE_PERSIST_FAILED = 1000

RESULT_LABELS = {  # result.rs:42-50, task_error labels
    CODE_SUCCESS: "success",
    CODE_CLIENT_ERROR: "client_error",
    CODE_SERVER_ERROR: "server_error",
    CODE_TIMEOUT: "timeout_error",
    CODE_CHARSET: "charset_conversion_error",
    CODE_OTHER: "other_error",
    CODE_PERSIST_FAILED: "persist_failed",
}

FETCH_OUTPUT_COLUMNS = (
    "status int, result_code int, result_label string, error_detail string, "
    "fetch_ms bigint, attempts int, content_type string, charset string, "
    "body binary, text string, links array<string>"
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

    def __init__(self, corpus: DataFrame, seed: int = 42, failure_pct: tuple[float, ...] = (2, 1, 2, 1, 0.5)):
        self.seed = seed
        self.failure_pct = failure_pct
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
        """Left-join semantics with ZERO shuffle of the page store.

        A plain ``scheduled LEFT JOIN corpus`` plans as a sort-merge join
        that shuffles the multi-GB body column every round. Instead:

        - inner part: broadcast the (small) scheduled side and STREAM the
          corpus scan through a BroadcastHashJoin — bodies flow straight
          from the parquet scan into the fetch UDF, never through a
          shuffle;
        - unmatched part: broadcast anti-join on the column-pruned
          url_canon scan (no bodies read at all) -> null body rows (404s).

        At 10^10-URL scale where one round's scheduled set outgrows a
        broadcast, the fallback is the bucketed-store join (``prepare``);
        the engine picks per round by size.
        """
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


def fetch_stage(
    scheduled: DataFrame,
    fetcher: Fetcher,
    output_charset: str = "utf-8",
    seed: int = 42,
) -> DataFrame:
    """scheduled frontier rows -> fetch results (errors as data).

    Plan: fetcher.resolve (join) -> mapInPandas batch loop. Everything
    after the join crosses Python exactly once, Arrow-batched.
    """
    resolved = fetcher.resolve(scheduled)
    in_fields = [f for f in resolved.schema.fields if not f.name.startswith("_")]
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in in_fields)
    out_schema += ", " + FETCH_OUTPUT_COLUMNS
    keep_cols = [f.name for f in in_fields]
    behavior_fn = fetcher.make_behavior()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            url_hash = pdf["url_hash"].to_numpy(dtype=np.int64)
            max_retry = pdf["max_retry"].to_numpy(dtype=np.int64) if "max_retry" in pdf else np.zeros(n, dtype=np.int64)
            beh = behavior_fn(url_hash)
            missing = pdf["_body"].isna().to_numpy()

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
            body_out: list = [None] * n
            text_out: list = [None] * n
            links_out: list = [None] * n
            ctype_out: list = [None] * n
            charset_out: list = [None] * n
            bodies = pdf["_body"].to_numpy(dtype=object)
            ctypes = pdf["_content_type"].to_numpy(dtype=object)
            out_label = normalize_charset(output_charset) or "utf-8"
            for i in np.flatnonzero(ok):
                mime, cs = parse_content_type(ctypes[i])
                ctype_out[i] = mime
                raw = bytes(bodies[i])
                if is_text_mime(mime):
                    try:
                        # one decode serves both the re-encoded body (C2)
                        # and the extraction pipeline
                        html_str, converted, actual = convert_and_decode(raw, cs, out_label)
                        if actual != out_label:  # C3 conflict check
                            raise CharsetConversionError(f"{actual} != {out_label}")
                    except CharsetConversionError as e:
                        code[i] = CODE_CHARSET
                        detail[i] = str(e)[:200]
                        continue
                    body_out[i] = converted
                    charset_out[i] = out_label
                    text_out[i] = extract_text(html_str)
                    links_out[i] = extract_links(html_str)
                else:
                    body_out[i] = raw
            ok = code == CODE_SUCCESS  # charset failures just dropped out

            out = pdf[keep_cols].copy()
            out["status"] = status
            out["result_code"] = code
            out["result_label"] = [RESULT_LABELS[int(c)] for c in code]
            out["error_detail"] = detail
            out["fetch_ms"] = _simulated_ms(url_hash, attempts, seed)
            out["attempts"] = attempts
            out["content_type"] = ctype_out
            out["charset"] = charset_out
            out["body"] = body_out
            out["text"] = text_out
            out["links"] = links_out
            yield out

    return resolved.mapInPandas(run, out_schema)
