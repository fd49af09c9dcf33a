"""One crawl round as a pure dataflow (SURVEY.md §3.3 Spark shape):

    frontier Δ(k)
      -> dedup within round (first discovery wins, canonical order)
      -> Bloom membership prune -> exact anti-join url_seen      [seen.py]
      -> robots gate (broadcast)                                 [politeness.py]
      -> per-host token-bucket window cap -> (scheduled, deferred)
      -> salt-bucket repartition (skew kill) -> fetch stage      [fetch.py]
      -> extracted text + outlink discovery -> frontier Δ(k+1)

Everything returns DataFrames; nothing here writes. Crawl order is
DEFINED, not materialized: the total order is the lexicographic tuple
(round, priority, host_hash, host_rank) carried on every scheduled row —
tests sort by it at small scale; at 10^10 rows no global sort ever runs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from raven_spark.functions.urls import with_url_identity
from raven_spark.operators.fetch import Fetcher, fetch_stage
from raven_spark.operators.politeness import robots_flag
from raven_spark.operators.seen import BloomFilter, ShardedBloom, subtract_seen

FRONTIER_COLUMNS = [
    "url", "url_canon", "url_hash", "host", "host_hash", "salt_bucket",
    "priority", "depth", "round_added", "deferred_count",
]

# Optional per-row request fields (CrawlerRequest, request.rs:6-16) carried
# through the round when present — config-driven runs seed the frontier
# from the expanded task list (tasks_df) and each row keeps its own
# method/params/timeouts all the way into the fetch stage, which reads
# them per row. Discovery rows lack them (-> nulls -> stage defaults).
REQUEST_COLUMNS = ["method", "query_params", "body_params", "timeout_s", "max_retry", "sleep_s",
                   # conditional-revalidation validators (recrawl TTL pairing;
                   # attached by http.with_conditional_headers, read per-row
                   # by http_fetch_stage; nulls -> plain GET)
                   "if_none_match", "if_modified_since"]


def _carried_columns(df: DataFrame) -> list[str]:
    return FRONTIER_COLUMNS + [c for c in REQUEST_COLUMNS if c in df.columns]


def frontier_from_urls(
    spark, urls, round_no: int = 0, depth: int = 0, priority: int = 100,
    salt_buckets: int = 256,
) -> DataFrame:
    """Seed list (or any url iterable) -> frontier-shaped DataFrame.

    Seeds ship to the JVM as ONE Arrow batch (pandas), not a py4j list —
    a 100k-seed bootstrap is ~0.2s instead of seconds."""
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"url": list(urls)}))
    # Arrow-created frames land in few partitions; spread before the
    # canonicalize UDF so bootstrap parallelizes
    df = df.repartition(spark.sparkContext.defaultParallelism)
    return (
        with_url_identity(df, salt_buckets=salt_buckets)
        .withColumn("priority", F.lit(priority))
        .withColumn("depth", F.lit(depth))
        .withColumn("round_added", F.lit(round_no))
        .withColumn("deferred_count", F.lit(0))
        .select(*FRONTIER_COLUMNS)
    )


def frontier_identity(
    df: DataFrame, round_no: int = 0, depth: int = 0, priority: int = 100,
    salt_buckets: int = 256,
) -> DataFrame:
    """Any URL-bearing DataFrame -> frontier-shaped rows, fully
    distributed (the DataFrame sibling of frontier_from_urls: sitemap
    discoveries, imported seed tables — anything too big to pass as a
    driver list). Rows already carrying the identity columns
    (with_url_identity output, e.g. discover_sitemap_pages) are used
    as-is; otherwise identity is derived from ``url``."""
    if "url_hash" not in df.columns:
        df = with_url_identity(df, salt_buckets=salt_buckets)
    return (
        df.withColumn("priority", F.lit(priority))
        .withColumn("depth", F.lit(depth))
        .withColumn("round_added", F.lit(round_no))
        .withColumn("deferred_count", F.lit(0))
        .select(*FRONTIER_COLUMNS)
    )


def frontier_from_tasks(
    tasks: DataFrame, round_no: int = 0, priority: int = 100, salt_buckets: int = 256,
) -> DataFrame:
    """Expanded task list (expansion.tasks_df output: url already carries
    the canonical query string) -> frontier Δ(0) that KEEPS each task's
    request fields (method/body_params/timeouts) as per-row columns — the
    Spark shape of Vec<RavenCrawlTask> (config.rs:46-100): one row per
    fully-bound fetch unit."""
    out = (
        with_url_identity(tasks, salt_buckets=salt_buckets)
        .withColumn("priority", F.lit(priority))
        .withColumn("depth", F.lit(0))
        .withColumn("round_added", F.lit(round_no))
        .withColumn("deferred_count", F.lit(0))
    )
    if "body_params" in out.columns:
        # task identity includes the POST body: the reference treats two
        # tasks with the same URL but different form params as distinct
        # work units (config.rs:91-96); folding the canonical body string
        # into url_hash keeps dedup/url_seen from collapsing them, while
        # body-less rows keep the plain xxhash64(url_canon) identity that
        # discovery rows share.
        body_qs = F.array_join(
            F.transform(
                F.array_sort(F.map_entries(F.col("body_params"))),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            ),
            "&",
        )
        out = out.withColumn(
            "url_hash",
            F.when(
                F.size(F.map_entries(F.col("body_params"))) > 0,
                F.xxhash64(F.col("url_canon"), body_qs),
            ).otherwise(F.col("url_hash")),
        )
    return out.select(*_carried_columns(out))


def discovered_frontier(
    results: DataFrame, round_no: int, salt_buckets: int = 256,
    max_depth: int | None = None,
) -> DataFrame:
    """Outlinks of successful fetches -> frontier Δ(k+1). Children inherit
    priority+1 (BFS drift: deeper pages are less urgent) and depth+1."""
    links = (
        results.filter(F.col("result_code") == 200)
        .select(
            F.explode("links").alias("url"),
            (F.col("priority") + 1).alias("priority"),
            (F.col("depth") + 1).alias("depth"),
        )
    )
    if max_depth is not None:
        links = links.filter(F.col("depth") <= max_depth)
    out = (
        with_url_identity(links, salt_buckets=salt_buckets)
        .withColumn("round_added", F.lit(round_no + 1))
        .withColumn("deferred_count", F.lit(0))
        .select(*FRONTIER_COLUMNS)
    )
    # same url discovered from many parents in one round: keep the most
    # urgent (canonical order) — a map-side-combinable min-aggregate, NOT
    # a window over the full delta
    return out.groupBy("url_hash").agg(
        F.min(F.struct("priority", "depth", "round_added", "deferred_count",
                       "url", "url_canon", "host", "host_hash", "salt_bucket")).alias("s")
    ).select("url_hash", "s.*").select(*FRONTIER_COLUMNS)


@dataclass
class RoundPlan:
    scheduled: DataFrame      # rows fetched this round (with host_rank lineage)
    deferred: DataFrame       # politeness overflow -> frontier Δ(k+1)
    denied: DataFrame         # robots-denied rows (recorded, never refetched)
    results: DataFrame        # fetch output (errors as data)
    seen_delta: DataFrame     # url_hash/url_canon scheduled or denied this round
    cached: list = None       # DataFrames persisted by plan_round; caller unpersists


def plan_round(
    frontier_delta: DataFrame,
    url_seen: DataFrame | None,
    fetcher: Fetcher,
    round_no: int,
    host_budget: int,
    bloom: BloomFilter | ShardedBloom | None = None,
    robots: DataFrame | None = None,
    shuffle_partitions: int | None = None,
    host_budgets: DataFrame | None = None,
    max_retry: int = 0,
    input_charset: str | None = None,
    output_charset: str = "utf-8",
) -> RoundPlan:
    """The round dataflow, materialization-aware: every branch the engine
    consumes (scheduled/deferred/denied/seen_delta) derives from TWO
    persisted DataFrames — `staged` (the flagged candidate pool, PRE-
    window, so the expensive upstream delta dedup -> Bloom prune ->
    anti-join -> robots join executes once) and `sched_cache` (the
    budget-capped scheduled set, so the politeness window executes once).
    Persisting BEFORE the window (r3 persisted after) is what lets the
    WindowGroupLimit prune reach the exchange: a filter on a cached plan
    can't push into the cache.

    ``host_budget`` is the global per-host maximum; per-host overrides in
    ``host_budgets`` may only LOWER it (larger values are capped — the
    literal maximum is what bounds the window's skew).
    """
    # 1. within-delta dedup: one candidate per url_hash, canonical order.
    #    Fast path: groupBy-min over a struct (map-side combinable). When
    #    the delta carries per-row request fields, the map-typed param
    #    columns cannot live in an orderable struct, so those (small,
    #    config-expanded) deltas dedup via a window that keeps whole rows.
    extra_cols = [c for c in REQUEST_COLUMNS if c in frontier_delta.columns]
    if extra_cols:
        wd = Window.partitionBy("url_hash").orderBy(
            F.col("priority").asc(), F.col("depth").asc(),
            F.col("round_added").asc(), F.col("deferred_count").asc(),
            F.col("url_canon").asc(), F.col("url").asc(),
        )
        cand = (
            frontier_delta.withColumn("__rn", F.row_number().over(wd))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .select(*FRONTIER_COLUMNS, *extra_cols)
        )
    else:
        cand = frontier_delta.groupBy("url_hash").agg(
            F.min(F.struct("priority", "depth", "round_added", "deferred_count",
                           "url", "url_canon", "host", "host_hash", "salt_bucket")).alias("s")
        ).select("url_hash", "s.*").select(*FRONTIER_COLUMNS)

    # 2. subtract seen (Bloom prune then exact anti-join)
    cand = subtract_seen(cand, url_seen, bloom)

    # 3. robots verdict as a column (broadcast join), not a split
    flagged = robots_flag(cand, robots)

    # 3b. per-host budget override (robots crawl-delay -> smaller budget);
    #     broadcast join, O(hosts) side
    if host_budgets is not None:
        flagged = flagged.join(F.broadcast(host_budgets), on="host", how="left")
    else:
        flagged = flagged.withColumn("host_budget", F.lit(None).cast("int"))

    # 4. politeness budget, skew-bounded. Ranking only ALLOWED rows (denied
    #    rows never enter the pool, so they consume no budget slots and
    #    ranks match the old robots_ok-DESC-ordered window exactly) and
    #    capping with a LITERAL bound first is what lets Catalyst infer a
    #    WindowGroupLimit: every map task pre-prunes to its own
    #    top-`host_budget` rows per host BEFORE the exchange, so a
    #    10^7-row Zipf host shuffles <= budget x map-partitions rows and
    #    never full-sorts in one task. `host_budget` is the global
    #    per-host MAXIMUM — per-host overrides (robots crawl-delay,
    #    effective_budget_col) may only lower it, which the exact filter
    #    applies on the pruned survivors; a surviving row's rank equals
    #    its true rank because every row ordered before it also survives
    #    the literal prune.
    ok = F.col("robots_ok")
    staged = flagged.persist()  # pre-window: all branches filter this ONE materialization
    pool = staged.filter(ok)
    w = Window.partitionBy("host").orderBy(
        F.col("priority").asc(), F.col("depth").asc(), F.col("url_hash").asc()
    )
    in_budget_exact = F.col("host_rank") <= F.least(
        F.coalesce(F.col("host_budget"), F.lit(host_budget)), F.lit(host_budget)
    )
    sched_cache = (
        pool.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= F.lit(int(host_budget)))  # literal -> WindowGroupLimit
        .filter(in_budget_exact)
        .drop("robots_ok", "host_budget")
        .persist()
    )
    scheduled = sched_cache
    denied = staged.filter(~ok).drop("robots_ok", "host_budget")
    # deferral needs the overflow ROWS, not their ranks: the complement of
    # the scheduled set within the allowed pool (url_hash is unique per
    # delta after step 1, so the anti-join is exact). At scale this is one
    # hash-partitioned anti-join on an 8-byte key — parallel — where the
    # old single full-rank window serialized the hot host into one task.
    deferred = (
        pool.join(sched_cache.select("url_hash"), on="url_hash", how="left_anti")
        .drop("robots_ok", "host_budget")
        .withColumn("priority", F.greatest(F.col("priority") - F.lit(1), F.lit(0)))
        .withColumn("deferred_count", F.col("deferred_count") + 1)
        .withColumn("round_added", F.lit(round_no + 1))
        .select(*FRONTIER_COLUMNS, *extra_cols)  # deferral keeps request fields
    )

    # 5. skew-kill repartition on salt_bucket, then fetch. A fetcher with
    #    its own `fetch` stage (HttpFetcher: per-row I/O, host-local
    #    partitions make in-stage sleeps safe) runs that; otherwise the
    #    synthetic resolve-join + vectorized stage.
    if shuffle_partitions:
        scheduled = scheduled.repartition(shuffle_partitions, "salt_bucket")
    # A fetcher with its own `fetch` stage (HttpFetcher) carries its
    # encoding settings in its stage kwargs (constructed by the engine);
    # the synthetic stage takes them here (Encoding directive end-to-end,
    # encoding.rs:5-8 -> crawler.rs:150-176).
    if hasattr(fetcher, "fetch"):
        results = fetcher.fetch(scheduled)
    else:
        results = fetch_stage(
            scheduled,
            fetcher,
            default_max_retry=max_retry,
            input_charset=input_charset,
            output_charset=output_charset,
        )

    seen_delta = (
        sched_cache.select("url_hash", "url_canon")
        .unionByName(denied.select("url_hash", "url_canon"))
        .withColumn("round_seen", F.lit(round_no))
    )
    return RoundPlan(scheduled=scheduled, deferred=deferred, denied=denied,
                     results=results, seen_delta=seen_delta,
                     cached=[staged, sched_cache])
