"""Host reputation — the signal that closes the corpus -> crawl loop.

A web-scale pipeline doesn't just filter documents; it feeds what it
learned back into the frontier: hosts that keep yielding duplicate,
boilerplate, or off-language pages should get less of the politeness
budget, and high-yield hosts should be recrawled first. The reference
engine has no cross-round feedback (each round is independent,
runner.rs); this is task-brief pipeline tier, composing the existing
corpus signals (quality scores, dup hashing, language ID) into one
per-host table.

Scale shape: two hash aggregates over the corpus — one keyed on host
(count / distinct-content / mean quality; all map-side partial, and the
distinct rides an 8-byte xxhash64, never text) and one keyed on
(host, lang) rolled up with max_by for the dominant language — joined on
host. At 10^10 pages the output is O(hosts) (~10^7 rows), broadcastable
back onto any frontier.

The score is a transparent linear blend, not a learned model: callers
tune weights or replace the expression; the operator's value is the
deterministic, partition-invariant aggregation underneath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_reputation(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    lang_col: str = "lang",
    quality_col: str | None = None,
) -> DataFrame:
    """Per-host reputation profile.

    Output columns: host, n_docs, n_unique (distinct content hashes),
    dup_rate, dominant_lang (count tie -> lexicographically largest,
    deterministic in both engines), lang_consistency (dominant share),
    avg_quality (mean of ``quality_col``; n_chars-style proxies or
    functions.text.quality_score outputs both work), score in [0, 1].

    score = 0.5*(1 - dup_rate) + 0.3*lang_consistency
          + 0.2*least(avg_quality, 1.0)   (rounded to 6 dp)

    so ``quality_col`` is expected normalized to ~[0, 1]; pass e.g.
    ``least(n_chars/1000, 1)`` precomputed, or quality_score's [0,1]
    output.
    """
    q = F.col(quality_col) if quality_col else F.lit(0.0)
    base = df.select(
        F.col(host_col).alias("host"),
        F.xxhash64(F.col(text_col)).alias("__h"),
        F.col(lang_col).alias("lang"),
        q.cast("double").alias("__q"),
    )
    per_host = base.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("__h").alias("n_unique"),
        F.avg("__q").alias("avg_quality"),
    )
    dominant = (
        base.groupBy("host", "lang")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("host")
        .agg(
            F.max_by("lang", F.struct(F.col("__c"), F.col("lang"))).alias("dominant_lang"),
            F.max("__c").alias("__dom"),
        )
    )
    out = per_host.join(dominant, "host")
    dup_rate = 1.0 - F.col("n_unique") / F.col("n_docs")
    consistency = F.col("__dom") / F.col("n_docs")
    score = (
        F.lit(0.5) * (F.lit(1.0) - dup_rate)
        + F.lit(0.3) * consistency
        + F.lit(0.2) * F.least(F.col("avg_quality"), F.lit(1.0))
    )
    return out.select(
        "host",
        "n_docs",
        "n_unique",
        F.round(dup_rate, 6).alias("dup_rate"),
        "dominant_lang",
        F.round(consistency, 6).alias("lang_consistency"),
        F.round("avg_quality", 6).alias("avg_quality"),
        F.round(score, 6).alias("score"),
    )


def domain_rollup(
    df: DataFrame,
    domain_col: str = "domain_key",
    host_col: str = "host",
    text_col: str = "text",
    quality_col: str | None = None,
    token_col: str | None = None,
) -> DataFrame:
    """Per-registrable-domain corpus rollup (the FineWeb-style domain
    stats table: per-domain doc counts, host fan-out, dup rate, token
    mass and corpus share, mean quality).

    Host-level reputation (``host_reputation``) under-counts platforms
    that spread one origin across subdomains; this rolls the same
    signals up to the registrable domain (``functions.urls.
    registered_domain_col``'s ``domain_key`` convention: registrable
    domain, host fallback), which is the key UT1 blocklists and
    FineWeb's URL stats use.

    Output: domain_key, n_docs, n_hosts (distinct hosts under the
    domain), n_unique (distinct content hashes), dup_rate, total_tokens
    (sum of ``token_col``; whitespace-token count of ``text_col`` when
    absent), token_share (of the corpus total, 9 dp), avg_quality (6 dp).

    Scale shape: one hash aggregate keyed on the domain — counts and
    sums are map-side partial; the two exact distincts ride 8-byte
    hashes (host is re-keyed through xxhash64 so long hostnames never
    widen the expand), text never shuffles. Output is O(registrable
    domains) (~10^7 at 10^10 pages), broadcastable back onto a frontier.
    The corpus token total is a second 1-row aggregate broadcast-joined
    on, so the big side shuffles exactly once.
    """
    toks = (
        F.col(token_col).cast("bigint")
        if token_col
        else F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
        .cast("bigint")
    )
    q = F.col(quality_col) if quality_col else F.lit(0.0)
    # NULL-guard the hashes: xxhash64(NULL) is the (non-NULL) seed
    # constant, which would make every NULL host/text count as one
    # shared "distinct" value; COUNT(DISTINCT x) in SQL excludes NULLs,
    # and countDistinct skips NULL inputs, so the guard keeps parity.
    base = df.select(
        F.col(domain_col).alias("domain_key"),
        F.when(F.col(host_col).isNotNull(), F.xxhash64(F.col(host_col))).alias("__hh"),
        F.when(F.col(text_col).isNotNull(), F.xxhash64(F.col(text_col))).alias("__th"),
        toks.alias("__t"),
        q.cast("double").alias("__q"),
    )
    per_dom = base.groupBy("domain_key").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("__hh").alias("n_hosts"),
        F.countDistinct("__th").alias("n_unique"),
        F.sum("__t").alias("total_tokens"),
        F.avg("__q").alias("avg_quality"),
    )
    total = per_dom.agg(F.sum("total_tokens").alias("__corpus_tokens"))
    return (
        per_dom.crossJoin(F.broadcast(total))
        .select(
            "domain_key",
            "n_docs",
            "n_hosts",
            "n_unique",
            F.round(F.lit(1.0) - F.col("n_unique") / F.col("n_docs"), 6).alias("dup_rate"),
            "total_tokens",
            F.round(
                F.col("total_tokens").cast("double") / F.col("__corpus_tokens"), 9
            ).alias("token_share"),
            F.round("avg_quality", 6).alias("avg_quality"),
        )
    )


def apply_host_priority(
    frontier: DataFrame,
    reputation: DataFrame,
    host_col: str = "host",
    priority_col: str = "priority",
    max_boost: int = 3,
) -> DataFrame:
    """Fold reputation into frontier priority (lower = more urgent):
    boost = floor(score * max_boost) subtracted from the row's priority
    (floored at 0). Reputation is O(hosts) — broadcast-joined, so this
    adds zero shuffles to the round plan; hosts without a reputation row
    keep their priority."""
    rep = F.broadcast(
        reputation.select(F.col("host").alias(host_col), "score")
    )
    boosted = F.greatest(
        F.col(priority_col) - F.floor(F.coalesce(F.col("score"), F.lit(0.0)) * max_boost).cast("int"),
        F.lit(0),
    )
    return (
        frontier.join(rep, on=host_col, how="left")
        .withColumn(priority_col, boosted)
        .drop("score")
    )


def allocate_domain_budget(
    domains: DataFrame,
    total_budget: int,
    domain_col: str = "domain",
    weight_col: str = "weight",
    n_buckets: int = 256,
    max_per_domain: int | None = None,
) -> DataFrame:
    """Per-domain crawl-budget allocation — the scheduling layer ABOVE
    per-host politeness: split a global per-round fetch budget across
    domains proportionally to a weight (pending frontier size,
    reputation score, token yield), with the allocation summing to
    EXACTLY ``total_budget`` and every step deterministic and
    SQL-replayable.

    Algorithm: two-level cumulative rounding (the telescoping Hamilton
    scheme — budget_i = floor(T * cum_i / W) - floor(T * cum_{i-1} / W)
    sums to T exactly and gives each row floor-or-ceil of its
    proportional share). Level 1 allocates the total across
    ``n_buckets`` hash buckets of domains; level 2 allocates each
    bucket's budget across its domains ordered by domain key. Each
    level deviates at most 1 from the exact share, so a domain's budget
    is within 2 of proportional — noise against real budgets, in
    exchange for NO global sort: the bucket rollup is O(n_buckets) rows
    (a literal config bound, windowed in one tiny partition), the
    in-bucket running sum shuffles once on the bucket key, domains
    never leave their bucket partition.

    All share arithmetic is EXACT (decimal(38) products, integer
    floor), so Spark and the DuckDB oracle cannot drift by a ulp;
    weights must be non-negative integers with total_budget * sum(w)
    < 10^38 (any real corpus qualifies).

    ``max_per_domain`` clamps AFTER allocation and the surplus is
    FORFEITED, not redistributed — the cap models a per-round
    politeness ceiling: fetches a capped domain cannot absorb must not
    silently re-inflate other domains' pacing. Zero-weight domains stay
    in the output with budget 0.

    Output: (domain, weight, budget).
    """
    from raven_spark.operators.quality_model import feature_bucket_col

    dec = "decimal(38,0)"
    t = F.lit(int(total_budget)).cast(dec)

    def fdiv(num, den):
        # exact integer floor for non-negative decimals: subtract the
        # remainder FIRST so the division is exact — Spark's decimal
        # '/' rounds HALF_UP at scale 6, and floor(round6(q)) is
        # floor(q)+1 whenever q's fraction lands in [1 - 5e-7, 1),
        # which a corpus-sized weight sum hits routinely
        return ((num - F.pmod(num, den)) / den).cast(dec)

    # NULL domains coalesce to "" — feature_bucket_col(NULL) is NULL,
    # and a NULL bucket would silently drop the row (and forfeit its
    # bucket's budget) at the equi-join below
    d = domains.select(
        F.coalesce(F.col(domain_col), F.lit("")).alias("domain"),
        F.coalesce(F.col(weight_col).cast("bigint"), F.lit(0)).alias("weight"),
    ).withColumn(
        "__bkt", feature_bucket_col(F.col("domain"), int(n_buckets)).cast("int")
    )

    from pyspark.sql import Window

    bw = d.groupBy("__bkt").agg(F.sum("weight").alias("__bw"))
    wb = Window.orderBy(F.col("__bkt").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # O(n_buckets) rows: the single-partition window is bounded by a
    # config literal, never by the domain count
    lvl1 = (
        bw.withColumn("__cumw", F.sum("__bw").over(wb))
        .withColumn("__W", F.sum("__bw").over(Window.partitionBy()))
        .withColumn(
            "__bb",
            F.when(F.col("__W") <= 0, F.lit(0)).otherwise(
                fdiv(t * F.col("__cumw").cast(dec), F.col("__W").cast(dec))
                - fdiv(
                    t * (F.col("__cumw") - F.col("__bw")).cast(dec),
                    F.col("__W").cast(dec),
                )
            ).cast("bigint"),
        )
        .select("__bkt", "__bw", "__bb")
    )

    wd = Window.partitionBy("__bkt").orderBy(F.col("domain").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = (
        d.join(F.broadcast(lvl1), "__bkt")
        .withColumn("__cum", F.sum("weight").over(wd))
        .withColumn(
            "budget",
            F.when((F.col("__bw") <= 0) | (F.col("weight") <= 0), F.lit(0)).otherwise(
                fdiv(
                    F.col("__bb").cast(dec) * F.col("__cum").cast(dec),
                    F.col("__bw").cast(dec),
                )
                - fdiv(
                    F.col("__bb").cast(dec)
                    * (F.col("__cum") - F.col("weight")).cast(dec),
                    F.col("__bw").cast(dec),
                )
            ).cast("bigint"),
        )
    )
    if max_per_domain is not None:
        out = out.withColumn(
            "budget", F.least(F.col("budget"), F.lit(int(max_per_domain)))
        )
    return out.select("domain", "weight", "budget")
