"""Multi-snapshot URL versioning — the pass a Common-Crawl-style corpus
runs BEFORE any text-level dedup: the same canonical URL appears once per
crawl snapshot (the input_hint table carries ``warc_ts`` exactly for
this), and training corpora keep one version per URL (usually the
newest) plus churn statistics for recrawl scheduling.

Two operators:

- ``latest_snapshot``: one row per canonical URL — the full payload row
  of the LATEST capture (max ``warc_ts``; deterministic tie-break).
- ``snapshot_stats``: per-URL churn profile — capture count, first/last
  seen, number of DISTINCT content versions (how often the page actually
  changed vs was merely recrawled).

Scale shape (the whole point at 10^10 captures):

- Both are single-shuffle hash aggregates keyed on the canonical URL.
  ``latest_snapshot`` uses ``max_by(payload, (ts, tiebreak))`` — an
  ordinary declarative aggregate, so Spark runs a PARTIAL max_by in the
  map stage: each map task emits at most one row per distinct URL, which
  means a hot URL with millions of captures (the snapshot analogue of
  host skew) reduces map-side and never concentrates on one reducer.
  A window (`row_number over (partition by url order by ts desc)`) would
  instead sort every capture of a URL on a single partition — the skew
  trap this operator exists to avoid; the DuckDB oracle replays the
  window form because the oracle runs at test scale.
- ``snapshot_stats`` counts distinct content versions via
  ``xxhash64(text)`` (8-byte map-side key, never the document text);
  same collision class as exact_dedup's accepted hash variant.

The reference crawler persists one record per fetch and never reconciles
across rounds (runner.rs drives rounds independently); snapshot
reconciliation is a task-brief pipeline addition, same tier as
operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_snapshot(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    tiebreak_col: str | None = None,
    exclude_not_modified: bool = True,
) -> DataFrame:
    """Keep the latest capture per URL; one output row per distinct URL
    with the original schema plus ``n_versions`` (capture count).

    Ties on ``ts_col`` are broken by ``tiebreak_col`` (default: the
    xxhash64 of every non-key column, so the winner is a deterministic
    function of row CONTENT, independent of partitioning/row order —
    the invariant every dedup op in this engine guarantees).

    ``exclude_not_modified``: when the input carries a ``result_code``
    column (the engine's pages table), 304 revalidation rows are DEMOTED
    below every real capture in the latest pick — a 304 capture has an
    empty body by protocol (operators/http.py), and letting it win would
    shadow the prior real capture with nothing. They aren't counted in
    ``n_versions`` (they are recrawls that found no new content). The
    one-output-row-per-distinct-URL contract still holds for a URL whose
    only in-scope captures ARE 304s (e.g. a windowed pages read whose 200
    capture falls outside the window): it yields its latest 304 row with
    ``n_versions = 0`` — present, and flagged as having no real body in
    this slice — rather than silently vanishing. Pass False to rank raw
    captures as-is.
    """
    if exclude_not_modified and "result_code" in df.columns:
        real = F.coalesce(F.col("result_code"), F.lit(0)) != 304
    else:
        real = F.lit(True)
    payload_cols = [c for c in df.columns if c != url_col]
    tb = (
        F.col(tiebreak_col)
        if tiebreak_col is not None
        else F.xxhash64(*[F.col(c) for c in payload_cols])
    )
    ordkey = F.struct(real.alias("real"), F.col(ts_col).alias("ts"), tb.alias("tb"))
    payload = F.struct(*[F.col(c) for c in payload_cols])
    agg = df.groupBy(url_col).agg(
        F.max_by(payload, ordkey).alias("__latest"),
        F.sum(real.cast("int")).cast("bigint").alias("n_versions"),
    )
    return agg.select(
        url_col,
        *[F.col(f"__latest.{c}").alias(c) for c in payload_cols],
        "n_versions",
    )


def snapshot_stats(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    content_col: str = "text",
) -> DataFrame:
    """Per-URL churn profile over all captures:

    (url, n_versions, first_seen, last_seen, n_content_versions,
    change_rate) where change_rate = (n_content_versions - 1) /
    (n_versions - 1) — the fraction of recrawls that found new content
    (0.0 for single-capture URLs; the recrawl-scheduling signal).

    Single hash aggregate on url; content identity is the 8-byte
    xxhash64, computed map-side before the shuffle.
    """
    base = df.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
        F.xxhash64(F.col(content_col)).alias("content_h"),
    )
    recrawls = F.col("n_versions") - F.lit(1)
    return (
        base.groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
            F.countDistinct("content_h").alias("n_content_versions"),
        )
        .select(
            "url",
            "n_versions",
            "first_seen",
            "last_seen",
            "n_content_versions",
            F.round(
                F.when(recrawls > 0,
                       (F.col("n_content_versions") - F.lit(1)).cast("double")
                       / recrawls.cast("double"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("change_rate"),
        )
    )


def recrawl_schedule(
    stats: DataFrame,
    min_interval_s: int = 3600,
    max_interval_s: int = 30 * 86400,
    default_interval_s: int = 7 * 86400,
) -> DataFrame:
    """Adaptive revisit scheduling from the churn profile — the
    consumer ``snapshot_stats`` exists for (Cho & Garcia-Molina 2003's
    Poisson-change estimator, the standard incremental-crawler policy):

        X changed recrawls out of n, mean inter-capture interval I
        lambda ≈ -ln(1 - X/n) / I      (X capped at n - 0.5: the
                                        all-changed case estimates from
                                        the censored observation, never
                                        ln(0))
        interval = clamp(1 / lambda, min, max)

    Never-changed URLs (X = 0) schedule at ``max_interval_s``;
    single-capture URLs (no recrawl evidence) at
    ``default_interval_s``. Output: stats columns + ``interval_s``
    (integer seconds) + ``next_fetch_ts`` (last_seen + interval) —
    join against the frontier on url to drive recrawl admission.

    Pure column algebra over the stats aggregate (one row per URL, no
    additional shuffle); every branch is deterministic and
    SQL-replayable.
    """
    recrawls = (F.col("n_versions") - F.lit(1)).cast("double")
    x = (F.col("n_content_versions") - F.lit(1)).cast("double")
    span_s = (
        F.unix_timestamp("last_seen") - F.unix_timestamp("first_seen")
    ).cast("double")
    # try_divide: the recrawls==0 branch never USES these, but ANSI
    # mode evaluates both sides of the branch predicate — a plain
    # division by zero would throw instead of routing to the default
    avg_iv = F.try_divide(span_s, recrawls)
    r = F.least(
        F.try_divide(x, recrawls),
        F.try_divide(recrawls - F.lit(0.5), recrawls),
    )
    # 1/lambda computed as I / -ln(1-r) directly (not the reciprocal of
    # a quotient — same value, but IEEE division is not associative and
    # the oracle must replay bit-exactly)
    inv_lam = F.try_divide(avg_iv, -F.log(F.lit(1.0) - r))
    interval = (
        # avg_iv.isNull() catches URLs whose captures ALL had
        # unparseable WARC dates (null first/last_seen): without it the
        # null propagates past every branch and the URL would silently
        # never be rescheduled instead of getting the default interval
        F.when(
            (recrawls <= 0) | (avg_iv <= 0) | avg_iv.isNull(),
            F.lit(float(default_interval_s)),
        )
        .when(x <= 0, F.lit(float(max_interval_s)))
        .otherwise(
            F.least(
                F.greatest(inv_lam, F.lit(float(min_interval_s))),
                F.lit(float(max_interval_s)),
            )
        )
    )
    out = stats.withColumn("interval_s", F.floor(interval).cast("bigint"))
    return out.withColumn(
        "next_fetch_ts",
        F.timestamp_add("SECOND", F.col("interval_s"), F.col("last_seen")),
    )


def content_drift(
    df: DataFrame,
    key_col: str = "url_id",
    order_col: str = "cap_seq",
    text_col: str = "text",
    change_threshold: int = 1,
) -> DataFrame:
    """Per-URL content-drift profile from SimHash distances between
    CONSECUTIVE captures — the recrawl-scheduling signal
    ``snapshot_stats`` can't see (distinct-version counting says *that*
    a page changed; the Hamming ladder says *how much*, separating
    timestamp-rotating boilerplate (hamming 1-3) from real rewrites):

        sig_t = simhash64(norm(text_t));  h_t = popcount(sig_t XOR sig_{t-1})

    Output per key: n_caps, n_transitions (consecutive pairs),
    n_changed (h >= ``change_threshold`` — the default 1 counts every
    nonzero tick; raise it to ignore boilerplate ticks), mean_hamming
    (6dp, over ALL transitions regardless of threshold), max_hamming.

    Scale shape: signatures ride the same vectorized Arrow kernel as
    simhash_buckets (one pass, no text shuffle — only (key, seq, 8-byte
    sig) reaches the exchange); the lag window partitions on the URL
    key, bounded by captures-per-URL (snapshot cadence, not corpus
    size), then one hash aggregate on the same key reuses the window's
    partitioning — a single exchange end to end.
    """
    from pyspark.sql import Window

    from raven_spark.functions.text import simhash_udf
    from raven_spark.operators.dedup import norm_text_col

    sigs = df.select(
        F.col(key_col),
        F.col(order_col),
        simhash_udf(norm_text_col(F.col(text_col))).alias("sig"),
    )
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).asc())
    per = sigs.select(
        key_col,
        F.bit_count(F.col("sig").bitwiseXOR(F.lag("sig").over(w))).alias("h"),
    )
    return per.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_caps"),
        F.count("h").alias("n_transitions"),
        # change_threshold > 1 ignores boilerplate ticks (a footer
        # counter moves the SimHash 0-2 bits; a rewrite moves 10+)
        F.sum(F.when(F.col("h") >= int(change_threshold), 1).otherwise(0))
        .cast("bigint")
        .alias("n_changed"),
        F.round(F.avg("h"), 6).alias("mean_hamming"),
        F.max("h").alias("max_hamming"),
    )


def revisit_schedule(
    df: DataFrame,
    key_col: str = "url_id",
    order_col: str = "cap_seq",
    text_col: str = "text",
    min_interval: int = 1,
    max_interval: int = 64,
    default_interval: int = 8,
    change_threshold: int = 1,
) -> DataFrame:
    """Drift-adaptive revisit scheduling (Cho & Garcia-Molina, TOIT
    2003, "Estimating frequency of change") — the policy layer over
    :func:`content_drift`: pages that change every capture earn short
    revisit intervals, static pages decay toward ``max_interval``, so
    a fixed recrawl budget concentrates on the URLs where freshness is
    actually being lost (uniform TTL recrawl — the engine's q66 due
    path — wastes most of its budget re-fetching static pages).

    Sibling of :func:`recrawl_schedule` (q61), which estimates change
    rate from EXACT content-hash churn over wall-clock seconds; this
    variant (q117) detects change with SimHash Hamming drift — with
    ``change_threshold`` >= 3 a footer counter or timestamp tick (which
    flips the exact hash every capture but moves the SimHash 0-2 bits)
    no longer counts as change — and uses the bias-corrected
    transition-count estimator in ROUND units, the natural clock when
    captures are one-per-crawl-round.

    Change-rate estimator (their bias-corrected Poisson MLE; n
    observed transitions, X of them changed):

        lambda_hat = -ln((n - X + 0.5) / (n + 0.5))

    (+0.5 keeps the X = n "always changed" case finite). Schedule:

        interval = clamp(ceil(1 / lambda_hat), min, max)   for X >= 1
        interval = max_interval                            for X = 0
        interval = default_interval                        for n = 0

    100 TB shape: inherits content_drift's single url-keyed exchange
    (SimHash sigs are the only thing shuffled, 8 bytes per capture);
    everything after is per-group integer algebra on the O(urls)
    frame. Deterministic — rates come from integer counts, so the
    DuckDB twin (q117) replays exactly.

    Output: (key, n_transitions, n_changed, change_rate 6dp,
    revisit_interval).
    """
    drift = content_drift(
        df,
        key_col=key_col,
        order_col=order_col,
        text_col=text_col,
        change_threshold=change_threshold,
    )
    n = F.col("n_transitions").cast("double")
    x = F.col("n_changed").cast("double")
    lam = -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5)))
    interval = (
        F.when(F.col("n_transitions") == 0, F.lit(int(default_interval)))
        .when(F.col("n_changed") == 0, F.lit(int(max_interval)))
        .otherwise(
            F.greatest(
                F.lit(int(min_interval)),
                F.least(
                    F.lit(int(max_interval)),
                    F.ceil(F.lit(1.0) / lam).cast("int"),
                ),
            )
        )
    )
    return drift.select(
        key_col,
        "n_transitions",
        "n_changed",
        # + 0.0 normalizes the X=0 case's -ln(1) = -0.0 to +0.0
        (
            F.round(F.when(F.col("n_transitions") == 0, F.lit(0.0)).otherwise(lam), 6)
            + F.lit(0.0)
        ).alias("change_rate"),
        interval.cast("int").alias("revisit_interval"),
    )


def crawl_saturation(
    df: DataFrame,
    domain_col: str = "domain",
    round_col: str = "round_no",
    content_col: str = "content_key",
    yield_dp: int = 6,
) -> DataFrame:
    """Per-domain crawl saturation — the diminishing-returns curve that
    tells a budget allocator WHEN to stop crawling a domain: each
    round's NEW-content yield (first-seen distinct content / fetches
    that round) decays roughly exponentially on template-bounded sites,
    so the fitted decay rate (and its half-life) ranks domains by how
    much fresh material is left. (Complements q83's size-proportional
    budgets and q117's per-URL revisit: this is the domain-level
    stop/continue signal.)

    Stages, all hash aggregates on 8-byte-ish keys:
    1. first-seen round per (domain, content_key) — min(round);
       callers at scale pass content_key = xxhash64(text) so text never
       shuffles (the q09/q34 discipline; the oracle twin, q119, uses a
       replayable key).
    2. n_new per (domain, round) from 1; n_fetched per (domain, round)
       from the raw captures — same key, one exchange reused.
    3. yield = n_new / n_fetched (rounded before the log so the OLS
       sums replay); per-domain closed-form OLS of ln(yield) on round
       over rounds whose rounded yield is > 0 (ln 0 undefined — a
       dried-up round, or one whose yield rounds to 0 at ``yield_dp``,
       ends the fit's support but still counts fetches).

    Output per domain: (domain, n_rounds, total_new, decay_rate 6dp,
    half_life 6dp, last_yield 6dp). decay_rate NULL when < 2 usable
    rounds or zero variance (try_divide); half_life = -ln2/decay only
    for decaying domains (positive/flat fits -> NULL).
    """
    caps = df.select(
        F.col(domain_col).alias("domain"),
        F.col(round_col).alias("r"),
        F.col(content_col).alias("ck"),
    )
    first = caps.groupBy("domain", "ck").agg(F.min("r").alias("r0"))
    new_per = first.groupBy("domain", F.col("r0").alias("r")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    fetched = caps.groupBy("domain", "r").agg(F.count(F.lit(1)).alias("n_fetched"))
    per_round = fetched.join(new_per, ["domain", "r"], "left").select(
        "domain",
        "r",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
        "n_fetched",
        F.round(
            F.coalesce("n_new", F.lit(0)).cast("double")
            / F.col("n_fetched").cast("double"),
            yield_dp,
        ).alias("y"),
    )
    x = F.col("r").cast("double")
    lny = F.log(F.col("y"))
    # usable gates on the ROUNDED yield, not n_new: a round whose yield
    # rounds to 0 at yield_dp has ln(y) = ln(0) = NULL, and gating on
    # n_new > 0 would include it in __m/__sx/__sxx while NULL drops it
    # from __sy/__sxy — inconsistent OLS sums that read as "no decay"
    # for a collapsed domain.
    usable = F.col("y") > 0
    agg = per_round.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_rounds"),
        F.sum("n_new").alias("total_new"),
        F.sum(F.when(usable, 1).otherwise(0)).alias("__m"),
        F.sum(F.when(usable, x)).alias("__sx"),
        F.sum(F.when(usable, lny)).alias("__sy"),
        F.sum(F.when(usable, x * x)).alias("__sxx"),
        F.sum(F.when(usable, x * lny)).alias("__sxy"),
        F.max_by("y", F.struct(F.col("r"))).alias("__last_y"),
    )
    md = F.col("__m").cast("double")
    slope = F.try_divide(
        F.col("__sxy") - F.try_divide(F.col("__sx") * F.col("__sy"), md),
        F.col("__sxx") - F.try_divide(F.col("__sx") * F.col("__sx"), md),
    )
    decay = F.when(F.col("__m") >= 2, F.round(slope, 6))
    return agg.select(
        "domain",
        "n_rounds",
        "total_new",
        decay.alias("decay_rate"),
        F.round(
            F.when(decay < 0, -F.log(F.lit(2.0)) / decay), 6
        ).alias("half_life"),
        F.round("__last_y", 6).alias("last_yield"),
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot-to-snapshot corpus diff — the incremental-refresh
    primitive between two crawl generations (a training-data pipeline
    re-crawls monthly and wants to re-process ONLY the delta, the
    Common-Crawl dump-over-dump reality): classify every URL present
    in either snapshot as

        added      (new only)
        removed    (old only)
        changed    (both, content identity differs)
        unchanged  (both, identical content)

    Content identity is xxhash64 of the dedup-normalized text (the
    engine-wide 8-byte identity — clean_corpus/host_boilerplate
    convention), so the join ships (url, 8-byte hash) and the TEXT
    NEVER SHUFFLES. NULL text hashes to the seed constant, distinct
    from the empty string — a page that lost its body reads as
    changed, not unchanged.

    Scale shape: ONE full-outer shuffle join on the URL key; both
    sides pre-project to two columns, partial aggregates downstream
    (diff_stats) reuse the exchange. At 100 TB both sides are
    parquet-pruned to (url, text) and the changed/unchanged verdict
    never rehydrates bodies.

    Output: (url, status string, in_old, in_new boolean).
    """
    from raven_spark.operators.dedup import norm_text_col

    o = old.select(
        F.col(url_col).alias("url"),
        F.xxhash64(norm_text_col(F.col(text_col))).alias("__ho"),
        F.lit(True).alias("__in_o"),
    )
    n = new.select(
        F.col(url_col).alias("url"),
        F.xxhash64(norm_text_col(F.col(text_col))).alias("__hn"),
        F.lit(True).alias("__in_n"),
    )
    j = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("__in_o").isNull(), F.lit("added"))
        .when(F.col("__in_n").isNull(), F.lit("removed"))
        .when(F.col("__ho") != F.col("__hn"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        "url",
        status.alias("status"),
        F.coalesce("__in_o", F.lit(False)).alias("in_old"),
        F.coalesce("__in_n", F.lit(False)).alias("in_new"),
    )


def corpus_diff_stats(
    diff: DataFrame, host_col_expr=None
) -> DataFrame:
    """Per-host rollup of a corpus_diff: status counts + churn ratio
    (changed+added+removed over total touched). ``host_col_expr``
    defaults to the registrable-host slice of the url (everything
    between '://' and the next '/'). One aggregate reusing the diff's
    partitioning where possible; O(hosts x 4) rows out."""
    host = (
        host_col_expr
        if host_col_expr is not None
        else F.regexp_extract(F.col("url"), r"^[a-z+]+://([^/]+)", 1)
    )
    agg = diff.groupBy(host.alias("host")).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(F.when(F.col("status") == "added", 1).otherwise(0)).alias("n_added"),
        F.sum(F.when(F.col("status") == "removed", 1).otherwise(0)).alias("n_removed"),
        F.sum(F.when(F.col("status") == "changed", 1).otherwise(0)).alias("n_changed"),
        F.sum(F.when(F.col("status") == "unchanged", 1).otherwise(0)).alias("n_unchanged"),
    )
    return agg.select(
        "host",
        "n_urls",
        "n_added",
        "n_removed",
        "n_changed",
        "n_unchanged",
        F.round(
            (F.col("n_added") + F.col("n_removed") + F.col("n_changed")).cast("double")
            / F.col("n_urls").cast("double"),
            6,
        ).alias("churn_ratio"),
    )
