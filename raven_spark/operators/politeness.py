"""Politeness + priority scheduling: per-host token buckets as window
functions, robots.txt gating as a broadcast join.

The reference throttles by SLEEPING serially before every attempt
(crawler.rs:42-45) — on Spark a sleep inside an executor stalls a whole
core, so the scale-out equivalent (BASELINE.json north_rule) is a per-host
per-round budget:

    row_number() OVER (PARTITION BY host ORDER BY priority, url_hash)
        <= budget  -> scheduled this round
        >  budget  -> deferred back to the frontier with boosted priority

The window's partition key is the host — skew-prone (Zipf hosts), but the
window only ranks WITHIN a host and every host's rows cap at `budget`
output rows; AQE skew handling plus the salt_bucket repartitioning keep
the sort partitions bounded.

Robots gating: a small `robots` table (host, deny_prefixes, allow_
prefixes, crawl_delay_s) broadcast-joined to candidates; deny beats allow;
longest-prefix wins within each list (standard robots.txt precedence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def host_order():
    """Deterministic total order inside a host: priority asc (0 = most
    urgent), then depth asc, then url_hash — the engine's canonical crawl
    order (§2.1). A function (not a module constant) because Column
    construction needs an active session."""
    return [F.col("priority").asc(), F.col("depth").asc(), F.col("url_hash").asc()]


def schedule_budget(
    candidates: DataFrame,
    host_budget: int,
    defer_priority_boost: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Split candidates into (scheduled, deferred) by per-host budget.

    Deferred rows return to the frontier with priority boosted (lower
    number = sooner) so a host-starved URL cannot starve forever —
    the reference's FIFO fairness (runner.rs:98-101) re-expressed.
    """
    w = Window.partitionBy("host").orderBy(*host_order())
    ranked = candidates.withColumn("host_rank", F.row_number().over(w))
    scheduled = ranked.filter(F.col("host_rank") <= host_budget).drop("host_rank")
    deferred = (
        ranked.filter(F.col("host_rank") > host_budget)
        .drop("host_rank")
        .withColumn("priority", F.greatest(F.col("priority") - F.lit(defer_priority_boost), F.lit(0)))
        .withColumn("deferred_count", F.col("deferred_count") + 1)
    )
    return scheduled, deferred


ROBOTS_SCHEMA = (
    "host string, allow array<string>, deny array<string>, crawl_delay_s int"
)


def robots_flag(candidates: DataFrame, robots: DataFrame | None, flag_col: str = "robots_ok") -> DataFrame:
    """Adds boolean ``robots_ok`` after robots rules — a FLAG, not a split,
    so the round plan can materialize one DataFrame and branch with cheap
    cache-local filters (no upstream recompute per branch).

    The rules table is tiny relative to the frontier -> broadcast hash
    join, zero shuffle on the candidate side. Path precedence: the longest
    matching prefix among allow+deny wins; tie -> allow (Google semantics);
    no rule rows for a host -> allowed.
    """
    if robots is None:
        return candidates.withColumn(flag_col, F.lit(True))
    # full path after authority
    path = F.regexp_extract(F.col("url_canon"), r"^[a-z]+://[^/]+(/.*)$", 1)
    joined = candidates.join(F.broadcast(robots), on="host", how="left")
    longest = lambda arr: F.coalesce(  # noqa: E731
        F.array_max(
            F.transform(
                F.filter(arr, lambda p: path.startswith(p)),
                lambda p: F.length(p),
            )
        ),
        F.lit(-1),
    )
    deny_len = longest(F.col("deny"))
    allow_len = longest(F.col("allow"))
    is_allowed = F.col("deny").isNull() | (deny_len <= allow_len) | (deny_len == -1)
    return joined.withColumn(flag_col, is_allowed).drop("allow", "deny", "crawl_delay_s")


def robots_gate(candidates: DataFrame, robots: DataFrame | None) -> tuple[DataFrame, DataFrame]:
    """(allowed, denied) after robots rules — split view over robots_flag."""
    flagged = robots_flag(candidates, robots)
    return (
        flagged.filter(F.col("robots_ok")).drop("robots_ok"),
        flagged.filter(~F.col("robots_ok")).drop("robots_ok"),
    )


def effective_budget_col(robots: DataFrame | None, default_budget: int):
    """Per-host budget honoring robots crawl_delay: budget' = min(budget,
    round_seconds / crawl_delay_s). Returned as (host, host_budget) rows to
    broadcast-join before schedule_budget when robots data exists."""
    if robots is None:
        return None
    round_seconds = 60  # nominal round wall-clock for budget math
    return robots.select(
        "host",
        F.least(
            F.lit(default_budget),
            F.greatest((F.lit(round_seconds) / F.greatest(F.col("crawl_delay_s"), F.lit(1))).cast("int"), F.lit(1)),
        ).alias("host_budget"),
    )
