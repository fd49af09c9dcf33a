"""Backward as-of join — the temporal operator Spark's join zoo lacks.

Crawl/corpus uses: "which robots.txt rules were in force when this page
was fetched", "join each fetch to the page's previous capture" (churn
deltas over the warc_ts snapshot axis), "attach the user/host profile as
of the event time". The reference engine has no temporal joins at all
(its rounds are independent, runner.rs); this is task-brief tier, like
operators/snapshots.py.

Semantics (pandas ``merge_asof`` / SQL ``ASOF JOIN`` backward): for each
left row, the single right row with the same key and the LARGEST
``right_ts <= left_ts`` — a left join, so unmatched left rows survive
with null payload.

Scale shape — one shuffle, no join explosion:

    union(left, right tagged) -> single hash-partition by key
      -> in-partition sort by (ts, side, content-hash)
      -> last(payload, ignorenulls) over an unbounded-preceding window
      -> keep left rows

A naive range join (``l.key = r.key AND r.ts <= l.ts`` + max-per-left)
expands to O(|captures| x |events|) pairs per key before aggregating;
the sort-merge-over-union plan is O(n log n) per key and never
materializes a pair. The window DOES sort each key's full history on one
partition — the standard as-of cost (the same shape pandas/Flint use).
For a key whose history is too hot for one task, pre-reduce the right
side first (e.g. ``latest_snapshot`` per coarse time bucket) — the
operators compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS, _SIDE, _PAY = "__asof_ts", "__asof_side", "__asof_pay"
_RTS = "__asof_rts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of left join. Output: every left row (original columns,
    original multiplicity) plus the right payload columns of its latest
    at-or-before match — all null when no match (or none within
    ``tolerance_seconds`` of the left timestamp).

    Right payload column names must not collide with left columns (alias
    the right side first). Ties inside the right side (same key, same
    timestamp) break on xxhash64 of the payload, so the winner is a
    deterministic function of row content, never of partitioning — the
    same invariant as latest_snapshot's tiebreak.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys and c != right_ts]
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")
    lcols = list(left.columns)

    r = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.struct(
            F.col(right_ts).alias(_RTS), *[F.col(c) for c in payload_cols]
        ).alias(_PAY),
        # left payload columns, typed nulls on the right branch
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAY].dataType).alias(_PAY),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )

    # right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    # snapshot taken exactly at the event time matches (ts >= semantics)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), F.xxhash64(_PAY).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        r.unionByName(l)
        .withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))
        .filter(F.col(_SIDE) == 1)
    )
    if tolerance_seconds is not None:
        in_tol = F.col(_PAY).isNotNull() & (
            F.unix_timestamp(_TS) - F.unix_timestamp(F.col(f"{_PAY}.{_RTS}"))
            <= F.lit(tolerance_seconds)
        )
        filled = filled.withColumn(_PAY, F.when(in_tol, F.col(_PAY)))
    return filled.select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[F.col(f"{_PAY}.{c}").alias(c) for c in payload_cols],
    )
