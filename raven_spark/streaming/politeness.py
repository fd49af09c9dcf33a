"""Stateful streaming politeness: a per-host admission budget that
persists ACROSS micro-batches via ``applyInPandasWithState``.

The batch engine enforces per-host budgets per round with window
functions (operators/politeness.py) — stateless, because a round is one
job. A streaming frontier has no rounds: requests for the same host
arrive across many micro-batches, and the budget must be cumulative
until the politeness window resets. That is exactly the custom stateful
operator shape Spark reserves ``applyInPandasWithState`` for (the
task-brief bullet): state = (window_start_epoch, used) per host, input =
this batch's candidate fetches, output = the admitted rows.

Semantics (token bucket with a tumbling refill window):

- Each host gets ``budget`` admissions per ``window_seconds`` wall
  window (windows are aligned to the epoch, so replays admit the same
  rows for the same data — no processing-time dependence).
- Within a batch, candidates are admitted in deterministic order
  (event ts, then url_hash) so output is partitioning-independent.
- Non-admitted rows are EMITTED with admitted=false rather than
  dropped: the caller routes them back to the frontier (the batch
  engine's deferral semantics, plans/round.py) or to a dead-letter sink.

Scale: state is O(active hosts) x 16 bytes; the group key is the host,
so the shuffle is the same host-keyed exchange the batch politeness
window uses. GroupStateTimeout evicts hosts idle past the window, so
state doesn't accumulate dead hosts.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([
    T.StructField("window_start", T.LongType()),
    T.StructField("used", T.LongType()),
])


def _admit_schema() -> T.StructType:
    return T.StructType([
        T.StructField("host", T.StringType()),
        T.StructField("url_canon", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("admitted", T.BooleanType()),
    ])


def _budget_fn(budget: int, window_seconds: int, event_time: bool = False):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.hasTimedOut:
            state.remove()
            return
        win_start, used = state.get if state.exists else (None, 0)
        # buffer the WHOLE micro-batch for this host before sorting: a
        # per-chunk sort would make WHICH rows get admitted depend on
        # Arrow chunk boundaries (budget totals stay right, row identity
        # doesn't) — concatenating first keeps the admitted SET a pure
        # function of the batch's contents. Memory is one host's
        # micro-batch slice, the same bound the sort itself needs.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out = None
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(
                ["event_ts", "url_hash"], kind="mergesort"
            ).reset_index(drop=True)
            # event-time aligned windows: replay-stable, no processing time
            ts = pdf["event_ts"].astype("int64") // 10**9
            w = (ts // window_seconds) * window_seconds
            # event-time mode: rows whose window is already EVICTABLE
            # (watermark passed its eviction horizon) are denied outright.
            # Spark does NOT watermark-filter applyInPandasWithState input
            # (verified empirically on 4.1: numRowsDroppedByWatermark
            # stays 0), so without this a row arriving after its window's
            # state was evicted would meet fresh used=0 and over-admit.
            # Denying is always politeness-safe; such rows route to
            # deferral like any other non-admitted row.
            stale = None
            if event_time:
                wm_ms = state.getCurrentWatermarkMs()
                stale_mask = ((w + 2 * window_seconds) * 1000 <= wm_ms).to_numpy()
                if stale_mask.any():
                    stale = stale_mask
            if stale is not None:
                fresh = pdf[~stale].reset_index(drop=True)
                w_f = w[~stale].reset_index(drop=True)
            else:
                fresh, w_f = pdf, w
            admitted_all = np.zeros(len(pdf), dtype=bool)
            if len(fresh):
                if win_start is not None:
                    # late-but-not-evictable rows never reopen a closed
                    # window's budget: fold them into the open window
                    w_f = w_f.clip(lower=win_start)
                # vectorized admission: rank within window + carried usage
                rank = fresh.groupby(w_f).cumcount().to_numpy()
                carry = np.where(
                    w_f.to_numpy() == (win_start if win_start is not None else -1),
                    used, 0,
                )
                admitted = (rank + carry) < budget
                if stale is not None:
                    admitted_all[~stale] = admitted
                else:
                    admitted_all = admitted
                last_w = int(w_f.iloc[-1])
                last_carry = (
                    used if (win_start is not None and last_w == win_start) else 0
                )
                used = last_carry + int(admitted[w_f.to_numpy() == last_w].sum())
                win_start = last_w
            out = pdf[["host", "url_canon", "url_hash", "event_ts"]].assign(
                admitted=admitted_all
            )
        win_val = win_start if win_start is not None else 0
        state.update((win_val, used))
        if event_time:
            # watermarked input (EventTimeTimeout): evict only once the
            # WATERMARK — event-time progress, not wall clock — passes a
            # full idle window beyond the open window's end. Any row for
            # an evicted window arriving later hits the stale-denial
            # above (same horizon arithmetic), so eviction can never
            # cause over-admission: the per-window budget invariant holds
            # unconditionally in this mode.
            target = (win_val + 2 * window_seconds) * 1000
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(target, wm + 1))
        else:
            # no watermark available: evict hosts idle for a full window
            # beyond the current one, by WALL clock. NOTE (replay-stability
            # bound): a row arriving for a still-open EVENT window after >=
            # 2*window_seconds of wall-clock host idleness restarts used=0
            # and can over-admit; replay determinism holds within that
            # horizon. Pass ``watermark=`` to stateful_host_budget for the
            # event-time eviction that removes the caveat.
            state.setTimeoutDuration(2 * window_seconds * 1000)
        if out is not None:
            yield out

    return fn


def stateful_host_budget(
    candidates: DataFrame,
    budget: int,
    window_seconds: int = 60,
    host_col: str = "host",
    watermark: str | None = None,
) -> DataFrame:
    """Streaming per-host admission control (see module doc).

    ``candidates`` must carry (host, url_canon, url_hash, event_ts)
    — the identity columns ``with_url_identity`` produces plus an event
    timestamp. Returns the same rows with ``admitted`` appended; state
    (window_start, used) persists per host across micro-batches.

    ``watermark`` (e.g. ``"10 minutes"``): bound event-time lateness on
    ``event_ts`` and switch state eviction to EventTimeTimeout — a host's
    state is removed only when the watermark passes a full idle window
    beyond its open window, and any row for an already-evictable window
    is DENIED by the kernel itself (Spark does not watermark-filter this
    operator's input, so the kernel enforces the horizon). This removes
    the processing-time mode's over-admission caveat entirely: the
    per-host-per-window budget holds unconditionally; the trade is that
    very late rows are denied (routed to deferral) rather than folded
    into the open window. Without a watermark the operator keeps
    wall-clock eviction (2 windows idle), which never denies-as-late but
    can over-admit on >=2-window-stale replays.
    """
    src = candidates.select(
        F.col(host_col).alias("host"), "url_canon", "url_hash", "event_ts"
    )
    if watermark is not None:
        src = src.withWatermark("event_ts", watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    return (
        src
        .groupBy("host")
        .applyInPandasWithState(
            _budget_fn(budget, window_seconds, event_time=watermark is not None),
            outputStructType=_admit_schema(),
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
