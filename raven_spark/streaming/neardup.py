"""Streaming near-dup candidate generation: the incremental twin of
the batch LSH band probe (operators/dedup.py::minhash_lsh_candidates /
incremental_minhash_dedup), for corpora that arrive as a stream.

The batch operator self-joins band entries; a stream cannot self-join
its own past, so the band buckets become STATE: each (band_id,
band_key) group remembers the doc ids that landed in it, and every new
arrival emits a candidate pair against each remembered id — including
ids from EARLIER micro-batches, which is exactly the part a stateless
per-batch join would miss. This is the ``applyInPandasWithState``
shape (the custom-stateful-operator seam the task brief names), keyed
by the same 8-byte band key the batch exchange shuffles on.

Semantics and bounds:

- Signatures/band keys are the BATCH expressions verbatim (same
  xxhash64 minima, same band hashing), so a pair this stage emits is a
  pair the batch probe would emit on the union of all batches seen.
- Per-bucket membership is capped at ``max_bucket`` ids: a hot bucket
  is cross-site boilerplate (the mirror_hosts/winnow max_df
  discipline) and the quadratic key. The batch probe
  (minhash_lsh_candidates) has NO such cap — it emits every pair of a
  hot bucket — so past the cap the stream UNDER-emits relative to
  batch: arrivals after the cap still pair against the capped
  membership (<= max_bucket pairs each) but are not remembered. The
  exact-parity guarantee with the batch probe therefore holds only
  while every bucket stays under ``max_bucket``; beyond it the stream
  trades recall on boilerplate keys for bounded state, a trade the
  batch side makes elsewhere (winnow/mirror max_df) before pairing.
- Within a batch, rows are processed in (event ts, id) order after
  concatenating all Arrow chunks, so emitted pairs are independent of
  chunk boundaries and partitioning (the round-3 advice fix applied
  from the start).
- State evicts by EVENT time: a bucket idle past ``state_ttl_seconds``
  of event time is dropped at the watermark (EventTimeTimeout — the
  replay-stable eviction, not wall-clock). The caller's watermark on
  ``ts_col`` bounds both state size and how far back a pair can reach;
  cross-horizon dedup authority stays with the Bloom/cuckoo seen
  family, exactly as in streaming_exact_dedup.

Downstream: distinct the pairs (a pair can surface in several bands)
and run the batch exact-Jaccard verify in foreachBatch — candidates
are cheap to re-verify, state stays 8 bytes per member.

Output schema: (id_a, id_b) with id_a < id_b, per emitting band.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("max_ts", T.LongType()),  # epoch ms, for eviction
    ]
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
    ]
)


def _bucket_fn(max_bucket: int, state_ttl_seconds: int):
    ttl_ms = int(state_ttl_seconds) * 1000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        ids: list[int] = []
        max_ts = 0
        if state.exists:
            st_ids, st_ts = state.get  # GroupState.get is a property
            ids = list(st_ids)
            max_ts = int(st_ts)
        # concatenate ALL chunks before ordering — per-chunk sorts make
        # the admitted pair set depend on chunk boundaries
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(["__ts_ms", "__id"], kind="mergesort")
            known = set(ids)
            out_a: list[int] = []
            out_b: list[int] = []
            for did, ts_ms in zip(pdf["__id"], pdf["__ts_ms"]):
                did = int(did)
                ts_ms = int(ts_ms)
                if ts_ms > max_ts:
                    max_ts = ts_ms
                if did in known:
                    continue  # re-delivery of a member: no self-pairs
                for other in ids:
                    out_a.append(min(did, other))
                    out_b.append(max(did, other))
                if len(ids) < max_bucket:
                    ids.append(did)
                    known.add(did)
            state.update((ids, max_ts))
            # clamp: a bucket fed only LATE rows has max_ts + ttl behind
            # the current watermark, and setTimeoutTimestamp throws on
            # timestamps <= watermark — killing the query and poisoning
            # the checkpoint (every restart replays the same batch).
            # Such a bucket is due for eviction at the next watermark
            # advance anyway.
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(max_ts + ttl_ms, wm + 1))
            if out_a:
                yield pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return fn


def streaming_band_candidates(
    pages: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "warc_ts",
    k: int = 16,
    bands: int = 8,
    n: int = 3,
    max_bucket: int = 50,
    watermark_delay: str = "10 minutes",
    state_ttl_seconds: int = 3600,
) -> DataFrame:
    """Near-dup candidate pairs over a page stream (module doc). Pages
    with NULL text carry no content identity and are dropped here (the
    fetch taxonomy owns them, as in streaming_exact_dedup)."""
    from raven_spark.operators.dedup import (
        band_structs_col,
        minhash_signature_col,
        word_shingles_col,
    )

    sigs = (
        pages.filter(F.col(text_col).isNotNull())
        .withWatermark(ts_col, watermark_delay)
        .select(
            F.col(id_col).cast("long").alias("__id"),
            (F.col(ts_col).cast("double") * 1000).cast("long").alias("__ts_ms"),
            F.col(ts_col).alias("__ts"),
            minhash_signature_col(
                word_shingles_col(F.col(text_col), n), k
            ).alias("__sig"),
        )
    )
    # band_structs_col IS the batch band-key definition — parity with
    # the batch probe is structural, not a maintained copy
    entries = sigs.select(
        "__id",
        "__ts_ms",
        "__ts",
        F.explode(band_structs_col(F.col("__sig"), k, bands)).alias("band"),
    ).select("__id", "__ts_ms", "__ts", "band.band_id", "band.band_key")
    return entries.groupBy("band_id", "band_key").applyInPandasWithState(
        _bucket_fn(max_bucket, state_ttl_seconds),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
