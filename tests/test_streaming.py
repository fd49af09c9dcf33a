"""Structured-Streaming surface (streaming/ingest.py): incremental link
frontier and windowed host-rate metrics over the pages table, checked
for batch/streaming parity on identical input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raven_spark.functions.urls import with_url_identity
from raven_spark.streaming.ingest import (
    _links_from_html_bytes,
    host_rate_metrics,
    read_pages_stream,
    streaming_link_frontier,
)

N_PAGES = 300


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    """Two parquet file-drops (micro-batches) of the synthetic corpus,
    strict input_hint schema."""
    from raven_spark.sources.corpus import generate_pages

    root = str(tmp_path_factory.mktemp("pages_stream"))
    pages = generate_pages(spark, N_PAGES, n_hosts=12, seed=7).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    pages.filter(F.xxhash64("url") % 2 == 0).coalesce(1).write.parquet(root, mode="append")
    pages.filter(F.xxhash64("url") % 2 != 0).coalesce(1).write.parquet(root, mode="append")
    return root


def _run_to_memory(df, name, output_mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_frontier_matches_batch_identity(spark, pages_dir):
    stream = read_pages_stream(spark, pages_dir, max_files_per_trigger=1)
    _run_to_memory(
        streaming_link_frontier(stream, watermark="10 minutes"),
        "frontier_sink", "append",
    )
    got = spark.table("frontier_sink")
    # batch replay of the same semantics: explode links -> identity ->
    # one row per url_hash
    batch = (
        with_url_identity(
            spark.read.parquet(pages_dir)
            .select(F.explode(_links_from_html_bytes(F.col("html"))).alias("url"))
        )
        .select("url_canon", "url_hash", "host", "salt_bucket")
        .distinct()
    )
    got_set = {
        (r["url_canon"], r["url_hash"], r["host"], r["salt_bucket"])
        for r in got.select("url_canon", "url_hash", "host", "salt_bucket").collect()
    }
    want_set = {tuple(r) for r in batch.collect()}
    # streaming dedup is within-watermark: every batch-distinct identity
    # must appear, and no identity outside the batch set may appear
    assert set(t[1] for t in got_set) == set(t[1] for t in want_set)
    assert got_set == want_set
    # within-watermark dedup actually collapsed re-discoveries
    assert got.count() < spark.read.parquet(pages_dir).select(
        F.explode(_links_from_html_bytes(F.col("html")))
    ).count()


def test_host_rate_metrics_window_counts(spark, pages_dir):
    stream = read_pages_stream(spark, pages_dir)
    _run_to_memory(
        host_rate_metrics(stream, window="10 minutes", watermark="5 minutes"),
        "rates_sink", "append",
    )
    got = spark.table("rates_sink")
    batch = (
        with_url_identity(spark.read.parquet(pages_dir))
        .groupBy(F.window("warc_ts", "10 minutes").alias("w"), "host")
        .agg(F.count(F.lit(1)).alias("n_pages"), F.sum(F.length("html")).alias("bytes"))
        .select(F.col("w.start").alias("window_start"), "host", "n_pages", "bytes")
    )
    want = {(r["window_start"], r["host"]): (r["n_pages"], r["bytes"]) for r in batch.collect()}
    got_d = {(r["window_start"], r["host"]): (r["n_pages"], r["bytes"]) for r in got.collect()}
    # append mode only emits windows the watermark closed; availableNow
    # over a finite directory closes all but the trailing window(s), so
    # every EMITTED row must match the batch aggregate exactly, and most
    # windows must have been emitted
    assert got_d, "no windows emitted"
    for k, v in got_d.items():
        assert want[k] == v
    assert len(got_d) >= len(want) - len({h for (_, h) in want})


def test_stateful_host_budget_across_microbatches(spark, tmp_path):
    """applyInPandasWithState politeness: the per-host budget must be
    CUMULATIVE across micro-batches within one event-time window —
    batch 1 admits up to the budget, batch 2's same-window rows are
    denied; a later window refills. Denied rows are emitted, not
    dropped."""
    from raven_spark.streaming.politeness import stateful_host_budget

    root = str(tmp_path / "cands")
    # window 0: 6 requests for hostA (3 per file drop), 2 for hostB;
    # window 1 (ts+120s): 2 more for hostA
    rows0 = [("a.example", f"https://a.example/{i}", i, 10 + i) for i in range(3)]
    rows1 = [("a.example", f"https://a.example/{i+3}", i + 3, 20 + i) for i in range(3)]
    rows0 += [("b.example", f"https://b.example/{i}", 100 + i, 15 + i) for i in range(2)]
    rows1 += [("a.example", f"https://a.example/w2-{i}", 200 + i, 130 + i) for i in range(2)]
    ddl = "host string, url_canon string, url_hash long, event_ts timestamp"

    def to_df(rows):
        import datetime as dt

        base = dt.datetime(2026, 1, 1, 0, 0, 0)
        return spark.createDataFrame(
            [(h, u, x, base + dt.timedelta(seconds=s)) for h, u, x, s in rows], ddl,
        )

    to_df(rows0).coalesce(1).write.parquet(root, mode="append")
    to_df(rows1).coalesce(1).write.parquet(root, mode="append")

    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(root)
    )
    out = stateful_host_budget(stream, budget=4, window_seconds=60)
    q = (
        out.writeStream.format("memory").queryName("budget_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("budget_sink").collect()
    assert len(got) == len(rows0) + len(rows1)  # denied rows emitted too
    a_w0 = [r for r in got if r["host"] == "a.example" and r["url_hash"] < 100]
    assert sum(r["admitted"] for r in a_w0) == 4  # cumulative cap across batches
    # the admitted four are the earliest by event time
    admitted_ids = sorted(r["url_hash"] for r in a_w0 if r["admitted"])
    assert admitted_ids == [0, 1, 2, 3]
    b_rows = [r for r in got if r["host"] == "b.example"]
    assert all(r["admitted"] for r in b_rows)  # under budget
    a_w2 = [r for r in got if r["url_hash"] >= 200]
    assert all(r["admitted"] for r in a_w2)  # new window refills


def test_stateful_host_budget_event_time_eviction(spark, tmp_path):
    """EventTimeTimeout mode (ADVICE r3): host state evicts only when
    the watermark passes the open window's eviction horizon, and a row
    for an already-evictable window is DENIED by the kernel (Spark 4.1
    does not watermark-filter applyInPandasWithState input — verified:
    numRowsDroppedByWatermark stays 0) — so eviction can never restart a
    window's budget at used=0 (the processing-time mode's over-admission
    caveat). Denied-as-late rows are emitted for deferral, not lost."""
    import datetime as dt
    import time

    from raven_spark.streaming.politeness import stateful_host_budget

    root = str(tmp_path / "cands")
    ddl = "host string, url_canon string, url_hash long, event_ts timestamp"
    base = dt.datetime(2026, 1, 1, 0, 0, 0)

    def to_df(rows):
        return spark.createDataFrame(
            [(h, u, x, base + dt.timedelta(seconds=s)) for h, u, x, s in rows], ddl,
        )

    batches = [
        # W0 (ts 0-59) exhausts budget 2 with 4 candidates
        [("a.example", f"https://a.example/{i}", i, 10 + i) for i in range(4)],
        # far-future hostA rows: wm -> ~9400s, hostA window -> ~9960
        [("a.example", f"https://a.example/f{i}", 50 + i, 10_000 + i)
         for i in range(2)],
        # hostB advances wm past hostA's eviction horizon (10080s)
        [("b.example", "https://b.example/1", 70, 20_000)],
        # hostA has NO data here -> its expired timer fires, state evicted
        [("b.example", "https://b.example/2", 71, 20_060)],
        # late W0 row arrives AFTER eviction: fresh state would admit it
        # (used=0) — the stale-denial rule must deny instead
        [("a.example", "https://a.example/late", 99, 30)],
    ]
    for rows in batches:
        to_df(rows).coalesce(1).write.parquet(root, mode="append")
        time.sleep(1.2)  # separate mtimes: file order == batch order

    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(root)
    )
    out = stateful_host_budget(
        stream, budget=2, window_seconds=60, watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory").queryName("budget_et_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {r["url_hash"]: r for r in spark.table("budget_et_sink").collect()}
    assert [h for h in range(4) if got[h]["admitted"]] == [0, 1]  # W0 budget
    assert got[50]["admitted"] and got[51]["admitted"]  # new window refills
    assert got[70]["admitted"] and got[71]["admitted"]  # other host
    # the post-eviction late row must NEVER be admitted. Two legal fates:
    # Spark's own late-event filter removes it before the operator (its
    # filtering for this operator is watermark-propagation-timing
    # dependent — observed both ways on 4.1), or it reaches the kernel
    # and the stale-denial rule emits it admitted=False for deferral.
    if 99 in got:
        assert got[99]["admitted"] is False
    assert len(got) in (8, 9)


def _warc_fixture_pages(spark, n=30):
    import datetime as dt

    ts0 = dt.datetime(2026, 1, 2, 3, 4, 5)
    rows = [
        (
            f"https://host{i % 4}.example/s/{i}",
            ts0 + dt.timedelta(seconds=i),
            (f"<html><body><p>stream doc {i}</p></body></html>").encode(
                "shift_jis" if i % 7 == 0 else "utf-8"
            ),
            "text/html; charset=shift_jis" if i % 7 == 0 else "text/html",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, content_type string"
    )


def test_read_warc_stream_matches_batch(spark, tmp_path):
    """Streaming WARC ingest is row-identical to the batch reader on the
    same files (shared _record_scan kernel): every field including the
    raw body bytes matches, with one micro-batch per file."""
    from raven_spark.sources.warc import read_warc, write_warc
    from raven_spark.streaming.ingest import read_warc_stream

    root = str(tmp_path / "warc")
    write_warc(
        _warc_fixture_pages(spark), root, n_files=3,
        content_type_col="content_type",
    ).collect()

    stream = read_warc_stream(spark, f"{root}/*.warc.gz",
                              max_files_per_trigger=1)
    _run_to_memory(stream, "warc_stream_sink", "append")
    got = {r["url"]: r for r in spark.table("warc_stream_sink").collect()}
    want = {r["url"]: r for r in read_warc(spark, f"{root}/*.warc.gz").collect()}
    assert set(got) == set(want) and len(want) == 30
    for u, w in want.items():
        g = got[u]
        assert bytes(g["html"]) == bytes(w["html"])
        assert g["warc_ts"] == w["warc_ts"]
        assert g["http_status"] == w["http_status"]
        assert g["content_type"] == w["content_type"]
        assert g["warc_type"] == "response"


def test_warc_pages_stream_matches_batch_table(spark, tmp_path):
    """A corpus ingested live (warc_pages_stream) is byte/text-identical
    to one imported after the fact (warc_pages_table): same decode +
    pinned extractor + lang-ID, so the input_hint invariants hold on
    the streaming path too."""
    from raven_spark.sources.warc import warc_pages_table, write_warc
    from raven_spark.streaming.ingest import warc_pages_stream

    root = str(tmp_path / "warc")
    write_warc(
        _warc_fixture_pages(spark), root, n_files=2,
        content_type_col="content_type",
    ).collect()

    stream = warc_pages_stream(spark, f"{root}/*.warc.gz",
                               max_files_per_trigger=1)
    _run_to_memory(stream, "warc_pages_sink", "append")
    got = {r["url"]: r for r in spark.table("warc_pages_sink").collect()}
    want = {
        r["url"]: r
        for r in warc_pages_table(spark, f"{root}/*.warc.gz").collect()
    }
    assert set(got) == set(want) and len(want) == 30
    for u, w in want.items():
        g = got[u]
        assert bytes(g["html"]) == bytes(w["html"])
        assert g["text"] == w["text"] and g["text"]  # non-empty extraction
        assert g["lang"] == w["lang"]
        assert g["warc_ts"] == w["warc_ts"]


def test_cdx_index_stream_matches_batch(spark, tmp_path):
    """Streaming CDX build is row-identical to the batch index over the
    same files (shared cdx_records kernel + JVM-side SURT)."""
    from raven_spark.sources.cdx import cdx_index_from_files
    from raven_spark.sources.warc import write_warc
    from raven_spark.streaming.ingest import cdx_index_stream

    root = str(tmp_path / "warc")
    write_warc(
        _warc_fixture_pages(spark, 24), root, n_files=3,
        content_type_col="content_type",
    ).collect()

    stream = cdx_index_stream(spark, f"{root}/*.warc.gz",
                              max_files_per_trigger=1)
    _run_to_memory(stream, "cdx_stream_sink", "append")
    got = {
        (r["warc_file"], r["offset"]): r
        for r in spark.table("cdx_stream_sink").collect()
    }
    want = {
        (r["warc_file"], r["offset"]): r
        for r in cdx_index_from_files(spark, f"{root}/*.warc.gz").collect()
    }
    assert set(got) == set(want) and len(want) == 24
    for k, w in want.items():
        g = got[k]
        assert (g["url"], g["digest"], g["length"], g["surt"]) == (
            w["url"], w["digest"], w["length"], w["surt"]
        )


def test_subtract_seen_on_stream_matches_batch(spark, tmp_path):
    """The engine's seen-set subtraction works VERBATIM on a streaming
    frontier: the Bloom probe is mapInPandas (stream-capable), the exact
    remainder is a stream-static left_anti join, and the definitely-new
    union is a streaming union — no streaming-specific operator needed.
    Parity vs the batch plan on identical input."""
    from pyspark.sql import functions as F

    from raven_spark.operators.seen import build_bloom, subtract_seen

    cand = spark.range(0, 400).select(
        F.concat(F.lit("https://s.example/p/"), F.col("id").cast("string"))
        .alias("url_canon"),
        F.xxhash64(F.concat(F.lit("https://s.example/p/"),
                            F.col("id").cast("string"))).alias("url_hash"),
    )
    seen = cand.filter(F.pmod(F.xxhash64("url_canon"), F.lit(3)) == 0) \
        .select("url_hash")
    bloom = build_bloom(seen, "url_hash", expected_n=1000, fpp=0.01)
    want = sorted(
        r["url_canon"] for r in subtract_seen(cand, seen, bloom).collect()
    )

    src = str(tmp_path / "cand")
    cand.write.parquet(src)
    stream = spark.readStream.schema("url_canon string, url_hash long") \
        .parquet(src)
    out = subtract_seen(stream, seen, bloom)
    _run_to_memory(out, "stream_subtract_sink", "append")
    got = sorted(
        r["url_canon"] for r in spark.table("stream_subtract_sink").collect()
    )
    assert got == want and 0 < len(got) < 400


def test_streaming_exact_dedup_matches_batch_identity(spark, tmp_path):
    """Streaming exact dedup keeps exactly one page per normalized
    content hash within the horizon, passes NULL-text rows through,
    and agrees with the batch dedup identity on the same input."""
    import datetime

    from raven_spark.streaming.ingest import (
        PAGE_DDL,
        read_pages_stream,
        streaming_exact_dedup,
    )

    root = str(tmp_path / "pages")
    ts = datetime.datetime(2026, 8, 20, 12, 0, 0)
    rows = [
        ("http://h0.ex/a", ts, b"<p>x</p>", "Same  Body", "en"),
        ("http://h0.ex/b", ts, b"<p>x</p>", "same body", "en"),   # dup of /a
        ("http://h1.ex/c", ts, b"<p>y</p>", "other body", "en"),
        ("http://h1.ex/d", ts, b"", None, "en"),                  # passthrough
        ("http://h1.ex/e", ts, b"", None, "en"),                  # passthrough too
    ]
    spark.createDataFrame(rows, PAGE_DDL).coalesce(1).write.parquet(root)
    stream = read_pages_stream(spark, root)
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from sdedup").collect()
    with_text = [r for r in out if r["text"] is not None]
    nulls = [r for r in out if r["text"] is None]
    # one survivor per content identity; both NULL-text rows pass
    assert len(with_text) == 2 and len(nulls) == 2
    kept_hashes = {r["content_hash"] for r in with_text}
    assert len(kept_hashes) == 2
    # streaming identity == batch identity (xxhash64 over norm text)
    from raven_spark.operators.dedup import norm_text_col

    batch = (
        spark.createDataFrame(rows, PAGE_DDL)
        .filter(F.col("text").isNotNull())
        .select(F.xxhash64(norm_text_col(F.col("text"))).alias("h"))
        .distinct()
        .collect()
    )
    assert kept_hashes == {r["h"] for r in batch}


def test_streaming_band_candidates_cross_batch(spark, tmp_path):
    """Candidate pairs surface across micro-batches (stateful band
    buckets), match the batch LSH probe on the union input, and
    re-deliveries of a member emit no self-pairs."""
    import datetime

    from raven_spark.streaming.ingest import PAGE_DDL
    from raven_spark.streaming.neardup import streaming_band_candidates

    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the field toward the river all afternoon")
    ts = datetime.datetime(2026, 8, 20, 12, 0, 0)
    t2 = datetime.datetime(2026, 8, 20, 12, 5, 0)
    b1 = [
        ("http://h/a1", ts, b"", base, "en"),
        ("http://h/a2", ts, b"", "a completely different first page body", "en"),
    ]
    b2 = [
        ("http://h/b1", t2, b"", base + " extra", "en"),     # near-dup of a1
        ("http://h/b2", t2, b"", base, "en"),                # exact dup of a1
    ]
    root = str(tmp_path / "pages")
    # two parquet files -> availableNow processes them as separate units,
    # but one trigger suffices for the cross-file state to matter: write
    # and run batch 1, then append batch 2 and run again on the SAME
    # checkpoint so bucket state persists across runs
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    spark.createDataFrame(b1, PAGE_DDL).coalesce(1).write.parquet(root)

    def run_once():
        stream = (
            spark.readStream.schema(PAGE_DDL).parquet(root)
            .withColumn("doc_id", F.xxhash64("url"))
        )
        q = (
            streaming_band_candidates(stream, max_bucket=10)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(sink).collect()

    out1 = run_once()
    spark.createDataFrame(b2, PAGE_DDL).coalesce(1).write.parquet(
        root, mode="append"
    )
    out2 = run_once()
    ids = {u: spark.createDataFrame([(u,)], "url string")
           .select(F.xxhash64("url")).first()[0]
           for u in ["http://h/a1", "http://h/a2", "http://h/b1", "http://h/b2"]}
    pairs2 = {(r["id_a"], r["id_b"]) for r in out2}
    key = lambda x, y: (min(ids[x], ids[y]), max(ids[x], ids[y]))
    # batch-2 arrivals pair against the batch-1 member held in state
    assert key("http://h/a1", "http://h/b1") in pairs2
    assert key("http://h/a1", "http://h/b2") in pairs2
    # and with each other
    assert key("http://h/b1", "http://h/b2") in pairs2
    # the unrelated page pairs with nothing
    assert not any(ids["http://h/a2"] in p for p in pairs2)
    assert out1 == []  # batch 1 had no near-dup pair
    # parity: the streamed pair set equals the batch LSH probe over the
    # union of all batches (same k/bands/n)
    from raven_spark.operators.dedup import minhash_lsh_candidates

    union = spark.createDataFrame(b1 + b2, PAGE_DDL).withColumn(
        "doc_id", F.xxhash64("url")
    )
    batch_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            union, text_col="text", id_col="doc_id", k=16, bands=8
        ).collect()
    }
    assert pairs2 == batch_pairs
