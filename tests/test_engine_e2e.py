"""End-to-end engine: multi-round crawl over the synthetic corpus with
dedup, politeness, metrics, checkpoint/resume, and determinism."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from raven_spark.config import RavenConfig, RavenRequest
from raven_spark.engine import CrawlEngine, EngineOptions
from raven_spark.operators.fetch import SyntheticFetcher
from raven_spark.sources.corpus import generate_pages, seed_urls

N_PAGES = 300


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_pages(spark, N_PAGES, seed=42).persist()


def _engine(spark, corpus, tmp, budget=50, rounds=3):
    cfg = RavenConfig(
        name="e2e",
        request=RavenRequest(url="https://ignored/", max_retry=1),
        host_budget_per_round=budget,
        max_rounds=rounds,
    )
    return CrawlEngine(
        spark, cfg, tmp, SyntheticFetcher(corpus, seed=42),
        options=EngineOptions(expected_total_urls=4096, shuffle_partitions=8),
    )


def test_multi_round_crawl(spark, corpus, tmp_path):
    eng = _engine(spark, corpus, str(tmp_path / "s1"))
    stats = eng.run(seed_urls=seed_urls(10, N_PAGES), max_rounds=3)
    assert len(stats) >= 2
    assert stats[0]["tasks"] == 10
    assert stats[1]["tasks"] > 0  # outlinks discovered new frontier

    # no url fetched twice across rounds
    pages = eng.table("pages")
    dupes = (
        pages.groupBy("url_hash").agg(F.count("*").alias("c")).filter(F.col("c") > 1).count()
    )
    assert dupes == 0

    # url_seen equals scheduled set
    seen = eng.table("url_seen")
    assert seen.select("url_hash").distinct().count() == seen.count()

    # extracted text matches corpus golden bytes for every success
    text = eng.table("text").drop("round")
    joined = text.alias("t").join(corpus.alias("c"), F.col("t.url") == F.col("c.url"))
    assert joined.filter(F.col("t.text") != F.col("c.text")).count() == 0

    # metrics rows exist per round with lineage columns
    metrics = eng.table("metrics")
    assert metrics.filter(F.col("result_code") == 200).count() > 0
    assert {"partition_id", "round", "result_code"} <= set(metrics.columns)


def test_sharded_bloom_run_equals_monolithic(spark, corpus, tmp_path):
    """A full multi-round crawl with the sharded seen-filter (catalog
    table + cogroup probe) must produce byte-identical crawl state to the
    monolithic broadcast filter — sharding changes WHERE bitmap bytes
    live, never which URLs are fetched."""
    seeds = seed_urls(10, N_PAGES)
    mono = _engine(spark, corpus, str(tmp_path / "mono"))
    mono.run(seed_urls=seeds, max_rounds=3)

    cfg = RavenConfig(
        name="e2e",
        request=RavenRequest(url="https://ignored/", max_retry=1),
        host_budget_per_round=50,
        max_rounds=3,
    )
    sharded = CrawlEngine(
        spark, cfg, str(tmp_path / "shard"), SyntheticFetcher(corpus, seed=42),
        options=EngineOptions(
            expected_total_urls=4096, shuffle_partitions=8, bloom_shards=8
        ),
    )
    sharded.run(seed_urls=seeds, max_rounds=3)

    for table in ("url_seen", "pages", "text"):
        a, b = mono.table(table), sharded.table(table)
        key = "url" if table == "text" else "url_hash"
        assert a.count() == b.count(), table
        assert a.select(key).exceptAll(b.select(key)).count() == 0, table
    # the sharded run wrote a bloom TABLE, not driver-side sidecars
    assert sharded.table("bloom") is not None
    assert sharded.catalog.read_blob("url_seen/round=0/_bloom.bin") is None


def test_sharded_cuckoo_run_equals_monolithic(spark, corpus, tmp_path):
    """seen_filter="cuckoo" (deletable shard table) must crawl the exact
    same URL set as the monolithic Bloom run — the filter family changes
    the maintenance story (TTL deletes), never membership answers for
    inserted keys (both are no-false-negative + exact-anti-join-backed)."""
    seeds = seed_urls(10, N_PAGES)
    mono = _engine(spark, corpus, str(tmp_path / "mono"))
    mono.run(seed_urls=seeds, max_rounds=3)

    cfg = RavenConfig(
        name="e2e",
        request=RavenRequest(url="https://ignored/", max_retry=1),
        host_budget_per_round=50,
        max_rounds=3,
    )
    cuckoo = CrawlEngine(
        spark, cfg, str(tmp_path / "cuckoo"), SyntheticFetcher(corpus, seed=42),
        options=EngineOptions(
            expected_total_urls=4096, shuffle_partitions=8, bloom_shards=8,
            seen_filter="cuckoo",
        ),
    )
    cuckoo.run(seed_urls=seeds, max_rounds=3)

    for table in ("url_seen", "pages", "text"):
        a, b = mono.table(table), cuckoo.table(table)
        key = "url" if table == "text" else "url_hash"
        assert a.count() == b.count(), table
        assert a.select(key).exceptAll(b.select(key)).count() == 0, table
    # the cuckoo run wrote a cuckoo TABLE; no bloom table, no sidecars
    assert cuckoo.table("cuckoo") is not None
    assert cuckoo.table("bloom") is None
    assert cuckoo.catalog.read_blob("url_seen/round=0/_bloom.bin") is None


def test_politeness_cap_holds_every_round(spark, corpus, tmp_path):
    eng = _engine(spark, corpus, str(tmp_path / "s2"), budget=3, rounds=2)
    eng.run(seed_urls=seed_urls(30, N_PAGES), max_rounds=2)
    pages = eng.table("pages")
    per = pages.groupBy("round", "host").agg(F.count("*").alias("c")).collect()
    assert all(r["c"] <= 3 for r in per)


def test_resume_is_exact(spark, corpus, tmp_path):
    """Kill after round 0; resume; final state equals an uninterrupted run."""
    full_dir, part_dir = str(tmp_path / "full"), str(tmp_path / "part")
    seeds = seed_urls(10, N_PAGES)

    full = _engine(spark, corpus, full_dir)
    full.run(seed_urls=seeds, max_rounds=3)

    part = _engine(spark, corpus, part_dir)
    part.run(seed_urls=seeds, max_rounds=1)  # "crash" after round 0
    part2 = _engine(spark, corpus, part_dir)
    assert part2.last_completed_round() == 0
    part2.resume(max_rounds=3)

    for table in ("pages", "url_seen", "text"):
        a = full.table(table)
        b = part2.table(table)
        key = "url_hash" if table != "text" else "url"
        assert sorted(r[key] for r in a.select(key).collect()) == sorted(
            r[key] for r in b.select(key).collect()
        ), table


def test_compaction_preserves_state_and_resume(spark, corpus, tmp_path):
    """compact_every=1 (segments merged mid-run every round): final
    pages/url_seen/text state is identical to the uncompacted run, the
    per-round delta dirs really are merged, and resume after a 'crash'
    still lands on the same state with compaction enabled."""
    import os

    seeds = seed_urls(10, N_PAGES)
    plain = _engine(spark, corpus, str(tmp_path / "plain"))
    plain.run(seed_urls=seeds, max_rounds=3)

    def _compacting(d):
        cfg = RavenConfig(
            name="e2e",
            request=RavenRequest(url="https://ignored/", max_retry=1),
            host_budget_per_round=50,
            max_rounds=3,
        )
        return CrawlEngine(
            spark, cfg, d, SyntheticFetcher(corpus, seed=42),
            options=EngineOptions(
                expected_total_urls=4096, shuffle_partitions=8, compact_every=1
            ),
        )

    comp = _compacting(str(tmp_path / "comp"))
    comp.run(seed_urls=seeds, max_rounds=3)
    for table in ("pages", "url_seen", "text"):
        key = "url_hash" if table != "text" else "url"
        a = sorted(r[key] for r in plain.table(table).select(key).collect())
        b = sorted(r[key] for r in comp.table(table).select(key).collect())
        assert a == b, table
    # the url_seen history is physically one segment + at most the last
    # round's delta dir
    seen_dir = str(tmp_path / "comp" / "url_seen")
    round_dirs = [d for d in os.listdir(seen_dir) if d.startswith("round=")]
    seg_dirs = [d for d in os.listdir(seen_dir) if d.startswith("segment_")]
    assert len(seg_dirs) == 1 and len(round_dirs) <= 1, (round_dirs, seg_dirs)

    # crash after round 1 (compaction already ran), resume to completion
    part = _compacting(str(tmp_path / "part"))
    part.run(seed_urls=seeds, max_rounds=2)
    part2 = _compacting(str(tmp_path / "part"))
    assert part2.last_completed_round() == 1
    part2.resume(max_rounds=3)
    for table in ("pages", "url_seen", "text"):
        key = "url_hash" if table != "text" else "url"
        a = sorted(r[key] for r in plain.table(table).select(key).collect())
        b = sorted(r[key] for r in part2.table(table).select(key).collect())
        assert a == b, table


def test_compaction_with_ttl_window_reads(spark, corpus, tmp_path):
    """TTL windows slice COMPACTED history row-exactly: the seen_ttl run
    with compact_every=1 refetches exactly like the uncompacted TTL run
    (from_round boundaries fall mid-segment and must still apply)."""
    seeds = seed_urls(10, N_PAGES)

    def run(d, compact_every):
        cfg = RavenConfig(
            name="e2e",
            request=RavenRequest(url="https://ignored/", max_retry=1),
            host_budget_per_round=50,
            max_rounds=4,
        )
        eng = CrawlEngine(
            spark, cfg, d, SyntheticFetcher(corpus, seed=42),
            options=EngineOptions(
                expected_total_urls=4096, shuffle_partitions=8,
                seen_ttl_rounds=1, compact_every=compact_every,
            ),
        )
        eng.run(seed_urls=seeds, max_rounds=4)
        return sorted(
            (r["url_hash"], r["round"])
            for r in eng.table("pages").select("url_hash", "round").collect()
        )

    assert run(str(tmp_path / "nc"), None) == run(str(tmp_path / "cc"), 1)


def test_long_horizon_compaction_100_rounds(spark, corpus, tmp_path):
    """The 10^4-round resumability story at test scale (VERDICT r4 item
    4): a 100-round crawl with SMALL per-round deltas (host budget 1)
    and compaction every 10 rounds must (a) finish with byte-identical
    pages/url_seen/text state to the uncompacted run, (b) keep the
    on-disk url_seen history bounded — one merged segment plus at most
    compact_every round-delta dirs at any time, so per-round listing
    cost is O(compact_every), not O(rounds) — and (c) actually sustain
    a long horizon (>= 60 completed rounds before the frontier dries)."""
    import os

    seeds = seed_urls(10, N_PAGES)

    def run(d, compact_every):
        cfg = RavenConfig(
            name="e2e",
            request=RavenRequest(url="https://ignored/", max_retry=1),
            host_budget_per_round=1,
            max_rounds=100,
        )
        eng = CrawlEngine(
            spark, cfg, d, SyntheticFetcher(corpus, seed=42),
            options=EngineOptions(
                expected_total_urls=4096, shuffle_partitions=8,
                compact_every=compact_every,
            ),
        )
        stats = eng.run(seed_urls=seeds, max_rounds=100)
        return eng, stats

    plain, pstats = run(str(tmp_path / "plain"), None)
    comp, cstats = run(str(tmp_path / "comp"), 10)
    assert len(cstats) >= 60, len(cstats)
    assert len(cstats) == len(pstats)
    for table in ("pages", "url_seen", "text"):
        key = "url_hash" if table != "text" else "url"
        a = sorted(r[key] for r in plain.table(table).select(key).collect())
        b = sorted(r[key] for r in comp.table(table).select(key).collect())
        assert a == b, table
    # bounded listing: one merged segment + <= compact_every deltas
    seen_dir = str(tmp_path / "comp" / "url_seen")
    round_dirs = [d for d in os.listdir(seen_dir) if d.startswith("round=")]
    seg_dirs = [d for d in os.listdir(seen_dir) if d.startswith("segment_")]
    assert len(seg_dirs) == 1, seg_dirs
    assert len(round_dirs) <= 10, len(round_dirs)
    # the uncompacted twin really does pay O(rounds) listing — the
    # thing compaction exists to bound
    plain_rounds = [
        d
        for d in os.listdir(str(tmp_path / "plain" / "url_seen"))
        if d.startswith("round=")
    ]
    assert len(plain_rounds) == len(pstats)


def test_crawl_order_deterministic(spark, corpus, tmp_path):
    """The defined canonical order (round, priority, host_hash, host_rank)
    is identical across two independent runs."""
    def run(d):
        eng = _engine(spark, corpus, d)
        eng.run(seed_urls=seed_urls(10, N_PAGES), max_rounds=2)
        return [
            (r["round"], r["url_canon"])
            for r in eng.table("pages")
            .orderBy("round", "priority", "host_hash", "host_rank", "url_canon")
            .select("round", "url_canon")
            .collect()
        ]

    assert run(str(tmp_path / "a")) == run(str(tmp_path / "b"))


def test_seen_ttl_recrawl(spark, corpus, tmp_path):
    """Recrawl TTL: with seen_ttl_rounds=1, a capture only blocks the
    NEXT round; pages re-discovered after expiry are fetched again. The
    baseline (no TTL) fetches every url_hash exactly once; the TTL run
    must re-fetch at least one, and never inside its TTL window."""
    seeds = seed_urls(10, N_PAGES)
    base = _engine(spark, corpus, str(tmp_path / "nottl"), rounds=4)
    base.run(seed_urls=seeds, max_rounds=4)
    once = base.table("pages").groupBy("url_hash").count()
    assert once.filter("count > 1").count() == 0

    cfg = RavenConfig(
        name="e2e",
        request=RavenRequest(url="https://ignored/", max_retry=1),
        host_budget_per_round=50,
        max_rounds=4,
    )
    ttl_eng = CrawlEngine(
        spark, cfg, str(tmp_path / "ttl"), SyntheticFetcher(corpus, seed=42),
        options=EngineOptions(
            expected_total_urls=4096, shuffle_partitions=8, seen_ttl_rounds=1
        ),
    )
    ttl_eng.run(seed_urls=seeds, max_rounds=4)
    pages = ttl_eng.table("pages").select("url_hash", "round")
    refetched = (
        pages.groupBy("url_hash")
        .agg(F.count("*").alias("n"), F.collect_list("round").alias("rounds"))
        .filter("n > 1")
        .collect()
    )
    assert len(refetched) > 0  # expiry actually reopens URLs
    for r in refetched:
        rs = sorted(r["rounds"])
        # no refetch inside the TTL window: consecutive fetches of the
        # same URL are at least ttl+1 = 2 rounds apart
        assert all(b - a >= 2 for a, b in zip(rs, rs[1:])), rs

    # a TTL wider than the run is identical to no TTL at all
    wide = CrawlEngine(
        spark, cfg, str(tmp_path / "wide"), SyntheticFetcher(corpus, seed=42),
        options=EngineOptions(
            expected_total_urls=4096, shuffle_partitions=8, seen_ttl_rounds=10
        ),
    )
    wide.run(seed_urls=seeds, max_rounds=4)
    a, b = base.table("pages"), wide.table("pages")
    assert a.count() == b.count()
    assert a.select("url_hash").exceptAll(b.select("url_hash")).count() == 0
