"""Engine-level robots gating + crawl-delay budget override: rules parsed
from raw robots.txt flow through robots_rules_df -> CrawlEngine ->
denied-url recording and per-host budget caps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raven_spark.config import RavenConfig, RavenRequest
from raven_spark.engine import CrawlEngine, EngineOptions
from raven_spark.operators.fetch import SyntheticFetcher
from raven_spark.operators.politeness import robots_rules_df
from raven_spark.sources.corpus import generate_pages, seed_urls

N = 300


def test_robots_deny_and_crawl_delay(spark, tmp_path):
    corpus = generate_pages(spark, N, seed=42).persist()
    hosts = [r["host"] for r in corpus.select("host").distinct().collect()]
    hot = sorted(hosts)[0]
    robots_texts = spark.createDataFrame(
        [(hot, "User-agent: *\nDisallow: /p/\nCrawl-delay: 30")]
        + [(h, "User-agent: *\nDisallow:") for h in hosts if h != hot],
        "host string, robots_txt string",
    )
    robots = robots_rules_df(robots_texts)

    cfg = RavenConfig(
        name="robots-e2e",
        request=RavenRequest(url="https://ignored/", max_retry=1),
        host_budget_per_round=50,
        max_rounds=2,
    )
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "s"), SyntheticFetcher(corpus, seed=42),
        robots=robots,
        options=EngineOptions(expected_total_urls=4096, shuffle_partitions=8),
    )
    eng.run(seed_urls=seed_urls(40, N), max_rounds=2)

    pages = eng.table("pages")
    # the denied host is never fetched (its /p/ paths are disallowed)
    assert pages.filter(F.col("host") == hot).count() == 0
    # but its urls ARE recorded as seen (never re-candidates)
    seen = eng.table("url_seen")
    frontier = eng.table("frontier")
    hot_candidates = frontier.filter(F.col("host") == hot).select("url_hash").distinct()
    hot_seen = seen.join(hot_candidates, "url_hash").count()
    assert hot_seen > 0

    # crawl_delay 30s -> effective budget floor: min(50, 60/30)=2 would cap
    # at 2/round had any url been allowed; verify via the budget table
    from raven_spark.operators.politeness import effective_budget_col

    budgets = {r["host"]: r["host_budget"]
               for r in effective_budget_col(robots, 50).collect()}
    assert budgets[hot] == 2
    assert all(b == 50 for h, b in budgets.items() if h != hot)
    corpus.unpersist()


def test_budget_cap_enforced_per_round(spark, tmp_path):
    corpus = generate_pages(spark, N, seed=42).persist()
    cfg = RavenConfig(
        name="budget-e2e",
        request=RavenRequest(url="https://ignored/", max_retry=1),
        host_budget_per_round=3,
        max_rounds=2,
    )
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "s2"), SyntheticFetcher(corpus, seed=42),
        options=EngineOptions(expected_total_urls=4096, shuffle_partitions=8),
    )
    eng.run(seed_urls=seed_urls(60, N), max_rounds=2)
    per = (
        eng.table("pages").groupBy("round", "host").agg(F.count("*").alias("c")).collect()
    )
    assert per and max(r["c"] for r in per) <= 3
    corpus.unpersist()


def test_robots_refreshed_for_discovered_hosts(spark, tmp_path):
    """Hosts reached via link discovery (absent from the seed list) must
    get their robots.txt consulted BEFORE being scheduled — the r2 CLI
    only fetched rules for round-0 hosts and default-allowed the rest.
    Fetcher policy here: allow seed hosts, deny everything discovered;
    therefore no non-seed host may ever be fetched."""
    from urllib.parse import urlsplit

    corpus = generate_pages(spark, N, seed=42).persist()
    seeds = seed_urls(10, N)
    seed_hosts = {urlsplit(u).hostname for u in seeds}
    calls: list[list[str]] = []

    def robots_fetcher(hosts_df):
        hosts = sorted(r["host"] for r in hosts_df.collect())
        calls.append(hosts)
        texts = spark.createDataFrame(
            [(h, "User-agent: *\nDisallow:" if h in seed_hosts
              else "User-agent: *\nDisallow: /") for h in hosts],
            "host string, robots_txt string",
        )
        return robots_rules_df(texts)

    cfg = RavenConfig(
        name="robots-refresh",
        request=RavenRequest(url="https://ignored/", max_retry=1),
        host_budget_per_round=50,
        max_rounds=3,
    )
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "rr"), SyntheticFetcher(corpus, seed=42),
        options=EngineOptions(
            expected_total_urls=4096, shuffle_partitions=8,
            robots_fetcher=robots_fetcher,
        ),
    )
    eng.run(seed_urls=seeds, max_rounds=3)

    # round 0 fetched exactly the seed hosts' rules
    assert calls[0] == sorted(seed_hosts)
    # later rounds fetched rules for newly discovered hosts only
    discovered_calls = [h for c in calls[1:] for h in c]
    assert discovered_calls and not (set(discovered_calls) & seed_hosts)
    # a host's rules are fetched at most once across the whole crawl
    flat = [h for c in calls for h in c]
    assert len(flat) == len(set(flat))
    # deny-all rules on discovered hosts were honored: nothing non-seed
    # was ever fetched, though discovery DID reach non-seed hosts
    fetched_hosts = {r["host"] for r in eng.table("pages").select("host").distinct().collect()}
    assert fetched_hosts <= seed_hosts
    frontier_hosts = {r["host"] for r in eng.table("frontier").select("host").distinct().collect()}
    assert frontier_hosts - seed_hosts
    corpus.unpersist()


def test_notify_summary(spark, tmp_path):
    corpus = generate_pages(spark, 100, seed=42).persist()
    got = {}

    def notify(message, summary):
        got["message"], got["summary"] = message, summary

    cfg = RavenConfig(
        name="notify-e2e",
        request=RavenRequest(url="https://ignored/", max_retry=1),
        host_budget_per_round=50,
        max_rounds=1,
    )
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "s3"), SyntheticFetcher(corpus, seed=42),
        options=EngineOptions(expected_total_urls=1024, shuffle_partitions=4, notify=notify),
    )
    stats = eng.run(seed_urls=seed_urls(15, 100), max_rounds=1)
    assert got["summary"]["tasks"] == sum(s["tasks"] for s in stats)
    assert "[notify-e2e] finished crawling" in got["message"]
    corpus.unpersist()


def test_notify_level_filtering(spark, tmp_path):
    """Config-declared notify methods fire only for events of their OWN
    level (exact match, instances.rs:93-100): an info method sees the
    completion, an error method sees only aborts."""
    from raven_spark.config import parse_config

    cfg = parse_config("""
name: levels-e2e
request:
  url: "https://ignored/"
notify:
  - slack:
      url: "https://hooks.invalid/a"
      channel: "#ok"
      level: info
  - slack:
      url: "https://hooks.invalid/b"
      channel: "#alerts"
      mention: "@here"
      level: error
host_budget_per_round: 50
max_rounds: 1
""")
    assert [m.level for m in cfg.notify_methods] == ["info", "error"]
    assert cfg.notify_methods[1].mention == "@here"

    corpus = generate_pages(spark, 100, seed=42).persist()
    posted = []

    def poster(method, level, label, message):
        posted.append((method.channel, level, label))

    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "lv"), SyntheticFetcher(corpus, seed=42),
        options=EngineOptions(
            expected_total_urls=1024, shuffle_partitions=4, notify_poster=poster
        ),
    )
    eng.run(seed_urls=seed_urls(10, 100), max_rounds=1)
    # clean completion: only the info-level method fired
    assert posted == [("#ok", "info", "raven command is completed.")]

    # abort path: all sinks failing raises -> only the error method fires
    posted.clear()
    eng2 = CrawlEngine(
        spark, cfg, str(tmp_path / "lv2"), SyntheticFetcher(corpus, seed=42),
        options=EngineOptions(
            expected_total_urls=1024, shuffle_partitions=4, notify_poster=poster
        ),
    )
    eng2.bootstrap(seed_urls(10, 100))

    def boom(*a, **k):
        raise RuntimeError("sink down")

    eng2.catalog.append = boom
    with pytest.raises(RuntimeError):
        eng2.run(max_rounds=1)
    assert len(posted) == 1
    chan, level, label = posted[0]
    assert (chan, level) == ("#alerts", "error") and "aborted" in label
    corpus.unpersist()


def test_notify_bad_level_rejected():
    from raven_spark.config import ConfigError, parse_config

    with pytest.raises(ConfigError):
        parse_config("""
name: bad
request: {url: "https://x/"}
notify:
  - slack: {url: "https://h/", channel: "#c", level: loud}
""")


def test_ttl_recrawl_revalidates_with_304(spark, tmp_path):
    """Full recrawl loop: seen_ttl_rounds reopens URLs; revalidate=True
    sends the stored ETag; the server answers 304; the pages table
    records a not_modified capture with no body and the text table keeps
    exactly one (original) row per URL."""
    from raven_spark.config import RavenConfig, RavenRequest
    from raven_spark.engine import CrawlEngine, EngineOptions
    from raven_spark.operators.http import HttpFetcher
    from pyspark.sql import functions as F

    def opener(url, method="GET", headers=None, body=None, timeout_s=1):
        h = headers or {}
        i = int(url.rstrip("/").rsplit("/", 1)[1])
        if h.get("If-None-Match") == f'W/"v{i}"':
            return 304, {"ETag": f'W/"v{i}"'}, b"", None
        nxt1, nxt2 = (i + 1) % 3, (i + 2) % 3
        body_html = (
            f'<p>page {i} body</p>'
            f'<a href="https://h.example/p/{nxt1}">n1</a>'
            f'<a href="https://h.example/p/{nxt2}">n2</a>'
        )
        return 200, {"ETag": f'W/"v{i}"', "Content-Type": "text/html; charset=utf-8"}, \
            body_html.encode(), "text/html; charset=utf-8"

    cfg = RavenConfig(
        name="reval",
        request=RavenRequest(url="https://h.example/p/0", max_retry=0),
        host_budget_per_round=10, max_rounds=4,
    )
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "s"), HttpFetcher(opener=opener),
        options=EngineOptions(
            expected_total_urls=1024, shuffle_partitions=4,
            seen_ttl_rounds=1, revalidate=True,
        ),
    )
    eng.run(seed_urls=["https://h.example/p/0"], max_rounds=4)
    pages = eng.table("pages")
    codes = {(r["url_canon"], r["round"]): r["result_code"] for r in pages.collect()}
    n304 = sum(1 for c in codes.values() if c == 304)
    n200 = sum(1 for c in codes.values() if c == 200)
    assert n304 > 0, codes           # at least one TTL refetch revalidated
    assert n200 >= 3                  # all three pages fetched fresh once
    # 304 captures carry no body and never overwrite text
    empt = pages.filter("result_code = 304").filter(
        F.length(F.coalesce(F.col("html"), F.lit(b""))) > 0).count()
    assert empt == 0
    text = eng.table("text")
    assert text.select("url").distinct().count() == text.count() == 3


def test_prefetched_robots_not_duplicated_on_resume_after_compaction(spark, tmp_path):
    """Resume re-constructs the engine with the same prefetched rules; the
    robots table on disk is authoritative (round 0 may already be folded
    into a compacted segment, where a blind re-append would duplicate
    every rule row and double the budget-join fan-out)."""
    corpus = generate_pages(spark, N, seed=42).persist()
    hosts = [r["host"] for r in corpus.select("host").distinct().collect()]
    texts = spark.createDataFrame(
        [(h, "User-agent: *\nDisallow:") for h in hosts],
        "host string, robots_txt string",
    )

    cfg = RavenConfig(
        name="robots-resume",
        request=RavenRequest(url="https://ignored/", max_retry=1),
        host_budget_per_round=50,
        max_rounds=3,
    )

    def _eng():
        return CrawlEngine(
            spark, cfg, str(tmp_path / "s"), SyntheticFetcher(corpus, seed=42),
            robots=robots_rules_df(texts),
            options=EngineOptions(
                expected_total_urls=4096, shuffle_partitions=8, compact_every=1
            ),
        )

    eng = _eng()
    eng.run(seed_urls=seed_urls(20, N), max_rounds=2)
    before = eng.table("robots").groupBy("host").count()
    assert before.filter(F.col("count") > 1).count() == 0

    eng2 = _eng()  # resume: compaction already folded robots round 0
    after = eng2.table("robots").groupBy("host").count()
    assert after.filter(F.col("count") > 1).count() == 0
    assert after.count() == before.count()
    eng2.resume(max_rounds=3)
    final = eng2.table("robots").groupBy("host").count()
    assert final.filter(F.col("count") > 1).count() == 0
    corpus.unpersist()


def test_robots_refresh_skips_rounds_with_no_new_hosts(spark, tmp_path):
    """Regression (code-review r4): once every reachable host has rules,
    later rounds must neither invoke the fetch pipeline nor append an
    empty robots delta — a 10^4-round steady-state crawl would otherwise
    accumulate 10^4 empty round dirs that every later read re-lists."""
    corpus = generate_pages(spark, N, seed=42).persist()
    all_hosts = [r["host"] for r in corpus.select("host").distinct().collect()]
    calls: list[int] = []

    def robots_fetcher(hosts_df):
        hosts = [r["host"] for r in hosts_df.collect()]
        calls.append(len(hosts))
        texts = spark.createDataFrame(
            [(h, "User-agent: *\nDisallow:") for h in hosts],
            "host string, robots_txt string",
        )
        return robots_rules_df(texts)

    cfg = RavenConfig(
        name="robots-steady",
        request=RavenRequest(url="https://ignored/", max_retry=1),
        host_budget_per_round=500,
        max_rounds=4,
    )
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "rs"), SyntheticFetcher(corpus, seed=42),
        options=EngineOptions(
            expected_total_urls=4096, shuffle_partitions=8,
            robots_fetcher=robots_fetcher,
        ),
    )
    # generous budget: every host is discovered and fully ruled quickly,
    # so at least the last round runs with zero new hosts
    eng.run(seed_urls=seed_urls(60, N), max_rounds=4)

    manifest_rounds = eng.catalog._load_manifest("robots")["rounds"]
    # every recorded delta is non-empty...
    for r in manifest_rounds:
        delta = eng.catalog.read("robots", upto_round=r, from_round=r)
        assert delta is not None and delta.count() > 0, f"empty robots delta r{r}"
    # ...and once all hosts are known, rounds stop appending entirely:
    # with every corpus host ruled, the final rounds add no manifest entry
    assert len(manifest_rounds) < 5  # 4 rounds + prefetch slot would be 5
    assert sum(calls) <= len(all_hosts)
    corpus.unpersist()
