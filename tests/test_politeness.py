"""Politeness budgets + robots gating: cap never exceeded, deferral
carry-over with boosted priority, robots precedence."""

from __future__ import annotations

from pyspark.sql import functions as F

from raven_spark.operators.politeness import ROBOTS_SCHEMA, robots_gate, schedule_budget
from raven_spark.plans.round import frontier_from_urls


def _frontier(spark, n_hosts=4, per_host=10):
    urls = [
        f"https://h{h}.example/p/{i}" for h in range(n_hosts) for i in range(per_host)
    ]
    return frontier_from_urls(spark, urls)


def test_budget_cap_never_exceeded(spark):
    f = _frontier(spark, n_hosts=3, per_host=20)
    scheduled, deferred = schedule_budget(f, host_budget=5)
    per_host = scheduled.groupBy("host").agg(F.count("*").alias("c")).collect()
    assert all(r["c"] <= 5 for r in per_host)
    assert scheduled.count() == 15 and deferred.count() == 45


def test_deferred_priority_boost_and_carryover(spark):
    f = _frontier(spark, n_hosts=1, per_host=7)
    scheduled, deferred = schedule_budget(f, host_budget=3)
    d = deferred.collect()
    assert len(d) == 4
    assert all(r["priority"] == 99 for r in d)  # boosted from 100
    assert all(r["deferred_count"] == 1 for r in d)
    # deferred rows re-enter and win scheduling next round (priority asc)
    s2, _ = schedule_budget(deferred, host_budget=10)
    assert s2.count() == 4


def test_scheduling_is_canonical_order(spark):
    """Within a host, lower priority then lower url_hash wins — the §2.1
    canonical crawl order, independent of input row order."""
    f = _frontier(spark, n_hosts=1, per_host=10)
    bump = f.withColumn(
        "priority", F.when(F.col("url").endswith("/7"), F.lit(1)).otherwise(F.col("priority"))
    )
    scheduled, _ = schedule_budget(bump.orderBy(F.rand(7)), host_budget=1)
    got = scheduled.collect()
    assert len(got) == 1 and got[0]["url"].endswith("/7")


def test_robots_gate(spark):
    f = _frontier(spark, n_hosts=3, per_host=4)  # hosts h0,h1,h2; paths /p/0..3
    robots = spark.createDataFrame(
        [
            ("h0.example", [], ["/"], 1, []),          # fully denied
            ("h1.example", ["/p/1"], ["/p"], 1, []),   # denied except /p/1 (longest allow wins)
        ],
        schema=ROBOTS_SCHEMA,
    )
    allowed, denied = robots_gate(f, robots)
    a = {(r["host"], r["url_canon"]) for r in allowed.collect()}
    d = {(r["host"], r["url_canon"]) for r in denied.collect()}
    assert all(h != "h0.example" for h, _ in a)
    assert sum(1 for h, _ in d if h == "h0.example") == 4
    # h1: only /p/1 allowed
    h1_allowed = {u for h, u in a if h == "h1.example"}
    assert h1_allowed == {"https://h1.example/p/1"}
    # h2 has no rules -> fully allowed
    assert sum(1 for h, _ in a if h == "h2.example") == 4


def test_effective_budget_null_crawl_delay_keeps_default(spark):
    """ADVICE r1: a host with a robots row but NULL crawl_delay_s must keep
    the configured default budget — not be silently capped at
    min(default, round_seconds) by greatest() skipping NULLs. Uses a
    default (500) ABOVE the 60s round constant to expose the cap."""
    from raven_spark.operators.politeness import effective_budget_col

    robots = spark.createDataFrame(
        [("h1", ["/a/"], ["/b/"], None), ("h2", [], [], 30)],
        "host string, allow array<string>, deny array<string>, crawl_delay_s int",
    )
    budgets = {r["host"]: r["host_budget"] for r in effective_budget_col(robots, 500).collect()}
    assert budgets["h1"] == 500  # no declared delay -> untouched default
    assert budgets["h2"] == 2    # 60s round / 30s delay


def test_fetch_robots_over_http_seam(spark):
    """fetch_robots: one request per distinct host through the injected
    opener; 200 parses rules, 404/timeouts/transport errors -> allow-all;
    crawl_delay round-trips as a nullable int."""
    from raven_spark.operators.politeness import fetch_robots, robots_flag

    ROBOTS = b"User-agent: *\nDisallow: /private/\nCrawl-delay: 7\n"

    def opener(url, method="GET", headers=None, body=None, timeout_s=1):
        if url == "https://h1.example/robots.txt":
            return 200, {}, ROBOTS, "text/plain"
        if url == "https://h2.example/robots.txt":
            return 404, {}, b"nope", "text/plain"
        raise TimeoutError("no route")

    hosts = spark.createDataFrame(
        [("h1.example",), ("h2.example",), ("h3.example",), ("h1.example",)],
        "host string",
    )
    rules = {r["host"]: r for r in fetch_robots(hosts, opener=opener).collect()}
    assert len(rules) == 3  # distinct hosts only
    assert rules["h1.example"]["deny"] == ["/private/"]
    assert rules["h1.example"]["crawl_delay_s"] == 7
    assert rules["h2.example"]["deny"] == [] and rules["h2.example"]["crawl_delay_s"] is None
    assert rules["h3.example"]["deny"] == []

    # the fetched rules drive the robots gate end-to-end
    cand = spark.createDataFrame(
        [("h1.example", "https://h1.example/private/x", 1),
         ("h1.example", "https://h1.example/p/ok", 2),
         ("h3.example", "https://h3.example/private/x", 3)],
        "host string, url_canon string, url_hash long",
    )
    flagged = {r["url_hash"]: r["robots_ok"]
               for r in robots_flag(cand, fetch_robots(hosts, opener=opener)).collect()}
    assert flagged == {1: False, 2: True, 3: True}


def test_robots_flag_rfc9309_wildcards(spark):
    """RFC 9309 §2.2.2/§5.1 wildcard vectors (also Google's published
    examples): '*' spans, trailing-'$' end anchor, literal mid-pattern
    '$', longest-raw-pattern precedence with allow on ties."""
    from raven_spark.operators.politeness import robots_flag

    cases = [
        # (allow, deny, path, expected robots_ok)
        ([], ["/fish*"], "/fish", False),
        ([], ["/fish*"], "/fishheads/yummy.html", False),
        ([], ["/fish*"], "/Fish.asp", True),
        ([], ["/fish*"], "/desert/fish", True),
        ([], ["/*.php"], "/folder/filename.php", False),
        ([], ["/*.php"], "/", True),
        ([], ["/*.php"], "/windows.PHP", True),
        ([], ["/*.php$"], "/filename.php", False),
        ([], ["/*.php$"], "/filename.php?parameters", True),
        ([], ["/*.php$"], "/filename.php5", True),
        ([], ["/fish*.php"], "/fishheads/catfish.php?parameters", False),
        (["/p"], ["/"], "/page", True),          # longest match wins
        (["/folder"], ["/folder"], "/folder/page", True),  # tie -> allow
        (["/page"], ["/*.htm"], "/page.htm", False),       # 6 > 5 -> deny
        (["/$"], ["/"], "/", True),
        (["/$"], ["/"], "/page", False),
        ([], ["/a$b"], "/a$b/x", False),         # mid-pattern '$' literal
        ([], ["/a$b"], "/ab", True),
    ]
    for allow, deny, path, want in cases:
        rules = spark.createDataFrame(
            [("h.example", allow, deny, None)],
            "host string, allow array<string>, deny array<string>,"
            " crawl_delay_s int",
        )
        cand = spark.createDataFrame(
            [(f"https://h.example{path}", "h.example")],
            "url_canon string, host string",
        )
        got = robots_flag(cand, rules).first()["robots_ok"]
        assert got is want, (allow, deny, path, got, want)


def test_fetch_robots_truncation_drops_partial_final_line(spark):
    """RFC 9309 §2.4: content past the size cap is IGNORED — a rule cut
    mid-value must not parse as a different, shorter rule ('Disallow:
    /private-archive' cut to 'Disallow: /p' would deny half the site)."""
    from raven_spark.operators.politeness import fetch_robots

    robots = b"User-agent: *\nDisallow: /secret/\nDisallow: /private-archive\n"
    cap = robots.index(b"/private-archive") + 2  # cuts to 'Disallow: /p'

    def opener(url, method="GET", headers=None, body=None, timeout_s=1, **kw):
        return 200, {}, robots, "text/plain"

    hosts = spark.createDataFrame([("h.example",)], "host string")
    rules = fetch_robots(hosts, opener=opener, max_bytes=cap).first()
    assert rules["deny"] == ["/secret/"]  # complete line kept, cut line dropped
