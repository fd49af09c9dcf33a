"""Sitemap ingestion: loc extraction, index vs urlset, entity unescape,
identity plumbing into the frontier, robots Sitemap pointers."""

from __future__ import annotations

from pyspark.sql import functions as F

from raven_spark.operators.sitemaps import (
    robots_sitemap_urls,
    sitemap_frontier,
    sitemap_locs,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.example/p/1</loc><lastmod>2026-01-01</lastmod></url>
  <url><loc>
      https://a.example/p/2?x=1&amp;y=2
  </loc><priority>0.5</priority></url>
  <url><changefreq>daily</changefreq></url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.example/sitemap-1.xml</loc></sitemap>
  <sitemap><loc>https://a.example/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


def test_sitemap_locs(spark):
    df = spark.createDataFrame(
        [("https://a.example/sitemap.xml", URLSET),
         ("https://a.example/sitemap_index.xml", INDEX)],
        "url string, body string",
    )
    rows = sitemap_locs(df).collect()
    got = {(r["kind"], r["loc"]) for r in rows}
    assert got == {
        ("urlset", "https://a.example/p/1"),
        ("urlset", "https://a.example/p/2?x=1&y=2"),   # trimmed + unescaped
        ("sitemapindex", "https://a.example/sitemap-1.xml"),
        ("sitemapindex", "https://a.example/sitemap-2.xml"),
    }
    # the <url> entry without a <loc> contributes nothing
    assert len(rows) == 4


def test_sitemap_frontier_identity(spark):
    df = spark.createDataFrame(
        [("https://a.example/sitemap.xml", URLSET),
         ("https://a.example/sitemap_index.xml", INDEX)],
        "url string, body string",
    )
    fr = sitemap_frontier(df)
    rows = fr.collect()
    assert len(rows) == 2  # index locs excluded
    assert {"url_canon", "url_hash", "host", "salt_bucket"} <= set(fr.columns)
    assert all(r["host"] == "a.example" for r in rows)


def test_robots_sitemap_urls():
    txt = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: https://a.example/sitemap.xml\n"
        "User-agent: raven\n"
        "sitemap: https://a.example/other.xml  # comment\n"
        "Sitemap:\n"
    )
    assert robots_sitemap_urls(txt) == [
        "https://a.example/sitemap.xml",
        "https://a.example/other.xml",
    ]
    assert robots_sitemap_urls(None) == []


INDEX_BODY = (
    '<sitemapindex><sitemap><loc>https://a.example/sm-1.xml</loc></sitemap>'
    '<sitemap><loc>https://a.example/sm-404.xml</loc></sitemap></sitemapindex>'
)
CHILD_BODY = (
    '<urlset><url><loc>https://a.example/deep/1</loc></url>'
    '<url><loc>https://a.example/deep/2</loc></url></urlset>'
)
FLAT_BODY = '<urlset><url><loc>https://b.example/top</loc></url></urlset>'

def _make_opener():
    # closure (cloudpickle-by-value): module-level funcs don't import on workers
    server = {
        "https://a.example/sitemap_index.xml": INDEX_BODY,
        "https://a.example/sm-1.xml": CHILD_BODY,
        "https://b.example/sitemap.xml": FLAT_BODY,
    }

    def opener(url, method="GET", headers=None, body=None, timeout_s=5):
        if url in server:
            return 200, {}, server[url].encode(), "application/xml"
        return 404, {}, b"", "text/plain"

    return opener


def test_fetch_sitemaps_seam(spark):
    urls = spark.createDataFrame(
        [("https://a.example/sm-1.xml",), ("https://a.example/sm-404.xml",)],
        "url string",
    )
    got = {r["url"]: r["body"] for r in
           __import__("raven_spark.operators.sitemaps", fromlist=["fetch_sitemaps"])
           .fetch_sitemaps(urls, opener=_make_opener()).collect()}
    assert got["https://a.example/sm-1.xml"] == CHILD_BODY
    assert got["https://a.example/sm-404.xml"] == ""  # non-200 -> no locs


def test_discover_sitemap_pages_follows_one_index_level(spark):
    from raven_spark.operators.sitemaps import discover_sitemap_pages

    pointers = spark.createDataFrame(
        [("https://a.example/sitemap_index.xml",), ("https://b.example/sitemap.xml",)],
        "url string",
    )
    pages = discover_sitemap_pages(pointers, opener=_make_opener())
    got = {r["url_canon"] for r in pages.collect()}
    assert got == {
        "https://a.example/deep/1",
        "https://a.example/deep/2",
        "https://b.example/top",
    }


def test_bootstrap_extra_urls_seed_round0(spark, tmp_path):
    """Sitemap-declared pages union into frontier round 0 next to the
    config-expanded tasks (request fields null -> stage defaults)."""
    from raven_spark.config import RavenConfig, RavenRequest
    from raven_spark.engine import CrawlEngine, EngineOptions
    from raven_spark.operators.fetch import SyntheticFetcher
    from raven_spark.sources.corpus import generate_pages

    corpus = generate_pages(spark, 50, seed=3)
    cfg = RavenConfig(
        name="sm",
        request=RavenRequest(url="https://h0.example/p/0", max_retry=1),
        host_budget_per_round=50, max_rounds=1,
    )
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "s"), SyntheticFetcher(corpus, seed=3),
        options=EngineOptions(expected_total_urls=1024, shuffle_partitions=4),
    )
    f0 = eng.bootstrap_from_config(
        extra_urls=["https://h1.example/p/7", "https://h2.example/p/9"]
    )
    urls = {r["url_canon"] for r in f0.select("url_canon").collect()}
    assert {"https://h1.example/p/7", "https://h2.example/p/9"} <= urls
    assert "https://h0.example/p/0" in urls
    stored = eng.catalog.read("frontier", upto_round=0)
    assert stored.count() == 3


def test_discover_fetches_each_sitemap_once(spark, tmp_path):
    """Regression (code-review r3): the lazy fetch subtree sat under both
    union branches, fetching every parent sitemap twice. Each URL must be
    fetched exactly once per discover call."""
    import os
    import uuid

    from raven_spark.operators.sitemaps import discover_sitemap_pages

    counter_dir = str(tmp_path / "hits")
    os.makedirs(counter_dir, exist_ok=True)
    server = {
        "https://a.example/sitemap_index.xml": INDEX_BODY,
        "https://a.example/sm-1.xml": CHILD_BODY,
        "https://b.example/sitemap.xml": FLAT_BODY,
    }

    def opener(url, method="GET", headers=None, body=None, timeout_s=5):
        safe = url.replace("/", "_").replace(":", "_")
        with open(f"{counter_dir}/{safe}.{uuid.uuid4().hex}", "w"):
            pass
        if url in server:
            return 200, {}, server[url].encode(), "application/xml"
        return 404, {}, b"", "text/plain"

    pointers = spark.createDataFrame(
        [("https://a.example/sitemap_index.xml",), ("https://b.example/sitemap.xml",)],
        "url string",
    )
    got = {r["url_canon"] for r in discover_sitemap_pages(pointers, opener=opener).collect()}
    assert len(got) == 3
    from collections import Counter

    hits = Counter(f.rsplit(".", 1)[0] for f in os.listdir(counter_dir))
    assert all(v == 1 for v in hits.values()), hits


def test_unescape_order_amp_last(spark):
    """Regression (code-review r3): '&amp;lt;' is a URL literally
    containing '&lt;' — unescaping &amp; first would double-unescape it
    to '<'."""
    body = "<urlset><url><loc>https://a.example/p?q=&amp;lt;x</loc></url></urlset>"
    df = spark.createDataFrame([("https://a.example/s.xml", body)], "url string, body string")
    locs = [r["loc"] for r in sitemap_locs(df).collect()]
    assert locs == ["https://a.example/p?q=&lt;x"]


def test_bootstrap_extra_urls_df_distributed_path(spark, tmp_path):
    """The DataFrame seeding path (engine.bootstrap_from_config
    extra_urls_df -> plans.round.frontier_identity): identity-shaped
    input (discover_sitemap_pages output) seeds round 0 as-is; a bare
    ``url`` DataFrame derives identity with the CONFIG's salt_buckets, so
    a host's sitemap rows land in the same salt bucket as its
    config-expanded rows (the fetch stage's host-local politeness
    depends on it)."""
    from raven_spark.config import RavenConfig, RavenRequest
    from raven_spark.engine import CrawlEngine, EngineOptions
    from raven_spark.operators.fetch import SyntheticFetcher
    from raven_spark.operators.sitemaps import sitemap_frontier
    from raven_spark.sources.corpus import generate_pages

    corpus = generate_pages(spark, 50, seed=3)
    cfg = RavenConfig(
        name="smdf",
        request=RavenRequest(url="https://h1.example/p/0", max_retry=1),
        host_budget_per_round=50, max_rounds=1, salt_buckets=16,
    )

    def eng(sub):
        return CrawlEngine(
            spark, cfg, str(tmp_path / sub), SyntheticFetcher(corpus, seed=3),
            options=EngineOptions(expected_total_urls=1024, shuffle_partitions=4),
        )

    # identity-shaped input: the discover_sitemap_pages output shape
    bodies = spark.createDataFrame(
        [("https://h1.example/sitemap.xml",
          "<urlset><url><loc>https://h1.example/p/7</loc></url>"
          "<url><loc>https://h2.example/p/9</loc></url></urlset>")],
        "url string, body string",
    )
    shaped = sitemap_frontier(bodies, "url", "body", salt_buckets=cfg.salt_buckets)
    f0 = eng("a").bootstrap_from_config(extra_urls_df=shaped)
    urls = {r["url_canon"] for r in f0.select("url_canon").collect()}
    assert {"https://h1.example/p/7", "https://h2.example/p/9",
            "https://h1.example/p/0"} <= urls
    # host-local politeness invariant: every row of a host shares ONE
    # salt bucket across the config-expanded and sitemap-seeded paths
    per_host = f0.groupBy("host").agg(
        F.countDistinct("salt_bucket").alias("n")).collect()
    assert all(r["n"] == 1 for r in per_host), per_host

    # bare url DataFrame: identity derived inside bootstrap with the
    # config's salt_buckets
    bare = spark.createDataFrame(
        [("https://h1.example/p/8",), ("https://h3.example/p/1",)], "url string"
    )
    f0b = eng("b").bootstrap_from_config(extra_urls_df=bare)
    per_host_b = f0b.groupBy("host").agg(
        F.countDistinct("salt_bucket").alias("n")).collect()
    assert all(r["n"] == 1 for r in per_host_b), per_host_b
    assert {r["url_canon"] for r in f0b.select("url_canon").collect()} >= {
        "https://h1.example/p/8", "https://h3.example/p/1",
    }


def test_sitemap_entries_full_parse(spark):
    from pyspark.sql import functions as F

    from raven_spark.operators.sitemaps import (
        changefreq_interval_col,
        sitemap_entries,
    )

    body = (
        '<?xml version="1.0"?><urlset>\n'
        "<url><loc>https://s.example/a&amp;b</loc>"
        "<lastmod>2026-03-04T10:00:00+09:00</lastmod>\n"
        "<changefreq>Daily</changefreq><priority>0.8</priority></url>\n"
        "<url><loc>https://s.example/plain</loc></url>\n"
        "<url><loc>https://s.example/bad</loc><lastmod>not-a-date</lastmod>"
        "<priority>high</priority></url>\n"
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("https://s.example/sitemap.xml", body)], "url string, body string"
    )
    out = {r["loc"]: r for r in
           sitemap_entries(df).withColumn(
               "hint_s", changefreq_interval_col(F.col("changefreq"))).collect()}
    full = out["https://s.example/a&b"]  # entity-unescaped
    assert str(full["lastmod_date"]) == "2026-03-04"
    assert full["lastmod"].startswith("2026-03-04T")
    assert full["priority"] == 0.8
    assert full["hint_s"] == 86400  # case-insensitive changefreq
    plain = out["https://s.example/plain"]
    assert plain["lastmod"] is None and plain["changefreq"] is None
    assert plain["priority"] is None and plain["hint_s"] is None
    bad = out["https://s.example/bad"]
    assert bad["lastmod"] == "not-a-date" and bad["lastmod_date"] is None
    assert bad["priority"] is None  # malformed -> null, never an error
