"""Sitemap ingestion: loc extraction, index vs urlset, entity unescape,
identity plumbing into the frontier, robots Sitemap pointers."""

from __future__ import annotations

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
