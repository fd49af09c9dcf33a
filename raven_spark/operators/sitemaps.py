"""Sitemap ingestion — the other half of seed discovery.

Link extraction finds what pages reference; sitemaps are what hosts
DECLARE (sitemaps.org protocol): XML documents listing ``<loc>`` URLs,
optionally nested one level via a ``<sitemapindex>`` of child sitemaps,
and advertised in robots.txt ``Sitemap:`` lines. A crawl that honors
them seeds deep/unlinked pages a BFS frontier would never reach. The
reference crawler has no discovery at all (its task list is fully
config-expanded, parser.rs); this is crawl-tier task-brief scope, the
seed-side sibling of streaming_link_frontier.

Scale shape: pure column algebra — one regexp_extract_all + explode per
sitemap body, no Python, no shuffle until the frontier dedup the caller
already runs. Sitemap bodies cap at 50 MB/50k URLs by protocol, so the
explode fan-out is bounded per row.

Deliberate scope: XML parsed by pattern, not by a full parser — sitemap
<loc> contents are URLs (no nested markup), the protocol requires
entity-escaping, and the pattern form is exactly replayable in the
DuckDB oracle. Gzip'd sitemaps (<name>.xml.gz) arrive decompressed by
the HTTP layer (Content-Encoding), not here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LOC = r"<loc>\s*([^<]+?)\s*</loc>"


def _unescape_xml(col: Column) -> Column:
    """Protocol entity unescape for URL text. &amp; LAST: unescaping it
    first would double-unescape sequences like '&amp;lt;' (a URL
    literally containing '&lt;') into '<'."""
    for ent, ch in (("&apos;", "'"), ("&quot;", '"'),
                    ("&gt;", ">"), ("&lt;", "<"), ("&amp;", "&")):
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def sitemap_locs(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """(sitemap_url, kind, loc) per ``<loc>`` entry.

    kind: 'sitemapindex' when the document is an index of child sitemaps
    (its locs are sitemap URLs to fetch next — one protocol-defined
    nesting level), else 'urlset' (its locs are page URLs). XML entities
    the protocol requires escaped in URLs are unescaped (&amp; &apos;
    &quot; &gt; &lt;)."""
    kind = F.when(
        F.col(body_col).contains("<sitemapindex"), F.lit("sitemapindex")
    ).otherwise(F.lit("urlset"))
    locs = F.regexp_extract_all(F.col(body_col), F.lit(_LOC), 1)
    out = df.select(
        F.col(url_col).alias("sitemap_url"),
        kind.alias("kind"),
        F.explode(locs).alias("loc"),
    )
    return out.withColumn("loc", _unescape_xml(F.col("loc")))


def sitemap_frontier(
    df: DataFrame, url_col: str = "url", body_col: str = "body",
    salt_buckets: int = 256,
) -> DataFrame:
    """Page URLs declared by urlset sitemaps, carried through the same
    canonicalize/hash/salt identity the whole engine keys on — ready for
    subtract_seen + frontier union. Index locs are excluded (they are
    sitemaps to fetch, not pages; feed them back through the fetch
    stage and this operator again)."""
    from raven_spark.functions.urls import with_url_identity

    pages = (
        sitemap_locs(df, url_col, body_col)
        .filter(F.col("kind") == "urlset")
        .select(F.col("loc").alias("url"))
    )
    return with_url_identity(pages, salt_buckets=salt_buckets)


def robots_sitemap_urls(text: str | None) -> list[str]:
    """Sitemap: pointers from one robots.txt body (driver-side, O(hosts)
    like parse_robots_txt — the rules table is small by construction).
    The field is group-independent per the protocol, so every Sitemap
    line counts regardless of user-agent blocks."""
    if not text:
        return []
    out = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def fetch_sitemaps(
    urls: DataFrame,
    opener=None,
    timeout_s: int = 5,
    concurrency: int = 8,
    url_col: str = "url",
    max_bytes: int = 50 * 1024 * 1024,
) -> DataFrame:
    """(url) rows -> (url, body) by fetching each sitemap through the
    injected opener (the fetch stage's seam; same thread-pool shape as
    politeness.fetch_robots — sitemap URLs are O(hosts), pure network
    wait). Unfetchable sitemaps (non-200, transport errors, timeouts)
    yield body='' — zero locs, never an abort.

    Bodies are BOUNDED at ``max_bytes`` (protocol limit: 50 MB per
    sitemap). When the opener supports bounded reads (both package
    openers do, via ``max_bytes=``) the cap is applied AT THE SOCKET so a
    hostile endpoint streaming gigabytes never allocates more than the
    cap in the Python worker; injected openers without the kwarg fall
    back to a post-read slice (caps downstream memory only). A cut
    mid-``<loc>`` just leaves an incomplete tag the extractor ignores."""
    import pandas as pd

    if opener is None:
        from raven_spark.operators.http import default_opener

        opener = default_opener

    from raven_spark.operators.http import supports_max_bytes

    bounded = supports_max_bytes(opener)

    def fetch_one(url):
        try:
            kw = {"max_bytes": max_bytes} if bounded else {}
            status, _hdrs, raw, _ct = opener(
                url, method="GET", headers={}, body=None, timeout_s=timeout_s,
                **kw,
            )
            if status == 200 and raw:
                return (url, raw[:max_bytes].decode("utf-8", errors="replace"))
        except (TimeoutError, OSError):
            pass
        return (url, "")

    def run(batches):
        from concurrent.futures import ThreadPoolExecutor

        for pdf in batches:
            url_list = list(pdf[url_col])
            if not url_list:
                continue
            if len(url_list) == 1:
                rows = [fetch_one(url_list[0])]
            else:
                with ThreadPoolExecutor(min(concurrency, len(url_list))) as pool:
                    rows = list(pool.map(fetch_one, url_list))
            yield pd.DataFrame({"url": [r[0] for r in rows],
                                "body": [r[1] for r in rows]})

    return urls.select(F.col(url_col).alias(url_col)).distinct().mapInPandas(
        run, "url string, body string"
    )


def discover_sitemap_pages(
    sitemap_urls: DataFrame,
    opener=None,
    timeout_s: int = 5,
    salt_buckets: int = 256,
) -> DataFrame:
    """Sitemap pointers (robots ``Sitemap:`` lines or configured seeds)
    -> the identity frontier of every page they declare. Fetches the
    pointed sitemaps, follows ONE ``<sitemapindex>`` nesting level (the
    protocol's maximum), and runs urlset locs through sitemap_frontier.
    Output: with_url_identity columns, ready for bootstrap seeding or a
    frontier union."""
    # checkpoint the fetched bodies ONCE: the lazy fetch subtree would
    # otherwise sit under BOTH union branches (parents + the children
    # derivation) and every sitemap — plus everything upstream of
    # sitemap_urls — would be fetched over the network twice
    bodies = fetch_sitemaps(
        sitemap_urls, opener=opener, timeout_s=timeout_s
    ).localCheckpoint(eager=False)
    locs = sitemap_locs(bodies, "url", "body")
    children = locs.filter(F.col("kind") == "sitemapindex").select(
        F.col("loc").alias("url")
    )
    child_bodies = fetch_sitemaps(children, opener=opener, timeout_s=timeout_s)
    all_bodies = bodies.unionByName(child_bodies)
    return sitemap_frontier(all_bodies, "url", "body", salt_buckets=salt_buckets)


_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_TAG = {
    "loc": _LOC,
    "lastmod": r"<lastmod>\s*([^<]+?)\s*</lastmod>",
    "changefreq": r"<changefreq>\s*([^<]+?)\s*</changefreq>",
    "priority": r"<priority>\s*([^<]+?)\s*</priority>",
}

# sitemaps.org changefreq -> revisit-interval hint (seconds); 'always'
# floors at a minute, 'never' caps at a year (the protocol says the value
# is a HINT, so the caps are policy, not spec)
CHANGEFREQ_SECONDS = {
    "always": 60,
    "hourly": 3600,
    "daily": 86400,
    "weekly": 604800,
    "monthly": 2592000,
    "yearly": 31536000,
    "never": 31536000,
}


def sitemap_entries(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Full per-entry sitemap parse (sitemaps.org protocol): one row per
    ``<url>`` block with (sitemap_url, loc, lastmod, lastmod_date,
    changefreq, priority). sitemap_locs feeds the frontier (every loc,
    fast path); this feeds RECRAWL — lastmod/changefreq are the host's
    own declared change profile, the natural prior to blend with the
    observed-churn estimator (snapshots.recrawl_schedule).

    Same deliberate pattern-parse scope as sitemap_locs (entries are
    flat tags inside a ``<url>`` block; '(?s)' because blocks span
    lines). lastmod keeps the raw W3C datetime string; lastmod_date is
    the parsed DATE of its first 10 chars (the protocol's date core —
    enough for revisit decisions, and engine/oracle-parity trivial).
    priority parses via try_cast (malformed -> null). All pure column
    algebra: one regexp_extract_all + explode + per-tag regexp_extract,
    zero Python, zero shuffles."""
    blocks = F.regexp_extract_all(F.col(body_col), F.lit(_URL_BLOCK), 1)
    out = df.select(
        F.col(url_col).alias("sitemap_url"), F.explode(blocks).alias("__b")
    )
    tag = lambda name: F.regexp_extract(F.col("__b"), _TAG[name], 1)  # noqa: E731
    nullif_empty = lambda c: F.when(c != "", c)  # noqa: E731
    unescaped = _unescape_xml(tag("loc"))
    lastmod = nullif_empty(tag("lastmod"))
    return out.select(
        "sitemap_url",
        unescaped.alias("loc"),
        lastmod.alias("lastmod"),
        F.try_to_timestamp(
            F.substring(lastmod, 1, 10), F.lit("yyyy-MM-dd")
        ).cast("date").alias("lastmod_date"),
        nullif_empty(tag("changefreq")).alias("changefreq"),
        nullif_empty(tag("priority")).try_cast("double").alias("priority"),
    ).filter(F.col("loc") != "")


def changefreq_interval_col(changefreq: Column) -> Column:
    """Declared-changefreq revisit-interval hint in seconds (null for
    absent/unknown values). Blend with the observed-churn estimator as
    ``least(estimated, hint)`` — a declared faster cadence can only
    tighten the schedule; an estimator that has SEEN churn never loosens
    to a lazy 'yearly' declaration."""
    m = F.create_map(
        *[F.lit(x) for kv in CHANGEFREQ_SECONDS.items() for x in kv]
    )
    return m[F.lower(changefreq)]
