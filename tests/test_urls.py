"""URL canonicalization spec + UDF equivalence + hypothesis properties."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from raven_spark.functions.urls import canonicalize_url, url_host

CASES = {
    # lowercase scheme + host
    "HTTP://WWW.Example.COM/a": "http://www.example.com/a",
    # default port stripped
    "http://example.com:80/a": "http://example.com/a",
    "https://example.com:443/": "https://example.com/",
    "https://example.com:8443/": "https://example.com:8443/",
    # empty path -> "/"
    "http://example.com": "http://example.com/",
    # dot segments
    "http://a.com/x/./y/../z": "http://a.com/x/z",
    "http://a.com/../x": "http://a.com/x",
    # fragment dropped
    "http://a.com/p#frag": "http://a.com/p",
    # bare "?" dropped
    "http://a.com/p?": "http://a.com/p",
    # query params sorted
    "http://a.com/p?b=2&a=1": "http://a.com/p?a=1&b=2",
    "http://a.com/p?b=2&a=1&a=0": "http://a.com/p?a=0&a=1&b=2",
    # percent-normalization: unreserved decoded, escapes uppercased
    "http://a.com/%7Euser": "http://a.com/~user",
    "http://a.com/a%2fb": "http://a.com/a%2Fb",
    # raw unicode percent-encoded
    "http://a.com/café": "http://a.com/caf%C3%A9",
    # trailing dot on host
    "http://a.com./x": "http://a.com/x",
    # already canonical passes through
    "https://host3.example/p/42": "https://host3.example/p/42",
}


def test_canonicalize_vectors():
    for raw, want in CASES.items():
        assert canonicalize_url(raw) == want, raw


def test_rejects_unparseable():
    assert canonicalize_url(None) is None
    assert canonicalize_url("") is None
    assert canonicalize_url("not a url") is None
    assert canonicalize_url("mailto:x@y.z") is None  # no authority
    assert canonicalize_url("http://") is None  # empty host


def test_url_host():
    assert url_host("http://a.b.c/x") == "a.b.c"
    assert url_host("http://user@a.b.c:8080/x") == "a.b.c"
    assert url_host("http://[2001:db8::1]:8080/x") == "[2001:db8::1]"


@given(st.text(min_size=0, max_size=80))
@settings(max_examples=200, deadline=None)
def test_canonicalize_never_raises_and_is_idempotent(s):
    c = canonicalize_url(s)
    if c is not None:
        assert canonicalize_url(c) == c  # idempotence


@given(
    st.sampled_from(["http", "https", "HTTP"]),
    st.from_regex(r"[A-Za-z0-9.-]{1,20}", fullmatch=True),
    st.from_regex(r"(/[A-Za-z0-9._~%/-]{0,30})?", fullmatch=True),
)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent_on_urlish(scheme, host, path):
    u = f"{scheme}://{host}{path}"
    c = canonicalize_url(u)
    if c is not None:
        assert canonicalize_url(c) == c


def test_udf_matches_pure_spec(spark):
    """The vectorized fast path must agree with the pure spec on every
    vector AND on already-canonical outputs (fast-path soundness)."""
    from pyspark.sql import functions as F

    from raven_spark.functions.urls import canonicalize_udf

    raws = list(CASES) + list(CASES.values()) + ["not a url", "http://"]
    df = spark.createDataFrame([(u,) for u in raws], ["url"])
    got = {
        r["url"]: r["c"]
        for r in df.withColumn("c", canonicalize_udf(F.col("url"))).collect()
    }
    for u in raws:
        assert got[u] == canonicalize_url(u), u


def test_with_url_identity(spark):
    from raven_spark.functions.urls import with_url_identity

    df = spark.createDataFrame(
        [("HTTP://A.com/x?b=2&a=1#f",), ("http://a.com/x?a=1&b=2",), ("junk",)],
        ["url"],
    )
    out = with_url_identity(df).collect()
    # junk filtered; the two spellings collapse to one identity
    assert len(out) == 2
    assert len({r["url_hash"] for r in out}) == 1
    assert all(r["host"] == "a.com" for r in out)
    assert all(0 <= r["salt_bucket"] < 256 for r in out)


def test_pure_python_xxh64_matches_spark(spark):
    """hashing.spark_xxhash64_str == Spark's xxhash64 (the engine's dedup
    identity) across length classes and non-ASCII."""
    from pyspark.sql import functions as F

    from raven_spark.functions.hashing import spark_xxhash64_str

    vals = ["", "a", "ab", "abc", "abcd", "hello world",
            "https://host1.example/p/42?x=1&y=2", "x" * 31, "y" * 32,
            "z" * 33, "w" * 100, "日本語テキストのページ", "§±€ müller"]
    rows = (
        spark.createDataFrame([(v,) for v in vals], ["s"])
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    )
    for r in rows:
        assert spark_xxhash64_str(r["s"]) == r["h"], r["s"]


def test_surt_col(spark):
    from raven_spark.functions.urls import surt_col, canonicalize_udf
    from pyspark.sql import functions as F

    cases = [
        ("https://www.example.com/a/b?x=1", "com,example)/a/b?x=1"),
        ("https://sub.Foo.example.ORG/", "org,example,foo,sub)/"),
        ("http://example.com", "com,example)/"),
        ("https://user:p@www.example.com:8443/p", "com,example:8443)/p"),
        ("http://[2001:db8::1]:8080/y", "[2001:db8::1]:8080)/y"),
        ("http://[2001:db8::1]/x", "[2001:db8::1])/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    out = df.select(
        "url", surt_col(canonicalize_udf(F.col("url"))).alias("surt")
    ).collect()
    got = {r["url"]: r["surt"] for r in out}
    for u, want in cases:
        assert got[u] == want, (u, got[u])


def test_surt_prefix_range_clusters_domain(spark):
    """The operative property: every page under one registrable domain
    sorts into a contiguous SURT range."""
    from raven_spark.functions.urls import surt_col, canonicalize_udf
    from pyspark.sql import functions as F

    urls = (
        [f"https://a{i}.example.com/p{i}" for i in range(20)]
        + [f"https://other{i}.net/q{i}" for i in range(20)]
    )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = (
        df.select(surt_col(canonicalize_udf(F.col("url"))).alias("s"))
        .orderBy("s")
        .collect()
    )
    flags = [r["s"].startswith("com,example") for r in rows]
    first, last = flags.index(True), len(flags) - 1 - flags[::-1].index(True)
    assert all(flags[first:last + 1]) and sum(flags) == 20


def test_trap_score_col(spark):
    from raven_spark.functions.urls import trap_score_col
    from pyspark.sql import functions as F

    cases = {
        "https://a.example/article/2026/story": 0.0,
        "https://a.example/a/b/a/b/a/b/c/d/e": None,     # repeat + deep (checked below)
        "https://a.example/p?phpsessid=deadbeef": 0.2,
        "https://a.example/p/12345678901": 0.2,          # digit run
        "https://a.example/x/x/x": 0.3,                  # 3x repeated segment
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["s"] for r in
           df.select("url", trap_score_col(F.col("url")).alias("s")).collect()}
    assert got["https://a.example/article/2026/story"] == 0.0
    assert got["https://a.example/p?phpsessid=deadbeef"] == 0.2
    assert got["https://a.example/p/12345678901"] == 0.2
    assert got["https://a.example/x/x/x"] == 0.3
    # deep (9 segs -> +0.3 cap) + repeated (a,b 3x+) = 0.6
    assert got["https://a.example/a/b/a/b/a/b/c/d/e"] == 0.6


def test_host_suffixes_col(spark):
    from pyspark.sql import functions as F

    from raven_spark.functions.urls import host_suffixes_col

    df = spark.createDataFrame(
        [("a.b.example.com",), ("com",), ("[2001:db8::1]",)], "h string"
    )
    got = {r["h"]: r["s"] for r in
           df.select("h", host_suffixes_col(F.col("h")).alias("s")).collect()}
    assert got["a.b.example.com"] == [
        "com", "example.com", "b.example.com", "a.b.example.com"]
    assert got["com"] == ["com"]
    assert got["[2001:db8::1]"] == ["[2001:db8::1]"]  # no label semantics


def test_url_filter_literal_and_df_paths_agree(spark):
    from raven_spark.functions.urls import url_filter, with_url_identity

    urls = [
        "https://ads.tracker.example/x",        # subdomain of blocked
        "https://tracker.example/y",            # exact blocked
        "https://nottracker.example/z",         # NOT blocked (token boundary)
        "https://shop.example/download/badword/file",  # badword token
        "https://shop.example/download/badwordy/file", # substring: no hit
        "https://clean.example/ok",
    ]
    df = with_url_identity(spark.createDataFrame([(u,) for u in urls], "url string"))
    blocked = ("tracker.example",)
    lit_out = {r["url_canon"]: (r["blocked_domain"], r["url_badword"], r["url_allowed"])
               for r in url_filter(df, blocked, badwords=("badword",)).collect()}
    assert lit_out["https://ads.tracker.example/x"] == (True, False, False)
    assert lit_out["https://tracker.example/y"] == (True, False, False)
    assert lit_out["https://nottracker.example/z"] == (False, False, True)
    assert lit_out["https://shop.example/download/badword/file"][1] is True
    assert lit_out["https://shop.example/download/badwordy/file"] == (False, False, True)
    assert lit_out["https://clean.example/ok"] == (False, False, True)
    # distributed-blocklist path gives the identical verdicts
    bdf = spark.createDataFrame([(d,) for d in blocked], "domain string")
    df_out = {r["url_canon"]: (r["blocked_domain"], r["url_badword"], r["url_allowed"])
              for r in url_filter(df, badwords=("badword",), blocked_df=bdf).collect()}
    assert df_out == lit_out


def test_host_suffixes_deep_host_keeps_full_host(spark):
    from pyspark.sql import functions as F

    from raven_spark.functions.urls import host_suffixes_col

    deep = "a.b.c.d.e.f.g.h.example.com"  # 10 labels > max_labels=8
    got = spark.createDataFrame([(deep,)], "h string").select(
        host_suffixes_col(F.col("h")).alias("s")).first()["s"]
    assert deep in got          # exact-host blocklist entries still match
    assert "example.com" in got and "com" in got
    assert len(got) == 9        # 8 shortest + the full host


def test_url_filter_normalizes_blocklist_entries(spark):
    from raven_spark.functions.urls import url_filter, with_url_identity

    df = with_url_identity(spark.createDataFrame(
        [("https://sub.example.com/x",), ("https://other.example/y",)],
        "url string"))
    # mixed case + trailing dot entries must still match canonical hosts
    lit = url_filter(df, blocked_domains=("Example.COM.",))
    got = {r["url_canon"]: r["blocked_domain"] for r in lit.collect()}
    assert got["https://sub.example.com/x"] is True
    assert got["https://other.example/y"] is False
    bdf = spark.createDataFrame([("Example.COM.",)], "domain string")
    got2 = {r["url_canon"]: r["blocked_domain"]
            for r in url_filter(df, blocked_df=bdf).collect()}
    assert got2 == got
    # both paths together OR their verdicts
    both = url_filter(df, blocked_domains=("other.example",), blocked_df=bdf)
    assert all(r["blocked_domain"] for r in both.collect())


def test_registered_domain_psl_semantics(spark):
    """PSL algorithm parity: exact multi-label rules, wildcard rules,
    exception rules, the implicit '*' prevailing rule, public-suffix
    hosts -> NULL, IPv6 literals -> NULL."""
    from pyspark.sql import functions as F

    from raven_spark.functions.urls import (
        public_suffix_col,
        registered_domain_col,
    )

    S = ("com", "co.uk", "kawasaki.jp")
    W = ("*.ck", "kawasaki.jp")  # '*.ck' form and bare-base form both accepted
    E = ("!www.ck", "city.kawasaki.jp")
    expect = {
        # host: (public_suffix, registered_domain)
        "a.b.example.com": ("com", "example.com"),
        "example.co.uk": ("co.uk", "example.co.uk"),
        "co.uk": ("co.uk", None),           # host IS a public suffix
        "foo.bar.ck": ("bar.ck", "foo.bar.ck"),   # wildcard *.ck
        "www.ck": ("ck", "www.ck"),         # exception demotes to TLD rule
        "sub.www.ck": ("ck", "www.ck"),
        "localhost": ("localhost", None),   # implicit '*': TLD is public
        "unknowntld": ("unknowntld", None),
        "x.unknowntld": ("unknowntld", "x.unknowntld"),
        "[2001:db8::1]": (None, None),      # no label semantics
        "deep.kawasaki.jp": ("deep.kawasaki.jp", None),  # *.kawasaki.jp
        "city.kawasaki.jp": ("kawasaki.jp", "city.kawasaki.jp"),  # exception
        "x.city.kawasaki.jp": ("kawasaki.jp", "city.kawasaki.jp"),
    }
    df = spark.createDataFrame([(h,) for h in expect], "h string")
    got = {
        r["h"]: (r["ps"], r["pld"])
        for r in df.select(
            "h",
            public_suffix_col(F.col("h"), S, W, E).alias("ps"),
            registered_domain_col(F.col("h"), S, W, E).alias("pld"),
        ).collect()
    }
    assert got == expect


def test_registered_domain_exception_prevails_without_parent_rule(spark):
    """publicsuffix.org algorithm: an exception rule PREVAILS and the
    public suffix is the rule minus its leftmost label — even when that
    parent suffix is not itself a listed rule (regression: the first cut
    only un-public'd the exception and leaned on a shorter rule
    happening to exist, which every real-PSL config guarantees but
    arbitrary rule tuples do not)."""
    from pyspark.sql import functions as F

    from raven_spark.functions.urls import (
        public_suffix_col,
        registered_domain_col,
    )

    W = ("*.foo.bar",)
    E = ("!x.foo.bar",)
    df = spark.createDataFrame([("x.foo.bar",), ("y.x.foo.bar",)], "h string")
    got = {
        r["h"]: (r["ps"], r["pld"])
        for r in df.select(
            "h",
            public_suffix_col(F.col("h"), (), W, E).alias("ps"),
            registered_domain_col(F.col("h"), (), W, E).alias("pld"),
        ).collect()
    }
    assert got == {
        "x.foo.bar": ("foo.bar", "x.foo.bar"),
        "y.x.foo.bar": ("foo.bar", "x.foo.bar"),
    }


def test_registered_domain_empty_rules_degrade_to_last_two_labels(spark):
    from pyspark.sql import functions as F

    from raven_spark.functions.urls import registered_domain_col

    df = spark.createDataFrame([("a.b.example.net",), ("example.net",)], "h string")
    got = {r["h"]: r["d"] for r in
           df.select("h", registered_domain_col(F.col("h")).alias("d")).collect()}
    assert got == {"a.b.example.net": "example.net", "example.net": "example.net"}


def test_url_template_collapses_identifier_slots(spark):
    from pyspark.sql import functions as F

    from raven_spark.functions.urls import url_template_col

    df = spark.createDataFrame(
        [
            ("https://a.com/article/123",),
            ("https://a.com/article/999?ref=x#frag",),
            ("https://a.com/session/deadbeef01",),
            ("https://a.com/cal/2026/3/14",),
            ("https://a.com",),
            ("https://a.com/UPPER/5",),
        ],
        "url string",
    )
    got = [r["t"] for r in df.select(url_template_col(F.col("url")).alias("t")).collect()]
    assert got == [
        "/article/{n}",
        "/article/{n}",          # query + fragment stripped
        "/session/{hex}",
        "/cal/{n}/{n}/{n}",
        "/",                     # empty path normalizes to /
        "/upper/{n}",
    ]


def test_mine_url_templates_trap_flag(spark):
    from raven_spark.functions.urls import mine_url_templates

    rows = [(f"https://t.com/cal/2026/{m}/{d}",) for m in range(3) for d in range(8)]
    rows += [(f"https://t.com/about",)] * 3
    rows += [(f"https://t.com/p/{i}",) for i in range(30)]   # 1 slot only
    df = spark.createDataFrame(rows, "url string")
    got = {r["template"]: r for r in mine_url_templates(df, min_urls=20, min_slots=2).collect()}
    cal = got["/cal/{n}/{n}/{n}"]
    assert (cal["n_urls"], cal["n_slots"], cal["depth"], cal["trap_suspect"]) == (24, 3, 4, True)
    assert got["/p/{n}"]["trap_suspect"] is False            # slots below floor
    assert got["/about"]["trap_suspect"] is False
    # duplicate URLs counted but distinct tracked
    assert got["/about"]["n_urls"] == 3 and got["/about"]["n_distinct_urls"] == 1


def test_page_directives_extraction(spark):
    from raven_spark.functions.urls import page_directives

    h1 = ('<html><head><meta charset="utf-8">'
          '<META NAME=robots CONTENT="noindex, NOFOLLOW">'
          '<link rel="canonical" href="https://ex.com/page?x=1">'
          '<link rel="alternate" hreflang="fr" href="https://ex.com/fr">'
          '<link hreflang="de-AT" rel="alternate" href="https://ex.com/de">'
          '</head><body>x</body></html>')
    h2 = '<html><head><meta name="viewport" content="w=1"></head></html>'
    h3 = ('<html><head><meta content="index,follow" name=\'robots\'>'
          '</head></html>')  # content BEFORE name
    df = spark.createDataFrame(
        [(1, h1), (2, h2), (3, h3), (4, None)], "doc_id long, html string"
    )
    out = {r["id"]: r for r in page_directives(df).collect()}
    assert out[1]["noindex"] is True and out[1]["nofollow"] is True
    assert out[1]["robots_content"] == "noindex, nofollow"
    assert out[1]["canonical"] == "https://ex.com/page?x=1"
    assert out[1]["n_hreflang"] == 2
    assert out[1]["hreflang_langs"] == "de-at,fr"
    assert out[2]["noindex"] is False and out[2]["canonical"] is None
    assert out[3]["robots_content"] == "index,follow"
    assert out[3]["noindex"] is False
    assert out[4]["n_hreflang"] == 0
    # zero exchanges
    plan = page_directives(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_apply_canonical_override_same_host_only(spark):
    from raven_spark.functions.urls import apply_canonical_override

    df = spark.createDataFrame(
        [
            # tracking-param capture -> same-host canonical: override
            ("https://Ex.com/p?utm=1&id=2", "https://ex.com/p?id=2"),
            # cross-host canonical: REJECTED
            ("https://ex.com/q", "https://evil.com/q"),
            # relative canonical: rejected (not absolute http)
            ("https://ex.com/r", "/r"),
            # no canonical
            ("https://ex.com/s", None),
            # canonical equal to own canon: not an override
            ("https://ex.com/T", "https://ex.com/T"),
        ],
        "url string, canonical string",
    )
    out = {r["url"]: r for r in apply_canonical_override(df).collect()}
    r1 = out["https://Ex.com/p?utm=1&id=2"]
    assert r1["overridden"] is True
    assert r1["effective_url"] == "https://ex.com/p?id=2"
    assert out["https://ex.com/q"]["overridden"] is False
    assert out["https://ex.com/q"]["effective_url"].startswith("https://ex.com/")
    assert out["https://ex.com/r"]["overridden"] is False
    assert out["https://ex.com/s"]["overridden"] is False
    assert out["https://ex.com/T"]["overridden"] is False


def test_page_directives_unquoted_attrs(spark):
    from raven_spark.functions.urls import page_directives

    df = spark.createDataFrame(
        [
            (1, "<meta name=robots content=noindex,nofollow><p>x</p>"),
            (2, "<link rel=canonical href=https://ex.com/p?a=1>"),
            (3, '<meta content=INDEX name="robots">'),
        ],
        "doc_id long, html string",
    )
    out = {r["id"]: r for r in page_directives(df).collect()}
    assert out[1]["noindex"] is True and out[1]["nofollow"] is True
    assert out[2]["canonical"] == "https://ex.com/p?a=1"
    assert out[3]["robots_content"] == "index" and out[3]["noindex"] is False


def test_apply_canonical_override_keeps_uncanonicalizable_rows(spark):
    from raven_spark.functions.urls import apply_canonical_override

    df = spark.createDataFrame(
        [("notaurl", None), ("https://ok.com/a", None)],
        "url string, canonical string",
    )
    out = {r["url"]: r for r in apply_canonical_override(df).collect()}
    assert len(out) == 2  # the bad row is visible, not dropped
    assert out["notaurl"]["url_canon"] is None
    assert out["notaurl"]["effective_url"] is None
    assert out["notaurl"]["overridden"] is False
