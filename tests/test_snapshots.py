"""Multi-snapshot URL versioning (operators/snapshots.py): latest-capture
selection with deterministic tie-breaks, churn stats, partition invariance."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from raven_spark.operators.snapshots import latest_snapshot, snapshot_stats


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary, text string, lang string")


TS = lambda s: dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)  # noqa: E731


def test_latest_snapshot_keeps_max_ts_row(spark):
    rows = [
        ("https://a.example/p", TS(10), b"v1", "one", "en"),
        ("https://a.example/p", TS(30), b"v3", "three", "en"),
        ("https://a.example/p", TS(20), b"v2", "two", "en"),
        ("https://b.example/q", TS(5), b"only", "solo", "de"),
    ]
    out = {r["url"]: r for r in latest_snapshot(_pages(spark, rows)).collect()}
    assert out["https://a.example/p"]["text"] == "three"
    assert out["https://a.example/p"]["n_versions"] == 3
    assert out["https://b.example/q"]["text"] == "solo"
    assert out["https://b.example/q"]["n_versions"] == 1
    # original payload columns all survive
    assert out["https://a.example/p"]["html"] == b"v3"
    assert out["https://a.example/p"]["lang"] == "en"


def test_latest_snapshot_tie_break_is_content_deterministic(spark):
    # same url, SAME timestamp, different content: winner must be a pure
    # function of content, not of partitioning or input order
    rows = [
        ("https://t.example/", TS(1), b"x", "alpha", "en"),
        ("https://t.example/", TS(1), b"y", "beta", "en"),
    ]
    df_fwd = _pages(spark, rows)
    df_rev = _pages(spark, rows[::-1]).repartition(7)
    a = latest_snapshot(df_fwd).collect()[0]["text"]
    b = latest_snapshot(df_rev).collect()[0]["text"]
    assert a == b


def test_latest_snapshot_partition_invariant(spark):
    rows = [
        (f"https://h{i % 5}.example/p{i % 23}", TS(i * 7 % 101), b"", f"body {i} {i % 23}", "en")
        for i in range(300)
    ]
    df = _pages(spark, rows)
    one = {(r["url"], r["text"], r["n_versions"]) for r in latest_snapshot(df.coalesce(1)).collect()}
    many = {(r["url"], r["text"], r["n_versions"]) for r in latest_snapshot(df.repartition(13)).collect()}
    assert one == many
    assert len(one) == len({r[0] for r in [(f"https://h{i % 5}.example/p{i % 23}",) for i in range(300)]})


def test_latest_snapshot_304_rows_never_shadow_bodies(spark):
    """A later 304 revalidation capture (empty body by protocol) must not
    win the latest pick over the prior real capture; with
    exclude_not_modified=False the raw ranking is preserved."""
    rows = [
        ("https://a.example/p", TS(10), "real body", 200),
        ("https://a.example/p", TS(20), "", 304),
        ("https://b.example/q", TS(5), "only", 200),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, result_code int"
    )
    out = {r["url"]: r for r in latest_snapshot(df).collect()}
    assert out["https://a.example/p"]["text"] == "real body"
    assert out["https://a.example/p"]["n_versions"] == 1  # 304s aren't versions
    raw = {r["url"]: r for r in
           latest_snapshot(df, exclude_not_modified=False).collect()}
    assert raw["https://a.example/p"]["text"] == ""
    assert raw["https://a.example/p"]["n_versions"] == 2


def test_snapshot_stats_churn(spark):
    rows = [
        # url A: 3 captures, 2 distinct contents -> change_rate 0.5
        ("https://a.example/", TS(1), b"", "same", "en"),
        ("https://a.example/", TS(2), b"", "same", "en"),
        ("https://a.example/", TS(3), b"", "changed", "en"),
        # url B: single capture -> change_rate 0.0
        ("https://b.example/", TS(9), b"", "solo", "en"),
    ]
    out = {r["url"]: r for r in snapshot_stats(_pages(spark, rows)).collect()}
    a = out["https://a.example/"]
    assert a["n_versions"] == 3
    assert a["n_content_versions"] == 2
    assert a["change_rate"] == 0.5
    assert a["first_seen"] == TS(1) and a["last_seen"] == TS(3)
    b = out["https://b.example/"]
    assert b["n_versions"] == 1 and b["change_rate"] == 0.0


def test_latest_snapshot_plan_is_partial_aggregate(spark):
    """The scale contract: latest_snapshot must be a hash aggregate with a
    map-side partial (skewed hot URLs reduce before the shuffle), not a
    window sort."""
    rows = [("https://a.example/", TS(1), b"", "t", "en")]
    plan = latest_snapshot(_pages(spark, rows))._jdf.queryExecution().executedPlan().toString()
    # struct-typed buffer => SortAggregate, but the map-side PARTIAL
    # max_by is what kills hot-URL skew (one row per url per map task
    # crosses the exchange)
    assert "partial_max_by" in plan
    assert "Window" not in plan


def test_latest_snapshot_only_304_url_still_present(spark):
    """Regression (code-review r4): a URL whose only in-scope captures
    are 304s (e.g. a windowed pages read whose 200 capture fell outside
    the window) must still yield one output row — its latest 304 with
    n_versions=0 — not silently vanish from the per-URL contract."""
    rows = [
        ("https://a.example/p", TS(10), "", 304),
        ("https://a.example/p", TS(20), "", 304),
        ("https://b.example/q", TS(5), "real", 200),
        ("https://b.example/q", TS(9), "", 304),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, result_code int"
    )
    out = {r["url"]: r for r in latest_snapshot(df).collect()}
    assert set(out) == {"https://a.example/p", "https://b.example/q"}
    a = out["https://a.example/p"]
    assert a["n_versions"] == 0 and a["result_code"] == 304
    assert a["warc_ts"] == TS(20)  # latest of the 304s
    b = out["https://b.example/q"]
    assert b["n_versions"] == 1 and b["text"] == "real"


def test_recrawl_schedule_branches(spark):
    """Poisson-change scheduling branches: never-changed -> max
    interval; single capture -> default; all-changed -> censor-capped
    estimate clamped at min; partial churn -> 1/lambda; next_fetch_ts =
    last_seen + interval."""
    import datetime as dt
    import math

    from raven_spark.operators.snapshots import recrawl_schedule

    t0 = dt.datetime(2026, 1, 1)

    def row(url, n, nc, span_s):
        return (url, n, t0, t0 + dt.timedelta(seconds=span_s), nc, 0.0)

    stats = spark.createDataFrame(
        [
            row("u_static", 5, 1, 400),    # X=0
            row("u_single", 1, 1, 0),      # no recrawls
            row("u_always", 5, 5, 400),    # X=n=4 -> capped
            row("u_half", 5, 3, 400),      # X=2, n=4, I=100
        ],
        "url string, n_versions long, first_seen timestamp, "
        "last_seen timestamp, n_content_versions long, change_rate double",
    )
    out = {
        r["url"]: r
        for r in recrawl_schedule(
            stats, min_interval_s=10, max_interval_s=1000_000,
            default_interval_s=777,
        ).collect()
    }
    assert out["u_static"]["interval_s"] == 1000_000
    assert out["u_single"]["interval_s"] == 777
    # X=n capped at (n-.5)/n = .875; lambda = -ln(.125)/100; 1/lambda
    want_always = math.floor(100.0 / -math.log(1 - 0.875))
    assert out["u_always"]["interval_s"] == want_always
    want_half = math.floor(100.0 / -math.log(1 - 0.5))
    assert out["u_half"]["interval_s"] == want_half
    assert out["u_half"]["next_fetch_ts"] == (
        t0 + dt.timedelta(seconds=400 + want_half)
    )
    # min clamp
    tight = recrawl_schedule(
        stats, min_interval_s=100_000, max_interval_s=1000_000,
        default_interval_s=777,
    )
    got = {r["url"]: r["interval_s"] for r in tight.collect()}
    assert got["u_always"] == 100_000 and got["u_half"] == 100_000


def test_recrawl_schedule_null_dates_get_default(spark):
    """Captures with unparseable WARC dates (null first/last_seen) get
    the DEFAULT interval, not a silent null that unschedules the URL."""
    from raven_spark.operators.snapshots import recrawl_schedule

    stats = spark.createDataFrame(
        [("u", 5, None, None, 3, 0.5)],
        "url string, n_versions long, first_seen timestamp, "
        "last_seen timestamp, n_content_versions long, change_rate double",
    )
    [r] = recrawl_schedule(stats, default_interval_s=777).collect()
    assert r["interval_s"] == 777
    assert r["next_fetch_ts"] is None  # no last_seen to anchor to


def test_content_drift_ladder(spark):
    from raven_spark.operators.snapshots import content_drift

    df = spark.createDataFrame(
        [
            # url 1: identical captures -> transitions with hamming 0
            (1, 0, "the same page text entirely"),
            (1, 1, "the same page text entirely"),
            (1, 2, "the same page text entirely"),
            # url 2: one real rewrite
            (2, 0, "breaking news about the launch today"),
            (2, 1, "completely different quarterly earnings report"),
            # url 3: single capture -> no transitions
            (3, 0, "lonely capture"),
        ],
        "url_id bigint, cap_seq bigint, text string",
    )
    got = {r["url_id"]: r for r in content_drift(df).collect()}
    r1 = got[1]
    assert (r1["n_caps"], r1["n_transitions"], r1["n_changed"]) == (3, 2, 0)
    assert r1["mean_hamming"] == 0.0 and r1["max_hamming"] == 0
    r2 = got[2]
    assert (r2["n_caps"], r2["n_transitions"]) == (2, 1)
    assert r2["n_changed"] == 1 and r2["max_hamming"] > 0
    r3 = got[3]
    assert (r3["n_caps"], r3["n_transitions"], r3["n_changed"]) == (1, 0, 0)
    assert r3["mean_hamming"] is None and r3["max_hamming"] is None


def test_revisit_schedule_estimator_and_clamps(spark):
    # u0: 4 captures, all transitions change -> lambda = -ln(0.5/3.5),
    # interval = ceil(1/lambda) = 1.  u1: 3 captures, none change ->
    # rate 0.0 (not -0.0), interval = max 64.  u2: single capture ->
    # default 8, rate 0.0.
    import math

    from raven_spark.operators.snapshots import revisit_schedule

    rows = []
    for i, txt in enumerate(["a one", "b two", "c three", "d four"]):
        rows.append((0, i, txt))
    for i in range(3):
        rows.append((1, i, "static page text"))
    rows.append((2, 0, "lonely"))
    df = spark.createDataFrame(rows, "url_id bigint, cap_seq bigint, text string")
    got = {r["url_id"]: r for r in revisit_schedule(df, max_interval=64).collect()}
    lam = -math.log(0.5 / 3.5)
    assert got[0]["n_transitions"] == 3 and got[0]["n_changed"] == 3
    assert abs(got[0]["change_rate"] - round(lam, 6)) < 1e-9
    assert got[0]["revisit_interval"] == 1
    assert got[1]["change_rate"] == 0.0 and str(got[1]["change_rate"]) == "0.0"
    assert got[1]["revisit_interval"] == 64
    assert got[2]["n_transitions"] == 0 and got[2]["revisit_interval"] == 8


def test_revisit_schedule_partial_change_interval(spark):
    # 5 captures alternating A/A/B/B/A -> transitions 4, changed 2:
    # lambda = -ln(2.5/4.5); interval = ceil(1/lambda) = ceil(1.7) = 2
    import math

    from raven_spark.operators.snapshots import revisit_schedule

    texts = ["alpha text", "alpha text", "beta text", "beta text", "alpha text"]
    df = spark.createDataFrame(
        [(7, i, t) for i, t in enumerate(texts)],
        "url_id bigint, cap_seq bigint, text string",
    )
    r = revisit_schedule(df).collect()[0]
    lam = -math.log(2.5 / 4.5)
    assert r["n_changed"] == 2 and abs(r["change_rate"] - round(lam, 6)) < 1e-9
    assert r["revisit_interval"] == math.ceil(1 / lam)


def test_revisit_schedule_change_threshold_ignores_small_drift(spark):
    # Captures differ by one token out of many -> small Hamming moves;
    # threshold 64 (impossible) must classify everything as unchanged.
    from raven_spark.operators.snapshots import revisit_schedule

    base = "one two three four five six seven eight nine ten "
    df = spark.createDataFrame(
        [(1, i, base + f"tick{i}") for i in range(4)],
        "url_id bigint, cap_seq bigint, text string",
    )
    strict = revisit_schedule(df, change_threshold=1).collect()[0]
    loose = revisit_schedule(df, change_threshold=64, max_interval=64).collect()[0]
    assert strict["n_changed"] >= 1
    assert loose["n_changed"] == 0 and loose["revisit_interval"] == 64


def test_crawl_saturation_exact_decay(spark):
    # domain A: fetches 4/round over rounds 0..2, new content 8? No —
    # synthesize: round 0 -> 4 new of 4, round 1 -> 2 new of 4,
    # round 2 -> 1 new of 4 (yields 1.0, 0.5, 0.25: exact halving,
    # decay = ln(0.5), half_life = 1.0).
    import math

    from raven_spark.operators.snapshots import crawl_saturation

    rows = []
    # round 0: contents c0..c3 (all new)
    for c in range(4):
        rows.append(("A", 0, f"c{c}"))
    # round 1: c4, c5 new + c0, c1 refetched
    rows += [("A", 1, "c4"), ("A", 1, "c5"), ("A", 1, "c0"), ("A", 1, "c1")]
    # round 2: c6 new + c0, c1, c2 refetched
    rows += [("A", 2, "c6"), ("A", 2, "c0"), ("A", 2, "c1"), ("A", 2, "c2")]
    df = spark.createDataFrame(rows, "domain string, round_no int, content_key string")
    r = crawl_saturation(df).collect()[0]
    assert (r["n_rounds"], r["total_new"]) == (3, 7)
    assert abs(r["decay_rate"] - round(math.log(0.5), 6)) < 1e-6
    assert abs(r["half_life"] - 1.0) < 1e-6
    assert abs(r["last_yield"] - 0.25) < 1e-9


def test_crawl_saturation_degenerate_domains(spark):
    # B: single round -> decay NULL; C: flat yields -> slope 0 ->
    # half_life NULL (not negative/infinite).
    from raven_spark.operators.snapshots import crawl_saturation

    rows = [("B", 0, "x"), ("B", 0, "y")]
    rows += [("C", r, f"c{r}") for r in range(3)]  # 1 new of 1 each round
    df = spark.createDataFrame(rows, "domain string, round_no int, content_key string")
    got = {r["domain"]: r for r in crawl_saturation(df).collect()}
    assert got["B"]["decay_rate"] is None and got["B"]["half_life"] is None
    assert got["C"]["decay_rate"] == 0.0 and got["C"]["half_life"] is None


def test_crawl_saturation_yield_rounding_to_zero_is_excluded(spark):
    """A usable round must be one whose ROUNDED yield is > 0: gating on
    n_new > 0 let ln(round(y,dp)) = ln(0) = NULL corrupt the OLS sums
    (rows counted in m/sx/sxx but dropped from sy/sxy), reading as
    decay_rate = 0 for a collapsed domain."""
    from raven_spark.operators.snapshots import crawl_saturation

    # domain d: round 0 all-new (y=1.0); round 1 one new out of many
    # fetches with yield_dp=2 -> y rounds to 0.0 -> NOT usable -> only
    # 1 usable round -> decay_rate NULL (not a fabricated 0.0/flat fit)
    rows = [("d", 0, f"c{i}") for i in range(5)]
    rows += [("d", 1, f"c{i}") for i in range(5)]      # refetches, not new
    rows += [("d", 1, f"n{i}") for i in range(1)]      # 1 new of 6 -> 0.17
    df = spark.createDataFrame(rows, "domain string, r int, ck string")
    out = {r["domain"]: r for r in
           crawl_saturation(df, "domain", "r", "ck", yield_dp=0).collect()}
    row = out["d"]
    assert row["decay_rate"] is None  # m = 1 usable round < 2
    assert row["total_new"] == 6


def test_corpus_diff_statuses(spark):
    from raven_spark.operators.snapshots import corpus_diff, corpus_diff_stats

    old = spark.createDataFrame(
        [
            ("http://h1.ex/a", "same text"),
            ("http://h1.ex/b", "old body"),
            ("http://h2.ex/c", "going away"),
            ("http://h2.ex/d", None),
            ("http://h2.ex/e", ""),
        ],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [
            ("http://h1.ex/a", "Same   TEXT"),   # normalizes equal -> unchanged
            ("http://h1.ex/b", "new body"),       # changed
            ("http://h1.ex/n", "brand new"),      # added
            ("http://h2.ex/d", ""),               # NULL -> '' counts as changed
            ("http://h2.ex/e", ""),               # unchanged empty
        ],
        "url string, text string",
    )
    rows = {r["url"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert rows == {
        "http://h1.ex/a": "unchanged",
        "http://h1.ex/b": "changed",
        "http://h1.ex/n": "added",
        "http://h2.ex/c": "removed",
        "http://h2.ex/d": "changed",
        "http://h2.ex/e": "unchanged",
    }
    stats = {r["host"]: r for r in corpus_diff_stats(corpus_diff(old, new)).collect()}
    assert stats["h1.ex"]["n_added"] == 1 and stats["h1.ex"]["n_changed"] == 1
    assert stats["h1.ex"]["n_unchanged"] == 1 and stats["h1.ex"]["n_urls"] == 3
    assert stats["h2.ex"]["n_removed"] == 1
    assert stats["h1.ex"]["churn_ratio"] == round(2 / 3, 6)


def test_corpus_diff_partition_invariant_and_no_text_shuffle(spark):
    from raven_spark.operators.snapshots import corpus_diff

    old = spark.createDataFrame(
        [(f"http://h{i%3}.ex/{i}", f"text {i}") for i in range(100)],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [(f"http://h{i%3}.ex/{i}", f"text {i if i % 4 else -i}") for i in range(5, 105)],
        "url string, text string",
    )
    one = {tuple(r) for r in corpus_diff(old.coalesce(1), new.coalesce(1)).collect()}
    many = {tuple(r) for r in corpus_diff(old.repartition(7), new.repartition(5)).collect()}
    assert one == many
    # text is hashed BEFORE the exchange: no text column crosses it
    plan = corpus_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1)
