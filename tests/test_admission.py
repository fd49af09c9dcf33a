"""Frontier admission compositor (operators/admission.py): URL filter x
trap threshold x recrawl due-ness -> one auditable admit verdict."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_frontier_admission_composes_all_signals(spark):
    from raven_spark.operators.admission import frontier_admission

    now = 1_767_225_600  # 2026-01-01T00:00:00Z
    urls = [
        # (url, expected admit, reason under test)
        ("https://ok.example/page", True, "clean"),
        ("https://ads.blocked.example/x", False, "domain blocklist"),
        ("https://ok.example/a/badword/b", False, "url badword"),
        ("https://ok.example/a/a/a/a/b/c/d/e?sid=1", False, "trap score"),
        ("https://ok.example/scheduled-future", False, "not due yet"),
        ("https://ok.example/scheduled-past", True, "due"),
    ]
    cand = spark.createDataFrame([(u,) for u, _, _ in urls], "url_canon string")
    schedule = spark.createDataFrame(
        [("https://ok.example/scheduled-future", now + 9999),
         ("https://ok.example/scheduled-past", now - 1)],
        "url string, ts long",
    ).select("url", F.timestamp_seconds("ts").alias("next_fetch_ts"))
    out = frontier_admission(
        cand,
        blocked_domains=("blocked.example",),
        badwords=("badword",),
        max_trap_score=0.5,
        schedule=schedule,
        now_ts=F.timestamp_seconds(F.lit(now)),
    )
    got = {r["url_canon"]: r for r in out.collect()}
    for u, want, why in urls:
        assert got[u]["admit"] is want, (u, why, dict(got[u].asDict()))
    # per-reason audit columns carry the WHY
    assert got["https://ads.blocked.example/x"]["blocked_domain"] is True
    assert got["https://ok.example/a/badword/b"]["url_badword"] is True
    assert got["https://ok.example/a/a/a/a/b/c/d/e?sid=1"]["trap_score"] > 0.5
    assert got["https://ok.example/scheduled-future"]["due"] is False
    assert got["https://ok.example/scheduled-past"]["due"] is True


def test_frontier_admission_defaults_admit_everything(spark):
    from raven_spark.operators.admission import frontier_admission

    cand = spark.createDataFrame(
        [("https://anything.example/x",)], "url_canon string"
    )
    out = frontier_admission(cand).first()
    assert out["admit"] is True and out["due"] is True


def test_frontier_admission_schedule_requires_now(spark):
    import pytest

    from raven_spark.operators.admission import frontier_admission

    cand = spark.createDataFrame([("https://a.example/x",)], "url_canon string")
    sched = spark.createDataFrame(
        [("https://a.example/x",)], "url string"
    ).select("url", F.current_timestamp().alias("next_fetch_ts"))
    with pytest.raises(ValueError, match="now_ts"):
        frontier_admission(cand, schedule=sched)


def test_frontier_admission_now_without_schedule_rejected(spark):
    import pytest

    from raven_spark.operators.admission import frontier_admission

    cand = spark.createDataFrame([("https://a.example/x",)], "url_canon string")
    with pytest.raises(ValueError, match="requires schedule"):
        frontier_admission(cand, now_ts=0)


def test_frontier_admission_template_denylist(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from raven_spark.functions.urls import mine_url_templates
    from raven_spark.operators.admission import frontier_admission

    urls = [(f"https://t.com/cal/2026/{m}/{d}",) for m in range(5) for d in range(5)]
    urls += [("https://t.com/about",), ("https://other.com/cal/2026/1/2",)]
    cand = spark.createDataFrame(urls, "url_canon string")
    mined = mine_url_templates(cand, url_col="url_canon", min_urls=20, min_slots=2)
    deny = mined.filter("trap_suspect").select("host", "template")
    out = {r["url_canon"]: r for r in
           frontier_admission(cand, trap_templates=deny).collect()}
    # all 25 calendar URLs on t.com blocked; about page and the SAME
    # template on a different host stay admitted
    assert sum(1 for r in out.values() if r["template_blocked"]) == 25
    assert out["https://t.com/about"]["admit"] is True
    assert out["https://other.com/cal/2026/1/2"]["admit"] is True
    assert out["https://t.com/cal/2026/1/2"]["admit"] is False


def test_frontier_admission_without_templates_has_false_flag(spark):
    from raven_spark.operators.admission import frontier_admission

    cand = spark.createDataFrame([("https://a.com/x",)], "url_canon string")
    r = frontier_admission(cand).collect()[0]
    assert r["template_blocked"] is False and r["admit"] is True


def test_priority_schedule_ranks_and_caps(spark):
    # host A budget 2 (3 candidates, highest-importance two win);
    # host B absent from budgets -> default_budget=1; node 99 has no
    # importance row -> priority 0.0.
    from raven_spark.operators.admission import priority_schedule

    cand = spark.createDataFrame(
        [
            ("a", "https://a/1", 1),
            ("a", "https://a/2", 2),
            ("a", "https://a/3", 3),
            ("b", "https://b/1", 99),
            ("b", "https://b/2", 4),
        ],
        "host string, url_canon string, node bigint",
    )
    imp = spark.createDataFrame(
        [(1, 0.5), (2, 0.1), (3, 0.3), (4, 0.2)], "node bigint, importance double"
    )
    bud = spark.createDataFrame([("a", 2)], "host string, budget int")
    rows = priority_schedule(cand, imp, bud, default_budget=1).collect()
    got = {(r["host"], r["url"]): r for r in rows}
    assert set(got) == {("a", "https://a/1"), ("a", "https://a/3"), ("b", "https://b/2")}
    assert got[("a", "https://a/1")]["fetch_rank"] == 1
    assert got[("a", "https://a/3")]["fetch_rank"] == 2
    # b's single slot goes to node 4 (0.2) over node 99 (missing -> 0.0)
    assert got[("b", "https://b/2")]["priority"] == 0.2


def test_priority_schedule_tie_breaks_by_url_and_literal_cap(spark):
    from raven_spark.operators.admission import priority_schedule

    cand = spark.createDataFrame(
        [("h", f"https://h/{i:03d}", i) for i in range(10)],
        "host string, url_canon string, node bigint",
    )
    imp = spark.createDataFrame([(i, 0.1) for i in range(10)], "node bigint, importance double")
    bud = spark.createDataFrame([("h", 99)], "host string, budget int")
    # budget 99 exceeds the literal max_budget=4 cap -> exactly 4 rows,
    # tie order = url asc (zero-padded so lexicographic == numeric)
    rows = priority_schedule(cand, imp, bud, max_budget=4).collect()
    assert [r["url"] for r in sorted(rows, key=lambda r: r["fetch_rank"])] == [
        f"https://h/{i:03d}" for i in range(4)
    ]
