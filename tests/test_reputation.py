"""Host reputation: aggregate correctness on planted data, dominant-lang
tie determinism, partition invariance, frontier priority application."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raven_spark.operators.reputation import apply_host_priority, host_reputation


@pytest.fixture()
def corpus(spark):
    rows = []
    # hostA: 4 docs, 1 duplicated text (3 unique), langs en,en,en,de
    rows += [
        ("a.example", "alpha text one", "en", 0.8),
        ("a.example", "alpha text one", "en", 0.8),
        ("a.example", "alpha text two", "en", 0.6),
        ("a.example", "alpha text drei", "de", 1.4),
    ]
    # hostB: 2 docs, all unique, lang tie en/fr -> 'fr' (lexicographically larger)
    rows += [
        ("b.example", "beta one", "en", 0.5),
        ("b.example", "beta two", "fr", 0.5),
    ]
    return spark.createDataFrame(rows, "host string, text string, lang string, q double")


def test_host_reputation_values(corpus):
    rep = {r["host"]: r.asDict() for r in
           host_reputation(corpus, quality_col="q").collect()}
    a = rep["a.example"]
    assert (a["n_docs"], a["n_unique"]) == (4, 3)
    assert a["dup_rate"] == 0.25
    assert a["dominant_lang"] == "en" and a["lang_consistency"] == 0.75
    assert a["avg_quality"] == pytest.approx(0.9)
    # score: 0.5*0.75 + 0.3*0.75 + 0.2*min(0.9,1) = 0.375+0.225+0.18
    assert a["score"] == pytest.approx(0.78)
    b = rep["b.example"]
    assert b["dominant_lang"] == "fr"  # deterministic tie-break
    assert b["dup_rate"] == 0.0 and b["lang_consistency"] == 0.5


def test_host_reputation_partition_invariance(corpus):
    one = sorted(map(tuple, host_reputation(corpus.coalesce(1), quality_col="q").collect()))
    many = sorted(map(tuple, host_reputation(corpus.repartition(13), quality_col="q").collect()))
    assert one == many


def test_apply_host_priority(spark, corpus):
    rep = host_reputation(corpus, quality_col="q")
    frontier = spark.createDataFrame(
        [("a.example", 5), ("b.example", 5), ("c.example", 5), ("a.example", 0)],
        "host string, priority int",
    )
    out = {(r["host"], i): r["priority"] for i, r in
           enumerate(apply_host_priority(frontier, rep).collect())}
    got = {r["host"]: [] for r in frontier.collect()}
    for r in apply_host_priority(frontier, rep).collect():
        got[r["host"]].append(r["priority"])
    # a.example score ~0.78 -> boost floor(2.34)=2: 5->3, 0->0 (floored)
    assert sorted(got["a.example"]) == [0, 3]
    # b.example score = 0.5*1 + 0.3*0.5 + 0.2*0.5 = 0.75 -> boost 2
    assert got["b.example"] == [3]
    # unknown host: unchanged
    assert got["c.example"] == [5]
    # no shuffle added: the reputation join is broadcast
    plan = apply_host_priority(frontier, rep)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_domain_rollup_aggregates(spark):
    from raven_spark.operators.reputation import domain_rollup

    df = spark.createDataFrame(
        [
            # example.com: 2 hosts, 3 docs, one duplicate body
            ("example.com", "a.example.com", "one two three", 0.5),
            ("example.com", "b.example.com", "one two three", 0.7),
            ("example.com", "b.example.com", "four five", 0.9),
            # solo.net: 1 host, 1 doc
            ("solo.net", "solo.net", "six", 1.0),
        ],
        "domain_key string, host string, text string, q double",
    )
    out = {r["domain_key"]: r for r in domain_rollup(df, quality_col="q").collect()}
    e = out["example.com"]
    assert (e["n_docs"], e["n_hosts"], e["n_unique"]) == (3, 2, 2)
    assert e["dup_rate"] == round(1 - 2 / 3, 6)
    assert e["total_tokens"] == 8  # 3 + 3 + 2
    assert e["token_share"] == round(8 / 9, 9)
    assert e["avg_quality"] == 0.7
    s = out["solo.net"]
    assert (s["n_docs"], s["n_hosts"], s["total_tokens"]) == (1, 1, 1)
    assert s["token_share"] == round(1 / 9, 9)


def test_domain_rollup_partition_invariance(corpus):
    from pyspark.sql import functions as F

    from raven_spark.operators.reputation import domain_rollup

    base = corpus.withColumn("domain_key", F.col("host"))
    one = sorted(map(tuple, domain_rollup(base.coalesce(1), quality_col="q").collect()))
    many = sorted(map(tuple, domain_rollup(base.repartition(11), quality_col="q").collect()))
    assert one == many


def test_domain_rollup_null_text_and_host_excluded_from_distincts(spark):
    """xxhash64(NULL) is the non-NULL seed constant; without the NULL
    guard a NULL-text doc would count as one shared 'unique content'
    value and a NULL host as a real host, diverging from SQL's
    COUNT(DISTINCT x) which excludes NULLs."""
    from raven_spark.operators.reputation import domain_rollup

    df = spark.createDataFrame(
        [
            ("d.com", "a.d.com", "one two", 0.5),
            ("d.com", "a.d.com", None, 0.5),  # NULL text: not a unique body
            ("d.com", None, "three", 0.5),  # NULL host: not a host
            ("d.com", None, None, 0.5),
        ],
        "domain_key string, host string, text string, q double",
    )
    row = domain_rollup(df, quality_col="q").collect()[0]
    assert row["n_docs"] == 4
    assert row["n_hosts"] == 1  # only a.d.com
    assert row["n_unique"] == 2  # 'one two', 'three'


def test_allocate_domain_budget_exact_sum_and_fairness(spark):
    from raven_spark.operators.reputation import allocate_domain_budget

    rows = [("d%03d" % i, (i * 37) % 101 + (1 if i % 3 else 0)) for i in range(50)]
    rows += [("zero1", 0), ("zero2", 0)]
    df = spark.createDataFrame(rows, "domain string, weight long")
    total = 12345
    out = allocate_domain_budget(df, total_budget=total, n_buckets=16).collect()
    got = {r["domain"]: r["budget"] for r in out}
    w = dict(rows)
    W = sum(w.values())
    assert sum(got.values()) == total            # EXACT sum, always
    assert got["zero1"] == 0 and got["zero2"] == 0
    for dmn, wt in rows:
        share = total * wt / W
        # two-level rounding: within 2 of the exact proportional share
        assert abs(got[dmn] - share) < 2.0 + 1e-9, (dmn, got[dmn], share)

    # cap forfeits (politeness ceiling), does not redistribute
    capped = allocate_domain_budget(
        df, total_budget=total, n_buckets=16, max_per_domain=100
    ).collect()
    cg = {r["domain"]: r["budget"] for r in capped}
    assert all(b <= 100 for b in cg.values())
    assert sum(cg.values()) < total
    # uncapped domains keep their allocation
    for dmn, b in got.items():
        if b <= 100:
            assert cg[dmn] == b


def test_allocate_domain_budget_degenerate_and_invariance(spark):
    from raven_spark.operators.reputation import allocate_domain_budget

    allz = spark.createDataFrame(
        [("a", 0), ("b", 0)], "domain string, weight long"
    )
    assert all(
        r["budget"] == 0
        for r in allocate_domain_budget(allz, total_budget=10).collect()
    )

    one = spark.createDataFrame([("solo", 7)], "domain string, weight long")
    assert allocate_domain_budget(one, total_budget=42).collect()[0]["budget"] == 42

    rows = [("d%03d" % i, i % 9 + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "domain string, weight long")
    a = sorted(map(tuple, allocate_domain_budget(df.repartition(1), 999).collect()))
    b = sorted(map(tuple, allocate_domain_budget(df.repartition(7), 999).collect()))
    assert a == b


def test_allocate_domain_budget_halfup_boundary_and_null_domain(spark):
    from raven_spark.operators.reputation import allocate_domain_budget

    # HALF_UP regression: T*cum/W = 0.9999999 for the first domain —
    # Spark's decimal '/' rounds to 1.000000 at scale 6, so a naive
    # floor gives 1; the exact Hamilton floor is 0
    df = spark.createDataFrame(
        [("a", 1), ("b", 9_999_999)], "domain string, weight long"
    )
    out = {
        r["domain"]: r["budget"]
        for r in allocate_domain_budget(df, 9_999_999, n_buckets=1).collect()
    }
    assert out["a"] == 0 and out["b"] == 9_999_999

    # NULL domain coalesces to "" and keeps the exact-sum contract
    # (a NULL bucket key would silently drop the row at the join)
    df2 = spark.createDataFrame(
        [(None, 5), ("x", 5)], "domain string, weight long"
    )
    rows = allocate_domain_budget(df2, 10, n_buckets=4).collect()
    assert sum(r["budget"] for r in rows) == 10
    assert {r["domain"] for r in rows} == {"", "x"}
