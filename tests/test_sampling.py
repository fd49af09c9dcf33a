"""Deterministic sampling: fraction accuracy, rerun/partition stability,
salt independence, stratified caps, hash-sample + cap composition."""

from __future__ import annotations

from raven_spark.operators.sampling import hash_sample, stratified_cap


def _docs(spark, n=20_000):
    return spark.range(n, numPartitions=8).selectExpr(
        "id as doc_id",
        "concat('src', pmod(id, 5)) as source",
        "pmod(xxhash64(id, 'q'), 100) as quality",
    )


def test_hash_sample_fraction_and_determinism(spark):
    d = _docs(spark)
    s = hash_sample(d, "doc_id", 0.25)
    c = s.count()
    assert abs(c / 20_000 - 0.25) < 0.02
    # rerun + different partitioning -> identical membership
    s2 = hash_sample(d.repartition(3), "doc_id", 0.25)
    assert s.select("doc_id").exceptAll(s2.select("doc_id")).count() == 0
    assert s2.count() == c


def test_hash_sample_nested_fractions(spark):
    """A 10% sample of a 50% sample must equal the intersection of the
    two membership functions — and different salts stay independent."""
    d = _docs(spark)
    a = hash_sample(d, "doc_id", 0.5, salt="a")
    ab = hash_sample(a, "doc_id", 0.5, salt="b")
    frac = ab.count() / 20_000
    assert abs(frac - 0.25) < 0.02
    # same salt: nesting is idempotent (the coin is identical)
    aa = hash_sample(a, "doc_id", 0.5, salt="a")
    assert aa.count() == a.count()


def test_hash_sample_zero_shuffle(spark):
    plan = hash_sample(_docs(spark), "doc_id", 0.1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_cap_counts_and_determinism(spark):
    d = _docs(spark)
    capped = stratified_cap(d, "source", 100, "doc_id")
    per = {r["source"]: r["c"] for r in
           capped.groupBy("source").count().withColumnRenamed("count", "c").collect()}
    assert per == {f"src{i}": 100 for i in range(5)}
    again = stratified_cap(d.repartition(16), "source", 100, "doc_id")
    assert capped.select("doc_id").exceptAll(again.select("doc_id")).count() == 0


def test_stratified_cap_rank_col(spark):
    """With rank_col, the cap keeps the n smallest scores per stratum."""
    d = _docs(spark)
    best = stratified_cap(d, "source", 10, "doc_id", rank_col="quality")
    rows = best.groupBy("source").agg({"quality": "max"}).collect()
    # the max kept quality must not exceed the 10th-smallest per stratum
    for r in rows:
        src = r["source"]
        tenth = sorted(
            x["quality"] for x in d.filter(f"source = '{src}'").collect()
        )[9]
        assert r["max(quality)"] <= tenth


def test_cap_small_stratum_passthrough(spark):
    d = _docs(spark, n=30).filter("source = 'src0'")
    assert stratified_cap(d, "source", 100, "doc_id").count() == d.count()
