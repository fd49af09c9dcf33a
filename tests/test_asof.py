"""Backward as-of join: semantics vs pandas merge_asof, equal-ts
inclusion, tolerance, left multiplicity, partition invariance."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest

from raven_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2026-01-01T10:00:00"), "a"),
            (1, _ts("2026-01-01T11:00:00"), "b"),
            (1, _ts("2026-01-01T09:00:00"), "early"),   # before any snapshot
            (2, _ts("2026-01-01T10:30:00"), "c"),
            (2, _ts("2026-01-01T10:30:00"), "c2"),      # duplicate left ts kept
            (3, _ts("2026-01-01T12:00:00"), "nokey"),   # key absent on right
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2026-01-01T09:30:00"), 10.0),
            (1, _ts("2026-01-01T10:00:00"), 20.0),      # equal-ts: must match 10:00
            (1, _ts("2026-01-01T10:59:00"), 30.0),
            (2, _ts("2026-01-01T08:00:00"), 40.0),
        ],
        "k int, ts timestamp, snap double",
    )
    return left, right


def test_asof_backward_semantics(spark, frames):
    left, right = frames
    out = {
        (r["k"], r["tag"]): r["snap"]
        for r in asof_join(left, right, on="k").collect()
    }
    assert out[(1, "a")] == 20.0      # equal ts matches (>= semantics)
    assert out[(1, "b")] == 30.0
    assert out[(1, "early")] is None  # nothing at-or-before
    assert out[(2, "c")] == 40.0
    assert out[(2, "c2")] == 40.0     # left multiplicity preserved
    assert out[(3, "nokey")] is None
    assert asof_join(left, right, on="k").count() == left.count()


def test_asof_matches_pandas_merge_asof(spark):
    """Differential vs pandas merge_asof on 2k random rows."""
    import numpy as np

    rng = np.random.RandomState(11)
    lt = pd.DataFrame({
        "k": rng.randint(0, 20, 2000),
        "ts": pd.to_datetime(rng.randint(0, 10**6, 2000) * 10**9),
        "lid": np.arange(2000),
    })
    rt = pd.DataFrame({
        "k": rng.randint(0, 20, 500),
        "ts": pd.to_datetime(rng.randint(0, 10**6, 500) * 10**9),
        "val": rng.rand(500),
    })
    rt = rt.drop_duplicates(["k", "ts"])  # unique (key, ts): tie-free oracle
    want = pd.merge_asof(
        lt.sort_values("ts"), rt.sort_values("ts"), on="ts", by="k"
    ).set_index("lid")["val"]
    got = (
        asof_join(
            spark.createDataFrame(lt, "k int, ts timestamp, lid long"),
            spark.createDataFrame(rt, "k int, ts timestamp, val double"),
            on="k",
        )
        .toPandas()
        .set_index("lid")["val"]
    )
    aligned = pd.concat([want.rename("w"), got.rename("g")], axis=1)
    mism = aligned[
        ~((aligned.w == aligned.g) | (aligned.w.isna() & aligned.g.isna()))
    ]
    assert len(mism) == 0, mism.head()


def test_asof_tolerance(spark, frames):
    left, right = frames
    out = {
        (r["k"], r["tag"]): r["snap"]
        for r in asof_join(left, right, on="k", tolerance_seconds=600).collect()
    }
    assert out[(1, "a")] == 20.0       # 0s gap: inside tolerance
    assert out[(1, "b")] == 30.0       # 60s gap
    assert out[(2, "c")] is None       # 9000s gap: outside
    assert out[(3, "nokey")] is None


def test_asof_partition_invariance(spark, frames):
    left, right = frames
    a = sorted(map(tuple, asof_join(left.repartition(1), right.repartition(1), on="k")
                   .select("k", "tag", "snap").collect()))
    b = sorted(map(tuple, asof_join(left.repartition(16), right.repartition(7), on="k")
                   .select("k", "tag", "snap").collect()))
    assert a == b


def test_asof_collision_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("snap", "tag"), on="k")


def test_asof_composite_key(spark):
    left = spark.createDataFrame(
        [(1, "x", _ts("2026-01-01T10:00:00"), "l1"),
         (1, "y", _ts("2026-01-01T10:00:00"), "l2")],
        "k int, sub string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, "x", _ts("2026-01-01T09:00:00"), 1.0),
         (1, "y", _ts("2026-01-01T09:30:00"), 2.0)],
        "k int, sub string, ts timestamp, snap double",
    )
    out = {(r["k"], r["sub"]): r["snap"]
           for r in asof_join(left, right, on=["k", "sub"]).collect()}
    assert out[(1, "x")] == 1.0 and out[(1, "y")] == 2.0
