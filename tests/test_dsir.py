"""DSIR importance resampling (operators/dsir.py) — differential vs the
pure-Python twin, Gumbel determinism, and partition invariance."""

from __future__ import annotations

import math

import pytest

from raven_spark.operators.dsir import (
    corpus_bucket_counts_py,
    dsir_logweight_py,
    dsir_logweights,
    dsir_select,
)

RAW = {
    1: "the cat sat on the mat",
    2: "quantum chromodynamics lattice gauge theory",
    3: "the dog sat on the log",
    4: "cat mat cat mat cat",
    5: "",
    6: None,
    7: "lattice gauge simulations of quark confinement",
}
TARGET = {
    100: "the cat and the dog sat together",
    101: "a cat on a mat",
}
D = 1 << 10


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(list(RAW.items()), "doc_id bigint, text string")
    tgt = spark.createDataFrame(list(TARGET.items()), "doc_id bigint, text string")
    return raw, tgt


def _expected():
    tc = corpus_bucket_counts_py([t for t in TARGET.values() if t], D)
    rc = corpus_bucket_counts_py([t for t in RAW.values() if t], D)
    return {
        i: dsir_logweight_py(t or "", tc, rc, D)
        for i, t in RAW.items()
    }


def test_dsir_logweights_vs_python_twin(spark, frames):
    raw, tgt = frames
    got = {
        r["doc_id"]: (r["n_feats"], r["log_weight"])
        for r in dsir_logweights(raw, tgt, n_buckets=D).collect()
    }
    exp = _expected()
    assert set(got) == set(RAW)
    for i in RAW:
        assert got[i][0] == exp[i][0], i
        if exp[i][1] is None:
            assert got[i][1] is None
        else:
            assert got[i][1] == pytest.approx(exp[i][1], abs=2e-6), i
    # cat/mat docs should out-score the physics docs against this target
    assert got[1][1] > got[2][1] and got[4][1] > got[7][1]


def test_dsir_select_topk_and_gumbel(spark, frames):
    raw, tgt = frames
    top = dsir_select(raw, tgt, k=3, n_buckets=D).collect()
    assert [r["rank"] for r in top] == [1, 2, 3]
    exp = {i: w for i, (n, w) in _expected().items() if w is not None}
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [r["doc_id"] for r in top] == [i for i, _ in want]
    assert all(r["sel_score"] == r["log_weight"] for r in top)

    g1 = dsir_select(raw, tgt, k=3, n_buckets=D, gumbel=True).collect()
    g2 = dsir_select(raw, tgt, k=3, n_buckets=D, gumbel=True).collect()
    assert [tuple(r) for r in g1] == [tuple(r) for r in g2]  # deterministic
    for r in g1:
        assert r["sel_score"] != r["log_weight"]  # noise actually applied


def test_dsir_partition_invariance(spark, frames):
    raw, tgt = frames
    one = sorted(
        map(tuple, dsir_logweights(raw.coalesce(1), tgt, n_buckets=D).collect())
    )
    many = sorted(
        map(tuple, dsir_logweights(raw.repartition(7), tgt.repartition(3),
                                   n_buckets=D).collect())
    )
    assert one == many


def test_dsir_gumbel_coin_matches_formula(spark):
    from pyspark.sql import functions as F

    from raven_spark.operators.dsir import gumbel_coin_col

    ids = [0, 1, 17, 999_999_999, 10**12]
    df = spark.createDataFrame([(i,) for i in ids], "id bigint")
    got = {
        r["id"]: r["g"]
        for r in df.select("id", gumbel_coin_col(F.col("id")).alias("g")).collect()
    }
    for i in ids:
        u = (((i % 1_000_000_007) * 2654435761) % 1_000_000 + 0.5) / 1_000_000
        assert got[i] == pytest.approx(-math.log(-math.log(u)), rel=1e-12)
