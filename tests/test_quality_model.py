"""Hashed linear quality classifier (operators/quality_model.py):
differential vs the pure-Python twin, weights-table path, empty-doc and
partition invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raven_spark.operators.quality_model import (
    classifier_score,
    feature_bucket_py,
    score_text_py,
)

D = 1 << 14

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "the the the the the"),
    (3, "zxqj vwpk qqqq"),
    (4, "   "),
    (5, ""),
    (6, "solo"),
    (7, "Mixed   CASE and\twhitespace\ncollapse"),
    (8, "café naïve résumé unicode café"),
]


def test_classifier_matches_python_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_feats"], r["quality_score"])
           for r in classifier_score(df, n_buckets=D, bias=0.1).collect()}
    for doc_id, text in DOCS:
        n, s = score_text_py(text, n_buckets=D, bias=0.1)
        assert got[doc_id][0] == n, doc_id
        if s is None:
            assert got[doc_id][1] is None
        else:
            assert got[doc_id][1] == pytest.approx(s, abs=1e-6), doc_id


def test_classifier_weights_table_path(spark):
    """Learned-weights path (explode + broadcast join) agrees with the
    twin given the same weight function; unknown buckets weigh 0."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    # weight only the buckets of doc 2's features; everything else 0.0
    feats = ["the", "the the"]
    wrows = [(feature_bucket_py(f, D), 0.5) for f in feats]
    weights = spark.createDataFrame(sorted(set(wrows)), "bucket long, weight double")
    got = {r["doc_id"]: r for r in
           classifier_score(df, n_buckets=D, weights=weights).collect()}

    def wfn(b):
        table = dict(set(wrows))
        return table.get(b, 0.0)

    for doc_id, text in DOCS:
        n, s = score_text_py(text, n_buckets=D, weight_fn=wfn)
        assert got[doc_id]["n_feats"] == n, doc_id
        if s is None:
            assert got[doc_id]["quality_score"] is None
        else:
            assert got[doc_id]["quality_score"] == pytest.approx(s, abs=1e-6), doc_id
    # doc 2 is all 'the': mean weight 0.5 -> sigmoid(0.5) ~ 0.622459
    assert got[2]["quality_score"] == pytest.approx(0.622459, abs=1e-6)


def test_classifier_partition_invariant(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    one = {tuple(r) for r in classifier_score(df.coalesce(1), n_buckets=D).collect()}
    many = {tuple(r) for r in classifier_score(df.repartition(7), n_buckets=D).collect()}
    assert one == many


def test_classifier_plan_is_shuffle_free(spark):
    """The synthetic-model path must fuse into the scan: no exchange."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = classifier_score(df, n_buckets=D)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_classifier_null_text_both_paths_agree(spark):
    """Regression (code-review r4): NULL text must score (n_feats=0,
    score=NULL) on BOTH scorer paths — the synthetic path used to
    propagate NULL through F.size (n_feats NULL), disagreeing with the
    weights path's explode_outer+count (n_feats 0) and failing the q51
    oracle's coalesce(n_feats, 0) = 0 check."""
    df = spark.createDataFrame(
        [(1, None), (2, "real words here")], "doc_id long, text string"
    )
    synth = {r["doc_id"]: r for r in classifier_score(df, n_buckets=D).collect()}
    assert synth[1]["n_feats"] == 0 and synth[1]["quality_score"] is None
    assert synth[2]["n_feats"] > 0

    weights = spark.createDataFrame([(0, 0.5)], "bucket bigint, weight double")
    learned = {r["doc_id"]: r
               for r in classifier_score(df, n_buckets=D, weights=weights).collect()}
    assert learned[1]["n_feats"] == 0 and learned[1]["quality_score"] is None
    assert (synth[1]["n_feats"], synth[1]["quality_score"]) == (
        learned[1]["n_feats"], learned[1]["quality_score"])
