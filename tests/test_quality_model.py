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
    train_classifier,
    train_py,
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


# -- in-engine training (train_classifier) ---------------------------------

TRAIN_DOCS = [
    # label 1 docs share the planted word 'good'; label 0 share 'spam'
    (1, "good clean prose with varied words", 1.0),
    (2, "another good document of real text", 1.0),
    (3, "good writing appears here too", 1.0),
    (4, "spam spam buy now cheap", 0.0),
    (5, "cheap spam offer click here", 0.0),
    (6, "spam text low quality stuff", 0.0),
    (7, "", 1.0),          # empty: bias-only row
    (8, None, 0.0),        # NULL text: bias-only row
]


def _train_df(spark):
    return spark.createDataFrame(
        TRAIN_DOCS, "doc_id long, text string, label double"
    )


def test_train_matches_python_twin(spark):
    got = {
        r["bucket"]: r["weight"]
        for r in train_classifier(
            _train_df(spark), n_buckets=D, iterations=3, lr=0.5
        ).collect()
    }
    want = train_py(
        [(t, y) for _, t, y in TRAIN_DOCS], n_buckets=D, iterations=3, lr=0.5
    )
    assert set(got) == set(want)
    for b in want:
        assert got[b] == pytest.approx(want[b], abs=1e-12), b


def test_train_learns_planted_signal(spark):
    """The planted vocabulary must separate: bucket('good') gets a
    positive weight, bucket('spam') a negative one, and scoring the
    training set with the learned table ranks every positive doc above
    every negative doc."""
    w = train_classifier(_train_df(spark), n_buckets=D, iterations=5, lr=1.0)
    wmap = {r["bucket"]: r["weight"] for r in w.collect()}
    assert wmap[feature_bucket_py("good", D)] > 0
    assert wmap[feature_bucket_py("spam", D)] < 0
    scored = classifier_score(
        _train_df(spark).filter(F.col("text").isNotNull() & (F.length("text") > 0)),
        n_buckets=D,
        weights=w.filter(F.col("bucket") >= 0),
    )
    s = {r["doc_id"]: r["quality_score"] for r in scored.collect()}
    assert min(s[1], s[2], s[3]) > max(s[4], s[5], s[6])


def test_train_partition_invariant(spark):
    df = _train_df(spark)
    one = {
        tuple(r)
        for r in train_classifier(
            df.coalesce(1), n_buckets=D, iterations=2
        ).collect()
    }
    many = {
        tuple(r)
        for r in train_classifier(
            df.repartition(7), n_buckets=D, iterations=2
        ).collect()
    }
    assert one == many


def test_train_reduces_logloss(spark):
    """T=4 training must strictly reduce the mean log-loss vs the
    all-zero model (whose loss is ln 2)."""
    import math

    w = train_classifier(_train_df(spark), n_buckets=D, iterations=4, lr=1.0)
    wmap = {r["bucket"]: r["weight"] for r in w.collect()}

    def wfn(b):
        return wmap.get(b, 0.0)

    losses = []
    for _, text, y in TRAIN_DOCS:
        if text and text.strip():
            _, s = score_text_py(text, n_buckets=D, bias=wmap.get(-1, 0.0), weight_fn=wfn)
        else:
            s = 1.0 / (1.0 + math.exp(-wmap.get(-1, 0.0)))
        p = min(max(s, 1e-9), 1 - 1e-9)
        losses.append(-(y * math.log(p) + (1 - y) * math.log(1 - p)))
    assert sum(losses) / len(losses) < math.log(2.0)
