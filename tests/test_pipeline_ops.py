"""Corpus-pipeline composition ops (operators/pipeline.py): deterministic
hash split, duplicate-n-gram repetition signal, composed clean verdict."""

from __future__ import annotations

from pyspark.sql import functions as F

from raven_spark.operators.pipeline import (
    clean_corpus,
    dup_ngram_frac,
    hash_split,
)


def test_hash_split_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df, val_permille=100, test_permille=50).collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(df.repartition(17), val_permille=100, test_permille=50).collect()}
    assert a == b  # order/partitioning independent
    # proportions roughly match the permilles (multiplicative hash mixes)
    from collections import Counter

    c = Counter(a.values())
    assert 0.07 < c["val"] / 5000 < 0.13
    assert 0.03 < c["test"] / 5000 < 0.07
    assert c["train"] == 5000 - c["val"] - c["test"]


def test_dup_ngram_frac_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e"),            # 4 distinct 2-grams -> 0.0
            (2, "a b a b a b"),          # 5 grams: {a b, b a} -> 3/5 dup
            (3, "x"),                    # shorter than n -> 0 grams, 0.0
            (4, ""),                     # empty -> 0.0
            (5, "w w w w"),              # 3 grams all 'w w' -> 2/3
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["dup_ngram_frac"]
           for r in dup_ngram_frac(df, n=2).collect()}
    assert out[1] == 0.0
    assert abs(out[2] - 3 / 5) < 1e-6
    assert out[3] == 0.0 and out[4] == 0.0
    assert abs(out[5] - 2 / 3) < 1e-6


def test_clean_corpus_reasons(spark):
    en = ("the cat and the dog went to the house and it is a fine day "
          "that is good for the walk in the park for everyone today")
    df = spark.createDataFrame(
        [
            (1, en),                          # keeps: en, decent quality
            (2, en),                          # exact dup of 1 -> not canonical
            (3, "der hund und die katze ist nicht hier und der tag ist gut"),  # de
            (4, "the the the the the the the the the the the the"),  # repetitive
            (5, "!!! ??? ,,, ;;; :::"),       # junk -> und + low quality
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r.asDict() for r in
           clean_corpus(df, allowed_langs=("en",), min_quality=0.3,
                        max_dup_frac=0.3, ngram_n=2).collect()}
    assert out[1]["keep"] is True and out[1]["is_canonical"] is True
    assert out[2]["keep"] is False and out[2]["is_canonical"] is False
    assert out[3]["keep"] is False and out[3]["lang_ok"] is False
    assert out[4]["keep"] is False and out[4]["rep_ok"] is False
    assert out[5]["keep"] is False
    assert out[5]["lang_pred"] == "und"
