"""Unicode normalization: NFC merges composed/decomposed spellings,
NFKC additionally folds compatibility forms, ASCII fast path is
identity, and the dedup identity integrates with exact_dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from raven_spark.functions.unicode_norm import unicode_norm_col

COMPOSED = "café one"          # é as one codepoint
DECOMPOSED = "café one"       # e + combining acute
FULLWIDTH = "ＣＡＦＥ one"  # ＣＡＦＥ


def test_nfc_merges_spellings(spark):
    df = spark.createDataFrame(
        [(1, COMPOSED), (2, DECOMPOSED), (3, "CAFÉ   one "), (4, FULLWIDTH)],
        "id int, text string",
    )
    out = {r["id"]: r["n"] for r in
           df.select("id", unicode_norm_col(F.col("text")).alias("n")).collect()}
    assert out[1] == out[2] == out[3] == "café one"
    assert out[4] != out[1]  # NFC is canonical-only: fullwidth stays


def test_nfkc_folds_compatibility(spark):
    df = spark.createDataFrame(
        [(1, FULLWIDTH), (2, "CAFE one")], "id int, text string"
    )
    out = {r["id"]: r["n"] for r in
           df.select("id", unicode_norm_col(F.col("text"), "NFKC").alias("n")).collect()}
    assert out[1] == out[2] == "cafe one"


def test_ascii_identity(spark):
    df = spark.createDataFrame([(1, "  Plain ASCII\ttext  ")], "id int, text string")
    got = df.select(unicode_norm_col(F.col("text")).alias("n")).first()["n"]
    assert got == "plain ascii text"


def test_exact_dedup_with_unicode_identity(spark):
    """Swapping the dedup identity to unicode_norm_col groups the NFC
    spellings the ASCII transform keeps apart."""
    from raven_spark.operators.dedup import norm_text_col

    df = spark.createDataFrame(
        [(1, "résumé doc"), (2, "résumé doc")],
        "doc_id long, text string",
    )
    ascii_groups = df.select(norm_text_col(F.col("text")).alias("k")).distinct().count()
    uni_groups = df.select(unicode_norm_col(F.col("text")).alias("k")).distinct().count()
    assert ascii_groups == 2 and uni_groups == 1
