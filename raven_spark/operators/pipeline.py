"""Corpus-pipeline composition ops — the operations a training-data
pipeline runs AFTER the crawl, composed from the engine's kernels:

- ``hash_split``: deterministic train/val/test assignment by a
  multiplicative id hash — reproducible across runs/engines (the split
  must never depend on row order or partitioning), SQL-replayable
  (Knuth multiplicative hashing; plain BIGINT arithmetic, overflow-free
  for the full bigint id domain — see split_col).
- ``dup_ngram_frac``: Gopher-style duplicate n-gram fraction per doc
  (fraction of word n-grams that are repeats within the document) — a
  repetition-quality signal; pure column algebra.
- ``clean_corpus``: the composed keep/drop verdict: language allowlist x
  quality threshold x repetition cap x exact-dup canonical-id — each
  reason kept as its own column so downstream audits see WHY a doc
  dropped (at 100 TB you never re-run a filter to find out).

All three are whole-stage-codegen column algebra (no Python, no UDFs),
so they run at scan speed and their DuckDB oracles replay the identical
arithmetic (driver queries q30-q32).

The reference has no corpus ops at all (it stops at persistence); these
are task-brief-mandated LLM-pipeline additions, same tier as
operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raven_spark.operators.dedup import norm_text_col

# Knuth multiplicative hash constant (2^32 * golden ratio conjugate)
KNUTH_32 = 2654435761


def split_col(id_col: Column, val_permille: int = 100, test_permille: int = 0) -> Column:
    """Deterministic split label from an integer id: bucket = (id *
    2654435761) mod 1000; [0, test) -> 'test', [test, test+val) -> 'val',
    rest -> 'train'. Stable under repartitioning and engine changes.

    Computed as ((id mod 1000) * K) mod 1000 — identical by modular
    arithmetic for ALL ids, but the multiplicand stays < 1000 so the
    product (< 2.66e12) never overflows signed 64-bit (id * K would
    overflow for ids >= ~3.47e9: ANSI-mode failure / silent wrap)."""
    bucket = F.pmod(F.pmod(id_col.cast("bigint"), F.lit(1000)) * F.lit(KNUTH_32), F.lit(1000))
    return (
        F.when(bucket < test_permille, F.lit("test"))
        .when(bucket < test_permille + val_permille, F.lit("val"))
        .otherwise(F.lit("train"))
    )


def hash_split(
    df: DataFrame, id_col: str = "doc_id", val_permille: int = 100,
    test_permille: int = 0, out_col: str = "split",
) -> DataFrame:
    return df.withColumn(out_col, split_col(F.col(id_col), val_permille, test_permille))


def _word_ngrams_all(text: Column, n: int) -> Column:
    """Word n-grams WITH repeats (unlike dedup.word_shingles_col, which
    dedups for set-Jaccard) — repetition measurement needs multiplicity."""
    words = F.split(norm_text_col(text), " ")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(k > 0, grams).otherwise(F.array().cast("array<string>"))


def dup_ngram_frac_col(text: Column, n: int = 10) -> Column:
    """Fraction of word n-grams that are duplicates of an earlier n-gram
    in the same document: (count - distinct) / count; 0.0 when the doc is
    shorter than n words."""
    grams = _word_ngrams_all(text, n)
    cnt = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return F.round(
        (cnt - distinct).cast("double") / F.greatest(cnt, F.lit(1)).cast("double"), 6
    )


def dup_ngram_frac(
    df: DataFrame, text_col: str = "text", n: int = 10, out_col: str = "dup_ngram_frac"
) -> DataFrame:
    return df.withColumn(out_col, dup_ngram_frac_col(F.col(text_col), n))


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    allowed_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    max_dup_frac: float = 0.3,
    ngram_n: int = 10,
) -> DataFrame:
    """Composed corpus-clean verdict. Output columns:

    id, lang_pred, quality_score, dup_frac, lang_ok, quality_ok, rep_ok,
    is_canonical (lowest id among exact-normalized-text duplicates), keep.

    Everything is column algebra over one scan + one window (the
    canonical-id min over the normalized text), so the plan is a single
    stage plus one shuffle on the dedup key.
    """
    from pyspark.sql import Window

    from raven_spark.functions.text import lang_id_col, quality_cols

    q = quality_cols(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("id"),
        lang_id_col(F.col(text_col)).alias("lang_pred"),
        q["quality_score"].alias("quality_score"),
        dup_ngram_frac_col(F.col(text_col), ngram_n).alias("dup_frac"),
        # the canonical-id window shuffles on the 8-byte hash of the
        # normalized text, never the text itself (same collision class as
        # exact_dedup's hash variant: ~1e-9 per pair at 1e10 docs) — at
        # corpus scale the shuffle key must not be a full document
        F.xxhash64(norm_text_col(F.col(text_col))).alias("__norm_hash"),
    )
    w = Window.partitionBy("__norm_hash")
    scored = base.withColumn("__min_id", F.min("id").over(w)).withColumn(
        "is_canonical", F.col("id") == F.col("__min_id")
    )
    lang_ok = F.col("lang_pred").isin(*allowed_langs)
    quality_ok = F.col("quality_score") >= F.lit(min_quality)
    rep_ok = F.col("dup_frac") <= F.lit(max_dup_frac)
    return scored.select(
        "id",
        "lang_pred",
        "quality_score",
        "dup_frac",
        lang_ok.alias("lang_ok"),
        quality_ok.alias("quality_ok"),
        rep_ok.alias("rep_ok"),
        "is_canonical",
        (lang_ok & quality_ok & rep_ok & F.col("is_canonical")).alias("keep"),
    )
