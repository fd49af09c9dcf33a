"""Curation-funnel family (split from pipeline.py, round 5 — pure move).

The composed end-to-end corpus curation jobs (per-row flag funnel and
the joined clean->langid->quality->dedup->decontaminate funnel).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from raven_spark.operators.dedup import (
    ngrams_zip_col,
    norm_text_col,
)
from raven_spark.operators.pipeline_filters import c4_filters


def filter_funnel(
    df: DataFrame,
    rules: "list[tuple[str, Column]]",
) -> DataFrame:
    """Filter-ablation funnel (the FineWeb/RefinedWeb reporting table):
    apply an ORDERED list of (name, keep-predicate) rules and report,
    per stage, how many documents reached it, how many it dropped, and
    how many survived — the attrition accounting every corpus-cleaning
    pipeline publishes next to its filters.

    ONE corpus pass: each row is assigned its FIRST failing stage (a
    single chained CASE, codegen'd into the scan — a NULL predicate
    counts as fail, matching ``df.filter``'s drop-null semantics), then
    one map-side-combinable count per stage index. The naive
    alternative — len(rules) sequential ``df.filter().count()`` actions
    — scans the corpus once per rule; this plan scans once total, so at
    100 TB the funnel costs the same as any single filter.

    The per-stage cumulative (docs reaching stage k = N minus drops
    before k) is computed by a window over the O(rules)-row aggregate,
    never over the corpus.

    Output: (stage 1.., rule, n_in, n_dropped, n_out), n_out of the
    last stage = surviving corpus size.
    """
    if not rules:
        raise ValueError("filter_funnel: rules must be non-empty")
    fail = F.lit(0)
    case = None
    for j, (_, pred) in enumerate(rules, start=1):
        clause = ~F.coalesce(pred, F.lit(False))
        case = F.when(clause, F.lit(j)) if case is None else case.when(clause, F.lit(j))
    fail = case.otherwise(F.lit(0))
    counts = df.select(fail.alias("__fail")).groupBy("__fail").agg(
        F.count(F.lit(1)).alias("__n")
    )
    spark = df.sparkSession
    stages = spark.createDataFrame(
        [(j, name) for j, (name, _) in enumerate(rules, start=1)],
        "stage int, rule string",
    )
    total = counts.agg(F.sum("__n").alias("__total"))
    per = (
        stages.join(counts, stages["stage"] == counts["__fail"], "left")
        .select("stage", "rule", F.coalesce("__n", F.lit(0)).alias("n_dropped"))
        .crossJoin(F.broadcast(total))
    )
    w = (
        Window.orderBy("stage")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return per.select(
        "stage",
        "rule",
        (
            F.coalesce(F.col("__total"), F.lit(0))
            - F.coalesce(F.sum("n_dropped").over(w), F.lit(0))
        ).alias("n_in"),
        "n_dropped",
    ).withColumn("n_out", F.col("n_in") - F.col("n_dropped"))

def curation_funnel(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_keep: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    ngram_n: int = 5,
    badwords: tuple[str, ...] = (),
    emit: str = "funnel",
) -> DataFrame:
    """END-TO-END corpus curation as ONE composed job — the standard
    Common-Crawl-to-training-set recipe wired through this engine's own
    proven stages, with an exact per-stage attrition FUNNEL (the
    operational artifact every curation run ships with — "we started
    with N pages and kept M, and here is where the other N-M went"):

        1 input          -> corpus rows
        2 c4_clean       -> c4_filters page verdict (Raffel §2.2, q62)
        3 lang           -> lang_id over the CLEANED text in lang_keep
        4 quality        -> quality_score over cleaned text >= threshold
        5 exact_dedup    -> min-id canonical per normalized clean text,
                            ranked AMONG stage-4 survivors only
        6 decontaminate  -> drop docs whose CLEANED text shares any
                            distinct word ``ngram_n``-gram with the
                            benchmark set (q35 logic; bench grams
                            broadcast; corpus-side grams come from
                            clean_text so the verdict describes the
                            bytes stage 6 actually emits)

    Unlike q88's per-row filter funnel (flags with first-fail
    attribution), stages 5-6 need JOINS — a dedup verdict depends on
    which OTHER docs survived stage 4 — so this is the integration the
    flag funnel cannot express.

    Scale shape: stages 1-4 are one codegen'd projection; stage 5
    ranks only stage-4 survivors on an 8-byte hash key; stage 6 is the
    q35 broadcast gram probe. The funnel itself is ONE aggregate row
    exploded to 6 (stage, name, rows_in, rows_out) rows — counts are
    exact and partition-independent.

    ``emit``: "funnel" (default) returns the 6-row attrition table;
    "docs" returns the surviving (id, clean_text) corpus.
    """
    from raven_spark.functions.text import lang_id_col, quality_cols
    from raven_spark.operators.dedup import ngrams_zip_col, norm_text_col

    fl = c4_filters(corpus, text_col=text_col, badwords=badwords).select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__raw"),
        "clean_text",
        "c4_keep",
    )
    lang_ok = lang_id_col(F.col("clean_text")).isin(*lang_keep)
    q_ok = quality_cols(F.col("clean_text"))["quality_score"] >= F.lit(
        float(min_quality)
    )
    staged = fl.select(
        "__id",
        "__raw",
        "clean_text",
        F.col("c4_keep").alias("__k1"),
        (F.col("c4_keep") & lang_ok).alias("__k2"),
        (F.col("c4_keep") & lang_ok & q_ok).alias("__k3"),
    ).localCheckpoint(eager=False)
    w = Window.partitionBy("__h").orderBy(F.col("__id").asc())
    canon = (
        staged.filter(F.col("__k3"))
        .select(
            "__id", F.xxhash64(norm_text_col(F.col("clean_text"))).alias("__h")
        )
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("__id", F.lit(True).alias("__canon"))
    )
    def _grams(col):
        return F.array_distinct(
            F.filter(
                ngrams_zip_col(F.split(norm_text_col(col), " "), int(ngram_n)),
                lambda x: x.isNotNull(),
            )
        )

    # corpus-side grams come from the STAGED clean_text, not the raw
    # text: the artifact stage 6 emits IS clean_text, so the verdict
    # must describe those bytes — raw-side grams can drop a doc for a
    # benchmark n-gram c4_clean already stripped (over-drop) and miss a
    # contaminated gram spanning removed-line boundaries (under-drop).
    # Bench-side grams stay over the raw benchmark text (the benchmark
    # is the contamination source in its published form).
    bgrams = bench.select(F.explode(_grams(F.col(text_col))).alias("g")).distinct()
    dirty = (
        staged.select("__id", F.explode(_grams(F.col("clean_text"))).alias("g"))
        .join(F.broadcast(bgrams), "g", "left_semi")
        .select("__id")
        .distinct()
        .withColumn("__dirty", F.lit(True))
    )
    full = (
        staged.join(canon, "__id", "left")
        .join(dirty, "__id", "left")
        .select(
            "__id",
            "clean_text",
            "__k1",
            "__k2",
            "__k3",
            (F.col("__k3") & F.coalesce("__canon", F.lit(False))).alias("__k4"),
            (
                F.col("__k3")
                & F.coalesce("__canon", F.lit(False))
                & ~F.coalesce("__dirty", F.lit(False))
            ).alias("__k5"),
        )
    )
    if emit == "docs":
        return full.filter(F.col("__k5")).select(
            F.col("__id").alias(id_col), "clean_text"
        )
    if emit != "funnel":
        raise ValueError(f"curation_funnel: unknown emit {emit!r}")
    one = full.agg(
        F.count(F.lit(1)).alias("n0"),
        *[
            F.sum(F.col(f"__k{i}").cast("long")).alias(f"n{i}")
            for i in range(1, 6)
        ],
    )
    names = ["input", "c4_clean", "lang", "quality", "exact_dedup", "decontaminate"]
    stages = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage"),
                F.lit(names[i]).alias("name"),
                F.col(f"n{max(i - 1, 0)}").alias("rows_in"),
                F.col(f"n{i}").alias("rows_out"),
            )
            for i in range(6)
        ]
    )
    return one.select(F.explode(stages).alias("s")).select(
        "s.stage", "s.name", "s.rows_in", "s.rows_out"
    )
