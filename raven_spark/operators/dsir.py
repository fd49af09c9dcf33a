"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169): pick the raw-corpus documents whose hashed-n-gram
distribution looks most like a small TARGET corpus. The standard
pretraining-data curation move the pipeline stack lacked: the quality
classifier (operators/quality_model.py) scores "is this good text",
DSIR scores "is this text like MY target domain".

    features(x)   = unigram + bigram words, hashed into D buckets
                    (quality_model.feature_bucket_col — the engine's
                    SQL-replayable poly-31/Knuth convention)
    p_t, p_r      = add-alpha-smoothed bucket unigram models of the
                    target and raw corpora:
                    p(b) = (count_b + alpha) / (total + alpha * D)
    log w(x)      = sum over feature OCCURRENCES f in x of
                    ln p_t(bucket(f)) - ln p_r(bucket(f))
    select        = top-k by log w (optionally Gumbel-perturbed, which
                    turns argmax into sampling-without-replacement from
                    the importance distribution — the paper's sampled
                    variant; our Gumbel is the Knuth-coin so replays
                    exactly in SQL)

Scale shape (the point at 100 TB): the two bucket models are map-side-
combinable aggregates over 8-byte bucket keys — feature text never
shuffles; the joined log-ratio table is O(D) rows (D ~ 1e4-1e5, KBs-MBs)
and is BROADCAST; per-doc scoring is explode -> broadcast join ->
groupBy(id) sum, whose partial aggregation collapses each doc back to
one row per map task, so the only per-corpus shuffle carries one 16-byte
row per document. Selection is orderBy().limit(k) = TakeOrdered (per-
partition heap top-k, no global sort). Nothing lands on the driver.

Reference seam: the reference crawler persists raw bytes and has no
selection models (crawler.rs); task-brief LLM-pipeline tier, composing
quality_model's featurizer with sampling.py's deterministic coin.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from raven_spark.operators.quality_model import _features, feature_bucket_col
from raven_spark.operators.sampling import _DENOM, knuth_coin


def _bucket_counts(df: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    """(bucket, cnt) over all feature occurrences of a corpus. Map-side
    combinable; the shuffle key is the 8-byte bucket id."""
    return (
        df.select(F.explode(_features(F.col(text_col))).alias("__f"))
        .select(feature_bucket_col(F.col("__f"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_ratio_table(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1 << 14,
    alpha: float = 1.0,
) -> DataFrame:
    """(bucket, log_ratio) for every bucket seen in either corpus —
    ln p_target(b) - ln p_raw(b) under add-alpha smoothing. O(D) rows;
    callers broadcast it. Buckets absent from both corpora would score
    ln((alpha/Zt)/(alpha/Zr)) — irrelevant for scoring raw docs, whose
    buckets are in the raw model by construction."""
    ct = _bucket_counts(target, text_col, n_buckets).withColumnRenamed("cnt", "ct")
    cr = _bucket_counts(raw, text_col, n_buckets).withColumnRenamed("cnt", "cr")
    # totals ride the same aggregates: single-row frames, broadcast-joined
    tt = ct.agg(F.sum("ct").alias("tt"))
    tr = cr.agg(F.sum("cr").alias("tr"))
    d = float(n_buckets) * float(alpha)
    joined = (
        ct.join(cr, "bucket", "full_outer")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tr))
    )
    lr = (
        F.log(F.coalesce(F.col("ct"), F.lit(0)).cast("double") + F.lit(float(alpha)))
        - F.log(F.col("tt").cast("double") + F.lit(d))
        - F.log(F.coalesce(F.col("cr"), F.lit(0)).cast("double") + F.lit(float(alpha)))
        + F.log(F.col("tr").cast("double") + F.lit(d))
    )
    return joined.select("bucket", lr.alias("log_ratio"))


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 14,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-raw-document DSIR importance log-weight.

    Output: (id_col, n_feats bigint, log_weight double round-6) for every
    raw row; featureless (empty/NULL) docs get n_feats=0, log_weight NULL.
    Rounding at 6 dp makes downstream ranking engine-agnostic (the per-doc
    sum's addition order varies at 1e-15 between engines).
    """
    ratio = dsir_log_ratio_table(target, raw, text_col, n_buckets, alpha)
    idc = F.col(id_col)
    exploded = (
        raw.select(idc, F.explode_outer(_features(F.col(text_col))).alias("__f"))
        .withColumn(
            "bucket",
            F.when(
                F.col("__f").isNotNull(),
                feature_bucket_col(F.col("__f"), n_buckets),
            ),
        )
    )
    scored = (
        exploded.join(F.broadcast(ratio), "bucket", "left")
        .groupBy(idc)
        .agg(
            F.count("__f").alias("n_feats"),
            F.sum("log_ratio").alias("__lw"),
        )
    )
    return scored.select(
        idc,
        F.col("n_feats").cast("bigint").alias("n_feats"),
        F.when(F.col("n_feats") > 0, F.round(F.col("__lw"), 6)).alias("log_weight"),
    )


def gumbel_coin_col(key: F.Column) -> F.Column:
    """Deterministic standard-Gumbel noise from the Knuth coin of an
    integer key: g = -ln(-ln(u)), u = (coin + 0.5) / 1e6 in (0, 1).
    SQL-replayable (``sampling.knuth_coin`` is the single source of the
    coin convention); the +0.5 keeps u strictly inside the unit
    interval."""
    u = (knuth_coin(key).cast("double") + F.lit(0.5)) / F.lit(float(_DENOM))
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 14,
    alpha: float = 1.0,
    gumbel: bool = False,
) -> DataFrame:
    """Top-k raw docs by DSIR log-weight: (id, n_feats, log_weight,
    sel_score, rank). ``gumbel=True`` adds deterministic Gumbel noise
    keyed on the doc id (Gumbel-top-k == weighted sampling without
    replacement; Vieira 2014) — replayable, so still oracle-checkable.
    ``sel_score`` is the ranking key (log_weight, or its perturbation),
    rounded to 6 dp; ties break on id ascending. Executes as
    TakeOrdered (no global sort) + a k-row window for the rank column.

    Length-bias note (paper-faithful): log-ratios are mostly negative,
    so summing per occurrence favors SHORT documents. That is the
    published estimator; pre-filter by length (gopher_rules_cols) or
    rank on log_weight / n_feats downstream if per-token affinity is
    what the mixture needs."""
    lw = dsir_logweights(raw, target, id_col, text_col, n_buckets, alpha)
    sel = F.col("log_weight")
    if gumbel:
        sel = F.round(F.col("log_weight") + gumbel_coin_col(F.col(id_col)), 6)
    picked = (
        lw.filter(F.col("log_weight").isNotNull())
        .withColumn("sel_score", sel)
        .orderBy(F.col("sel_score").desc(), F.col(id_col).asc())
        .limit(int(k))
    )
    w = Window.orderBy(F.col("sel_score").desc(), F.col(id_col).asc())
    return picked.select(
        id_col, "n_feats", "log_weight", "sel_score",
        F.row_number().over(w).alias("rank"),
    )


# -- pure-Python twin (differential tests ONLY) ------------------------------


def dsir_logweight_py(
    text: str,
    target_counts: dict[int, int],
    raw_counts: dict[int, int],
    n_buckets: int = 1 << 14,
    alpha: float = 1.0,
) -> tuple[int, float | None]:
    """(n_feats, log_weight) for one doc given pre-tallied bucket counts —
    independent reimplementation of dsir_logweights' math."""
    import re

    from raven_spark.operators.quality_model import feature_bucket_py

    norm = re.sub(r"\s+", " ", text.strip().lower()) if text else ""
    if not norm:
        return 0, None
    ws = norm.split(" ")
    feats = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    tt = sum(target_counts.values())
    tr = sum(raw_counts.values())
    d = alpha * n_buckets
    s = 0.0
    for f in feats:
        b = feature_bucket_py(f, n_buckets)
        s += (
            math.log(target_counts.get(b, 0) + alpha)
            - math.log(tt + d)
            - math.log(raw_counts.get(b, 0) + alpha)
            + math.log(tr + d)
        )
    return len(feats), round(s, 6)


def corpus_bucket_counts_py(
    texts: list[str], n_buckets: int = 1 << 14
) -> dict[int, int]:
    import re
    from collections import Counter

    from raven_spark.operators.quality_model import feature_bucket_py

    c: Counter = Counter()
    for t in texts:
        norm = re.sub(r"\s+", " ", t.strip().lower()) if t else ""
        if not norm:
            continue
        ws = norm.split(" ")
        for f in ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]:
            c[feature_bucket_py(f, n_buckets)] += 1
    return dict(c)
