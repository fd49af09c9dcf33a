"""Model-based quality scoring — a fastText-style linear classifier over
hashed word n-gram features, the one CCNet/Gopher-family signal the
heuristic stack (functions/text.py quality_score) lacks: CCNet §2.2
filters on a learned LM/classifier score, and the standard cheap form of
that model (fastText: Joulin et al., "Bag of Tricks for Efficient Text
Classification") is

    score = sigmoid( mean_f w[bucket(f)] + bias )

over unigram+bigram features hashed into D buckets (the hashing trick —
collisions are part of the model). fastText's own feature hash is a
multiplicative rolling hash; ours is the same class, chosen to be exactly
replayable in ANSI SQL (the engine's Knuth-coin convention,
operators/sampling.py):

    h(f)      = fold over codepoints: h = (h*31 + cp) mod 1_000_000_007
    bucket(f) = (h * 2654435761) mod D

Scale shape: tokenize -> featurize -> hash -> weight-lookup -> mean is
pure per-row column algebra — ZERO shuffles, fused into the scan
projection, text never leaves its partition. With a learned weights
TABLE (bucket -> weight) the lookup becomes one explode + broadcast join
+ map-side-combinable mean (weights are O(D) ~ MBs vs the 100 TB corpus
— always the broadcast side). No Python in either path; the pure-Python
twin below exists for differential tests only.

Reference seam: the reference crawler has no content models at all
(crawler.rs persists bytes); this is task-brief LLM-pipeline scope, the
learned sibling of functions/text.py:quality_score.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

POLY_P = 1_000_000_007
KNUTH_32 = 2_654_435_761
_W_P = 1_000_003  # synthetic-weight modulus (deterministic pseudo-model)


def _norm(text: Column) -> Column:
    # the engine-wide dedup identity transform (dedup.norm_text_col)
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def feature_bucket_col(feat: Column, n_buckets: int) -> Column:
    """SQL-replayable feature hash: polynomial-31 codepoint fold mod
    1e9+7, then the Knuth multiplicative mix mod ``n_buckets``. All
    intermediates fit bigint: acc*31+cp <= ~3.1e10, h*K <= ~2.7e18."""
    cps = F.transform(F.split(feat, ""), lambda c: F.ascii(c).cast("bigint"))
    h = F.aggregate(
        cps,
        F.lit(0).cast("bigint"),
        lambda acc, cp: F.pmod(acc * F.lit(31) + cp, F.lit(POLY_P)),
    )
    return F.pmod(h * F.lit(KNUTH_32), F.lit(n_buckets))


def synthetic_weight_col(bucket: Column) -> Column:
    """Deterministic pseudo-model weight in [-1, 1): a fixed arithmetic
    function of the bucket id, replayable anywhere. Stands in for learned
    weights in oracle-checked runs; real models pass a weights table."""
    return (
        F.pmod(bucket * F.lit(KNUTH_32), F.lit(_W_P)).cast("double")
        / F.lit(float(_W_P)) * F.lit(2.0) - F.lit(1.0)
    )


def _features(text: Column) -> Column:
    """Unigram + bigram word features of the normalized text (fastText's
    wordNgrams=2 configuration). Empty/whitespace/NULL docs -> empty
    array (NULL must not propagate: the synthetic path's F.size would
    return NULL n_feats while the weights path's explode_outer+count
    returns 0 — the two scorer paths and the q51 oracle agree on 0)."""
    norm = _norm(text)
    words = F.split(norm, " ")
    n = F.size(words)
    bigrams = F.zip_with(
        F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    feats = F.concat(words, bigrams)
    return F.when(
        F.coalesce(F.length(norm), F.lit(0)) == 0, F.array().cast("array<string>")
    ).otherwise(feats)


def classifier_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 18,
    bias: float = 0.0,
    weights: DataFrame | None = None,
    out_col: str = "quality_score",
) -> DataFrame:
    """Score every document with the hashed linear model (module doc).

    ``weights=None`` (default): the synthetic arithmetic pseudo-model —
    the whole scorer is one in-row fold, zero shuffles, zero joins.
    ``weights`` = (bucket bigint, weight double) rows: real learned
    weights; features explode and broadcast-join the table (missing
    buckets weigh 0.0), then a map-side-combinable mean per doc.

    Output: (id_col, n_feats, out_col) for EVERY input row; docs with no
    words score null with n_feats 0. Scores round to 6 dp.
    """
    idc = F.col(id_col)
    feats = _features(F.col(text_col))
    if weights is None:
        buckets = F.transform(feats, lambda f: feature_bucket_col(f, n_buckets))
        s = F.aggregate(
            buckets,
            F.lit(0.0),
            lambda acc, b: acc + synthetic_weight_col(b),
        )
        n = F.size(feats)
        mean = s / n.cast("double") + F.lit(float(bias))
        score = F.lit(1.0) / (F.lit(1.0) + F.exp(-mean))
        return df.select(
            idc,
            n.cast("bigint").alias("n_feats"),
            F.when(n > 0, F.round(score, 6)).alias(out_col),
        )
    exploded = (
        df.select(idc, feats.alias("__feats"))
        .select(idc, F.explode_outer("__feats").alias("__f"))
        .withColumn(
            "bucket",
            F.when(
                F.col("__f").isNotNull(),
                feature_bucket_col(F.col("__f"), n_buckets),
            ),
        )
    )
    joined = exploded.join(F.broadcast(weights), on="bucket", how="left")
    agg = joined.groupBy(idc).agg(
        F.count("__f").alias("n_feats"),
        F.avg(F.coalesce(F.col("weight"), F.lit(0.0))).alias("__mean"),
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("__mean") + F.lit(float(bias)))))
    return agg.select(
        idc,
        F.col("n_feats").cast("bigint").alias("n_feats"),
        F.when(F.col("n_feats") > 0, F.round(score, 6)).alias(out_col),
    )


_TFP = 10**12  # fixed-point scale for exact (order-independent) GD sums


def _fp(col: Column) -> Column:
    """Fixed-point image of a double term: round to integer at 1e12
    scale, summed as decimal(38,0) so the accumulation is EXACT and
    order/partition-independent (the kmeans_lloyd discipline,
    similarity.py::_FP) and overflow-safe at corpus row counts
    (decimal(38,0) in Spark == HUGEINT sums in the DuckDB twin)."""
    return F.round(col * F.lit(float(_TFP)), 0).cast("decimal(38,0)")


def train_classifier(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = 1 << 18,
    iterations: int = 3,
    lr: float = 0.5,
) -> DataFrame:
    """TRAIN the hashed linear quality classifier inside the engine —
    full-batch logistic regression by gradient descent over the same
    unigram+bigram hashed features classifier_score consumes (CCNet
    §2.2 trains its fastText filter offline; at 100 TB the training
    corpus IS the cluster's data, so the trainer must be a distributed
    job, not a laptop step). The learned (bucket, weight) table feeds
    ``classifier_score(weights=...)`` directly.

    Model (mean-pooled fastText form, module doc):

        z_i = sum_f w[bucket(f)] / m_i + w_bias        (m_i = n feats)
        p_i = sigmoid(z_i)
        dL/dw_b    = (1/N) sum_i (p_i - y_i) * cnt_ib / m_i
        dL/dw_bias = (1/N) sum_i (p_i - y_i)
        w <- w - lr * grad       (w0 = 0, T = ``iterations`` steps)

    The bias rides the SAME pipeline as bucket -1 with coefficient 1
    (a per-doc intercept feature), so one aggregate computes the whole
    gradient.

    DETERMINISM: every sum that crosses rows is fixed-point —
    per-term round(x * 1e12) accumulated as decimal(38,0) (exact,
    commutative) — and every per-doc residual is rounded to 12 dp, so
    the trajectory is a pure function of the data, independent of
    partitioning and replayable iteration-by-iteration in the DuckDB
    oracle (q131 unrolls the T steps as CTEs).

    Scale shape (per iteration): weights are O(D) — ALWAYS the
    broadcast side (the MLlib weight-broadcast pattern; never driver-
    resident between steps, the state lives in a localCheckpoint'd
    DataFrame). The featurized table (did, bucket, coef) is built ONCE
    (text leaves its partition only as 8-byte buckets + a double),
    hash-partitioned by doc so the per-doc z aggregate and the
    residual join both reuse that exchange; the only per-iteration
    shuffle is the O(D)-row gradient aggregate, map-side combinable.

    Output: (bucket bigint, weight double 12dp) for every bucket with
    at least one feature occurrence, plus the bias row at bucket -1.
    """
    if iterations < 1:
        raise ValueError("train_classifier: iterations must be >= 1")
    feats = _features(F.col(text_col))
    docs = (
        df.filter(F.col(label_col).isNotNull())
        .select(
            F.col(id_col).alias("__did"),
            F.col(label_col).cast("double").alias("__y"),
            feats.alias("__feats"),
        )
        .withColumn("__m", F.size("__feats"))
    )
    word_rows = docs.select(
        "__did",
        "__y",
        F.explode("__feats").alias("__f"),
        (F.lit(1.0) / F.col("__m").cast("double")).alias("__coef"),
    ).select(
        "__did",
        "__y",
        feature_bucket_col(F.col("__f"), n_buckets).alias("bucket"),
        "__coef",
    )
    bias_rows = docs.select(
        "__did",
        "__y",
        F.lit(-1).cast("bigint").alias("bucket"),
        F.lit(1.0).alias("__coef"),
    )
    base = (
        word_rows.unionByName(bias_rows)
        .repartition(F.col("__did"))
        .localCheckpoint(eager=False)
    )
    ndf = docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))

    w: DataFrame | None = None  # None == the all-zero initial model
    for _ in range(int(iterations)):
        if w is None:
            joined = base.withColumn("__w", F.lit(0.0))
        else:
            joined = base.join(
                F.broadcast(w), on="bucket", how="left"
            ).withColumn("__w", F.coalesce("weight", F.lit(0.0)))
        # per-doc logit: exact fixed-point sum of w_b * coef terms
        z = joined.groupBy("__did").agg(
            (F.sum(_fp(F.col("__w") * F.col("__coef"))).cast("double")
             / F.lit(float(_TFP))).alias("__z"),
            F.first("__y").alias("__yy"),
        )
        r = z.select(
            "__did",
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__z"))) - F.col("__yy"),
                12,
            ).alias("__r"),
        )
        # per-bucket gradient: exact fixed-point sum of r_i * coef terms
        g = (
            joined.join(r, "__did")
            .groupBy("bucket")
            .agg(
                F.sum(_fp(F.col("__r") * F.col("__coef"))).alias("__gfp"),
                F.min("__w").alias("__w0"),  # constant within a bucket
            )
        )
        w = (
            g.crossJoin(F.broadcast(ndf))
            .select(
                "bucket",
                F.round(
                    F.col("__w0")
                    - F.lit(float(lr))
                    * (F.col("__gfp").cast("double") / F.lit(float(_TFP))
                       / F.col("__n")),
                    12,
                ).alias("weight"),
            )
            .localCheckpoint(eager=True)  # O(D) rows: cut lineage per step
        )
    assert w is not None
    return w


# -- pure-Python twin (differential tests ONLY — never on the hot path) ----


def feature_bucket_py(feat: str, n_buckets: int) -> int:
    h = 0
    for ch in feat:
        h = (h * 31 + ord(ch)) % POLY_P
    return (h * KNUTH_32) % n_buckets


def score_text_py(
    text: str,
    n_buckets: int = 1 << 18,
    bias: float = 0.0,
    weight_fn=None,
) -> tuple[int, float | None]:
    """(n_feats, score) for one document — an independent reimplementation
    of classifier_score's math (python loop vs column fold) used to
    differentially test the Spark path."""
    if weight_fn is None:
        def weight_fn(b):  # synthetic_weight_col's twin
            return ((b * KNUTH_32) % _W_P) / _W_P * 2.0 - 1.0

    norm = re.sub(r"\s+", " ", text.strip().lower())
    if not norm:
        return 0, None
    ws = norm.split(" ")
    feats = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    mean = sum(
        weight_fn(feature_bucket_py(f, n_buckets)) for f in feats
    ) / len(feats) + bias
    return len(feats), round(1.0 / (1.0 + math.exp(-mean)), 6)


def _round_half_up(x: float, ndigits: int) -> float:
    """Spark F.round semantics (BigDecimal HALF_UP) — python's built-in
    round is banker's and CAN diverge at exact ties."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-ndigits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def train_py(
    rows: list[tuple[str, float]],
    n_buckets: int,
    iterations: int = 3,
    lr: float = 0.5,
) -> dict[int, float]:
    """Pure-python twin of train_classifier: same featurization, same
    fixed-point trajectory (round(term*1e12) summed exactly as python
    ints), same 12-dp residual/weight rounding. rows = (text, label)."""
    docs = []
    for text, y in rows:
        norm = re.sub(r"\s+", " ", (text or "").strip().lower())
        if norm:
            ws = norm.split(" ")
            feats = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
            m = len(feats)
            cells = [(feature_bucket_py(f, n_buckets), 1.0 / m) for f in feats]
        else:
            cells = []
        cells.append((-1, 1.0))
        docs.append((float(y), cells))
    n = float(len(docs))
    w: dict[int, float] = {}
    for _ in range(iterations):
        gfp: dict[int, int] = {}
        for y, cells in docs:
            zfp = sum(
                int(_round_half_up(w.get(b, 0.0) * coef * 10**12, 0))
                for b, coef in cells
            )
            z = zfp / 10**12
            r = _round_half_up(1.0 / (1.0 + math.exp(-z)) - y, 12)
            for b, coef in cells:
                gfp[b] = gfp.get(b, 0) + int(
                    _round_half_up(r * coef * 10**12, 0)
                )
        w = {
            b: _round_half_up(w.get(b, 0.0) - lr * (g / 10**12 / n), 12)
            for b, g in gfp.items()
        }
    return w
