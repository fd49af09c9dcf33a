"""Sketch & statistical-contract family (split from pipeline.py, round 5 — pure move).

Self-checking accuracy contracts over probabilistic summaries (HLL,
GK quantiles, Count-Min, Bloom, Misra-Gries) plus distribution-drift
stats — the oracle-checkable audits of the engine's approximate
plumbing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from raven_spark.operators.dedup import (
    ngrams_zip_col,
    norm_text_col,
)
from raven_spark.operators.pipeline import (  # shared helpers
    _CMS_A,
    _CMS_B,
    _CMS_P,
)


def approx_distinct_contract(
    df: DataFrame,
    key_col: str,
    val_col: str,
    rsd: float = 0.05,
    sigma: float = 4.0,
) -> DataFrame:
    """Per-group approximate distinct counting with a self-checking
    error contract — the 100 TB cardinality pass (distinct URLs per
    host, distinct hosts per domain) where exact count-distinct's
    expand+double-aggregate is the bottleneck. The estimator is Spark's
    BUILT-IN HLL++ (``approx_count_distinct``, JVM-side, map-side
    combinable sketch merge — no Python, no expand), the engine's
    preferred path over any hand-rolled sketch.

    Because the sketch's exact register values are not replayable in an
    external oracle, the checkable product is the CONTRACT (the q23
    recall-oracle pattern): ``within_bound`` = |est - exact| <=
    max(sigma * rsd * exact, sigma) — a sigma-of-requested-rsd band
    with an absolute floor for tiny groups. The exact count rides along
    (oracle-replayable); a drifting estimator flips within_bound and
    the driver's hash check goes red.

    Output: (key, n_distinct exact, within_bound).
    """
    per = df.groupBy(key_col).agg(
        F.approx_count_distinct(val_col, float(rsd)).alias("__est"),
        F.count_distinct(F.col(val_col)).alias("n_distinct"),
    )
    err = F.abs(F.col("__est") - F.col("n_distinct")).cast("double")
    bound = F.greatest(
        F.lit(float(sigma) * float(rsd)) * F.col("n_distinct").cast("double"),
        F.lit(float(sigma)),
    )
    return per.select(
        key_col,
        "n_distinct",
        (err <= bound).alias("within_bound"),
    )

def approx_quantile_contract(
    df: DataFrame,
    key_col: str,
    val_col: str,
    percentiles: tuple = (0.5, 0.9, 0.99),
    accuracy: int = 1000,
    rank_slack: int = 1,
) -> DataFrame:
    """Per-group approximate percentiles with a self-checking RANK-ERROR
    contract — the quantile companion to approx_distinct_contract (q103).
    At 100 TB the exact per-group percentile (F.percentile) group-sorts
    every group; the scale path is Spark's BUILT-IN Greenwald-Khanna
    sketch (``percentile_approx``, JVM-side, map-side mergeable) whose
    published guarantee is RANK error <= n/accuracy (not value error).

    Because GK register state isn't replayable in an external oracle,
    the checkable product is the CONTRACT: for each requested p the
    approx value v must admit SOME rank r in its duplicate range
    [count(x<v)+1, count(x<=v)] within eps*n (+rank_slack for the
    floor/ceil convention at tiny n) of the target rank ceil(p*n).
    The EXACT interpolated percentile rides along (oracle-replayable
    via quantile_cont); a drifting sketch flips within_bound and the
    driver's hash goes red (q106).

    Cost shape: one aggregate pass builds both sketches per group
    (O(groups) rows out), then ONE audit re-scan joins the O(groups x
    |percentiles|) approx values back (broadcast — tiny side) for the
    conditional rank counts. Exactness audit is 2 scans total; the
    production path (sketch only) is one.

    Output: (key, p, exact_value, n, within_bound).
    """
    ps = [float(p) for p in percentiles]
    eps = 1.0 / float(accuracy)
    agg = df.groupBy(key_col).agg(
        F.percentile_approx(F.col(val_col), ps, int(accuracy)).alias("__approx"),
        F.percentile(F.col(val_col), ps).alias("__exact"),
        F.count(F.col(val_col)).alias("n"),
    )
    per_p = agg.select(
        key_col,
        "n",
        F.posexplode(F.arrays_zip(F.array(*[F.lit(p) for p in ps]).alias("p"),
                                  F.col("__approx").alias("av"),
                                  F.col("__exact").alias("ev"))).alias("__i", "__z"),
    ).select(
        key_col,
        "n",
        F.col("__z.p").alias("p"),
        F.col("__z.av").alias("__av"),
        F.round(F.col("__z.ev"), 6).alias("exact_value"),
    )
    # audit re-scan: exact rank range of each approx value (duplicates
    # give a range, any rank inside it counts)
    ranks = (
        df.select(F.col(key_col), F.col(val_col).alias("__x"))
        .join(F.broadcast(per_p.select(key_col, "p", "__av")), key_col)
        .groupBy(key_col, "p")
        .agg(
            F.sum((F.col("__x") < F.col("__av")).cast("long")).alias("__n_lt"),
            F.sum((F.col("__x") <= F.col("__av")).cast("long")).alias("__n_le"),
        )
    )
    j = per_p.join(ranks, [key_col, "p"])
    target = F.ceil(F.col("p") * F.col("n"))
    band = F.ceil(F.lit(eps) * F.col("n")) + F.lit(int(rank_slack))
    within = (F.col("__n_lt") + 1 <= target + band) & (F.col("__n_le") >= target - band)
    return j.select(
        F.col(key_col),
        F.col("p"),
        F.col("exact_value"),
        F.col("n"),
        within.alias("within_bound"),
    )

def cms_frequency(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch frequency estimation (Cormode & Muthukrishnan,
    2005) over a BIGINT key — the fixed-memory companion to Misra-Gries
    (heavy_hitters): MG surfaces the top-k, CMS answers point frequency
    queries for EVERY key with depth x width counters total, regardless
    of distinct-key cardinality. At 10^10 URLs a per-host or per-URL
    frequency table is itself huge; the sketch is O(depth*width) and
    map-side combinable (counter matrices add), so the shuffle is
    O(partitions * depth * width) rows, never O(distinct keys).

    Deterministic hash family (replayable in the DuckDB twin, q107):
        h_j(k) = ((pmod(k, p) * A_j + B_j) mod p) mod width,  p = 2^31-1
    with the public Knuth/xxhash multiplier constants — pairwise-
    independent enough for the CM guarantee in practice and exactly
    reproducible in int64 arithmetic on both engines (pmod(k,p) < 2^31,
    * A_j < 2^63).

    Estimate: est(k) = min_j sketch[j][h_j(k)]. CM guarantees
    est >= exact always (overestimate-only), and est <= exact + eps*N
    with probability 1-delta for eps=e/width, delta=e^-depth.

    This audit variant also computes the EXACT per-key counts (one
    ordinary groupBy — oracle duty, q103/q106 contract pattern) and the
    always-true-by-construction ``no_underestimate`` flag; a broken
    sketch (wrong hash, lost counter mass) flips it and the driver hash
    goes red. Production callers use the sketch rows alone.

    Output: (key, exact_count, cms_estimate, no_underestimate).
    """
    if not (1 <= depth <= len(_CMS_A)):
        raise ValueError(f"cms_frequency: depth must be in [1, {len(_CMS_A)}]")
    p = F.lit(_CMS_P)
    k = F.pmod(F.col(key_col).cast("long"), p)

    def _bucket(j: int) -> F.Column:
        return F.pmod(k * F.lit(_CMS_A[j]) + F.lit(_CMS_B[j]), p) % F.lit(int(width))

    # one pass builds all depth rows: explode the (j, bucket) pairs, then
    # a map-side-combinable count per (j, bucket) — the sketch
    pairs = df.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("j"), _bucket(j).alias("bucket"))
                for j in range(depth)
            ])
        ).alias("__jb")
    ).select(F.col("__jb.j").alias("j"), F.col("__jb.bucket").alias("bucket"))
    sketch = pairs.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))

    # point queries: each distinct key probes its depth cells; the sketch
    # is tiny (depth*width rows) -> broadcast join, min over rows
    exact = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact_count"))
    ek = F.pmod(F.col(key_col).cast("long"), p)
    probes = exact.select(
        key_col,
        "exact_count",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    F.pmod(ek * F.lit(_CMS_A[j]) + F.lit(_CMS_B[j]), p)
                    .__mod__(F.lit(int(width)))
                    .alias("bucket"),
                )
                for j in range(depth)
            ])
        ).alias("__jb"),
    ).select(key_col, "exact_count", F.col("__jb.j").alias("j"), F.col("__jb.bucket").alias("bucket"))
    est = (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy(key_col, "exact_count")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return est.select(
        key_col,
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("exact_count")).alias("no_underestimate"),
    )

def bloom_contract(
    members: DataFrame,
    probes: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
    slack: float = 1.5,
) -> DataFrame:
    """Bloom-filter false-positive-rate contract — the oracle-checkable
    twin of the engine's sharded seen-filter (operators/seen.py is
    pytest-gated; this closes the probabilistic-contract family next to
    HLL q103, GK q106, CMS q107, KMV q111). Build a Bloom over
    ``members`` with a REPLAYABLE hash family (the _CMS_A Knuth/NTT
    constants — bit j of key = ((key mod p)*A_j + B_j mod p) mod m),
    probe with ``probes`` (disjoint from members by contract), and
    audit the realized FPR against the fill-based expectation:

        fpr_load = (n_bits_set / m) ^ k      (exact, given the fill)
        within   = measured <= slack * fpr_load + 3 / n_probes

    (the additive term absorbs small-sample shot noise; both sides are
    deterministic functions of the data, so the verdict replays
    bit-for-bit in the DuckDB twin, q123). A broken family (biased
    bits, lost buckets) blows the bound and the driver hash goes red.

    100 TB shape: the bit set is a DataFrame of distinct set-bit
    positions — O(min(k*n, m)) rows, never a driver bitmap (the seen.py
    discipline); membership = explode each probe's k positions, ONE
    broadcast semi-join against the bit table, pass iff all k hit.

    Output: one row (n_members, n_probes, m_bits, k_hashes, n_bits_set,
    measured_fpr 6dp, expected_fpr 6dp, within_bound).
    """
    if not (1 <= k_hashes <= len(_CMS_A)):
        raise ValueError(f"bloom_contract: k_hashes must be in [1, {len(_CMS_A)}]")
    p = F.lit(_CMS_P)

    def positions(col):
        k = F.pmod(col.cast("long"), p)
        return F.array(
            *[
                F.pmod(k * F.lit(_CMS_A[j]) + F.lit(_CMS_B[j]), p)
                % F.lit(int(m_bits))
                for j in range(k_hashes)
            ]
        )

    # ONE pass over members: distinct keys are localCheckpoint'd (the
    # minhash-fixpoint lineage-cut discipline), then the bit table, the
    # member count, and the broadcast probe join all derive from that
    # O(distinct members) snapshot. The previous form ran three driver
    # actions (members.distinct().count(), bits.count(), plus the job
    # itself) — three full member scans per call; now n_members /
    # n_bits_set fold into the output plan as broadcast 1-row
    # aggregates (the ks_group_drift __n_corpus pattern) and the whole
    # contract is a single job.
    mkeys = (
        members.select(F.col(key_col).alias("mk"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    bits = mkeys.select(F.explode(positions(F.col("mk"))).alias("bit")).distinct()
    memagg = mkeys.agg(F.count(F.lit(1)).cast("int").alias("n_members"))
    bitagg = bits.agg(F.count(F.lit(1)).cast("int").alias("n_bits_set"))
    probe_hits = (
        probes.select(F.col(key_col).alias("pk"))
        .distinct()
        .select("pk", F.explode(positions(F.col("pk"))).alias("bit"))
        .join(F.broadcast(bits.withColumn("__set", F.lit(1))), "bit", "left")
        .groupBy("pk")
        .agg(F.sum(F.coalesce("__set", F.lit(0))).alias("__hits"))
    )
    counts = probe_hits.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum((F.col("__hits") == F.lit(int(k_hashes))).cast("long")).alias("__fp"),
    )
    fpr_load = F.pow(
        F.col("n_bits_set").cast("double") / F.lit(float(m_bits)),
        F.lit(int(k_hashes)),
    )
    measured = F.col("__fp").cast("double") / F.col("n_probes").cast("double")
    return (
        counts.crossJoin(F.broadcast(memagg))
        .crossJoin(F.broadcast(bitagg))
        .select(
            "n_members",
            "n_probes",
            F.lit(int(m_bits)).alias("m_bits"),
            F.lit(int(k_hashes)).alias("k_hashes"),
            "n_bits_set",
            F.round(measured, 6).alias("measured_fpr"),
            F.round(fpr_load, 6).alias("expected_fpr"),
            (
                measured
                <= F.lit(float(slack)) * fpr_load
                + F.lit(3.0) / F.col("n_probes").cast("double")
            ).alias("within_bound"),
        )
    )

def heavy_hitters(
    df: DataFrame,
    k: int = 50,
    capacity: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """Top-k frequent terms via per-partition Misra-Gries summaries —
    the vocabulary/stop-word/heavy-hitter pass whose naive plan
    (explode + groupBy) shuffles one row per DISTINCT term. Misra-Gries
    (1982) caps the map side at ``capacity`` counters per partition:

    - map (mapInPandas, one summary per partition): count tokens in a
      dict; when a new term arrives at a full table, decrement every
      counter and drop zeros (the arriving term is discarded). A
      surviving term's count underestimates its true partition count by
      at most n_p/(capacity+1).
    - reduce: sum summary counts per term (map-side combinable — the
      shuffle is O(partitions x capacity) rows regardless of vocabulary
      size), then global top-k via TakeOrderedAndProject (per-partition
      heap of k; never a global sort), rank stamped on the k survivors.

    EXACTNESS REGIME: if no partition ever evicts (its distinct-term
    count <= capacity) every count is exact and the result equals the
    exact top-k — the oracle-checked regime (driver q86) and the
    partition-invariant one. Under eviction the counts are lower bounds
    (any term with true count > N/(capacity+1) still surfaces, the MG
    guarantee); callers needing exact counts for the survivors re-scan
    with a semi-join on the k terms (a second cheap pass).

    Tokenization: lowercase + split on the explicit RE2 whitespace
    class [\\t\\n\\f\\r ], empty tokens dropped — exactly what the SQL
    twin's regexp computes (Python/Java \\s variants differ on \\x0B
    and Unicode spaces, so the class is spelled out).

    MG cost note: the decrement sweep touches all ``capacity`` counters,
    but every decrement is paid for by a prior increment, so total sweep
    work over a partition is <= its token count — amortized O(1) per
    token (the classic analysis), not O(capacity) per arrival.

    Output: (term, term_count, rank), rank 1..k.
    """
    import pandas as pd  # noqa: F401 (schema side)

    if k < 1:
        raise ValueError("heavy_hitters: k must be >= 1")
    if capacity < 1:
        raise ValueError("heavy_hitters: capacity must be >= 1")
    cap = int(capacity)

    def _mg(batches):
        import re

        import pandas as pd

        # the explicit class is RE2's \s ([\t\n\f\r ]) — Python's \s
        # (even re.ASCII) adds \x0B and str.strip() adds Unicode
        # whitespace, both of which would diverge from the SQL twin;
        # empty tokens (leading/trailing separators) are dropped rather
        # than stripped, the q86/q89 oracle convention
        ws = re.compile(r"[ \t\n\f\r]+")
        counters: dict[str, int] = {}
        for pdf in batches:
            for t in pdf[text_col]:
                if t is None:
                    continue
                for tok in ws.split(t.lower()):
                    if not tok:
                        continue
                    c = counters.get(tok)
                    if c is not None:
                        counters[tok] = c + 1
                    elif len(counters) < cap:
                        counters[tok] = 1
                    else:
                        dead = []
                        for key in counters:
                            n = counters[key] - 1
                            if n == 0:
                                dead.append(key)
                            else:
                                counters[key] = n
                        for key in dead:
                            del counters[key]
        if counters:
            yield pd.DataFrame(
                {"term": list(counters.keys()), "term_count": list(counters.values())}
            )

    partial = df.select(text_col).mapInPandas(_mg, schema="term string, term_count long")
    agg = partial.groupBy("term").agg(F.sum("term_count").alias("term_count"))
    topk = agg.orderBy(F.col("term_count").desc(), F.col("term").asc()).limit(int(k))
    w = Window.orderBy(F.col("term_count").desc(), F.col("term").asc())
    return topk.withColumn("rank", F.row_number().over(w))

def shard_skew(
    df: DataFrame,
    key_col: str,
    n_shards: int = 32,
) -> DataFrame:
    """Pre-flight shuffle-skew diagnostic — measure BEFORE you shuffle:
    given the key a join/groupBy would hash-partition on, report how
    unevenly its rows would land across ``n_shards`` reducers. The
    100 TB planning question every operator in this engine answers by
    construction ("is this key skewed enough to need salting / AQE
    skew-join?") becomes a one-aggregate measurement:

    - max_share: the hottest shard's fraction of all rows (straggler
      bound — a 0.3 max_share means the stage runs at ~1/0.3 of ideal)
    - cov: coefficient of variation of shard loads (0 = perfectly even)
    - gini: Gini coefficient over ALL n_shards (empty shards included —
      they are idle reducers), exact via the rank formula
      G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over loads sorted asc.

    The shard function is the replayable Knuth mix over a BIGINT key
    (the _CMS_A/Horner convention — NOT Spark's internal murmur, so the
    DuckDB twin q120 reproduces it; for the skew verdict any uniform
    hash family is interchangeable). String keys: pass xxhash64(col)
    at production scale, a replayable fold for oracle duty — a raw
    string column is rejected up front (the ANSI cast would otherwise
    throw CAST_INVALID_INPUT mid-job). NULL keys land in shard 0 (a
    real hash partitioner sends every NULL to one concrete reducer;
    letting pmod propagate NULL instead created a phantom NULL shard
    that inflated n_used and entered the Gini rank window).

    Scale shape: one map-side-combinable count per shard (<= n_shards
    rows out of the only full scan), one O(n_shards) rank window, one
    1-row fold. Output: single row (n_shards, n_used, total_rows,
    max_share 6dp, cov 6dp, gini 6dp).
    """
    from pyspark.sql.types import BinaryType, StringType

    ktype = df.schema[key_col].dataType
    if isinstance(ktype, (StringType, BinaryType)):
        raise ValueError(
            f"shard_skew: key_col {key_col!r} is {ktype.simpleString()}; "
            "pass a numeric key (e.g. xxhash64(col)) instead"
        )
    p = F.lit(_CMS_P)
    k = F.pmod(F.coalesce(F.col(key_col).cast("long"), F.lit(0)), p)
    shard = F.pmod(F.pmod(k * F.lit(_CMS_A[0]), p), F.lit(int(n_shards)))
    loads = df.select(shard.alias("shard")).groupBy("shard").agg(
        F.count(F.lit(1)).alias("load")
    )
    w = Window.orderBy(F.col("load").asc(), F.col("shard").asc())
    ranked = loads.withColumn("__i", F.row_number().over(w))
    n = F.lit(float(n_shards))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum("load").alias("tot"),
        F.sum(F.col("__i").cast("double") * F.col("load").cast("double")).alias("__sil"),
        F.sum(F.col("load").cast("double") * F.col("load").cast("double")).alias("__sll"),
        F.max("load").alias("__mx"),
    )
    z = n - F.col("n_used").cast("double")  # empty shards rank first
    totd = F.col("tot").cast("double")
    sil_all = z * totd + F.col("__sil")
    gini = F.lit(2.0) * F.try_divide(sil_all, n * totd) - (n + F.lit(1.0)) / n
    mean = totd / n
    var = F.col("__sll") / n - mean * mean
    cov = F.try_divide(F.sqrt(F.greatest(var, F.lit(0.0))), mean)
    return agg.select(
        F.lit(int(n_shards)).alias("n_shards"),
        F.col("n_used"),
        F.col("tot").alias("total_rows"),
        F.round(F.try_divide(F.col("__mx").cast("double"), totd), 6).alias("max_share"),
        F.round(cov, 6).alias("cov"),
        F.round(gini, 6).alias("gini"),
    )

def ks_group_drift(
    df: DataFrame,
    group_col,
    value_col,
    min_n: int = 5,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between each
    group's value distribution and the whole corpus's — the
    distribution-level anomaly detector for numeric quality signals
    (doc length, quality score, token count): a domain whose LENGTH
    distribution diverges from the corpus is templated, truncated or
    spam even when every per-doc score passes (the part-vs-whole drift
    monitor; groups are domains, crawls, or dump slices).

    Exactness without a global sort: both CDFs are step functions and
    the group's jump points are a subset of the corpus's, so

        D_g = max_i max( |F_g(v_i) - F_c(v_i)|,
                         |F_g(v_{i-1}) - (F_c(v_i) - j_c(v_i))| )

    over the group's OWN distinct values v_i (F_g(v_0) = 0; j_c = the
    corpus jump at v_i) — the standard merged-jump-point formulation,
    needing only an equi-join of group points onto the corpus CDF and
    one lag per group. No cross product, no as-of.

    100 TB shape: value-distribution cardinality is bounded (doc
    lengths, rounded scores), so the corpus CDF is ONE window over the
    O(distinct values) count table (single-partition by design at that
    size — documented, bounded); group CDFs partition by group. The
    full corpus scans once into the two count aggregates.

    Output: (group, n_group, ks_stat 6dp, ks_scaled 6dp) where
    ks_scaled = D * sqrt(m*n/(m+n)) (the Smirnov-normalized statistic
    — > ~1.63 rejects same-distribution at alpha 0.01). Groups with
    fewer than ``min_n`` rows are dropped (KS is meaningless there).
    """
    g = (group_col if not isinstance(group_col, str) else F.col(group_col)).alias(
        "g"
    )
    v = (value_col if not isinstance(value_col, str) else F.col(value_col)).alias(
        "v"
    )
    base = df.select(g, v).filter(F.col("v").isNotNull())
    gc = base.groupBy("g", "v").agg(F.count(F.lit(1)).alias("cg"))
    # corpus counts and the grand total both FOLD from the (g, v)
    # aggregate — the source scans once, not three times
    cc = gc.groupBy("v").agg(F.sum("cg").alias("cc"))
    wc = Window.orderBy(F.col("v").asc())
    corpus = cc.select(
        "v",
        "cc",
        F.sum("cc").over(wc).alias("__cum_c"),
    ).crossJoin(F.broadcast(cc.agg(F.sum("cc").alias("__n_corpus"))))
    wg = Window.partitionBy("g").orderBy(F.col("v").asc())
    grp = gc.select(
        "g",
        "v",
        F.sum("cg").over(wg).alias("__cum_g"),
        F.sum("cg").over(Window.partitionBy("g")).alias("__n"),
    )
    j = grp.join(corpus, "v")
    fg = F.col("__cum_g").cast("double") / F.col("__n").cast("double")
    fg_prev = F.coalesce(
        F.lag("__cum_g").over(wg).cast("double") / F.col("__n").cast("double"),
        F.lit(0.0),
    )
    fc = F.col("__cum_c").cast("double") / F.col("__n_corpus").cast("double")
    fc_pre = (F.col("__cum_c") - F.col("cc")).cast("double") / F.col(
        "__n_corpus"
    ).cast("double")
    # materialize the per-point distance BEFORE the max aggregate (the
    # lag window cannot live inside an aggregate expression)
    per_point = j.select(
        "g",
        "__n",
        "__n_corpus",
        F.greatest(F.abs(fg - fc), F.abs(fg_prev - fc_pre)).alias("__d"),
    )
    out = per_point.groupBy("g", "__n", "__n_corpus").agg(F.max("__d").alias("__D"))
    m = F.col("__n").cast("double")
    nn = F.col("__n_corpus").cast("double")
    return (
        out.filter(F.col("__n") >= int(min_n))
        .select(
            F.col("g").alias("group"),
            F.col("__n").alias("n_group"),
            F.round("__D", 6).alias("ks_stat"),
            F.round(F.col("__D") * F.sqrt(m * nn / (m + nn)), 6).alias("ks_scaled"),
        )
    )
