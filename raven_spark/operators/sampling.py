"""Deterministic corpus sampling — the subsetting pass between cleaning
and training: hold out eval slices, balance languages/sources, downsample
over-represented hosts. Reference scope note: the reference engine has no
sampling (its task list is the whole corpus); task-brief pipeline tier,
sibling of operators/pipeline.py::hash_split.

Two shapes, chosen by what must be controlled:

- ``hash_sample``: keep a FRACTION per row, decided by a pure column
  expression over xxhash64(key, salt) — zero shuffle, zero state, stable
  under reruns/partitioning, composable with any scan. The 100 TB
  default: a Bernoulli sample whose coin is the row's own identity, so
  the same row lands in the same sample on every run and on every
  cluster size (unlike ``df.sample``, whose result depends on partition
  layout and RNG seeding per task).

- ``stratified_cap``: keep AT MOST n rows per stratum, ranked by the
  same identity hash ("uniform without replacement" per stratum, but
  deterministic). One shuffle keyed on the stratum; rank via window.
  Skew note: a hot stratum sorts on one partition — cap-style sampling
  needs a global per-stratum order by construction; for strata too hot
  to sort, pre-thin with ``hash_sample(fraction ~ 3*n/stratum_size)``
  first (both ops are content-deterministic, so the composition is too).

The hash coin: xxhash64 output is uniform over int64; ``pmod(h, D)/D``
gives a uniform threshold test with exact rational semantics (no float
rounding at the boundary), replayable in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DENOM = 1_000_000  # fraction resolution: 1e-6


KNUTH_32 = 2654435761  # Knuth multiplicative constant (public; TAOCP vol 3)


def knuth_coin(key_col: "str | F.Column", denom: int = _DENOM) -> "F.Column":
    """The ANSI-SQL-replayable coin (same convention as pipeline.split_col):
    ((key mod 1e9+7) * K) mod denom — overflow-free for all bigints, so
    DuckDB oracles can replay membership exactly. Weaker mixing than
    xxhash64 (use only on already-arbitrary integer ids). Takes a column
    name or a Column expression; this is the ONE definition of the coin
    convention — derive from it (dsir.gumbel_coin_col) rather than
    re-hardcoding the constants."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.pmod(
        F.pmod(key.cast("bigint"), F.lit(1_000_000_007)) * F.lit(KNUTH_32),
        F.lit(denom),
    )


def sample_flag(
    key_cols: list[str], fraction: float, salt: str = "", coin: "F.Column | None" = None
) -> "F.Column":
    """Boolean column: row is in the deterministic ``fraction``-sample.
    The default coin is pmod(xxhash64(*keys, salt), 1e6) — pure column
    algebra (codegen'd), content-deterministic, salt-independent across
    concurrent samples. Pass ``coin`` (values uniform on [0, 1e6)) to
    substitute another generator, e.g. ``knuth_coin`` for SQL replay."""
    thresh = int(round(fraction * _DENOM))
    if coin is None:
        coin = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(salt)), F.lit(_DENOM))
    return coin < F.lit(thresh)


def hash_sample(
    df: DataFrame, key_cols: str | list[str], fraction: float, salt: str = "",
    coin: "F.Column | None" = None,
) -> DataFrame:
    """Zero-shuffle deterministic Bernoulli sample (see module doc)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return df.filter(sample_flag(keys, fraction, salt, coin))


def stratified_cap(
    df: DataFrame,
    stratum_cols: str | list[str],
    n: int,
    key_cols: str | list[str],
    salt: str = "",
    rank_col: str | None = None,
    coin: "F.Column | None" = None,
) -> DataFrame:
    """At most ``n`` rows per stratum, chosen uniformly-deterministically:
    rank rows inside each stratum by (xxhash64(key, salt), key) and keep
    rank <= n. With ``rank_col`` the ranking becomes (rank_col asc,
    hash) instead — "keep the n best by score, hash-tiebroken"."""
    strata = [stratum_cols] if isinstance(stratum_cols, str) else list(stratum_cols)
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    h = coin if coin is not None else F.xxhash64(*[F.col(c) for c in keys], F.lit(salt))
    order = [F.col(rank_col).asc()] if rank_col else []
    order += [h.asc()] + [F.col(c).asc() for c in keys]
    w = Window.partitionBy(*strata).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    key_cols: "str | list[str]",
    salt: str = "",
    coin: "F.Column | None" = None,
    flag_col: str = "kept",
    size_col: "str | None" = None,
) -> DataFrame:
    """Deterministic mixture resampling: thin each group so the KEPT
    corpus follows ``weights`` (the data-mixing step before training —
    "20% code, 30% web, …" — GPT-3/LLaMA-style source weighting). The
    kept total is the LARGEST achievable without upsampling: T =
    min over groups of n_g / w_g, and each group keeps T*w_g rows in
    expectation via the same deterministic Bernoulli coin as
    ``hash_sample`` (content-keyed: stable under reruns, partitioning,
    and cluster size). Groups absent from ``weights`` (or weighted 0)
    are dropped.

    Scale shape: one count aggregate over the group key (groups are
    mixture components — O(10-100) rows), the feasibility min and the
    per-group thresholds computed ON that tiny aggregate, broadcast
    back, then a zero-shuffle coin filter. The corpus itself never
    shuffles.

    Output: input columns + ``flag_col`` (boolean; filter on it or use
    the convenience return of only-kept rows via ``.where(flag_col)``).
    Thresholds are integer (coin-denominator) values, so membership is
    exact rational arithmetic — SQL-replayable with ``knuth_coin``.

    ``size_col`` switches the mixture from document counts to MASS
    (pass a token-count column): real training mixtures weight by
    tokens, not documents (GPT-3 Table 2.2 weights are token
    fractions), and with heterogeneous doc lengths the two differ
    materially. Group mass m_g = sum(size), T = min(m_g / w_g), each
    group keeps rows with probability T*w_g/m_g — so the kept TOKEN
    mass per group is T*w_g in expectation while the coin stays
    per-document (membership still content-deterministic and
    SQL-replayable; a group whose mass is zero counts as absent).
    """
    spark = df.sparkSession
    wdf = F.broadcast(
        spark.createDataFrame(
            [(k, float(v)) for k, v in sorted(weights.items())],
            f"{group_col} string, __w double",
        )
    )
    mass = (
        F.count(F.lit(1)) if size_col is None
        else F.coalesce(F.sum(F.col(size_col)), F.lit(0)).cast("double")
    )
    counts = df.groupBy(group_col).agg(mass.alias("__n"))
    # a weighted group with ZERO rows makes the target mixture
    # unsatisfiable at any T > 0 — silently dropping it would return a
    # corpus that ignores the contract (e.g. 100% of the other group),
    # so fail loudly. The check is one action over the O(groups)
    # aggregate, not the corpus.
    positive = {k for k, v in weights.items() if v > 0}
    present = {
        r[group_col]
        for r in counts.where(F.col("__n") > 0).select(group_col).collect()
    }
    missing = sorted(positive - present)
    if missing:
        raise ValueError(
            "mixture_sample: weighted groups absent from the data "
            f"(target mixture unsatisfiable): {missing}"
        )
    rates = counts.join(wdf, group_col, "inner").where(F.col("__w") > 0)
    t_total = rates.agg(
        F.min(F.col("__n") / F.col("__w")).alias("__t")
    )
    rates = rates.crossJoin(F.broadcast(t_total)).select(
        group_col,
        F.round(
            F.col("__t") * F.col("__w") / F.col("__n") * F.lit(_DENOM), 0
        ).cast("bigint").alias("__thresh"),
    )
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if coin is None:
        coin = F.pmod(
            F.xxhash64(*[F.col(c) for c in keys], F.lit(salt)), F.lit(_DENOM)
        )
    out = df.join(F.broadcast(rates), group_col, "left")
    return out.withColumn(
        flag_col,
        F.when(F.col("__thresh").isNull(), F.lit(False)).otherwise(
            coin < F.col("__thresh")
        ),
    ).drop("__thresh")


def shard_corpus(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic corpus shuffle + shard assignment — the training-
    prep step between corpus curation and the data loader: every
    document gets a shard in [0, n_shards) and a dense 1-based position
    inside its shard, both pure functions of the document key, so the
    training stream order is reproducible across runs, engines, and
    partitionings (what an rng-seeded global sort cannot promise when
    the input partitioning changes).

    Shard = the SQL-replayable Knuth coin mod n_shards (hash-balanced:
    expected skew O(sqrt(N/n_shards))). Caveat, documented because it
    is visible: the coin takes the product's LOW bits, so for
    power-of-two n_shards where K mod n_shards is small (K ≡ 1 mod 16)
    dense integer keys degrade to round-robin — balance-optimal, just
    not pseudorandom; the SHUFFLE still comes from the within-shard
    order. That order = the same key scrambled mod 1e9+7 (a
    near-bijection on id space, so adjacent ids scatter), ties broken
    by key. Readers that interleave shards round-robin by position get
    a deterministic global shuffle.

    Scale shape: ONE exchange keyed on the shard id plus the per-shard
    sort that IS the product (a materialized shuffle order cannot cost
    less than ordering each shard); no global sort, no driver state.
    Size n_shards so a shard fits one output file (~N/n_shards rows);
    skew-free by hash balance, so every sort task gets ~equal rows.
    """
    key = F.col(key_col)
    shard = knuth_coin(key, denom=int(n_shards))
    okey = knuth_coin(key, denom=1_000_000_007)
    w = Window.partitionBy(shard_col).orderBy(F.col("__okey").asc(), key.asc())
    return (
        df.withColumn(shard_col, shard.cast("int"))
        .withColumn("__okey", okey)
        .withColumn(pos_col, F.row_number().over(w))
        .drop("__okey")
    )


def pps_bottomk(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    ticket_cap: int = 64,
    key_out: str = "ticket_key",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement by bottom-k
    of replicated-ticket hashes — the probability-proportional-to-size
    subset pass (oversample long/high-quality documents when thinning a
    corpus, weighted eval holdouts). Cohen & Kaplan's bottom-k sketch
    construction with INTEGER weights-as-tickets: a row of weight w gets
    tickets 1..w, each ticket an independent SQL-replayable Knuth coin
    on the injective id key*(cap+1)+j, the row's key is its MINIMUM
    ticket, and the sample is the k smallest row keys (ties broken by
    row key). P(min of w uniforms < t) = 1-(1-t)^w, so inclusion odds
    scale ~linearly with w at small sampling fractions — the classic
    Efraimidis-Spirakis u^(1/w) scheme's integer-arithmetic sibling,
    chosen because exponent/log coins are float and NOT byte-replayable
    across engines, while this one is exact bigint arithmetic end to end
    (DuckDB oracle q85).

    Scale shape: the per-row min is a transform/array_min fold over a
    sequence of at most ``ticket_cap`` ints — zero shuffle, zero explode
    (the array never leaves its expression); the top-k is Spark's
    TakeOrderedAndProject (per-partition heap of k, single merge of
    k*partitions rows), never a global sort. Weights are clamped to
    [1, ticket_cap]: replication is the price of exactness, and the cap
    bounds it (beyond the cap, split the weight upstream or accept
    saturation — at PPS duty a 64:1 dynamic range covers corpus-length
    weighting).
    """
    if k < 1:
        raise ValueError("pps_bottomk: k must be >= 1")
    if ticket_cap < 1:
        raise ValueError("pps_bottomk: ticket_cap must be >= 1")
    key = F.col(key_col)
    w = F.greatest(
        F.lit(1).cast("bigint"),
        F.least(
            F.lit(int(ticket_cap)).cast("bigint"),
            F.coalesce(F.col(weight_col).cast("bigint"), F.lit(1)),
        ),
    )
    stride = F.lit(int(ticket_cap) + 1)
    tickets = F.transform(
        F.sequence(F.lit(1), w.cast("int")),
        lambda j: F.pmod(
            F.pmod(key * stride + j, F.lit(1_000_000_007)) * F.lit(KNUTH_32),
            F.lit(1_000_000_007),
        ),
    )
    return (
        df.withColumn(key_out, F.array_min(tickets))
        .orderBy(F.col(key_out).asc(), key.asc())
        .limit(int(k))
    )


def domain_split(
    df: DataFrame,
    domain_col: str = "domain_key",
    val_permille: int = 100,
    test_permille: int = 50,
) -> DataFrame:
    """Leakage-safe train/val/test assignment at REGISTRABLE-DOMAIN
    granularity: every document of a domain lands in the same split, so
    near-duplicate pages, mirrors, and templated siblings from one site
    can never straddle the train/test boundary (the web-corpus eval-
    leakage failure mode row-level ``hash_split`` cannot prevent).

    The coin is a pure function of the domain STRING (poly-31 codepoint
    fold mod 1e9+7 + Knuth mix — quality_model's SQL-replayable
    convention), so assignment is reproducible across runs, engines,
    and partitionings, and needs NO shuffle: the verdict fuses into
    whatever scan already carries the domain column. Thresholds are
    exact integer permille comparisons.
    """
    from raven_spark.operators.quality_model import feature_bucket_col

    coin = feature_bucket_col(F.col(domain_col), 1000)
    split = (
        F.when(coin < F.lit(int(test_permille)), F.lit("test"))
        .when(coin < F.lit(int(test_permille + val_permille)), F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def doremi_weights(
    df: DataFrame,
    domain_col: str,
    loss_col: str,
    eta: float = 0.5,
    iterations: int = 3,
    iter_dp: int = 9,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al., NeurIPS 2023) — the
    iterative upgrade over static token-mass mixture weights (q70):
    exponentiated-gradient ascent boosts domains with high EXCESS loss
    (hard/underfit data) and decays those already well-covered, yielding
    the sampling weights a pretraining mixture actually uses.

    Deterministic simplification for the batch engine (no proxy-model
    training loop in-sandbox): the per-domain loss signal is a column
    the caller supplies (a perplexity/quality proxy per row, averaged
    per domain once), and the excess term is loss_d * (1 - w_d) — the
    standard "weighted by how little of the mixture the domain already
    owns" damping, so iterations genuinely interact:

        w_0 = 1/D
        raw_{t+1,d} = round(w_t,d * exp(eta * loss_d * (1 - w_t,d)), dp)
        w_{t+1}     = round(raw_{t+1} / sum(raw_{t+1}), dp)

    Per-iteration rounding (iter_dp, the pagerank discipline) makes the
    float math order-independent and the DuckDB twin (q109) replayable.

    Scale shape: ONE map-side-combinable aggregate over the corpus
    (O(domains) rows out — domains are 10s-1000s); the T iterations run
    on that tiny frame (normalization = broadcast 1-row sum join), so
    cost is one corpus scan regardless of T. No driver residency — the
    weights stay a DataFrame.

    Output: (domain, loss 6dp, weight 6dp) with sum(weight) ~= 1.
    """
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.round(F.avg(F.col(loss_col)), iter_dp).alias("loss")
    )
    n_dom = per.count()
    if n_dom == 0:
        raise ValueError("doremi_weights: no domains")
    w = per.select(
        "domain", "loss", F.round(F.lit(1.0) / F.lit(float(n_dom)), iter_dp).alias("w")
    )
    for _ in range(int(iterations)):
        raw = w.select(
            "domain",
            "loss",
            F.round(
                F.col("w")
                * F.exp(F.lit(float(eta)) * F.col("loss") * (F.lit(1.0) - F.col("w"))),
                iter_dp,
            ).alias("__raw"),
        )
        tot = raw.agg(F.sum("__raw").alias("__tot"))
        w = raw.crossJoin(F.broadcast(tot)).select(
            "domain",
            "loss",
            F.round(F.col("__raw") / F.col("__tot"), iter_dp).alias("w"),
        )
    return w.select(
        "domain", F.round("loss", 6).alias("loss"), F.round("w", 6).alias("weight")
    )


def temperature_weights(
    df: DataFrame,
    group_col: str,
    temperature: float = 0.7,
    size_col: "str | None" = None,
    iter_dp: int = 9,
) -> DataFrame:
    """Temperature-scaled sampling weights (the multilingual/
    multi-source rebalancing of XLM-R, Conneau et al. 2020 §3, and
    mT5): raw group shares p_g = m_g / M are exponentiated and
    renormalized,

        q_g = round(p_g^T, dp) / sum(round(p_g^T, dp))

    T = 1 reproduces natural proportions; T -> 0 approaches uniform —
    the knob that keeps head domains/languages from drowning the tail
    without DoReMi's (q109) iterative loss feedback. Output feeds
    ``mixture_sample`` as its ``weights`` (via a collected O(groups)
    dict) or joins downstream as a DataFrame.

    Scale shape: ONE map-side-combinable aggregate over the corpus
    (count or sum(size_col) per group — O(groups) rows out), then pure
    column algebra with a broadcast 1-row total; the corpus never
    shuffles. Per-step rounding (iter_dp) replays in the DuckDB twin
    (q121).

    Output: (group, mass, p_raw 6dp, weight 6dp), sum(weight) ~= 1.
    """
    if temperature <= 0:
        raise ValueError("temperature_weights: temperature must be > 0")
    mass = (
        F.sum(F.col(size_col)) if size_col is not None else F.count(F.lit(1))
    ).alias("mass")
    per = df.groupBy(F.col(group_col).alias("group")).agg(mass)
    tot = per.agg(F.sum("mass").alias("__tot"))
    scaled = per.crossJoin(F.broadcast(tot)).select(
        "group",
        "mass",
        # try_divide: an all-zero-mass slice (every doc empty under
        # size_col) gives __tot = 0, and plain / throws DIVIDE_BY_ZERO
        # under the session's default ANSI mode — NULL weights are the
        # contract instead (matches shard_skew/ks_group_drift siblings)
        F.round(
            F.try_divide(
                F.col("mass").cast("double"), F.col("__tot").cast("double")
            ),
            iter_dp,
        ).alias("__p"),
    )
    powed = scaled.select(
        "group",
        "mass",
        "__p",
        F.round(F.pow(F.col("__p"), F.lit(float(temperature))), iter_dp).alias("__q"),
    )
    qtot = powed.agg(F.sum("__q").alias("__qtot"))
    return (
        powed.crossJoin(F.broadcast(qtot))
        .select(
            "group",
            "mass",
            F.round("__p", 6).alias("p_raw"),
            F.round(F.try_divide(F.col("__q"), F.col("__qtot")), 6).alias("weight"),
        )
    )


def token_budget_allocation(
    df: DataFrame,
    source_col: str = "source",
    avail_col: str = "avail_tokens",
    weight_col: str = "weight",
    budget: float = 1.0e12,
    max_epochs: float = 4.0,
) -> DataFrame:
    """Token-budget allocation across sources by WATER-FILLING — the
    recipe math of assembling a fixed-size training mix: fill a budget
    of B tokens at target mixture weights w_g (from temperature_weights
    q121 / doremi_weights q109 / hand-set) without repeating any source
    beyond ``max_epochs`` passes over its available tokens. Sources too
    small to supply their target share saturate at cap_g =
    avail_g * max_epochs and their shortfall re-flows to the rest at
    the target proportions:

        alloc_g = min(cap_g, w_g * L)   with L s.t. sum_g alloc_g = B

    Closed form, no iteration: sort sources by saturation point
    r_g = cap_g / w_g ascending; with the first i sources saturated the
    water level is L_i = (B - sum_{j<=i} cap_j) / sum_{j>i} w_j, and
    exactly one i satisfies r_i <= L_i < r_{i+1} (r_0 = -inf,
    r_{n+1} = +inf). If B >= sum cap_g even full saturation cannot fill
    the budget: every source caps out and the row-level ``underfilled``
    flag reports the gap — a silent partial fill would read as a
    complete mix.

    Scale shape: one O(sources) aggregate-normalized weight pass, one
    O(sources) sort window for the prefix sums (sources = domains /
    languages / dumps — bounded by groups, never corpus rows; the
    single-partition window is the same O(groups) shape as
    temperature_weights), one broadcast of the 1-row chosen level.

    Output per source: (source, avail_tokens, cap, w_norm 9dp, alloc
    2dp, epochs 6dp, saturated, underfilled). sum(alloc) = min(B,
    sum cap) up to rounding.
    """
    if budget <= 0 or max_epochs <= 0:
        raise ValueError("token_budget_allocation: budget and max_epochs must be > 0")
    base = df.select(
        F.col(source_col).alias("source"),
        F.col(avail_col).cast("double").alias("avail"),
        F.col(weight_col).cast("double").alias("w_raw"),
    ).filter((F.col("avail") > 0) & (F.col("w_raw") > 0))
    wtot = base.agg(F.sum("w_raw").alias("__wt"))
    rows = base.crossJoin(F.broadcast(wtot)).select(
        "source",
        "avail",
        F.round(F.try_divide(F.col("w_raw"), F.col("__wt")), 9).alias("w"),
        (F.col("avail") * F.lit(float(max_epochs))).alias("cap"),
    )
    # saturation point; rounded weights (9dp) make the division replay
    # in the oracle
    rows = rows.withColumn("r", F.try_divide(F.col("cap"), F.col("w")))
    wsort = Window.orderBy(F.col("r").asc(), F.col("source").asc())
    wall = wsort.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pre = rows.select(
        "*",
        F.sum("cap").over(
            wsort.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__pcap"),
        F.sum("w").over(
            wsort.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__pw"),
        F.sum("cap").over(wall).alias("__tcap"),
        F.sum("w").over(wall).alias("__tw"),
        F.lead("r").over(wsort).alias("__rnext"),
    )
    # candidate water level with THIS row (and all before it) saturated
    lvl_i = F.try_divide(
        F.lit(float(budget)) - F.col("__pcap"), F.col("__tw") - F.col("__pw")
    )
    # ... and with NO row saturated (i = 0)
    lvl_0 = F.lit(float(budget)) / F.col("__tw")
    chosen = (
        pre.select(
            F.when(
                (F.row_number().over(wsort) == 1) & (lvl_0 < F.col("r")),
                lvl_0,
            )
            .when(
                (F.col("r") <= lvl_i)
                & (lvl_i < F.coalesce("__rnext", F.lit(float("inf")))),
                lvl_i,
            )
            .alias("__lvl")
        )
        .filter(F.col("__lvl").isNotNull())
        .agg(F.min("__lvl").alias("__lvl"))
    )
    out = pre.crossJoin(F.broadcast(chosen)).select(
        "source",
        F.col("avail").alias("avail_tokens"),
        "cap",
        F.col("w").alias("w_norm"),
        F.round(
            F.when(
                F.col("__lvl").isNull() | (F.col("__tcap") <= F.lit(float(budget))),
                F.col("cap"),
            ).otherwise(F.least("cap", F.col("w") * F.col("__lvl"))),
            2,
        ).alias("alloc"),
        (F.col("__tcap") <= F.lit(float(budget))).alias("underfilled"),
    )
    return out.select(
        "source",
        "avail_tokens",
        "cap",
        "w_norm",
        "alloc",
        F.round(F.try_divide(F.col("alloc"), F.col("avail_tokens")), 6).alias(
            "epochs"
        ),
        (F.col("alloc") >= F.col("cap")).alias("saturated"),
        "underfilled",
    )


def neyman_allocation(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "score",
    total_samples: int = 1000,
    n_buckets: int = 256,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation (Neyman 1934) — how
    many eval/audit samples to draw from each stratum when the budget
    is fixed: minimum-variance estimation allocates

        n_h  ∝  N_h * S_h

    (stratum size x stratum stddev of the audited variable), NOT
    proportionally to size — a homogeneous stratum needs few samples
    however big it is. This is the statistically-correct front end to
    stratified_sample's per-group caps (q41) for QA sampling, human
    eval batches, and filter-calibration audits.

    Moments use the engine's EXACT fixed-point discipline
    (domain_score_normalize q134): 6-dp values summed as
    round(v*1e6) / squared in decimal(38,0), zero-variance guarded on
    exact min<max order stats. The float N_h*S_h weight is then
    integerized at 1e6 and fed to allocate_domain_budget's two-level
    cumulative rounding (q83), so allocations are integers summing to
    EXACTLY ``total_samples`` (when any stratum has variance) with
    every step SQL-replayable. Zero-variance strata allocate 0 — pure
    Neyman; add a floor downstream if a minimum per stratum is policy.

    Scale shape: one group-keyed moment aggregate (map-side
    combinable, O(strata) out) + the allocator's O(n_buckets) window
    and one in-bucket running sum — strata never leave their bucket
    partition, nothing scales with corpus rows after the first
    aggregate.

    Output: (group, n_stratum, mean 6dp, std 6dp, neyman_weight
    bigint, alloc bigint).
    """
    from raven_spark.operators.reputation import allocate_domain_budget

    v6 = F.round(F.col(value_col).cast("double"), 6)
    base = df.filter(
        F.col(group_col).isNotNull() & v6.isNotNull()
    ).select(F.col(group_col).alias("__g"), v6.alias("__v"))
    vfp = F.round(F.col("__v") * F.lit(1e6), 0).cast("decimal(38,0)")
    mom = base.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(vfp).alias("__sum"),
        F.sum(vfp * vfp).alias("__sumsq"),
        F.min("__v").alias("__lo"),
        F.max("__v").alias("__hi"),
    )
    mean = F.col("__sum").cast("double") / F.lit(1e6) / F.col("__n")
    ex2 = F.col("__sumsq").cast("double") / F.lit(1e12) / F.col("__n")
    std = F.when(
        F.col("__lo") < F.col("__hi"), F.sqrt(ex2 - mean * mean)
    ).otherwise(F.lit(0.0))
    strata = mom.select(
        "__g",
        F.col("__n").cast("bigint").alias("n_stratum"),
        mean.alias("__mean"),
        std.alias("__std"),
        F.round(F.col("__n").cast("double") * std * F.lit(1e6), 0)
        .cast("bigint")
        .alias("neyman_weight"),
    )
    alloc = allocate_domain_budget(
        strata.select(
            F.col("__g").alias("domain"), F.col("neyman_weight").alias("weight")
        ),
        total_budget=int(total_samples),
        n_buckets=int(n_buckets),
    )
    return strata.join(
        alloc.select(F.col("domain").alias("__g"), F.col("budget").alias("alloc")),
        "__g",
    ).select(
        F.col("__g").alias(group_col),
        "n_stratum",
        (F.round("__mean", 6) + F.lit(0.0)).alias("mean"),
        F.round("__std", 6).alias("std"),
        "neyman_weight",
        "alloc",
    )


def materialize_mixture(
    docs: DataFrame,
    epochs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize a training mixture from per-source EPOCH factors —
    the final step between recipe math (token_budget_allocation q128 /
    temperature_weights q121 / doremi_weights q109 all end in an
    epochs-per-source number) and the physical training corpus: emit
    each document floor(e) whole times plus one extra copy with
    probability frac(e), decided by the engine's deterministic
    Knuth coin on the doc id. In expectation every source contributes
    exactly avail * e tokens, per-doc inclusion is a pure function of
    (id, epochs) — reshuffling partitions or re-running the job yields
    the SAME corpus (the deterministic_sample q41 property, extended
    to epoch repetition), and no source is ever repeated beyond
    ceil(e) passes.

    ``epochs``: (source, epochs double >= 0) — pass
    token_budget_allocation's output directly.

    Scale shape: one broadcast join against the O(sources) epoch
    table, one codegen'd coin + copy-count projection, one explode
    bounded by ceil(e) rows per doc — no shuffle of doc rows at all
    (plan: scan -> BroadcastHashJoin -> generate). The fractional coin
    uses frac(e) at 1e-6 resolution (the knuth_coin denominator), so
    the SQL twin replays membership exactly.

    Output: (id, source, copy int 1-based) — copy enumerates a doc's
    repetitions; downstream shard assignment (q81) takes (id, copy) as
    the shuffle key so repeated copies land in different shards.
    """
    ep = epochs.select(
        F.col(source_col).alias("__src"),
        F.col("epochs").cast("double").alias("__e"),
    )
    full = F.floor(F.col("__e")).cast("int")
    frac6 = F.round((F.col("__e") - full) * F.lit(_DENOM), 0).cast("bigint")
    n_copies = full + (
        knuth_coin(F.col(id_col)) < frac6
    ).cast("int")
    return (
        docs.select(F.col(id_col), F.col(source_col))
        .join(
            F.broadcast(ep),
            F.col(source_col) == F.col("__src"),
        )
        .select(
            id_col,
            source_col,
            F.explode(
                F.when(
                    n_copies >= 1, F.sequence(F.lit(1), n_copies)
                )
            ).alias("copy"),
        )
    )


def cluster_balanced_sample(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    total: int = 1000,
    n_planes: int = 4,
    alpha_pct: int = 50,
    prefilter_margin: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Diversity-balanced corpus sampling over CONTENT clusters — the
    embedding-space answer to "don't let the biggest topic eat the
    sample" (the cluster-balanced selection step of SemDedup-style and
    DoReMi-style curation): bucket documents by a deterministic
    sign-LSH code over their embeddings (2^n_planes content clusters —
    the q96 Knuth-coin projection, so clustering is a pure function of
    the vector), allocate the sample across clusters proportional to
    size^(alpha_pct/100), and draw each cluster's quota by the
    engine's deterministic coin.

    alpha < 1 is the diversity knob: alpha=1 reproduces proportional
    sampling, alpha=0 samples clusters uniformly; the default sqrt
    upweights small topics. The size^alpha weight is integerized at
    1e6 and fed through allocate_domain_budget's two-level cumulative
    rounding (q83), so quotas are integers summing to exactly
    ``total``; a quota exceeding its cluster's size is capped there
    and the surplus FORFEITED (the allocator's politeness-cap
    convention), so the realized sample is total minus such forfeits.

    Scale shape: the cluster code is zero-shuffle column algebra fused
    into the scan; the allocation is O(clusters); selection is the
    politeness-window discipline applied to sampling — a coin
    PREFILTER (coin < margin * quota/size, a per-cluster literal-free
    threshold on a uniform coin) shrinks each cluster's window input
    to ~margin*quota rows BEFORE the exact rank, so the per-cluster
    sort never sees the full corpus slice. The prefilter is part of
    the operator's definition (both engines replay it), so the sample
    stays a pure function of the data even in the astronomically
    unlikely event the margin undershoots.

    Output: (id, cluster int, coin bigint) — the selected rows only,
    coin exposed for downstream tie-audits.
    """
    from raven_spark.operators.reputation import allocate_domain_budget
    from raven_spark.operators.similarity import random_projection

    # ``dim`` must match the embedding width: random_projection's
    # zip_with pads a shorter sign row with NULLs, the projection (and
    # therefore the cluster code) goes NULL, the NULL key never matches
    # the quota join, and the operator would SILENTLY return an empty
    # sample. raise_error turns that silent wrong answer into a loud
    # one (evaluated lazily, only on rows whose code is NULL).
    proj = random_projection(emb, vec_col, id_col, out_dim=n_planes, dim=dim)
    code = sum(
        (F.element_at("proj", j + 1) > 0).cast("int") * F.lit(1 << j)
        for j in range(int(n_planes))
    )
    assigned = proj.select(
        F.col(id_col).alias("__id"),
        F.coalesce(
            code,
            F.raise_error(
                F.lit(
                    "cluster_balanced_sample: NULL cluster code — embedding"
                    f" width does not match dim={int(dim)} (pass dim= equal"
                    " to the vector length)"
                )
            ).cast("int"),
        ).alias("cluster"),
        knuth_coin(F.col(id_col)).alias("__coin"),
    )
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("__n"))
    # size^alpha at 1e6 fixed point: the one float step before the
    # integer allocator. alpha=50 (the default) uses sqrt — IEEE
    # correctly-rounded, so Spark and the SQL twin produce the SAME
    # bits; other alphas go through exp/ln, where libm implementations
    # may differ by an ulp (harmless for sampling, but only sqrt earns
    # the bit-exact oracle)
    nf = F.col("__n").cast("double")
    powed = (
        F.sqrt(nf)
        if int(alpha_pct) == 50
        else F.exp(F.log(nf) * F.lit(int(alpha_pct) / 100.0))
    )
    w = sizes.select(
        "cluster",
        "__n",
        F.round(powed * F.lit(1e6), 0).cast("bigint").alias("__w"),
    )
    alloc = allocate_domain_budget(
        w.select(F.col("cluster").cast("string").alias("domain"), F.col("__w").alias("weight")),
        total_budget=int(total),
        n_buckets=16,
    ).select(
        F.col("domain").cast("int").alias("cluster"),
        F.col("budget").alias("__q"),
    )
    # quota capped at cluster size: alpha < 1 can allocate a tiny
    # cluster more rows than it has; the surplus is FORFEITED, not
    # redistributed (allocate_domain_budget's politeness-cap
    # convention) — output size is total minus such forfeits
    quota = w.join(alloc, "cluster").select(
        "cluster",
        "__n",
        F.least(F.col("__q"), F.col("__n")).alias("__q"),
        F.least(
            F.lit(_DENOM).cast("bigint"),
            F.ceil(
                F.lit(int(prefilter_margin) * _DENOM)
                * F.col("__q").cast("double")
                / F.col("__n").cast("double")
            ).cast("bigint"),
        ).alias("__thresh"),
    )
    pruned = assigned.join(F.broadcast(quota), "cluster").filter(
        F.col("__coin") < F.col("__thresh")
    )
    win = Window.partitionBy("cluster").orderBy(
        F.col("__coin").asc(), F.col("__id").asc()
    )
    return (
        pruned.withColumn("__rk", F.row_number().over(win))
        .filter(F.col("__rk") <= F.col("__q"))
        .select(
            F.col("__id").alias(id_col),
            "cluster",
            F.col("__coin").alias("coin"),
        )
    )
