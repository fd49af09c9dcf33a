"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator family from SURVEY.md §2
plus the training-data pipeline ops (dedup/similarity/text/multimodal);
``oracle_sql()`` gives the DuckDB-runnable ANSI twin for everything
SQL-expressible. Crawl-engine queries that exercise mapInPandas stages or
iterative rounds are rows-only (documented per entry).

Column names and types are aligned on BOTH sides (explicit aliases +
casts) because the driver hashes values after sorting columns by name.
Float aggregates are rounded on both sides to absorb summation-order
noise (Spark partial aggregates are parallel; DuckDB's are not).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _sf_guess(sf_dir: str) -> float:
    """Scale factor from the directory name (sfX.Y) — used to SIZE
    probabilistic structures from known population math instead of a
    driver-side count() (events ~ 10^6 x sf rows, TESTDATA.md).

    A non-conforming name falls back to sf=1.0 WITH a warning: for a
    Bloom sizing, under-sizing saturates the filter (FPR -> 1, the prune
    silently does no work) while over-sizing only costs bits — so the
    blind fallback must be the large one, and never silent."""
    import os
    import warnings

    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        warnings.warn(
            f"sf_dir basename {base!r} does not parse as sfX.Y; sizing "
            "probabilistic structures for sf=1.0 (oversize-safe fallback)",
            stacklevel=2,
        )
        return 1.0


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the documents quality/dedup pipeline at sf0.001 — exact
    dedup + language ID + quality + token counting rolled up per language.
    """
    sf_dir = "/root/testdata/sf0.001"
    return _flagship(spark, sf_dir)


def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from raven_spark.functions.text import lang_id_col, quality_cols, token_count_cols
    from raven_spark.operators.dedup import exact_dedup_strict

    docs = _t(spark, sf_dir, "documents")
    q = quality_cols(F.col("text"))
    t = token_count_cols(F.col("text"))
    enriched = docs.select(
        "doc_id",
        "lang",
        lang_id_col(F.col("text")).alias("lang_pred"),
        q["quality_score"].alias("quality_score"),
        t["bpe_tokens"].alias("bpe_tokens"),
    )
    dups = exact_dedup_strict(docs)
    return (
        enriched.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("quality_score"), 6).alias("avg_quality"),
            F.sum("bpe_tokens").alias("total_bpe_tokens"),
            F.sum(F.when(F.col("lang_pred") == F.col("lang"), 1).otherwise(0)).alias("langid_hits"),
        )
        .crossJoin(dups.agg(F.count("*").alias("n_unique_texts")))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q01_pricing_summary(spark, sf_dir):
    """Full-scan aggregate (TPC-H Q1 shape): filter pushdown + grouped
    partial aggregation (SURVEY §2.2 projection/filter/aggregation)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1997-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q02_revenue_by_nation(spark, sf_dir):
    """Multi-way join with broadcast dims (lineitem⋈orders⋈customer⋈nation
    ⋈region) — §2.2 joins; dims are broadcast, fact never shuffles twice."""
    li, o, c, n, r = (
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


def q03_top_events_per_user(spark, sf_dir):
    """Window top-k per key (the politeness-budget primitive, §2.2
    window functions)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        e.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "event_id", "rnk", F.round("value", 2).alias("value"))
    )


def q04_running_value(spark, sf_dir):
    """Running aggregate + lag per user ordered by time (§2.2 windows)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias("running_value"),
        F.coalesce(F.lag("event_id").over(w), F.lit(-1)).alias("prev_event_id"),
    )


def q05_customers_without_orders(spark, sf_dir):
    """Anti-join — the url_seen EXCEPT primitive (§2.2 set ops)."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def q06_region_priority_grid(spark, sf_dir):
    """Cross join — the reference's ONLY join (vars x params, config.rs:90,
    §2 T5) re-expressed relationally."""
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return r.crossJoin(p).select("r_name", "o_orderpriority")


def q07_range_expansion(spark, sf_dir):
    """explode(sequence(a,b)) — numeric-range task expansion (§2 T3,
    parser.rs:166-209) at data scale."""
    n = _t(spark, sf_dir, "nation")
    return (
        n.select(
            "n_name",
            F.explode(F.sequence(F.lit(1), F.pmod(F.col("n_nationkey"), F.lit(5)) + 1)).alias("task_id"),
        )
        .groupBy("n_name")
        .agg(F.count("*").alias("n_tasks"), F.sum("task_id").alias("sum_task_id"))
    )


def q08_date_rollup(spark, sf_dir):
    """strftime-style date binding (§2 T2, config.rs:50) as a rollup key."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total_price"))
    )


def q09_exact_dedup(spark, sf_dir):
    """Exact dedup: normalize -> group -> keep min id (dedup family #1)."""
    from raven_spark.operators.dedup import exact_dedup_strict

    return exact_dedup_strict(_t(spark, sf_dir, "documents"))


def q10_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard pairs within (lang, length-bucket) blocks
    (dedup family #4; the oracle ground truth for MinHash)."""
    from raven_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents").withColumn(
        "len_bucket", (F.col("n_chars") / 50).cast("int")
    )
    return ngram_jaccard_pairs(
        docs, block_cols=("lang", "len_bucket"), n=3, threshold=0.12
    )


def q11_lang_id(spark, sf_dir):
    """Marker-based language ID (text analysis family)."""
    from raven_spark.functions.text import lang_id_col

    return _t(spark, sf_dir, "documents").select(
        "doc_id", lang_id_col(F.col("text")).alias("lang_pred")
    )


def q12_quality(spark, sf_dir):
    """Quality scoring signals (text analysis family)."""
    from raven_spark.functions.text import quality_cols

    q = quality_cols(F.col("text"))
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        q["n_words"].alias("n_words"),
        q["alpha_ratio"].alias("alpha_ratio"),
        q["stopword_ratio"].alias("stopword_ratio"),
        q["quality_score"].alias("quality_score"),
    )


def q13_token_counts(spark, sf_dir):
    """Token counting: whitespace + BPE-ish regex + chars/4 estimator."""
    from raven_spark.functions.text import token_count_cols

    t = token_count_cols(F.col("text"))
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        t["ws_tokens"].alias("ws_tokens"),
        t["bpe_tokens"].alias("bpe_tokens"),
        t["approx_llm_tokens"].alias("approx_llm_tokens"),
    )


_FP_WEIGHTS = [1, 31, 961, 29791]  # 31^(i%4) — keeps products < 2^31 pre-cast


def q14_fingerprint(spark, sf_dir):
    """Document fingerprinting: position-weighted codepoint hash over the
    first 64 chars, mod 1e9+7 (rolling-hash family; SQL-replicable)."""
    docs = _t(spark, sf_dir, "documents")
    idx = F.sequence(F.lit(1), F.least(F.length("text"), F.lit(64)))
    weights = F.array(*[F.lit(w) for w in _FP_WEIGHTS])
    term = lambda i: F.ascii(F.substring(F.col("text"), i, F.lit(1))).cast("bigint") * F.element_at(  # noqa: E731
        weights, (F.pmod(i - 1, F.lit(4)) + 1).cast("int")
    ).cast("bigint")
    fp = F.pmod(F.aggregate(idx, F.lit(0).cast("bigint"), lambda acc, i: acc + term(i)), F.lit(1000000007))
    return docs.select("doc_id", fp.alias("fingerprint"))


def q15_url_canonicalize(spark, sf_dir):
    """RFC-3986 canonicalization (the engine's core scalar op) over messy
    URLs synthesized from doc_id; the oracle constructs the expected
    canonical form directly."""
    from raven_spark.functions.urls import canonicalize_udf

    docs = _t(spark, sf_dir, "documents")
    h = F.pmod(F.col("doc_id"), F.lit(7)).cast("string")
    i = F.col("doc_id").cast("string")
    variant = F.pmod(F.col("doc_id"), F.lit(4))
    messy = (
        F.when(variant == 0, F.concat(F.lit("https://host"), h, F.lit(".example/p/"), i))
        .when(variant == 1, F.concat(F.lit("HTTPS://HOST"), h, F.lit(".EXAMPLE/p/"), i, F.lit("#frag")))
        .when(variant == 2, F.concat(F.lit("https://host"), h, F.lit(".example:443/p/"), i, F.lit("?")))
        .otherwise(F.concat(F.lit("https://host"), h, F.lit(".example/p/x/../"), i))
    )
    return docs.select("doc_id", canonicalize_udf(messy).alias("url_canon"))


def q16_politeness_budget(spark, sf_dir):
    """Per-host token bucket: scheduled vs deferred counts under budget=3
    (frontier synthesized from events; host = user_id bucket)."""
    e = _t(spark, sf_dir, "events")
    frontier = e.select(
        F.concat(F.lit("h"), F.pmod(F.col("user_id"), F.lit(20)).cast("string")).alias("host"),
        F.col("event_id").alias("url_hash"),
        F.lit(100).alias("priority"),
    )
    w = Window.partitionBy("host").orderBy(F.col("priority").asc(), F.col("url_hash").asc())
    ranked = frontier.withColumn("rnk", F.row_number().over(w))
    return ranked.groupBy("host").agg(
        F.sum(F.when(F.col("rnk") <= 3, 1).otherwise(0)).alias("n_scheduled"),
        F.sum(F.when(F.col("rnk") > 3, 1).otherwise(0)).alias("n_deferred"),
    )


def q17_url_seen_subtract(spark, sf_dir):
    """URL-seen subtraction using the REAL operator (Bloom prune + exact
    anti-join) — result is exactly NOT EXISTS (bloom only prunes)."""
    from raven_spark.operators.seen import build_bloom, subtract_seen

    e = _t(spark, sf_dir, "events")
    cand = e.select(F.col("event_id").alias("url_hash"), F.col("event_id").cast("string").alias("url_canon"))
    seen = cand.filter(F.pmod(F.col("url_hash"), F.lit(3)) == 0)
    # size from the KNOWN population (events ~ 10^6 x sf rows, 1/3 seen),
    # not a driver-side count() — the engine sizes from config the same
    # way (EngineOptions.expected_total_urls); oversizing only costs bits
    expected = max(int(1_000_000 * _sf_guess(sf_dir)) // 3, 1 << 10)
    bloom = build_bloom(seen, "url_hash", expected_n=expected)
    return subtract_seen(cand, seen, bloom=bloom).select("url_hash")


def q18_ann_topk(spark, sf_dir):
    """Brute-force cosine top-10 (similarity-search baseline) against the
    vec_id=0 query vector; explicit double-precision fold matching the
    oracle's element order."""
    from raven_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return brute_force_topk(emb.filter(F.col("vec_id") != 0), list(qvec), k=10)


def q19_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs within label blocks (dedup family
    #5). Threshold tuned to the synthetic embedding distribution."""
    from raven_spark.operators.dedup import embedding_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, block_col="label", dim=64, threshold=0.3)


def q20_multimodal_roundtrip(spark, sf_dir):
    """Multimodal plumbing: embedding -> packed BINARY payload ->
    mapInPandas unpack -> L2 norm. Lossless float32 round-trip, so the
    oracle computes the same norm straight from the source column."""
    from raven_spark.functions.multimodal import embeddings_as_assets, unpack_floats_udf
    from raven_spark.operators.dedup import cosine_col  # noqa: F401 (same fold style)

    emb = _t(spark, sf_dir, "embeddings")
    assets = embeddings_as_assets(emb)
    unpacked = assets.select(
        F.col("asset_id").alias("vec_id"), unpack_floats_udf(F.col("payload")).alias("vec")
    )
    idx = F.sequence(F.lit(1), F.lit(64))
    norm = F.sqrt(
        F.aggregate(
            idx, F.lit(0.0),
            lambda acc, i: acc + F.pow(F.element_at(F.col("vec"), i.cast("int")).cast("double"), 2),
        )
    )
    return unpacked.select("vec_id", F.round(norm, 6).alias("l2_norm"))


# --- rows-only queries (non-SQL-expressible: iterative / mapInPandas) --------


def q21_minhash_dedup(spark, sf_dir):
    """MinHash+LSH dedup clusters. Oracle: because the exact-Jaccard
    verify step prunes candidates to true >=0.5 pairs and LSH recall is
    1.0 on this corpus (asserted in tests/test_dedup.py), the clusters
    equal the connected components of the exact Jaccard>=0.5 pair graph —
    which DuckDB replays with list lambdas + a recursive CTE."""
    from raven_spark.operators.dedup import minhash_dedup

    return minhash_dedup(_t(spark, sf_dir, "documents"), verify_threshold=0.5)


def q22_simhash_buckets(spark, sf_dir):
    """SimHash signatures + Hamming band buckets. Oracle: the vectorized
    kernel's arithmetic (FNV-1a per token, 64 weighted bit-planes, 8x8-bit
    bands) replayed in DuckDB with HUGEINT modular arithmetic."""
    from raven_spark.operators.dedup import simhash_buckets

    return simhash_buckets(_t(spark, sf_dir, "documents"))


def q23_lsh_topk(spark, sf_dir):
    """Approximate-ANN recall CONTRACT. The sign-LSH top-k is approximate
    by construction (buckets probe a subset of vectors), so no SQL can
    replay its exact row set; the driver-checkable contract is recall@10
    against the exact brute-force top-k (q18, which the driver DOES
    hash-check) with a deterministic threshold. Emits one row
    (k, min_recall, passed); the oracle asserts the same row, so a hash
    mismatch appears exactly when LSH recall drops below the threshold.
    The raw approximate row set itself stays covered by
    tests/test_similarity.py's recall assertions."""
    from raven_spark.operators.similarity import brute_force_topk, lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    rest = emb.filter(F.col("vec_id") != 0)
    # n_planes sized to the small store (16 buckets), margin-ordered
    # multiprobe scanning ~half the buckets: the testdata embeddings are
    # isotropic (no planted clusters; max pairwise cosine ~0.5), where
    # measured recall@10 is 0.6-0.9 across sf0.001/0.01/0.1 — threshold
    # 0.5 trips on real breakage (a probe/bucket code mismatch scans the
    # wrong ~3% of the store and recall drops to ~0.0)
    approx = lsh_topk(rest, list(qvec), k=10, n_planes=4, multiprobe=8).select("vec_id")
    exact = brute_force_topk(rest, list(qvec), k=10).select("vec_id")
    hits = approx.join(exact, "vec_id").count()
    return spark.createDataFrame(
        [(10, 0.5, hits / 10.0 >= 0.5)], "k int, min_recall double, passed boolean"
    )


def q24_crawl_round(spark, sf_dir):
    """One full crawl round over the synthetic web (mapInPandas fetch,
    Bloom, politeness — the whole engine). NO ORACLE by design: the round
    is an iterative, stateful, multi-write pipeline (catalog state on
    disk, Bloom sidecars) that no single SQL statement can express; its
    correctness gate is tests/test_reference_oracle.py, where the
    distributed engine reproduces a sequential reference crawler exactly
    (crawl order, URL-seen set, result codes, byte-identical text)."""
    import os
    import shutil
    import tempfile

    from raven_spark.config import RavenConfig, RavenRequest
    from raven_spark.engine import CrawlEngine, EngineOptions
    from raven_spark.operators.fetch import SyntheticFetcher
    from raven_spark.sources.corpus import generate_pages, seed_urls

    n_pages = 20000 if sf_dir.rstrip("/").endswith("sf0.1") else 2000
    corpus = generate_pages(spark, n_pages, seed=42)
    cfg = RavenConfig(
        name="entry_crawl",
        request=RavenRequest(url="https://x/", max_retry=1),
        host_budget_per_round=100,
        max_rounds=1,
    )
    state = tempfile.mkdtemp(prefix="raven_q24_")
    try:
        eng = CrawlEngine(
            spark, cfg, state, SyntheticFetcher(corpus, seed=42),
            options=EngineOptions(expected_total_urls=1 << 16),
        )
        eng.run(seed_urls=seed_urls(50, n_pages), max_rounds=1)
        metrics = eng.table("metrics")
        out = metrics.groupBy("result_code", "result_label").agg(
            F.count("*").alias("n"), F.sum("request_duration_millis").alias("total_ms")
        ).orderBy("result_code").collect()
        return spark.createDataFrame(out)
    finally:
        shutil.rmtree(state, ignore_errors=True)


def q25_media_features(spark, sf_dir):
    """Multimodal feature extraction over binary assets via mapInPandas.
    Oracle: the payload is self-describing (RVSB header + float32 count),
    so n_bytes/width/height are byte arithmetic over the header that
    DuckDB replays from len(embedding) alone."""
    from raven_spark.functions.multimodal import embeddings_as_assets, extract_media_features

    assets = embeddings_as_assets(_t(spark, sf_dir, "embeddings"))
    feats = extract_media_features(assets)
    return feats.select("asset_id", "kind", "n_bytes", "width", "height")


def q26_task_expansion(spark, sf_dir):
    """Task-expansion algebra end-to-end (T3+T5+T6): ranges x params ->
    bound urls, as DataFrame ops; deterministic tiny config."""
    from datetime import datetime

    from raven_spark.config import RavenConfig, RavenRequest
    from raven_spark.expansion import tasks_df

    cfg = RavenConfig(
        name="expansion",
        request=RavenRequest(
            url="https://api.example/v1/{{entity}}/items",
            method="GET",
            vars=[{"entity": ["users", "orders"], "shard": ["[1..3]"]}],
            params=[{"offset": ["0", "100"], "limit": ["50"]}],
        ),
    )
    return tasks_df(spark, cfg, datetime(2026, 1, 2)).select("url", "method")


def q27_sessionize(spark, sf_dir):
    """Sessionization (gap > 30 min starts a new session) — the batch twin
    of a streaming session window, per §2.2 (the engine is batch-rounds by
    design; reference has no streaming either)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = e.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id").agg(
        F.max("session_id").cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def q28_robots_gate(spark, sf_dir):
    """Robots gating via the REAL operator (politeness.robots_flag):
    RFC 9309 longest-matching-pattern wins (wildcards counted at raw
    length), tie -> allow, no rules row -> allowed. Candidates
    synthesized from documents; rules cover deny-all, deny-with-allow-
    carveout, rule-less hosts, a '*' glob deny with an anchored allow
    tie at /p/1, and a '$'-anchored exact-path deny. Oracle replays the
    prefix arithmetic with DuckDB list lambdas and the wildcard
    patterns explicitly with their raw lengths."""
    from raven_spark.operators.politeness import robots_flag

    d = _t(spark, sf_dir, "documents")
    host = F.concat(F.lit("h"), F.pmod(F.col("doc_id"), F.lit(7)).cast("string"), F.lit(".example"))
    path = (
        F.when(F.pmod(F.col("doc_id"), F.lit(5)) == 0,
               F.concat(F.lit("/private/a"), F.col("doc_id").cast("string")))
        .when(F.pmod(F.col("doc_id"), F.lit(5)) == 1,
              F.concat(F.lit("/private/pub/b"), F.col("doc_id").cast("string")))
        .otherwise(F.concat(F.lit("/p/"), F.col("doc_id").cast("string")))
    )
    cand = d.select(
        host.alias("host"),
        F.concat(F.lit("https://"), host, path).alias("url_canon"),
    )
    rules = spark.createDataFrame(
        [("h0.example", ["/private/pub/"], ["/private/"], 2),
         ("h1.example", [], ["/"], None),
         # RFC 9309 wildcard rules: glob deny with an anchored allow
         # carveout (tie at /p/1 exactly -> allow), and a '$'-anchored
         # deny that blocks one exact path
         ("h2.example", ["/p/1$"], ["/p/1*"], None),
         ("h3.example", [], ["/p/33$"], None)],
        "host string, allow array<string>, deny array<string>, crawl_delay_s int",
    )
    flagged = robots_flag(cand, rules)
    return (
        flagged.groupBy("host")
        .agg(
            F.sum(F.when(F.col("robots_ok"), 1).otherwise(0)).alias("n_allowed"),
            F.sum(F.when(~F.col("robots_ok"), 1).otherwise(0)).alias("n_denied"),
        )
        .orderBy("host")
    )


def q29_post_round(spark, sf_dir):
    """Config-driven POST crawl through the REAL engine (T1-T8 + F4 + P1
    in one lifecycle, main.rs:15-38): vars x params expand to tasks whose
    form bodies ride the frontier into the HTTP stage; a deterministic
    echo opener turns each request into page text the oracle reconstructs
    with plain SQL. Distinct bodies on the SAME url stay distinct tasks
    (task-identity hash folds the canonical body string)."""
    import shutil
    import tempfile

    from raven_spark.config import parse_config
    from raven_spark.engine import CrawlEngine, EngineOptions
    from raven_spark.operators.http import HttpFetcher

    cfg = parse_config({
        "name": "q29",
        "request": {
            "url": "https://api.example/{{entity}}/submit",
            "method": "POST",
            "vars": [{"entity": ["a", "b"]}],
            "params": [{"mode": ["[0..2]"]}],
        },
        "max_rounds": 1,
    })

    def opener(url, method="GET", headers=None, body=None, timeout_s=1):
        echo = f"<p>{method} {(body or b'').decode('ascii')}</p>"
        return 200, {}, echo.encode(), "text/html; charset=utf-8"

    state = tempfile.mkdtemp(prefix="raven_q29_")
    try:
        eng = CrawlEngine(
            spark, cfg, state, HttpFetcher(opener=opener),
            options=EngineOptions(expected_total_urls=1024, shuffle_partitions=4),
        )
        eng.bootstrap_from_config()
        eng.run(max_rounds=1)
        rows = eng.table("pages").select(
            "url_canon", "method", "result_code", "text"
        ).collect()
        return spark.createDataFrame(rows)
    finally:
        shutil.rmtree(state, ignore_errors=True)


def q33_brand_revenue_by_nation(spark, sf_dir):
    """Top-3 part brands by revenue per supplier nation: fact scan joins
    three BROADCAST dims (part, supplier, nation), partial-aggregated
    map-side, ranked by a per-nation window — the remaining relational
    shapes (multi-dim star join + windowed top-k) over the two tables no
    other query touched (part, supplier)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    j = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    g = j.groupBy("n_name", "p_brand").agg(
        F.round(F.sum(rev), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )
    w = Window.partitionBy("n_name").orderBy(F.col("revenue").desc(), F.col("p_brand").asc())
    return (
        g.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("n_name", "p_brand", "revenue", "n_items", "rnk")
    )


def q30_hash_split(spark, sf_dir):
    """Deterministic train/val/test split by Knuth multiplicative id hash
    (operators/pipeline.py) — reproducible across runs/partitionings; the
    oracle replays the identical BIGINT arithmetic."""
    from raven_spark.operators.pipeline import hash_split

    return hash_split(
        _t(spark, sf_dir, "documents").select("doc_id"),
        val_permille=100, test_permille=50,
    )


def q31_dup_ngram_frac(spark, sf_dir):
    """Gopher-style duplicate word-2-gram fraction per document (intra-doc
    repetition signal; pure column algebra)."""
    from raven_spark.operators.pipeline import _word_ngrams_all, dup_ngram_frac_col

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_word_ngrams_all(F.col("text"), 2)).alias("n_grams"),
        dup_ngram_frac_col(F.col("text"), 2).alias("dup_frac"),
    )


def q32_clean_corpus(spark, sf_dir):
    """Composed corpus-clean verdict: language allowlist x quality
    threshold x repetition cap x exact-dup canonical id, every reason as
    a column (operators/pipeline_filters.clean_corpus)."""
    from raven_spark.operators.pipeline_filters import clean_corpus

    return clean_corpus(
        _t(spark, sf_dir, "documents"),
        allowed_langs=("en",), min_quality=0.3, max_dup_frac=0.3, ngram_n=2,
    )


def q34_host_boilerplate(spark, sf_dir):
    """CCNet-style per-host boilerplate: 7-word windows repeated in >=3
    distinct docs of the same source are chrome; per-doc boilerplate
    fraction (operators/pipeline_filters.host_boilerplate). Counting shuffles on
    (source, xxhash64(unit)); the oracle replays with unit strings."""
    from raven_spark.operators.pipeline_filters import host_boilerplate

    return host_boilerplate(
        _t(spark, sf_dir, "documents"), window_words=7, min_docs=3
    )


def q35_contamination(spark, sf_dir):
    """Benchmark n-gram decontamination: the held-out set is doc_id % 13
    == 0 (deterministic in-repo stand-in for an eval suite); flag corpus
    docs sharing any distinct word 5-gram with it
    (operators/pipeline_filters.benchmark_contamination; benchmark grams
    broadcast)."""
    from raven_spark.operators.pipeline_filters import benchmark_contamination

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 13 == 0)
    corpus = d.filter(F.col("doc_id") % 13 != 0)
    return benchmark_contamination(corpus, bench, ngram_n=5, min_overlap=1)


def _synthetic_link_edges(d, n):
    """The deterministic synthetic link graph shared by q36 and q70:
    doc i links to (i*37 + j*1009) mod N for j in 1..3, self-loops
    dropped (the in-repo stand-in for crawl-discovered edges; both
    oracles replay the same formula)."""
    return (
        d.select(
            F.col("doc_id").alias("src"),
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
        )
        .select(
            "src",
            F.pmod(F.col("src") * 37 + F.col("j") * 1009, F.lit(n)).alias("dst"),
        )
        .filter(F.col("dst") != F.col("src"))
    )


def q36_link_pagerank(spark, sf_dir):
    """Link-graph frontier prioritization (operators/graph.py): damped
    PageRank (3 synchronous steps, per-iteration 12-dp rounding for
    replayability) + degrees over a deterministic synthetic link graph —
    doc i links to (i*37 + j*1009) mod N for j in 1..3, self-loops
    dropped — the in-repo stand-in for crawl-discovered edges (no
    external data per the task brief). The oracle unrolls the identical
    three steps in SQL."""
    from raven_spark.operators.graph import degrees, pagerank

    d = _t(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    edges = _synthetic_link_edges(d, n)
    pr = pagerank(
        edges, nodes=d.select(F.col("doc_id").alias("node")), iterations=3
    )
    deg = degrees(edges)
    return pr.join(deg, "node", "left").select(
        "node",
        "pagerank",
        F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
        F.coalesce("indeg", F.lit(0)).alias("indeg"),
    )


def q37_snapshot_dedup(spark, sf_dir):
    """Multi-snapshot URL versioning (operators/snapshots.py): the same
    canonical URL captured in many crawl snapshots reduces to its latest
    version plus churn stats. Pages are synthesized deterministically from
    documents (url = doc_id mod 137 page on doc_id mod 7 host; warc_ts
    strictly increasing in doc_id, so 'latest' = max doc_id per url and
    the oracle replays with a window). latest_snapshot is a single
    map-side-partial max_by aggregate — hot URLs reduce before the
    shuffle; stats is a second hash aggregate on the same key."""
    from raven_spark.operators.snapshots import latest_snapshot, snapshot_stats

    d = _t(spark, sf_dir, "documents")
    epoch = 1767225600  # 2026-01-01T00:00:00Z
    pages = d.select(
        F.concat(
            F.lit("https://host"), F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
            F.lit(".example/p/"), F.pmod(F.col("doc_id"), F.lit(137)).cast("string"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(epoch) + F.col("doc_id")).alias("warc_ts"),
        F.col("doc_id"),
        F.col("text"),
    )
    latest = latest_snapshot(pages).select(
        "url",
        F.col("doc_id").alias("latest_doc_id"),
        F.unix_timestamp("warc_ts").cast("bigint").alias("last_ts"),
        "n_versions",
        "text",
    )
    stats = snapshot_stats(pages).select("url", "n_content_versions", "change_rate")
    return latest.join(stats, "url")


def q38_pii_scrub(spark, sf_dir):
    """PII scrub (functions/pii.py): plant one deterministic PII category
    per doc (doc_id mod 3 selects email / ipv4 / phone), then count +
    redact with the shared Java/RE2-safe patterns. Output carries
    md5(redacted) so the oracle verifies the redacted TEXT, not just the
    counts. Single projection over one scan — no shuffle, no Python."""
    from raven_spark.functions.pii import scrub_pii

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    planted = (
        F.when(F.pmod(i, 3) == 0,
               F.concat(F.col("text"), F.lit(" contact user"), i.cast("string"),
                        F.lit("@mail.example now")))
        .when(F.pmod(i, 3) == 1,
              F.concat(F.col("text"), F.lit(" host 10."),
                       F.pmod(i, 256).cast("string"), F.lit(".0.7 up")))
        .otherwise(F.concat(F.col("text"), F.lit(" call +1 555-"),
                            F.lpad(F.pmod(i, 10000).cast("string"), 4, "0")))
    )
    src = d.select(i.alias("doc_id"), planted.alias("text"))
    return scrub_pii(src).select(
        "id", "n_emails", "n_ips", "n_phones", "has_pii",
        F.md5("redacted").alias("redacted_md5"),
        F.length("redacted").cast("bigint").alias("redacted_len"),
    )


def q39_url_seen_cuckoo(spark, sf_dir):
    """URL-seen subtraction through the SHARDED CUCKOO filter with a TTL
    invalidation in the middle — the delete path a Bloom cannot express
    (north_star "Bloom/cuckoo"). seen = ids≡0 (mod 3); ids≡0 (mod 15)
    then expire (delete from the filter AND the exact table), so the
    refetchable set is exactly {id % 3 != 0} ∪ {id % 15 == 0}. Exact
    despite the probabilistic filter: the cuckoo only PRUNES; survivors
    hit the anti-join against the post-expiry seen table."""
    from raven_spark.operators.seen import (
        ShardedCuckoo,
        build_cuckoo_shards,
        delete_from_cuckoo_shards,
        subtract_seen,
    )

    e = _t(spark, sf_dir, "events")
    cand = e.select(
        F.col("event_id").alias("url_hash"),
        F.col("event_id").cast("string").alias("url_canon"),
    )
    seen = cand.filter(F.pmod(F.col("url_hash"), F.lit(3)) == 0)
    shards = build_cuckoo_shards(
        seen, "url_hash", n_shards=8, expected_n=max(seen.count(), 16)
    )
    expired = seen.filter(F.pmod(F.col("url_hash"), F.lit(15)) == 0)
    # the shard table is O(n_shards) rows: checkpoint it so the build +
    # delete lineage runs once, not once per subtract branch
    updated = ShardedCuckoo(
        delete_from_cuckoo_shards(shards, expired, 8).localCheckpoint(eager=False), 8
    )
    remaining = seen.join(expired.select("url_hash"), "url_hash", "left_anti")
    return subtract_seen(
        cand, remaining, bloom=updated, materialize=True
    ).select("url_hash")


def q40_asof_join(spark, sf_dir):
    """Backward as-of join (operators/asof.py): attach to every non-error
    event the user's latest at-or-before 'error' snapshot (snapshots are
    deduped to one row per (user_id, ts) so the match is tie-free in both
    engines). One union + one hash-partition by user_id + one in-partition
    sort — no pair explosion; oracle replays with DuckDB's native ASOF
    LEFT JOIN."""
    from raven_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    snaps = (
        e.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("snap_id"), F.max("value").alias("snap_value"))
    )
    lhs = e.filter(F.col("event_type") != "error").select("event_id", "user_id", "ts")
    return asof_join(lhs, snaps, on="user_id").select(
        "event_id", "snap_id", "snap_value"
    )


def q41_stratified_sample(spark, sf_dir):
    """Corpus sampling (operators/sampling.py): a zero-shuffle 30%
    deterministic Bernoulli sample composed with a 25-per-(source, lang)
    stratified cap. The driver path uses the SQL-replayable Knuth coin
    (pipeline.split_col convention); production uses the default xxhash64
    coin — identical algebra, stronger mixing (test_sampling.py covers
    both). The sample filter is pure column algebra in the scan stage;
    only the cap shuffles (one exchange keyed on the stratum)."""
    from raven_spark.operators.sampling import hash_sample, knuth_coin, stratified_cap

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    s = hash_sample(d, "doc_id", 0.30, coin=knuth_coin("doc_id"))
    return stratified_cap(
        s, ["source", "lang"], 25, "doc_id", coin=knuth_coin("doc_id")
    ).select("doc_id", "source", "lang")


def q42_host_reputation(spark, sf_dir):
    """Host reputation (operators/reputation.py): per-host corpus feedback
    (dup rate via 8-byte content hashes, dominant language with a
    deterministic tie-break, mean quality) blended into a crawl-priority
    score. Two map-side-partial aggregates joined on host; output is
    O(hosts). Quality proxy here is least(n_chars/1000, 1); production
    passes functions.text.quality_score."""
    from raven_spark.operators.reputation import host_reputation

    d = _t(spark, sf_dir, "documents").select(
        F.col("source").alias("host"), "text", "lang",
        F.least(F.col("n_chars") / F.lit(1000.0), F.lit(1.0)).alias("q"),
    )
    return host_reputation(d, quality_col="q")


def q43_sitemap_ingest(spark, sf_dir):
    """Sitemap ingestion (operators/sitemaps.py): deterministic sitemap
    XML synthesized per document (doc_id%5==0 -> a sitemapindex of two
    child sitemaps, else a urlset of two page URLs, one with an escaped
    &amp; and stray whitespace) -> loc extraction + kind classification +
    entity unescape, all column algebra. Oracle replays the construction
    and the identical regex in DuckDB."""
    from raven_spark.operators.sitemaps import sitemap_locs

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    h = F.concat(F.lit("https://h"), F.pmod(i, 7).cast("string"), F.lit(".example"))
    s = lambda c: c.cast("string")  # noqa: E731
    index_body = F.concat(
        F.lit("<sitemapindex><sitemap><loc>"), h, F.lit("/sm/"), s(i),
        F.lit("-1.xml</loc></sitemap><sitemap><loc> "), h, F.lit("/sm/"), s(i),
        F.lit("-2.xml </loc></sitemap></sitemapindex>"),
    )
    urlset_body = F.concat(
        F.lit("<urlset><url><loc>"), h, F.lit("/p/"), s(F.pmod(i, 211)),
        F.lit("?a=1&amp;b=2</loc></url><url><loc>"), h, F.lit("/p/"),
        s(F.pmod(i, 499)), F.lit("</loc></url></urlset>"),
    )
    sm = d.select(
        F.concat(h, F.lit("/sitemap-"), s(i), F.lit(".xml")).alias("url"),
        F.when(F.pmod(i, 5) == 0, index_body).otherwise(urlset_body).alias("body"),
    )
    return sitemap_locs(sm)


def q44_unicode_norm(spark, sf_dir):
    """Unicode dedup identity (functions/unicode_norm.py): per doc_id%3
    plant a composed É, a decomposed E+U+0301, or plain ASCII, then
    NFC-normalize + lower/trim/collapse. The two accented spellings must
    hash identically (the oracle replays with DuckDB nfc_normalize).
    Arrow-batched UDF with an ASCII fast path — the only Python in the
    plan, scan -> project, zero shuffles."""
    from raven_spark.functions.unicode_norm import unicode_norm_col

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    suffix = (
        F.when(F.pmod(i, 3) == 0, F.lit(" CAFÉ fin"))
        .when(F.pmod(i, 3) == 1, F.lit(" CAFÉ fin"))
        .otherwise(F.lit(" cafe fin"))
    )
    n = unicode_norm_col(F.concat(F.col("text"), suffix))
    return d.select(
        "doc_id",
        F.md5(n).alias("norm_md5"),
        F.length(n).cast("bigint").alias("norm_len"),
    )


def q45_surt_keys(spark, sf_dir):
    """SURT index keys (functions/urls.surt_col): deterministic URLs
    (some www-prefixed, some with already-sorted query strings) through
    canonicalize -> SURT. Pure column algebra after the canonicalization
    UDF; the oracle replays label reversal with DuckDB list_reverse.
    The point at 10^10 URLs: SURT order makes per-domain queries RANGE
    predicates over a sorted CDX-style index (PLANS.md)."""
    from raven_spark.functions.urls import canonicalize_udf, surt_col

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    url = F.concat(
        F.lit("https://"),
        F.when(F.pmod(i, 4) == 0, F.lit("www.")).otherwise(
            F.concat(F.lit("s"), s(F.pmod(i, 13)), F.lit("."))
        ),
        F.lit("h"), s(F.pmod(i, 7)), F.lit(".example/p/"), s(F.pmod(i, 211)),
        F.when(F.pmod(i, 3) == 0, F.lit("?a=1&b=2")).otherwise(F.lit("")),
    )
    return d.select("doc_id", surt_col(canonicalize_udf(url)).alias("surt"))


def q46_pack_chunks(spark, sf_dir):
    """Sequence packing (operators/pipeline.pack_chunks): whitespace
    token counts -> deterministic concat-and-chunk placement into 512-
    token context windows inside 8 Knuth-keyed buckets (the SQL-
    replayable coin, q41 convention; production uses xxhash64). One
    bucket-keyed shuffle + in-partition running sum — no global sort."""
    from raven_spark.operators.pipeline import pack_chunks
    from raven_spark.operators.sampling import knuth_coin

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .cast("bigint").alias("n_tokens"),
    )
    return pack_chunks(
        d, ctx_len=512,
        bucket_col=F.pmod(knuth_coin("doc_id"), F.lit(8)).cast("int"),
        order_col=knuth_coin("doc_id"),
    )


def q47_dedup_within_doc(spark, sf_dir):
    """Intra-document repetition removal (pipeline_filters.dedup_within_doc):
    plant a copy of each doc's first 8 words at the end (doc_id%2==0), so
    the pass must drop exactly the repeated window and keep the rest in
    order. Zero-shuffle per-row array algebra (no explode+window); oracle
    replays first-occurrence keep with a DuckDB row_number."""
    from raven_spark.operators.pipeline_filters import dedup_within_doc

    d = _t(spark, sf_dir, "documents")
    words8 = F.array_join(
        F.slice(F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "),
                1, 8), " ",
    )
    planted = F.when(
        F.pmod(F.col("doc_id"), 2) == 0, F.concat(F.col("text"), F.lit(" "), words8)
    ).otherwise(F.col("text"))
    src = d.select("doc_id", planted.alias("text"))
    return dedup_within_doc(src).select(
        "doc_id",
        F.md5("text_dedup").alias("dedup_md5"),
        F.length("text_dedup").cast("bigint").alias("dedup_len"),
        "dropped_units",
    )


def q48_unigram_logprob(spark, sf_dir):
    """Corpus-relative fluency (pipeline_filters.unigram_logprob): mean unigram
    log-probability per doc under the corpus's own word distribution —
    the SQL-able analogue of CCNet's perplexity filter. Word keys are
    8-byte hashes engine-side; the oracle joins on the word strings
    (same collision class as exact_dedup's accepted hash variant)."""
    from raven_spark.operators.pipeline_filters import unigram_logprob

    return unigram_logprob(_t(spark, sf_dir, "documents").select("doc_id", "text"))


def q49_corpus_stats(spark, sf_dir):
    """Per-source corpus profile (pipeline_lexical.corpus_stats): doc counts,
    mean length, exact interpolated p50/p90/p99 whitespace-token counts.
    Spark percentile() and DuckDB quantile_cont share linear-interpolation
    semantics (verified element-wise)."""
    from raven_spark.operators.pipeline_lexical import corpus_stats

    return corpus_stats(_t(spark, sf_dir, "documents"))


def q50_trap_scores(spark, sf_dir):
    """Crawler-trap scoring (urls.trap_score_col): deterministic URLs
    planted with the four trap signals (repeated segments, session-id
    params, 8+ digit runs, deep paths) and a clean control; the oracle
    replays the identical scoring algebra. Pure column algebra, one
    projection, zero shuffles."""
    from raven_spark.functions.urls import trap_score_col

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    suffix = (
        F.when(F.pmod(i, 5) == 0, F.lit("/x/x/x"))
        .when(F.pmod(i, 5) == 1, F.concat(F.lit("/p?phpsessid="), s(i)))
        .when(F.pmod(i, 5) == 2, F.concat(F.lit("/p/"), s(i + 100000000)))
        .when(F.pmod(i, 5) == 3, F.lit("/a/b/c/d/e/f/g/h/i"))
        .otherwise(F.concat(F.lit("/article/"), s(F.pmod(i, 97))))
    )
    url = F.concat(F.lit("https://h"), s(F.pmod(i, 7)), F.lit(".example"), suffix)
    return d.select(
        "doc_id", url.alias("url"), trap_score_col(url).alias("trap_score")
    )


def q51_quality_classifier(spark, sf_dir):
    """fastText-style hashed linear quality model (CCNet §2.2's learned
    filter analogue, quality_model.classifier_score): unigram+bigram
    features hashed by the SQL-replayable poly-31/Knuth bucket function,
    scored by the deterministic synthetic weight model, sigmoid'd. Pure
    per-row column algebra — zero shuffles, zero joins (the learned-
    weights variant broadcast-joins a (bucket, weight) table instead;
    plan-asserted in tests)."""
    from raven_spark.operators.quality_model import classifier_score

    d = _t(spark, sf_dir, "documents")
    return classifier_score(d, n_buckets=1 << 14, bias=0.0)


def q52_warc_roundtrip(spark, sf_dir):
    """WARC/1.0 container round trip entirely in-plan (sources/warc.py):
    documents → HTTP response records (deterministic UUIDv5 ids, one
    gzip member per record, the Common Crawl layout) → xxhash64-bucketed
    file assembly → streaming member-at-a-time parse → HTTP decode →
    the original rows. The oracle is the identity transform on
    documents, so hash-green == the container codec is byte-faithful:
    any framing/compression/header defect breaks value equality. Scale
    shape: ONE 8-byte-keyed shuffle into n_files buckets (the export's
    real layout job; bucket == output file == task), parse memory
    O(largest record), never the decompressed file."""
    import pandas as pd

    from raven_spark.sources.warc import (
        assemble_warc_files,
        iter_warc_records,
        parse_http_response,
    )

    d = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    pages = d.select(
        F.concat(F.lit("https://docs.example/"), F.col("doc_id")).alias("url"),
        F.to_timestamp(F.lit("2026-01-02 03:04:05")).alias("warc_ts"),
        F.encode(F.col("text"), "utf-8").alias("html"),
    )
    files = assemble_warc_files(pages, n_files=8)

    def scan(pdfs):
        for pdf in pdfs:
            rows = []
            for content in pdf["content"]:
                for rec in iter_warc_records(bytes(content)):
                    _st, _hh, body = parse_http_response(rec["block"])
                    rows.append((
                        rec["headers"]["warc-target-uri"],
                        len(body),
                        body.decode("utf-8"),
                    ))
            yield pd.DataFrame(rows, columns=["url", "n_bytes", "text"])

    back = files.select("content").mapInPandas(
        scan, "url string, n_bytes long, text string"
    )
    return back.select(
        F.regexp_extract("url", r"/(\d+)$", 1).cast("long").alias("doc_id"),
        "url",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "text",
    )


def q53_cdx_random_access(spark, sf_dir):
    """CDX index + random-access fetch (sources/cdx.py): documents →
    WARC file blobs (q52's deterministic export, but with q45-style
    varied hosts so SURT keying is exercised) → one-pass CDX build
    (per-gzip-member offsets, SHA-1/B32 digests, SURT keys) → every
    record re-read FROM ITS (offset, length) SLICE ALONE in a different
    task (the ranges cross a real shuffle — the Range-GET contract a
    10^5-file archive reader depends on). Output columns are all
    recomputed from the FETCHED payload (sha2/decode JVM-side), so
    hash-green means the index's byte arithmetic is exact: any
    off-by-one shifts a slice, breaks the gzip member, and changes the
    hash. The oracle replays URL construction + SURT (q45's list_reverse
    replay) + sha256/octet_length over the source text."""
    from raven_spark.sources.cdx import cdx_index, random_access_fetch
    from raven_spark.sources.warc import assemble_warc_files

    d = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    url = F.concat(
        F.lit("https://"),
        F.when(F.pmod(i, 4) == 0, F.lit("www.")).otherwise(
            F.concat(F.lit("s"), s(F.pmod(i, 13)), F.lit("."))
        ),
        F.lit("h"), s(F.pmod(i, 7)), F.lit(".example/p/"), s(i),
        F.when(F.pmod(i, 3) == 0, F.lit("?a=1&b=2")).otherwise(F.lit("")),
    )
    pages = d.select(
        url.alias("url"),
        F.to_timestamp(F.lit("2026-01-02 03:04:05")).alias("warc_ts"),
        F.encode(F.col("text"), "utf-8").alias("html"),
    )
    files = assemble_warc_files(pages, n_files=8).withColumnRenamed(
        "file_name", "path"
    )
    idx = cdx_index(files, file_col="path", content_col="content")
    fetched = random_access_fetch(files, idx, file_col="path")
    j = idx.select("warc_file", "offset", "surt", "mime").join(
        fetched, ["warc_file", "offset"]
    )
    return j.select(
        F.regexp_extract("url", r"/p/(\d+)", 1).cast("long").alias("doc_id"),
        "url",
        "surt",
        "mime",
        F.col("http_status").cast("int").alias("http_status"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha256"),
        F.decode(F.col("payload"), "utf-8").alias("text"),
    )


def q54_warc_revisit(spark, sf_dir):
    """Payload-digest dedup over a real WARC corpus (cdx.py::
    revisit_resolve — the ISO 28500 revisit convention CC's dedup
    emits): documents → 3 mirror captures each (m0/m1/m2 hosts, one
    shared timestamp, payload = the doc text) → WARC export → CDX index
    → resolve. Mirrors carrying the same payload collapse onto ONE
    canonical capture (min (warc_date, url) — equal dates here, so min
    url; the temporal pick is pytest-covered); every other capture is a
    revisit referencing it. Digest groups span doc_ids when texts
    collide, so the oracle's GROUP BY text replays group structure,
    sizes, and canonical references exactly — through the real WARC
    bytes and SHA-1 digests, which the oracle never sees (digest
    equality ≡ payload equality is the property under test). Scale
    shape: ONE aggregate-window exchange over 20-byte digests; payload
    bytes never shuffle (see revisit_resolve docstring)."""
    from raven_spark.sources.cdx import cdx_index, revisit_resolve
    from raven_spark.sources.warc import assemble_warc_files

    d = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    i = F.col("doc_id")
    cap = F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("capture")
    caps = d.select("doc_id", "text", cap)
    pages = caps.select(
        F.concat(
            F.lit("https://m"), F.col("capture").cast("string"),
            F.lit(".h"), (i % 7).cast("string"),
            F.lit(".example/p/"), i.cast("string"),
        ).alias("url"),
        F.to_timestamp(F.lit("2026-01-02 03:04:05")).alias("warc_ts"),
        F.encode(F.col("text"), "utf-8").alias("html"),
    )
    files = assemble_warc_files(pages, n_files=8).withColumnRenamed(
        "file_name", "path"
    )
    res = revisit_resolve(cdx_index(files))
    return res.select(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long").alias("doc_id"),
        F.regexp_extract("url", r"//m(\d)\.", 1).cast("int").alias("capture"),
        "url",
        F.col("n_captures").cast("long").alias("n_captures"),
        "is_revisit",
        "canon_url",
    )


def q55_gopher_rules(spark, sf_dir):
    """The published Gopher rule filter (Rae et al. 2021 A1.1,
    functions/text.py::gopher_rules_cols) — hard pass/fail flags beside
    q12's soft score and q51's learned score: word-count bounds, mean
    word length, symbol ratio, bullet/ellipsis line fractions,
    alpha-word fraction, required-word hits. Pure zero-shuffle column
    algebra fused into the scan (plan: single WholeStageCodegen over
    the parquet scan, no exchanges)."""
    from raven_spark.functions.text import gopher_rules_cols

    d = _t(spark, sf_dir, "documents")
    cols = gopher_rules_cols(F.col("text"))
    return d.select("doc_id", *[c.alias(k) for k, c in cols.items()])


def q56_warc_dedup_roundtrip(spark, sf_dir):
    """Deduplicating WARC export + revisit reconstruction round trip
    (warc.py::assemble_warc_files_deduped / reconstruct_from_revisits):
    documents → 40 shared-payload groups → deduped export (each
    payload's bytes stored ONCE; other captures are ISO 28500 revisit
    stubs) → record scan → window-based payload restoration. The oracle
    is the identity corpus plus min-url group structure, so hash-green
    means (a) the dedup decision is exactly one canonical per payload,
    (b) revisit stubs name their original correctly, and (c) restored
    payload bytes are byte-faithful — through the real container codec.
    Scale shape: payload bytes cross the dedup window + assembly
    exchanges on write and one restoration window on read; revisit rows
    never carry payloads (a k-deep recrawl writes ~1/k the bytes)."""
    from raven_spark.sources.warc import (
        READ_SCHEMA,
        _record_scan,
        assemble_warc_files_deduped,
        reconstruct_from_revisits,
    )

    d = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    i = F.col("doc_id")
    pages = d.select(
        F.concat(
            F.lit("https://w.h"), (i % 7).cast("string"),
            F.lit(".example/p/"), i.cast("string"),
        ).alias("url"),
        F.to_timestamp(F.lit("2026-01-02 03:04:05")).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><body>doc payload "),
                (i % 40).cast("string"),
                F.lit("</body></html>"),
            ),
            "utf-8",
        ).alias("html"),
    )
    files = assemble_warc_files_deduped(pages, n_files=8)
    tz = spark.conf.get("spark.sql.session.timeZone")
    records = files.select(
        F.col("file_name").alias("path"), "content"
    ).mapInPandas(_record_scan(("response", "revisit"), tz), READ_SCHEMA)
    restored = reconstruct_from_revisits(records)
    return restored.select(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long").alias("doc_id"),
        "url",
        "was_revisit",
        "refers_to_uri",
        "refers_to_date",
        F.octet_length("html").cast("long").alias("n_bytes"),
        F.decode(F.col("html"), "utf-8").alias("text"),
    )


def q57_wet_roundtrip(spark, sf_dir):
    """WET container round trip (warc.py::assemble_wet_files / the
    conversion-record codec): documents → extracted-text conversion
    records (the text-only sibling CC publishes beside every WARC; most
    corpus pipelines read WET at ~1/10 the bytes) → member-at-a-time
    scan → UTF-8 decode → the original text. Identity oracle, so
    hash-green == the WET codec is byte-faithful including non-ASCII.
    Scale shape: one 8-byte-keyed assembly exchange, text crosses Arrow
    once (same class as q52)."""
    from raven_spark.sources.warc import READ_SCHEMA, _record_scan, assemble_wet_files

    d = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    pages = d.select(
        F.concat(F.lit("https://docs.example/"), F.col("doc_id")).alias("url"),
        F.to_timestamp(F.lit("2026-01-02 03:04:05")).alias("warc_ts"),
        "text",
    )
    files = assemble_wet_files(pages, n_files=8)
    tz = spark.conf.get("spark.sql.session.timeZone")
    records = files.select(
        F.col("file_name").alias("path"), "content"
    ).mapInPandas(_record_scan(("conversion",), tz), READ_SCHEMA)
    return records.select(
        F.regexp_extract("url", r"/(\d+)$", 1).cast("long").alias("doc_id"),
        "url",
        F.octet_length("html").cast("long").alias("n_bytes"),
        F.decode(F.col("html"), "utf-8").alias("text"),
    )


def q58_wat_links(spark, sf_dir):
    """WAT container round trip feeding the link graph (warc.py::
    assemble_wat_files / read_wat's envelope parse): documents → q36's
    deterministic outlink formula as an array column → metadata records
    with CC-style JSON envelopes → member scan + JVM from_json →
    exploded (src, dst) edges. Hash-green == the WAT codec preserves
    link lists exactly (order included) — the contract that lets
    PageRank/host-reputation run off WAT without ever reading payload
    bytes. Scale shape: one 8-byte assembly exchange; the envelope
    parse is codegen'd from_json, Python only frames records."""
    from raven_spark.sources.warc import (
        READ_SCHEMA,
        _WAT_ENVELOPE_SCHEMA,
        _record_scan,
        assemble_wat_files,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    links = F.filter(
        F.transform(
            F.array(F.lit(1), F.lit(2), F.lit(3)),
            lambda j: F.pmod(F.col("doc_id") * 37 + j * 1009, F.lit(n)),
        ),
        lambda dst: dst != F.col("doc_id"),
    )
    pages = d.select(
        F.concat(F.lit("https://d.example/p/"), F.col("doc_id")).alias("url"),
        F.to_timestamp(F.lit("2026-01-02 03:04:05")).alias("warc_ts"),
        F.transform(
            links,
            lambda dst: F.concat(F.lit("https://d.example/p/"), dst),
        ).alias("links"),
    )
    files = assemble_wat_files(pages, n_files=8)
    tz = spark.conf.get("spark.sql.session.timeZone")
    records = files.select(
        F.col("file_name").alias("path"), "content"
    ).mapInPandas(_record_scan(("metadata",), tz), READ_SCHEMA)
    env = F.from_json(
        F.decode(F.col("html"), "utf-8"), _WAT_ENVELOPE_SCHEMA
    )["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"]
    out = records.select(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long").alias("src"),
        F.explode(
            F.transform(env["HTML-Metadata"]["Links"], lambda x: x["url"])
        ).alias("dst_url"),
    )
    return out.select(
        "src",
        F.regexp_extract("dst_url", r"/p/(\d+)$", 1).cast("long").alias("dst"),
    )


def q59_ccnet_buckets(spark, sf_dir):
    """CCNet head/middle/tail corpus split (Wenzek et al. 2020 §4.4;
    operators/pipeline_filters.py::ccnet_buckets over unigram_logprob's score):
    per-language 1/3 and 2/3 score cutoffs by exact interpolated
    percentile AGGREGATE (never an ntile sort of a whole language —
    the dominant language IS the corpus), broadcast back, bucket
    assignment as a codegen'd comparison. Null-scored docs (empty
    text) bucket to null. The oracle replays the unigram distribution
    (q48's replay) + quantile_cont cutoffs + the same comparisons."""
    from raven_spark.operators.pipeline_filters import ccnet_buckets, unigram_logprob

    d = _t(spark, sf_dir, "documents")
    scored = unigram_logprob(d).join(d.select("doc_id", "lang"), "doc_id")
    out = ccnet_buckets(scored, score_col="avg_logprob", group_col="lang")
    return out.select("doc_id", "lang", "avg_logprob", "ppl_bucket")


def q60_mixture_sample(spark, sf_dir):
    """Training-mixture resampling (operators/sampling.py::
    mixture_sample): thin each language so the kept corpus follows the
    target weights en/zh/es/fr = .25/.30/.20/.25 at the largest
    no-upsampling total T = min(n_g/w_g); 'de' is unweighted and drops
    entirely. Membership is the Knuth coin (SQL-replayable) against
    integer thresholds derived ON the O(groups) count aggregate; the
    corpus itself never shuffles (broadcast joins + codegen filter)."""
    from raven_spark.operators.sampling import knuth_coin, mixture_sample

    d = _t(spark, sf_dir, "documents")
    out = mixture_sample(
        d,
        "lang",
        {"en": 0.25, "zh": 0.30, "es": 0.20, "fr": 0.25},
        key_cols="doc_id",
        coin=knuth_coin("doc_id"),
    )
    return out.select("doc_id", "lang", "kept")


def q61_recrawl_schedule(spark, sf_dir):
    """Adaptive recrawl scheduling (operators/snapshots.py::
    recrawl_schedule — Cho & Garcia-Molina's Poisson-change estimator
    over snapshot_stats' churn profile): multi-capture pages are
    synthesized with three churn behaviors (url_id%3: static /
    every-capture / every-other-capture content), then each URL gets
    lambda = -ln(1 - X/n)/I and a clamped 1/lambda revisit interval —
    static URLs schedule at max, churny ones near min. Pure column
    algebra over one per-URL aggregate; the oracle replays the
    construction, the estimator, and the clamps."""
    from raven_spark.operators.snapshots import recrawl_schedule, snapshot_stats

    d = _t(spark, sf_dir, "documents")
    epoch = 1767225600  # 2026-01-01T00:00:00Z
    i = F.col("doc_id")
    url_id = F.pmod(i, F.lit(100))
    k = F.floor(i / F.lit(100))
    version = (
        F.when(F.pmod(url_id, F.lit(3)) == 0, F.lit(0))
        .when(F.pmod(url_id, F.lit(3)) == 1, k)
        .otherwise(F.floor(k / F.lit(2)))
    )
    pages = d.select(
        F.concat(F.lit("https://r.example/p/"), url_id.cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(epoch) + i).alias("warc_ts"),
        F.concat(F.lit("content v"), version.cast("string")).alias("text"),
    )
    out = recrawl_schedule(
        snapshot_stats(pages), min_interval_s=10,
        max_interval_s=30 * 86400, default_interval_s=7 * 86400,
    )
    return out.select(
        "url",
        "n_versions",
        "n_content_versions",
        "change_rate",
        "interval_s",
        F.unix_timestamp("next_fetch_ts").cast("bigint").alias("next_fetch_epoch"),
    )


def _c4_line_text(d: DataFrame) -> DataFrame:
    """Synthesize line-structured pages from the flat word soup,
    deterministically and SQL-replayably: ' slow ' becomes a terminal
    '.'+newline, ' fast ' a bare newline (non-terminal line ends),
    ' big ' a '!'+newline; doc_id residues inject the C4 tripwires
    (lorem ipsum, a braced code line, a javascript line, a badword
    line). Literal (non-regex) replace — left-to-right non-overlapping
    in both engines."""
    built = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit(" slow "), F.lit(".\n")),
            F.lit(" fast "),
            F.lit("\n"),
        ),
        F.lit(" big "),
        F.lit("!\n"),
    )
    built = F.concat(
        built,
        F.when(F.col("doc_id") % 7 == 0, F.lit("\nLorem ipsum dolor sit amet."))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit("\nif (x) { enable(); }"))
        .otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit("\nPlease enable javascript to continue today."),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 13 == 0,
            F.lit("\nThis page badword appears right here."),
        ).otherwise(F.lit("")),
    )
    return d.select("doc_id", built.alias("text"))


def q62_c4_filters(spark, sf_dir):
    """C4 cleaning pass (Raffel et al. 2020 §2.2; operators/pipeline.py::
    c4_filters): line-level terminal-punctuation / min-words / javascript
    / policy-phrase filters and page-level sentence-count / lorem-ipsum /
    curly-brace / badword gates, all as codegen'd higher-order column
    algebra — zero shuffles, zero UDFs. Pages are synthesized from the
    word soup by _c4_line_text (replayed verbatim in the oracle); the
    oracle replays every predicate with DuckDB list lambdas."""
    from raven_spark.operators.pipeline_filters import c4_filters

    pages = _c4_line_text(_t(spark, sf_dir, "documents"))
    out = c4_filters(pages, badwords=("badword",))
    return out.select(
        "doc_id",
        "clean_text",
        "n_lines",
        "n_lines_kept",
        "n_sentences",
        "has_lorem_ipsum",
        "has_brace",
        "has_badword",
        "c4_keep",
    )


def q63_line_dedup(spark, sf_dir):
    """Corpus-global duplicated-unit removal (CCNet §2.1 paragraph dedup
    over the whole dump; operators/pipeline_filters.py::line_dedup_corpus):
    3-word windows stand in for lines over the flat soup (40-word
    vocabulary -> real cross-doc collisions); any unit present in >= 2
    distinct docs is dropped from every doc, docs reassembled in order.
    Unit text never shuffles — only (id, pos, xxhash64) triples; the
    oracle counts by unit-text equality (hash-collision-free at sf)."""
    from raven_spark.operators.pipeline_filters import line_dedup_corpus

    d = _t(spark, sf_dir, "documents")
    out = line_dedup_corpus(d, min_docs=2, window_words=3)
    return out.select("doc_id", "clean_text", "n_units", "n_dup_units")


def q64_url_filter(spark, sf_dir):
    """Crawl-side URL filtering (FineWeb/RefinedWeb §3.1; UT1-style
    domain categories; functions/urls.py::url_filter): subdomain-
    inclusive domain-blocklist match via the host dot-suffix array +
    URL badword token scan, zero shuffles on the literal-blocklist path
    (the list ships as a plan literal; the distributed-blocklist path
    is pytest-covered). Hosts/paths synthesized from doc_id residues so
    every branch (exact block, subdomain block, token-boundary miss,
    badword hit, clean) is exercised; the oracle replays the suffix
    semantics as host = d OR host LIKE '%.d'."""
    from raven_spark.functions.urls import url_filter

    d = _t(spark, sf_dir, "documents")
    host = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("ads.tracker.example"))
        .when(F.col("doc_id") % 5 == 1, F.lit("sub.shop.example"))
        .when(F.col("doc_id") % 5 == 2, F.lit("www.news.example"))
        .when(F.col("doc_id") % 5 == 3, F.lit("tracker.example"))
        .otherwise(F.lit("cdn.media.example"))
    )
    path = F.when(
        F.col("doc_id") % 9 == 0, F.lit("/download/badword/file")
    ).otherwise(F.concat(F.lit("/p/"), F.col("doc_id").cast("string")))
    urls = d.select(
        "doc_id", F.concat(F.lit("https://"), host, path).alias("url_canon")
    )
    out = url_filter(
        urls,
        blocked_domains=("tracker.example", "media.example"),
        badwords=("badword",),
    )
    return out.select(
        "doc_id", "url_canon", "blocked_domain", "url_badword", "url_allowed"
    )


def q65_dup_spans(spark, sf_dir):
    """Exact-substring span dedup (Lee et al. 2022 ExactSubstr;
    operators/dedup.py::dup_span_dedup): 5-token windows counted corpus-
    globally; every occurrence of a duplicated window except the
    lexicographically-first (doc_id, start) is removed and docs are
    reassembled from surviving tokens. The 40-word soup vocabulary
    yields real cross-doc 5-gram collisions at sf. Token text never
    shuffles — (id, pos, xxhash64) triples only; the canonical pick is
    a min(struct) AGGREGATE (no row_number over a hot hash). The oracle
    replays windows by gram-text equality + the same min-(id,start)
    exclusion."""
    from raven_spark.operators.dedup import dup_span_dedup

    d = _t(spark, sf_dir, "documents")
    out = dup_span_dedup(d, span_words=5, keep_first=True)
    return out.select(
        "doc_id", "clean_text", "n_tokens", "n_dup_starts", "n_covered",
        "dup_token_frac",
    )


def q66_sitemap_entries(spark, sf_dir):
    """Full sitemap entry parse (sitemaps.org; operators/sitemaps.py::
    sitemap_entries + changefreq_interval_col): per-<url> lastmod /
    changefreq / priority with the declared-changefreq revisit hint —
    the host-declared prior that blends with q61's observed-churn
    estimator via least(). Bodies synthesized from doc_id residues
    (valid lastmod dates, 4 changefreq values + absent, entity-escaped
    loc); pure column algebra, zero shuffles; the oracle replays the
    same block/tag regexes and the changefreq map."""
    from raven_spark.operators.sitemaps import (
        changefreq_interval_col,
        sitemap_entries,
    )

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    sm = F.concat(F.lit("https://s"), F.pmod(i, F.lit(20)).cast("string"),
                  F.lit(".example/sitemap.xml"))
    cf = (
        F.when(F.pmod(i, F.lit(5)) == 0, F.lit("daily"))
        .when(F.pmod(i, F.lit(5)) == 1, F.lit("weekly"))
        .when(F.pmod(i, F.lit(5)) == 2, F.lit("monthly"))
        .when(F.pmod(i, F.lit(5)) == 3, F.lit("never"))
        .otherwise(F.lit(""))
    )
    body = F.concat(
        F.lit("<urlset><url><loc>https://s"),
        F.pmod(i, F.lit(20)).cast("string"),
        F.lit(".example/p/"), i.cast("string"), F.lit("</loc><lastmod>2026-"),
        F.lpad((F.pmod(i, F.lit(9)) + 1).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad((F.pmod(i, F.lit(28)) + 1).cast("string"), 2, "0"),
        F.lit("</lastmod>"),
        F.when(cf == "", F.lit("")).otherwise(
            F.concat(F.lit("<changefreq>"), cf, F.lit("</changefreq>"))
        ),
        F.lit("<priority>0."), F.pmod(i, F.lit(10)).cast("string"),
        F.lit("</priority></url><url><loc>https://s"),
        F.pmod(i, F.lit(20)).cast("string"),
        F.lit(".example/q/"), i.cast("string"),
        F.lit("&amp;x</loc></url></urlset>"),
    )
    sitemaps = d.select(sm.alias("url"), body.alias("body"))
    out = sitemap_entries(sitemaps).withColumn(
        "hint_s", changefreq_interval_col(F.col("changefreq"))
    )
    return out.select(
        "sitemap_url", "loc", "lastmod", "lastmod_date", "changefreq",
        "priority", "hint_s",
    )


def q67_tfidf_topk(spark, sf_dir):
    """Top-k TF-IDF keyword extraction (operators/pipeline.py::
    tfidf_topk): per-doc term counts (map-side combinable), distinct-
    pair document frequencies, idf = ln(N) - ln(df) (decomposed the
    same way in the oracle so the float ops match bit-for-bit), per-doc
    top-3 via a literal-bound row_number (WindowGroupLimit prunes
    map-side). Ties break on term asc."""
    from raven_spark.operators.pipeline_lexical import tfidf_topk

    d = _t(spark, sf_dir, "documents")
    return tfidf_topk(d, k=3)


def q68_bigram_logprob(spark, sf_dir):
    """Interpolated-bigram fluency (operators/pipeline.py::
    bigram_logprob — Jelinek-Mercer smoothing over the corpus's own
    counts; one order closer to CCNet's KenLM than q48): two hash-
    keyed count aggregates + three 8-byte joins per position, word
    text never shuffles. The oracle replays the identical expression
    shape (left-assoc (lam*c2)/c1 + ((1-lam)*c1)/T, lam written as
    1.0-0.9 so the float literal matches) with avg+round(6) absorbing
    summation-order noise, the q48 precedent."""
    from raven_spark.operators.pipeline_lexical import bigram_logprob

    d = _t(spark, sf_dir, "documents")
    return bigram_logprob(d, lam=0.9).select(
        "doc_id", "n_bigrams", "avg_logprob2"
    )


def q69_anchor_profile(spark, sf_dir):
    """Anchor-text extraction + per-target term profile (operators/
    graph.py::anchor_texts/anchor_profile — the focused-crawl priority
    signal: anchor text is the linking page's description of the
    TARGET): <a> elements and their inner text extracted as pure
    column regex algebra (both quote styles, tags stripped, whitespace
    collapsed), then per-href top-2 terms with anchor/source counts.
    HTML synthesized from doc_id residues; the oracle replays the
    identical regexes and aggregation in DuckDB."""
    from raven_spark.operators.graph import anchor_profile, anchor_texts

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    html = F.concat(
        F.lit('<div><a href="https://t.example/p/'),
        F.pmod(i, F.lit(50)).cast("string"),
        F.lit('">visit page '),
        F.pmod(i, F.lit(7)).cast("string"),
        F.lit("</a> filler <a href='https://t.example/q/"),
        F.pmod(i, F.lit(30)).cast("string"),
        F.lit("'><b>read</b>  more</a></div>"),
    )
    pages = d.select(
        F.concat(F.lit("https://s"), F.pmod(i, F.lit(100)).cast("string"),
                 F.lit(".example/")).alias("url"),
        html.alias("html"),
    )
    return anchor_profile(anchor_texts(pages), k=2)


def q70_hits(spark, sf_dir):
    """HITS hubs & authorities (Kleinberg 1999; operators/graph.py::
    hits) over q36's deterministic synthetic link graph — the
    complement of PageRank for crawl prioritization (hub scores rank
    listing pages whose outlinks are worth expanding). L1-normalized
    with per-iteration 12-dp rounding (the replayable-iteration
    convention); the oracle unrolls the identical two iterations in
    SQL. One hash join + one map-side-combinable sum per half-step;
    normalization is a 1-row broadcast aggregate, never a per-
    iteration driver value."""
    from raven_spark.operators.graph import hits

    d = _t(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    edges = _synthetic_link_edges(d, n)
    return hits(
        edges, nodes=d.select(F.col("doc_id").alias("node")), iterations=2
    )


# PSL rule set + synthetic host scheme shared by q71/q72: every rule
# class exercised (exact single- and multi-label, '*.ck' wildcard,
# '!www.ck'-style exception, unknown TLD, public-suffix-only host)
_PSL_RULES = (
    ("com", "co.uk", "kawasaki.jp"),          # exact
    ("*.ck", "kawasaki.jp"),                  # wildcard bases
    ("!www.ck", "city.kawasaki.jp"),          # exceptions
)


def _synthetic_host_col():
    m = F.col("doc_id") % 7
    return (
        F.when(m == 0, F.concat(F.lit("a"), (F.col("doc_id") % 5).cast("string"),
                                F.lit(".shop.example.com")))
        .when(m == 1, F.concat(F.lit("x"), (F.col("doc_id") % 3).cast("string"),
                               F.lit(".example.co.uk")))
        .when(m == 2, F.lit("co.uk"))
        .when(m == 3, F.concat(F.lit("w"), (F.col("doc_id") % 4).cast("string"),
                               F.lit(".foo.ck")))
        .when(m == 4, F.concat(F.lit("s"), (F.col("doc_id") % 2).cast("string"),
                               F.lit(".www.ck")))
        .when(m == 5, F.lit("localhost"))
        .otherwise(F.concat(F.lit("p"), (F.col("doc_id") % 6).cast("string"),
                            F.lit(".city.kawasaki.jp")))
    )


_SYNTH_HOST_SQL = """CASE doc_id % 7
                       WHEN 0 THEN 'a' || CAST(doc_id % 5 AS VARCHAR) || '.shop.example.com'
                       WHEN 1 THEN 'x' || CAST(doc_id % 3 AS VARCHAR) || '.example.co.uk'
                       WHEN 2 THEN 'co.uk'
                       WHEN 3 THEN 'w' || CAST(doc_id % 4 AS VARCHAR) || '.foo.ck'
                       WHEN 4 THEN 's' || CAST(doc_id % 2 AS VARCHAR) || '.www.ck'
                       WHEN 5 THEN 'localhost'
                       ELSE 'p' || CAST(doc_id % 6 AS VARCHAR) || '.city.kawasaki.jp'
                     END"""

# generic exception-prevails PSL replay over the synthetic hosts:
# b = exc_b > 0 ? exc_b - 1 : base_b (see q71's oracle comments)
_PSL_KEY_SQL = f"""lab AS (
              SELECT doc_id, host, string_split(host, '.') AS labs,
                     len(string_split(host, '.')) AS n
              FROM hosts
            ), scored AS (
              SELECT doc_id, host, labs, n,
                     list_max(list_transform(range(1, least(n, 8) + 1), i ->
                       CASE WHEN list_contains(['www.ck','city.kawasaki.jp'],
                                       array_to_string(labs[n-i+1:n], '.'))
                       THEN i ELSE 0 END)) AS exc_b,
                     list_max(list_transform(range(1, least(n, 8) + 1), i ->
                       CASE WHEN (
                         list_contains(['com','co.uk','kawasaki.jp'],
                                       array_to_string(labs[n-i+1:n], '.'))
                         OR i = 1
                         OR (i > 1 AND list_contains(['ck','kawasaki.jp'],
                                       array_to_string(labs[n-i+2:n], '.')))
                       ) THEN i ELSE 0 END)) AS base_b
              FROM lab
            ), best AS (
              SELECT doc_id, host, labs, n,
                     CASE WHEN exc_b > 0 THEN exc_b - 1 ELSE base_b END AS b
              FROM scored
            )"""


def q71_registered_domain(spark, sf_dir):
    """Pay-level-domain extraction under public-suffix-list semantics
    (publicsuffix.org algorithm; functions/urls.py::registered_domain_col):
    exception rules prevail (yielding the rule minus its leftmost
    label), else the longest match over exact / wildcard rule classes
    plus the implicit '*' prevailing rule — pure column algebra; rule
    sets ship as plan literals (the real PSL is ~9k rules), zero
    shuffles, zero UDFs. Hosts synthesized from doc_id residues so every
    rule class is exercised; ``domain_key`` is the politeness/rollup
    grouping key (registrable domain, host fallback). The oracle replays
    the PSL algorithm generically with DuckDB list lambdas — not the
    residue synthesis shortcut."""
    from raven_spark.functions.urls import (
        public_suffix_col,
        registered_domain_col,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    S, W, E = _PSL_RULES
    hosts = d.select("doc_id", _synthetic_host_col().alias("host"))
    # build the PSL expression tree once per output column and derive
    # domain_key from the materialized registered_domain (the rule-set
    # literals would otherwise be embedded in the plan a third time)
    return hosts.select(
        "doc_id",
        "host",
        public_suffix_col(F.col("host"), S, W, E).alias("public_suffix"),
        registered_domain_col(F.col("host"), S, W, E).alias("registered_domain"),
    ).withColumn(
        "domain_key", F.coalesce(F.col("registered_domain"), F.col("host"))
    )


def q72_domain_rollup(spark, sf_dir):
    """Per-registrable-domain corpus rollup (operators/reputation.py::
    domain_rollup — the FineWeb-style domain stats table): docs, host
    fan-out, dup rate via 8-byte content hashes, token mass + corpus
    share, mean quality, keyed on q71's ``domain_key`` (registrable
    domain, host fallback) so subdomain farms roll up to one row. One
    hash aggregate over the corpus (distincts ride xxhash64 — text and
    hostnames never shuffle) + a 1-row broadcast total. Quality proxy
    here is least(n_chars/1000, 1) as in q42; production passes
    functions.text.quality_score."""
    from raven_spark.functions.urls import registered_domain_col
    from raven_spark.operators.reputation import domain_rollup

    S, W, E = _PSL_RULES
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text",
        F.least(F.col("n_chars") / F.lit(1000.0), F.lit(1.0)).alias("q"),
    ).withColumn("host", _synthetic_host_col())
    docs = d.withColumn(
        "domain_key",
        F.coalesce(
            registered_domain_col(F.col("host"), S, W, E), F.col("host")
        ),
    )
    return domain_rollup(docs, quality_col="q")


def q73_bitext_margin(spark, sf_dir):
    """Margin-based bitext mining (Artetxe & Schwenk 2019; operators/
    similarity.py::bitext_margin_pairs): embeddings split by vec_id
    parity into a synthetic source/target language pair; for every
    source vector the best target by RATIO margin — cosine normalized
    by the mean of both sides' top-k neighborhood cosines, which kills
    hubness (a target that is everyone's neighbor stops winning). Exact
    all-pairs at oracle scale; the 10^9-vector path swaps pair
    generation for the module's LSH/IVF candidate buckets with the same
    margin scoring verbatim. The oracle replays cosine (q18's explicit
    double fold), the 12/9/6-dp rounding ladder, k-NN tie-breaks, and
    the final (margin, cosine, tgt_id) pick."""
    from raven_spark.operators.similarity import bitext_margin_pairs

    emb = _t(spark, sf_dir, "embeddings")
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    return bitext_margin_pairs(src, tgt, k=4, dim=64)


def q74_bm25_topk(spark, sf_dir):
    """BM25 top-k retrieval (operators/pipeline_lexical.py::bm25_topk —
    Robertson & Zaragoza 2009 with Lucene's non-negative idf): three
    fixed in-vocabulary queries against the documents table, 10 best
    docs each. The tf aggregate's exchange is reused by the df rollup,
    doc length rides the scan, avgdl is a 1-row broadcast, query terms
    broadcast-join; ranking ties break on the 6-dp rounded score then
    doc id so Spark and the oracle pick identical rows."""
    from raven_spark.operators.pipeline_lexical import bm25_topk

    d = _t(spark, sf_dir, "documents")
    q = spark.createDataFrame(
        [(0, "spark window agg"), (1, "hash join table"),
         (2, "fast scan filter sort")],
        "query_id int, query string",
    )
    return bm25_topk(d, q, k=10)


def q75_dsir_select(spark, sf_dir):
    """DSIR importance resampling (operators/dsir.py — Xie et al. 2023):
    top-50 raw documents by hashed-n-gram importance log-weight against
    an in-table target slice (doc_id % 17 == 0). Both bucket models are
    map-side-combinable 8-byte-key aggregates; the O(D)=16384-row
    log-ratio table broadcasts; per-doc scoring shuffles one 16-byte row
    per doc; selection is TakeOrdered. Ranking on the 6-dp rounded
    weight, ties on doc_id, so Spark and DuckDB pick identical rows."""
    from raven_spark.operators.dsir import dsir_select

    d = _t(spark, sf_dir, "documents")
    target = d.filter(F.col("doc_id") % 17 == 0)
    return dsir_select(d, target, k=50, n_buckets=1 << 14, alpha=1.0)


def q76_semdedup(spark, sf_dir):
    """SemDedup (operators/dedup.py::semdedup — Abbas et al. 2023):
    cluster embeddings to 8 deterministic anchors (lowest vec_ids) by
    rounded cosine, then mark later same-cluster vectors within 0.35
    cosine as duplicates. Clusters bound the pair join (the scale
    contract); assignment is one broadcast crossJoin + max_by. The 0.35
    threshold is tuned to this table's isotropic synthetic embeddings
    (max pairwise cosine ~0.45) so the dup set is non-trivial."""
    from raven_spark.operators.dedup import semdedup

    e = _t(spark, sf_dir, "embeddings")
    return semdedup(e, n_clusters=8, threshold=0.35)


def q77_soft_dedup(spark, sf_dir):
    """SoftDeDup-style duplicate down-weighting (operators/dedup.py::
    soft_dedup_weights): every doc kept, training weight 1/n for an
    n-way exact-duplicate cluster. One 8-byte-hash-keyed map-side-
    combinable count + one hash join; text never shuffles."""
    from raven_spark.operators.dedup import soft_dedup_weights

    return soft_dedup_weights(_t(spark, sf_dir, "documents"))


def q78_cdc_chunks(spark, sf_dir):
    """Content-defined-chunking dedup (operators/dedup.py::
    cdc_chunk_dedup): word-level CDC boundaries from a SQL-replayable
    hash coin (expected chunk 8 words), corpus-wide chunk counts,
    per-doc duplicated-chunk fraction. Chunking is pure column algebra
    fused into the scan; only 8-byte chunk hashes shuffle."""
    from raven_spark.operators.dedup import cdc_chunk_dedup

    return cdc_chunk_dedup(_t(spark, sf_dir, "documents"), avg_chunk_words=8)


def q79_phrase_search(spark, sf_dir):
    """Exact-phrase search (operators/pipeline_lexical.py::phrase_search):
    positional postings pruned to the phrases' term set by broadcast
    semi-join before any shuffle, per-candidate-doc term->positions map
    in two id-keyed aggregates, consecutive-position check as pure
    array algebra, literal-bound top-k. Four in-vocabulary phrases of
    lengths 1-3 against the documents table."""
    from raven_spark.operators.pipeline_lexical import phrase_search

    d = _t(spark, sf_dir, "documents")
    ph = spark.createDataFrame(
        [(0, "table scan merge"), (1, "batch batch"), (2, "sort merge"),
         (3, "window"), (4, "no such phrase here")],
        "phrase_id int, phrase string",
    )
    return phrase_search(d, ph, k=10)


def q80_containment(spark, sf_dir):
    """Asymmetric containment near-dup pairs (operators/dedup.py::
    containment_pairs): inverted-index candidates keyed only on
    discriminative shingles (corpus df in [2, 20]), then exact
    containment/Jaccard over hashed gram arrays for candidate docs.
    Catches truncated-mirror/quote-wrapped copies Jaccard dilutes."""
    from raven_spark.operators.dedup import containment_pairs

    return containment_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.5, max_df=20
    )


def q81_shard_corpus(spark, sf_dir):
    """Deterministic corpus shuffle + sharding (operators/sampling.py::
    shard_corpus): shard and dense within-shard position as pure
    functions of the doc key (Knuth-coin convention), one exchange on
    the shard id plus the per-shard sort that IS the product. The
    training-prep step between curation and the data loader."""
    from raven_spark.operators.sampling import shard_corpus

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return shard_corpus(d, n_shards=16)


def q82_script_profile(spark, sf_dir):
    """Unicode script profile (functions/text.py::with_script_profile):
    per-script codepoint counts over the public Unicode core blocks +
    dominant script (declaration-order ties) — the routing signal ahead
    of language ID (Cyrillic text should never reach the Latin n-gram
    scorer). Pure column algebra fused into the scan, zero shuffles."""
    from raven_spark.functions.text import with_script_profile

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return with_script_profile(d).drop("text")


def q83_domain_budget(spark, sf_dir):
    """Per-domain crawl-budget allocation (operators/reputation.py::
    allocate_domain_budget): two-level cumulative rounding (telescoping
    Hamilton scheme, exact decimal(38) arithmetic) summing to EXACTLY
    the round total with no global sort — O(n_buckets) level-1 rows +
    one in-bucket running sum. Weights = doc counts per q53-convention
    synthetic domain, total 1000."""
    from raven_spark.operators.reputation import allocate_domain_budget

    d = _t(spark, sf_dir, "documents")
    dom = (
        d.select(
            F.concat(
                F.lit("s"), (F.col("doc_id") % 13).cast("string"),
                F.lit(".h"), (F.col("doc_id") % 7).cast("string"),
                F.lit(".example"),
            ).alias("domain")
        )
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    return allocate_domain_budget(dom, total_budget=1000, n_buckets=8)


def q84_connected_components(spark, sf_dir):
    """Connected components over an undirected link graph (operators/
    graph.py::connected_components): min-label propagation with pointer
    jumping to fixpoint — the dedup-cluster-closure / mirror-detection
    primitive at web scale (O(log diameter) rounds; only the 16-byte
    (node, label) vector shuffles per round, never the edge list).
    Deterministic synthetic edges: chains doc i — i+1 broken at
    (i+1)%50==0 and i%11==9, plus wrap-around cross edges
    i — (i+137) mod N for i%97==0 (merges some chain components, so the
    fixpoint needs real multi-hop propagation). The oracle computes the
    same components by recursive-CTE label closure."""
    from raven_spark.operators.graph import connected_components

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return connected_components(
        _chain_cross_edges(d, d.count()),
        nodes=d.select(F.col("doc_id").alias("node")),
    )


def _chain_cross_edges(d, n):
    """The deterministic multi-component graph shared by q84/q87:
    chains doc i -> i+1 broken at (i+1)%50==0 and i%11==9, plus
    wrap-around cross edges i -> (i+137) mod N for i%97==0. Both
    oracles replay the same formula."""
    i = F.col("doc_id")
    chain = d.filter(
        ((i + 1) % 50 != 0) & (i % 11 != 9) & (i + 1 < F.lit(n))
    ).select(i.alias("src"), (i + 1).alias("dst"))
    cross = d.filter(i % 97 == 0).select(
        i.alias("src"), F.pmod(i + 137, F.lit(n)).alias("dst")
    )
    return chain.union(cross)


def q87_neighborhood_function(spark, sf_dir):
    """Truncated neighborhood function + harmonic centrality (Boldi &
    Vigna) over the q84 directed graph (operators/graph.py). This entry
    runs the EXACT pair-set variant the oracle can replay (recursive-CTE
    min-distance closure); the 10^10-node scale path is
    graph.hyperball — same output shape, 64-byte HLL registers instead
    of pair sets — pytest-bounded against this exact twin
    (test_graph.py::test_hyperball_tracks_exact_neighborhood)."""
    from raven_spark.operators.graph import neighborhood_function

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return neighborhood_function(
        _chain_cross_edges(d, d.count()),
        nodes=d.select(F.col("doc_id").alias("node")),
        radius=4,
    )


def q85_weighted_sample(spark, sf_dir):
    """Weighted (PPS) sampling without replacement by bottom-k of
    replicated-ticket Knuth coins (operators/sampling.py::pps_bottomk):
    weight = length-derived tickets (1 + n_chars div 400, capped 16),
    row key = min ticket hash, sample = 100 smallest keys. Exact bigint
    arithmetic end to end; the oracle replays every ticket. Zero
    shuffle before the TakeOrderedAndProject top-k."""
    from raven_spark.operators.sampling import pps_bottomk

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.least(
            F.lit(16).cast("bigint"), F.lit(1) + F.floor(F.col("n_chars") / 400)
        ).alias("weight"),
    )
    return pps_bottomk(d, k=100, weight_col="weight", ticket_cap=16)


def q86_heavy_hitters(spark, sf_dir):
    """Top-50 corpus terms via per-partition Misra-Gries summaries
    (operators/pipeline_sketches.py::heavy_hitters): map side holds at most
    `capacity` counters per partition (shuffle O(partitions x capacity)
    rows regardless of vocabulary size), reduce side sums + takes the
    top-k with TakeOrderedAndProject. Run in the exactness regime
    (capacity 50k >> per-partition vocabulary at sf<=0.1), where MG
    counts are exact — the oracle is the exact token count."""
    from raven_spark.operators.pipeline_sketches import heavy_hitters

    return heavy_hitters(
        _t(spark, sf_dir, "documents"), k=50, capacity=50_000
    )


def q88_filter_funnel(spark, sf_dir):
    """Filter-ablation funnel (operators/pipeline_funnel.py::filter_funnel):
    six ordered cleaning rules over documents with per-stage reached/
    dropped/survived accounting, computed in ONE corpus pass (chained
    first-fail CASE + one count aggregate) instead of one filtered
    count per rule. The oracle replays the same first-fail CASE and
    cumulative window."""
    from raven_spark.operators.pipeline_funnel import filter_funnel

    d = _t(spark, sf_dir, "documents")
    text = F.col("text")
    # explicit RE2 whitespace class: Java \s adds \x0B, which would
    # shift min_words attribution vs the DuckDB twin on \v-bearing text
    words = F.size(F.filter(F.split(text, r"[ \t\n\f\r]+"), lambda w: w != ""))
    return filter_funnel(
        d,
        [
            ("min_chars", F.col("n_chars") >= 200),
            ("lang_en", F.col("lang") == "en"),
            ("min_words", words >= 30),
            (
                "terminal_punct",
                F.substring(F.trim(text), -1, 1).isin(".", "!", "?"),
            ),
            ("no_brace", ~text.contains("{")),
            ("max_chars", F.col("n_chars") <= 20000),
        ],
    )


def q89_term_dictionary(spark, sf_dir):
    """Dense frequency-ranked term ids WITHOUT a global sort
    (operators/pipeline_lexical.py::term_dictionary): two-level cumulative
    ranking — row_number within (count, term-prefix) groups + an
    exclusive group-size offset window over the tiny group table (the
    q83 telescoping trick applied to order statistics). The oracle is
    the straightforward global row_number."""
    from raven_spark.operators.pipeline_lexical import term_dictionary

    return term_dictionary(_t(spark, sf_dir, "documents"))


def q90_quantize_embeddings(spark, sf_dir):
    """Symmetric per-vector int8 quantization of the embedding store
    (operators/similarity.py::quantize_embeddings): scale/quantized
    codes/RMS reconstruction error, all column algebra fused into the
    scan. The 4x storage/IO lever under the ANN family (q18/q23); the
    oracle replays the exact float32->double arithmetic."""
    from raven_spark.operators.similarity import quantize_embeddings

    return quantize_embeddings(_t(spark, sf_dir, "embeddings"))


def q91_pmi_collocations(spark, sf_dir):
    """Top-50 bigram collocations by pointwise mutual information
    (operators/pipeline_lexical.py::pmi_collocations): two map-side-combinable
    count aggregates + two token-keyed joins + TakeOrderedAndProject —
    no global sort. min_count=5 floors PMI's rare-pair noise. The
    oracle replays the identical count algebra and the one fixed double
    expression tree."""
    from raven_spark.operators.pipeline_lexical import pmi_collocations

    return pmi_collocations(_t(spark, sf_dir, "documents"), min_count=5, k=50)


def q92_stuffing_signals(spark, sf_dir):
    """Keyword-stuffing / low-diversity spam signals per document
    (operators/pipeline_filters.py::stuffing_signals): top-token share (argmax
    token, ties to the smallest), character-unigram Shannon entropy,
    and an exact-integer stuffing verdict — all per-row folds over the
    doc's own sorted arrays, ZERO shuffles. The oracle counts the same
    multisets by group; sorted-run fold == per-key count."""
    from raven_spark.operators.pipeline_filters import stuffing_signals

    return stuffing_signals(_t(spark, sf_dir, "documents"))


def _synthetic_trap_url_col():
    """The synthetic URL mix shared by q93 (mining) and q102
    (enforcement): articles, session-token pages, a calendar grid, one
    static page — derived from doc_id, no external data. Its SQL twin
    is ``_TRAP_URL_SQL``; the two must stay bit-identical or the
    mine/enforce pair silently diverges."""
    h = F.pmod(F.col("doc_id"), F.lit(7)).cast("string")
    i = F.col("doc_id")
    v = F.pmod(i, F.lit(5))
    hex8 = F.lower(F.lpad(F.hex(i), 8, "0"))
    base = F.concat(F.lit("https://h"), h, F.lit(".example.com"))
    return (
        F.when(v == 0, F.concat(base, F.lit("/article/"), i.cast("string")))
        .when(v == 1, F.concat(base, F.lit("/article/"), i.cast("string"), F.lit("?ref=home")))
        .when(v == 2, F.concat(base, F.lit("/session/"), hex8))
        .when(
            v == 3,
            F.concat(
                base, F.lit("/cal/2026/"),
                F.pmod(i, F.lit(12)).cast("string"), F.lit("/"),
                F.pmod(i, F.lit(28)).cast("string"),
            ),
        )
        .otherwise(F.concat(base, F.lit("/static/about")))
    )


_TRAP_URL_SQL = """CASE doc_id % 5
                WHEN 0 THEN 'https://h' || (doc_id % 7) || '.example.com/article/' || doc_id
                WHEN 1 THEN 'https://h' || (doc_id % 7) || '.example.com/article/' || doc_id || '?ref=home'
                WHEN 2 THEN 'https://h' || (doc_id % 7) || '.example.com/session/' || lower(lpad(hex(doc_id), 8, '0'))
                WHEN 3 THEN 'https://h' || (doc_id % 7) || '.example.com/cal/2026/' || (doc_id % 12) || '/' || (doc_id % 28)
                ELSE 'https://h' || (doc_id % 7) || '.example.com/static/about'
                END"""

# host + template replay shared by the q93/q102 oracles: authority minus
# userinfo/port (template_host_col's regex), strip query/fragment, lower,
# {hex} before {n}, RE2 'g' flags matching Spark's replace-all semantics
_TPL_KEY_SQL = """
              SELECT url,
                     lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?([^/?#:]*)', 1)) AS host,
                     regexp_replace(
                       regexp_replace(
                         CASE WHEN p = '' THEN '/' ELSE lower(p) END,
                         '[0-9a-f]{8,}', '{hex}', 'g'),
                       '[0-9]+', '{n}', 'g') AS template
              FROM (
                SELECT url,
                       string_split(string_split(
                         regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''),
                         '#')[1], '?')[1] AS p
                FROM u)"""


def q93_url_templates(spark, sf_dir):
    """URL template mining / trap-cluster detection
    (functions/urls.py::mine_url_templates): collapse paths to their
    structural template ({hex}/{n} identifier slots), group by (host,
    template), flag populations of DISTINCT siblings that inflate the
    way calendar/session traps do. URLs synthesized from doc_id
    (_synthetic_trap_url_col) — no external data. One hash aggregate;
    the oracle replays the regex algebra with RE2 'g' flags."""
    from raven_spark.functions.urls import mine_url_templates

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return mine_url_templates(
        d.select(_synthetic_trap_url_col().alias("url")), min_urls=20, min_slots=2
    )


def q94_readability(spark, sf_dir):
    """Flesch reading ease + Flesch-Kincaid grade per document
    (functions/text.py::readability): exact integer sentence/word/
    vowel-group-syllable counts folded per row (zero shuffles), two
    fixed double score expressions the oracle replays bit-for-bit."""
    from raven_spark.functions.text import readability

    return readability(_t(spark, sf_dir, "documents"))


def q95_kmeans(spark, sf_dir):
    """Deterministic Lloyd k-means over the embedding store
    (operators/similarity.py::kmeans_lloyd, k=8, 2 iterations): literal
    centroid broadcast (O(k*dim) state, MLlib-style), zero-shuffle
    assignment scans, FIXED-POINT exact centroid sums so no float
    accumulation order can flip an assignment. The oracle unrolls both
    iterations in SQL and replays the identical arithmetic."""
    from raven_spark.operators.similarity import kmeans_lloyd

    return kmeans_lloyd(_t(spark, sf_dir, "embeddings"), k=8, iterations=2)


def q96_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss ±1 random projection 64 -> 16 dims
    (operators/similarity.py::random_projection): the projection matrix
    is a pure Knuth-coin function of the cell index — never
    materialized, never shipped; one fold per output component, fused
    into the scan. The oracle recomputes the same signs and folds."""
    from raven_spark.operators.similarity import random_projection

    return random_projection(_t(spark, sf_dir, "embeddings"))


def q97_domain_graph(spark, sf_dir):
    """Registrable-domain link-graph rollup (operators/graph.py::
    domain_graph): the page-level synthetic edge set (q36/q70's shared
    builder) mapped through q71's PSL domain_key and collapsed to
    domain-domain weights + per-domain degree/insularity stats
    (intra_frac = nav-vs-content signal). Two 8-byte joins + two
    O(domains) aggregates; the oracle replays edges and the PSL key."""
    from raven_spark.functions.urls import registered_domain_col
    from raven_spark.operators.graph import domain_graph

    S, W, E = _PSL_RULES
    d = _t(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    edges = _synthetic_link_edges(d, n)
    doms = d.select(
        F.col("doc_id").alias("node"),
        F.coalesce(
            registered_domain_col(_synthetic_host_col(), S, W, E),
            _synthetic_host_col(),
        ).alias("domain"),
    )
    return domain_graph(edges, doms)


def q98_bpe_merges(spark, sf_dir):
    """First 3 BPE merge rules learned over the corpus vocabulary
    (operators/pipeline.py::bpe_merges, Sennrich et al. 2016): per step
    one pair-count hash aggregate over the cached O(vocab) symbol table
    + a 1-row TakeOrdered argmax (the algorithm's inherent sync point);
    fusing is a literal left-to-right replace over \\x1f-joined symbols,
    which the oracle replays step by step with the same replace()."""
    from raven_spark.operators.pipeline import bpe_merges

    return bpe_merges(_t(spark, sf_dir, "documents"), steps=3)


def q99_content_drift(spark, sf_dir):
    """Per-URL content drift across crawl snapshots
    (operators/snapshots.py::content_drift): SimHash Hamming distance
    between CONSECUTIVE captures of the same URL (captures synthesized
    as in q37: url_id = doc_id mod 137, capture order = doc_id), rolled
    into n_caps / n_changed / mean / max per URL. One exchange total:
    the lag window and the final aggregate share the url partitioning.
    The oracle replays q22's FNV/bit-plane SimHash and the same lag."""
    from raven_spark.operators.snapshots import content_drift

    d = _t(spark, sf_dir, "documents")
    caps = d.select(
        (F.col("doc_id") % 137).alias("url_id"),
        F.col("doc_id").alias("cap_seq"),
        "text",
    )
    return content_drift(caps)


def q100_domain_split(spark, sf_dir):
    """Leakage-safe train/val/test split at registrable-domain
    granularity (operators/sampling.py::domain_split): one domain ->
    one split, so site mirrors and templated siblings never straddle
    the eval boundary. The coin is quality_model's poly-31+Knuth string
    hash of q71's domain_key — zero shuffles, reproducible anywhere;
    the oracle refolds the same hash in SQL."""
    from raven_spark.functions.urls import registered_domain_col
    from raven_spark.operators.sampling import domain_split

    S, W, E = _PSL_RULES
    d = _t(spark, sf_dir, "documents").select("doc_id").withColumn(
        "domain_key",
        F.coalesce(
            registered_domain_col(_synthetic_host_col(), S, W, E),
            _synthetic_host_col(),
        ),
    )
    return domain_split(d, val_permille=100, test_permille=50)


def q101_kwic_snippets(spark, sf_dir):
    """Keyword-in-context snippets (functions/text.py::kwic_snippets):
    first-occurrence ±30-char windows + literal occurrence counts for
    'order' — locate/substr/replace algebra fused into the scan, zero
    shuffles. The oracle replays with strpos/substr (both 1-based,
    character-addressed)."""
    from raven_spark.functions.text import kwic_snippets

    return kwic_snippets(_t(spark, sf_dir, "documents"), term="order", width=30)


def q102_template_admission(spark, sf_dir):
    """The mine -> enforce loop closed (operators/admission.py +
    functions/urls.py::mine_url_templates): templates mined from the
    q93 synthetic URL set, trap_suspect clusters fed back as the
    admission denylist (broadcast O(flagged-templates) side), every URL
    re-gated. Output per URL: template_blocked + the composed admit.
    The oracle replays mining and the (host, template) membership."""
    from raven_spark.functions.urls import mine_url_templates
    from raven_spark.operators.admission import frontier_admission

    d = _t(spark, sf_dir, "documents").select("doc_id")
    cand = d.select(_synthetic_trap_url_col().alias("url_canon"))
    # the full mining table goes in; frontier_admission filters on its
    # trap_suspect column itself (the API contract the review hardened)
    deny = mine_url_templates(cand, url_col="url_canon", min_urls=20, min_slots=2)
    return frontier_admission(cand, trap_templates=deny).select(
        F.col("url_canon").alias("url"), "template_blocked", "admit"
    )


def q103_approx_distinct(spark, sf_dir):
    """Per-host approximate distinct-URL cardinality with an error
    contract (operators/pipeline_sketches.py::approx_distinct_contract): Spark's
    built-in HLL++ sketch (JVM map-side merge — the scale path past
    exact count-distinct's expand), checked against the exact count
    within a sigma*rsd band (q23's contract-oracle pattern). The exact
    count is oracle-replayed; the contract flips red if the estimator
    drifts."""
    from raven_spark.operators.pipeline_sketches import approx_distinct_contract

    d = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("h"), F.pmod(F.col("doc_id"), F.lit(7)).cast("string")).alias("host"),
        F.concat(F.lit("/p/"), F.pmod(F.col("doc_id"), F.lit(137)).cast("string")).alias("url"),
    )
    return approx_distinct_contract(d, "host", "url", rsd=0.05)


def q104_trustrank(spark, sf_dir):
    """Seeded TrustRank + spam mass over the shared synthetic link graph
    (operators/graph.py::trustrank; Gyongyi et al. 2004/2006): teleport
    restricted to the trusted seed set doc_id % 17 == 0, 3 power steps
    with the q36 per-iteration 12-dp rounding discipline, spam_mass =
    (pr - tr)/pr clamped to [0,1]. Each iteration shuffles only the
    O(nodes) trust vector; the seed flag joins broadcast. The oracle
    unrolls both recurrences."""
    from raven_spark.operators.graph import trustrank

    d = _t(spark, sf_dir, "documents")
    n = d.count()
    edges = _synthetic_link_edges(d, n)
    seeds = d.filter(F.col("doc_id") % 17 == 0).select(F.col("doc_id").alias("node"))
    nodes = d.select(F.col("doc_id").alias("node"))
    return trustrank(edges, seeds, nodes=nodes)


def q105_adaptive_budget(spark, sf_dir):
    """Latency-adaptive per-host politeness budgets
    (operators/politeness.py::adaptive_host_budget): per-(host, round)
    mean fetch latency -> closed-form EWMA over rounds (one window + one
    aggregate, all order-independent via 9-dp rounding) -> proportional
    budget clamped to [1, 50]. Synthetic latencies are a fixed function
    of event_id; the oracle replays the identical weight algebra."""
    from raven_spark.operators.politeness import adaptive_host_budget

    ev = _t(spark, sf_dir, "events")
    lat = ev.select(
        F.concat(F.lit("h"), F.pmod(F.col("user_id"), F.lit(5)).cast("string")).alias("host"),
        F.pmod(F.col("event_id"), F.lit(4)).alias("round_no"),
        (F.lit(50.0) + F.pmod(F.col("event_id") * 7919, F.lit(451)).cast("double")).alias(
            "latency_ms"
        ),
    )
    return adaptive_host_budget(
        lat, target_ms=200.0, alpha=0.3, base_budget=10, max_budget=50
    )


def q106_quantile_contract(spark, sf_dir):
    """Per-group approximate percentiles with a rank-error contract
    (operators/pipeline_sketches.py::approx_quantile_contract): the built-in
    Greenwald-Khanna sketch (percentile_approx) audited against the
    exact ranks — q103's contract-oracle pattern for quantiles. The
    exact interpolated percentile is oracle-replayed (quantile_cont);
    a drifting sketch flips within_bound and the hash goes red."""
    from raven_spark.operators.pipeline_sketches import approx_quantile_contract

    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("k"), F.col("value").alias("v")
    )
    return approx_quantile_contract(
        ev, "k", "v", percentiles=(0.5, 0.9, 0.99), accuracy=1000
    )


def q107_cms_frequency(spark, sf_dir):
    """Count-Min sketch point-frequency estimation
    (operators/pipeline_sketches.py::cms_frequency): depth-4 x width-256 counter
    matrix over user_id % 211, map-side combinable, O(d*w) state
    regardless of key cardinality; estimates = min over rows, never
    below the exact count. The deterministic Knuth/xxhash-constant hash
    family is replayed exactly by the oracle in BIGINT arithmetic."""
    from raven_spark.operators.pipeline_sketches import cms_frequency

    ev = _t(spark, sf_dir, "events").select(
        F.pmod(F.col("user_id"), F.lit(211)).alias("key")
    )
    return cms_frequency(ev, "key", depth=4, width=256)


def q108_pq_encode(spark, sf_dir):
    """Product quantization of the embedding store
    (operators/similarity.py::pq_encode; Jegou et al. 2011): m=4
    subspaces x k=16 centroids (codebook = 16 smallest-id vectors, the
    kmeans_lloyd TakeOrdered init convention), argmin assignment as
    pure column algebra fused into the scan, reconstruction MSE rides
    along. 64x smaller vectors for the IVF-PQ scale path under
    q18/q23. The oracle replays the codebook and every argmin."""
    from raven_spark.operators.similarity import pq_encode

    return pq_encode(_t(spark, sf_dir, "embeddings"), m=4, k=16, dim=64)


def q109_doremi(spark, sf_dir):
    """DoReMi-style exponentiated-gradient domain reweighting
    (operators/sampling.py::doremi_weights; Xie et al. 2023): one
    corpus-scan aggregate builds per-language mean proxy loss
    (n_chars/1000), then 3 EG steps with damped excess loss and 9-dp
    per-iteration rounding — the iterative upgrade over q70's static
    token-mass mixture weights. The oracle unrolls all 3 steps."""
    from raven_spark.operators.sampling import doremi_weights

    d = _t(spark, sf_dir, "documents").select(
        "lang", (F.col("n_chars").cast("double") / F.lit(1000.0)).alias("loss")
    )
    return doremi_weights(d, "lang", "loss", eta=0.5, iterations=3)


def q110_term_drift(spark, sf_dir):
    """Term-distribution drift between corpus slices
    (operators/pipeline_lexical.py::term_drift): 2x2 chi-square per term between
    the doc_id-parity halves, min_count=20 floor, top-50 via
    TakeOrderedAndProject — the drift monitor a continuously refreshed
    crawl corpus runs between dumps. ONE map-side-combinable aggregate
    over the token stream; the oracle replays the fixed chi2 tree."""
    from raven_spark.operators.pipeline_lexical import term_drift

    d = _t(spark, sf_dir, "documents")
    return term_drift(d, F.col("doc_id") % 2 == 0, min_count=20, k=50)


def q111_kmv_mirrors(spark, sf_dir):
    """Host-mirror detection via KMV bottom-k shingle sketches
    (operators/dedup.py::kmv_mirror_pairs; Beyer et al. 2007): per-host
    word-3-gram keys (Horner char fold, oracle-replayable), k=32
    smallest per host (literal-bound window -> WindowGroupLimit), pair
    candidates blocked on shared sketch members, resemblance from the
    merged bottom-k; exact Jaccard rides along as the audit. The 4th
    sketch family next to HLL (q103), CMS (q107), Misra-Gries (q86)."""
    from raven_spark.operators.dedup import kmv_mirror_pairs

    d = _t(spark, sf_dir, "documents")
    host = F.concat(F.lit("h"), F.pmod(F.col("doc_id"), F.lit(4)).cast("string"))
    return kmv_mirror_pairs(d, host, shingle_n=3, k=32)


def q112_opic(spark, sf_dir):
    """On-line Page Importance Computation (operators/graph.py::opic;
    Abiteboul/Preda/Cobena WWW'03) over the q36 synthetic link graph:
    3 cash-distribution rounds with exact mass conservation (dangling
    cash returns via the virtual root), 12-dp per-round rounding for
    replayability; importance = banked history / total. The crawl-time
    alternative to PageRank — maintained DURING the crawl, one join +
    one agg per round. The oracle unrolls the identical three rounds."""
    from raven_spark.operators.graph import opic

    d = _t(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    edges = _synthetic_link_edges(d, n)
    return opic(edges, nodes=d.select(F.col("doc_id").alias("node")), rounds=3)


def q113_zipf_fit(spark, sf_dir):
    """Zipf rank-frequency fit (operators/pipeline_lexical.py::zipf_fit): OLS of
    log(freq) on log(rank) over the top-10k vocabulary — the corpus
    health check (natural text has slope ~ -1; template floods bend it).
    One map-side-combinable term count, one literal-bounded rank window,
    one 1-row closed-form OLS aggregate. Bigrams here: the synthetic
    vocab is 31 unigram types, so the bigram curve (916 types) is the
    non-degenerate fit."""
    from raven_spark.operators.pipeline_lexical import zipf_fit

    d = _t(spark, sf_dir, "documents")
    return zipf_fit(d, min_count=2, max_rank=10_000, ngram_n=2)


def q114_good_turing(spark, sf_dir):
    """Good-Turing frequency-of-frequencies
    (operators/pipeline_lexical.py::good_turing): n_c for c<=10 plus the GT
    re-estimate c* = (c+1)n_{c+1}/n_c — the unseen-mass diagnostic under
    the q48/q68 LM quality filters (P0 = N1/N). Term counts collapse to
    an O(max_c)-row table before any window. Bigram types (every
    synthetic unigram has count >= 26, so the unigram GT table is
    empty; bigrams have the low-c mass GT describes)."""
    from raven_spark.operators.pipeline_lexical import good_turing

    d = _t(spark, sf_dir, "documents")
    return good_turing(d, max_c=10, ngram_n=2)


def q115_priority_schedule(spark, sf_dir):
    """The loop-closing frontier scheduler
    (operators/admission.py::priority_schedule): OPIC page importance
    (q112) x latency-adaptive host budgets (q105) -> per-host
    top-budget fetch list, ranked (priority desc, url asc). The
    composition a real crawl round executes — WHAT to fetch, in WHAT
    order, HOW MANY per host. Literal max-budget window bound
    (WindowGroupLimit) + exact budget filter on survivors, the
    plans/round.py politeness discipline. Oracle replays all three
    stages (opic unroll + EWMA budgets + the same window)."""
    from raven_spark.operators.admission import priority_schedule
    from raven_spark.operators.graph import opic
    from raven_spark.operators.politeness import adaptive_host_budget

    d = _t(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    importance = opic(
        _synthetic_link_edges(d, n),
        nodes=d.select(F.col("doc_id").alias("node")),
        rounds=3,
    )
    ev = _t(spark, sf_dir, "events")
    lat = ev.select(
        F.concat(F.lit("h"), F.pmod(F.col("user_id"), F.lit(5)).cast("string")).alias(
            "host"
        ),
        F.pmod(F.col("event_id"), F.lit(4)).alias("round_no"),
        (
            F.lit(50.0) + F.pmod(F.col("event_id") * 7919, F.lit(451)).cast("double")
        ).alias("latency_ms"),
    )
    budgets = adaptive_host_budget(
        lat, target_ms=200.0, alpha=0.3, base_budget=10, max_budget=50
    )
    cand = d.select(
        F.concat(F.lit("h"), F.pmod(F.col("doc_id"), F.lit(5)).cast("string")).alias(
            "host"
        ),
        F.concat(
            F.lit("https://h"),
            F.pmod(F.col("doc_id"), F.lit(5)).cast("string"),
            F.lit(".example/page/"),
            F.col("doc_id").cast("string"),
        ).alias("url_canon"),
        F.col("doc_id").alias("node"),
    )
    return priority_schedule(
        cand, importance, budgets, default_budget=5, max_budget=50
    )


def q116_domain_diversity(spark, sf_dir):
    """Per-domain lexical diversity rollup
    (operators/pipeline_lexical.py::domain_diversity): type-token ratio,
    Shannon entropy of the domain's term distribution, and normalized
    entropy — the domain-level template/spam signal per-document
    quality scores can't see. One (domain, term) hash aggregate (the
    only text pass), domain-window totals, entropy fold reusing the
    window's partitioning."""
    from raven_spark.operators.pipeline_lexical import domain_diversity

    d = _t(spark, sf_dir, "documents")
    dom = F.concat(F.lit("d"), F.pmod(F.col("doc_id"), F.lit(7)).cast("string"))
    return domain_diversity(d, dom)


def q117_revisit_schedule(spark, sf_dir):
    """Drift-adaptive revisit intervals
    (operators/snapshots.py::revisit_schedule; Cho & Garcia-Molina
    TOIT'03 bias-corrected Poisson change-rate): q99's per-URL SimHash
    drift profile -> lambda_hat = -ln((n-X+0.5)/(n+0.5)) -> interval =
    clamp(ceil(1/lambda), 1, 64); never-changed URLs decay to 64,
    single-capture URLs get the default 8. Same capture synthesis as
    q99/q37 (url_id = doc_id mod 137). Inherits content_drift's single
    url-keyed exchange; the oracle replays SimHash + the estimator."""
    from raven_spark.operators.snapshots import revisit_schedule

    d = _t(spark, sf_dir, "documents")
    caps = d.select(
        (F.col("doc_id") % 137).alias("url_id"),
        F.col("doc_id").alias("cap_seq"),
        "text",
    )
    return revisit_schedule(caps, min_interval=1, max_interval=64, default_interval=8)


def q118_term_burstiness(spark, sf_dir):
    """Term burstiness and adaptation
    (operators/pipeline_lexical.py::term_burstiness; Church & Gale 1995, Katz
    1996): E[x|x>0] = total/df and P(x>=2|x>=1) per term — the
    within-document clumping signal separating topical vocabulary from
    function words and once-per-page template tokens. One (doc, term)
    aggregate (the only text pass), one per-term fold, top-100 by
    (burstiness desc, term asc). Exact integer ratios at 6dp."""
    from raven_spark.operators.pipeline_lexical import term_burstiness

    d = _t(spark, sf_dir, "documents")
    return term_burstiness(d, min_df=2, k=100)


def q119_crawl_saturation(spark, sf_dir):
    """Per-domain crawl saturation / diminishing returns
    (operators/snapshots.py::crawl_saturation): first-seen rounds per
    (domain, content), per-round new-content yield, per-domain
    closed-form OLS decay of ln(yield) on round — the stop/continue
    signal for domain budget allocation (complements q83's size-
    proportional budgets). Captures synthesized with a 211-key content
    pool per 8-round domain history so yields genuinely decay. Three
    hash aggregates; text-scale keys never shuffle (production passes
    xxhash64(text))."""
    from raven_spark.operators.snapshots import crawl_saturation

    d = _t(spark, sf_dir, "documents")
    caps = d.select(
        F.concat(F.lit("d"), F.pmod(F.col("doc_id"), F.lit(5)).cast("string")).alias(
            "domain"
        ),
        F.pmod(F.floor(F.col("doc_id") / F.lit(5)), F.lit(8)).cast("int").alias(
            "round_no"
        ),
        F.concat(
            F.lit("c"), F.pmod(F.col("doc_id") * 17, F.lit(211)).cast("string")
        ).alias("content_key"),
    )
    return crawl_saturation(caps)


def q120_shard_skew(spark, sf_dir):
    """Shuffle-skew pre-flight diagnostic
    (operators/pipeline_sketches.py::shard_skew): how evenly would a
    user_id-keyed shuffle of events land on 32 reducers — max shard
    share (straggler bound), coefficient of variation, exact Gini over
    all shards (empties included; idle reducers are skew too). One
    count-per-shard aggregate, one O(32) window, one 1-row fold; the
    Knuth-mix shard function replays in the oracle."""
    from raven_spark.operators.pipeline_sketches import shard_skew

    ev = _t(spark, sf_dir, "events")
    return shard_skew(ev, "user_id", n_shards=32)


def q121_temperature_mix(spark, sf_dir):
    """Temperature-scaled mixture weights
    (operators/sampling.py::temperature_weights; XLM-R/mT5-style
    multilingual rebalancing, T=0.7): token-mass shares per domain
    exponentiated and renormalized — the static knob between natural
    proportions (q70) and DoReMi's iterative loop (q109). One
    corpus-scan aggregate; the corpus never shuffles."""
    from raven_spark.operators.sampling import temperature_weights

    d = _t(spark, sf_dir, "documents")
    caps = d.select(
        F.concat(F.lit("d"), F.pmod(F.col("doc_id"), F.lit(5)).cast("string")).alias(
            "domain"
        ),
        F.length("text").alias("n_chars"),
    )
    return temperature_weights(caps, "domain", temperature=0.7, size_col="n_chars")


def q122_ks_length_drift(spark, sf_dir):
    """Per-domain exact two-sample KS drift of the doc-length
    distribution vs the corpus (operators/pipeline_sketches.py::ks_group_drift)
    — the part-vs-whole distribution monitor that flags templated or
    truncated domains even when every per-doc score passes. Exact via
    the merged-jump-point formulation (group jump points are corpus
    jump points): two count aggregates + bounded-cardinality CDF
    windows + one equi-join; no cross product, no global row sort."""
    from raven_spark.operators.pipeline_sketches import ks_group_drift

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        F.concat(F.lit("d"), F.pmod(F.col("doc_id"), F.lit(7)).cast("string")).alias(
            "domain"
        ),
        F.length("text").alias("n_chars"),
    )
    return ks_group_drift(base, "domain", "n_chars", min_n=5)


def q123_bloom_contract(spark, sf_dir):
    """Bloom FPR contract (operators/pipeline_sketches.py::bloom_contract) —
    completes the probabilistic-contract family (HLL q103, GK q106,
    CMS q107, KMV q111) with the oracle-checkable twin of the engine's
    pytest-gated sharded seen-filter: even doc_ids build the filter,
    odd doc_ids probe it; measured FPR audited against the fill-based
    (n_set/m)^k expectation. Bit set = a DataFrame of set positions
    (never a driver bitmap); probe = one broadcast semi-join."""
    from raven_spark.operators.pipeline_sketches import bloom_contract

    d = _t(spark, sf_dir, "documents").select("doc_id")
    members = d.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    probes = d.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)
    return bloom_contract(members, probes, "doc_id", m_bits=4096, k_hashes=3)


def q124_cocitation(spark, sf_dir):
    """Co-citation related-pages (operators/graph.py::cocitation_pairs;
    Dean & Henzinger WWW'99) over the q36 synthetic link graph: pairs
    of pages cited by >= 2 shared sources — the graph-structural
    mirror/similar-page signal complementing KMV's content resemblance
    (q111). Hub explosion bounded BEFORE the self-join by a literal
    degree cap (WindowGroupLimit); top-100 by shared-source count."""
    from raven_spark.operators.graph import cocitation_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    edges = _synthetic_link_edges(d, n)
    return cocitation_pairs(edges, degree_cap=20, min_shared=2, top_k=100)


def q125_retrieval_metrics(spark, sf_dir):
    """Exact retrieval-quality evaluation
    (operators/similarity.py::retrieval_metrics): per-query nDCG@10 /
    MRR@10 / recall@10 — the evaluation operator the BM25 (q74) and
    ANN (q18/q23) family reports against. Deterministic synthetic runs
    (10 queries x 10 ranks over the doc_id<200 pool) and graded qrels;
    one rank-truncated equi-join + literal-bounded IDCG window +
    per-query aggregates. The composition against REAL ANN output is
    pytest-gated (test_retrieval_metrics_on_real_ann_runs)."""
    from raven_spark.operators.similarity import retrieval_metrics

    d = _t(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 200)
    qids = spark.range(10).select(F.col("id").cast("int").alias("qid"))
    ranks = spark.range(1, 11).select(F.col("id").cast("int").alias("rank"))
    runs = qids.crossJoin(ranks).select(
        "qid",
        F.pmod(F.col("qid") * 31 + F.col("rank") * 7, F.lit(200))
        .cast("bigint")
        .alias("doc_id"),
        "rank",
    )
    qrels = (
        qids.crossJoin(d)
        .filter(F.pmod(F.col("doc_id") + F.col("qid"), F.lit(11)) == 0)
        .select(
            "qid",
            "doc_id",
            (F.lit(1) + F.pmod(F.col("doc_id"), F.lit(3))).cast("int").alias("rel"),
        )
    )
    return retrieval_metrics(runs, qrels, k=10)


def q126_redirect_resolution(spark, sf_dir):
    """Redirect-chain resolution (operators/graph.py::resolve_redirects):
    pointer-doubling over a functional redirect graph — frontier
    admission keys on the canonical landing URL instead of counting
    every 301 hop. Synthetic chains doc_id -> doc_id-1 up to each
    multiple-of-16 terminal (length <= 15, exercising 4 doublings),
    plus 2-cycles between (k, k+16) at k % 160 == 96 — the chains that
    run into a cycle (97..111 -> 96 <-> 112) come out resolved=false
    with hops = 2^5 = 32, landing on exactly the node the oracle's
    hop-bounded recursive CTE reaches (byte parity on the pathological
    rows, not just the clean ones)."""
    from raven_spark.operators.graph import resolve_redirects

    d = _t(spark, sf_dir, "documents").select("doc_id")
    chain = d.filter(F.col("doc_id") % 16 != 0).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") - 1).alias("dst")
    )
    cyc_a = d.filter(F.col("doc_id") % 160 == 96).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 16).alias("dst")
    )
    cyc_b = d.filter(F.col("doc_id") % 160 == 112).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") - 16).alias("dst")
    )
    edges = chain.union(cyc_a).union(cyc_b)
    return resolve_redirects(edges, max_doublings=5)


def q127_mirror_hosts(spark, sf_dir):
    """Content-based mirror-host detection (operators/pipeline.py::
    mirror_hosts): host-pair Jaccard/containment over distinct
    content-key sets, pairs materialized ONLY through shared keys with
    a hosts-per-key cap killing boilerplate fan-out. Synthetic: doc
    2k/2k+1 share content key k across consecutive hosts h(2k%20)/
    h((2k+1)%20) -> 10 clean mirror pairs; a corpus-wide boilerplate
    key (-1, on all 20 hosts) exceeds the cap of 10 and is dropped
    from pairing while still counting toward host set sizes."""
    from raven_spark.operators.pipeline import mirror_hosts

    d = _t(spark, sf_dir, "documents").select("doc_id")
    real = d.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string")).alias("host"),
        F.floor(F.col("doc_id") / 2).cast("bigint").alias("content_key"),
    )
    boiler = d.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string")).alias("host"),
        F.lit(-1).cast("bigint").alias("content_key"),
    )
    return mirror_hosts(
        real.union(boiler), min_shared=3, max_hosts_per_key=10
    )


def q128_token_budget(spark, sf_dir):
    """Water-filling token-budget allocation (operators/sampling.py::
    token_budget_allocation): fill a fixed training budget at target
    mixture weights with per-source epoch caps; small sources saturate
    and their shortfall re-flows to the rest at target proportions via
    the closed-form sorted-saturation-point water level (no iteration).
    Synthetic: 8 sources (doc_id % 8) with avail = 100 tokens/doc and
    weights cycling 1/2/3 — the r = cap/w spread forces a real mixed
    saturated/unsaturated split at budget 60000, epochs <= 2."""
    from raven_spark.operators.sampling import token_budget_allocation

    d = _t(spark, sf_dir, "documents").select("doc_id")
    srcs = d.groupBy(
        F.concat(F.lit("s"), (F.col("doc_id") % 8).cast("string")).alias("source")
    ).agg(
        (F.count(F.lit(1)) * 100).cast("double").alias("avail_tokens"),
        F.max((F.col("doc_id") % 8) % 3 + 1).cast("double").alias("weight"),
    )
    return token_budget_allocation(
        srcs, budget=60000.0, max_epochs=2.0
    )


def q129_calibration(spark, sf_dir):
    """Classifier calibration / reliability diagram (operators/
    pipeline.py::calibration_bins; Guo et al. 2017): equal-width score
    bins with per-bin confidence/accuracy/|gap| and ECE contributions —
    the eval companion of the q51 quality classifier (a threshold on a
    miscalibrated score turns into systematic selection bias at corpus
    scale). Synthetic scores (doc_id*37 % 1000)/1000 with labels drawn
    by a second independent hash lane below the score — calibrated in
    expectation, so the per-bin gaps are small but nonzero and exactly
    replayable."""
    from raven_spark.operators.pipeline import calibration_bins

    d = _t(spark, sf_dir, "documents").select("doc_id")
    scored = d.select(
        (F.pmod(F.col("doc_id") * 37, F.lit(1000)).cast("double") / 1000.0).alias(
            "score"
        ),
        (
            F.pmod(F.col("doc_id") * 17, F.lit(1000))
            < F.pmod(F.col("doc_id") * 37, F.lit(1000))
        )
        .cast("int")
        .alias("label"),
    )
    return calibration_bins(scored, n_bins=10)


def q130_minhash_contract(spark, sf_dir):
    """MinHash estimation-accuracy contract (operators/dedup.py::
    minhash_contract; Broder 1997): k=64 affine-permutation signature
    agreement vs EXACT shingle-set Jaccard per candidate pair, audited
    against the Hoeffding deviation bound — the probabilistic-contract
    family (Bloom q123 / HLL q103 / GK q106 / CMS q107 / KMV q111)
    closing over the near-dup workhorse itself. Pairs: each doc vs a
    tail-appended variant (high J) and adjacent unrelated docs (low J);
    Horner shingle keys + the affine family replay bit-for-bit in
    DuckDB."""
    from raven_spark.operators.dedup import minhash_contract

    base = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    variants = base.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" shared tail alpha beta gamma delta")
        ).alias("text"),
    )
    docs = base.union(variants)
    near = base.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1000).alias("id_b")
    )
    far = base.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 59)).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )
    return minhash_contract(docs, near.union(far), k=64, shingle_n=3)


def q131_train_classifier(spark, sf_dir):
    """In-engine distributed training of the hashed quality classifier
    (operators/quality_model.py::train_classifier): full-batch logistic
    regression over the q51 unigram+bigram hashed features, T=3 GD
    steps with every cross-row sum in fixed-point (round(term*1e12)
    accumulated exactly) and every residual/weight rounded to 12 dp —
    the trajectory is a pure function of the data, so the oracle
    unrolls the three iterations as CTEs and replays weight-for-weight.
    Labels: planted-word supervision (doc contains 'spark'), so the
    planted bucket separates and the learned table feeds
    classifier_score(weights=...) directly."""
    from raven_spark.operators.quality_model import train_classifier

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    labeled = d.filter(F.col("text").isNotNull()).select(
        "doc_id",
        "text",
        F.array_contains(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "),
            "spark",
        )
        .cast("double")
        .alias("label"),
    )
    return train_classifier(
        labeled, n_buckets=64, iterations=3, lr=0.5
    ).orderBy("bucket")


def q132_chunk_documents(spark, sf_dir):
    """Sliding-window token chunking (operators/pipeline.py::
    chunk_documents): split each document's token stream into
    40-token windows advancing by stride 32 (8-token overlap) — the
    context-window prep between a cleaned corpus and an embedding/RAG
    index, the per-doc dual of q46's concat-and-pack. Closed-form
    chunk count K = 1 + ceil(max(m-C,0)/S); zero shuffles (one
    posexplode of per-row window structs)."""
    from raven_spark.operators.pipeline import chunk_documents

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(d, chunk_tokens=40, overlap=8)


def q133_html_stats(spark, sf_dir):
    """Markup-structure quality signals (functions/text.py::
    html_stats_cols): tag/anchor/script counts, visible-char share and
    anchor density over the RAW html — the pre-extraction filter
    signals (RefinedWeb/Gopher drop link-farm and script-heavy pages
    before paying extraction). Pages synthesized deterministically from
    the documents table: title + optional script block (doc_id % 3) +
    body text + 0-4 repeated nav anchors (doc_id % 5), so every ratio
    varies and replays exactly."""
    from raven_spark.functions.text import with_html_stats

    one_anchor = '<a href="/x">more</a>'
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pages = d.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>doc "),
            F.col("doc_id").cast("string"),
            F.lit("</title>"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("<script>var x=1;</script>")
            ).otherwise(F.lit("")),
            F.lit("</head><body><h1>doc</h1><p>"),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("</p>"),
            F.substring(
                F.lit(one_anchor * 4),
                F.lit(1),
                (F.pmod(F.col("doc_id"), F.lit(5)) * len(one_anchor)).cast("int"),
            ),
            F.lit("</body></html>"),
        ).alias("html"),
    )
    return with_html_stats(pages).drop("html")

def q134_domain_normalize(spark, sf_dir):
    """Per-domain score normalization (operators/pipeline.py::
    domain_score_normalize): in-domain percentile rank + exact
    fixed-point z-score — the calibration step between a quality
    scorer and a single GLOBAL keep threshold (score distributions
    differ per domain; thresholding raw scores over-selects easy
    domains). Scores synthesized deterministically (doc_id*37 % 1000
    / 1000) over the documents table's real source groups."""
    from raven_spark.operators.pipeline import domain_score_normalize

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (F.pmod(F.col("doc_id") * 37, F.lit(1000)).cast("double") / 1000.0).alias(
            "score"
        ),
    )
    return domain_score_normalize(d, group_col="source")

def q135_pseudonymize(spark, sf_dir):
    """Consistent PII pseudonymization (functions/pii.py::
    pseudonymize_pii): every email swapped for a STABLE keyed surrogate
    <EMAIL:k> (Horner fold of the lowercased address, Knuth-mixed) —
    referential integrity survives scrubbing (same author keeps the
    same surrogate across documents), the identity does not, and the
    surrogate alphabet has no '@' so the pass is idempotent. Emails
    planted deterministically: doc_id % 3 == 0 gets two (one
    mixed-case), == 1 gets a leading one, == 2 none."""
    from raven_spark.functions.pii import pseudonymize_pii

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    m1 = F.concat(
        F.lit("user"), (F.col("doc_id") % 40).cast("string"),
        F.lit("@mail"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example"),
    )
    m2 = F.concat(
        F.lit("Sec.Ond+tag@Host"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".org"),
    )
    t = F.coalesce(F.col("text"), F.lit(""))
    planted = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(t, F.lit(" contact "), m1, F.lit(" and "), m2, F.lit(" now")),
        )
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("from "), m1, F.lit(": "), t))
        .otherwise(t)
        .alias("text"),
    )
    return pseudonymize_pii(planted, space=1_000_000_000)

def q136_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility / compression profile per language
    (operators/pipeline.py::tokenizer_fertility): bytes, chars, words,
    BPE-ish subwords aggregated per lang with exact-bigint ratio
    denominators — the mixture diagnostic behind token-denominated
    budget math (q128/q60/q121 count tokens; fertility skew inflates a
    language's apparent share). One map-side-combinable aggregate;
    text never shuffles."""
    from raven_spark.operators.pipeline import tokenizer_fertility

    d = _t(spark, sf_dir, "documents").select("lang", "text")
    return tokenizer_fertility(d, group_col="lang")

def q137_corpus_diff(spark, sf_dir):
    """Snapshot-to-snapshot corpus diff (operators/snapshots.py::
    corpus_diff): classify every URL across two crawl generations as
    added / removed / changed / unchanged — the incremental-refresh
    primitive (re-process only the delta, dump-over-dump). Content
    identity is xxhash64 of the dedup-normalized text, so the full-
    outer join ships (url, 8 bytes) and text never shuffles. Synthetic
    generations: old = doc_id % 7 != 6, new = doc_id % 5 != 4, text
    revved (' v2') for doc_id % 3 == 0."""
    from raven_spark.operators.snapshots import corpus_diff

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("http://h"), (F.col("doc_id") % 13).cast("string"),
            F.lit(".ex/p/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.coalesce(F.col("text"), F.lit("")).alias("t"),
    )
    old = d.filter(F.col("doc_id") % 7 != 6).select("url", F.col("t").alias("text"))
    new = d.filter(F.col("doc_id") % 5 != 4).select(
        "url",
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.col("t"), F.lit(" v2")))
        .otherwise(F.col("t"))
        .alias("text"),
    )
    return corpus_diff(old, new)

def q138_neyman_allocation(spark, sf_dir):
    """Neyman-optimal stratified sample allocation (operators/
    sampling.py::neyman_allocation; Neyman 1934): n_h proportional to
    N_h * S_h — the minimum-variance way to spend a fixed eval/audit
    budget across strata (a homogeneous stratum needs few samples
    however big it is). Exact fixed-point moments (q134 discipline)
    feed the q83 two-level cumulative-rounding allocator, so integer
    allocations sum to exactly 1000. Strata = the documents table's
    source groups, audited variable = n_chars."""
    from raven_spark.operators.sampling import neyman_allocation

    d = _t(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("double").alias("len_score")
    )
    return neyman_allocation(
        d, group_col="source", value_col="len_score",
        total_samples=1000, n_buckets=8,
    )


def q139_winnow_overlap(spark, sf_dir):
    """Winnowing fingerprints + MOSS-style partial-overlap pairs
    (operators/dedup.py::winnow_overlap_pairs; Schleimer et al. SIGMOD
    2003): rightmost-min selection over char-8-gram Horner hashes in
    windows of 4 — guaranteed detection of any shared substring >=
    11 chars, bounded fingerprint density. Every third doc gets a
    planted shared quote (both engines append it identically), so the
    quote-bearing pairs must all surface. Oracle: full winnow replay in
    DuckDB list lambdas (slice/min/rightmost-position), the q130
    convention."""
    from raven_spark.operators.dedup import winnow_overlap_pairs

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 80)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.col("text"),
                    F.lit(" to be or not to be that is the question"),
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    return winnow_overlap_pairs(docs, k=8, window=4, min_shared=1, max_df=50)


def q140_incremental_dedup(spark, sf_dir):
    """Incremental dump-over-dump near-dup admission (operators/
    dedup.py::incremental_minhash_dedup): new snapshot docs probe the
    existing corpus's LSH band index (dup_of_corpus), survivors cluster
    among themselves (dup_of_new / kept). Corpus = docs < 120; new =
    docs 60-179 re-captured under ids +10000 (evens verbatim -> exact
    corpus dups; odds get a one-word refresh -> near corpus dups; 120+
    are fresh), plus ' v2' re-edits of every third fresh doc under ids
    +20000 -> intra-new dup pairs. Oracle: exact-Jaccard replay of the
    admission semantics (the q21 recall-1.0 premise at these planted
    J >= 0.9 levels with bands=8/rows=2) + the q21 recursive-CTE
    components for the survivor clustering."""
    from raven_spark.operators.dedup import incremental_minhash_dedup

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 120).select("doc_id", "text")
    recap = (
        docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 180))
        .select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.when(
                (F.col("doc_id") < 120) & (F.col("doc_id") % 2 == 1),
                F.concat(F.col("text"), F.lit(" refreshed")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    reedit = (
        docs.filter(
            (F.col("doc_id") >= 120)
            & (F.col("doc_id") < 180)
            & (F.col("doc_id") % 3 == 0)
        )
        .select(
            (F.col("doc_id") + 20000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" v2")).alias("text"),
        )
    )
    return incremental_minhash_dedup(corpus, recap.unionByName(reedit))


_Q141_NAV = (
    '<a href="/h">Home</a> <a href="/n">News</a> '
    '<a href="/s">Shop</a> <a href="/c">Contact</a>'
)


def q141_segment_blocks(spark, sf_dir):
    """In-page content/boilerplate segmentation (functions/text.py::
    segment_html_blocks; Kohlschütter WSDM 2010 features): block split
    at block-level tags, keep long link-sparse blocks, re-assemble main
    text — the within-page complement of cross-page host_boilerplate
    (q34). Pages synthesized deterministically from the documents
    table: nav + prose paragraph + variable div + footer (+ script for
    doc_id%3==0), so content and boilerplate both vary per row. Oracle:
    full replay in DuckDB list/struct lambdas with the same RE2-safe
    regexes (no backreferences)."""
    from raven_spark.functions.text import segment_html_blocks

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pages = d.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>x</title>"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("<script>var x=1;</script>")
            ).otherwise(F.lit("")),
            F.lit("</head><body><nav>"),
            F.lit(_Q141_NAV),
            F.lit("</nav><p>"),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("</p><div>"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 40),
            ).otherwise(F.lit("short")),
            F.lit("</div><footer>"),
            F.lit(_Q141_NAV),
            F.lit("</footer></body></html>"),
        ).alias("html"),
    )
    return segment_html_blocks(pages)


def q142_materialize_mixture(spark, sf_dir):
    """Mixture materialization (operators/sampling.py::
    materialize_mixture): per-source epoch factors become the physical
    training corpus — floor(e) whole copies per doc + one extra by the
    deterministic Knuth coin, so expectation hits the recipe exactly
    and re-runs reproduce the same corpus. Epochs derived per source by
    a fixed formula (0.4 + (idx%7)*0.45) so saturated (>1), fractional
    (<1) and mixed regimes all appear. Oracle: coin + copy-count replay
    with generate_series."""
    from raven_spark.operators.sampling import materialize_mixture

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    epochs = (
        d.select("source")
        .distinct()
        .select(
            "source",
            (
                F.lit(0.4)
                + F.pmod(
                    F.substring("source", 4, 10).cast("int"), F.lit(7)
                ).cast("double")
                * F.lit(0.45)
            ).alias("epochs"),
        )
    )
    return materialize_mixture(d, epochs)


def q143_cluster_balanced_sample(spark, sf_dir):
    """Diversity-balanced sampling over content clusters (operators/
    sampling.py::cluster_balanced_sample): sign-LSH code over the
    embedding (q96's Knuth projection) buckets docs into 16 content
    clusters; the sample budget allocates across clusters by
    sqrt(size) through the q83 exact allocator; each cluster's quota
    fills by deterministic coin rank behind a replayable prefilter.
    Oracle: projection + code + allocator + prefilter + rank, all
    replayed (sqrt is IEEE-exact in both engines — the reason the
    default alpha earns a bit-exact oracle)."""
    from raven_spark.operators.sampling import cluster_balanced_sample

    return cluster_balanced_sample(
        _t(spark, sf_dir, "embeddings"), total=100, n_planes=4, alpha_pct=50
    )


def q144_winnow_spans(spark, sf_dir):
    """Shared-span localization (operators/dedup.py::
    winnow_shared_spans): matched winnow fingerprints grouped by
    diagonal (pos_a - pos_b) and gap-merged into the char ranges two
    docs actually share — the MOSS report stage as relational algebra.
    Same planted-quote corpus as q139, so every quote-bearing pair
    must localize the quote region. Oracle: the q139 winnow replay
    extended with positions + a lag/flag/sum islands pass."""
    from raven_spark.operators.dedup import winnow_shared_spans

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 80)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.col("text"),
                    F.lit(" to be or not to be that is the question"),
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    return winnow_shared_spans(docs, k=8, window=4, min_fps=2, max_df=50)


def q145_mime_sniff(spark, sf_dir):
    """Payload magic-byte sniffing vs declared Content-Type
    (functions/mime.py::payload_mime_report) — the payload-truth
    extension of the reference's header-trusting MIME resolution
    (mime.rs C1): servers lie, and routing by declared type mis-shards
    a multimodal corpus. Payloads synthesized deterministically from
    documents (magic prefix by doc_id%6 + utf-8 text bytes), declared
    types by doc_id%3 with planted lies. Oracle: hex-prefix replay of
    the same public magic table."""
    from raven_spark.functions.mime import payload_mime_report

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    prefix = (
        F.when(F.col("doc_id") % 6 == 0, F.lit("89504E470D0A1A0A"))
        .when(F.col("doc_id") % 6 == 1, F.lit("FFD8FFE0"))
        .when(F.col("doc_id") % 6 == 2, F.lit("25504446"))
        .when(F.col("doc_id") % 6 == 3, F.lit("1F8B08"))
        .when(F.col("doc_id") % 6 == 4, F.lit("3C21444F43545950"))
        .otherwise(F.lit(""))
    )
    declared = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("text/html; charset=utf-8"))
        .otherwise(F.lit(None).cast("string"))
    )
    pages = d.select(
        "doc_id",
        F.concat(
            F.unhex(prefix),
            F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8"),
        ).alias("payload"),
        declared.alias("ct"),
    )
    return payload_mime_report(pages, declared_col="ct")


def q146_mixture_diversity(spark, sf_dir):
    """Corpus diversity/concentration profile (operators/pipeline.py::
    mixture_diversity): effective number of sources (exp-entropy), HHI,
    head shares — the monitoring twin of the mixture shapers
    (q109/q121/q128), token-mass-weighted over documents.n_chars.
    Fixed-point term sums keep the one-row profile
    partition-order-exact; oracle replays shares + entropy with
    HUGEINT fixed-point sums."""
    from raven_spark.operators.pipeline_lexical import mixture_diversity

    return mixture_diversity(
        _t(spark, sf_dir, "documents"), group_col="source", size_col="n_chars"
    )


def q147_link_reciprocity(spark, sf_dir):
    """Per-node link reciprocity (operators/graph.py::
    link_reciprocity) — the nepotism/link-farm demotion signal: the
    q36 synthetic edge set plus planted reverse edges for src%4==0, so
    rings and chains both appear. Oracle: swapped-key self-join
    replay."""
    from raven_spark.operators.graph import link_reciprocity

    d = _t(spark, sf_dir, "documents")
    n = d.count()
    e = _synthetic_link_edges(d, n)
    extra = e.filter(F.col("src") % 4 == 0).select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return link_reciprocity(e.unionByName(extra))


def q148_langid_confusion(spark, sf_dir):
    """Language-ID confusion matrix vs the labeled lang column
    (functions/text.py::langid_confusion) — the early-alarm contract
    for the classifier every per-language mixture decision keys on.
    Oracle: the q11 score replay + two grouped rollups."""
    from raven_spark.functions.text import langid_confusion

    return langid_confusion(_t(spark, sf_dir, "documents"))


def q149_page_directives(spark, sf_dir):
    """In-page indexing directives (functions/urls.py::
    page_directives): meta-robots noindex/nofollow, rel=canonical and
    hreflang alternates — the page-level counterpart of the robots.txt
    gate, feeding corpus admission (noindex), discovery (nofollow),
    URL identity (canonical) and bitext candidates (hreflang). Pages
    synthesized from documents with directives planted by doc_id%4.
    Oracle: same RE2-safe regexes replayed."""
    from raven_spark.functions.urls import page_directives

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    body = F.concat(F.lit("</head><body>"), F.coalesce("text", F.lit("")), F.lit("</body></html>"))
    pages = d.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>t</title>"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit('<META NAME=robots CONTENT="noindex, nofollow">'),
            )
            .when(
                F.col("doc_id") % 4 == 1,
                F.concat(
                    F.lit('<link rel="canonical" href="https://ex'),
                    (F.col("doc_id") % 7).cast("string"),
                    F.lit(".com/canon/"),
                    F.col("doc_id").cast("string"),
                    F.lit('">'),
                ),
            )
            .when(
                F.col("doc_id") % 4 == 2,
                F.concat(
                    F.lit('<link rel="alternate" hreflang="fr" href="/fr">'),
                    F.when(
                        F.col("doc_id") % 8 == 2,
                        F.lit('<link hreflang="de-AT" rel="alternate" href="/de">'),
                    ).otherwise(F.lit("")),
                ),
            )
            .otherwise(F.lit("")),
            body,
        ).alias("html"),
    )
    return page_directives(pages)


def q150_canonical_override(spark, sf_dir):
    """Canonical-identity override (functions/urls.py::
    apply_canonical_override): capture URLs re-key onto their same-host
    rel=canonical target through the engine's RFC-3986 canonicalizer —
    tracking-param captures collapse pre-hash, cross-host canonicals
    are rejected (vouching rule). Synthesized captures carry unsorted
    params + mixed-case hosts so the canonicalizer visibly participates;
    doc_id%3 plants same-host overrides, cross-host rejects, and
    no-canonical rows. Oracle: the canonicalization outcome (lowercase
    host, sorted query) written out directly, q15 style."""
    from raven_spark.functions.urls import apply_canonical_override

    d = _t(spark, sf_dir, "documents").select("doc_id")
    h = (F.col("doc_id") % 7).cast("string")
    i = F.col("doc_id").cast("string")
    pages = d.select(
        F.concat(
            F.lit("https://Host"), h, F.lit(".example/p/"), i, F.lit("?b=2&a=1")
        ).alias("url"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("https://host"), h, F.lit(".example/p/"), i),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("https://other.example/p/"), i),
        )
        .alias("canonical"),
    )
    return apply_canonical_override(pages)


def q151_curation_funnel(spark, sf_dir):
    """END-TO-END curation funnel (operators/pipeline.py::
    curation_funnel): C4 clean -> langid -> quality -> exact dedup ->
    benchmark decontamination as ONE composed job over the q62 built
    pages, with exact per-stage attrition rows. Stages 5-6 need joins
    (a dedup verdict depends on which other docs survived), so this is
    the integration q88's per-row flag funnel cannot express. Corpus =
    built docs %13 != 0, bench = %13 == 0 (the q35 split). Oracle:
    the q62 + q11 + q12 + q09 + q35 replays CHAINED, counts unioned."""
    from raven_spark.operators.pipeline_funnel import curation_funnel

    pages = _c4_line_text(_t(spark, sf_dir, "documents"))
    corpus = pages.filter(F.col("doc_id") % 13 != 0)
    bench = pages.filter(F.col("doc_id") % 13 == 0)
    return curation_funnel(
        corpus, bench, lang_keep=("en",), min_quality=0.3, badwords=("badword",)
    )


def q152_curated_corpus(spark, sf_dir):
    """The curation funnel's SURVIVING corpus (curation_funnel
    emit="docs"): the exact (doc_id, clean_text) rows q151's final
    stage counts — the artifact a training run actually consumes.
    Oracle: the q151 chain emitting k5 survivors instead of counts."""
    from raven_spark.operators.pipeline_funnel import curation_funnel

    pages = _c4_line_text(_t(spark, sf_dir, "documents"))
    corpus = pages.filter(F.col("doc_id") % 13 != 0)
    bench = pages.filter(F.col("doc_id") % 13 == 0)
    return curation_funnel(
        corpus,
        bench,
        lang_keep=("en",),
        min_quality=0.3,
        badwords=("badword",),
        emit="docs",
    )


def q153_unigram_lm(spark, sf_dir):
    """Distributed unigram-LM tokenizer training (operators/tokenizer.py
    ::unigram_lm_train; Kudo 2018 — SentencePiece's default trainer,
    the pair of q98's BPE half): seed vocab = top substrings (+ all
    single chars, the required-character rule), then 2 hard-EM rounds —
    Viterbi segmentation of every distinct word under integer
    fixed-point ln-scores (ties: max score, then longest piece), usage
    counts, prune to top vocab, rescore. Every step is joins/aggregates
    with bigint scores, so the DuckDB twin replays the DP bit-exactly
    via unrolled per-position CTEs."""
    from raven_spark.operators.tokenizer import unigram_lm_train

    d = _t(spark, sf_dir, "documents").select("text")
    return unigram_lm_train(
        d,
        vocab_size=120,
        seed_size=150,
        max_piece_len=3,
        max_word_len=10,
        rounds=2,
    )


def q154_unigram_segment(spark, sf_dir):
    """APPLY the q153-trained unigram vocabulary to the corpus
    (operators/tokenizer.py::unigram_segment) — the inference half,
    i.e. the op that actually touches every byte at 100 TB: distinct
    words Viterbi-segment ONCE under the fixed-point scores, results
    broadcast back onto the doc word streams; per-doc (n_words, n_oov,
    n_pieces, sum_score_fp). Words over the 10-char training cap (and
    any unreachable word) count as OOV, never drop. Oracle: the q153
    chain plus one more unrolled DP pass over the final vocab and the
    same per-doc aggregation."""
    from raven_spark.operators.tokenizer import unigram_lm_train, unigram_segment

    d = _t(spark, sf_dir, "documents")
    vocab = unigram_lm_train(
        d.select("text"),
        vocab_size=120,
        seed_size=150,
        max_piece_len=3,
        max_word_len=10,
        rounds=2,
    )
    return unigram_segment(
        d.select("doc_id", "text"), vocab, max_piece_len=3, max_word_len=10
    )


def q155_bpe_encode(spark, sf_dir):
    """APPLY learned BPE merges to the corpus (operators/tokenizer.py::
    bpe_encode) — q98's inference half: the 3 learned merge rules fold
    over each distinct word's separator-encoded symbols (train and
    apply share one fusing semantics), per-doc (n_words, n_tokens,
    n_chars). Oracle: the q98 unrolled merge replay with the word
    column retained, applied and aggregated per doc."""
    from raven_spark.operators.pipeline import bpe_merges
    from raven_spark.operators.tokenizer import bpe_encode

    d = _t(spark, sf_dir, "documents")
    rules = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_merges(d.select("text"), steps=3).orderBy("step").collect()
    ]
    return bpe_encode(d.select("doc_id", "text"), rules)


def q156_kmv_sketch_only(spark, sf_dir):
    """The PRODUCTION form of q111's KMV mirror detector
    (operators/dedup.py::kmv_mirror_pairs, audit=False): sketch-only —
    the exact-Jaccard audit columns (full per-host key-set joins) are
    gone from output AND plan (the only self-join left is over the
    k-row bottom-k sketches; join-count plan-asserted in
    test_sketch_ops.py). Oracle: the q111 replay truncated at the
    merged-bottom-k estimate."""
    from raven_spark.operators.dedup import kmv_mirror_pairs

    d = _t(spark, sf_dir, "documents")
    host = F.concat(F.lit("h"), F.pmod(F.col("doc_id"), F.lit(4)).cast("string"))
    return kmv_mirror_pairs(d, host, shingle_n=3, k=32, audit=False)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q02_revenue_by_nation": q02_revenue_by_nation,
        "q03_top_events_per_user": q03_top_events_per_user,
        "q04_running_value": q04_running_value,
        "q05_customers_without_orders": q05_customers_without_orders,
        "q06_region_priority_grid": q06_region_priority_grid,
        "q07_range_expansion": q07_range_expansion,
        "q08_date_rollup": q08_date_rollup,
        "q09_exact_dedup": q09_exact_dedup,
        "q10_ngram_jaccard": q10_ngram_jaccard,
        "q11_lang_id": q11_lang_id,
        "q12_quality": q12_quality,
        "q13_token_counts": q13_token_counts,
        "q14_fingerprint": q14_fingerprint,
        "q15_url_canonicalize": q15_url_canonicalize,
        "q16_politeness_budget": q16_politeness_budget,
        "q17_url_seen_subtract": q17_url_seen_subtract,
        "q18_ann_topk": q18_ann_topk,
        "q19_embedding_neardup": q19_embedding_neardup,
        "q20_multimodal_roundtrip": q20_multimodal_roundtrip,
        "q21_minhash_dedup": q21_minhash_dedup,
        "q22_simhash_buckets": q22_simhash_buckets,
        "q23_lsh_topk": q23_lsh_topk,
        "q24_crawl_round": q24_crawl_round,
        "q25_media_features": q25_media_features,
        "q26_task_expansion": q26_task_expansion,
        "q27_sessionize": q27_sessionize,
        "q28_robots_gate": q28_robots_gate,
        "q29_post_round": q29_post_round,
        "q30_hash_split": q30_hash_split,
        "q31_dup_ngram_frac": q31_dup_ngram_frac,
        "q32_clean_corpus": q32_clean_corpus,
        "q33_brand_revenue_by_nation": q33_brand_revenue_by_nation,
        "q34_host_boilerplate": q34_host_boilerplate,
        "q35_contamination": q35_contamination,
        "q36_link_pagerank": q36_link_pagerank,
        "q37_snapshot_dedup": q37_snapshot_dedup,
        "q38_pii_scrub": q38_pii_scrub,
        "q39_url_seen_cuckoo": q39_url_seen_cuckoo,
        "q40_asof_join": q40_asof_join,
        "q41_stratified_sample": q41_stratified_sample,
        "q42_host_reputation": q42_host_reputation,
        "q43_sitemap_ingest": q43_sitemap_ingest,
        "q44_unicode_norm": q44_unicode_norm,
        "q45_surt_keys": q45_surt_keys,
        "q46_pack_chunks": q46_pack_chunks,
        "q47_dedup_within_doc": q47_dedup_within_doc,
        "q48_unigram_logprob": q48_unigram_logprob,
        "q49_corpus_stats": q49_corpus_stats,
        "q50_trap_scores": q50_trap_scores,
        "q51_quality_classifier": q51_quality_classifier,
        "q52_warc_roundtrip": q52_warc_roundtrip,
        "q53_cdx_random_access": q53_cdx_random_access,
        "q54_warc_revisit": q54_warc_revisit,
        "q55_gopher_rules": q55_gopher_rules,
        "q56_warc_dedup_roundtrip": q56_warc_dedup_roundtrip,
        "q57_wet_roundtrip": q57_wet_roundtrip,
        "q58_wat_links": q58_wat_links,
        "q59_ccnet_buckets": q59_ccnet_buckets,
        "q60_mixture_sample": q60_mixture_sample,
        "q61_recrawl_schedule": q61_recrawl_schedule,
        "q62_c4_filters": q62_c4_filters,
        "q63_line_dedup": q63_line_dedup,
        "q64_url_filter": q64_url_filter,
        "q65_dup_spans": q65_dup_spans,
        "q66_sitemap_entries": q66_sitemap_entries,
        "q67_tfidf_topk": q67_tfidf_topk,
        "q68_bigram_logprob": q68_bigram_logprob,
        "q69_anchor_profile": q69_anchor_profile,
        "q70_hits": q70_hits,
        "q71_registered_domain": q71_registered_domain,
        "q72_domain_rollup": q72_domain_rollup,
        "q73_bitext_margin": q73_bitext_margin,
        "q74_bm25_topk": q74_bm25_topk,
        "q75_dsir_select": q75_dsir_select,
        "q76_semdedup": q76_semdedup,
        "q77_soft_dedup": q77_soft_dedup,
        "q78_cdc_chunks": q78_cdc_chunks,
        "q79_phrase_search": q79_phrase_search,
        "q80_containment": q80_containment,
        "q81_shard_corpus": q81_shard_corpus,
        "q82_script_profile": q82_script_profile,
        "q83_domain_budget": q83_domain_budget,
        "q84_connected_components": q84_connected_components,
        "q85_weighted_sample": q85_weighted_sample,
        "q86_heavy_hitters": q86_heavy_hitters,
        "q87_neighborhood_function": q87_neighborhood_function,
        "q88_filter_funnel": q88_filter_funnel,
        "q89_term_dictionary": q89_term_dictionary,
        "q90_quantize_embeddings": q90_quantize_embeddings,
        "q91_pmi_collocations": q91_pmi_collocations,
        "q92_stuffing_signals": q92_stuffing_signals,
        "q93_url_templates": q93_url_templates,
        "q94_readability": q94_readability,
        "q95_kmeans": q95_kmeans,
        "q96_random_projection": q96_random_projection,
        "q97_domain_graph": q97_domain_graph,
        "q98_bpe_merges": q98_bpe_merges,
        "q99_content_drift": q99_content_drift,
        "q100_domain_split": q100_domain_split,
        "q101_kwic_snippets": q101_kwic_snippets,
        "q102_template_admission": q102_template_admission,
        "q103_approx_distinct": q103_approx_distinct,
        "q104_trustrank": q104_trustrank,
        "q105_adaptive_budget": q105_adaptive_budget,
        "q106_quantile_contract": q106_quantile_contract,
        "q107_cms_frequency": q107_cms_frequency,
        "q108_pq_encode": q108_pq_encode,
        "q109_doremi": q109_doremi,
        "q110_term_drift": q110_term_drift,
        "q111_kmv_mirrors": q111_kmv_mirrors,
        "q112_opic": q112_opic,
        "q113_zipf_fit": q113_zipf_fit,
        "q114_good_turing": q114_good_turing,
        "q115_priority_schedule": q115_priority_schedule,
        "q116_domain_diversity": q116_domain_diversity,
        "q117_revisit_schedule": q117_revisit_schedule,
        "q118_term_burstiness": q118_term_burstiness,
        "q119_crawl_saturation": q119_crawl_saturation,
        "q120_shard_skew": q120_shard_skew,
        "q121_temperature_mix": q121_temperature_mix,
        "q122_ks_length_drift": q122_ks_length_drift,
        "q123_bloom_contract": q123_bloom_contract,
        "q124_cocitation": q124_cocitation,
        "q125_retrieval_metrics": q125_retrieval_metrics,
        "q126_redirect_resolution": q126_redirect_resolution,
        "q127_mirror_hosts": q127_mirror_hosts,
        "q128_token_budget": q128_token_budget,
        "q129_calibration": q129_calibration,
        "q130_minhash_contract": q130_minhash_contract,
        "q131_train_classifier": q131_train_classifier,
        "q132_chunk_documents": q132_chunk_documents,
        "q133_html_stats": q133_html_stats,
        "q134_domain_normalize": q134_domain_normalize,
        "q135_pseudonymize": q135_pseudonymize,
        "q136_tokenizer_fertility": q136_tokenizer_fertility,
        "q137_corpus_diff": q137_corpus_diff,
        "q138_neyman_allocation": q138_neyman_allocation,
        "q139_winnow_overlap": q139_winnow_overlap,
        "q140_incremental_dedup": q140_incremental_dedup,
        "q141_segment_blocks": q141_segment_blocks,
        "q142_materialize_mixture": q142_materialize_mixture,
        "q143_cluster_balanced_sample": q143_cluster_balanced_sample,
        "q144_winnow_spans": q144_winnow_spans,
        "q145_mime_sniff": q145_mime_sniff,
        "q146_mixture_diversity": q146_mixture_diversity,
        "q147_link_reciprocity": q147_link_reciprocity,
        "q148_langid_confusion": q148_langid_confusion,
        "q149_page_directives": q149_page_directives,
        "q150_canonical_override": q150_canonical_override,
        "q151_curation_funnel": q151_curation_funnel,
        "q152_curated_corpus": q152_curated_corpus,
        "q153_unigram_lm": q153_unigram_lm,
        "q154_unigram_segment": q154_unigram_segment,
        "q155_bpe_encode": q155_bpe_encode,
        "q156_kmv_sketch_only": q156_kmv_sketch_only,
    }


# ---------------------------------------------------------------------------
# oracles (DuckDB SQL on pre-registered views)
# ---------------------------------------------------------------------------

def _lang_scores_sql() -> str:
    from raven_spark.functions.text import LANG_MARKERS

    pieces = []
    for code, markers in sorted(LANG_MARKERS.items()):
        terms = " + ".join(
            f"CAST((length(p) - length(replace(p, '{mk}', '')))/{len(mk)} AS INT)"
            for mk in markers
        )
        pieces.append(f"({terms}) AS s_{code}")
    return ", ".join(pieces)


def _unigram_lm_sql(
    vocab_size: int = 120,
    seed_size: int = 150,
    max_piece_len: int = 3,
    max_word_len: int = 10,
    rounds: int = 2,
    emit: str = "vocab",
) -> str:
    """Generate the DuckDB replay of unigram_lm_train (q153): the
    Viterbi DP is unrolled as one CTE per word position (dp{r}_{j} +
    cumulative dpa{r}_{j}), the backtrack as one CTE per step, and the
    M-step prune/rescore mirrors the engine's TakeOrdered + ln
    fixed-point convention exactly (all-integer DP; ties max score then
    min start index via the window ORDER BY)."""
    L = int(max_word_len)
    parts = [
        f"""
        WITH wn AS MATERIALIZED (
          SELECT word, CAST(count(*) AS BIGINT) AS f, length(word) AS n
          FROM (
            SELECT unnest(string_split(regexp_replace(lower(trim(text)),
                     '\\s+', ' ', 'g'), ' ')) AS word
            FROM documents WHERE text IS NOT NULL
          )
          WHERE length(word) BETWEEN 1 AND {L}
          GROUP BY word
        ),
        subs AS MATERIALIZED (
          SELECT word, f, n, i, i + l AS j, substr(word, i + 1, l) AS piece
          FROM (
            SELECT word, f, n, i,
                   unnest(generate_series(1, least({int(max_piece_len)}, n - i))) AS l
            FROM (
              SELECT word, f, n, unnest(generate_series(0, n - 1)) AS i
              FROM wn
            )
          )
        ),
        sc AS MATERIALIZED (SELECT piece, CAST(sum(f) AS BIGINT) AS c FROM subs GROUP BY piece),
        chars AS (SELECT piece FROM sc WHERE length(piece) = 1),
        seedkept AS (
          SELECT DISTINCT piece FROM (
            (SELECT piece FROM sc ORDER BY c DESC, piece ASC
             LIMIT {int(seed_size)})
            UNION ALL (SELECT piece FROM chars)
          )
        ),
        seedc AS MATERIALIZED (SELECT s.piece, s.c FROM sc s JOIN seedkept USING (piece)),
        vocab0 AS MATERIALIZED (
          SELECT piece, c,
                 CAST(round(ln(c * 1.0 / (SELECT sum(c) FROM seedc)) * 1e6)
                      AS BIGINT) AS s
          FROM seedc
        )"""
    ]
    for r in range(1, int(rounds) + 1):
        parts.append(f""",
        edges{r} AS MATERIALIZED (
          SELECT sub.word, sub.i, sub.j, v.s, sub.piece
          FROM subs sub JOIN vocab{r - 1} v USING (piece)
        ),
        dpa{r}_0 AS MATERIALIZED (
          SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS b, 0 AS bi, '' AS bp
          FROM wn
        )""")
        for j in range(1, L + 1):
            parts.append(f""",
        dp{r}_{j} AS (
          SELECT word, {j} AS pos, b, bi, bp FROM (
            SELECT e.word, d.b + e.s AS b, e.i AS bi, e.piece AS bp,
                   row_number() OVER (PARTITION BY e.word
                                      ORDER BY (d.b + e.s) DESC, e.i ASC) AS rk
            FROM edges{r} e JOIN dpa{r}_{j - 1} d
              ON d.word = e.word AND d.pos = e.i
            WHERE e.j = {j}
          ) WHERE rk = 1
        ),
        dpa{r}_{j} AS MATERIALIZED (
          SELECT * FROM dpa{r}_{j - 1} UNION ALL SELECT * FROM dp{r}_{j}
        )""")
        parts.append(f""",
        bt{r}_0 AS MATERIALIZED (SELECT word, f, n AS pos FROM wn)""")
        for t in range(1, L + 1):
            parts.append(f""",
        bt{r}_{t} AS MATERIALIZED (
          SELECT b.word, b.f, d.bi AS pos, d.bp AS piece
          FROM bt{r}_{t - 1} b JOIN dpa{r}_{L} d
            ON d.word = b.word AND d.pos = b.pos
          WHERE b.pos > 0
        )""")
        unions = "\n            UNION ALL ".join(
            f"SELECT piece, f FROM bt{r}_{t}" for t in range(1, L + 1)
        )
        parts.append(f""",
        used{r} AS MATERIALIZED (
          SELECT piece, CAST(sum(f) AS BIGINT) AS c FROM (
            {unions}
          ) GROUP BY piece
        ),
        keep{r} AS (
          SELECT DISTINCT piece FROM (
            (SELECT piece FROM used{r}
             ORDER BY c DESC, piece ASC LIMIT {int(vocab_size)})
            UNION ALL (SELECT piece FROM chars)
          )
        ),
        cnt{r} AS MATERIALIZED (
          SELECT k.piece, CAST(coalesce(u.c, 0) AS BIGINT) AS c
          FROM keep{r} k LEFT JOIN used{r} u USING (piece)
        ),
        vocab{r} AS MATERIALIZED (
          SELECT piece, c,
                 CASE WHEN c > 0
                      THEN CAST(round(ln(c * 1.0 /
                             (SELECT sum(c) FROM cnt{r})) * 1e6) AS BIGINT)
                      ELSE CAST(-40000000 AS BIGINT) END AS s
          FROM cnt{r}
        )""")
    if emit == "vocab":
        parts.append(f"""
        SELECT CAST(row_number() OVER (ORDER BY c DESC, piece ASC) AS INT)
                 AS rank,
               piece, c AS n_count, s AS score_fp
        FROM vocab{int(rounds)}
    """)
        return "".join(parts)
    if emit != "segment":
        raise ValueError(f"_unigram_lm_sql: unknown emit {emit!r}")
    # inference tail (q154): one more DP pass over the FINAL vocab, then
    # per-doc aggregation; words over the length cap or with no path
    # LEFT-join to NULL and count as OOV — exactly unigram_segment's
    # contract
    R = int(rounds)
    parts.append(f""",
        edgesS AS MATERIALIZED (
          SELECT sub.word, sub.i, sub.j, v.s, sub.piece
          FROM subs sub JOIN vocab{R} v USING (piece)
        ),
        dpaS_0 AS MATERIALIZED (
          SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS b, 0 AS bi, '' AS bp
          FROM wn
        )""")
    for j in range(1, L + 1):
        parts.append(f""",
        dpS_{j} AS MATERIALIZED (
          SELECT word, {j} AS pos, b, bi, bp FROM (
            SELECT e.word, d.b + e.s AS b, e.i AS bi, e.piece AS bp,
                   row_number() OVER (PARTITION BY e.word
                                      ORDER BY (d.b + e.s) DESC, e.i ASC) AS rk
            FROM edgesS e JOIN dpaS_{j - 1} d
              ON d.word = e.word AND d.pos = e.i
            WHERE e.j = {j}
          ) WHERE rk = 1
        ),
        dpaS_{j} AS MATERIALIZED (
          SELECT * FROM dpaS_{j - 1} UNION ALL SELECT * FROM dpS_{j}
        )""")
    parts.append(""",
        btS_0 AS MATERIALIZED (SELECT word, n AS pos FROM wn)""")
    for t in range(1, L + 1):
        parts.append(f""",
        btS_{t} AS MATERIALIZED (
          SELECT b.word, d.bi AS pos
          FROM btS_{t - 1} b JOIN dpaS_{L} d
            ON d.word = b.word AND d.pos = b.pos
          WHERE b.pos > 0
        )""")
    unions = "\n            UNION ALL ".join(
        f"SELECT word FROM btS_{t}" for t in range(1, L + 1)
    )
    parts.append(f""",
        wseg AS MATERIALIZED (
          SELECT w.word, cnt.np, fin.b AS tot
          FROM wn w
          JOIN (SELECT word, CAST(count(*) AS BIGINT) AS np FROM (
            {unions}
          ) GROUP BY word) cnt USING (word)
          JOIN dpaS_{L} fin ON fin.word = w.word AND fin.pos = w.n
        ),
        docw AS MATERIALIZED (
          SELECT doc_id, word FROM (
            SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)),
                     '\\s+', ' ', 'g'), ' ')) AS word
            FROM documents WHERE text IS NOT NULL
          ) WHERE length(word) >= 1
        ),
        perdoc AS MATERIALIZED (
          SELECT d.doc_id,
                 CAST(count(*) AS BIGINT) AS n_words,
                 CAST(sum(CASE WHEN s.np IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_oov,
                 CAST(coalesce(sum(s.np), 0) AS BIGINT) AS n_pieces,
                 CAST(coalesce(sum(s.tot), 0) AS BIGINT) AS sum_score_fp
          FROM docw d LEFT JOIN wseg s USING (word)
          GROUP BY d.doc_id
        )
        SELECT doc.doc_id AS id,
               CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
               CAST(coalesce(p.n_oov, 0) AS BIGINT) AS n_oov,
               CAST(coalesce(p.n_pieces, 0) AS BIGINT) AS n_pieces,
               CAST(coalesce(p.sum_score_fp, 0) AS BIGINT) AS sum_score_fp
        FROM documents doc LEFT JOIN perdoc p ON p.doc_id = doc.doc_id
    """)
    return "".join(parts)


def _bpe_encode_sql(steps: int = 3) -> str:
    """q155: learn ``steps`` BPE merges (the q98 unrolled replay, word
    column retained) and APPLY them — per-word post-merge token counts
    joined back onto the per-doc word streams."""
    parts = [r"""
        WITH w AS MATERIALIZED (
          SELECT word, CAST(count(*) AS BIGINT) AS f FROM (
            SELECT unnest(list_filter(string_split(
                     regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                     ' '), x -> x <> '' AND NOT contains(x, chr(31)))) AS word
            FROM documents WHERE text IS NOT NULL) GROUP BY word
        ),
        v0 AS MATERIALIZED (
          SELECT word,
                 chr(31) || array_to_string(list_transform(
                   range(1, length(word) + 1), i -> word[i]),
                   chr(31) || chr(31)) || chr(31) AS sym, f
          FROM w
        )"""]
    for k in range(1, int(steps) + 1):
        parts.append(f""",
        c{k} AS MATERIALIZED (
          SELECT pr, sum(f) AS c FROM (
            SELECT unnest(list_transform(generate_series(1, len(a) - 1),
                     i -> a[i] || chr(30) || a[i + 1])) AS pr, f
            FROM (SELECT string_split(substr(sym, 2, length(sym) - 2),
                                      chr(31) || chr(31)) AS a, f
                  FROM v{k - 1})
            WHERE len(a) >= 2) GROUP BY pr
        ),
        b{k} AS MATERIALIZED (
          SELECT string_split(pr, chr(30))[1] AS l,
                 string_split(pr, chr(30))[2] AS r, c
          FROM c{k} ORDER BY c DESC, l ASC, r ASC LIMIT 1
        ),
        v{k} AS MATERIALIZED (
          SELECT word,
                 replace(sym,
                         (SELECT chr(31) || l || chr(31) || chr(31)
                                 || r || chr(31) FROM b{k}),
                         (SELECT chr(31) || l || r || chr(31) FROM b{k}))
                   AS sym, f FROM v{k - 1}
        )""")
    parts.append(rf""",
        wtok AS MATERIALIZED (
          SELECT word,
                 CAST(len(string_split(substr(sym, 2, length(sym) - 2),
                                       chr(31) || chr(31))) AS BIGINT) AS nt,
                 CAST(length(word) AS BIGINT) AS nc
          FROM v{int(steps)}
        ),
        docw AS MATERIALIZED (
          SELECT doc_id, word FROM (
            SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)),
                     '\s+', ' ', 'g'), ' ')) AS word
            FROM documents WHERE text IS NOT NULL
          ) WHERE word <> '' AND NOT contains(word, chr(31))
        ),
        perdoc AS MATERIALIZED (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_words,
                 CAST(sum(nt) AS BIGINT) AS n_tokens,
                 CAST(sum(nc) AS BIGINT) AS n_chars
          FROM docw JOIN wtok USING (word) GROUP BY doc_id
        )
        SELECT d.doc_id AS id,
               CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
               CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(p.n_chars, 0) AS BIGINT) AS n_chars
        FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
    """)
    return "".join(parts)


def _stopword_hits_sql() -> str:
    from raven_spark.functions.text import STOPWORDS

    return " + ".join(
        f"CAST((length(p) - length(replace(p, ' {sw} ', '')))/{len(sw) + 2} AS INT)"
        for sw in STOPWORDS
    )


def _gopher_hits_sql() -> str:
    """Replay of gopher_rules_cols's required-word regexes: one
    CAST(bool AS INT) per word so NULL text propagates (CASE WHEN would
    coerce NULL to 0 and break parity)."""
    from raven_spark.functions.text import GOPHER_REQUIRED_WORDS

    return " + ".join(
        "CAST(regexp_matches(lower(text), "
        f"'(^|[^a-z]){sw}([^a-z]|$)') AS INT)"
        for sw in GOPHER_REQUIRED_WORDS
    )


# q21: clusters == connected components of the exact Jaccard>=0.5 pair
# graph (see q21_minhash_dedup docstring). Word 3-gram shingles replayed
# with list lambdas; components via a recursive min-label CTE.
Q21_ORACLE = r"""
WITH RECURSIVE norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS n FROM documents
), g AS (
  SELECT doc_id,
         CASE WHEN len(string_split(n, ' ')) >= 3
              THEN list_distinct(list_transform(generate_series(1, len(string_split(n,' '))-2),
                     i -> string_split(n,' ')[i] || ' ' || string_split(n,' ')[i+1] || ' ' || string_split(n,' ')[i+2]))
              ELSE [n] END AS grams
  FROM norm
), e0 AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        / greatest(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)), 1) >= 0.5
), edges AS (
  SELECT ia, ib FROM e0 UNION ALL SELECT ib AS ia, ia AS ib FROM e0
), walk(id, rep) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.ia, w.rep FROM edges e JOIN walk w ON w.id = e.ib
)
SELECT id AS doc_id, min(rep) AS cluster_id FROM walk GROUP BY id
"""


# q22: the SimHash kernel replayed byte-for-byte — FNV-1a 64 per token
# (HUGEINT modular fold over UTF-8 bytes extracted via hex()), weighted
# 64 bit-planes, sign -> signature, 8x8-bit band keys.
_Q22_BYTES = """list_transform(generate_series(1, octet_length(encode(t))), i ->
   (strpos('123456789ABCDEF', substr(hex(encode(t)), 2*i-1, 1))*16 +
    strpos('123456789ABCDEF', substr(hex(encode(t)), 2*i, 1)))::HUGEINT)"""
_Q22_FNV = f"""list_reduce(list_prepend(14695981039346656037::HUGEINT, {_Q22_BYTES}), (acc, b) ->
     ((acc - (acc % 256::HUGEINT) + xor((acc % 256::HUGEINT)::BIGINT, b::BIGINT)::HUGEINT)
       * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)"""
Q22_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS t
  FROM documents
), hashed AS (
  SELECT doc_id, {_Q22_FNV} AS h FROM toks WHERE t <> ''
), bits AS (
  SELECT doc_id, bit,
         SUM(CASE WHEN (h // (1::HUGEINT << bit)) % 2 = 1 THEN 1 ELSE -1 END) AS w
  FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit)
  GROUP BY doc_id, bit
), sigs AS (
  SELECT d.doc_id,
         COALESCE((SELECT SUM(1::HUGEINT << bit) FROM bits b
                   WHERE b.doc_id = d.doc_id AND b.w > 0), 0::HUGEINT) AS sig
  FROM documents d
)
SELECT doc_id AS id,
       CAST(CASE WHEN sig >= (1::HUGEINT << 63) THEN sig - (1::HUGEINT << 64) ELSE sig END AS BIGINT) AS simhash,
       CAST(band_id AS INT) AS band_id,
       CAST((sig // (1::HUGEINT << (8*CAST(band_id AS INT)))) % 256 AS BIGINT) AS band_key
FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS band_id)
"""


# q25: payload = 'RVSB' + byte(dtype=1) + uint32le(n) + n float32s; the
# fake decode reads the first 8 bytes little-endian -> width/height are
# pure header arithmetic over n = len(embedding):
#   h = 0x52 | 0x56<<8 | 0x53<<16 | 0x42<<24 | 1<<32 | (n&255)<<40 | ...
Q25_ORACLE = """
WITH base AS (SELECT vec_id, len(embedding) AS n FROM embeddings),
h AS (
  SELECT vec_id, n,
         (82::BIGINT + (86::BIGINT << 8) + (83::BIGINT << 16) + (66::BIGINT << 24)
          + (1::BIGINT << 32)
          + ((n % 256)::BIGINT << 40)
          + (((n // 256) % 256)::BIGINT << 48)
          + (((n // 65536) % 256)::BIGINT << 56)) AS hv
  FROM base
)
SELECT vec_id AS asset_id,
       'image' AS kind,
       CAST(9 + 4*n AS INT) AS n_bytes,
       CAST(64 + hv % 1024 AS INT) AS width,
       CAST(64 + (hv // 1024) % 1024 AS INT) AS height
FROM h
"""


Q28_ORACLE = """
WITH cand AS (
  SELECT 'h' || (doc_id % 7) || '.example' AS host,
         CASE doc_id % 5
           WHEN 0 THEN '/private/a' || doc_id
           WHEN 1 THEN '/private/pub/b' || doc_id
           ELSE '/p/' || doc_id END AS path
  FROM documents
), rules AS (
  SELECT * FROM (VALUES
    ('h0.example', ['/private/pub/'], ['/private/']),
    ('h1.example', []::VARCHAR[], ['/']),
    ('h2.example', ['/p/1$'], ['/p/1*']),
    ('h3.example', []::VARCHAR[], ['/p/33$'])
  ) AS t(host, allow, deny)
), scored AS (
  -- prefix rules replay generically; the h2/h3 wildcard patterns
  -- ('/p/1*' glob, '/p/1$' and '/p/33$' end anchors) replay explicitly
  -- with their raw pattern lengths (RFC 9309 specificity)
  SELECT c.host, r.deny,
    CASE c.host
      WHEN 'h2.example' THEN CASE WHEN c.path LIKE '/p/1%' THEN 5 ELSE -1 END
      WHEN 'h3.example' THEN CASE WHEN c.path = '/p/33' THEN 6 ELSE -1 END
      ELSE coalesce(list_max(list_transform(list_filter(r.deny,  p -> starts_with(c.path, p)), p -> length(p))), -1)
    END AS dlen,
    CASE c.host
      WHEN 'h2.example' THEN CASE WHEN c.path = '/p/1' THEN 5 ELSE -1 END
      ELSE coalesce(list_max(list_transform(list_filter(r.allow, p -> starts_with(c.path, p)), p -> length(p))), -1)
    END AS alen
  FROM cand c LEFT JOIN rules r USING (host)
)
SELECT host,
  CAST(SUM(CASE WHEN deny IS NULL OR dlen <= alen OR dlen = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
  CAST(SUM(CASE WHEN NOT (deny IS NULL OR dlen <= alen OR dlen = -1) THEN 1 ELSE 0 END) AS BIGINT) AS n_denied
FROM scored GROUP BY host ORDER BY host
"""


_KMV_REPLAY_PREFIX = r"""
            -- full KMV replay: q91 tokenization -> word 3-gram shingles
            -- -> Horner char fold mod 2^31-1 (BIGINT, list order) with
            -- the Knuth mix -> distinct keys -> bottom-32 per host ->
            -- candidate pairs on shared members -> merged bottom-32
            -- estimate + exact Jaccard audit
            WITH docs AS (
              SELECT 'h' || CAST(doc_id % 4 AS VARCHAR) AS g,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                       ' '), w -> w <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ), sh AS (
              SELECT g, unnest(list_transform(generate_series(1, len(ws) - 2),
                       i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS sh
              FROM docs WHERE len(ws) >= 3
            ), keys AS (
              SELECT DISTINCT g,
                     CAST((list_reduce(list_transform(string_split(sh, ''),
                              c -> CAST(unicode(c) AS BIGINT)),
                            (a, x) -> (a * 131 + x) % 2147483647)
                           * 2654435761) % 2147483647 AS BIGINT) AS key
              FROM sh
            ), sketch AS (
              SELECT g, key FROM (
                SELECT g, key, row_number() OVER (PARTITION BY g ORDER BY key ASC) AS rn
                FROM keys) WHERE rn <= 32
            ), cand AS (
              SELECT DISTINCT a.g AS ga, b.g AS gb
              FROM sketch a JOIN sketch b ON a.key = b.key AND a.g < b.g
            ), merged AS (
              SELECT ga, gb, key, max(in_a) AS in_a, max(in_b) AS in_b FROM (
                SELECT c.ga, c.gb, s.key, 1 AS in_a, 0 AS in_b
                FROM cand c JOIN sketch s ON s.g = c.ga
                UNION ALL
                SELECT c.ga, c.gb, s.key, 0, 1
                FROM cand c JOIN sketch s ON s.g = c.gb
              ) GROUP BY ga, gb, key
            ), est AS (
              SELECT ga, gb,
                     sum(in_a * in_b) AS n_shared,
                     round(CAST(sum(in_a * in_b) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                       AS est_jaccard
              FROM (
                SELECT ga, gb, in_a, in_b, row_number() OVER
                         (PARTITION BY ga, gb ORDER BY key ASC) AS rn
                FROM merged) WHERE rn <= 32
              GROUP BY ga, gb
            )"""


def oracle_sql() -> dict[str, str]:
    fp_weight = "CASE (i-1)%4 WHEN 0 THEN 1 WHEN 1 THEN 31 WHEN 2 THEN 961 ELSE 29791 END"
    return {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1997-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q02_revenue_by_nation": """
            SELECT n_name, r_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_lineitems
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY n_name, r_name
        """,
        "q03_top_events_per_user": """
            SELECT user_id, event_id, rnk, round(value, 2) AS value
            FROM (
              SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rnk
              FROM events
            ) WHERE rnk <= 3
        """,
        "q04_running_value": """
            SELECT user_id, event_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
                   coalesce(lag(event_id) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC), -1) AS prev_event_id
            FROM events
        """,
        "q05_customers_without_orders": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "q06_region_priority_grid": """
            SELECT r_name, o_orderpriority
            FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
        """,
        "q07_range_expansion": """
            SELECT n_name, count(*) AS n_tasks, CAST(sum(task_id) AS BIGINT) AS sum_task_id
            FROM (
              SELECT n_name, unnest(generate_series(1, (n_nationkey % 5) + 1)) AS task_id
              FROM nation
            ) GROUP BY n_name
        """,
        "q08_date_rollup": """
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders GROUP BY 1
        """,
        "q09_exact_dedup": """
            SELECT min(doc_id) AS keep_id, count(*) AS dup_count
            FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm FROM documents)
            GROUP BY norm
        """,
        "q10_ngram_jaccard": """
            SELECT * FROM (
            WITH toks AS (
              SELECT doc_id AS id, lang, CAST(floor(n_chars / 50) AS INT) AS len_bucket,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
              FROM documents
            ), grams AS (
              SELECT id, lang, len_bucket,
                     CASE WHEN len(w) >= 3 THEN
                       list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in generate_series(1, len(w)-2)])
                     ELSE [array_to_string(w, ' ')] END AS g
              FROM toks
            )
            SELECT a.id AS id_a, b.id AS id_b,
                   round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                         / greatest(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)), 1), 6) AS jaccard
            FROM grams a JOIN grams b
              ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.id < b.id
            ) WHERE jaccard >= 0.12
        """,
        "q11_lang_id": f"""
            SELECT doc_id,
                   CASE WHEN coalesce(greatest(s_de, s_en, s_es, s_fr), 0) <= 0 THEN 'und'
                        WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                        WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                        WHEN s_es >= s_fr THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM (
              SELECT doc_id, {_lang_scores_sql()}
              FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents)
            )
        """,
        "q12_quality": f"""
            SELECT doc_id, n_words,
                   round(n_alpha / greatest(n_chars, 1), 6) AS alpha_ratio,
                   round(stop_hits / greatest(n_words, 1), 6) AS stopword_ratio,
                   round(0.35 * (n_alpha / greatest(n_chars, 1))
                       + 0.35 * least(4.0 * stop_hits / greatest(n_words, 1), 1.0)
                       + 0.2  * least(n_words / 100.0, 1.0)
                       - 0.1  * (n_punct / greatest(n_chars, 1)), 6) AS quality_score
            FROM (
              SELECT doc_id,
                     CAST(length(text) AS DOUBLE) AS n_chars,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_words,
                     CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS n_alpha,
                     CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS n_punct,
                     CAST({_stopword_hits_sql()} AS DOUBLE) AS stop_hits
              FROM (SELECT doc_id, text, ' ' || lower(text) || ' ' AS p FROM documents)
            )
        """,
        "q13_token_counts": """
            SELECT doc_id,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws_tokens,
                   CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]{1,3}|[^\\sa-zA-Z0-9]+')) AS BIGINT) AS bpe_tokens,
                   CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_llm_tokens
            FROM documents
        """,
        "q14_fingerprint": f"""
            SELECT doc_id,
                   CAST(list_sum(list_transform(generate_series(1, least(length(text), 64)),
                       i -> unicode(substr(text, CAST(i AS INT), 1)) * ({fp_weight})
                   )) % 1000000007 AS BIGINT) AS fingerprint
            FROM documents
        """,
        "q15_url_canonicalize": """
            SELECT doc_id,
                   'https://host' || CAST(doc_id % 7 AS VARCHAR) || '.example/p/' || CAST(doc_id AS VARCHAR) AS url_canon
            FROM documents
        """,
        "q16_politeness_budget": """
            SELECT host,
                   CAST(sum(CASE WHEN rnk <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_scheduled,
                   CAST(sum(CASE WHEN rnk > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_deferred
            FROM (
              SELECT 'h' || CAST(user_id % 20 AS VARCHAR) AS host,
                     row_number() OVER (PARTITION BY user_id % 20 ORDER BY event_id ASC) AS rnk
              FROM events
            ) GROUP BY host
        """,
        "q17_url_seen_subtract": """
            SELECT event_id AS url_hash FROM events e
            WHERE event_id % 3 <> 0
        """,
        "q18_ann_topk": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(
                     list_sum(list_transform(generate_series(1, 64),
                         i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform(generate_series(1, 64),
                         i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(generate_series(1, 64),
                         i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))))
                   , 6) AS cosine
            FROM embeddings, q
            WHERE vec_id <> 0
            ORDER BY cosine DESC, vec_id ASC
            LIMIT 10
        """,
        "q19_embedding_neardup": """
            SELECT * FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(
                     list_sum(list_transform(generate_series(1, 64),
                         i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform(generate_series(1, 64),
                         i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(generate_series(1, 64),
                         i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))
                   , 6) AS cosine
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            ) WHERE cosine >= 0.3
        """,
        "q20_multimodal_roundtrip": """
            SELECT vec_id,
                   round(sqrt(list_sum(list_transform(generate_series(1, 64),
                       i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))), 6) AS l2_norm
            FROM embeddings
        """,
        "q27_sessionize": """
            SELECT user_id,
                   CAST(max(session_id) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM (
              SELECT user_id,
                     sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
              FROM (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM events
              )
            ) GROUP BY user_id
        """,
        "q33_brand_revenue_by_nation": """
            SELECT n_name, p_brand, revenue, n_items, rnk FROM (
              SELECT n_name, p_brand, revenue, n_items,
                     CAST(row_number() OVER (PARTITION BY n_name
                          ORDER BY revenue DESC, p_brand ASC) AS INT) AS rnk
              FROM (
                SELECT n_name, p_brand,
                       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                       count(*) AS n_items
                FROM lineitem
                JOIN part ON l_partkey = p_partkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                GROUP BY n_name, p_brand
              )
            ) WHERE rnk <= 3
        """,
        "q30_hash_split": """
            -- ((id % 1000) * K) % 1000 == (id * K) % 1000, overflow-free:
            -- the same narrowed form the Spark side computes (split_col)
            SELECT doc_id,
                   CASE WHEN ((doc_id % 1000) * 2654435761) % 1000 < 50 THEN 'test'
                        WHEN ((doc_id % 1000) * 2654435761) % 1000 < 150 THEN 'val'
                        ELSE 'train' END AS split
            FROM documents
        """,
        "q31_dup_ngram_frac": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id,
                     CASE WHEN len(ws) >= 2
                          THEN list_transform(generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1])
                          ELSE []::VARCHAR[] END AS grams
              FROM w
            )
            SELECT doc_id,
                   CAST(len(grams) AS INT) AS n_grams,
                   round(CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                         / greatest(len(grams), 1), 6) AS dup_frac
            FROM g
        """,
        "q32_clean_corpus": rf"""
            WITH base AS (
              SELECT doc_id, text, ' ' || lower(text) || ' ' AS p,
                     regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
              FROM documents
            ), lang AS (
              SELECT doc_id,
                     CASE WHEN coalesce(greatest(s_de, s_en, s_es, s_fr), 0) <= 0 THEN 'und'
                          WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                          WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                          WHEN s_es >= s_fr THEN 'es'
                          ELSE 'fr' END AS lang_pred
              FROM (SELECT doc_id, {_lang_scores_sql()} FROM base)
            ), qual AS (
              SELECT doc_id,
                     round(0.35 * (n_alpha / greatest(n_chars, 1))
                         + 0.35 * least(4.0 * stop_hits / greatest(n_words, 1), 1.0)
                         + 0.2  * least(n_words / 100.0, 1.0)
                         - 0.1  * (n_punct / greatest(n_chars, 1)), 6) AS quality_score
              FROM (
                SELECT doc_id,
                       CAST(length(text) AS DOUBLE) AS n_chars,
                       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_words,
                       CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS n_alpha,
                       CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS n_punct,
                       CAST({{STOP_HITS}} AS DOUBLE) AS stop_hits
                FROM base
              )
            ), dup AS (
              SELECT doc_id,
                     round(CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                           / greatest(len(grams), 1), 6) AS dup_frac
              FROM (
                SELECT doc_id,
                       CASE WHEN len(ws) >= 2
                            THEN list_transform(generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1])
                            ELSE []::VARCHAR[] END AS grams
                FROM (SELECT doc_id, string_split(norm, ' ') AS ws FROM base)
              )
            ), canon AS (
              SELECT doc_id, doc_id = min(doc_id) OVER (PARTITION BY norm) AS is_canonical
              FROM base
            )
            SELECT b.doc_id AS id, lang_pred, quality_score, dup_frac,
                   lang_pred IN ('en') AS lang_ok,
                   quality_score >= 0.3 AS quality_ok,
                   dup_frac <= 0.3 AS rep_ok,
                   is_canonical,
                   (lang_pred IN ('en') AND quality_score >= 0.3
                    AND dup_frac <= 0.3 AND is_canonical) AS keep
            FROM base b
            JOIN lang USING (doc_id) JOIN qual USING (doc_id)
            JOIN dup USING (doc_id) JOIN canon USING (doc_id)
        """.replace("{STOP_HITS}", _stopword_hits_sql()),
        "q29_post_round": """
            WITH entities AS (SELECT unnest(['a','b']) AS e),
                 modes    AS (SELECT unnest(generate_series(0, 2)) AS m)
            SELECT 'https://api.example/' || e || '/submit' AS url_canon,
                   'POST' AS method,
                   CAST(200 AS INT) AS result_code,
                   'POST mode=' || CAST(m AS VARCHAR) AS text
            FROM entities CROSS JOIN modes
        """,
        "q21_minhash_dedup": Q21_ORACLE,
        "q22_simhash_buckets": Q22_ORACLE,
        # q23 is a recall CONTRACT row (the approximate row set itself is
        # not SQL-replayable): the Spark side computes recall@10 of the
        # LSH top-k against the exact brute-force top-k and thresholds it;
        # the oracle asserts the contract holds, so the driver's hash
        # check goes red exactly when LSH recall drops below min_recall.
        "q23_lsh_topk": """
            SELECT CAST(10 AS INT) AS k,
                   CAST(0.5 AS DOUBLE) AS min_recall,
                   TRUE AS passed
        """,
        "q25_media_features": Q25_ORACLE,
        "q28_robots_gate": Q28_ORACLE,
        "q34_host_boilerplate": r"""
            WITH w AS (
              SELECT doc_id, source,
                     string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ), g AS (
              -- non-overlapping 7-word windows, last window partial;
              -- every doc yields >= 1 window (len(ws) >= 1 even for '')
              SELECT doc_id, source,
                     list_transform(
                       generate_series(1, CAST(ceil(len(ws) / 7.0) AS INT)),
                       i -> array_to_string(ws[(i-1)*7+1 : least(i*7, len(ws))], ' ')
                     ) AS wins
              FROM w
            ), u AS (
              SELECT doc_id, source, unnest(wins) AS unit FROM g
            ), c AS (
              SELECT source, unit, count(DISTINCT doc_id) AS ndocs
              FROM u GROUP BY source, unit
            )
            SELECT u.doc_id AS id, u.source AS group_key,
                   CAST(count(*) AS BIGINT) AS n_units,
                   CAST(sum(CASE WHEN ndocs >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
                   round(CAST(sum(CASE WHEN ndocs >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
                         / greatest(count(*), 1), 6) AS boiler_frac
            FROM u JOIN c ON u.source = c.source AND u.unit = c.unit
            GROUP BY u.doc_id, u.source
        """,
        "q35_contamination": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(ws) >= 5
                       THEN list_transform(generate_series(1, len(ws) - 4),
                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                              || ws[i+3] || ' ' || ws[i+4])
                       ELSE []::VARCHAR[] END) AS grams
              FROM w
            ), bench AS (
              SELECT DISTINCT unnest(grams) AS gk FROM g WHERE doc_id % 13 = 0
            ), corpus AS (
              SELECT doc_id, grams FROM g WHERE doc_id % 13 <> 0
            ), hits AS (
              SELECT doc_id, count(*) AS n_overlap
              FROM (SELECT doc_id, unnest(grams) AS gk FROM corpus) cg
              JOIN bench USING (gk)
              GROUP BY doc_id
            )
            SELECT c.doc_id AS id,
                   CAST(len(grams) AS INT) AS n_grams,
                   CAST(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap,
                   coalesce(n_overlap, 0) >= 1 AS contaminated
            FROM corpus c LEFT JOIN hits USING (doc_id)
        """,
        "q36_link_pagerank": """
            -- unrolls pagerank()'s three synchronous steps; every rank is
            -- rounded to 12 dp per iteration exactly as the Spark side does,
            -- so the replay is byte-identical despite float-sum order
            WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
            nodes AS (SELECT doc_id AS v FROM documents),
            e AS (
              SELECT doc_id AS src, (doc_id*37 + j*1009) % nn.n AS dst
              FROM documents, nn, (SELECT unnest([1,2,3]) AS j)
              WHERE (doc_id*37 + j*1009) % nn.n <> doc_id
            ),
            outd AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
            ind  AS (SELECT dst, count(*) AS indeg  FROM e GROUP BY dst),
            p0 AS (SELECT v, round(1.0 / (SELECT n FROM nn), 12) AS pr FROM nodes),
            c1 AS (SELECT dst, sum(pr / outdeg) AS s
                   FROM e JOIN outd USING (src) JOIN p0 ON p0.v = e.src GROUP BY dst),
            p1 AS (SELECT v, round(round(0.15 / (SELECT n FROM nn), 12)
                                   + 0.85 * coalesce(s, 0), 12) AS pr
                   FROM nodes LEFT JOIN c1 ON v = dst),
            c2 AS (SELECT dst, sum(pr / outdeg) AS s
                   FROM e JOIN outd USING (src) JOIN p1 ON p1.v = e.src GROUP BY dst),
            p2 AS (SELECT v, round(round(0.15 / (SELECT n FROM nn), 12)
                                   + 0.85 * coalesce(s, 0), 12) AS pr
                   FROM nodes LEFT JOIN c2 ON v = dst),
            c3 AS (SELECT dst, sum(pr / outdeg) AS s
                   FROM e JOIN outd USING (src) JOIN p2 ON p2.v = e.src GROUP BY dst),
            p3 AS (SELECT v, round(round(0.15 / (SELECT n FROM nn), 12)
                                   + 0.85 * coalesce(s, 0), 12) AS pr
                   FROM nodes LEFT JOIN c3 ON v = dst)
            SELECT v AS node, round(pr, 6) AS pagerank,
                   CAST(coalesce(outdeg, 0) AS BIGINT) AS outdeg,
                   CAST(coalesce(indeg, 0) AS BIGINT) AS indeg
            FROM p3 LEFT JOIN outd ON v = outd.src LEFT JOIN ind ON v = ind.dst
        """,
        "q37_snapshot_dedup": """
            -- warc_ts is strictly increasing in doc_id, so latest = max
            -- doc_id per url; the oracle replays with a window (test
            -- scale), while the Spark side is the partial max_by
            -- aggregate (scale shape)
            WITH pages AS (
              SELECT doc_id, text,
                     'https://host' || CAST(doc_id % 7 AS VARCHAR)
                       || '.example/p/' || CAST(doc_id % 137 AS VARCHAR) AS url,
                     1767225600 + doc_id AS ts
              FROM documents
            ), r AS (
              SELECT *,
                     row_number() OVER (PARTITION BY url ORDER BY ts DESC) AS rn,
                     count(*) OVER (PARTITION BY url) AS nv
              FROM pages
            ), stats AS (
              SELECT url,
                     count(DISTINCT text) AS n_content_versions,
                     count(*) AS nv2,
                     CASE WHEN count(*) > 1
                          THEN round((count(DISTINCT text) - 1.0) / (count(*) - 1.0), 6)
                          ELSE 0.0 END AS change_rate
              FROM pages GROUP BY url
            )
            SELECT r.url,
                   CAST(r.doc_id AS BIGINT) AS latest_doc_id,
                   CAST(r.ts AS BIGINT) AS last_ts,
                   CAST(r.nv AS BIGINT) AS n_versions,
                   r.text,
                   CAST(s.n_content_versions AS BIGINT) AS n_content_versions,
                   s.change_rate
            FROM r JOIN stats s ON r.url = s.url
            WHERE r.rn = 1
        """,
        "q38_pii_scrub": r"""
            WITH planted AS (
              SELECT doc_id,
                     CASE doc_id % 3
                       WHEN 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example now'
                       WHEN 1 THEN text || ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.7 up'
                       ELSE text || ' call +1 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     END AS text
              FROM documents
            ), pat AS (
              SELECT '[A-Za-z0-9._%+-]+@[A-Za-z0-9][A-Za-z0-9.-]*\.[A-Za-z]{2,}' AS email,
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b' AS ip,
                     '\+\d{1,3}[ -]\d{3}[ -]\d{4}' AS phone
            ), scrubbed AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text, email)) AS BIGINT) AS n_emails,
                     CAST(len(regexp_extract_all(text, ip)) AS BIGINT) AS n_ips,
                     CAST(len(regexp_extract_all(text, phone)) AS BIGINT) AS n_phones,
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(text, email, '<EMAIL>', 'g'),
                         ip, '<IP>', 'g'),
                       phone, '<PHONE>', 'g') AS redacted
              FROM planted, pat
            )
            SELECT doc_id AS id, n_emails, n_ips, n_phones,
                   (n_emails + n_ips + n_phones) > 0 AS has_pii,
                   md5(redacted) AS redacted_md5,
                   CAST(length(redacted) AS BIGINT) AS redacted_len
            FROM scrubbed
        """,
        "q39_url_seen_cuckoo": """
            SELECT event_id AS url_hash FROM events
            WHERE event_id % 3 <> 0 OR event_id % 15 = 0
        """,
        "q40_asof_join": """
            WITH snaps AS (
              SELECT user_id, ts, max(event_id) AS snap_id, max(value) AS snap_value
              FROM events WHERE event_type = 'error' GROUP BY user_id, ts
            ), l AS (
              SELECT event_id, user_id, ts FROM events WHERE event_type <> 'error'
            )
            SELECT l.event_id, s.snap_id, s.snap_value
            FROM l ASOF LEFT JOIN snaps s
              ON l.user_id = s.user_id AND l.ts >= s.ts
        """,
        "q41_stratified_sample": """
            WITH sampled AS (
              SELECT doc_id, source, lang FROM documents
              WHERE ((doc_id % 1000000007) * 2654435761) % 1000000 < 300000
            ), ranked AS (
              SELECT doc_id, source, lang,
                     row_number() OVER (
                       PARTITION BY source, lang
                       ORDER BY ((doc_id % 1000000007) * 2654435761) % 1000000,
                                doc_id
                     ) AS rk
              FROM sampled
            )
            SELECT doc_id, source, lang FROM ranked WHERE rk <= 25
        """,
        "q42_host_reputation": """
            WITH base AS (
              SELECT source AS host, text, lang,
                     LEAST(n_chars / 1000.0, 1.0) AS q
              FROM documents
            ), per_host AS (
              SELECT host, COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_unique,
                     AVG(q) AS avg_q
              FROM base GROUP BY host
            ), langs AS (
              SELECT host, lang, COUNT(*) AS c FROM base GROUP BY host, lang
            ), dom AS (
              SELECT host, lang AS dominant_lang, c AS dom_c,
                     row_number() OVER (PARTITION BY host ORDER BY c DESC, lang DESC) AS rk
              FROM langs
            )
            SELECT p.host, p.n_docs, p.n_unique,
                   round(1.0 - p.n_unique / CAST(p.n_docs AS DOUBLE), 6) AS dup_rate,
                   d.dominant_lang,
                   round(d.dom_c / CAST(p.n_docs AS DOUBLE), 6) AS lang_consistency,
                   round(p.avg_q, 6) AS avg_quality,
                   round(0.5 * (1.0 - (1.0 - p.n_unique / CAST(p.n_docs AS DOUBLE)))
                         + 0.3 * (d.dom_c / CAST(p.n_docs AS DOUBLE))
                         + 0.2 * LEAST(p.avg_q, 1.0), 6) AS score
            FROM per_host p JOIN dom d ON p.host = d.host AND d.rk = 1
        """,
        "q43_sitemap_ingest": r"""
            WITH sm AS (
              SELECT 'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example/sitemap-'
                       || CAST(doc_id AS VARCHAR) || '.xml' AS sitemap_url,
                     CASE WHEN doc_id % 5 = 0 THEN
                       '<sitemapindex><sitemap><loc>https://h' || CAST(doc_id % 7 AS VARCHAR)
                       || '.example/sm/' || CAST(doc_id AS VARCHAR)
                       || '-1.xml</loc></sitemap><sitemap><loc> https://h'
                       || CAST(doc_id % 7 AS VARCHAR) || '.example/sm/'
                       || CAST(doc_id AS VARCHAR)
                       || '-2.xml </loc></sitemap></sitemapindex>'
                     ELSE
                       '<urlset><url><loc>https://h' || CAST(doc_id % 7 AS VARCHAR)
                       || '.example/p/' || CAST(doc_id % 211 AS VARCHAR)
                       || '?a=1&amp;b=2</loc></url><url><loc>https://h'
                       || CAST(doc_id % 7 AS VARCHAR) || '.example/p/'
                       || CAST(doc_id % 499 AS VARCHAR) || '</loc></url></urlset>'
                     END AS body
              FROM documents
            )
            SELECT sitemap_url,
                   CASE WHEN body LIKE '%<sitemapindex%' THEN 'sitemapindex'
                        ELSE 'urlset' END AS kind,
                   replace(replace(replace(replace(replace(
                     trim(loc), '&apos;', ''''), '&quot;', '"'),
                     '&gt;', '>'), '&lt;', '<'), '&amp;', '&') AS loc
            FROM sm, unnest(regexp_extract_all(body, '<loc>\s*([^<]+?)\s*</loc>', 1)) AS t(loc)
        """,
        "q44_unicode_norm": r"""
            WITH planted AS (
              SELECT doc_id,
                     text || CASE doc_id % 3
                       WHEN 0 THEN ' CAF' || chr(201) || ' fin'
                       WHEN 1 THEN ' CAFE' || chr(769) || ' fin'
                       ELSE ' cafe fin'
                     END AS text
              FROM documents
            ), norm AS (
              SELECT doc_id,
                     regexp_replace(lower(trim(nfc_normalize(text))),
                                    '\s+', ' ', 'g') AS n
              FROM planted
            )
            SELECT doc_id, md5(n) AS norm_md5,
                   CAST(length(n) AS BIGINT) AS norm_len
            FROM norm
        """,
        "q45_surt_keys": """
            WITH u AS (
              SELECT doc_id,
                     'https://'
                     || CASE WHEN doc_id % 4 = 0 THEN 'www.'
                        ELSE 's' || CAST(doc_id % 13 AS VARCHAR) || '.' END
                     || 'h' || CAST(doc_id % 7 AS VARCHAR) || '.example/p/'
                     || CAST(doc_id % 211 AS VARCHAR)
                     || CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=2' ELSE '' END AS url
              FROM documents
            ), parts AS (
              SELECT doc_id,
                     split_part(split_part(url, '://', 2), '/', 1) AS auth,
                     substr(split_part(url, '://', 2),
                            length(split_part(split_part(url, '://', 2), '/', 1)) + 1) AS pq
              FROM u
            )
            SELECT doc_id,
                   array_to_string(list_reverse(string_split(
                     CASE WHEN auth LIKE 'www.%' THEN substr(auth, 5) ELSE auth END,
                     '.')), ',')
                   || ')' || CASE WHEN pq = '' THEN '/' ELSE pq END AS surt
            FROM parts
        """,
        "q46_pack_chunks": r"""
            WITH toks AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+'))
                     END AS n_tokens,
                     ((doc_id % 1000000007) * 2654435761) % 1000000 AS coin
              FROM documents
            ), placed AS (
              SELECT doc_id, n_tokens,
                     CAST(coin % 8 AS INT) AS pack_bucket,
                     SUM(n_tokens) OVER (
                       PARTITION BY coin % 8 ORDER BY coin, doc_id
                       ROWS UNBOUNDED PRECEDING
                     ) - n_tokens AS start_offset
              FROM toks
            )
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, pack_bucket,
                   CAST(start_offset AS BIGINT) AS start_offset,
                   CAST(start_offset // 512 AS BIGINT) AS chunk_id,
                   CAST(CASE WHEN n_tokens <= 0 THEN 0
                        ELSE (start_offset + n_tokens - 1) // 512
                             - start_offset // 512 + 1 END AS BIGINT)
                     AS chunks_spanned
            FROM placed
        """,
        "q47_dedup_within_doc": r"""
            WITH planted AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 2 = 0 THEN text || ' ' ||
                       array_to_string(list_slice(string_split(
                         regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
                         1, 8), ' ')
                     ELSE text END AS text
              FROM documents
            ), norm AS (
              SELECT doc_id,
                     regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
              FROM planted
            ), w AS (
              SELECT doc_id, t, string_split(t, ' ') AS ws FROM norm
            ), units AS (
              SELECT doc_id, i,
                     array_to_string(list_slice(ws, i * 8 + 1, i * 8 + 8), ' ') AS unit
              FROM w, unnest(generate_series(0,
                     CAST(ceil(len(ws) / 8.0) AS BIGINT) - 1)) AS g(i)
              WHERE length(t) > 0
            ), ranked AS (
              SELECT doc_id, i, unit,
                     row_number() OVER (PARTITION BY doc_id, unit ORDER BY i) AS rk
              FROM units
            ), agg AS (
              SELECT doc_id,
                     string_agg(CASE WHEN rk = 1 THEN unit END, ' ' ORDER BY i) AS dedup,
                     count(*) AS n_units,
                     sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS n_kept
              FROM ranked GROUP BY doc_id
            )
            SELECT d.doc_id,
                   md5(coalesce(a.dedup, '')) AS dedup_md5,
                   CAST(length(coalesce(a.dedup, '')) AS BIGINT) AS dedup_len,
                   CAST(coalesce(a.n_units - a.n_kept, 0) AS BIGINT) AS dropped_units
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "q48_unigram_logprob": r"""
            WITH words AS (
              SELECT doc_id,
                     unnest(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
              FROM documents WHERE length(trim(text)) > 0
            ), freq AS (
              SELECT w, count(*) AS c FROM words GROUP BY w
            ), tot AS (
              SELECT sum(c) AS t FROM freq
            ), scored AS (
              SELECT doc_id, count(*) AS n_words,
                     round(avg(ln(c / CAST(t AS DOUBLE))), 6) AS avg_logprob
              FROM words JOIN freq USING (w), tot
              GROUP BY doc_id
            )
            SELECT d.doc_id, s.n_words, s.avg_logprob
            FROM documents d LEFT JOIN scored s USING (doc_id)
        """,
        "q49_corpus_stats": r"""
            WITH toks AS (
              SELECT source AS group_key, length(text) AS len,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+'))
                     END AS tok
              FROM documents
            )
            SELECT group_key, count(*) AS n_docs,
                   round(avg(len), 6) AS avg_chars,
                   round(quantile_cont(tok, 0.5), 6) AS p50_tokens,
                   round(quantile_cont(tok, 0.9), 6) AS p90_tokens,
                   round(quantile_cont(tok, 0.99), 6) AS p99_tokens
            FROM toks GROUP BY group_key
        """,
        "q50_trap_scores": r"""
            WITH u AS (
              SELECT doc_id,
                     'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example'
                     || CASE doc_id % 5
                        WHEN 0 THEN '/x/x/x'
                        WHEN 1 THEN '/p?phpsessid=' || CAST(doc_id AS VARCHAR)
                        WHEN 2 THEN '/p/' || CAST(doc_id + 100000000 AS VARCHAR)
                        WHEN 3 THEN '/a/b/c/d/e/f/g/h/i'
                        ELSE '/article/' || CAST(doc_id % 97 AS VARCHAR)
                        END AS url
              FROM documents
            ), feats AS (
              SELECT doc_id, url,
                     list_filter(string_split(
                       split_part(substr(split_part(url, '://', 2),
                                  strpos(split_part(url, '://', 2), '/')), '?', 1),
                       '/'), x -> x <> '') AS segs
              FROM u
            )
            SELECT doc_id, url,
                   round(least(
                     least(greatest(len(segs) - 6, 0) * 0.1, 0.3)
                     + CASE WHEN len(segs) >= 3
                            AND len(segs) - len(list_distinct(segs)) >= 2
                       THEN 0.3 ELSE 0.0 END
                     + CASE WHEN regexp_matches(url, '[0-9]{8,}')
                       THEN 0.2 ELSE 0.0 END
                     + CASE WHEN regexp_matches(url,
                         '[?&](sessionid|session_id|sid|phpsessid|jsessionid)=')
                       THEN 0.2 ELSE 0.0 END,
                     1.0), 6) AS trap_score
            FROM feats
        """,
        "q51_quality_classifier": r"""
            WITH docs AS (
              SELECT doc_id,
                     regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
              FROM documents
            ), words AS (
              SELECT doc_id, string_split(norm, ' ') AS ws
              FROM docs WHERE length(norm) > 0
            ), feats AS (
              SELECT doc_id, unnest(ws) AS f FROM words
              UNION ALL
              SELECT doc_id,
                     unnest(list_transform(range(1, len(ws)),
                                           i -> ws[i] || ' ' || ws[i+1])) AS f
              FROM words
            ), bucketed AS (
              SELECT doc_id,
                     (list_reduce(
                        list_prepend(CAST(0 AS BIGINT),
                          list_transform(range(1, length(f) + 1),
                            i -> CAST(unicode(substring(f, CAST(i AS INT), 1)) AS BIGINT))),
                        (acc, cp) -> (acc * 31 + cp) % 1000000007)
                      * 2654435761) % 16384 AS bucket
              FROM feats
            ), agg AS (
              SELECT doc_id, count(*) AS n_feats,
                     avg((bucket * 2654435761) % 1000003 / 1000003.0 * 2 - 1) AS m
              FROM bucketed GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(a.n_feats, 0) AS BIGINT) AS n_feats,
                   CASE WHEN a.doc_id IS NOT NULL
                        THEN round(1.0 / (1.0 + exp(-a.m)), 6)
                   END AS quality_score
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "q52_warc_roundtrip": """
            SELECT doc_id,
                   'https://docs.example/' || CAST(doc_id AS VARCHAR) AS url,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   text
            FROM documents WHERE text IS NOT NULL
        """,
        "q53_cdx_random_access": """
            WITH d AS (
              SELECT doc_id, text FROM documents WHERE text IS NOT NULL
            ), u AS (
              SELECT doc_id, text,
                     'https://'
                     || CASE WHEN doc_id % 4 = 0 THEN 'www.'
                        ELSE 's' || CAST(doc_id % 13 AS VARCHAR) || '.' END
                     || 'h' || CAST(doc_id % 7 AS VARCHAR) || '.example/p/'
                     || CAST(doc_id AS VARCHAR)
                     || CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=2' ELSE '' END AS url
              FROM d
            ), parts AS (
              SELECT doc_id, text, url,
                     split_part(split_part(url, '://', 2), '/', 1) AS auth,
                     substr(split_part(url, '://', 2),
                            length(split_part(split_part(url, '://', 2), '/', 1)) + 1) AS pq
              FROM u
            )
            SELECT doc_id, url,
                   array_to_string(list_reverse(string_split(
                     CASE WHEN auth LIKE 'www.%' THEN substr(auth, 5) ELSE auth END,
                     '.')), ',')
                   || ')' || CASE WHEN pq = '' THEN '/' ELSE pq END AS surt,
                   'text/html' AS mime,
                   CAST(200 AS INT) AS http_status,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   sha256(text) AS sha256,
                   text
            FROM parts
        """,
        "q54_warc_revisit": """
            WITH caps AS (
              SELECT d.doc_id, c.n AS capture, d.text,
                     'https://m' || CAST(c.n AS VARCHAR) || '.h'
                     || CAST(d.doc_id % 7 AS VARCHAR) || '.example/p/'
                     || CAST(d.doc_id AS VARCHAR) AS url
              FROM documents d
              CROSS JOIN (VALUES (0), (1), (2)) c(n)
              WHERE d.text IS NOT NULL
            ), g AS (
              SELECT doc_id, capture, url,
                     count(*) OVER (PARTITION BY text) AS n_captures,
                     min(url) OVER (PARTITION BY text) AS canon_url
              FROM caps
            )
            SELECT doc_id, CAST(capture AS INT) AS capture, url,
                   CAST(n_captures AS BIGINT) AS n_captures,
                   url <> canon_url AS is_revisit,
                   canon_url
            FROM g
        """,
        "q55_gopher_rules": f"""
            WITH base AS (
              SELECT doc_id, text,
                     CAST(len(list_filter(
                       string_split_regex(text, '\\s+'), w -> w <> ''
                     )) AS BIGINT) AS n_words,
                     list_filter(string_split(text, chr(10)),
                                 x -> length(trim(x)) > 0) AS lines,
                     list_filter(string_split_regex(text, '\\s+'),
                                 w -> w <> '') AS words
              FROM documents
            ), m AS (
              SELECT doc_id, n_words,
                     CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
                       / greatest(n_words, 1) AS mwl,
                     (length(text) - length(replace(text, '#', '')))
                       / CAST(greatest(n_words, 1) AS DOUBLE) AS hashr,
                     ( (length(text) - length(replace(text, '...', ''))) // 3
                     + (length(text) - length(replace(text, '…', ''))) )
                       / CAST(greatest(n_words, 1) AS DOUBLE) AS ellsym,
                     len(list_filter(lines,
                       x -> list_contains(['•','‣','▪','-','*'],
                                          substr(ltrim(x), 1, 1))))
                       / CAST(greatest(len(lines), 1) AS DOUBLE) AS bullet,
                     len(list_filter(lines,
                       x -> ends_with(rtrim(x), '...')
                            OR ends_with(rtrim(x), '…')))
                       / CAST(greatest(len(lines), 1) AS DOUBLE) AS ell,
                     len(list_filter(words,
                       w -> regexp_matches(w, '[a-zA-Z]')))
                       / CAST(greatest(n_words, 1) AS DOUBLE) AS alpha,
                     ({_gopher_hits_sql()}) AS stop_hits
              FROM base
            )
            SELECT doc_id, n_words,
                   round(mwl, 6) AS mean_word_len,
                   round(hashr, 6) AS hash_ratio,
                   round(ellsym, 6) AS ellipsis_sym_ratio,
                   round(bullet, 6) AS bullet_frac,
                   round(ell, 6) AS ellipsis_frac,
                   round(alpha, 6) AS alpha_word_frac,
                   CAST(stop_hits AS INT) AS stop_hits,
                   (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
                   (mwl >= 3.0 AND mwl <= 10.0) AS ok_mean_word_len,
                   (hashr <= 0.1 AND ellsym <= 0.1) AS ok_symbol_ratio,
                   (bullet <= 0.9) AS ok_bullet_lines,
                   (ell <= 0.3) AS ok_ellipsis_lines,
                   (alpha >= 0.8) AS ok_alpha_words,
                   (stop_hits >= 2) AS ok_stop_words,
                   ( (n_words >= 50 AND n_words <= 100000)
                     AND (mwl >= 3.0 AND mwl <= 10.0)
                     AND (hashr <= 0.1 AND ellsym <= 0.1)
                     AND (bullet <= 0.9) AND (ell <= 0.3)
                     AND (alpha >= 0.8) AND (stop_hits >= 2)
                   ) AS gopher_pass
            FROM m
        """,
        "q56_warc_dedup_roundtrip": """
            WITH caps AS (
              SELECT doc_id,
                     'https://w.h' || CAST(doc_id % 7 AS VARCHAR)
                       || '.example/p/' || CAST(doc_id AS VARCHAR) AS url,
                     '<html><body>doc payload ' || CAST(doc_id % 40 AS VARCHAR)
                       || '</body></html>' AS payload
              FROM documents WHERE text IS NOT NULL
            ), g AS (
              SELECT doc_id, url, payload,
                     min(url) OVER (PARTITION BY payload) AS canon_url
              FROM caps
            )
            SELECT doc_id, url,
                   url <> canon_url AS was_revisit,
                   CASE WHEN url <> canon_url THEN canon_url END
                     AS refers_to_uri,
                   CASE WHEN url <> canon_url
                        THEN '2026-01-02T03:04:05Z' END AS refers_to_date,
                   CAST(octet_length(encode(payload)) AS BIGINT) AS n_bytes,
                   payload AS text
            FROM g
        """,
        "q57_wet_roundtrip": """
            SELECT doc_id,
                   'https://docs.example/' || CAST(doc_id AS VARCHAR) AS url,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   text
            FROM documents WHERE text IS NOT NULL
        """,
        "q58_wat_links": """
            WITH n AS (SELECT count(*) AS n FROM documents)
            SELECT d.doc_id AS src,
                   (d.doc_id * 37 + j.j * 1009) % n.n AS dst
            FROM documents d
            CROSS JOIN (VALUES (1), (2), (3)) j(j)
            CROSS JOIN n
            WHERE (d.doc_id * 37 + j.j * 1009) % n.n <> d.doc_id
        """,
        "q59_ccnet_buckets": r"""
            WITH words AS (
              SELECT doc_id,
                     unnest(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
              FROM documents WHERE length(trim(text)) > 0
            ), freq AS (
              SELECT w, count(*) AS c FROM words GROUP BY w
            ), tot AS (
              SELECT sum(c) AS t FROM freq
            ), scored AS (
              SELECT doc_id, round(avg(ln(c / CAST(t AS DOUBLE))), 6) AS s
              FROM words JOIN freq USING (w), tot
              GROUP BY doc_id
            ), fulldocs AS (
              SELECT d.doc_id, d.lang, s.s AS avg_logprob
              FROM documents d LEFT JOIN scored s USING (doc_id)
            ), cuts AS (
              SELECT lang,
                     quantile_cont(avg_logprob, 2.0/3.0) AS c_head,
                     quantile_cont(avg_logprob, 1.0/3.0) AS c_mid
              FROM fulldocs WHERE avg_logprob IS NOT NULL GROUP BY lang
            )
            SELECT f.doc_id, f.lang, f.avg_logprob,
                   CASE WHEN f.avg_logprob IS NULL THEN NULL
                        WHEN f.avg_logprob >= c.c_head THEN 'head'
                        WHEN f.avg_logprob >= c.c_mid THEN 'middle'
                        ELSE 'tail' END AS ppl_bucket
            FROM fulldocs f LEFT JOIN cuts c USING (lang)
        """,
        "q60_mixture_sample": """
            WITH counts AS (
              SELECT lang, count(*) AS n FROM documents GROUP BY lang
            ), w(lang, w) AS (
              VALUES ('en', 0.25), ('zh', 0.30), ('es', 0.20), ('fr', 0.25)
            ), t AS (
              SELECT min(n / w) AS t FROM counts JOIN w USING (lang)
              WHERE w > 0
            ), r AS (
              SELECT c.lang,
                     CAST(round(t.t * w.w / c.n * 1000000, 0) AS BIGINT)
                       AS thresh
              FROM counts c JOIN w USING (lang) CROSS JOIN t
              WHERE w.w > 0
            )
            SELECT d.doc_id, d.lang,
                   COALESCE(
                     ((d.doc_id % 1000000007) * 2654435761) % 1000000
                       < r.thresh,
                     FALSE) AS kept
            FROM documents d LEFT JOIN r USING (lang)
        """,
        "q61_recrawl_schedule": """
            WITH pages AS (
              SELECT 'https://r.example/p/' || CAST(doc_id % 100 AS VARCHAR) AS url,
                     1767225600 + doc_id AS ts,
                     CASE WHEN doc_id % 100 % 3 = 0 THEN 0
                          WHEN doc_id % 100 % 3 = 1 THEN doc_id // 100
                          ELSE (doc_id // 100) // 2 END AS version
              FROM documents
            ), stats AS (
              SELECT url, count(*) AS n_versions,
                     min(ts) AS first_s, max(ts) AS last_s,
                     count(DISTINCT version) AS n_content_versions
              FROM pages GROUP BY url
            ), calc AS (
              SELECT url, n_versions, n_content_versions, last_s,
                     CAST(n_versions - 1 AS DOUBLE) AS rec,
                     CAST(n_content_versions - 1 AS DOUBLE) AS x,
                     CAST(last_s - first_s AS DOUBLE) AS span
              FROM stats
            ), iv AS (
              SELECT url, n_versions, n_content_versions, last_s, rec, x,
                     CASE WHEN rec <= 0 OR span / rec <= 0 THEN 604800.0
                          WHEN x <= 0 THEN 2592000.0
                          ELSE least(greatest(
                            (span / rec)
                              / (-ln(1.0 - least(x / rec, (rec - 0.5) / rec))),
                            10.0), 2592000.0)
                     END AS interval_d
              FROM calc
            )
            SELECT url,
                   n_versions,
                   n_content_versions,
                   round(CASE WHEN rec > 0 THEN x / rec ELSE 0.0 END, 6)
                     AS change_rate,
                   CAST(floor(interval_d) AS BIGINT) AS interval_s,
                   last_s + CAST(floor(interval_d) AS BIGINT)
                     AS next_fetch_epoch
            FROM iv
        """,
        "q62_c4_filters": r"""
            WITH built AS (
              SELECT doc_id,
                     replace(replace(replace(text,
                       ' slow ', '.' || chr(10)),
                       ' fast ', chr(10)),
                       ' big ', '!' || chr(10))
                     || CASE WHEN doc_id % 7 = 0
                          THEN chr(10) || 'Lorem ipsum dolor sit amet.' ELSE '' END
                     || CASE WHEN doc_id % 11 = 0
                          THEN chr(10) || 'if (x) { enable(); }' ELSE '' END
                     || CASE WHEN doc_id % 5 = 0
                          THEN chr(10) || 'Please enable javascript to continue today.'
                          ELSE '' END
                     || CASE WHEN doc_id % 13 = 0
                          THEN chr(10) || 'This page badword appears right here.'
                          ELSE '' END AS t2
              FROM documents
            ), lines AS (
              SELECT doc_id, t2,
                     list_filter(
                       list_transform(string_split(t2, chr(10)), l -> trim(l)),
                       l -> length(l) > 0) AS ls
              FROM built
            ), kept AS (
              SELECT doc_id, t2, ls,
                     list_filter(ls, l ->
                       right(l, 1) IN ('.', '!', '?', '"')
                       AND len(string_split_regex(l, '\s+')) >= 3
                       AND NOT list_contains(
                             string_split_regex(lower(l), '[^a-z0-9]+'),
                             'javascript')
                       AND NOT contains(lower(l), 'terms of use')
                       AND NOT contains(lower(l), 'privacy policy')
                       AND NOT contains(lower(l), 'cookie policy')
                       AND NOT contains(lower(l), 'uses cookies')
                       AND NOT contains(lower(l), 'use of cookies')
                       AND NOT contains(lower(l), 'use cookies')
                     ) AS ks
              FROM lines
            ), flags AS (
              SELECT doc_id,
                     -- array_to_string of an EMPTY list is NULL in DuckDB;
                     -- Spark's array_join gives '' — coalesce to match
                     coalesce(array_to_string(ks, chr(10)), '') AS clean_text,
                     CAST(len(ls) AS INT) AS n_lines,
                     CAST(len(ks) AS INT) AS n_lines_kept,
                     CAST(len(regexp_extract_all(
                       coalesce(array_to_string(ks, chr(10)), ''), '[.!?]')) AS INT)
                       AS n_sentences,
                     contains(lower(t2), 'lorem ipsum') AS has_lorem_ipsum,
                     contains(t2, '{') AS has_brace,
                     list_has_any(
                       string_split_regex(lower(t2), '[^a-z0-9]+'),
                       ['badword']) AS has_badword
              FROM kept
            )
            SELECT doc_id, clean_text, n_lines, n_lines_kept, n_sentences,
                   has_lorem_ipsum, has_brace, has_badword,
                   (n_sentences >= 5 AND NOT has_lorem_ipsum
                    AND NOT has_brace AND NOT has_badword) AS c4_keep
            FROM flags
        """,
        "q63_line_dedup": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(coalesce(text, ''))),
                       '\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id,
                     list_transform(
                       generate_series(1, greatest(CAST(ceil(len(ws) / 3.0) AS INT), 1)),
                       i -> array_to_string(ws[(i-1)*3+1 : least(i*3, len(ws))], ' ')
                     ) AS wins
              FROM w
            ), u AS (
              SELECT doc_id,
                     unnest(list_transform(wins, (x, i) ->
                       struct_pack(unit := x, pos := i))) AS s
              FROM g
            ), uu AS (
              SELECT doc_id, s.unit AS unit, s.pos AS pos FROM u
            ), dup AS (
              SELECT unit FROM uu GROUP BY unit
              HAVING count(DISTINCT doc_id) >= 2
            ), stats AS (
              SELECT uu.doc_id,
                     count(*) AS n_units,
                     sum(CASE WHEN dup.unit IS NOT NULL THEN 1 ELSE 0 END) AS n_dup,
                     array_to_string(
                       list(uu.unit ORDER BY uu.pos)
                         FILTER (WHERE dup.unit IS NULL), ' ') AS ct
              FROM uu LEFT JOIN dup ON uu.unit = dup.unit
              GROUP BY uu.doc_id
            )
            SELECT d.doc_id,
                   coalesce(ct, '') AS clean_text,
                   CAST(coalesce(n_units, 0) AS INT) AS n_units,
                   CAST(coalesce(n_dup, 0) AS INT) AS n_dup_units
            FROM documents d LEFT JOIN stats ON d.doc_id = stats.doc_id
        """,
        "q64_url_filter": r"""
            WITH u AS (
              SELECT doc_id,
                     CASE doc_id % 5
                       WHEN 0 THEN 'ads.tracker.example'
                       WHEN 1 THEN 'sub.shop.example'
                       WHEN 2 THEN 'www.news.example'
                       WHEN 3 THEN 'tracker.example'
                       ELSE 'cdn.media.example' END AS host,
                     CASE WHEN doc_id % 9 = 0 THEN '/download/badword/file'
                          ELSE '/p/' || CAST(doc_id AS VARCHAR) END AS path
              FROM documents
            ), f AS (
              SELECT doc_id,
                     'https://' || host || path AS url_canon,
                     (host = 'tracker.example'
                      OR host LIKE '%.tracker.example'
                      OR host = 'media.example'
                      OR host LIKE '%.media.example') AS blocked_domain,
                     list_has_any(
                       string_split_regex(lower('https://' || host || path),
                                          '[^a-z0-9]+'),
                       ['badword']) AS url_badword
              FROM u
            )
            SELECT doc_id, url_canon, blocked_domain, url_badword,
                   (NOT blocked_domain AND NOT url_badword) AS url_allowed
            FROM f
        """,
        "q65_dup_spans": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(coalesce(text, ''))),
                       '\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id, ws,
                     list_transform(
                       generate_series(1, greatest(len(ws) - 4, 0)),
                       i -> struct_pack(s := i - 1,
                                        gram := array_to_string(ws[i : i+4], ' '))
                     ) AS gs
              FROM w
            ), u AS (
              SELECT doc_id, unnest(gs) AS t FROM g
            ), uu AS (
              SELECT doc_id, t.s AS s, t.gram AS gram FROM u
            ), dup AS (
              SELECT gram FROM uu GROUP BY gram HAVING count(*) >= 2
            ), firsts AS (
              SELECT gram, min(struct_pack(doc_id := doc_id, s := s)) AS f
              FROM uu JOIN dup USING (gram) GROUP BY gram
            ), removable AS (
              SELECT uu.doc_id, uu.s
              FROM uu JOIN firsts USING (gram)
              WHERE NOT (uu.doc_id = firsts.f.doc_id AND uu.s = firsts.f.s)
            ), covered AS (
              SELECT DISTINCT doc_id, s + j AS idx
              FROM removable, LATERAL unnest(generate_series(0, 4)) AS o(j)
            ), tt AS (
              SELECT doc_id, t.pos AS pos, t.w AS tok
              FROM (SELECT doc_id,
                           unnest(list_transform(ws, (x, i) ->
                             struct_pack(pos := i - 1, w := x))) AS t
                    FROM w) q
            ), stats AS (
              SELECT tt.doc_id,
                     count(*) AS n_tokens,
                     sum(CASE WHEN c.idx IS NOT NULL THEN 1 ELSE 0 END) AS n_cov,
                     coalesce(array_to_string(
                       list(tt.tok ORDER BY tt.pos)
                         FILTER (WHERE c.idx IS NULL), ' '), '') AS ct
              FROM tt LEFT JOIN covered c
                ON tt.doc_id = c.doc_id AND tt.pos = c.idx
              GROUP BY tt.doc_id
            ), nstarts AS (
              SELECT doc_id, count(*) AS n_starts FROM removable GROUP BY doc_id
            )
            SELECT s.doc_id,
                   s.ct AS clean_text,
                   CAST(s.n_tokens AS INT) AS n_tokens,
                   CAST(coalesce(n.n_starts, 0) AS INT) AS n_dup_starts,
                   CAST(s.n_cov AS INT) AS n_covered,
                   round(CAST(s.n_cov AS DOUBLE)
                         / greatest(s.n_tokens, 1), 6) AS dup_token_frac
            FROM stats s LEFT JOIN nstarts n ON s.doc_id = n.doc_id
        """,
        "q66_sitemap_entries": r"""
            WITH built AS (
              SELECT doc_id,
                     'https://s' || (doc_id % 20) || '.example/sitemap.xml'
                       AS sitemap_url,
                     CASE doc_id % 5 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
                       WHEN 2 THEN 'monthly' WHEN 3 THEN 'never' ELSE '' END
                       AS cf,
                     '<urlset><url><loc>https://s' || (doc_id % 20)
                     || '.example/p/' || doc_id || '</loc><lastmod>2026-'
                     || lpad(CAST(doc_id % 9 + 1 AS VARCHAR), 2, '0') || '-'
                     || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                     || '</lastmod>'
                     || CASE WHEN doc_id % 5 >= 4 THEN ''
                          ELSE '<changefreq>'
                               || CASE doc_id % 5 WHEN 0 THEN 'daily'
                                    WHEN 1 THEN 'weekly' WHEN 2 THEN 'monthly'
                                    ELSE 'never' END
                               || '</changefreq>' END
                     || '<priority>0.' || (doc_id % 10)
                     || '</priority></url><url><loc>https://s' || (doc_id % 20)
                     || '.example/q/' || doc_id
                     || '&amp;x</loc></url></urlset>' AS body
              FROM documents
            ), blocks AS (
              SELECT sitemap_url,
                     unnest(regexp_extract_all(body, '(?s)<url>(.*?)</url>', 1))
                       AS b
              FROM built
            ), fields AS (
              SELECT sitemap_url,
                     regexp_extract(b, '<loc>\s*([^<]+?)\s*</loc>', 1) AS rawloc,
                     nullif(regexp_extract(b,
                       '<lastmod>\s*([^<]+?)\s*</lastmod>', 1), '') AS lastmod,
                     nullif(regexp_extract(b,
                       '<changefreq>\s*([^<]+?)\s*</changefreq>', 1), '')
                       AS changefreq,
                     nullif(regexp_extract(b,
                       '<priority>\s*([^<]+?)\s*</priority>', 1), '') AS rawprio
              FROM blocks
            )
            SELECT sitemap_url,
                   replace(replace(replace(replace(replace(rawloc,
                     '&apos;', chr(39)), '&quot;', '"'),
                     '&gt;', '>'), '&lt;', '<'), '&amp;', '&') AS loc,
                   lastmod,
                   try_cast(substr(lastmod, 1, 10) AS DATE) AS lastmod_date,
                   changefreq,
                   try_cast(rawprio AS DOUBLE) AS priority,
                   CASE lower(changefreq)
                     WHEN 'always' THEN 60 WHEN 'hourly' THEN 3600
                     WHEN 'daily' THEN 86400 WHEN 'weekly' THEN 604800
                     WHEN 'monthly' THEN 2592000 WHEN 'yearly' THEN 31536000
                     WHEN 'never' THEN 31536000 END AS hint_s
            FROM fields WHERE rawloc <> ''
        """,
        "q67_tfidf_topk": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)),
                       '\s+', ' ', 'g'), ' ') AS ws
              FROM documents WHERE length(trim(text)) > 0
            ), t AS (
              SELECT doc_id AS id, unnest(ws) AS term FROM w
            ), n AS (
              SELECT count(DISTINCT id) AS n_docs FROM t
            ), tf AS (
              SELECT id, term, count(*) AS tf FROM t GROUP BY id, term
            ), df_t AS (
              SELECT term, count(DISTINCT id) AS df FROM t GROUP BY term
            ), scored AS (
              SELECT id, term, tf, df,
                     tf * (ln(CAST(n_docs AS DOUBLE))
                           - ln(CAST(df AS DOUBLE))) AS x
              FROM tf JOIN df_t USING (term), n
            ), ranked AS (
              SELECT id, term, tf, df, x,
                     row_number() OVER (PARTITION BY id
                                        ORDER BY x DESC, term ASC) AS rank
              FROM scored
            )
            SELECT id, term, tf, df, round(x, 6) AS tfidf,
                   CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "q68_bigram_logprob": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)),
                       '\s+', ' ', 'g'), ' ') AS ws
              FROM documents WHERE length(trim(text)) > 0
            ), uni AS (
              SELECT word, count(*) AS c1
              FROM (SELECT unnest(ws) AS word FROM w) q GROUP BY word
            ), tot AS (
              SELECT sum(c1) AS t FROM uni
            ), g AS (
              SELECT doc_id,
                     list_transform(
                       generate_series(1, greatest(len(ws) - 1, 0)),
                       i -> struct_pack(p := ws[i], c := ws[i+1])) AS gs
              FROM w
            ), u2 AS (
              SELECT doc_id, unnest(gs) AS s FROM g
            ), pairs AS (
              SELECT doc_id, s.p AS p, s.c AS c FROM u2
            ), big AS (
              SELECT p, c, count(*) AS c2 FROM pairs GROUP BY p, c
            ), lp AS (
              SELECT pairs.doc_id,
                     -- CASTs force IEEE-double arithmetic: DuckDB's bare
                     -- 0.9 is DECIMAL (1.0-0.9 would be an EXACT 0.1,
                     -- not Spark's 0.09999999999999998)
                     ln(CAST(0.9 AS DOUBLE) * b.c2 / up.c1
                        + (CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE))
                          * uc.c1 / t.t) AS l
              FROM pairs
              JOIN big b ON pairs.p = b.p AND pairs.c = b.c
              JOIN uni up ON pairs.p = up.word
              JOIN uni uc ON pairs.c = uc.word
              CROSS JOIN tot t
            ), agg AS (
              SELECT doc_id, count(*) AS nb, round(avg(l), 6) AS s
              FROM lp GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
                   s AS avg_logprob2
            FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        """,
        "q69_anchor_profile": r"""
            WITH pages AS (
              SELECT 'https://s' || (doc_id % 100) || '.example/' AS src_url,
                     '<div><a href="https://t.example/p/' || (doc_id % 50)
                     || '">visit page ' || (doc_id % 7)
                     || '</a> filler <a href=' || chr(39)
                     || 'https://t.example/q/' || (doc_id % 30)
                     || chr(39) || '><b>read</b>  more</a></div>' AS html
              FROM documents
            ), elems AS (
              SELECT src_url,
                     unnest(regexp_extract_all(html,
                       '(?is)<a\s(?:[^>]*?\s)?href\s*=\s*(?:"[^"]*"|' || chr(39)
                       || '[^' || chr(39) || ']*' || chr(39) || ')[^>]*>.*?</a>',
                       0)) AS a
              FROM pages
            ), anch AS (
              SELECT src_url,
                     CASE WHEN regexp_extract(a, '(?is)\shref\s*=\s*"([^"]*)"', 1) <> ''
                          THEN regexp_extract(a, '(?is)\shref\s*=\s*"([^"]*)"', 1)
                          ELSE regexp_extract(a,
                            '(?is)\shref\s*=\s*' || chr(39) || '([^' || chr(39)
                            || ']*)' || chr(39), 1)
                     END AS href,
                     trim(regexp_replace(regexp_replace(
                       regexp_extract(a, '(?is)^<a[^>]*>(.*)</a>$', 1),
                       '<[^>]+>', ' ', 'g'), '\s+', ' ', 'g')) AS anchor_text
              FROM elems
            ), anchors AS (
              SELECT * FROM anch WHERE href <> ''
            ), words AS (
              SELECT href, src_url,
                     unnest(list_filter(string_split(
                       regexp_replace(lower(trim(anchor_text)), '\s+', ' ', 'g'),
                       ' '), w -> length(w) > 0)) AS term
              FROM anchors
            ), counts AS (
              SELECT href, term, count(*) AS term_count
              FROM words GROUP BY href, term
            ), totals AS (
              SELECT href, count(*) AS n_anchors,
                     count(DISTINCT src_url) AS n_sources
              FROM anchors GROUP BY href
            ), ranked AS (
              SELECT href, term, term_count,
                     row_number() OVER (PARTITION BY href
                       ORDER BY term_count DESC, term ASC) AS rank
              FROM counts
            )
            SELECT r.href, r.term, r.term_count, CAST(r.rank AS INT) AS rank,
                   t.n_anchors, t.n_sources
            FROM ranked r JOIN totals t ON r.href = t.href
            WHERE r.rank <= 2
        """,
        "q70_hits": r"""
            WITH d AS (SELECT doc_id FROM documents),
            nn AS (SELECT count(*) AS n FROM d),
            edges AS (
              SELECT src, (src*37 + j*1009) % nn.n AS dst
              FROM (SELECT doc_id AS src, unnest([1,2,3]) AS j FROM d) q,
                   nn
              WHERE (src*37 + j*1009) % nn.n <> src
            ),
            h0 AS (SELECT doc_id AS node, CAST(1.0 AS DOUBLE) AS h FROM d),
            a1s AS (SELECT dst AS node, sum(h) AS s
                    FROM edges JOIN h0 ON edges.src = h0.node GROUP BY dst),
            a1r AS (SELECT d.doc_id AS node, coalesce(s, 0.0) AS a
                    FROM d LEFT JOIN a1s ON d.doc_id = a1s.node),
            a1t AS (SELECT sum(a) AS t FROM a1r),
            a1 AS (SELECT node,
                          round(a / (CASE WHEN t > 0 THEN t ELSE 1.0 END), 12) AS a
                   FROM a1r, a1t),
            h1s AS (SELECT src AS node, sum(a) AS s
                    FROM edges JOIN a1 ON edges.dst = a1.node GROUP BY src),
            h1r AS (SELECT d.doc_id AS node, coalesce(s, 0.0) AS h
                    FROM d LEFT JOIN h1s ON d.doc_id = h1s.node),
            h1t AS (SELECT sum(h) AS t FROM h1r),
            h1 AS (SELECT node,
                          round(h / (CASE WHEN t > 0 THEN t ELSE 1.0 END), 12) AS h
                   FROM h1r, h1t),
            a2s AS (SELECT dst AS node, sum(h) AS s
                    FROM edges JOIN h1 ON edges.src = h1.node GROUP BY dst),
            a2r AS (SELECT d.doc_id AS node, coalesce(s, 0.0) AS a
                    FROM d LEFT JOIN a2s ON d.doc_id = a2s.node),
            a2t AS (SELECT sum(a) AS t FROM a2r),
            a2 AS (SELECT node,
                          round(a / (CASE WHEN t > 0 THEN t ELSE 1.0 END), 12) AS a
                   FROM a2r, a2t),
            h2s AS (SELECT src AS node, sum(a) AS s
                    FROM edges JOIN a2 ON edges.dst = a2.node GROUP BY src),
            h2r AS (SELECT d.doc_id AS node, coalesce(s, 0.0) AS h
                    FROM d LEFT JOIN h2s ON d.doc_id = h2s.node),
            h2t AS (SELECT sum(h) AS t FROM h2r),
            h2 AS (SELECT node,
                          round(h / (CASE WHEN t > 0 THEN t ELSE 1.0 END), 12) AS h
                   FROM h2r, h2t)
            SELECT a2.node, round(a2.a, 6) AS authority,
                   round(h2.h, 6) AS hub
            FROM a2 JOIN h2 ON a2.node = h2.node
        """,
        "q71_registered_domain": f"""
            -- generic PSL replay (exception rules PREVAIL and yield the
            -- rule minus its leftmost label; else longest match among
            -- exact rules, wildcard expansions, and the implicit '*'),
            -- NOT the residue shortcut. labs = host labels, s_i = the
            -- i-label dot-suffix; b = exc_b > 0 ? exc_b - 1 : base_b.
            WITH hosts AS (
              SELECT doc_id, {_SYNTH_HOST_SQL} AS host
              FROM documents
            ), {_PSL_KEY_SQL}
            SELECT doc_id, host,
                   CASE WHEN b > 0
                        THEN array_to_string(labs[n-b+1:n], '.') END AS public_suffix,
                   CASE WHEN n > b AND b > 0
                        THEN array_to_string(labs[n-b:n], '.') END AS registered_domain,
                   coalesce(CASE WHEN n > b AND b > 0
                        THEN array_to_string(labs[n-b:n], '.') END, host) AS domain_key
            FROM best
        """,
        "q72_domain_rollup": f"""
            WITH hosts AS (
              SELECT doc_id, {_SYNTH_HOST_SQL} AS host
              FROM documents
            ), {_PSL_KEY_SQL}, keyed AS (
              SELECT doc_id, host,
                     coalesce(CASE WHEN n > b AND b > 0
                          THEN array_to_string(labs[n-b:n], '.') END, host) AS domain_key
              FROM best
            ), base AS (
              SELECT k.domain_key, k.host, d.text,
                     CASE WHEN length(trim(d.text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(d.text), '\\s+'))
                     END AS t,
                     LEAST(d.n_chars / 1000.0, 1.0) AS q
              FROM keyed k JOIN documents d USING (doc_id)
            ), per_dom AS (
              SELECT domain_key, COUNT(*) AS n_docs,
                     COUNT(DISTINCT host) AS n_hosts,
                     COUNT(DISTINCT text) AS n_unique,
                     CAST(SUM(t) AS BIGINT) AS total_tokens,
                     AVG(q) AS avg_q
              FROM base GROUP BY domain_key
            ), tot AS (SELECT CAST(SUM(total_tokens) AS BIGINT) AS ct FROM per_dom)
            SELECT domain_key, n_docs, n_hosts, n_unique,
                   round(1.0 - n_unique / CAST(n_docs AS DOUBLE), 6) AS dup_rate,
                   total_tokens,
                   round(CAST(total_tokens AS DOUBLE) / ct, 9) AS token_share,
                   round(avg_q, 6) AS avg_quality
            FROM per_dom, tot
        """,
        "q73_bitext_margin": """
            -- margin = cos / ((avg_k fwd + avg_k bwd) / 2); cosine is
            -- q18's explicit double fold; rounding ladder 12 (cosine) /
            -- 9 (k-NN averages) / 6 (margin) shared with the Spark side
            WITH src AS (
              SELECT vec_id AS src_id, embedding AS sv FROM embeddings WHERE vec_id % 2 = 0
            ), tgt AS (
              SELECT vec_id AS tgt_id, embedding AS tv FROM embeddings WHERE vec_id % 2 = 1
            ), pairs AS (
              SELECT src_id, tgt_id,
                     round(
                       list_sum(list_transform(generate_series(1, 64),
                           i -> CAST(sv[i] AS DOUBLE) * CAST(tv[i] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(generate_series(1, 64),
                           i -> CAST(sv[i] AS DOUBLE) * CAST(sv[i] AS DOUBLE))))
                        * sqrt(list_sum(list_transform(generate_series(1, 64),
                           i -> CAST(tv[i] AS DOUBLE) * CAST(tv[i] AS DOUBLE)))))
                     , 12) AS cosine
              FROM src, tgt
            ), asrc AS (
              SELECT src_id, round(AVG(cosine), 9) AS a FROM (
                SELECT src_id, cosine,
                       row_number() OVER (PARTITION BY src_id ORDER BY cosine DESC, tgt_id ASC) AS r
                FROM pairs
              ) WHERE r <= 4 GROUP BY src_id
            ), atgt AS (
              SELECT tgt_id, round(AVG(cosine), 9) AS a FROM (
                SELECT tgt_id, cosine,
                       row_number() OVER (PARTITION BY tgt_id ORDER BY cosine DESC, src_id ASC) AS r
                FROM pairs
              ) WHERE r <= 4 GROUP BY tgt_id
            ), scored AS (
              SELECT p.src_id, p.tgt_id, p.cosine,
                     round(CASE WHEN (s.a + t.a) = 0 THEN 0.0
                           ELSE p.cosine / ((s.a + t.a) / 2.0) END, 6) AS margin
              FROM pairs p JOIN asrc s USING (src_id) JOIN atgt t USING (tgt_id)
            )
            SELECT src_id, tgt_id, cosine, margin FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY src_id
                  ORDER BY margin DESC, cosine DESC, tgt_id ASC) AS rb
              FROM scored
            ) WHERE rb = 1
        """,
        "q74_bm25_topk": r"""
            -- BM25 with Lucene idf = ln(1 + (N - df + .5)/(df + .5));
            -- k1=1.2, b=0.75; dl constant per doc (MIN == Spark's first);
            -- rank on the 6-dp ROUNDED score then id (sum order varies
            -- at 1e-16 between engines)
            WITH base AS (
              SELECT doc_id AS id,
                     string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
              FROM documents WHERE length(trim(text)) > 0
            ), stats AS (
              SELECT COUNT(*) AS n, AVG(len(toks)) AS avgdl FROM base
            ), tok AS (
              SELECT id, len(toks) AS dl, unnest(toks) AS term FROM base
            ), tf AS (
              SELECT id, term, COUNT(*) AS tf, MIN(dl) AS dl
              FROM tok GROUP BY id, term
            ), dfreq AS (
              SELECT term, COUNT(*) AS df FROM tf GROUP BY term
            ), qt AS (
              -- repeats (within a query string or across rows of one
              -- query_id) become integer term weights, mirroring the
              -- Spark side's query aggregate
              SELECT query_id, term, COUNT(*) AS qw FROM (
                SELECT query_id,
                       unnest(string_split(
                         regexp_replace(lower(trim(q)), '\s+', ' ', 'g'), ' ')) AS term
                FROM (VALUES (0, 'spark window agg'), (1, 'hash join table'),
                             (2, 'fast scan filter sort')) AS v(query_id, q)
              ) GROUP BY query_id, term
            ), contrib AS (
              SELECT q.query_id, t.id,
                     q.qw * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
                     * t.tf * (1.2 + 1.0)
                     / (t.tf + 1.2 * (1 - 0.75 + 0.75 * t.dl / s.avgdl)) AS c
              FROM tf t JOIN qt q USING (term) JOIN dfreq d USING (term), stats s
            ), scored AS (
              SELECT query_id, id, round(SUM(c), 6) AS score
              FROM contrib GROUP BY query_id, id
            )
            SELECT query_id, id, score, CAST(rk AS INT) AS rank FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY score DESC, id ASC) AS rk
              FROM scored
            ) WHERE rk <= 10
        """,
        "q75_dsir_select": r"""
            -- DSIR: add-1-smoothed hashed-ngram models (D=16384), target
            -- = doc_id % 17 == 0, raw = all docs; log w = sum over
            -- feature occurrences of ln p_t(b) - ln p_r(b); rank on the
            -- 6-dp rounded weight (sum order varies at 1e-15), id ties
            WITH docs AS (
              SELECT doc_id,
                     regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
              FROM documents
            ), words AS (
              SELECT doc_id, string_split(norm, ' ') AS ws
              FROM docs WHERE length(norm) > 0
            ), feats AS (
              SELECT doc_id, unnest(ws) AS f FROM words
              UNION ALL
              SELECT doc_id,
                     unnest(list_transform(range(1, len(ws)),
                                           i -> ws[i] || ' ' || ws[i+1])) AS f
              FROM words
            ), bucketed AS (
              SELECT doc_id,
                     (list_reduce(
                        list_prepend(CAST(0 AS BIGINT),
                          list_transform(range(1, length(f) + 1),
                            i -> CAST(unicode(substring(f, CAST(i AS INT), 1)) AS BIGINT))),
                        (acc, cp) -> (acc * 31 + cp) % 1000000007)
                      * 2654435761) % 16384 AS bucket
              FROM feats
            ), rawc AS (
              SELECT bucket, COUNT(*) AS cr FROM bucketed GROUP BY bucket
            ), tgtc AS (
              SELECT bucket, COUNT(*) AS ct FROM bucketed
              WHERE doc_id % 17 = 0 GROUP BY bucket
            ), tot AS (
              SELECT (SELECT SUM(cr) FROM rawc) AS tr,
                     (SELECT SUM(ct) FROM tgtc) AS tt
            ), ratio AS (
              SELECT r.bucket,
                     ln(coalesce(t.ct, 0) + 1.0) - ln(tt + 16384.0)
                     - ln(r.cr + 1.0) + ln(tr + 16384.0) AS lr
              FROM rawc r LEFT JOIN tgtc t USING (bucket), tot
            ), perdoc AS (
              SELECT b.doc_id, COUNT(*) AS n_feats,
                     round(SUM(ratio.lr), 6) AS log_weight
              FROM bucketed b JOIN ratio USING (bucket)
              GROUP BY b.doc_id
            )
            SELECT doc_id, n_feats, log_weight,
                   log_weight AS sel_score, CAST(rk AS INT) AS rank
            FROM (
              SELECT *, row_number() OVER (
                  ORDER BY log_weight DESC, doc_id ASC) AS rk
              FROM perdoc
            ) WHERE rk <= 50
        """,
        "q76_semdedup": """
            -- SemDedup: assign to the 8 lowest-id anchor vectors by
            -- 6-dp-rounded cosine (ties -> lowest anchor id); within a
            -- cluster, a vector is a dup iff an EARLIER id is >= 0.35
            -- cosine away. Dot products fold index-ordered in double
            -- (q19's convention) so both engines round identically.
            WITH v AS (
              SELECT vec_id, embedding FROM embeddings
            ), anch AS (
              SELECT vec_id AS aid, embedding AS avec
              FROM v ORDER BY vec_id LIMIT 8
            ), sims AS (
              SELECT v.vec_id, a.aid,
                     round(
                       list_sum(list_transform(generate_series(1, 64),
                           i -> CAST(v.embedding[i] AS DOUBLE) * CAST(a.avec[i] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(generate_series(1, 64),
                           i -> CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE))))
                        * sqrt(list_sum(list_transform(generate_series(1, 64),
                           i -> CAST(a.avec[i] AS DOUBLE) * CAST(a.avec[i] AS DOUBLE)))))
                     , 6) AS cs
              FROM v CROSS JOIN anch a
            ), assign AS (
              SELECT vec_id, aid AS cluster FROM (
                SELECT vec_id, aid, row_number() OVER (
                    PARTITION BY vec_id ORDER BY cs DESC, aid ASC) AS rn
                FROM sims
              ) WHERE rn = 1
            ), dups AS (
              SELECT DISTINCT y.vec_id AS dup_id
              FROM assign x
              JOIN assign y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
              JOIN v vx ON vx.vec_id = x.vec_id
              JOIN v vy ON vy.vec_id = y.vec_id
              WHERE round(
                      list_sum(list_transform(generate_series(1, 64),
                          i -> CAST(vx.embedding[i] AS DOUBLE) * CAST(vy.embedding[i] AS DOUBLE)))
                      / (sqrt(list_sum(list_transform(generate_series(1, 64),
                          i -> CAST(vx.embedding[i] AS DOUBLE) * CAST(vx.embedding[i] AS DOUBLE))))
                       * sqrt(list_sum(list_transform(generate_series(1, 64),
                          i -> CAST(vy.embedding[i] AS DOUBLE) * CAST(vy.embedding[i] AS DOUBLE)))))
                    , 6) >= 0.35
            )
            SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
                   (d.dup_id IS NULL) AS keep
            FROM assign a LEFT JOIN dups d ON a.vec_id = d.dup_id
        """,
        "q77_soft_dedup": r"""
            -- SoftDeDup down-weighting: weight = 1/n over the exact
            -- normalized-text cluster; NULL/empty texts coalesce to ''
            -- and cluster together (the engine's documented identity).
            WITH norm AS (
              SELECT doc_id,
                     coalesce(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                              '') AS n
              FROM documents
            ), c AS (
              SELECT n, count(*) AS dup_count FROM norm GROUP BY n
            )
            SELECT norm.doc_id, c.dup_count,
                   round(1.0 / c.dup_count, 9) AS weight
            FROM norm JOIN c USING (n)
        """,
        "q78_cdc_chunks": r"""
            -- Content-defined chunking: a word ENDS a chunk when the
            -- q51 hash coin (poly-31 fold mod 1e9+7, Knuth mix) lands
            -- on 0 mod 8; the final word closes the last chunk. A chunk
            -- is duplicated when its string occurs >= 2x corpus-wide
            -- (multiplicity included).
            WITH norm AS (
              SELECT doc_id,
                     coalesce(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                              '') AS n
              FROM documents
            ), words AS (
              SELECT doc_id, string_split(n, ' ') AS ws, length(n) AS ln FROM norm
            ), bounds AS (
              SELECT doc_id, ws, ln,
                     list_filter(range(1, len(ws) + 1),
                       i -> (list_reduce(
                               list_prepend(CAST(0 AS BIGINT),
                                 list_transform(range(1, length(ws[i]) + 1),
                                   j -> CAST(unicode(substring(ws[i], CAST(j AS INT), 1)) AS BIGINT))),
                               (acc, cp) -> (acc * 31 + cp) % 1000000007)
                             * 2654435761) % 8 = 0) AS bpos
              FROM words
            ), ends AS (
              SELECT doc_id, ws, ln,
                     CASE WHEN coalesce(bpos[-1], 0) < len(ws)
                          THEN list_append(bpos, len(ws)) ELSE bpos END AS e
              FROM bounds
            ), chunks AS (
              SELECT doc_id,
                     CASE WHEN ln = 0 THEN []
                     ELSE list_transform(range(1, len(e) + 1),
                       k -> array_to_string(
                              ws[CASE WHEN k = 1 THEN 1 ELSE e[k-1] + 1 END : e[k]],
                              ' '))
                     END AS cs
              FROM ends
            ), ch AS (
              SELECT doc_id, unnest(cs) AS c FROM chunks
            ), cnt AS (
              SELECT c, count(*) AS cn FROM ch GROUP BY c
            ), per_doc AS (
              SELECT ch.doc_id, count(*) AS n_chunks,
                     sum(CASE WHEN cnt.cn >= 2 THEN 1 ELSE 0 END) AS n_dup_chunks
              FROM ch JOIN cnt USING (c) GROUP BY ch.doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(p.n_chunks, 0) AS BIGINT) AS n_chunks,
                   CAST(coalesce(p.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
                   round(coalesce(p.n_dup_chunks, 0) * 1.0
                         / greatest(coalesce(p.n_chunks, 0), 1), 6) AS dup_chunk_frac
            FROM documents d LEFT JOIN per_doc p USING (doc_id)
        """,
        "q79_phrase_search": r"""
            -- Exact-phrase top-k: a hit is a start position s where the
            -- normalized word slice equals the phrase's term list
            -- (overlaps counted). Ties: n_hits desc, doc id asc.
            WITH ph AS (
              SELECT phrase_id,
                     string_split(regexp_replace(lower(trim(phrase)),
                                                 '\s+', ' ', 'g'), ' ') AS pts
              FROM (VALUES (0, 'table scan merge'), (1, 'batch batch'),
                           (2, 'sort merge'), (3, 'window'),
                           (4, 'no such phrase here')) AS t(phrase_id, phrase)
            ), docs AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)),
                                                 '\s+', ' ', 'g'), ' ') AS ws
              FROM documents WHERE length(trim(text)) > 0
            ), hits AS (
              SELECT ph.phrase_id, d.doc_id AS id,
                     len(list_filter(range(1, len(d.ws) - len(ph.pts) + 2),
                         s -> d.ws[s : s + len(ph.pts) - 1] = ph.pts)) AS n_hits
              FROM docs d CROSS JOIN ph
            )
            SELECT phrase_id, id, CAST(n_hits AS INT) AS n_hits,
                   CAST(rk AS INT) AS rank
            FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY phrase_id ORDER BY n_hits DESC, id ASC) AS rk
              FROM hits WHERE n_hits >= 1
            ) WHERE rk <= 10
        """,
        "q80_containment": r"""
            -- Containment pairs: candidates share >=1 gram with corpus
            -- df in [2, 20]; containment/Jaccard exact on candidates.
            -- Gram identity: q10's distinct word 3-grams (short texts
            -- degrade to [normalized text]).
            WITH toks AS (
              SELECT doc_id AS id,
                     string_split(regexp_replace(lower(trim(coalesce(text, ''))),
                                                 '\s+', ' ', 'g'), ' ') AS w,
                     regexp_replace(lower(trim(coalesce(text, ''))), '\s+', ' ', 'g') AS nrm
              FROM documents
            ), grams AS (
              SELECT id,
                     CASE WHEN len(w) >= 3 THEN
                       list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                      for i in generate_series(1, len(w)-2)])
                     ELSE [nrm] END AS g
              FROM toks
            ), postings AS (
              SELECT id, unnest(g) AS gr FROM grams
            ), rare AS (
              SELECT gr FROM postings GROUP BY gr HAVING count(*) BETWEEN 2 AND 20
            ), keyed AS (
              SELECT p.id, p.gr FROM postings p JOIN rare USING (gr)
            ), cand AS (
              SELECT DISTINCT x.id AS id_a, y.id AS id_b
              FROM keyed x JOIN keyed y ON x.gr = y.gr AND x.id < y.id
            )
            SELECT id_a, id_b,
                   round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                         / greatest(len(a.g), 1), 6) AS containment_a,
                   round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                         / greatest(len(b.g), 1), 6) AS containment_b,
                   round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                         / greatest(len(a.g) + len(b.g)
                                    - len(list_intersect(a.g, b.g)), 1), 6) AS jaccard
            FROM cand JOIN grams a ON a.id = cand.id_a
                      JOIN grams b ON b.id = cand.id_b
            WHERE greatest(
                    round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                          / greatest(len(a.g), 1), 6),
                    round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                          / greatest(len(b.g), 1), 6)) >= 0.5
        """,
        "q81_shard_corpus": """
            -- Deterministic shuffle/shard: shard = Knuth coin mod 16,
            -- within-shard order = same key scrambled mod 1e9+7, dense
            -- row_number per shard, ties by key.
            WITH k AS (
              SELECT doc_id,
                     CAST(((doc_id % 1000000007) * 2654435761) % 16 AS INT) AS shard,
                     ((doc_id % 1000000007) * 2654435761) % 1000000007 AS okey
              FROM documents
            )
            SELECT doc_id, shard,
                   CAST(row_number() OVER (
                       PARTITION BY shard ORDER BY okey ASC, doc_id ASC) AS INT) AS pos
            FROM k
        """,
        "q82_script_profile": """
            -- Unicode script counts over the core blocks; dominant =
            -- argmax with declaration-order ties (a later script wins
            -- only on STRICTLY greater count), 'none' when no listed-
            -- script codepoint occurs. NULL text counts as empty.
            WITH cps AS (
              SELECT doc_id,
                     list_transform(range(1, length(coalesce(text,'')) + 1),
                        i -> unicode(substring(coalesce(text,''), CAST(i AS INT), 1))) AS cp
              FROM documents
            ), c AS (
              SELECT doc_id,
                     len(list_filter(cp, x -> (x BETWEEN 65 AND 90) OR (x BETWEEN 97 AND 122)
                                            OR (x BETWEEN 192 AND 591) OR (x BETWEEN 7680 AND 7935))) AS latin_n,
                     len(list_filter(cp, x -> x BETWEEN 1024 AND 1279)) AS cyrillic_n,
                     len(list_filter(cp, x -> x BETWEEN 880 AND 1023)) AS greek_n,
                     len(list_filter(cp, x -> x BETWEEN 1536 AND 1791)) AS arabic_n,
                     len(list_filter(cp, x -> x BETWEEN 1424 AND 1535)) AS hebrew_n,
                     len(list_filter(cp, x -> x BETWEEN 2304 AND 2431)) AS devanagari_n,
                     len(list_filter(cp, x -> x BETWEEN 19968 AND 40959)) AS han_n,
                     len(list_filter(cp, x -> x BETWEEN 12352 AND 12543)) AS kana_n,
                     len(list_filter(cp, x -> x BETWEEN 44032 AND 55215)) AS hangul_n
              FROM cps
            )
            SELECT doc_id,
                   CAST(latin_n + cyrillic_n + greek_n + arabic_n + hebrew_n
                        + devanagari_n + han_n + kana_n + hangul_n AS BIGINT) AS n_scripted,
                   CAST(latin_n AS BIGINT) AS latin_n,
                   CAST(cyrillic_n AS BIGINT) AS cyrillic_n,
                   CAST(greek_n AS BIGINT) AS greek_n,
                   CAST(arabic_n AS BIGINT) AS arabic_n,
                   CAST(hebrew_n AS BIGINT) AS hebrew_n,
                   CAST(devanagari_n AS BIGINT) AS devanagari_n,
                   CAST(han_n AS BIGINT) AS han_n,
                   CAST(kana_n AS BIGINT) AS kana_n,
                   CAST(hangul_n AS BIGINT) AS hangul_n,
                   CASE greatest(latin_n, cyrillic_n, greek_n, arabic_n, hebrew_n,
                                 devanagari_n, han_n, kana_n, hangul_n)
                        WHEN 0 THEN 'none'
                        WHEN latin_n THEN 'latin'
                        WHEN cyrillic_n THEN 'cyrillic'
                        WHEN greek_n THEN 'greek'
                        WHEN arabic_n THEN 'arabic'
                        WHEN hebrew_n THEN 'hebrew'
                        WHEN devanagari_n THEN 'devanagari'
                        WHEN han_n THEN 'han'
                        WHEN kana_n THEN 'kana'
                        ELSE 'hangul' END AS dominant_script
            FROM c
        """,
        "q83_domain_budget": r"""
            -- Two-level cumulative-rounding budget allocation: level-1
            -- across poly-31-hash buckets (q51 convention), level-2
            -- across domains in key order; hugeint floors replay
            -- Spark's decimal(38) arithmetic exactly. Sums to 1000.
            WITH dom AS (
              SELECT 's' || CAST(doc_id % 13 AS VARCHAR) || '.h'
                     || CAST(doc_id % 7 AS VARCHAR) || '.example' AS domain,
                     count(*) AS weight
              FROM documents GROUP BY 1
            ), bk AS (
              SELECT domain, weight,
                     CAST((list_reduce(
                             list_prepend(CAST(0 AS BIGINT),
                               list_transform(range(1, length(domain) + 1),
                                 i -> CAST(unicode(substring(domain, CAST(i AS INT), 1)) AS BIGINT))),
                             (acc, cp) -> (acc * 31 + cp) % 1000000007)
                           * 2654435761) % 8 AS INT) AS bkt
              FROM dom
            ), bw AS (
              SELECT bkt, sum(weight) AS bwt FROM bk GROUP BY bkt
            ), lvl1 AS (
              SELECT bkt, bwt,
                     sum(bwt) OVER (ORDER BY bkt ASC ROWS UNBOUNDED PRECEDING) AS cumw,
                     sum(bwt) OVER () AS W
              FROM bw
            ), bb AS (
              SELECT bkt, bwt,
                     CASE WHEN W <= 0 THEN 0
                          ELSE (1000::HUGEINT * cumw) // W
                               - (1000::HUGEINT * (cumw - bwt)) // W
                     END AS bbudget
              FROM lvl1
            ), lvl2 AS (
              SELECT bk.domain, bk.weight, bb.bwt, bb.bbudget,
                     sum(bk.weight) OVER (PARTITION BY bk.bkt ORDER BY bk.domain ASC
                                          ROWS UNBOUNDED PRECEDING) AS cum
              FROM bk JOIN bb USING (bkt)
            )
            SELECT domain, weight,
                   CAST(CASE WHEN bwt <= 0 OR weight <= 0 THEN 0
                        ELSE (bbudget::HUGEINT * cum) // bwt
                             - (bbudget::HUGEINT * (cum - weight)) // bwt
                        END AS BIGINT) AS budget
            FROM lvl2
        """,
        "q84_connected_components": r"""
            -- Undirected connected components by recursive label
            -- closure: propagate every reachable node id, take the min
            -- per node — the exact fixpoint the Spark pointer-jumping
            -- computes. Same deterministic edge formula.
            WITH RECURSIVE nn AS (
              SELECT count(*) AS n FROM documents
            ), e0 AS (
              SELECT doc_id AS src, doc_id + 1 AS dst FROM documents, nn
              WHERE (doc_id + 1) % 50 <> 0 AND doc_id % 11 <> 9
                AND doc_id + 1 < nn.n
              UNION ALL
              SELECT doc_id, (doc_id + 137) % nn.n FROM documents, nn
              WHERE doc_id % 97 = 0
            ), sym AS (
              SELECT src AS a, dst AS b FROM e0 WHERE src <> dst
              UNION
              SELECT dst, src FROM e0 WHERE src <> dst
            ), reach(node, lbl) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node
            )
            SELECT node, min(lbl) AS component FROM reach GROUP BY node
        """,
        "q85_weighted_sample": r"""
            -- Bottom-k weighted sample: replay every integer ticket
            -- coin (stride 17 = ticket_cap+1) and take the 100 smallest
            -- row minima, doc_id tiebreak.
            WITH w AS (
              SELECT doc_id,
                     least(16, 1 + n_chars // 400) AS weight
              FROM documents
            ), keys AS (
              SELECT doc_id, weight,
                     list_min(list_transform(range(1, weight + 1),
                       j -> (((doc_id * 17 + j) % 1000000007)
                             * 2654435761) % 1000000007)) AS ticket_key
              FROM w
            )
            SELECT doc_id, weight, ticket_key
            FROM keys ORDER BY ticket_key ASC, doc_id ASC LIMIT 100
        """,
        "q86_heavy_hitters": r"""
            -- Exact top-50 token counts (the MG exactness regime's
            -- ground truth), corpus tokenization convention (q31):
            -- lower/trim/collapse-whitespace, single-space split.
            WITH toks AS (
              SELECT unnest(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                       ' ')) AS term
              FROM documents
              WHERE text IS NOT NULL AND length(trim(text)) > 0
            ), c AS (
              SELECT term, count(*) AS term_count FROM toks
              WHERE term <> '' GROUP BY term
            )
            SELECT term, term_count,
                   row_number() OVER (ORDER BY term_count DESC, term ASC)
                     AS rank
            FROM c ORDER BY term_count DESC, term ASC LIMIT 50
        """,
        "q87_neighborhood_function": r"""
            -- Exact truncated neighborhood function: enumerate paths
            -- to depth 4 (out-degree <= 2 bounds the blowup), take the
            -- min distance per pair, count balls per radius; harmonic
            -- from the counts in the Spark expression's exact term
            -- order.
            WITH RECURSIVE nn AS (
              SELECT count(*) AS n FROM documents
            ), e0 AS (
              SELECT doc_id AS src, doc_id + 1 AS dst FROM documents, nn
              WHERE (doc_id + 1) % 50 <> 0 AND doc_id % 11 <> 9
                AND doc_id + 1 < nn.n
              UNION ALL
              SELECT doc_id, (doc_id + 137) % nn.n FROM documents, nn
              WHERE doc_id % 97 = 0
            ), reach(src, dst, d) AS (
              SELECT doc_id, doc_id, 0 FROM documents
              UNION ALL
              SELECT r.src, e.dst, r.d + 1 FROM reach r
              JOIN e0 e ON e.src = r.dst WHERE r.d < 4
            ), dist AS (
              SELECT src, dst, min(d) AS d FROM reach GROUP BY src, dst
            ), nf AS (
              SELECT src AS node,
                     count(*) FILTER (WHERE d <= 1) AS nf1,
                     count(*) FILTER (WHERE d <= 2) AS nf2,
                     count(*) FILTER (WHERE d <= 3) AS nf3,
                     count(*) FILTER (WHERE d <= 4) AS nf4
              FROM dist GROUP BY src
            )
            SELECT node, nf1, nf2, nf3, nf4,
                   round(0.0 + (nf1 - 1) / 1.0 + (nf2 - nf1) / 2.0
                             + (nf3 - nf2) / 3.0 + (nf4 - nf3) / 4.0,
                         6) AS harmonic
            FROM nf
        """,
        "q88_filter_funnel": r"""
            -- First-fail CASE in rule order (NULL predicate = fail),
            -- then the cumulative funnel over the O(rules) aggregate.
            WITH f AS (
              SELECT CASE
                WHEN NOT coalesce(n_chars >= 200, false) THEN 1
                WHEN NOT coalesce(lang = 'en', false) THEN 2
                WHEN NOT coalesce(
                  len(list_filter(regexp_split_to_array(text, '\s+'),
                                  w -> w <> '')) >= 30, false) THEN 3
                WHEN NOT coalesce(
                  right(trim(text), 1) IN ('.', '!', '?'), false) THEN 4
                WHEN NOT coalesce(NOT contains(text, '{'), false) THEN 5
                WHEN NOT coalesce(n_chars <= 20000, false) THEN 6
                ELSE 0 END AS fail
              FROM documents
            ), c AS (
              SELECT fail, count(*) AS n FROM f GROUP BY fail
            ), s(stage, rule) AS (
              VALUES (1, 'min_chars'), (2, 'lang_en'), (3, 'min_words'),
                     (4, 'terminal_punct'), (5, 'no_brace'), (6, 'max_chars')
            ), t AS (SELECT sum(n) AS total FROM c)
            SELECT s.stage, s.rule,
                   t.total - coalesce(sum(coalesce(c.n, 0)) OVER (
                     ORDER BY s.stage
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS n_in,
                   coalesce(c.n, 0) AS n_dropped,
                   t.total - coalesce(sum(coalesce(c.n, 0)) OVER (
                     ORDER BY s.stage
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     - coalesce(c.n, 0) AS n_out
            FROM s LEFT JOIN c ON c.fail = s.stage CROSS JOIN t
        """,
        "q89_term_dictionary": r"""
            -- Ground truth for the two-level dense ranking: one global
            -- row_number in (count desc, term asc) order.
            WITH toks AS (
              SELECT unnest(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                       ' ')) AS term
              FROM documents
              WHERE text IS NOT NULL AND length(trim(text)) > 0
            ), c AS (
              SELECT term, count(*) AS term_count FROM toks
              WHERE term <> '' GROUP BY term
            )
            SELECT term, term_count,
                   row_number() OVER (ORDER BY term_count DESC, term ASC)
                     AS term_id
            FROM c
        """,
        "q90_quantize_embeddings": r"""
            -- Bit-exact replay of the symmetric int8 quantization:
            -- float32->double casts, half-away-from-zero round, fold
            -- in list order.
            WITH b AS (
              SELECT vec_id, embedding,
                     list_max(list_transform(embedding,
                       v -> abs(CAST(v AS DOUBLE)))) / 127.0 AS scale
              FROM embeddings
              WHERE embedding IS NOT NULL AND len(embedding) > 0
            ), qq AS (
              SELECT vec_id, scale, embedding,
                     list_transform(embedding,
                       v -> CASE WHEN scale = 0 THEN 0
                            ELSE CAST(round(CAST(v AS DOUBLE) / scale)
                                      AS INT) END) AS q
              FROM b
            )
            SELECT vec_id, scale, q,
                   round(sqrt(list_aggregate(
                     list_transform(range(1, len(q) + 1),
                       i -> pow(CAST(embedding[i] AS DOUBLE)
                                - CAST(q[i] AS DOUBLE) * scale, 2)),
                     'sum') / len(q)), 6) AS rms_err
            FROM qq
        """,
        "q91_pmi_collocations": r"""
            -- Replay limitation: the chr(31) pair-string trick assumes
            -- tokens never contain the US control char (true of the
            -- synthetic tables; the Spark side uses structs and has no
            -- such constraint).
            -- Identical count algebra + the one fixed double expression
            -- ((cxy*W*W)/(c1*c2*P), one log2); 6dp absorbs libm ulp.
            WITH nz AS (
              SELECT list_filter(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                       ' '), w -> w <> '') AS ws
              FROM documents
              WHERE text IS NOT NULL
            ), nzp AS (SELECT ws FROM nz WHERE len(ws) > 0),
            uc AS (
              SELECT w, count(*) AS c
              FROM (SELECT unnest(ws) AS w FROM nzp) GROUP BY w
            ), pw AS (
              SELECT unnest(list_transform(
                       generate_series(1, len(ws) - 1),
                       i -> ws[i] || chr(31) || ws[i + 1])) AS p
              FROM nzp WHERE len(ws) >= 2
            ), bc AS (
              SELECT string_split(p, chr(31))[1] AS w1,
                     string_split(p, chr(31))[2] AS w2,
                     count(*) AS pair_count
              FROM pw GROUP BY 1, 2
            ), tot AS (
              SELECT (SELECT sum(c) FROM uc) AS W,
                     (SELECT sum(pair_count) FROM bc) AS P
            )
            SELECT w1, w2, pair_count,
                   round(log2((CAST(pair_count AS DOUBLE)
                               * CAST(tot.W AS DOUBLE) * CAST(tot.W AS DOUBLE))
                              / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)
                                 * CAST(tot.P AS DOUBLE))), 6) AS pmi
            FROM bc
            JOIN uc u1 ON u1.w = bc.w1
            JOIN uc u2 ON u2.w = bc.w2
            CROSS JOIN tot
            WHERE pair_count >= 5
            ORDER BY pmi DESC, w1 ASC, w2 ASC
            LIMIT 50
        """,
        "q92_stuffing_signals": r"""
            -- Sorted-run fold == per-key count: the oracle groups the
            -- same token/char multisets; integers meet exactly, the one
            -- order-divergent float sum meets at 6dp.
            WITH d AS (
              SELECT doc_id,
                     regexp_replace(lower(trim(coalesce(text, ''))),
                                    '\s+', ' ', 'g') AS t
              FROM documents
            ), toks AS (
              SELECT doc_id, unnest(list_filter(string_split(t, ' '),
                                                w -> w <> '')) AS w
              FROM d
            ), tc AS (
              SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w
            ), best AS (
              SELECT doc_id, best_tok, best FROM (
                SELECT doc_id, w AS best_tok, c AS best,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY c DESC, w ASC) AS rn
                FROM tc) WHERE rn = 1
            ), ntok AS (
              SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
            ), cc AS (
              SELECT doc_id, ch, count(*) AS c
              FROM (SELECT doc_id,
                           unnest(list_transform(
                             generate_series(1, length(t)), i -> t[i])) AS ch
                    FROM d WHERE length(t) > 0)
              GROUP BY doc_id, ch
            ), ent AS (
              SELECT doc_id,
                     round(log2(CAST(sum(c) AS DOUBLE))
                           - sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
                             / CAST(sum(c) AS DOUBLE), 6) AS char_entropy
              FROM cc GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(n.n, 0) AS n_tokens,
                   b.best_tok AS top_token,
                   CASE WHEN coalesce(n.n, 0) > 0
                        THEN round(CAST(b.best AS DOUBLE)
                                   / CAST(n.n AS DOUBLE), 6)
                        ELSE 0.0 END AS top_token_frac,
                   coalesce(e.char_entropy, 0.0) AS char_entropy,
                   (coalesce(n.n, 0) >= 30
                    AND coalesce(b.best, 0) * 100 >= coalesce(n.n, 0) * 8)
                     AS stuffed
            FROM d
            LEFT JOIN ntok n USING (doc_id)
            LEFT JOIN best b USING (doc_id)
            LEFT JOIN ent e USING (doc_id)
        """,
        "q93_url_templates": f"""
            -- Same synthesis (_TRAP_URL_SQL), same template algebra
            -- (_TPL_KEY_SQL); trap verdict on DISTINCT urls.
            WITH u AS (
              SELECT {_TRAP_URL_SQL} AS url
              FROM documents
            ), t AS ({_TPL_KEY_SQL}
            ), agg AS (
              SELECT host, template, count(*) AS n_urls,
                     count(DISTINCT url) AS n_distinct_urls
              FROM t GROUP BY host, template
            )
            SELECT host, template, n_urls, n_distinct_urls,
                   CAST(length(regexp_replace(template, '\\{{hex\\}}|\\{{n\\}}', chr(1), 'g'))
                        - length(regexp_replace(template, '\\{{hex\\}}|\\{{n\\}}', '', 'g')) AS INT) AS n_slots,
                   CAST(length(regexp_replace(template, '[^/]', '', 'g')) AS INT) AS depth,
                   (n_distinct_urls >= 20 AND
                    length(regexp_replace(template, '\\{{hex\\}}|\\{{n\\}}', chr(1), 'g'))
                    - length(regexp_replace(template, '\\{{hex\\}}|\\{{n\\}}', '', 'g')) >= 2)
                     AS trap_suspect
            FROM agg
        """,
        "q94_readability": r"""
            -- Exact integer counts + the two fixed double expressions.
            WITH d AS (
              SELECT doc_id,
                     regexp_replace(lower(trim(coalesce(text, ''))),
                                    '\s+', ' ', 'g') AS t
              FROM documents
            ), w AS (
              SELECT doc_id,
                     list_filter(string_split(t, ' '), x -> x <> '') AS ws,
                     list_filter(regexp_split_to_array(t, '[.!?]+'),
                                 s -> trim(s) <> '') AS ss
              FROM d
            ), c AS (
              SELECT doc_id,
                     CAST(len(ss) AS BIGINT) AS n_sents,
                     CAST(len(ws) AS BIGINT) AS n_words,
                     CAST(coalesce(list_aggregate(
                       list_transform(ws, x -> greatest(
                         len(regexp_extract_all(x, '[aeiouy]+')), 1)),
                       'sum'), 0) AS BIGINT) AS n_syllables
              FROM w
            )
            SELECT doc_id, n_sents, n_words, n_syllables,
                   round(206.835::DOUBLE
                         - 1.015::DOUBLE * (CAST(n_words AS DOUBLE)
                             / CAST(greatest(n_sents, 1) AS DOUBLE))
                         - 84.6::DOUBLE * (CAST(n_syllables AS DOUBLE)
                             / CAST(greatest(n_words, 1) AS DOUBLE)), 6)
                     AS flesch,
                   round(0.39::DOUBLE * (CAST(n_words AS DOUBLE)
                             / CAST(greatest(n_sents, 1) AS DOUBLE))
                         + 11.8::DOUBLE * (CAST(n_syllables AS DOUBLE)
                             / CAST(greatest(n_words, 1) AS DOUBLE))
                         - 15.59::DOUBLE, 6) AS fk_grade
            FROM c
        """,
        "q95_kmeans": r"""
            -- Both Lloyd iterations unrolled: float32->double casts,
            -- (x-c)*(x-c) folds in list order, fixed-point bigint sums,
            -- one double division per mean — identical arithmetic.
            WITH e AS (
              SELECT vec_id,
                     list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
              FROM embeddings
            ), c0 AS (
              SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS j,
                     x AS vec
              FROM e ORDER BY vec_id LIMIT 8
            ), a0 AS (
              SELECT vec_id, x, cluster FROM (
                SELECT e.vec_id, e.x, c.j AS cluster,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                         list_aggregate(list_transform(range(1, 65),
                           i -> (x[i] - vec[i]) * (x[i] - vec[i])), 'sum')
                         ASC, c.j ASC) AS rn
                FROM e CROSS JOIN c0 c)
              WHERE rn = 1
            ), s0 AS (
              SELECT cluster, t.i AS i,
                     sum(CAST(round(x[t.i] * 1048576.0) AS BIGINT)) AS s,
                     count(*) AS n
              FROM a0 CROSS JOIN range(1, 65) t(i)
              GROUP BY cluster, t.i
            ), c1 AS (
              SELECT c0.j, coalesce(m.vec, c0.vec) AS vec
              FROM c0 LEFT JOIN (
                SELECT cluster AS j,
                       list(CAST(s AS DOUBLE)
                            / (CAST(n AS DOUBLE) * 1048576.0) ORDER BY i) AS vec
                FROM s0 GROUP BY cluster) m ON m.j = c0.j
            ), a1 AS (
              SELECT vec_id, x, cluster FROM (
                SELECT e.vec_id, e.x, c.j AS cluster,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                         list_aggregate(list_transform(range(1, 65),
                           i -> (x[i] - vec[i]) * (x[i] - vec[i])), 'sum')
                         ASC, c.j ASC) AS rn
                FROM e CROSS JOIN c1 c)
              WHERE rn = 1
            ), s1 AS (
              SELECT cluster, t.i AS i,
                     sum(CAST(round(x[t.i] * 1048576.0) AS BIGINT)) AS s,
                     count(*) AS n
              FROM a1 CROSS JOIN range(1, 65) t(i)
              GROUP BY cluster, t.i
            ), c2 AS (
              SELECT c1.j, coalesce(m.vec, c1.vec) AS vec
              FROM c1 LEFT JOIN (
                SELECT cluster AS j,
                       list(CAST(s AS DOUBLE)
                            / (CAST(n AS DOUBLE) * 1048576.0) ORDER BY i) AS vec
                FROM s1 GROUP BY cluster) m ON m.j = c1.j
            ), fin AS (
              SELECT e.vec_id, c.j AS cluster,
                     list_aggregate(list_transform(range(1, 65),
                       i -> (x[i] - vec[i]) * (x[i] - vec[i])), 'sum') AS d
              FROM e CROSS JOIN c2 c
            )
            SELECT vec_id, cluster, round(d, 6) AS dist FROM (
              SELECT vec_id, cluster, d,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY d ASC, cluster ASC) AS rn
              FROM fin) WHERE rn = 1
        """,
        "q96_random_projection": r"""
            -- Same Knuth-coin sign matrix (bit 16 of key*K), same fold
            -- order, same 1/sqrt(64) scale.
            SELECT vec_id,
                   list_transform(range(0, 16), j -> round(
                     list_aggregate(list_transform(range(1, 65),
                       i -> CAST(embedding[i] AS DOUBLE)
                            * (CASE WHEN (((CAST(i - 1 AS BIGINT) * 1000003
                                            + CAST(j AS BIGINT) * 7919)
                                           * 2654435761) >> 16) & 1 = 0
                                    THEN 1.0 ELSE -1.0 END)), 'sum')
                     * (1.0 / sqrt(CAST(64 AS DOUBLE))), 6)) AS proj
            FROM embeddings
        """,
        "q97_domain_graph": f"""
            -- Same synthetic edges (q36 builder) + the q71/q72 PSL
            -- domain_key replay, then the two-direction rollup.
            WITH hosts AS (
              SELECT doc_id, {_SYNTH_HOST_SQL} AS host
              FROM documents
            ), {_PSL_KEY_SQL}, keyed AS (
              SELECT doc_id,
                     coalesce(CASE WHEN n > b AND b > 0
                          THEN array_to_string(labs[n-b:n], '.') END, host) AS dom
              FROM best
            ), nn AS (SELECT count(*) AS n FROM documents),
            e AS (
              SELECT d.doc_id AS src,
                     (d.doc_id * 37 + j.j * 1009) % nn.n AS dst
              FROM documents d
              CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) j
              CROSS JOIN nn
              WHERE (d.doc_id * 37 + j.j * 1009) % nn.n <> d.doc_id
            ), de AS (
              SELECT ks.dom AS src_dom, kd.dom AS dst_dom, count(*) AS w
              FROM e
              JOIN keyed ks ON ks.doc_id = e.src
              JOIN keyed kd ON kd.doc_id = e.dst
              GROUP BY 1, 2
            ), o AS (
              SELECT src_dom AS domain, sum(w) AS out_w,
                     sum(CASE WHEN src_dom = dst_dom THEN w ELSE 0 END) AS intra_w,
                     count(DISTINCT CASE WHEN dst_dom <> src_dom
                                         THEN dst_dom END) AS out_domains
              FROM de GROUP BY 1
            ), i AS (
              SELECT dst_dom AS domain, sum(w) AS in_w,
                     count(DISTINCT CASE WHEN src_dom <> dst_dom
                                         THEN src_dom END) AS in_domains
              FROM de GROUP BY 1
            )
            SELECT domain,
                   CAST(coalesce(out_w, 0) AS BIGINT) AS out_w,
                   CAST(coalesce(in_w, 0) AS BIGINT) AS in_w,
                   CAST(coalesce(intra_w, 0) AS BIGINT) AS intra_w,
                   CAST(coalesce(out_domains, 0) AS BIGINT) AS out_domains,
                   CAST(coalesce(in_domains, 0) AS BIGINT) AS in_domains,
                   CASE WHEN coalesce(out_w, 0) > 0
                        THEN round(CAST(coalesce(intra_w, 0) AS DOUBLE)
                                   / CAST(out_w AS DOUBLE), 6)
                        ELSE 0.0 END AS intra_frac
            FROM o FULL OUTER JOIN i USING (domain)
        """,
        "q98_bpe_merges": r"""
            -- Three unrolled merge steps: same vocab, same pair counts,
            -- same (count desc, left, right) argmax, same left-to-right
            -- replace over chr(31)-joined symbols.
            WITH w AS (
              SELECT w, count(*) AS f FROM (
                SELECT unnest(list_filter(string_split(
                         regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                         ' '), x -> x <> '' AND NOT contains(x, chr(31)))) AS w
                FROM documents WHERE text IS NOT NULL) GROUP BY w
            ), v0 AS (
              SELECT chr(31) || array_to_string(list_transform(
                       range(1, length(w) + 1), i -> w[i]),
                       chr(31) || chr(31)) || chr(31) AS sym, f
              FROM w
            ), c1 AS (
              SELECT pr, sum(f) AS c FROM (
                SELECT unnest(list_transform(generate_series(1, len(a) - 1),
                         i -> a[i] || chr(30) || a[i + 1])) AS pr, f
                FROM (SELECT string_split(substr(sym, 2, length(sym) - 2),
                                          chr(31) || chr(31)) AS a, f FROM v0)
                WHERE len(a) >= 2) GROUP BY pr
            ), b1 AS (
              SELECT string_split(pr, chr(30))[1] AS l,
                     string_split(pr, chr(30))[2] AS r, c
              FROM c1 ORDER BY c DESC, l ASC, r ASC LIMIT 1
            ), v1 AS (
              SELECT replace(sym,
                             (SELECT chr(31) || l || chr(31) || chr(31)
                                     || r || chr(31) FROM b1),
                             (SELECT chr(31) || l || r || chr(31) FROM b1))
                       AS sym, f FROM v0
            ), c2 AS (
              SELECT pr, sum(f) AS c FROM (
                SELECT unnest(list_transform(generate_series(1, len(a) - 1),
                         i -> a[i] || chr(30) || a[i + 1])) AS pr, f
                FROM (SELECT string_split(substr(sym, 2, length(sym) - 2),
                                          chr(31) || chr(31)) AS a, f FROM v1)
                WHERE len(a) >= 2) GROUP BY pr
            ), b2 AS (
              SELECT string_split(pr, chr(30))[1] AS l,
                     string_split(pr, chr(30))[2] AS r, c
              FROM c2 ORDER BY c DESC, l ASC, r ASC LIMIT 1
            ), v2 AS (
              SELECT replace(sym,
                             (SELECT chr(31) || l || chr(31) || chr(31)
                                     || r || chr(31) FROM b2),
                             (SELECT chr(31) || l || r || chr(31) FROM b2))
                       AS sym, f FROM v1
            ), c3 AS (
              SELECT pr, sum(f) AS c FROM (
                SELECT unnest(list_transform(generate_series(1, len(a) - 1),
                         i -> a[i] || chr(30) || a[i + 1])) AS pr, f
                FROM (SELECT string_split(substr(sym, 2, length(sym) - 2),
                                          chr(31) || chr(31)) AS a, f FROM v2)
                WHERE len(a) >= 2) GROUP BY pr
            ), b3 AS (
              SELECT string_split(pr, chr(30))[1] AS l,
                     string_split(pr, chr(30))[2] AS r, c
              FROM c3 ORDER BY c DESC, l ASC, r ASC LIMIT 1
            )
            SELECT CAST(1 AS INT) AS step, l AS left_sym, r AS right_sym,
                   CAST(c AS BIGINT) AS pair_count FROM b1
            UNION ALL
            SELECT CAST(2 AS INT), l, r, CAST(c AS BIGINT) FROM b2
            UNION ALL
            SELECT CAST(3 AS INT), l, r, CAST(c AS BIGINT) FROM b3
        """,
        "q99_content_drift": rf"""
            -- q22's FNV/bit-plane SimHash replay + the same per-URL lag.
            WITH toks AS (
              SELECT doc_id, unnest(string_split(regexp_replace(
                       lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS t
              FROM documents
            ), hashed AS (
              SELECT doc_id, {_Q22_FNV} AS h FROM toks WHERE t <> ''
            ), bits AS (
              SELECT doc_id, bit,
                     SUM(CASE WHEN (h // (1::HUGEINT << bit)) % 2 = 1
                              THEN 1 ELSE -1 END) AS w
              FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit)
              GROUP BY doc_id, bit
            ), sigs AS (
              SELECT d.doc_id,
                     COALESCE((SELECT SUM(1::HUGEINT << bit) FROM bits b
                               WHERE b.doc_id = d.doc_id AND b.w > 0),
                              0::HUGEINT) AS sig
              FROM documents d
            ), s AS (
              SELECT doc_id % 137 AS url_id, doc_id AS cap_seq,
                     CAST(CASE WHEN sig >= (1::HUGEINT << 63)
                               THEN sig - (1::HUGEINT << 64)
                               ELSE sig END AS BIGINT) AS sig
              FROM sigs
            ), l AS (
              SELECT url_id,
                     CAST(bit_count(xor(sig, lag(sig) OVER (
                       PARTITION BY url_id ORDER BY cap_seq))) AS INT) AS h
              FROM s
            )
            SELECT url_id,
                   count(*) AS n_caps,
                   count(h) AS n_transitions,
                   CAST(sum(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_changed,
                   round(avg(h), 6) AS mean_hamming,
                   max(h) AS max_hamming
            FROM l GROUP BY url_id
        """,
        "q100_domain_split": f"""
            -- PSL domain_key replay + the same poly-31 fold mod 1e9+7
            -- and Knuth mix mod 1000, exact permille thresholds.
            WITH hosts AS (
              SELECT doc_id, {_SYNTH_HOST_SQL} AS host
              FROM documents
            ), {_PSL_KEY_SQL}, keyed AS (
              SELECT doc_id,
                     coalesce(CASE WHEN n > b AND b > 0
                          THEN array_to_string(labs[n-b:n], '.') END, host)
                       AS domain_key
              FROM best
            ), coin AS (
              SELECT doc_id, domain_key,
                     (list_reduce(list_prepend(0::BIGINT,
                        list_transform(range(1, length(domain_key) + 1),
                                       i -> CAST(ascii(domain_key[i]) AS BIGINT))),
                        (acc, cp) -> (acc * 31 + cp) % 1000000007)
                      * 2654435761) % 1000 AS c
              FROM keyed
            )
            SELECT doc_id, domain_key,
                   CASE WHEN c < 50 THEN 'test'
                        WHEN c < 150 THEN 'val'
                        ELSE 'train' END AS split
            FROM coin
        """,
        "q101_kwic_snippets": r"""
            -- strpos/substr are 1-based and character-addressed in both
            -- engines; occurrence count by replace-and-measure.
            WITH m AS (
              SELECT doc_id, text, lower(text) AS low,
                     strpos(lower(text), 'order') AS pos
              FROM documents
              WHERE text IS NOT NULL AND strpos(lower(text), 'order') > 0
            )
            SELECT doc_id, pos,
                   CAST((length(low) - length(replace(low, 'order', '')))
                        / 5 AS BIGINT) AS n_matches,
                   substr(CASE WHEN length(lower(text)) = length(text)
                               THEN text ELSE lower(text) END,
                          greatest(1, pos - 30),
                          (pos - greatest(1, pos - 30)) + 35) AS snippet
            FROM m
        """,
        "q102_template_admission": f"""
            -- Mining replay (shared _TRAP_URL_SQL/_TPL_KEY_SQL) ->
            -- distinct-population verdict -> membership -> admit.
            WITH u AS (
              SELECT {_TRAP_URL_SQL} AS url
              FROM documents
            ), t AS ({_TPL_KEY_SQL}
            ), deny AS (
              SELECT host, template FROM (
                SELECT host, template, count(DISTINCT url) AS n_distinct
                FROM t GROUP BY host, template)
              WHERE n_distinct >= 20
                AND length(regexp_replace(template, '\\{{hex\\}}|\\{{n\\}}', chr(1), 'g'))
                    - length(regexp_replace(template, '\\{{hex\\}}|\\{{n\\}}', '', 'g')) >= 2
            )
            SELECT t.url,
                   (d.host IS NOT NULL) AS template_blocked,
                   (d.host IS NULL) AS admit
            FROM t LEFT JOIN deny d
              ON d.host = t.host AND d.template = t.template
        """,
        "q103_approx_distinct": r"""
            -- Exact distinct replay + the contract column (true by
            -- construction in the oracle; the Spark side computes it
            -- from the live HLL++ estimate, so drift flips the hash).
            SELECT host, count(DISTINCT url) AS n_distinct,
                   true AS within_bound
            FROM (
              SELECT 'h' || (doc_id % 7) AS host,
                     '/p/' || (doc_id % 137) AS url
              FROM documents)
            GROUP BY host
        """,
        "q104_trustrank": r"""
            -- q36's pagerank unroll + the seeded trust unroll, both with
            -- the 12-dp per-iteration rounding; spam mass from the
            -- 6-dp-rounded reporting columns exactly as the Spark side
            WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
            ns AS (SELECT CAST(count(*) AS BIGINT) AS s FROM documents WHERE doc_id % 17 = 0),
            nodes AS (SELECT doc_id AS v, (doc_id % 17 = 0) AS seed FROM documents),
            e AS (
              SELECT doc_id AS src, (doc_id*37 + j*1009) % nn.n AS dst
              FROM documents, nn, (SELECT unnest([1,2,3]) AS j)
              WHERE (doc_id*37 + j*1009) % nn.n <> doc_id
            ),
            outd AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
            p0 AS (SELECT v, round(1.0 / (SELECT n FROM nn), 12) AS pr FROM nodes),
            pc1 AS (SELECT dst, sum(pr / outdeg) AS s
                    FROM e JOIN outd USING (src) JOIN p0 ON p0.v = e.src GROUP BY dst),
            p1 AS (SELECT v, round(round(0.15 / (SELECT n FROM nn), 12)
                                   + 0.85 * coalesce(s, 0), 12) AS pr
                   FROM nodes LEFT JOIN pc1 ON v = dst),
            pc2 AS (SELECT dst, sum(pr / outdeg) AS s
                    FROM e JOIN outd USING (src) JOIN p1 ON p1.v = e.src GROUP BY dst),
            p2 AS (SELECT v, round(round(0.15 / (SELECT n FROM nn), 12)
                                   + 0.85 * coalesce(s, 0), 12) AS pr
                   FROM nodes LEFT JOIN pc2 ON v = dst),
            pc3 AS (SELECT dst, sum(pr / outdeg) AS s
                    FROM e JOIN outd USING (src) JOIN p2 ON p2.v = e.src GROUP BY dst),
            p3 AS (SELECT v, round(round(0.15 / (SELECT n FROM nn), 12)
                                   + 0.85 * coalesce(s, 0), 12) AS pr
                   FROM nodes LEFT JOIN pc3 ON v = dst),
            t0 AS (SELECT v, seed,
                          CASE WHEN seed THEN round(1.0 / (SELECT s FROM ns), 12)
                               ELSE 0.0 END AS tr
                   FROM nodes),
            tc1 AS (SELECT dst, sum(tr / outdeg) AS s
                    FROM e JOIN outd USING (src) JOIN t0 ON t0.v = e.src GROUP BY dst),
            t1 AS (SELECT v, seed,
                          round(CASE WHEN seed THEN round(0.15 / (SELECT s FROM ns), 12)
                                     ELSE 0.0 END + 0.85 * coalesce(s, 0), 12) AS tr
                   FROM nodes LEFT JOIN tc1 ON v = dst),
            tc2 AS (SELECT dst, sum(tr / outdeg) AS s
                    FROM e JOIN outd USING (src) JOIN t1 ON t1.v = e.src GROUP BY dst),
            t2 AS (SELECT v, seed,
                          round(CASE WHEN seed THEN round(0.15 / (SELECT s FROM ns), 12)
                                     ELSE 0.0 END + 0.85 * coalesce(s, 0), 12) AS tr
                   FROM nodes LEFT JOIN tc2 ON v = dst),
            tc3 AS (SELECT dst, sum(tr / outdeg) AS s
                    FROM e JOIN outd USING (src) JOIN t2 ON t2.v = e.src GROUP BY dst),
            t3 AS (SELECT v, seed,
                          round(CASE WHEN seed THEN round(0.15 / (SELECT s FROM ns), 12)
                                     ELSE 0.0 END + 0.85 * coalesce(s, 0), 12) AS tr
                   FROM nodes LEFT JOIN tc3 ON v = dst),
            rep AS (
              SELECT p3.v AS node, round(t3.tr, 6) AS trustrank, round(p3.pr, 6) AS pagerank
              FROM p3 JOIN t3 ON p3.v = t3.v
            )
            SELECT node, trustrank, pagerank,
                   CASE WHEN pagerank <= 0 THEN 0.0
                        ELSE round(greatest(0.0, least(1.0,
                               (pagerank - trustrank) / pagerank)), 6)
                   END AS spam_mass
            FROM rep
        """,
        "q105_adaptive_budget": r"""
            -- closed-form EWMA weights replayed exactly: per-(host,round)
            -- means, row_number/count window, 9-dp rounded fold, then the
            -- clamped proportional budget (round = half-away, both engines)
            WITH per AS (
              SELECT 'h' || CAST(user_id % 5 AS VARCHAR) AS host,
                     event_id % 4 AS round_no,
                     avg(50.0 + CAST((event_id * 7919) % 451 AS DOUBLE)) AS x
              FROM events GROUP BY 1, 2
            ), idx AS (
              SELECT host, x,
                     row_number() OVER (PARTITION BY host ORDER BY round_no ASC) AS i,
                     count(*) OVER (PARTITION BY host) AS n
              FROM per
            ), folded AS (
              SELECT host, max(n) AS n_rounds,
                     round(sum(x * CASE WHEN i = 1 THEN power(0.7, n - 1)
                                        ELSE 0.3 * power(0.7, n - i) END), 9) AS ewma
              FROM idx GROUP BY host
            )
            SELECT host, CAST(n_rounds AS BIGINT) AS n_rounds,
                   round(ewma, 6) AS ewma_ms,
                   CAST(CASE WHEN ewma <= 0 THEN 50
                        ELSE greatest(1, least(50,
                               CAST(round(10.0 * 200.0 / ewma) AS INT)))
                   END AS INT) AS budget
            FROM folded
        """,
        "q106_quantile_contract": r"""
            -- exact interpolated percentiles (quantile_cont == Spark's
            -- exact F.percentile, the q49 parity); within_bound is true
            -- by construction here — the Spark side computes it from the
            -- live GK sketch, so estimator drift flips the hash
            WITH g AS (
              SELECT event_type AS k, count(value) AS n,
                     round(quantile_cont(value, 0.5), 6)  AS e50,
                     round(quantile_cont(value, 0.9), 6)  AS e90,
                     round(quantile_cont(value, 0.99), 6) AS e99
              FROM events GROUP BY event_type
            )
            SELECT k, 0.5 AS p, e50 AS exact_value, n, true AS within_bound FROM g
            UNION ALL
            SELECT k, 0.9, e90, n, true FROM g
            UNION ALL
            SELECT k, 0.99, e99, n, true FROM g
        """,
        "q107_cms_frequency": r"""
            -- the deterministic hash family replayed in BIGINT: h_j(k) =
            -- ((k mod p)*A_j + B_j) mod p mod 256, p = 2^31-1; sketch =
            -- counts per (j, bucket); estimate = min over the 4 probes
            WITH keys AS (SELECT user_id % 211 AS key FROM events),
            hp AS (
              SELECT j, a, b FROM (VALUES
                (0, 2654435761, 1000000007),
                (1, 2246822519,  998244353),
                (2, 3266489917,  754974721),
                (3,  668265263,  167772161)) AS t(j, a, b)
            ),
            hashed AS (
              SELECT key, j,
                     ((key % 2147483647) * a + b) % 2147483647 % 256 AS bucket
              FROM keys CROSS JOIN hp
            ),
            sketch AS (SELECT j, bucket, count(*) AS cnt FROM hashed GROUP BY j, bucket),
            exact AS (SELECT key, count(*) AS exact_count FROM keys GROUP BY key),
            probes AS (
              SELECT e.key, e.exact_count, h.j,
                     ((e.key % 2147483647) * h.a + h.b) % 2147483647 % 256 AS bucket
              FROM exact e CROSS JOIN hp h
            )
            SELECT p.key, p.exact_count, min(s.cnt) AS cms_estimate,
                   (min(s.cnt) >= p.exact_count) AS no_underestimate
            FROM probes p JOIN sketch s ON s.j = p.j AND s.bucket = p.bucket
            GROUP BY p.key, p.exact_count
        """,
        "q108_pq_encode": r"""
            -- codebook = 16 smallest-id vectors; per (vector, subspace)
            -- argmin over (x-c)*(x-c) folds in list order (float32 ->
            -- double casts), ties to the smallest code — q95's replay
            -- discipline; mse adds the 4 chosen distances left-to-right
            WITH e AS (
              SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
              FROM embeddings
            ), cb AS (
              SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS j, x AS cv
              FROM e ORDER BY vec_id LIMIT 16
            ), d AS (
              SELECT e.vec_id, s.s, cb.j,
                     list_aggregate(list_transform(range(1, 17),
                       i -> (x[s.s*16 + i] - cv[s.s*16 + i]) * (x[s.s*16 + i] - cv[s.s*16 + i])),
                       'sum') AS dist
              FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS s) s CROSS JOIN cb
            ), best AS (
              SELECT vec_id, s, j, dist FROM (
                SELECT vec_id, s, j, dist,
                       row_number() OVER (PARTITION BY vec_id, s
                                          ORDER BY dist ASC, j ASC) AS rn
                FROM d) WHERE rn = 1
            ), piv AS (
              SELECT vec_id,
                     max(CASE WHEN s = 0 THEN j END) AS j0,
                     max(CASE WHEN s = 1 THEN j END) AS j1,
                     max(CASE WHEN s = 2 THEN j END) AS j2,
                     max(CASE WHEN s = 3 THEN j END) AS j3,
                     max(CASE WHEN s = 0 THEN dist END) AS d0,
                     max(CASE WHEN s = 1 THEN dist END) AS d1,
                     max(CASE WHEN s = 2 THEN dist END) AS d2,
                     max(CASE WHEN s = 3 THEN dist END) AS d3
              FROM best GROUP BY vec_id
            )
            SELECT vec_id, [j0, j1, j2, j3] AS codes,
                   round((((d0 + d1) + d2) + d3) / 64.0, 6) AS recon_mse
            FROM piv
        """,
        "q109_doremi": r"""
            -- all 3 EG steps unrolled with the 9-dp per-step rounding:
            -- raw = round(w * exp(eta*loss*(1-w)), 9), renormalized and
            -- re-rounded each step
            WITH per AS (
              SELECT lang AS domain,
                     round(avg(CAST(n_chars AS DOUBLE) / 1000.0), 9) AS loss
              FROM documents GROUP BY lang
            ), d AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM per),
            w0 AS (SELECT domain, loss, round(1.0 / nd, 9) AS w FROM per, d),
            r1 AS (SELECT domain, loss,
                          round(w * exp(0.5 * loss * (1.0 - w)), 9) AS raw FROM w0),
            w1 AS (SELECT domain, loss,
                          round(raw / (SELECT sum(raw) FROM r1), 9) AS w FROM r1),
            r2 AS (SELECT domain, loss,
                          round(w * exp(0.5 * loss * (1.0 - w)), 9) AS raw FROM w1),
            w2 AS (SELECT domain, loss,
                          round(raw / (SELECT sum(raw) FROM r2), 9) AS w FROM r2),
            r3 AS (SELECT domain, loss,
                          round(w * exp(0.5 * loss * (1.0 - w)), 9) AS raw FROM w2),
            w3 AS (SELECT domain, loss,
                          round(raw / (SELECT sum(raw) FROM r3), 9) AS w FROM r3)
            SELECT domain, round(loss, 6) AS loss, round(w, 6) AS weight FROM w3
        """,
        "q110_term_drift": r"""
            -- identical tokenization to q91, conditional slice counts,
            -- the one fixed chi2 tree rounded to 6dp BEFORE ordering
            WITH toks AS (
              SELECT (doc_id % 2 = 0) AS a, unnest(list_filter(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                       ' '), w -> w <> '')) AS term
              FROM documents WHERE text IS NOT NULL
            ), counts AS (
              SELECT term,
                     sum(CASE WHEN a THEN 1 ELSE 0 END) AS n_a,
                     sum(CASE WHEN a THEN 0 ELSE 1 END) AS n_b
              FROM toks GROUP BY term
            ), tot AS (
              SELECT CAST(sum(n_a) AS DOUBLE) AS na_tot,
                     CAST(sum(n_b) AS DOUBLE) AS nb_tot
              FROM counts
            ), scored AS (
              SELECT term, n_a, n_b,
                     round(
                       (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) * na_tot / (na_tot + nb_tot))
                       * (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) * na_tot / (na_tot + nb_tot))
                       / (CAST(n_a + n_b AS DOUBLE) * na_tot / (na_tot + nb_tot))
                       +
                       (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) * nb_tot / (na_tot + nb_tot))
                       * (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) * nb_tot / (na_tot + nb_tot))
                       / (CAST(n_a + n_b AS DOUBLE) * nb_tot / (na_tot + nb_tot))
                     , 6) AS chi2
              FROM counts, tot
              WHERE n_a + n_b >= 20
                AND na_tot > 0 AND nb_tot > 0  -- empty slice -> empty result
            )
            SELECT term, n_a, n_b, chi2 FROM scored
            ORDER BY chi2 DESC, term ASC LIMIT 50
        """,
        "q111_kmv_mirrors": _KMV_REPLAY_PREFIX + r""", inter AS (
              SELECT a.g AS ga, b.g AS gb, count(*) AS i
              FROM keys a JOIN keys b ON a.key = b.key AND a.g < b.g
              GROUP BY 1, 2
            ), sizes AS (SELECT g, count(*) AS n FROM keys GROUP BY g)
            SELECT e.ga AS group_a, e.gb AS group_b,
                   CAST(e.n_shared AS BIGINT) AS n_shared, e.est_jaccard,
                   coalesce(round(CAST(i.i AS DOUBLE)
                     / CAST(sa.n + sb.n - i.i AS DOUBLE), 6), 0.0) AS exact_jaccard
            FROM est e
            LEFT JOIN inter i ON i.ga = e.ga AND i.gb = e.gb
            JOIN sizes sa ON sa.g = e.ga
            JOIN sizes sb ON sb.g = e.gb
        """,
        "q156_kmv_sketch_only": _KMV_REPLAY_PREFIX + r"""
            SELECT ga AS group_a, gb AS group_b,
                   CAST(n_shared AS BIGINT) AS n_shared, est_jaccard
            FROM est
        """,
        "q112_opic": r"""
            -- unrolls opic()'s three cash rounds: history banks the OLD
            -- cash, then cash redistributes over out-edges plus the
            -- (zero, on this graph) dangling mass via the virtual root;
            -- 12-dp per-round rounding mirrors the Spark side exactly
            WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
            nodes AS (SELECT doc_id AS v FROM documents),
            e AS (
              SELECT doc_id AS src, (doc_id*37 + j*1009) % nn.n AS dst
              FROM documents, nn, (SELECT unnest([1,2,3]) AS j)
              WHERE (doc_id*37 + j*1009) % nn.n <> doc_id
            ),
            outd AS (SELECT src, count(*) AS od FROM e GROUP BY src),
            s0 AS (
              SELECT v, coalesce(od, 0) AS od,
                     round(1.0 / (SELECT n FROM nn), 12) AS cash,
                     0.0 AS hist
              FROM nodes LEFT JOIN outd ON v = src
            ),
            r1 AS (SELECT coalesce(sum(cash), 0) AS root FROM s0 WHERE od = 0),
            c1 AS (SELECT e.dst, sum(s0.cash / s0.od) AS s
                   FROM e JOIN s0 ON s0.v = e.src GROUP BY e.dst),
            s1 AS (
              SELECT s0.v, s0.od,
                     round(s0.hist + s0.cash, 12) AS hist,
                     round(coalesce(c1.s, 0)
                           + (SELECT root FROM r1) / (SELECT n FROM nn), 12) AS cash
              FROM s0 LEFT JOIN c1 ON s0.v = c1.dst
            ),
            r2 AS (SELECT coalesce(sum(cash), 0) AS root FROM s1 WHERE od = 0),
            c2 AS (SELECT e.dst, sum(s1.cash / s1.od) AS s
                   FROM e JOIN s1 ON s1.v = e.src GROUP BY e.dst),
            s2 AS (
              SELECT s1.v, s1.od,
                     round(s1.hist + s1.cash, 12) AS hist,
                     round(coalesce(c2.s, 0)
                           + (SELECT root FROM r2) / (SELECT n FROM nn), 12) AS cash
              FROM s1 LEFT JOIN c2 ON s1.v = c2.dst
            ),
            r3 AS (SELECT coalesce(sum(cash), 0) AS root FROM s2 WHERE od = 0),
            c3 AS (SELECT e.dst, sum(s2.cash / s2.od) AS s
                   FROM e JOIN s2 ON s2.v = e.src GROUP BY e.dst),
            s3 AS (
              SELECT s2.v, s2.od,
                     round(s2.hist + s2.cash, 12) AS hist,
                     round(coalesce(c3.s, 0)
                           + (SELECT root FROM r3) / (SELECT n FROM nn), 12) AS cash
              FROM s2 LEFT JOIN c3 ON s2.v = c3.dst
            ),
            tot AS (SELECT sum(hist) AS t FROM s3)
            SELECT v AS node, round(cash, 6) AS cash, round(hist, 6) AS history,
                   round(hist / (SELECT t FROM tot), 6) AS importance
            FROM s3
        """,
        "q113_zipf_fit": r"""
            -- q89 tokenization -> adjacent-bigram stream (multiplicity
            -- kept) -> counts (>=2) -> top-10k ranks (count desc, term
            -- asc — the total order the Spark window uses) ->
            -- closed-form OLS of ln(freq) on ln(rank)
            WITH docs AS (
              SELECT list_filter(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                       ' '), w -> w <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ), toks AS (
              SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                       i -> ws[i] || ' ' || ws[i + 1])) AS term
              FROM docs WHERE len(ws) >= 2
            ), c AS (
              SELECT term, count(*) AS c FROM toks GROUP BY term
              HAVING count(*) >= 2
            ), ranked AS (
              SELECT ln(CAST(row_number() OVER
                       (ORDER BY c DESC, term ASC) AS DOUBLE)) AS x,
                     ln(CAST(c AS DOUBLE)) AS y
              FROM c
              QUALIFY row_number() OVER (ORDER BY c DESC, term ASC) <= 10000
            ), agg AS (
              SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                     sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
              FROM ranked
            )
            SELECT CAST(n AS BIGINT) AS n_terms,
                   round((sxy - sx*sy/n) / (sxx - sx*sx/n), 6) AS slope,
                   round((sy - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * sx) / n, 6)
                     AS intercept,
                   round((sxy - sx*sy/n) * (sxy - sx*sy/n)
                         / ((sxx - sx*sx/n) * (syy - sy*sy/n)), 6) AS r2
            FROM agg
        """,
        "q114_good_turing": r"""
            -- bigram counts -> counts-of-counts (c <= 11) -> GT
            -- estimate (c+1) * n_{c+1} / n_c via lead over the tiny
            -- frame; NULL when the next row is not literally c+1
            WITH docs AS (
              SELECT list_filter(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                       ' '), w -> w <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ), toks AS (
              SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                       i -> ws[i] || ' ' || ws[i + 1])) AS term
              FROM docs WHERE len(ws) >= 2
            ), tc AS (
              SELECT term, count(*) AS c FROM toks GROUP BY term
            ), cc AS (
              SELECT c, count(*) AS n_c FROM tc WHERE c <= 11 GROUP BY c
            ), nx AS (
              SELECT c, n_c,
                     lead(c) OVER (ORDER BY c ASC) AS next_c,
                     lead(n_c) OVER (ORDER BY c ASC) AS next_n
              FROM cc
            )
            SELECT CAST(c AS BIGINT) AS c, CAST(n_c AS BIGINT) AS n_c,
                   CASE WHEN next_c = c + 1
                        THEN round((c + 1) * CAST(next_n AS DOUBLE)
                                   / CAST(n_c AS DOUBLE), 6)
                   END AS gt_estimate
            FROM nx WHERE c <= 10
            ORDER BY c
        """,
        "q115_priority_schedule": r"""
            -- full three-stage replay: the q112 opic unroll (importance),
            -- the q105 EWMA fold (budgets), then the schedule window —
            -- row_number over (priority desc, url asc), kept while
            -- rn <= budget (and the literal 50 cap)
            WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
            nodes AS (SELECT doc_id AS v FROM documents),
            e AS (
              SELECT doc_id AS src, (doc_id*37 + j*1009) % nn.n AS dst
              FROM documents, nn, (SELECT unnest([1,2,3]) AS j)
              WHERE (doc_id*37 + j*1009) % nn.n <> doc_id
            ),
            outd AS (SELECT src, count(*) AS od FROM e GROUP BY src),
            s0 AS (
              SELECT v, coalesce(od, 0) AS od,
                     round(1.0 / (SELECT n FROM nn), 12) AS cash,
                     0.0 AS hist
              FROM nodes LEFT JOIN outd ON v = src
            ),
            r1 AS (SELECT coalesce(sum(cash), 0) AS root FROM s0 WHERE od = 0),
            c1 AS (SELECT e.dst, sum(s0.cash / s0.od) AS s
                   FROM e JOIN s0 ON s0.v = e.src GROUP BY e.dst),
            s1 AS (
              SELECT s0.v, s0.od,
                     round(s0.hist + s0.cash, 12) AS hist,
                     round(coalesce(c1.s, 0)
                           + (SELECT root FROM r1) / (SELECT n FROM nn), 12) AS cash
              FROM s0 LEFT JOIN c1 ON s0.v = c1.dst
            ),
            r2 AS (SELECT coalesce(sum(cash), 0) AS root FROM s1 WHERE od = 0),
            c2 AS (SELECT e.dst, sum(s1.cash / s1.od) AS s
                   FROM e JOIN s1 ON s1.v = e.src GROUP BY e.dst),
            s2 AS (
              SELECT s1.v, s1.od,
                     round(s1.hist + s1.cash, 12) AS hist,
                     round(coalesce(c2.s, 0)
                           + (SELECT root FROM r2) / (SELECT n FROM nn), 12) AS cash
              FROM s1 LEFT JOIN c2 ON s1.v = c2.dst
            ),
            r3 AS (SELECT coalesce(sum(cash), 0) AS root FROM s2 WHERE od = 0),
            c3 AS (SELECT e.dst, sum(s2.cash / s2.od) AS s
                   FROM e JOIN s2 ON s2.v = e.src GROUP BY e.dst),
            s3 AS (
              SELECT s2.v, s2.od,
                     round(s2.hist + s2.cash, 12) AS hist,
                     round(coalesce(c3.s, 0)
                           + (SELECT root FROM r3) / (SELECT n FROM nn), 12) AS cash
              FROM s2 LEFT JOIN c3 ON s2.v = c3.dst
            ),
            tot AS (SELECT sum(hist) AS t FROM s3),
            imp AS (SELECT v AS node,
                           round(hist / (SELECT t FROM tot), 6) AS importance
                    FROM s3),
            per AS (
              SELECT 'h' || CAST(user_id % 5 AS VARCHAR) AS host,
                     event_id % 4 AS round_no,
                     avg(50.0 + CAST((event_id * 7919) % 451 AS DOUBLE)) AS x
              FROM events GROUP BY 1, 2
            ), idx AS (
              SELECT host, x,
                     row_number() OVER (PARTITION BY host ORDER BY round_no ASC) AS i,
                     count(*) OVER (PARTITION BY host) AS cnt
              FROM per
            ), folded AS (
              SELECT host,
                     round(sum(x * CASE WHEN i = 1 THEN power(0.7, cnt - 1)
                                        ELSE 0.3 * power(0.7, cnt - i) END), 9) AS ewma
              FROM idx GROUP BY host
            ), bud AS (
              SELECT host,
                     CASE WHEN ewma <= 0 THEN 50
                          ELSE greatest(1, least(50,
                                 CAST(round(10.0 * 200.0 / ewma) AS INT)))
                     END AS budget
              FROM folded
            ), cand AS (
              SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) AS host,
                     'https://h' || CAST(doc_id % 5 AS VARCHAR)
                       || '.example/page/' || CAST(doc_id AS VARCHAR) AS url,
                     doc_id AS node
              FROM documents
            ), j AS (
              SELECT c.host, c.url, c.node,
                     round(coalesce(i.importance, 0.0), 6) AS priority,
                     coalesce(b.budget, 5) AS budget
              FROM cand c
              LEFT JOIN imp i ON c.node = i.node
              LEFT JOIN bud b ON c.host = b.host
            ), r AS (
              SELECT host, url, node, priority, budget,
                     row_number() OVER (PARTITION BY host
                       ORDER BY priority DESC, url ASC) AS rn
              FROM j
            )
            SELECT host, url, node, priority, CAST(rn AS INT) AS fetch_rank
            FROM r WHERE rn <= 50 AND rn <= budget
        """,
        "q116_domain_diversity": r"""
            -- q91 tokenization with a domain label -> (domain, term)
            -- counts -> window totals -> 9-dp plog terms -> 6-dp entropy
            -- (+0.0 normalizes -0.0), ttr, normalized entropy (NULL when
            -- n_types = 1 via DuckDB's NULL-on-zero-divide)
            WITH docs AS (
              SELECT 'd' || CAST(doc_id % 7 AS VARCHAR) AS domain,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                       ' '), w -> w <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ), toks AS (
              SELECT domain, unnest(ws) AS term FROM docs
            ), tc AS (
              SELECT domain, term, count(*) AS c FROM toks GROUP BY domain, term
            ), wt AS (
              SELECT domain, c,
                     sum(c) OVER (PARTITION BY domain) AS n_tokens,
                     count(*) OVER (PARTITION BY domain) AS n_types
              FROM tc
            ), ent AS (
              SELECT domain,
                     CAST(n_tokens AS BIGINT) AS n_tokens,
                     CAST(n_types AS BIGINT) AS n_types,
                     round(sum(round(
                       -(CAST(c AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                       * log2(CAST(c AS DOUBLE) / CAST(n_tokens AS DOUBLE)), 9)), 6)
                       + 0.0 AS entropy
              FROM wt GROUP BY domain, n_tokens, n_types
            )
            SELECT domain, n_tokens, n_types,
                   round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS ttr,
                   entropy,
                   round(entropy / log2(CAST(n_types AS DOUBLE)), 6) AS norm_entropy
            FROM ent
        """,
        "q117_revisit_schedule": rf"""
            -- q99's SimHash drift replay + the Cho/Garcia-Molina
            -- bias-corrected Poisson rate and the clamped interval;
            -- + 0.0 normalizes the X=0 case's -ln(1) = -0.0
            WITH toks AS (
              SELECT doc_id, unnest(string_split(regexp_replace(
                       lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS t
              FROM documents
            ), hashed AS (
              SELECT doc_id, {_Q22_FNV} AS h FROM toks WHERE t <> ''
            ), bits AS (
              SELECT doc_id, bit,
                     SUM(CASE WHEN (h // (1::HUGEINT << bit)) % 2 = 1
                              THEN 1 ELSE -1 END) AS w
              FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit)
              GROUP BY doc_id, bit
            ), sigs AS (
              SELECT d.doc_id,
                     COALESCE((SELECT SUM(1::HUGEINT << bit) FROM bits b
                               WHERE b.doc_id = d.doc_id AND b.w > 0),
                              0::HUGEINT) AS sig
              FROM documents d
            ), s AS (
              SELECT doc_id % 137 AS url_id, doc_id AS cap_seq,
                     CAST(CASE WHEN sig >= (1::HUGEINT << 63)
                               THEN sig - (1::HUGEINT << 64)
                               ELSE sig END AS BIGINT) AS sig
              FROM sigs
            ), l AS (
              SELECT url_id,
                     CAST(bit_count(xor(sig, lag(sig) OVER (
                       PARTITION BY url_id ORDER BY cap_seq))) AS INT) AS h
              FROM s
            ), drift AS (
              SELECT url_id,
                     count(h) AS n,
                     CAST(sum(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS BIGINT) AS x
              FROM l GROUP BY url_id
            )
            SELECT url_id,
                   n AS n_transitions,
                   x AS n_changed,
                   round(CASE WHEN n = 0 THEN 0.0
                         ELSE -ln((CAST(n AS DOUBLE) - CAST(x AS DOUBLE) + 0.5)
                                  / (CAST(n AS DOUBLE) + 0.5)) END, 6) + 0.0
                     AS change_rate,
                   CAST(CASE WHEN n = 0 THEN 8
                        WHEN x = 0 THEN 64
                        ELSE greatest(1, least(64, CAST(ceil(
                          1.0 / (-ln((CAST(n AS DOUBLE) - CAST(x AS DOUBLE) + 0.5)
                                     / (CAST(n AS DOUBLE) + 0.5)))) AS INT)))
                   END AS INT) AS revisit_interval
            FROM drift
        """,
        "q118_term_burstiness": r"""
            -- q91 tokenization -> per-(doc, term) counts -> per-term
            -- doc_freq / total / multi-doc counts -> exact 6-dp ratios,
            -- top-100 by (burstiness desc, term asc)
            WITH toks AS (
              SELECT doc_id, unnest(list_filter(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                       ' '), w -> w <> '')) AS term
              FROM documents WHERE text IS NOT NULL
            ), pd AS (
              SELECT doc_id, term, count(*) AS c FROM toks GROUP BY doc_id, term
            ), pt AS (
              SELECT term,
                     count(*) AS doc_freq,
                     CAST(sum(c) AS BIGINT) AS total_count,
                     CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS multi
              FROM pd GROUP BY term
            )
            SELECT term, doc_freq, total_count,
                   round(CAST(total_count AS DOUBLE) / CAST(doc_freq AS DOUBLE), 6)
                     AS burstiness,
                   round(CAST(multi AS DOUBLE) / CAST(doc_freq AS DOUBLE), 6)
                     AS adaptation
            FROM pt WHERE doc_freq >= 2
            ORDER BY burstiness DESC, term ASC LIMIT 100
        """,
        "q119_crawl_saturation": r"""
            -- same capture synthesis, first-seen rounds, per-round
            -- yields rounded at 6dp BEFORE ln, closed-form per-domain
            -- OLS; decay NULL under 2 usable rounds, half-life only
            -- for decaying fits
            WITH caps AS (
              SELECT 'd' || CAST(doc_id % 5 AS VARCHAR) AS domain,
                     CAST((doc_id // 5) % 8 AS INT) AS r,
                     'c' || CAST((doc_id * 17) % 211 AS VARCHAR) AS ck
              FROM documents
            ), first AS (
              SELECT domain, ck, min(r) AS r0 FROM caps GROUP BY domain, ck
            ), newpr AS (
              SELECT domain, r0 AS r, count(*) AS n_new FROM first
              GROUP BY domain, r0
            ), fet AS (
              SELECT domain, r, count(*) AS n_fetched FROM caps
              GROUP BY domain, r
            ), pr AS (
              SELECT f.domain, f.r,
                     coalesce(n.n_new, 0) AS n_new,
                     f.n_fetched,
                     round(CAST(coalesce(n.n_new, 0) AS DOUBLE)
                           / CAST(f.n_fetched AS DOUBLE), 6) AS y
              FROM fet f LEFT JOIN newpr n ON f.domain = n.domain AND f.r = n.r
            ), agg AS (
              SELECT domain,
                     count(*) AS n_rounds,
                     CAST(sum(n_new) AS BIGINT) AS total_new,
                     sum(CASE WHEN y > 0 THEN 1 ELSE 0 END) AS m,
                     sum(CASE WHEN y > 0 THEN CAST(r AS DOUBLE) END) AS sx,
                     sum(CASE WHEN y > 0 THEN ln(y) END) AS sy,
                     sum(CASE WHEN y > 0
                         THEN CAST(r AS DOUBLE) * CAST(r AS DOUBLE) END) AS sxx,
                     sum(CASE WHEN y > 0
                         THEN CAST(r AS DOUBLE) * ln(y) END) AS sxy,
                     max_by(y, r) AS last_y
              FROM pr GROUP BY domain
            ), fit AS (
              SELECT domain, n_rounds, total_new, last_y, m,
                     CASE WHEN m >= 2 THEN
                       round((sxy - sx * sy / m) / (sxx - sx * sx / m), 6)
                     END AS decay_rate
              FROM agg
            )
            SELECT domain, n_rounds, total_new, decay_rate,
                   round(CASE WHEN decay_rate < 0
                              THEN -ln(2.0) / decay_rate END, 6) AS half_life,
                   round(last_y, 6) AS last_yield
            FROM fit
        """,
        "q120_shard_skew": r"""
            -- Knuth-mix shard replay over user_id, counts-per-shard,
            -- rank-formula Gini with empty shards included (they rank
            -- first: sum over all 32 = z*tot + sum over used)
            WITH loads AS (
              SELECT ((user_id % 2147483647) * 2654435761 % 2147483647) % 32
                       AS shard,
                     count(*) AS load
              FROM events GROUP BY 1
            ), ranked AS (
              SELECT shard, load,
                     row_number() OVER (ORDER BY load ASC, shard ASC) AS i
              FROM loads
            ), agg AS (
              SELECT count(*) AS n_used,
                     CAST(sum(load) AS BIGINT) AS tot,
                     sum(CAST(i AS DOUBLE) * CAST(load AS DOUBLE)) AS sil,
                     sum(CAST(load AS DOUBLE) * CAST(load AS DOUBLE)) AS sll,
                     max(load) AS mx
              FROM ranked
            )
            SELECT CAST(32 AS INT) AS n_shards,
                   n_used,
                   tot AS total_rows,
                   round(CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS max_share,
                   round(sqrt(greatest(sll / 32.0
                           - (CAST(tot AS DOUBLE) / 32.0)
                             * (CAST(tot AS DOUBLE) / 32.0), 0.0))
                         / (CAST(tot AS DOUBLE) / 32.0), 6) AS cov,
                   round(2.0 * ((32.0 - CAST(n_used AS DOUBLE))
                                  * CAST(tot AS DOUBLE) + sil)
                         / (32.0 * CAST(tot AS DOUBLE)) - 33.0 / 32.0, 6) AS gini
            FROM agg
        """,
        "q121_temperature_mix": r"""
            -- char-mass shares, p rounded at 9dp, p^0.7 rounded at 9dp,
            -- renormalized — the exact temperature_weights replay
            WITH per AS (
              SELECT 'd' || CAST(doc_id % 5 AS VARCHAR) AS grp,
                     CAST(sum(length(text)) AS BIGINT) AS mass
              FROM documents GROUP BY 1
            ), tot AS (SELECT sum(mass) AS t FROM per),
            scaled AS (
              SELECT grp, mass,
                     round(CAST(mass AS DOUBLE) / (SELECT CAST(t AS DOUBLE) FROM tot), 9) AS p
              FROM per
            ), powed AS (
              SELECT grp, mass, p, round(power(p, 0.7), 9) AS q FROM scaled
            ), qt AS (SELECT sum(q) AS qtot FROM powed)
            SELECT grp AS "group", mass,
                   round(p, 6) AS p_raw,
                   round(q / (SELECT qtot FROM qt), 6) AS weight
            FROM powed
        """,
        "q122_ks_length_drift": r"""
            -- merged-jump-point exact two-sample KS per domain vs the
            -- corpus: group/corpus CDF windows over distinct lengths,
            -- at-point and pre-point diffs, max per group
            WITH base AS (
              SELECT 'd' || CAST(doc_id % 7 AS VARCHAR) AS g,
                     length(text) AS v
              FROM documents WHERE text IS NOT NULL
            ), gc AS (
              SELECT g, v, count(*) AS cg FROM base GROUP BY g, v
            ), cc AS (
              SELECT v, count(*) AS cc FROM base GROUP BY v
            ), corpus AS (
              SELECT v, cc,
                     sum(cc) OVER (ORDER BY v ASC) AS cum_c,
                     (SELECT count(*) FROM base) AS n_corpus
              FROM cc
            ), grp AS (
              SELECT g, v,
                     sum(cg) OVER (PARTITION BY g ORDER BY v ASC) AS cum_g,
                     sum(cg) OVER (PARTITION BY g) AS n
              FROM gc
            ), j AS (
              SELECT grp.g, grp.v, grp.n, corpus.n_corpus,
                     CAST(grp.cum_g AS DOUBLE) / CAST(grp.n AS DOUBLE) AS fg,
                     coalesce(CAST(lag(grp.cum_g) OVER (
                         PARTITION BY grp.g ORDER BY grp.v ASC) AS DOUBLE)
                       / CAST(grp.n AS DOUBLE), 0.0) AS fg_prev,
                     CAST(corpus.cum_c AS DOUBLE)
                       / CAST(corpus.n_corpus AS DOUBLE) AS fc,
                     CAST(corpus.cum_c - corpus.cc AS DOUBLE)
                       / CAST(corpus.n_corpus AS DOUBLE) AS fc_pre
              FROM grp JOIN corpus ON grp.v = corpus.v
            ), agg AS (
              SELECT g, n, n_corpus,
                     max(greatest(abs(fg - fc), abs(fg_prev - fc_pre))) AS d
              FROM j GROUP BY g, n, n_corpus
            )
            SELECT g AS "group", CAST(n AS BIGINT) AS n_group,
                   round(d, 6) AS ks_stat,
                   round(d * sqrt(CAST(n AS DOUBLE) * CAST(n_corpus AS DOUBLE)
                                  / (CAST(n AS DOUBLE) + CAST(n_corpus AS DOUBLE))), 6)
                     AS ks_scaled
            FROM agg WHERE n >= 5
        """,
        "q123_bloom_contract": r"""
            -- full Bloom replay: the CMS hash family's first 3 rows set
            -- bits for even doc_ids; odd doc_ids probe; measured FPR vs
            -- the fill-based (n_set/m)^k bound with the 3/n slack
            WITH mem AS (SELECT DISTINCT doc_id AS k FROM documents
                         WHERE doc_id % 2 = 0),
            prb AS (SELECT DISTINCT doc_id AS k FROM documents
                    WHERE doc_id % 2 = 1),
            fam AS (SELECT * FROM (VALUES
              (0, 2654435761, 1000000007),
              (1, 2246822519, 998244353),
              (2, 3266489917, 754974721)) AS t(j, a, b)),
            bits AS (
              SELECT DISTINCT ((k % 2147483647) * a + b) % 2147483647 % 4096
                       AS bit
              FROM mem, fam
            ),
            nb AS (SELECT count(*) AS n_bits FROM bits),
            hits AS (
              SELECT p.k,
                     sum(CASE WHEN bits.bit IS NOT NULL THEN 1 ELSE 0 END)
                       AS h
              FROM (SELECT k, ((k % 2147483647) * a + b) % 2147483647 % 4096
                             AS bit
                    FROM prb, fam) p
              LEFT JOIN bits ON p.bit = bits.bit
              GROUP BY p.k
            ),
            agg AS (
              SELECT count(*) AS n_probes,
                     CAST(sum(CASE WHEN h = 3 THEN 1 ELSE 0 END) AS BIGINT)
                       AS fp
              FROM hits
            )
            SELECT CAST((SELECT count(*) FROM mem) AS INT) AS n_members,
                   n_probes,
                   CAST(4096 AS INT) AS m_bits,
                   CAST(3 AS INT) AS k_hashes,
                   CAST((SELECT n_bits FROM nb) AS INT) AS n_bits_set,
                   round(CAST(fp AS DOUBLE) / CAST(n_probes AS DOUBLE), 6)
                     AS measured_fpr,
                   round(power(CAST((SELECT n_bits FROM nb) AS DOUBLE)
                               / 4096.0, 3), 6) AS expected_fpr,
                   (CAST(fp AS DOUBLE) / CAST(n_probes AS DOUBLE)
                    <= 1.5 * power(CAST((SELECT n_bits FROM nb) AS DOUBLE)
                                   / 4096.0, 3)
                       + 3.0 / CAST(n_probes AS DOUBLE)) AS within_bound
            FROM agg
        """,
        "q124_cocitation": r"""
            -- shared edge synthesis -> distinct edges -> per-src cap 20
            -- (dst asc) -> self-join on src -> pair counts >= 2 ->
            -- top-100 (cocite desc, a asc, b asc)
            WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
            e0 AS (
              SELECT DISTINCT doc_id AS src,
                     (doc_id*37 + j*1009) % nn.n AS dst
              FROM documents, nn, (SELECT unnest([1,2,3]) AS j)
              WHERE (doc_id*37 + j*1009) % nn.n <> doc_id
            ),
            capped AS (
              SELECT src, dst FROM e0
              QUALIFY row_number() OVER (PARTITION BY src ORDER BY dst ASC)
                      <= 20
            ),
            pairs AS (
              SELECT a.dst AS node_a, b.dst AS node_b, count(*) AS cocite
              FROM capped a JOIN capped b ON a.src = b.src
              WHERE a.dst < b.dst
              GROUP BY a.dst, b.dst
              HAVING count(*) >= 2
            )
            SELECT node_a, node_b, cocite FROM pairs
            ORDER BY cocite DESC, node_a ASC, node_b ASC LIMIT 100
        """,
        "q125_retrieval_metrics": r"""
            -- same synthetic runs/qrels; DCG gain (2^rel - 1)/log2(r+1),
            -- IDCG from each query's qrels sorted (rel desc, doc asc)
            -- truncated at 10; absent queries score 0 via coalesce
            WITH qids AS (SELECT unnest(generate_series(0, 9)) AS qid),
            ranks AS (SELECT unnest(generate_series(1, 10)) AS r),
            runs AS (
              SELECT qid, (qid * 31 + r * 7) % 200 AS doc, r
              FROM qids, ranks
            ),
            pool AS (SELECT doc_id FROM documents WHERE doc_id < 200),
            qrels AS (
              SELECT qid, doc_id AS doc,
                     CAST(1 + doc_id % 3 AS INT) AS rel
              FROM qids, pool
              WHERE (doc_id + qid) % 11 = 0
            ),
            hits AS (
              SELECT runs.qid,
                     sum((power(2.0, rel) - 1.0)
                         / log2(CAST(r AS DOUBLE) + 1.0)) AS dcg,
                     count(*) AS n_hit,
                     min(r) AS first_r
              FROM runs JOIN qrels ON runs.qid = qrels.qid
                                  AND runs.doc = qrels.doc
              WHERE rel > 0
              GROUP BY runs.qid
            ),
            ideal AS (
              SELECT qid,
                     sum((power(2.0, rel) - 1.0)
                         / log2(CAST(ir AS DOUBLE) + 1.0)) AS idcg
              FROM (
                SELECT qid, rel,
                       row_number() OVER (PARTITION BY qid
                         ORDER BY rel DESC, doc ASC) AS ir
                FROM qrels WHERE rel > 0
              ) WHERE ir <= 10
              GROUP BY qid
            ),
            nrel AS (
              -- ALL judged queries; rel=0-only ones keep n_rel=0 with
              -- NULL metrics (operator contract)
              SELECT qid,
                     sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS n_rel
              FROM qrels GROUP BY qid
            )
            SELECT n.qid,
                   CAST(n.n_rel AS BIGINT) AS n_rel,
                   CASE WHEN n.n_rel > 0 THEN
                     round(coalesce(h.dcg / i.idcg, 0.0), 6) END AS ndcg,
                   CASE WHEN n.n_rel > 0 THEN
                     round(coalesce(1.0 / CAST(h.first_r AS DOUBLE), 0.0), 6)
                   END AS mrr,
                   CASE WHEN n.n_rel > 0 THEN
                     round(coalesce(CAST(h.n_hit AS DOUBLE)
                                    / CAST(n.n_rel AS DOUBLE), 0.0), 6)
                   END AS recall
            FROM nrel n
            LEFT JOIN ideal i ON n.qid = i.qid
            LEFT JOIN hits h ON n.qid = h.qid
        """,
        "q126_redirect_resolution": r"""
            -- same synthetic chains/cycles; hop-bounded recursive walk
            -- (hops < 32 = 2^max_doublings) -> furthest row per src;
            -- resolved iff the landing node has no outgoing edge
            WITH RECURSIVE edges AS (
              SELECT doc_id AS src, doc_id - 1 AS dst FROM documents
              WHERE doc_id % 16 <> 0
              UNION ALL
              SELECT doc_id, doc_id + 16 FROM documents
              WHERE doc_id % 160 = 96
              UNION ALL
              SELECT doc_id, doc_id - 16 FROM documents
              WHERE doc_id % 160 = 112
            ),
            m AS (SELECT src, min(dst) AS dst FROM edges GROUP BY src),
            walk(src, cur, hops) AS (
              SELECT src, dst, 1 FROM m
              UNION ALL
              SELECT w.src, m.dst, w.hops + 1
              FROM walk w JOIN m ON w.cur = m.src
              WHERE w.hops < 32
            ),
            fin AS (
              SELECT src, max_by(cur, hops) AS final_dst,
                     CAST(max(hops) AS BIGINT) AS hops
              FROM walk GROUP BY src
            )
            SELECT f.src, f.final_dst, f.hops,
                   (o.src IS NULL) AS resolved
            FROM fin f
            LEFT JOIN (SELECT DISTINCT src FROM m) o
              ON f.final_dst = o.src
        """,
        "q127_mirror_hosts": r"""
            -- same synthetic (host, key) sets; pairs only via shared
            -- keys on 2..10 hosts (the boilerplate key -1 sits on all
            -- 20 hosts and is dropped from pairing, not from sizes)
            WITH hk AS (
              SELECT DISTINCT 'h' || CAST(doc_id % 20 AS VARCHAR) AS h,
                     doc_id // 2 AS k
              FROM documents
              UNION
              SELECT DISTINCT 'h' || CAST(doc_id % 20 AS VARCHAR),
                     CAST(-1 AS BIGINT)
              FROM documents
            ),
            sizes AS (SELECT h, count(*) AS n FROM hk GROUP BY h),
            keep AS (
              SELECT k FROM hk GROUP BY k
              HAVING count(*) BETWEEN 2 AND 10
            ),
            paired AS (SELECT hk.h, hk.k FROM hk JOIN keep USING (k)),
            pairs AS (
              SELECT a.h AS host_a, b.h AS host_b,
                     count(*) AS n_shared
              FROM paired a JOIN paired b
                ON a.k = b.k AND a.h < b.h
              GROUP BY a.h, b.h
              HAVING count(*) >= 3
            )
            SELECT host_a, host_b, n_shared,
                   sa.n AS n_a, sb.n AS n_b,
                   round(CAST(n_shared AS DOUBLE)
                         / CAST(sa.n + sb.n - n_shared AS DOUBLE), 6)
                     AS jaccard,
                   round(CAST(n_shared AS DOUBLE)
                         / CAST(least(sa.n, sb.n) AS DOUBLE), 6)
                     AS containment
            FROM pairs
            JOIN sizes sa ON pairs.host_a = sa.h
            JOIN sizes sb ON pairs.host_b = sb.h
        """,
        "q128_token_budget": r"""
            -- water-filling replay: sort by saturation point r = cap/w,
            -- prefix sums -> candidate levels, the unique i with
            -- r_i <= L_i < r_{i+1} (or the no-saturation L_0), alloc =
            -- min(cap, w*L); B >= sum(cap) -> all cap, underfilled
            WITH base AS (
              SELECT 's' || CAST(doc_id % 8 AS VARCHAR) AS source,
                     CAST(count(*) * 100 AS DOUBLE) AS avail,
                     CAST(max((doc_id % 8) % 3 + 1) AS DOUBLE) AS w_raw
              FROM documents GROUP BY 1
            ),
            wt AS (SELECT sum(w_raw) AS wtot FROM base),
            r0 AS (
              SELECT source, avail, round(w_raw / wtot, 9) AS w,
                     avail * 2.0 AS cap
              FROM base, wt
            ),
            r1 AS (SELECT *, cap / w AS r FROM r0),
            pre AS (
              SELECT *,
                sum(cap) OVER (ORDER BY r ASC, source ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pcap,
                sum(w) OVER (ORDER BY r ASC, source ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pw,
                sum(cap) OVER (ORDER BY r ASC, source ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING) AS tcap,
                sum(w) OVER (ORDER BY r ASC, source ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING) AS tw,
                lead(r) OVER (ORDER BY r ASC, source ASC) AS rnext,
                row_number() OVER (ORDER BY r ASC, source ASC) AS rn
              FROM r1
            ),
            cand AS (
              SELECT CASE
                WHEN rn = 1 AND (60000.0 / tw) < r
                  THEN 60000.0 / tw
                WHEN r <= (60000.0 - pcap) / NULLIF(tw - pw, 0)
                 AND (60000.0 - pcap) / NULLIF(tw - pw, 0)
                     < coalesce(rnext, 'infinity'::DOUBLE)
                  THEN (60000.0 - pcap) / NULLIF(tw - pw, 0)
              END AS lvl
              FROM pre
            ),
            chosen AS (SELECT min(lvl) AS lvl FROM cand WHERE lvl IS NOT NULL),
            alloc0 AS (
              SELECT p.source, p.avail, p.cap, p.w, p.tcap,
                     round(CASE WHEN c.lvl IS NULL OR p.tcap <= 60000.0
                                THEN p.cap
                                ELSE least(p.cap, p.w * c.lvl) END, 2) AS alloc
              FROM pre p LEFT JOIN chosen c ON TRUE
            )
            SELECT source, avail AS avail_tokens, cap, w AS w_norm, alloc,
                   round(alloc / avail, 6) AS epochs,
                   (alloc >= cap) AS saturated,
                   (tcap <= 60000.0) AS underfilled
            FROM alloc0
        """,
        "q129_calibration": r"""
            -- same synthetic score/label lanes; equal-width bins with
            -- the closed right edge; sum(contribution) = ECE
            WITH scored AS (
              SELECT CAST((doc_id * 37) % 1000 AS DOUBLE) / 1000.0 AS s,
                     CASE WHEN (doc_id * 17) % 1000 < (doc_id * 37) % 1000
                          THEN 1 ELSE 0 END AS y
              FROM documents
            ),
            b AS (
              SELECT least(CAST(floor(s * 10) AS INT), 9) AS bin, s, y
              FROM scored
            ),
            per AS (
              SELECT bin, count(*) AS n, avg(s) AS conf,
                     avg(CAST(y AS DOUBLE)) AS acc
              FROM b GROUP BY bin
            ),
            tot AS (SELECT sum(n) AS nn FROM per)
            SELECT bin, n,
                   round(conf, 6) AS confidence,
                   round(acc, 6) AS accuracy,
                   round(abs(conf - acc), 6) AS gap,
                   round(abs(conf - acc) * CAST(n AS DOUBLE)
                         / CAST(nn AS DOUBLE), 6) AS contribution
            FROM per, tot
        """,
        "q130_minhash_contract": r"""
            -- full MinHash replay: Horner shingle keys (q111 fold) ->
            -- 64 affine permutations -> per-(doc, j) minima ->
            -- agreement rate vs exact set Jaccard vs Hoeffding bound
            WITH docs0 AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 60
            ),
            alldocs AS (
              SELECT doc_id AS id, text FROM docs0
              UNION ALL
              SELECT doc_id + 1000,
                     text || ' shared tail alpha beta gamma delta'
              FROM docs0
            ),
            prs AS (
              SELECT doc_id AS id_a, doc_id + 1000 AS id_b FROM docs0
              UNION ALL
              SELECT doc_id, doc_id + 1 FROM docs0
              WHERE doc_id % 2 = 0 AND doc_id < 59
            ),
            toks AS (
              SELECT id, list_filter(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                       ' '), w -> w <> '') AS ws
              FROM alldocs
            ),
            sh AS (
              SELECT id, unnest(list_transform(
                       generate_series(1, len(ws) - 2),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
              FROM toks WHERE len(ws) >= 3
            ),
            keys AS (
              SELECT DISTINCT id,
                     CAST((list_reduce(list_transform(string_split(s, ''),
                              c -> CAST(unicode(c) AS BIGINT)),
                            (a, x) -> (a * 131 + x) % 2147483647)
                           * 2654435761) % 2147483647 AS BIGINT) AS key
              FROM sh
            ),
            perms AS (
              SELECT j,
                     (2654435761 + 40503 * j) % 2147483647 AS a,
                     (998244353 + 69069 * j) % 2147483647 AS b
              FROM (SELECT unnest(generate_series(0, 63)) AS j)
            ),
            sig AS (
              SELECT id, j, min((key * a + b) % 2147483647) AS m
              FROM keys, perms GROUP BY id, j
            ),
            agree AS (
              SELECT p.id_a, p.id_b,
                     sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)
                       AS n_sig_match
              FROM prs p
              JOIN sig sa ON sa.id = p.id_a
              JOIN sig sb ON sb.id = p.id_b AND sb.j = sa.j
              GROUP BY 1, 2
            ),
            inter AS (
              SELECT p.id_a, p.id_b, count(*) AS i
              FROM prs p
              JOIN keys ka ON ka.id = p.id_a
              JOIN keys kb ON kb.id = p.id_b AND kb.key = ka.key
              GROUP BY 1, 2
            ),
            sizes AS (SELECT id, count(*) AS n FROM keys GROUP BY id)
            SELECT g.id_a, g.id_b,
                   CAST(g.n_sig_match AS INT) AS n_sig_match,
                   round(CAST(g.n_sig_match AS DOUBLE) / 64.0, 6)
                     AS est_jaccard,
                   round(coalesce(CAST(i.i AS DOUBLE)
                         / CAST(sa.n + sb.n - i.i AS DOUBLE), 0.0), 6)
                     AS exact_jaccard,
                   round(abs(CAST(g.n_sig_match AS DOUBLE) / 64.0
                         - coalesce(CAST(i.i AS DOUBLE)
                           / CAST(sa.n + sb.n - i.i AS DOUBLE), 0.0)), 6)
                     AS abs_err,
                   (abs(CAST(g.n_sig_match AS DOUBLE) / 64.0
                        - coalesce(CAST(i.i AS DOUBLE)
                          / CAST(sa.n + sb.n - i.i AS DOUBLE), 0.0))
                    <= sqrt(ln(40.0) / 128.0) + 0.05) AS within_bound
            FROM agree g
            LEFT JOIN inter i ON g.id_a = i.id_a AND g.id_b = i.id_b
            JOIN sizes sa ON sa.id = g.id_a
            JOIN sizes sb ON sb.id = g.id_b
        """,
        "q131_train_classifier": r"""
            -- full GD replay: q51 hashed features -> (did, bucket, coef)
            -- cells + bias cell -> THREE unrolled fixed-point logistic
            -- steps (round(term*1e12) summed exactly as HUGEINT,
            -- residuals/weights rounded 12dp) -> final weights table
            WITH lab AS (
              SELECT doc_id AS did,
                     regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
                       AS norm,
                     CASE WHEN list_contains(
                            string_split(
                              regexp_replace(lower(trim(text)),
                                             '\s+', ' ', 'g'), ' '),
                            'spark')
                          THEN CAST(1.0 AS DOUBLE)
                          ELSE CAST(0.0 AS DOUBLE) END AS y
              FROM documents WHERE text IS NOT NULL
            ), words AS (
              SELECT did, string_split(norm, ' ') AS ws
              FROM lab WHERE length(norm) > 0
            ), feats AS (
              SELECT did, unnest(ws) AS f FROM words
              UNION ALL
              SELECT did,
                     unnest(list_transform(range(1, len(ws)),
                                           i -> ws[i] || ' ' || ws[i+1]))
              FROM words
            ), cells0 AS (
              SELECT did,
                     (list_reduce(
                        list_prepend(CAST(0 AS BIGINT),
                          list_transform(range(1, length(f) + 1),
                            i -> CAST(unicode(substring(f, CAST(i AS INT), 1))
                                      AS BIGINT))),
                        (acc, cp) -> (acc * 31 + cp) % 1000000007)
                      * 2654435761) % 64 AS bucket
              FROM feats
            ), m AS (
              SELECT did, count(*) AS m FROM cells0 GROUP BY did
            ), cells AS (
              SELECT c.did, c.bucket,
                     CAST(1.0 AS DOUBLE) / m.m AS coef
              FROM cells0 c JOIN m USING (did)
              UNION ALL
              SELECT did, CAST(-1 AS BIGINT), CAST(1.0 AS DOUBLE) FROM lab
            ), n AS (
              SELECT CAST(count(*) AS DOUBLE) AS n FROM lab
            ),
            r1 AS (
              SELECT did, round(CAST(0.5 AS DOUBLE) - y, 12) AS r FROM lab
            ), g1 AS (
              SELECT c.bucket,
                     CAST(sum(CAST(round(r1.r * c.coef * 1e12) AS HUGEINT))
                          AS DOUBLE) / 1e12 AS gs
              FROM cells c JOIN r1 USING (did) GROUP BY c.bucket
            ), w1 AS (
              SELECT g1.bucket,
                     round(CAST(0.0 AS DOUBLE) - 0.5 * (g1.gs / n.n), 12) AS w
              FROM g1, n
            ),
            z2 AS (
              SELECT c.did,
                     CAST(sum(CAST(round(w1.w * c.coef * 1e12) AS HUGEINT))
                          AS DOUBLE) / 1e12 AS z
              FROM cells c JOIN w1 USING (bucket) GROUP BY c.did
            ), r2 AS (
              SELECT lab.did,
                     round(CAST(1.0 AS DOUBLE)
                           / (CAST(1.0 AS DOUBLE) + exp(-z2.z)) - lab.y, 12)
                       AS r
              FROM lab JOIN z2 ON lab.did = z2.did
            ), g2 AS (
              SELECT c.bucket,
                     CAST(sum(CAST(round(r2.r * c.coef * 1e12) AS HUGEINT))
                          AS DOUBLE) / 1e12 AS gs
              FROM cells c JOIN r2 USING (did) GROUP BY c.bucket
            ), w2 AS (
              SELECT g2.bucket, round(w1.w - 0.5 * (g2.gs / n.n), 12) AS w
              FROM g2 JOIN w1 USING (bucket), n
            ),
            z3 AS (
              SELECT c.did,
                     CAST(sum(CAST(round(w2.w * c.coef * 1e12) AS HUGEINT))
                          AS DOUBLE) / 1e12 AS z
              FROM cells c JOIN w2 USING (bucket) GROUP BY c.did
            ), r3 AS (
              SELECT lab.did,
                     round(CAST(1.0 AS DOUBLE)
                           / (CAST(1.0 AS DOUBLE) + exp(-z3.z)) - lab.y, 12)
                       AS r
              FROM lab JOIN z3 ON lab.did = z3.did
            ), g3 AS (
              SELECT c.bucket,
                     CAST(sum(CAST(round(r3.r * c.coef * 1e12) AS HUGEINT))
                          AS DOUBLE) / 1e12 AS gs
              FROM cells c JOIN r3 USING (did) GROUP BY c.bucket
            )
            SELECT g3.bucket,
                   round(w2.w - 0.5 * (g3.gs / n.n), 12) AS weight
            FROM g3 JOIN w2 USING (bucket), n
            ORDER BY bucket
        """,
        "q132_chunk_documents": r"""
            -- closed-form window replay: K = 1 + ceil(max(m-40,0)/32),
            -- start k*32, slice [start+1 : start+40], tail clipped
            WITH docs AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                       ' '), w -> w <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ), d2 AS (
              SELECT doc_id, ws, len(ws) AS m FROM docs WHERE len(ws) > 0
            ), k AS (
              SELECT doc_id, ws, m,
                     1 + CAST(ceil(CAST(greatest(m - 40, 0) AS DOUBLE)
                                   / 32.0) AS INT) AS k
              FROM d2
            ), ch AS (
              SELECT doc_id, ws, m,
                     unnest(generate_series(0, k - 1)) AS chunk_id
              FROM k
            )
            SELECT doc_id,
                   CAST(chunk_id AS INT) AS chunk_id,
                   CAST(chunk_id * 32 AS INT) AS start_tok,
                   CAST(least(m - chunk_id * 32, 40) AS INT) AS n_tok,
                   array_to_string(
                     list_slice(ws, chunk_id * 32 + 1, chunk_id * 32 + 40),
                     ' ') AS chunk_text
            FROM ch
        """,
        "q133_html_stats": r"""
            -- same deterministic page synthesis, same regexp algebra
            WITH pages AS (
              SELECT doc_id,
                     '<html><head><title>doc ' || CAST(doc_id AS VARCHAR)
                     || '</title>'
                     || CASE WHEN doc_id % 3 = 0
                             THEN '<script>var x=1;</script>' ELSE '' END
                     || '</head><body><h1>doc</h1><p>'
                     || coalesce(text, '') || '</p>'
                     || substr(repeat('<a href="/x">more</a>', 4), 1,
                               CAST((doc_id % 5) * 21 AS INT))
                     || '</body></html>' AS html
              FROM documents
            ), s AS (
              SELECT doc_id, html,
                     length(html) AS n_chars,
                     CAST(octet_length(encode(html)) AS BIGINT) AS n_bytes,
                     CAST(len(regexp_extract_all(html, '<[a-zA-Z/!]'))
                          AS BIGINT) AS n_tags,
                     CAST(len(regexp_extract_all(html, '<[aA][ >]'))
                          AS BIGINT) AS n_anchors,
                     CAST(len(regexp_extract_all(
                            html, '<[sS][cC][rR][iI][pP][tT][ >]'))
                          AS BIGINT) AS n_scripts,
                     CAST(length(regexp_replace(html, '<[^>]*>', '', 'g'))
                          AS BIGINT) AS visible_chars
              FROM pages
            )
            SELECT doc_id, n_bytes, n_tags, n_anchors, n_scripts,
                   visible_chars,
                   round(CAST(visible_chars AS DOUBLE)
                         / greatest(n_chars, 1), 6) AS text_ratio,
                   round(CAST(n_anchors AS DOUBLE) * 1000.0
                         / greatest(visible_chars, 1), 6) AS anchor_density
            FROM s
        """,
        "q134_domain_normalize": r"""
            -- fixed-point moment replay + RANK percentile per domain
            WITH base AS (
              SELECT doc_id, source,
                     round(CAST(doc_id * 37 % 1000 AS DOUBLE) / 1000.0, 6)
                       AS score
              FROM documents
            ), mom AS (
              SELECT source, count(*) AS n,
                     CAST(sum(CAST(round(score * 1e6) AS HUGEINT))
                          AS DOUBLE) / 1e6 / count(*) AS mean,
                     CAST(sum(CAST(round(score * 1e6) AS HUGEINT)
                              * CAST(round(score * 1e6) AS HUGEINT))
                          AS DOUBLE) / 1e12 / count(*) AS ex2,
                     min(score) AS lo, max(score) AS hi
              FROM base GROUP BY source
            ), mom2 AS (
              SELECT source, n, mean,
                     CASE WHEN lo < hi THEN ex2 - mean * mean END AS var
              FROM mom
            ), ranked AS (
              SELECT doc_id, source, score,
                     rank() OVER (PARTITION BY source ORDER BY score ASC)
                       AS rk
              FROM base
            )
            SELECT r.doc_id, r.source, r.score,
                   CAST(m.n AS BIGINT) AS n_domain,
                   round(CAST(r.rk - 1 AS DOUBLE)
                         / greatest(m.n - 1, 1), 6) AS pct_rank,
                   CASE WHEN m.var > 0
                        THEN round((r.score - m.mean) / sqrt(m.var), 6) + 0.0
                   END AS z
            FROM ranked r JOIN mom2 m USING (source)
        """,
        "q135_pseudonymize": r"""
            -- same planted emails, same Horner/Knuth surrogate, same
            -- split-and-reinterleave rebuild
            WITH planted AS (
              SELECT doc_id,
                     CASE
                       WHEN doc_id % 3 = 0 THEN
                         coalesce(text, '') || ' contact user'
                         || CAST(doc_id % 40 AS VARCHAR) || '@mail'
                         || CAST(doc_id % 7 AS VARCHAR) || '.example'
                         || ' and Sec.Ond+tag@Host'
                         || CAST(doc_id % 5 AS VARCHAR) || '.org now'
                       WHEN doc_id % 3 = 1 THEN
                         'from user' || CAST(doc_id % 40 AS VARCHAR)
                         || '@mail' || CAST(doc_id % 7 AS VARCHAR)
                         || '.example: ' || coalesce(text, '')
                       ELSE coalesce(text, '')
                     END AS text
              FROM documents
            ), pieces AS (
              SELECT doc_id, text,
                     regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9][A-Za-z0-9.-]*\.[A-Za-z]{2,}')
                       AS ms,
                     string_split_regex(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9][A-Za-z0-9.-]*\.[A-Za-z]{2,}')
                       AS parts
              FROM planted
            )
            SELECT doc_id AS id,
                   CAST(len(ms) AS BIGINT) AS n_emails,
                   CASE WHEN len(ms) = 0 THEN text
                        ELSE parts[1] || array_to_string(
                          list_transform(range(1, len(ms) + 1),
                            i -> '<EMAIL:' || CAST(
                              (list_reduce(
                                 list_prepend(CAST(0 AS BIGINT),
                                   list_transform(string_split(lower(ms[i]), ''),
                                     c -> CAST(unicode(c) AS BIGINT))),
                                 (acc, cp) -> (acc * 31 + cp) % 1000000007)
                               * 2654435761) % 1000000000 AS VARCHAR)
                            || '>' || parts[i + 1]),
                          '')
                   END AS pseudonymized
            FROM pieces
        """,
        "q136_tokenizer_fertility": r"""
            WITH per AS (
              SELECT lang,
                     CAST(coalesce(octet_length(encode(text)), 0) AS BIGINT)
                       AS b,
                     CAST(coalesce(length(text), 0) AS BIGINT) AS c,
                     CAST(coalesce(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+'))
                          END, 0) AS BIGINT) AS w,
                     CAST(coalesce(len(regexp_extract_all(text,
                          '[a-zA-Z]+|[0-9]{1,3}|[^\sa-zA-Z0-9]+')), 0)
                          AS BIGINT) AS s
              FROM documents WHERE lang IS NOT NULL
            ), agg AS (
              SELECT lang, count(*) AS n_docs, sum(b) AS n_bytes,
                     sum(c) AS n_chars, sum(w) AS n_words,
                     sum(s) AS n_subwords
              FROM per GROUP BY lang
            )
            SELECT lang,
                   CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(n_bytes AS BIGINT) AS n_bytes,
                   CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(n_words AS BIGINT) AS n_words,
                   CAST(n_subwords AS BIGINT) AS n_subwords,
                   CASE WHEN n_subwords > 0 THEN
                     round(CAST(n_bytes AS DOUBLE)
                           / CAST(n_subwords AS DOUBLE), 6) END
                     AS bytes_per_token,
                   CASE WHEN n_subwords > 0 THEN
                     round(CAST(n_chars AS DOUBLE)
                           / CAST(n_subwords AS DOUBLE), 6) END
                     AS chars_per_token,
                   CASE WHEN n_words > 0 THEN
                     round(CAST(n_subwords AS DOUBLE)
                           / CAST(n_words AS DOUBLE), 6) END
                     AS tokens_per_word
            FROM agg
        """,
        "q137_corpus_diff": r"""
            -- same generations; content compared as normalized text
            -- (IS DISTINCT FROM = the null-safe twin of the 8-byte
            -- xxhash64 identity the engine ships instead)
            WITH d AS (
              SELECT doc_id,
                     'http://h' || CAST(doc_id % 13 AS VARCHAR)
                     || '.ex/p/' || CAST(doc_id AS VARCHAR) AS url,
                     coalesce(text, '') AS t
              FROM documents
            ), o AS (
              SELECT url,
                     regexp_replace(lower(trim(t)), '\s+', ' ', 'g') AS nt
              FROM d WHERE doc_id % 7 <> 6
            ), n AS (
              SELECT url,
                     regexp_replace(lower(trim(
                       CASE WHEN doc_id % 3 = 0 THEN t || ' v2' ELSE t END
                     )), '\s+', ' ', 'g') AS nt
              FROM d WHERE doc_id % 5 <> 4
            )
            SELECT coalesce(o.url, n.url) AS url,
                   CASE WHEN o.url IS NULL THEN 'added'
                        WHEN n.url IS NULL THEN 'removed'
                        WHEN o.nt IS DISTINCT FROM n.nt THEN 'changed'
                        ELSE 'unchanged' END AS status,
                   (o.url IS NOT NULL) AS in_old,
                   (n.url IS NOT NULL) AS in_new
            FROM o FULL OUTER JOIN n ON o.url = n.url
        """,
        "q138_neyman_allocation": r"""
            -- fixed-point moments -> N_h*S_h weights -> the q83
            -- two-level cumulative-rounding replay (hugeint floors)
            WITH base AS (
              SELECT source AS g,
                     round(CAST(n_chars AS DOUBLE), 6) AS v
              FROM documents
              WHERE source IS NOT NULL AND n_chars IS NOT NULL
            ), mom AS (
              SELECT g, count(*) AS n,
                     CAST(sum(CAST(round(v * 1e6) AS HUGEINT)) AS DOUBLE)
                       / 1e6 / count(*) AS mean,
                     CAST(sum(CAST(round(v * 1e6) AS HUGEINT)
                              * CAST(round(v * 1e6) AS HUGEINT)) AS DOUBLE)
                       / 1e12 / count(*) AS ex2,
                     min(v) AS lo, max(v) AS hi
              FROM base GROUP BY g
            ), st AS (
              SELECT g, n, mean,
                     CASE WHEN lo < hi THEN sqrt(ex2 - mean * mean)
                          ELSE 0.0 END AS std
              FROM mom
            ), w AS (
              SELECT g, n, mean, std,
                     CAST(round(CAST(n AS DOUBLE) * std * 1e6) AS BIGINT)
                       AS wt
              FROM st
            ), bk AS (
              SELECT g, wt,
                     CAST((list_reduce(
                             list_prepend(CAST(0 AS BIGINT),
                               list_transform(range(1, length(g) + 1),
                                 i -> CAST(unicode(substring(g, CAST(i AS INT), 1)) AS BIGINT))),
                             (acc, cp) -> (acc * 31 + cp) % 1000000007)
                           * 2654435761) % 8 AS INT) AS bkt
              FROM w
            ), bw AS (
              SELECT bkt, sum(wt) AS bwt FROM bk GROUP BY bkt
            ), lvl1 AS (
              SELECT bkt, bwt,
                     sum(bwt) OVER (ORDER BY bkt ASC ROWS UNBOUNDED PRECEDING)
                       AS cumw,
                     sum(bwt) OVER () AS W
              FROM bw
            ), bb AS (
              SELECT bkt, bwt,
                     CASE WHEN W <= 0 THEN 0
                          ELSE (1000::HUGEINT * cumw) // W
                               - (1000::HUGEINT * (cumw - bwt)) // W
                     END AS bbudget
              FROM lvl1
            ), lvl2 AS (
              SELECT bk.g, bk.wt, bb.bwt, bb.bbudget,
                     sum(bk.wt) OVER (PARTITION BY bk.bkt ORDER BY bk.g ASC
                                      ROWS UNBOUNDED PRECEDING) AS cum
              FROM bk JOIN bb USING (bkt)
            )
            SELECT w.g AS source,
                   CAST(w.n AS BIGINT) AS n_stratum,
                   round(w.mean, 6) + 0.0 AS mean,
                   round(w.std, 6) AS std,
                   w.wt AS neyman_weight,
                   CAST(CASE WHEN l.bwt <= 0 OR w.wt <= 0 THEN 0
                        ELSE (l.bbudget::HUGEINT * l.cum) // l.bwt
                             - (l.bbudget::HUGEINT * (l.cum - w.wt)) // l.bwt
                        END AS BIGINT) AS alloc
            FROM w JOIN lvl2 l ON w.g = l.g
        """,
        "q139_winnow_overlap": r"""
            -- full winnowing replay: char-8-gram Horner hashes ->
            -- rightmost-min per window of 4 (slice / list_min /
            -- reversed list_position) -> distinct fp values ->
            -- df-capped pair join (q130/q127 conventions)
            WITH docs0 AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 80
            ),
            docs AS (
              SELECT doc_id AS id,
                     CASE WHEN doc_id % 3 = 0
                          THEN text ||
                               ' to be or not to be that is the question'
                          ELSE text END AS text
              FROM docs0
            ),
            norm AS (
              SELECT id,
                     regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
              FROM docs
            ),
            gr AS (
              SELECT id,
                     list_transform(generate_series(1, len(t) - 7),
                       i -> (list_reduce(
                               list_transform(
                                 string_split(substr(t, CAST(i AS INT), 8), ''),
                                 c -> CAST(unicode(c) AS BIGINT)),
                               (a, x) -> (a * 131 + x) % 2147483647)
                             * 2654435761) % 2147483647) AS g
              FROM norm WHERE len(t) >= 8
            ),
            sel AS (
              SELECT id,
                     unnest(list_distinct(list_transform(
                       generate_series(1, greatest(len(g) - 3, 1)),
                       t -> (t + len(g[t:least(t + 3, len(g))])
                               - list_position(
                                   list_reverse(g[t:least(t + 3, len(g))]),
                                   list_min(g[t:least(t + 3, len(g))])))
                            * 2147483647::BIGINT
                            + list_min(g[t:least(t + 3, len(g))])))) AS e
              FROM gr
            ),
            fps AS (SELECT DISTINCT id, e % 2147483647 AS fp FROM sel),
            sizes AS (SELECT id, count(*) AS n FROM fps GROUP BY id),
            keep AS (
              SELECT fp FROM fps GROUP BY fp
              HAVING count(*) BETWEEN 2 AND 50
            ),
            pr AS (
              SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
              FROM fps a
              JOIN keep k ON a.fp = k.fp
              JOIN fps b ON b.fp = a.fp AND a.id < b.id
              GROUP BY 1, 2
            )
            SELECT p.id_a, p.id_b,
                   CAST(p.n_shared AS BIGINT) AS n_shared,
                   CAST(sa.n AS BIGINT) AS n_a,
                   CAST(sb.n AS BIGINT) AS n_b,
                   round(CAST(p.n_shared AS DOUBLE)
                         / CAST(least(sa.n, sb.n) AS DOUBLE), 6) AS overlap
            FROM pr p
            JOIN sizes sa ON sa.id = p.id_a
            JOIN sizes sb ON sb.id = p.id_b
        """,
        "q140_incremental_dedup": r"""
            -- exact-Jaccard replay of incremental admission: corpus
            -- probe (min matching corpus id), then q21-style recursive
            -- components over the surviving new docs
            WITH RECURSIVE
            corpus AS (
              SELECT doc_id AS id, text FROM documents WHERE doc_id < 120
            ),
            newdocs AS (
              SELECT doc_id + 10000 AS id,
                     CASE WHEN doc_id < 120 AND doc_id % 2 = 1
                          THEN text || ' refreshed' ELSE text END AS text
              FROM documents WHERE doc_id >= 60 AND doc_id < 180
              UNION ALL
              SELECT doc_id + 20000 AS id, text || ' v2' AS text
              FROM documents
              WHERE doc_id >= 120 AND doc_id < 180 AND doc_id % 3 = 0
            ),
            gc AS (
              SELECT id,
                     CASE WHEN len(string_split(n, ' ')) >= 3
                          THEN list_distinct(list_transform(
                                 generate_series(1, len(string_split(n,' '))-2),
                                 i -> string_split(n,' ')[i] || ' ' ||
                                      string_split(n,' ')[i+1] || ' ' ||
                                      string_split(n,' ')[i+2]))
                          ELSE [n] END AS grams
              FROM (SELECT id, regexp_replace(lower(trim(text)),
                                              '\s+', ' ', 'g') AS n
                    FROM corpus)
            ),
            gn AS (
              SELECT id,
                     CASE WHEN len(string_split(n, ' ')) >= 3
                          THEN list_distinct(list_transform(
                                 generate_series(1, len(string_split(n,' '))-2),
                                 i -> string_split(n,' ')[i] || ' ' ||
                                      string_split(n,' ')[i+1] || ' ' ||
                                      string_split(n,' ')[i+2]))
                          ELSE [n] END AS grams
              FROM (SELECT id, regexp_replace(lower(trim(text)),
                                              '\s+', ' ', 'g') AS n
                    FROM newdocs)
            ),
            dupc AS (
              SELECT n.id, min(c.id) AS dup_of
              FROM gn n JOIN gc c
                ON CAST(len(list_intersect(n.grams, c.grams)) AS DOUBLE)
                   / greatest(len(n.grams) + len(c.grams)
                              - len(list_intersect(n.grams, c.grams)), 1)
                   >= 0.5
              GROUP BY n.id
            ),
            surv AS (
              SELECT g.* FROM gn g
              WHERE g.id NOT IN (SELECT id FROM dupc)
            ),
            e0 AS (
              SELECT a.id AS ia, b.id AS ib
              FROM surv a JOIN surv b ON a.id < b.id
              WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / greatest(len(a.grams) + len(b.grams)
                               - len(list_intersect(a.grams, b.grams)), 1)
                    >= 0.5
            ),
            edges AS (
              SELECT ia, ib FROM e0
              UNION ALL SELECT ib AS ia, ia AS ib FROM e0
            ),
            walk(id, rep) AS (
              SELECT id, id FROM surv
              UNION
              SELECT e.ia, w.rep FROM edges e JOIN walk w ON w.id = e.ib
            ),
            clus AS (SELECT id, min(rep) AS rep FROM walk GROUP BY id)
            SELECT id AS doc_id, 'dup_of_corpus' AS status, dup_of
            FROM dupc
            UNION ALL
            SELECT id AS doc_id,
                   CASE WHEN rep = id THEN 'kept'
                        ELSE 'dup_of_new' END AS status,
                   CASE WHEN rep = id THEN NULL ELSE rep END AS dup_of
            FROM clus
        """,
        "q141_segment_blocks": r"""
            -- full segmentation replay: same page synthesis, same
            -- RE2-safe regexes, struct lambdas for per-block
            -- (visible text, anchor chars), integer link-density test
            WITH pages AS (
              SELECT doc_id,
                     '<html><head><title>x</title>' ||
                     CASE WHEN doc_id % 3 = 0
                          THEN '<script>var x=1;</script>' ELSE '' END ||
                     '</head><body><nav>' ||
                     '<a href="/h">Home</a> <a href="/n">News</a> ' ||
                     '<a href="/s">Shop</a> <a href="/c">Contact</a>' ||
                     '</nav><p>' || coalesce(text, '') || '</p><div>' ||
                     CASE WHEN doc_id % 2 = 0
                          THEN substr(coalesce(text, ''), 1, 40)
                          ELSE 'short' END ||
                     '</div><footer>' ||
                     '<a href="/h">Home</a> <a href="/n">News</a> ' ||
                     '<a href="/s">Shop</a> <a href="/c">Contact</a>' ||
                     '</footer></body></html>' AS html
              FROM documents
            ),
            cells AS (
              SELECT doc_id,
                     list_transform(
                       string_split_regex(
                         regexp_replace(
                           regexp_replace(html,
                             '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
                           '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
                         '(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|table|tr|td|th|section|article|header|footer|nav|blockquote)\b[^>]*>'),
                       b -> struct_pack(
                         vis := trim(regexp_replace(
                                  regexp_replace(b, '<[^>]*>', ' ', 'g'),
                                  '\s+', ' ', 'g')),
                         na := coalesce(list_sum(list_transform(
                                 regexp_extract_all(b,
                                   '(?i)<a\b[^>]*>([^<]*)', 1),
                                 a -> length(a))), 0))) AS cs
              FROM pages
            ),
            f AS (
              SELECT doc_id,
                     list_filter(cs, c -> length(c.vis) > 0) AS ne
              FROM cells
            ),
            g AS (
              SELECT doc_id, ne,
                     list_filter(ne, c -> length(c.vis) >= 30
                                 AND c.na * 100 <= 33 * length(c.vis)) AS ct
              FROM f
            )
            SELECT doc_id AS id,
                   CAST(len(ne) AS INT) AS n_blocks,
                   CAST(len(ct) AS INT) AS n_content_blocks,
                   CAST(coalesce(list_sum(list_transform(ct,
                          c -> length(c.vis))), 0) AS BIGINT) AS main_chars,
                   CAST(coalesce(list_sum(list_transform(ne,
                          c -> length(c.vis))), 0)
                        - coalesce(list_sum(list_transform(ct,
                            c -> length(c.vis))), 0) AS BIGINT)
                     AS boiler_chars,
                   array_to_string(list_transform(ct, c -> c.vis), ' ')
                     AS main_text
            FROM g
        """,
        "q142_materialize_mixture": r"""
            -- coin + copy-count replay: same epoch formula, floor(e)
            -- copies + Knuth-coin extra at 1e-6 resolution
            WITH ep AS (
              SELECT source,
                     0.4 + CAST(CAST(substr(source, 4) AS INT) % 7
                                AS DOUBLE) * 0.45 AS e
              FROM (SELECT DISTINCT source FROM documents)
            ),
            j AS (
              SELECT d.doc_id, d.source,
                     CAST(floor(e) AS INT)
                     + CASE WHEN ((d.doc_id % 1000000007) * 2654435761)
                                 % 1000000
                              < CAST(round((e - floor(e)) * 1000000)
                                     AS BIGINT)
                            THEN 1 ELSE 0 END AS nc
              FROM documents d JOIN ep USING (source)
            )
            SELECT doc_id, source,
                   CAST(unnest(generate_series(1, nc)) AS INT) AS copy
            FROM j WHERE nc >= 1
        """,
        "q143_cluster_balanced_sample": r"""
            -- projection (q96 replay, 4 planes) -> sign code ->
            -- sqrt-weight -> q83 allocator replay (16 buckets, total
            -- 100, string-keyed level-2 order) -> prefilter + rank
            WITH proj AS (
              SELECT vec_id,
                     list_transform(range(0, 4), j -> round(
                       list_aggregate(list_transform(range(1, 65),
                         i -> CAST(embedding[i] AS DOUBLE)
                              * (CASE WHEN (((CAST(i - 1 AS BIGINT) * 1000003
                                              + CAST(j AS BIGINT) * 7919)
                                             * 2654435761) >> 16) & 1 = 0
                                      THEN 1.0 ELSE -1.0 END)), 'sum')
                       * (1.0 / sqrt(CAST(64 AS DOUBLE))), 6)) AS proj
              FROM embeddings
            ),
            asg AS (
              SELECT vec_id,
                     CAST((CASE WHEN proj[1] > 0 THEN 1 ELSE 0 END)
                        + (CASE WHEN proj[2] > 0 THEN 2 ELSE 0 END)
                        + (CASE WHEN proj[3] > 0 THEN 4 ELSE 0 END)
                        + (CASE WHEN proj[4] > 0 THEN 8 ELSE 0 END)
                          AS INT) AS cluster,
                     ((vec_id % 1000000007) * 2654435761) % 1000000 AS coin
              FROM proj
            ),
            sz AS (SELECT cluster, count(*) AS n FROM asg GROUP BY cluster),
            w AS (
              SELECT cluster, n,
                     CAST(round(sqrt(CAST(n AS DOUBLE)) * 1e6) AS BIGINT)
                       AS wt
              FROM sz
            ),
            bk AS (
              SELECT cluster, wt,
                     CAST((list_reduce(
                             list_prepend(CAST(0 AS BIGINT),
                               list_transform(
                                 range(1, length(CAST(cluster AS VARCHAR)) + 1),
                                 i -> CAST(unicode(substring(
                                        CAST(cluster AS VARCHAR),
                                        CAST(i AS INT), 1)) AS BIGINT))),
                             (acc, cp) -> (acc * 31 + cp) % 1000000007)
                           * 2654435761) % 16 AS INT) AS bkt
              FROM w
            ),
            bw AS (SELECT bkt, sum(wt) AS bwt FROM bk GROUP BY bkt),
            lvl1 AS (
              SELECT bkt, bwt,
                     sum(bwt) OVER (ORDER BY bkt ASC ROWS UNBOUNDED PRECEDING)
                       AS cumw,
                     sum(bwt) OVER () AS W
              FROM bw
            ),
            bb AS (
              SELECT bkt, bwt,
                     CASE WHEN W <= 0 THEN 0
                          ELSE (100::HUGEINT * cumw) // W
                               - (100::HUGEINT * (cumw - bwt)) // W
                     END AS bbudget
              FROM lvl1
            ),
            lvl2 AS (
              SELECT bk.cluster, bk.wt, bb.bwt, bb.bbudget,
                     sum(bk.wt) OVER (PARTITION BY bk.bkt
                                      ORDER BY CAST(bk.cluster AS VARCHAR) ASC
                                      ROWS UNBOUNDED PRECEDING) AS cum
              FROM bk JOIN bb USING (bkt)
            ),
            q AS (
              SELECT w.cluster, w.n,
                     least(CAST(CASE WHEN l.bwt <= 0 OR w.wt <= 0 THEN 0
                          ELSE (l.bbudget::HUGEINT * l.cum) // l.bwt
                               - (l.bbudget::HUGEINT * (l.cum - w.wt))
                                 // l.bwt
                          END AS BIGINT), w.n) AS quota
              FROM w JOIN lvl2 l ON w.cluster = l.cluster
            ),
            pre AS (
              SELECT a.vec_id, a.cluster, a.coin, q.quota,
                     least(1000000,
                           CAST(ceil(3000000.0 * CAST(q.quota AS DOUBLE)
                                     / CAST(q.n AS DOUBLE)) AS BIGINT))
                       AS thresh
              FROM asg a JOIN q USING (cluster)
            ),
            sel AS (
              SELECT vec_id, cluster, coin, quota,
                     row_number() OVER (PARTITION BY cluster
                                        ORDER BY coin ASC, vec_id ASC) AS rk
              FROM pre WHERE coin < thresh
            )
            SELECT vec_id, cluster, coin FROM sel WHERE rk <= quota
        """,
        "q144_winnow_spans": r"""
            -- q139 winnow replay + positions + diagonal islands
            WITH docs0 AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 80
            ),
            docs AS (
              SELECT doc_id AS id,
                     CASE WHEN doc_id % 3 = 0
                          THEN text ||
                               ' to be or not to be that is the question'
                          ELSE text END AS text
              FROM docs0
            ),
            norm AS (
              SELECT id,
                     regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
              FROM docs
            ),
            gr AS (
              SELECT id,
                     list_transform(generate_series(1, len(t) - 7),
                       i -> (list_reduce(
                               list_transform(
                                 string_split(substr(t, CAST(i AS INT), 8), ''),
                                 c -> CAST(unicode(c) AS BIGINT)),
                               (a, x) -> (a * 131 + x) % 2147483647)
                             * 2654435761) % 2147483647) AS g
              FROM norm WHERE len(t) >= 8
            ),
            sel AS (
              SELECT id,
                     unnest(list_distinct(list_transform(
                       generate_series(1, greatest(len(g) - 3, 1)),
                       t -> (t + len(g[t:least(t + 3, len(g))])
                               - list_position(
                                   list_reverse(g[t:least(t + 3, len(g))]),
                                   list_min(g[t:least(t + 3, len(g))])))
                            * 2147483647::BIGINT
                            + list_min(g[t:least(t + 3, len(g))])))) AS e
              FROM gr
            ),
            fpp AS (
              SELECT DISTINCT id,
                     CAST(e // 2147483647 AS INT) AS pos,
                     e % 2147483647 AS fp
              FROM sel
            ),
            keep AS (
              SELECT fp FROM (SELECT DISTINCT id, fp FROM fpp)
              GROUP BY fp HAVING count(*) BETWEEN 2 AND 50
            ),
            m AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                     a.pos AS pos_a, b.pos AS pos_b,
                     a.pos - b.pos AS d
              FROM fpp a
              JOIN keep k ON a.fp = k.fp
              JOIN fpp b ON b.fp = a.fp AND a.id < b.id
            ),
            isl AS (
              SELECT *,
                     CASE WHEN pos_a - lag(pos_a) OVER
                            (PARTITION BY id_a, id_b, d
                             ORDER BY pos_a ASC) > 11
                          THEN 1 ELSE 0 END AS brk
              FROM m
            ),
            grp AS (
              SELECT *,
                     sum(brk) OVER (PARTITION BY id_a, id_b, d
                                    ORDER BY pos_a ASC
                                    ROWS UNBOUNDED PRECEDING) AS isl_id
              FROM isl
            )
            SELECT id_a, id_b,
                   min(pos_a) AS start_a,
                   CAST(max(pos_a) + 7 AS INT) AS end_a,
                   min(pos_b) AS start_b,
                   CAST(max(pos_b) + 7 AS INT) AS end_b,
                   count(*) AS n_fps
            FROM grp
            GROUP BY id_a, id_b, d, isl_id
            HAVING count(*) >= 2
        """,
        "q145_mime_sniff": r"""
            -- same payload synthesis, sniff replayed on the hex prefix
            WITH pages AS (
              SELECT doc_id,
                     unhex(CASE doc_id % 6
                           WHEN 0 THEN '89504E470D0A1A0A'
                           WHEN 1 THEN 'FFD8FFE0'
                           WHEN 2 THEN '25504446'
                           WHEN 3 THEN '1F8B08'
                           WHEN 4 THEN '3C21444F43545950'
                           ELSE '' END)
                       || encode(coalesce(text, '')) AS payload,
                     CASE doc_id % 3
                          WHEN 0 THEN 'image/png'
                          WHEN 1 THEN 'text/html; charset=utf-8'
                          ELSE NULL END AS ct
              FROM documents
            ),
            h AS (
              SELECT doc_id, payload, ct,
                     upper(substr(hex(payload), 1, 32)) AS p
              FROM pages
            ),
            s AS (
              SELECT doc_id, ct,
                     octet_length(payload) AS n_bytes,
                     CASE
                       WHEN substr(p, 1, 8) = '52494646' THEN
                         CASE WHEN substr(p, 17, 8) = '57454250'
                                THEN 'image/webp'
                              WHEN substr(p, 17, 8) = '57415645'
                                THEN 'audio/wav'
                              ELSE 'application/octet-stream' END
                       WHEN substr(p, 1, 8) = '89504E47' THEN 'image/png'
                       WHEN substr(p, 1, 8) = '47494638' THEN 'image/gif'
                       WHEN substr(p, 1, 6) = 'FFD8FF' THEN 'image/jpeg'
                       WHEN substr(p, 1, 8) = '25504446'
                         THEN 'application/pdf'
                       WHEN substr(p, 1, 8) IN
                            ('504B0304', '504B0506', '504B0708')
                         THEN 'application/zip'
                       WHEN substr(p, 1, 4) = '1F8B'
                         THEN 'application/gzip'
                       WHEN substr(p, 1, 6) = '494433' THEN 'audio/mpeg'
                       WHEN substr(p, 1, 8) = '4F676753'
                         THEN 'application/ogg'
                       WHEN substr(p, 1, 4) = '424D' THEN 'image/bmp'
                       WHEN substr(p, 9, 8) = '66747970' THEN 'video/mp4'
                       WHEN substr(p, 1, 8) IN
                            ('3C21444F', '3C68746D', '3C48544D', '3C3F786D')
                         THEN 'text/html'
                       ELSE 'application/octet-stream'
                     END AS sniffed_mime
              FROM h
            )
            SELECT doc_id AS id, sniffed_mime, n_bytes,
                   ct AS declared_mime,
                   lower(trim(string_split(ct, ';')[1])) <> sniffed_mime
                     AS mismatch
            FROM s
        """,
        "q146_mixture_diversity": r"""
            -- shares + entropy with HUGEINT fixed-point term sums
            WITH per AS (
              SELECT source AS g,
                     sum(greatest(coalesce(n_chars, 0), 0)) AS mg
              FROM documents WHERE source IS NOT NULL
              GROUP BY source
              HAVING sum(greatest(coalesce(n_chars, 0), 0)) > 0
            ),
            rk AS (
              SELECT g, mg,
                     row_number() OVER (ORDER BY mg DESC, g ASC) AS rk,
                     sum(mg) OVER () AS M
              FROM per
            ),
            t AS (
              SELECT rk, CAST(mg AS DOUBLE) / CAST(M AS DOUBLE) AS p,
                     CAST(M AS BIGINT) AS M
              FROM rk
            )
            SELECT count(*) AS n_groups,
                   max(M) AS total_mass,
                   round(exp(-(CAST(sum(CAST(round(p * ln(p) * 1e12)
                                  AS HUGEINT)) AS DOUBLE) / 1e12)), 6)
                     AS eff_groups,
                   round(CAST(sum(CAST(round(p * p * 1e12) AS HUGEINT))
                              AS DOUBLE) / 1e12, 6) AS hhi,
                   round(max(CASE WHEN rk = 1 THEN p END), 6)
                     AS top1_share,
                   round(CAST(coalesce(sum(CASE WHEN rk <= 5
                              THEN CAST(round(p * 1e12) AS HUGEINT) END),
                              0::HUGEINT) AS DOUBLE) / 1e12, 6)
                     AS top5_share
            FROM t
        """,
        "q147_link_reciprocity": r"""
            -- q36 edges + planted reversals; swapped-key self-join
            WITH nn AS (SELECT count(*) AS n FROM documents),
            e0 AS (
              SELECT d.doc_id AS src,
                     (d.doc_id * 37 + j.j * 1009) % nn.n AS dst
              FROM documents d
              CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) j
              CROSS JOIN nn
            ),
            base AS (SELECT src, dst FROM e0 WHERE dst <> src),
            plus AS (
              SELECT src, dst FROM base
              UNION ALL
              SELECT dst AS src, src AS dst FROM base WHERE src % 4 = 0
            ),
            e AS (
              SELECT DISTINCT src AS s, dst AS d FROM plus
              WHERE src <> dst
            ),
            deg AS (SELECT s, count(*) AS n_out FROM e GROUP BY s),
            rec AS (
              SELECT a.s, count(*) AS n_recip
              FROM e a JOIN e b ON a.s = b.d AND a.d = b.s
              GROUP BY a.s
            )
            SELECT deg.s AS node,
                   CAST(deg.n_out AS BIGINT) AS n_out,
                   CAST(coalesce(rec.n_recip, 0) AS BIGINT) AS n_recip,
                   round(CAST(coalesce(rec.n_recip, 0) AS DOUBLE)
                         / CAST(deg.n_out AS DOUBLE), 6) AS reciprocity
            FROM deg LEFT JOIN rec ON deg.s = rec.s
        """,
        "q148_langid_confusion": f"""
            -- q11 score replay + grouped confusion rollup
            WITH pred AS (
              SELECT lang AS label,
                     CASE WHEN coalesce(greatest(s_de, s_en, s_es, s_fr), 0) <= 0
                            THEN 'und'
                          WHEN s_de >= s_en AND s_de >= s_es
                               AND s_de >= s_fr THEN 'de'
                          WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                          WHEN s_es >= s_fr THEN 'es'
                          ELSE 'fr' END AS pred
              FROM (
                SELECT lang, {_lang_scores_sql()}
                FROM (SELECT lang, ' ' || lower(text) || ' ' AS p
                      FROM documents WHERE lang IS NOT NULL)
              )
            ),
            per AS (
              SELECT label, pred, count(*) AS n
              FROM pred GROUP BY 1, 2
            ),
            tot AS (SELECT label, count(*) AS t FROM pred GROUP BY 1)
            SELECT per.label, per.pred, per.n,
                   round(CAST(per.n AS DOUBLE) / CAST(t AS DOUBLE), 6)
                     AS frac
            FROM per JOIN tot USING (label)
        """,
        "q149_page_directives": r"""
            -- same page synthesis, same RE2-safe directive regexes
            WITH pages AS (
              SELECT doc_id,
                     '<html><head><title>t</title>' ||
                     CASE
                       WHEN doc_id % 4 = 0 THEN
                         '<META NAME=robots CONTENT="noindex, nofollow">'
                       WHEN doc_id % 4 = 1 THEN
                         '<link rel="canonical" href="https://ex'
                         || CAST(doc_id % 7 AS VARCHAR) || '.com/canon/'
                         || CAST(doc_id AS VARCHAR) || '">'
                       WHEN doc_id % 4 = 2 THEN
                         '<link rel="alternate" hreflang="fr" href="/fr">'
                         || CASE WHEN doc_id % 8 = 2 THEN
                              '<link hreflang="de-AT" rel="alternate" href="/de">'
                            ELSE '' END
                       ELSE '' END ||
                     '</head><body>' || coalesce(text, '')
                     || '</body></html>' AS html
              FROM documents
            ),
            tags AS (
              SELECT doc_id,
                     regexp_extract(html,
                       '(?i)<meta\b[^>]*name\s*=\s*["'']?robots["'']?[^>]*>',
                       0) AS mtag,
                     regexp_extract(html,
                       '(?i)<link\b[^>]*rel\s*=\s*["'']?canonical["'']?[^>]*>',
                       0) AS ctag,
                     regexp_extract_all(html,
                       '(?i)<link\b[^>]*hreflang\s*=\s*["'']?[^"''>\s]+[^>]*>',
                       0) AS hl
              FROM pages
            ),
            ex AS (
              SELECT doc_id,
                     -- quoted value first, unquoted fallback (matches
                     -- the Spark attr() helper)
                     lower(CASE WHEN regexp_extract(mtag,
                              '(?i)content\s*=\s*["'']([^"'']*)', 1) <> ''
                           THEN regexp_extract(mtag,
                              '(?i)content\s*=\s*["'']([^"'']*)', 1)
                           ELSE regexp_extract(mtag,
                              '(?i)content\s*=\s*([^\s"''>]+)', 1) END)
                       AS robots_content,
                     CASE WHEN regexp_extract(ctag,
                            '(?i)href\s*=\s*["'']([^"'']*)', 1) <> ''
                          THEN regexp_extract(ctag,
                            '(?i)href\s*=\s*["'']([^"'']*)', 1)
                          ELSE regexp_extract(ctag,
                            '(?i)href\s*=\s*([^\s"''>]+)', 1) END AS canon,
                     hl
              FROM tags
            )
            SELECT doc_id AS id,
                   robots_content,
                   contains(robots_content, 'noindex') AS noindex,
                   contains(robots_content, 'nofollow') AS nofollow,
                   CASE WHEN canon <> '' THEN canon END AS canonical,
                   CAST(len(hl) AS INT) AS n_hreflang,
                   coalesce(array_to_string(list_sort(list_transform(hl,
                     t -> lower(regexp_extract(t,
                            '(?i)hreflang\s*=\s*["'']?([^"''>\s]+)', 1)))),
                     ','), '') AS hreflang_langs
            FROM ex
        """,
        "q150_canonical_override": r"""
            -- canonicalization outcome written directly (q15 style):
            -- lowercase host, sorted query; same-host targets override
            SELECT 'https://Host' || h || '.example/p/' || i
                     || '?b=2&a=1' AS url,
                   'https://host' || h || '.example/p/' || i
                     || '?a=1&b=2' AS url_canon,
                   CASE WHEN m = 0
                        THEN 'https://host' || h || '.example/p/' || i
                        ELSE 'https://host' || h || '.example/p/' || i
                             || '?a=1&b=2' END AS effective_url,
                   (m = 0) AS overridden
            FROM (SELECT CAST(doc_id AS VARCHAR) AS i,
                         CAST(doc_id % 7 AS VARCHAR) AS h,
                         doc_id % 3 AS m
                  FROM documents)
        """,
        "q151_curation_funnel": f"""
            -- chained stage replays (q62 build+clean, q11 langid on
            -- the CLEANED text, q12 quality on cleaned, q09 dedup
            -- rank among survivors, q35 gram probe), counts unioned
            WITH built AS (
              SELECT doc_id,
                     replace(replace(replace(text,
                       ' slow ', '.' || chr(10)),
                       ' fast ', chr(10)),
                       ' big ', '!' || chr(10))
                     || CASE WHEN doc_id % 7 = 0
                          THEN chr(10) || 'Lorem ipsum dolor sit amet.' ELSE '' END
                     || CASE WHEN doc_id % 11 = 0
                          THEN chr(10) || 'if (x) {{ enable(); }}' ELSE '' END
                     || CASE WHEN doc_id % 5 = 0
                          THEN chr(10) || 'Please enable javascript to continue today.'
                          ELSE '' END
                     || CASE WHEN doc_id % 13 = 0
                          THEN chr(10) || 'This page badword appears right here.'
                          ELSE '' END AS t2
              FROM documents
            ),
            cleaned AS (
              SELECT doc_id, t2,
                     coalesce(array_to_string(list_filter(
                       list_filter(
                         list_transform(string_split(t2, chr(10)), l -> trim(l)),
                         l -> length(l) > 0),
                       l -> right(l, 1) IN ('.', '!', '?', '"')
                         AND len(string_split_regex(l, '\s+')) >= 3
                         AND NOT list_contains(
                               string_split_regex(lower(l), '[^a-z0-9]+'),
                               'javascript')
                         AND NOT contains(lower(l), 'terms of use')
                         AND NOT contains(lower(l), 'privacy policy')
                         AND NOT contains(lower(l), 'cookie policy')
                         AND NOT contains(lower(l), 'uses cookies')
                         AND NOT contains(lower(l), 'use of cookies')
                         AND NOT contains(lower(l), 'use cookies')
                     ), chr(10)), '') AS clean_text
              FROM built WHERE doc_id % 13 <> 0
            ),
            flagged AS (
              SELECT doc_id, t2, clean_text,
                     (CAST(len(regexp_extract_all(clean_text, '[.!?]'))
                           AS INT) >= 5
                      AND NOT contains(lower(t2), 'lorem ipsum')
                      AND NOT contains(t2, '{{')
                      AND NOT list_has_any(
                            string_split_regex(lower(t2), '[^a-z0-9]+'),
                            ['badword'])) AS k1
              FROM cleaned
            ),
            lp AS (
              SELECT *, ' ' || lower(clean_text) || ' ' AS p FROM flagged
            ),
            langed AS (
              SELECT doc_id, t2, clean_text, k1,
                     (k1 AND (
                       CASE WHEN coalesce(greatest(s_de, s_en, s_es, s_fr), 0) <= 0
                              THEN 'und'
                            WHEN s_de >= s_en AND s_de >= s_es
                                 AND s_de >= s_fr THEN 'de'
                            WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                            WHEN s_es >= s_fr THEN 'es'
                            ELSE 'fr' END) = 'en') AS k2
              FROM (SELECT *, {_lang_scores_sql()} FROM lp)
            ),
            qual AS (
              SELECT doc_id, t2, clean_text, k1, k2,
                     (k2 AND (
                       0.35 * (n_alpha / greatest(n_chars, 1))
                       + 0.35 * least(4.0 * stop_hits / greatest(n_words, 1), 1.0)
                       + 0.2  * least(n_words / 100.0, 1.0)
                       - 0.1  * (n_punct / greatest(n_chars, 1))) >= 0.3) AS k3
              FROM (
                SELECT doc_id, t2, clean_text, k1, k2,
                       CAST(length(clean_text) AS DOUBLE) AS n_chars,
                       CAST(CASE WHEN length(trim(clean_text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(clean_text), '\s+'))
                            END AS BIGINT) AS n_words,
                       CAST(length(regexp_replace(clean_text,
                            '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS n_alpha,
                       CAST(length(regexp_replace(clean_text,
                            '[^.,;:!?]', '', 'g')) AS DOUBLE) AS n_punct,
                       CAST({_stopword_hits_sql()} AS DOUBLE) AS stop_hits
                FROM (SELECT *, ' ' || lower(clean_text) || ' ' AS p
                      FROM langed)
              )
            ),
            ranked AS (
              SELECT q.*,
                     CASE WHEN k3 THEN row_number() OVER (
                       PARTITION BY k3,
                         regexp_replace(lower(trim(clean_text)),
                                        '\s+', ' ', 'g')
                       ORDER BY doc_id ASC) END AS rk
              FROM qual q
            ),
            bg AS (
              SELECT DISTINCT unnest(list_distinct(list_transform(
                       generate_series(1, len(ws) - 4),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                            || ' ' || ws[i+3] || ' ' || ws[i+4]))) AS g
              FROM (
                SELECT string_split(regexp_replace(lower(trim(t2)),
                         '\s+', ' ', 'g'), ' ') AS ws
                FROM built WHERE doc_id % 13 = 0
              ) WHERE len(ws) >= 5
            ),
            dirty AS (
              -- corpus-side grams over the STAGED clean_text (the bytes
              -- stage 6 emits), bench-side grams stay over raw t2
              SELECT DISTINCT doc_id FROM (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                         generate_series(1, len(ws) - 4),
                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                              || ' ' || ws[i+3] || ' ' || ws[i+4]))) AS g
                FROM (
                  SELECT doc_id,
                         string_split(regexp_replace(lower(trim(clean_text)),
                           '\s+', ' ', 'g'), ' ') AS ws
                  FROM cleaned
                ) WHERE len(ws) >= 5
              ) x JOIN bg USING (g)
            ),
            final AS (
              SELECT r.doc_id, k1, k2, k3,
                     (k3 AND rk = 1) AS k4,
                     (k3 AND rk = 1
                      AND r.doc_id NOT IN (SELECT doc_id FROM dirty)) AS k5
              FROM ranked r
            ),
            agg AS (
              SELECT count(*) AS n0,
                     sum(CASE WHEN k1 THEN 1 ELSE 0 END) AS n1,
                     sum(CASE WHEN k2 THEN 1 ELSE 0 END) AS n2,
                     sum(CASE WHEN k3 THEN 1 ELSE 0 END) AS n3,
                     sum(CASE WHEN k4 THEN 1 ELSE 0 END) AS n4,
                     sum(CASE WHEN k5 THEN 1 ELSE 0 END) AS n5
              FROM final
            )
            SELECT 1 AS stage, 'input' AS name,
                   CAST(n0 AS BIGINT) AS rows_in, CAST(n0 AS BIGINT) AS rows_out FROM agg
            UNION ALL SELECT 2, 'c4_clean', CAST(n0 AS BIGINT), CAST(n1 AS BIGINT) FROM agg
            UNION ALL SELECT 3, 'lang', CAST(n1 AS BIGINT), CAST(n2 AS BIGINT) FROM agg
            UNION ALL SELECT 4, 'quality', CAST(n2 AS BIGINT), CAST(n3 AS BIGINT) FROM agg
            UNION ALL SELECT 5, 'exact_dedup', CAST(n3 AS BIGINT), CAST(n4 AS BIGINT) FROM agg
            UNION ALL SELECT 6, 'decontaminate', CAST(n4 AS BIGINT), CAST(n5 AS BIGINT) FROM agg
        """,
        "q152_curated_corpus": f"""
            -- q151 chain emitting the k5 survivors
            WITH built AS (
              SELECT doc_id,
                     replace(replace(replace(text,
                       ' slow ', '.' || chr(10)),
                       ' fast ', chr(10)),
                       ' big ', '!' || chr(10))
                     || CASE WHEN doc_id % 7 = 0
                          THEN chr(10) || 'Lorem ipsum dolor sit amet.' ELSE '' END
                     || CASE WHEN doc_id % 11 = 0
                          THEN chr(10) || 'if (x) {{ enable(); }}' ELSE '' END
                     || CASE WHEN doc_id % 5 = 0
                          THEN chr(10) || 'Please enable javascript to continue today.'
                          ELSE '' END
                     || CASE WHEN doc_id % 13 = 0
                          THEN chr(10) || 'This page badword appears right here.'
                          ELSE '' END AS t2
              FROM documents
            ),
            cleaned AS (
              SELECT doc_id, t2,
                     coalesce(array_to_string(list_filter(
                       list_filter(
                         list_transform(string_split(t2, chr(10)), l -> trim(l)),
                         l -> length(l) > 0),
                       l -> right(l, 1) IN ('.', '!', '?', '"')
                         AND len(string_split_regex(l, '\s+')) >= 3
                         AND NOT list_contains(
                               string_split_regex(lower(l), '[^a-z0-9]+'),
                               'javascript')
                         AND NOT contains(lower(l), 'terms of use')
                         AND NOT contains(lower(l), 'privacy policy')
                         AND NOT contains(lower(l), 'cookie policy')
                         AND NOT contains(lower(l), 'uses cookies')
                         AND NOT contains(lower(l), 'use of cookies')
                         AND NOT contains(lower(l), 'use cookies')
                     ), chr(10)), '') AS clean_text
              FROM built WHERE doc_id % 13 <> 0
            ),
            flagged AS (
              SELECT doc_id, t2, clean_text,
                     (CAST(len(regexp_extract_all(clean_text, '[.!?]'))
                           AS INT) >= 5
                      AND NOT contains(lower(t2), 'lorem ipsum')
                      AND NOT contains(t2, '{{')
                      AND NOT list_has_any(
                            string_split_regex(lower(t2), '[^a-z0-9]+'),
                            ['badword'])) AS k1
              FROM cleaned
            ),
            lp AS (
              SELECT *, ' ' || lower(clean_text) || ' ' AS p FROM flagged
            ),
            langed AS (
              SELECT doc_id, t2, clean_text, k1,
                     (k1 AND (
                       CASE WHEN coalesce(greatest(s_de, s_en, s_es, s_fr), 0) <= 0
                              THEN 'und'
                            WHEN s_de >= s_en AND s_de >= s_es
                                 AND s_de >= s_fr THEN 'de'
                            WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                            WHEN s_es >= s_fr THEN 'es'
                            ELSE 'fr' END) = 'en') AS k2
              FROM (SELECT *, {_lang_scores_sql()} FROM lp)
            ),
            qual AS (
              SELECT doc_id, t2, clean_text, k1, k2,
                     (k2 AND (
                       0.35 * (n_alpha / greatest(n_chars, 1))
                       + 0.35 * least(4.0 * stop_hits / greatest(n_words, 1), 1.0)
                       + 0.2  * least(n_words / 100.0, 1.0)
                       - 0.1  * (n_punct / greatest(n_chars, 1))) >= 0.3) AS k3
              FROM (
                SELECT doc_id, t2, clean_text, k1, k2,
                       CAST(length(clean_text) AS DOUBLE) AS n_chars,
                       CAST(CASE WHEN length(trim(clean_text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(clean_text), '\s+'))
                            END AS BIGINT) AS n_words,
                       CAST(length(regexp_replace(clean_text,
                            '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS n_alpha,
                       CAST(length(regexp_replace(clean_text,
                            '[^.,;:!?]', '', 'g')) AS DOUBLE) AS n_punct,
                       CAST({_stopword_hits_sql()} AS DOUBLE) AS stop_hits
                FROM (SELECT *, ' ' || lower(clean_text) || ' ' AS p
                      FROM langed)
              )
            ),
            ranked AS (
              SELECT q.*,
                     CASE WHEN k3 THEN row_number() OVER (
                       PARTITION BY k3,
                         regexp_replace(lower(trim(clean_text)),
                                        '\s+', ' ', 'g')
                       ORDER BY doc_id ASC) END AS rk
              FROM qual q
            ),
            bg AS (
              SELECT DISTINCT unnest(list_distinct(list_transform(
                       generate_series(1, len(ws) - 4),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                            || ' ' || ws[i+3] || ' ' || ws[i+4]))) AS g
              FROM (
                SELECT string_split(regexp_replace(lower(trim(t2)),
                         '\s+', ' ', 'g'), ' ') AS ws
                FROM built WHERE doc_id % 13 = 0
              ) WHERE len(ws) >= 5
            ),
            dirty AS (
              -- corpus-side grams over the STAGED clean_text (the bytes
              -- stage 6 emits), bench-side grams stay over raw t2
              SELECT DISTINCT doc_id FROM (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                         generate_series(1, len(ws) - 4),
                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                              || ' ' || ws[i+3] || ' ' || ws[i+4]))) AS g
                FROM (
                  SELECT doc_id,
                         string_split(regexp_replace(lower(trim(clean_text)),
                           '\s+', ' ', 'g'), ' ') AS ws
                  FROM cleaned
                ) WHERE len(ws) >= 5
              ) x JOIN bg USING (g)
            ),
            final AS (
              SELECT r.doc_id, k1, k2, k3,
                     (k3 AND rk = 1) AS k4,
                     (k3 AND rk = 1
                      AND r.doc_id NOT IN (SELECT doc_id FROM dirty)) AS k5
              FROM ranked r
            )
            SELECT f.doc_id, q.clean_text
            FROM final f JOIN qual q ON q.doc_id = f.doc_id
            WHERE f.k5
        """,
        "q153_unigram_lm": _unigram_lm_sql(),
        "q154_unigram_segment": _unigram_lm_sql(emit="segment"),
        "q155_bpe_encode": _bpe_encode_sql(steps=3),
        "q26_task_expansion": """
            WITH entities AS (SELECT unnest(['users','orders']) AS entity),
                 shards   AS (SELECT unnest(generate_series(1, 3)) AS shard),
                 params   AS (SELECT unnest([0, 100]) AS offs)
            SELECT 'https://api.example/v1/' || entity || '/items?limit=50&offset=' || CAST(offs AS VARCHAR) AS url,
                   'GET' AS method
            FROM entities CROSS JOIN shards CROSS JOIN params
        """,
    }
