"""Lexical-statistics family (split from pipeline.py, round 5 — pure move).

Term/corpus statistics and retrieval scoring: TF-IDF/BM25, phrase
search, n-gram LMs, collocations, Zipf/Good-Turing fits, drift and
burstiness, diversity profiles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from raven_spark.operators.dedup import (
    adjacent_pairs_col,
    ngrams_zip_col,
    norm_text_col,
)
from raven_spark.operators.pipeline import (  # shared helpers
    _token_ngrams_col,
)


def corpus_stats(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    percentiles: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group corpus profile: doc counts, mean length, and EXACT
    interpolated token-count percentiles — the report a curation run
    prints before/after every filter stage (length cliffs, sources gone
    degenerate, truncation artifacts live in the tails).

    Exact percentiles group-sort each group's token counts — the right
    call for reporting (groups are sources/hosts: many groups, each
    bounded); swap in percentile_approx for a single global distribution
    over 10^10 docs. One scan, one shuffle on the group key.
    """
    tokens = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    ).cast("bigint")
    pct = F.percentile(F.col("__tok"), list(percentiles))
    out = (
        df.select(F.col(group_col).alias("group_key"),
                  F.length(text_col).alias("__len"), tokens.alias("__tok"))
        .groupBy("group_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("__len"), 6).alias("avg_chars"),
            pct.alias("__p"),
        )
    )
    return out.select(
        "group_key", "n_docs", "avg_chars",
        *[F.round(F.element_at("__p", i + 1), 6).alias(f"p{int(p * 100)}_tokens")
          for i, p in enumerate(percentiles)],
    )

def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k TF-IDF terms per document (Salton & Buckley's weighting —
    the standard corpus keyword-extraction pass; feeds topic tagging,
    near-dup explanation, and per-source vocabulary profiling):

        tf(t, d)  = count of t in d
        idf(t)    = ln(N / df_t),  df_t = docs containing t
        tfidf     = tf x idf, ranked per doc, ties broken by term asc

    Scale shape: the (id, term) aggregate is map-side combinable; the
    document-frequency aggregate runs on DISTINCT (term, id) pairs; the
    per-doc top-k window partitions on the doc id with a LITERAL rank
    bound, so Catalyst's WindowGroupLimit prunes map-side and no doc
    ranks more rows than its own vocabulary. Term text does ride these
    shuffles (the output needs the strings); at 100 TB the standard
    move is a dictionary pass first — hash-aggregate terms to 8-byte
    ids, run this plan on ids, join the strings back onto the O(docs x
    k) result. N (corpus doc count) is one scalar, same posture as
    unigram_logprob's total.

    Output: (id, term, tf, df, tfidf, rank), rank 1..k per doc.
    """
    import math

    terms = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.split(norm_text_col(F.col(text_col)), " ")).alias("term"),
        )
    )
    # N from the base table (no explode, no distinct shuffle); df from
    # the tf aggregate, which already holds exactly one row per distinct
    # (id, term) pair — reusing its exchange instead of re-exploding
    # and re-shuffling every token
    n_docs = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0).count() or 1
    )
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf",
        F.col("tf").cast("double")
        * (F.lit(float(math.log(n_docs))) - F.log(F.col("df").cast("double"))),
    )
    w = Window.partitionBy("id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(int(k)))
        .select(
            "id", "term", "tf", "df",
            F.round("tfidf", 6).alias("tfidf"), "rank",
        )
    )

def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k retrieval (Robertson & Zaragoza 2009, the Okapi
    weighting with Lucene's non-negative idf) — the corpus-side query
    capability that complements ``tfidf_topk``'s keyword extraction:
    given a small query table, the k best documents per query.

        idf(t)      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        score(q, d) = sum over DISTINCT terms t in q of
                      idf(t) * tf(t,d) * (k1+1)
                            / (tf(t,d) + k1 * (1 - b + b * |d|/avgdl))

    Query terms carry integer weights: repeating a term — within one
    query string or across rows sharing a query_id — multiplies its
    contribution by the occurrence count (the query-side aggregate
    counts repeats; per-term score scales by that count).

    Scale shape: the (id, term) tf aggregate is map-side combinable;
    the QUERY-TERM broadcast prune lands directly on it, so everything
    downstream — document frequencies included — sees only the postings
    of the queried terms, never the corpus vocabulary (df over the
    pruned postings equals df over the corpus for those terms). |d|
    comes straight off the scan (no extra shuffle); N and avgdl ride
    the same lazy 1-row broadcast aggregate (no eager driver job), so
    the only per-corpus exchanges are the tf aggregate and the final
    per-(query, doc) sum. The top-k window is literal-bound
    row_number -> WindowGroupLimit prunes map-side.
    Ranking ties break on the 6-dp ROUNDED score (the per-term sum's
    addition order is engine-dependent at 1e-16; ranking on the rounded
    value keeps Spark and the SQL oracle picking identical rows), then
    doc id ascending.

    Output: (query_id, id, score, rank), rank 1..k per query.
    """
    base = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("id"),
        F.split(norm_text_col(F.col(text_col)), " ").alias("__toks"),
    )
    toks = base.select("id", F.size("__toks").alias("dl"),
                       F.explode("__toks").alias("term"))
    tf = toks.groupBy("id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    stats = base.select(
        F.greatest(F.count(F.lit(1)), F.lit(1)).cast("double").alias("__n"),
        F.avg(F.size("__toks")).alias("avgdl"),
    )
    qpairs = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(F.split(norm_text_col(F.col(query_col)), " ")).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("__qw"))
    )
    # prune the corpus postings to queried terms BEFORE anything else:
    # df and the scoring join then touch O(query-term postings), not
    # O(corpus vocabulary)
    tfq = tf.join(F.broadcast(qpairs.select("term").distinct()), "term")
    dfreq = tfq.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = F.broadcast(qpairs)
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    contrib = (
        tfq.join(qterms, "term")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__c",
            F.col("__qw").cast("double")
            * idf
            * F.col("tf").cast("double") * F.lit(float(k1) + 1.0)
            / (
                F.col("tf").cast("double")
                + F.lit(float(k1))
                * (F.lit(1.0 - float(b))
                   + F.lit(float(b)) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    scored = contrib.groupBy("query_id", "id").agg(
        F.round(F.sum("__c"), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(int(k)))
        .select("query_id", "id", "score", "rank")
    )

def phrase_search(
    df: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_id_col: str = "phrase_id",
    phrase_col: str = "phrase",
    k: int = 10,
) -> DataFrame:
    """Exact-phrase search over positional postings — the retrieval
    capability BM25's bag-of-words scoring cannot express: a document
    matches only where the phrase's terms occur CONSECUTIVELY, and the
    hit count is the number of start positions (overlaps counted, the
    standard positional-index semantics).

    Scale shape: the corpus explodes to positional postings but is
    pruned to the phrases' term set by a broadcast semi-join BEFORE any
    shuffle, so the per-doc aggregate sees O(phrase-term postings), not
    O(corpus tokens). ONE exchange total: the pruned postings
    repartition on the doc id, which satisfies both downstream
    aggregates' clustering ((id, term) and (id) — plan-asserted in
    tests); the phrase table — user
    queries, O(10-10^3) rows — broadcasts against candidates and the
    consecutive-position check is pure array algebra inside codegen
    (first term's positions filtered by array_contains lookups at
    p + offset for the rest). The top-k window is literal-bound
    row_number -> WindowGroupLimit prunes map-side. Ties break on hit
    count desc, then doc id asc.

    Output: (phrase_id, id, n_hits, rank), rank 1..k per phrase,
    matching docs only (n_hits >= 1).
    """
    ph = phrases.select(
        F.col(phrase_id_col).alias("phrase_id"),
        F.split(norm_text_col(F.col(phrase_col)), " ").alias("__pts"),
    ).filter(F.size("__pts") > 0)
    pterms = ph.select(F.explode("__pts").alias("term")).distinct()

    postings = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(norm_text_col(F.col(text_col)), " ")).alias(
            "pos", "term"
        ),
    )
    # one exchange total: repartition the pruned postings on id —
    # HashPartitioning(id) satisfies BOTH downstream aggregates'
    # clustering ((id, term) and (id)), so neither adds an exchange;
    # without this the (id, term) aggregate shuffles on (id, term),
    # which does NOT satisfy the id-level aggregate, costing a second
    # full exchange of the postings
    pruned = postings.join(F.broadcast(pterms), "term").repartition("id")
    perdoc = (
        pruned.groupBy("id", "term")
        .agg(F.sort_array(F.collect_list("pos")).alias("__ps"))
        .groupBy("id")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("term", "__ps"))).alias(
                "__pm"
            )
        )
    )

    cand = perdoc.crossJoin(F.broadcast(ph)).filter(
        F.forall(F.col("__pts"), lambda t: F.map_contains_key(F.col("__pm"), t))
    )
    first_ps = F.element_at(F.col("__pm"), F.element_at(F.col("__pts"), 1))
    # terms 2..k with their phrase offsets; empty for single-term phrases
    rest = F.slice(
        F.col("__pts"), 2, F.greatest(F.size("__pts") - 1, F.lit(0))
    )
    n_hits = F.size(
        F.filter(
            first_ps,
            lambda p: ~F.exists(
                F.transform(
                    rest,
                    lambda t, i: F.array_contains(
                        F.element_at(F.col("__pm"), t), p + i + F.lit(1)
                    ),
                ),
                lambda ok: ~ok,
            ),
        )
    )
    hits = cand.select("phrase_id", "id", n_hits.alias("n_hits")).filter(
        F.col("n_hits") >= 1
    )
    w = Window.partitionBy("phrase_id").orderBy(
        F.col("n_hits").desc(), F.col("id").asc()
    )
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(int(k)))  # literal -> WindowGroupLimit
        .select("phrase_id", "id", "n_hits", "rank")
    )

def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.9,
    out_col: str = "avg_logprob2",
) -> DataFrame:
    """Interpolated-bigram fluency score — one order closer to CCNet's
    5-gram KenLM than unigram_logprob: each document scores the mean
    over positions i >= 2 of

        ln( lam * c2(w[i-1] w[i]) / c1(w[i-1])  +  (1-lam) * c1(w[i]) / T )

    (Jelinek-Mercer interpolation with the corpus's own counts; T is the
    corpus token total). Word order now matters: shuffled prose scores
    below the same words in order, which the unigram score cannot see.

    Same shape as unigram_logprob, one order up: two hash-keyed count
    aggregates (unigrams, bigrams), three 8-byte-hash joins per position
    (bigram, previous word, current word — word text never shuffles),
    one per-doc mean. Docs with < 2 words have no bigram positions and
    score null.

    Output: every input row's id + n_bigrams + ``out_col`` (6 dp).
    """
    norm = norm_text_col(F.col(text_col))
    words = F.split(norm, " ")
    n = F.size(words)
    pairs = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            F.explode(adjacent_pairs_col(words, "p", "c")).alias("__pc"),
        )
        .select(
            F.col(id_col),
            F.xxhash64("__pc.p").alias("__ph"),
            F.xxhash64("__pc.c").alias("__ch"),
            F.xxhash64("__pc.p", "__pc.c").alias("__bh"),
        )
    )
    uni = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(F.split(norm_text_col(F.col(text_col)), " ")).alias("__w"))
        .select(F.xxhash64("__w").alias("__wh"))
        .groupBy("__wh")
        .agg(F.count(F.lit(1)).alias("__c1"))
    )
    big = pairs.groupBy("__bh").agg(F.count(F.lit(1)).alias("__c2"))
    total = uni.agg(F.sum("__c1")).first()[0] or 1
    scored = (
        pairs.join(big, "__bh")
        .join(uni.select(F.col("__wh").alias("__ph"), F.col("__c1").alias("__cp")), "__ph")
        .join(uni.select(F.col("__wh").alias("__ch"), F.col("__c1").alias("__cc")), "__ch")
        .withColumn(
            "__lp",
            F.log(
                F.lit(float(lam)) * F.col("__c2") / F.col("__cp")
                + F.lit(1.0 - float(lam)) * F.col("__cc") / F.lit(float(total))
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("__lp"), 6).alias(out_col),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .withColumn("n_bigrams", F.coalesce("n_bigrams", F.lit(0)))
    )

def term_dictionary(
    df: DataFrame,
    text_col: str = "text",
    prefix_len: int = 1,
) -> DataFrame:
    """Frequency-ranked term dictionary: every distinct token gets a
    DENSE 1-based id in (count desc, term asc) order — the dictionary
    pass tfidf_topk/bm25 name as the 100 TB prelude (hash-aggregate
    terms once, run every downstream plan on 8-byte ids, join strings
    back at the end) and the id layout tokenizer/embedding tables
    expect (id 1 = most frequent).

    A global dense rank normally means a GLOBAL SORT. This computes it
    with the q83 two-level cumulative trick instead: group terms by
    (term_count, order-preserving term prefix) — a prefix bucket's
    lexicographic order equals the full-term order, so ranking
    decomposes exactly — then (1) row_number WITHIN each small group,
    (2) an exclusive cumulative group-size offset over the O(distinct
    counts x 256^prefix_len) group table (a window over the tiny
    aggregate, never the vocabulary). id = offset + within-rank. No
    stage ever totally orders the vocabulary; the count aggregate is
    map-side combinable and the within-group windows partition on
    (count, prefix). Deepen ``prefix_len`` if the singleton-count class
    of a 10^9-term vocabulary still concentrates (each extra byte
    splits the hottest window partition ~64-256x).

    Output: (term, term_count, term_id), term_id dense 1..|vocab|.
    """
    terms = (
        df.filter(
            F.col(text_col).isNotNull()
            & (F.length(F.trim(F.col(text_col))) > 0)
        )
        .select(
            F.explode(
                F.split(norm_text_col(F.col(text_col)), " ")
            ).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("term_count"))
    )
    b = F.substring(F.col("term"), 1, int(prefix_len))
    grouped = terms.withColumn("__b", b)
    win_in = Window.partitionBy("term_count", "__b").orderBy(F.col("term").asc())
    ranked = grouped.withColumn("__rn", F.row_number().over(win_in))
    sizes = grouped.groupBy("term_count", "__b").agg(
        F.count(F.lit(1)).alias("__sz")
    )
    win_off = (
        Window.orderBy(F.col("term_count").desc(), F.col("__b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.select(
        "term_count",
        "__b",
        F.coalesce(F.sum("__sz").over(win_off), F.lit(0)).alias("__off"),
    )
    return (
        ranked.join(offsets, ["term_count", "__b"])
        .select(
            "term",
            "term_count",
            (F.col("__off") + F.col("__rn")).alias("term_id"),
        )
    )

def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information — the
    corpus-analysis pass behind phrase vocabularies and stop-phrase
    lists (Church & Hanks 1990): PMI(x,y) = log2(p(x,y) / (p(x)p(y)))
    with p from corpus bigram/unigram counts, floored at ``min_count``
    co-occurrences so rare-pair noise (PMI's known failure mode) never
    ranks.

    100 TB shape: two map-side-combinable hash aggregates over the
    token/bigram streams (terms are short strings — the shuffle carries
    (gram, partial count), never documents), two shuffle joins keyed on
    single tokens to attach unigram counts, and a
    TakeOrderedAndProject top-k — no global sort, no driver state. The
    scalar totals ride a 1-row cross join (literally free after AQE
    folds it to a broadcast).

    Output: (w1, w2, pair_count, pmi) — pmi rounded to 6dp, ordered by
    (pmi desc, w1, w2), exactly k rows (fewer if the floored pair table
    is smaller). The double arithmetic is a fixed expression tree
    ((cxy*W*W) / (cx*cy*P), one log2) so the DuckDB oracle replays it
    bit-for-bit up to libm's log2 ulp, absorbed by the rounding.
    """
    words = F.filter(
        F.split(norm_text_col(F.col(text_col)), " "), lambda w: w != ""
    )
    toks = (
        df.filter(F.col(text_col).isNotNull())
        .select(words.alias("ws"))
        .filter(F.size("ws") > 0)
    )
    uni = (
        toks.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("w_count"))
    )
    pairs = toks.select(
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.struct(
                        F.element_at("ws", i.cast("int")).alias("w1"),
                        F.element_at("ws", (i + 1).cast("int")).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("p")
    ).select("p.w1", "p.w2")
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    totals = uni.agg(F.sum("w_count").alias("W")).crossJoin(
        big.agg(F.sum("pair_count").alias("P"))
    )
    scored = (
        big.filter(F.col("pair_count") >= int(min_count))
        .join(
            uni.select(F.col("w").alias("w1"), F.col("w_count").alias("c1")),
            "w1",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("w_count").alias("c2")),
            "w2",
        )
        .crossJoin(totals)
        .select(
            "w1",
            "w2",
            "pair_count",
            F.round(
                F.log2(
                    (
                        F.col("pair_count").cast("double")
                        * F.col("W").cast("double")
                        * F.col("W").cast("double")
                    )
                    / (
                        F.col("c1").cast("double")
                        * F.col("c2").cast("double")
                        * F.col("P").cast("double")
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(int(k))

def term_drift(
    df: DataFrame,
    slice_col,
    text_col: str = "text",
    min_count: int = 20,
    k: int = 50,
) -> DataFrame:
    """Term-distribution drift between two corpus slices — the data-
    quality monitor a continuously-refreshed crawl corpus needs: when a
    new dump's vocabulary shifts against the previous one (a spam wave,
    a boilerplate change, a scraper regression), the drifted terms
    surface before training does. Per term, the 2x2 chi-square
    statistic of (term vs rest) x (slice A vs B):

        e_a  = (n_a + n_b) * N_a / (N_a + N_b)      (expected A count)
        chi2 = (n_a-e_a)^2/e_a + (n_b-e_b)^2/e_b    (e_b analogous)

    floored at ``min_count`` total occurrences (chi-square's small-
    expected-count failure mode), top-k by (chi2 desc, term asc).

    100 TB shape: ONE map-side-combinable aggregate over the token
    stream — the shuffle carries (term, partial n_a, partial n_b),
    conditional sums split the slices so the corpus scans once; slice
    totals fold to a broadcast 1-row frame; the global top-k is a
    TakeOrderedAndProject (per-partition heap), never a full sort. The
    double chi2 is one fixed expression tree, replayed by the DuckDB
    twin (q110).

    ``slice_col``: boolean Column — true = slice A, false = slice B.
    Output: (term, n_a, n_b, chi2 6dp) ordered (chi2 desc, term asc),
    exactly k rows (fewer if the floored term table is smaller).
    """
    words = F.filter(
        F.split(norm_text_col(F.col(text_col)), " "), lambda w: w != ""
    )
    toks = (
        df.filter(F.col(text_col).isNotNull())
        .select(slice_col.alias("__a"), F.explode(words).alias("term"))
    )
    counts = toks.groupBy("term").agg(
        F.sum(F.when(F.col("__a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("__a"), 0).otherwise(1)).alias("n_b"),
    )
    totals = counts.agg(
        F.sum("n_a").alias("__NA"), F.sum("n_b").alias("__NB")
    )
    c = counts.filter((F.col("n_a") + F.col("n_b")) >= int(min_count)).crossJoin(
        F.broadcast(totals)
    )
    tot = (F.col("n_a") + F.col("n_b")).cast("double")
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    NA = F.col("__NA").cast("double")
    NB = F.col("__NB").cast("double")
    # an entirely-empty slice (NA=0 or NB=0) makes every expected count
    # zero — chi-square is undefined and drift against nothing is
    # meaningless, so the result is EMPTY by contract (the filter below)
    # instead of an ANSI divide-by-zero killing the job
    e_a = tot * NA / (NA + NB)
    e_b = tot * NB / (NA + NB)
    chi2 = (na - e_a) * (na - e_a) / e_a + (nb - e_b) * (nb - e_b) / e_b
    scored = c.filter((NA > 0) & (NB > 0)).select(
        "term", "n_a", "n_b", F.round(chi2, 6).alias("chi2")
    )
    return scored.orderBy(F.col("chi2").desc(), F.col("term").asc()).limit(int(k))

def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    max_rank: int = 10_000,
    ngram_n: int = 1,
) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary — the one-line
    corpus health check (natural text follows log f ~= a - s*log r with
    s ~= 1; machine-generated spam, template floods and tokenizer
    regressions bend the curve): OLS of log(freq) on log(rank) over the
    top ``max_rank`` terms with count >= min_count, via the closed-form
    slope/intercept so the whole fit is two aggregates.

    100 TB shape: one map-side-combinable term-count aggregate (the
    q86/q89 tokenization), ranks from ONE window over the count-ordered
    term table bounded by a LITERAL max_rank (WindowGroupLimit prune;
    ties rank by term asc so the rank assignment is total and
    replayable), then a single 1-row OLS aggregate. Float sums meet the
    oracle (q113) at 6dp after the fixed expression tree.

    Output: one row (n_terms, slope, intercept, r2) — slope ~ -1 for
    healthy natural-language corpora. ``ngram_n`` fits the n-gram
    rank-frequency curve instead (bigrams/trigrams have the fatter
    low-count tail on small vocabularies).
    """
    counts = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(_token_ngrams_col(text_col, ngram_n)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= int(min_count))
    )
    w = Window.orderBy(F.col("c").desc(), F.col("term").asc())
    ranked = (
        counts.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= F.lit(int(max_rank)))
        .select(
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    # try_divide throughout: a degenerate fit (0 or 1 surviving terms ->
    # nd=0 or varx=0) yields NULL slope/intercept/r2 instead of an ANSI
    # divide-by-zero, matching DuckDB's NULL-on-zero-divisor semantics
    nd = F.col("n").cast("double")
    cov = F.col("sxy") - F.try_divide(F.col("sx") * F.col("sy"), nd)
    varx = F.col("sxx") - F.try_divide(F.col("sx") * F.col("sx"), nd)
    vary = F.col("syy") - F.try_divide(F.col("sy") * F.col("sy"), nd)
    slope = F.try_divide(cov, varx)
    return agg.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round(F.try_divide(F.col("sy") - slope * F.col("sx"), nd), 6).alias(
            "intercept"
        ),
        F.round(F.try_divide(cov * cov, varx * vary), 6).alias("r2"),
    )

def good_turing(
    df: DataFrame,
    text_col: str = "text",
    max_c: int = 10,
    ngram_n: int = 1,
) -> DataFrame:
    """Good-Turing frequency-of-frequencies table + discounted counts —
    the smoothing/coverage diagnostic under LM-based quality filters
    (q48/q68's unigram/bigram models assign zero mass to unseen words;
    GT says how much mass they SHOULD reserve: P0 = N1/N). For each
    count c <= max_c: n_c = |{terms seen exactly c times}| and the GT
    re-estimate c* = (c+1) * n_{c+1} / n_c.

    100 TB shape: the term-count aggregate (map-side combinable, the
    only pass over text) collapses to a counts-of-counts aggregate of
    at most max_c+1 rows — O(1) output; the c* join is a self-join on
    the tiny frame via a lead() window. Terms never leave the first
    aggregate; the second is 8-byte (c, n_c) pairs.

    Output: (c, n_c, gt_estimate 6dp nullable — null when n_{c+1}=0),
    c in [1, max_c], ordered by c. ``ngram_n`` counts n-gram types
    instead of unigrams (the GT table is only informative where the
    count spectrum has low-c mass).
    """
    counts = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(_token_ngrams_col(text_col, ngram_n)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cc = (
        counts.filter(F.col("c") <= int(max_c) + 1)
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("n_c"))
    )
    w = Window.orderBy(F.col("c").asc())
    # lead over the O(max_c) frame; rows with a gap (n_{c+1} absent)
    # yield NULL only when the next row is not literally c+1
    withnext = cc.withColumn("next_c", F.lead("c").over(w)).withColumn(
        "next_n", F.lead("n_c").over(w)
    )
    gt = F.when(
        F.col("next_c") == F.col("c") + 1,
        F.round(
            (F.col("c") + 1).cast("double")
            * F.col("next_n").cast("double")
            / F.col("n_c").cast("double"),
            6,
        ),
    )
    return (
        withnext.filter(F.col("c") <= int(max_c))
        .select("c", "n_c", gt.alias("gt_estimate"))
        .orderBy("c")
    )

def term_burstiness(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    k: int = 100,
) -> DataFrame:
    """Term burstiness (Church & Gale 1995; Katz 1996) — the
    within-document clumping signal a corpus-frequency count hides:
    content words "burst" (a document about a topic repeats its terms),
    function words and spam-injected tokens spread thin. Two exact
    per-term statistics:

    - burstiness  E[x | x > 0] = total_occurrences / doc_freq
      (Katz's mean occurrences per CONTAINING document)
    - adaptation  P(x >= 2 | x >= 1) = n_docs_multi / doc_freq
      (the repeat probability — Church's "adaptation")

    High burstiness + high adaptation = topical content vocabulary;
    high corpus frequency with burstiness ~1 = function words or
    templated boilerplate injected once per page (the keyword-stuffing
    complement to q92's per-doc entropy).

    100 TB shape: one (doc, term) hash aggregate over the token stream
    (map-side combinable — the only text pass), one per-term aggregate
    of the integer triple, TakeOrderedAndProject top-k on (burstiness
    desc, term asc). All ratios are exact integer divisions rounded at
    6dp — the DuckDB twin (q118) replays bit-for-bit.

    Output: (term, doc_freq, total_count, burstiness 6dp,
    adaptation 6dp), k rows.
    """
    words = F.filter(F.split(norm_text_col(F.col(text_col)), " "), lambda w: w != "")
    per_doc = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__doc"), F.explode(words).alias("term"))
        .groupBy("__doc", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_term = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("c").alias("total_count"),
        F.sum(F.when(F.col("c") >= 2, 1).otherwise(0)).alias("__multi"),
    )
    out = per_term.filter(F.col("doc_freq") >= int(min_df)).select(
        "term",
        "doc_freq",
        "total_count",
        F.round(
            F.col("total_count").cast("double") / F.col("doc_freq").cast("double"), 6
        ).alias("burstiness"),
        F.round(
            F.col("__multi").cast("double") / F.col("doc_freq").cast("double"), 6
        ).alias("adaptation"),
    )
    return out.orderBy(F.col("burstiness").desc(), F.col("term").asc()).limit(int(k))

def domain_diversity(
    df: DataFrame,
    domain_col,
    text_col: str = "text",
    ent_dp: int = 6,
) -> DataFrame:
    """Per-domain lexical-diversity rollup — the domain-level template/
    spam signal per-document quality scores miss: a template farm's
    MANY pages each look fine alone, but the domain's aggregate
    vocabulary is tiny and its token distribution near-degenerate.
    Three standard signals per domain:

    - type-token ratio  ttr = n_types / n_tokens
    - Shannon entropy over the domain's term distribution,
      H = -sum_t (c_t/N) log2(c_t/N)  (template floods -> low H)
    - normalized entropy  H / log2(n_types)  (size-comparable across
      domains; 1.0 = uniform vocabulary use, NULL when n_types == 1)

    100 TB shape: tokenization -> ONE map-side-combinable
    (domain, term) count aggregate (the only pass over text; terms ride
    the shuffle once, with partial counts); domain totals come from a
    domain-partitioned WINDOW over the counted table — NOT a self-join
    back to an aggregate of itself, which would scan and tokenize the
    corpus twice — and the final per-domain fold reuses the window's
    domain partitioning (zero extra exchanges). The rounded per-term
    plog terms keep the float sum order-independent (the pagerank
    discipline) so the DuckDB twin (q116) replays exactly.

    Output: (domain, n_tokens, n_types, ttr 6dp, entropy 6dp,
    norm_entropy 6dp nullable).
    """
    words = F.filter(F.split(norm_text_col(F.col(text_col)), " "), lambda w: w != "")
    toks = df.filter(F.col(text_col).isNotNull()).select(
        (domain_col if not isinstance(domain_col, str) else F.col(domain_col)).alias(
            "domain"
        ),
        F.explode(words).alias("term"),
    )
    tc = toks.groupBy("domain", "term").agg(F.count(F.lit(1)).alias("c"))
    wdom = Window.partitionBy("domain")
    with_tot = tc.select(
        "domain",
        "c",
        F.sum("c").over(wdom).alias("n_tokens"),
        F.count(F.lit(1)).over(wdom).alias("n_types"),
    )
    # p*log2(p) per (domain, term), rounded BEFORE the sum so partial-
    # aggregation order can never flip a bit vs the oracle
    p = F.col("c").cast("double") / F.col("n_tokens").cast("double")
    plog = F.round(-p * F.log2(p), ent_dp + 3)
    # + 0.0 normalizes the single-type domain's -0.0 sum to +0.0 (IEEE:
    # -0.0 + 0.0 = +0.0) so both engines print the same zero
    ent = (
        with_tot.groupBy("domain", "n_tokens", "n_types")
        .agg((F.round(F.sum(plog), ent_dp) + F.lit(0.0)).alias("entropy"))
    )
    return ent.select(
        "domain",
        "n_tokens",
        "n_types",
        F.round(
            F.col("n_types").cast("double") / F.col("n_tokens").cast("double"), 6
        ).alias("ttr"),
        F.col("entropy"),
        F.round(
            F.try_divide(F.col("entropy"), F.log2(F.col("n_types").cast("double"))), 6
        ).alias("norm_entropy"),
    )

def mixture_diversity(
    df: DataFrame,
    group_col: str = "source",
    size_col: str | None = None,
) -> DataFrame:
    """One-row diversity/concentration profile of a corpus mixture —
    the monitoring twin of the mixture SHAPERS (temperature_weights
    q121, doremi q109, token_budget q128): after any resampling step,
    report what the mix actually became.

    - effective_groups = exp(Shannon entropy of group shares): "this
      corpus behaves like N equally-sized sources" — the standard
      effective-number-of-species transform, directly comparable
      across corpora of different group counts.
    - hhi = sum p_g^2 (Herfindahl-Hirschman): concentration; 1/hhi is
      the Simpson effective number.
    - top1_share / top5_share: how much the head owns.

    Shares weight by document count, or by ``size_col`` mass (tokens,
    bytes) when given — token-denominated monitoring is the q128/q136
    convention. NULL groups are excluded; NULL/negative sizes count 0.

    Scale shape: ONE map-side-combinable aggregate to O(groups) rows,
    then an O(groups) single-partition window for the ranked shares
    (the temperature_weights shape — groups are sources/languages/
    dumps, never corpus rows) and a 1-row reduce. The ln/exp step is
    the one float op; at 6 dp output the cross-engine libm ulp is
    invisible.

    Output: (n_groups, total_mass, eff_groups 6dp, hhi 6dp,
    top1_share 6dp, top5_share 6dp).
    """
    m = (
        F.coalesce(F.col(size_col).cast("bigint"), F.lit(0))
        if size_col is not None
        else F.lit(1).cast("bigint")
    )
    per = (
        df.filter(F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("__g"), F.greatest(m, F.lit(0)).alias("__m"))
        .groupBy("__g")
        .agg(F.sum("__m").alias("__mg"))
        .filter(F.col("__mg") > 0)
    )
    wall = Window.orderBy(F.col("__mg").desc(), F.col("__g").asc())
    ranked = per.select(
        "__mg",
        F.row_number().over(wall).alias("__rk"),
        F.sum("__mg").over(
            wall.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__M"),
    )
    p = F.col("__mg").cast("double") / F.col("__M").cast("double")

    def fp12(c):
        # per-term 12-dp fixed point summed as decimal(38,0): the sum is
        # exact and partition-order-independent (the engine-wide
        # discipline — double addition is not associative)
        return F.round(c * F.lit(1e12), 0).cast("decimal(38,0)")

    ent = F.sum(fp12(p * F.log(p))).cast("double") / F.lit(1e12)
    return ranked.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.first("__M").alias("total_mass"),
        F.round(F.exp(-ent), 6).alias("eff_groups"),
        F.round(F.sum(fp12(p * p)).cast("double") / F.lit(1e12), 6).alias("hhi"),
        F.round(F.max(F.when(F.col("__rk") == 1, p)), 6).alias("top1_share"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("__rk") <= 5, fp12(p))), F.lit(0).cast("decimal(38,0)")
            ).cast("double")
            / F.lit(1e12),
            6,
        ).alias("top5_share"),
    )
