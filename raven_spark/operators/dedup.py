"""Deduplication family for web-text corpora — the training-data pipeline
ops a 100 TB crawl feeds (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine). Everything scale-relevant is pure DataFrame algebra:

- exact: normalize -> hash -> groupBy (map-side combinable; the shuffle
  carries 8-byte hashes, not documents)
- MinHash+LSH: shingle -> k xxhash64 minima (JVM built-ins, no Python) ->
  band keys -> self-join on band buckets -> candidate pairs -> optional
  exact-Jaccard verify. The self-join is banded so the shuffle is
  O(docs x bands), never O(docs^2).
- n-gram Jaccard: exact pairwise similarity *within blocking keys* —
  the oracle-able ground truth for the probabilistic families.
- SimHash: 64-bit signatures (pandas UDF) + Hamming-band buckets.
- embedding near-dup: cosine over float vectors, blocked by coarse key.

The reference has no dedup at all (its task list is finite by
construction); these operators are the BASELINE-mandated scale additions
(north_star: "xxhash64 dedup", task brief: dedup families as first-class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# --- text normalization (shared by exact + shingle dedup) --------------------


def norm_text_col(text):
    """lower + trim + collapse whitespace — the dedup identity transform."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


# --- exact dedup ---------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per normalized-text group; report group sizes.

    Returns (keep_id, dup_count) per distinct normalized text. At scale
    group on xxhash64(norm) (8-byte shuffle keys): collision probability
    at 10^10 docs ~ 10^-9 per pair class — acceptable for corpus dedup;
    use exact_dedup_strict for the string-keyed variant (what the SQL
    oracle replays).
    """
    norm = norm_text_col(F.col(text_col))
    return (
        df.select(F.col(id_col), F.xxhash64(norm).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def exact_dedup_strict(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """String-keyed exact dedup (oracle twin; shuffles full strings)."""
    return (
        df.select(F.col(id_col), norm_text_col(F.col(text_col)).alias("norm"))
        .groupBy("norm")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
        .select("keep_id", "dup_count")
    )


# --- shingles -------------------------------------------------------------------


def ngrams_zip_col(words, n: int):
    """Adjacent word n-grams WITH multiplicity from an array column /
    expression, via n-1 zips of the array against its own shifted tail.

    NOT transform(sequence, element_at x n): a lambda that references
    the array EXPRESSION re-evaluates it per element, making that form
    quadratic per document — measured 9.4s vs 0.67s (14x) for the
    bigram count over the sf0.1 corpus, warm; the q80 containment
    suite entry dropped 44.7s -> 18.2s cold / 7.5s warm after this
    rewrite. zip_with pads the shorter side with NULL and concat
    propagates it, so the trailing partial grams drop in the final
    not-null filter. Output order and values are identical to the
    transform form, including its empty-array-on-NULL guarantee: the
    transform/element_at form yielded [] for NULL input arrays (NULL
    text), while slice/zip_with/filter all propagate NULL — coalesce
    at entry keeps downstream counts 0 instead of NULL (q31 contract).
    """
    words = F.coalesce(words, F.array().cast("array<string>"))
    if n <= 1:
        return words
    acc = words
    for j in range(1, n):
        tail = F.slice(words, j + 1, F.greatest(F.size(words) - j, F.lit(0)))
        acc = F.zip_with(acc, tail, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(acc, lambda g: g.isNotNull())


def adjacent_pairs_col(arr, left: str = "l", right: str = "r"):
    """Adjacent (element, next-element) struct pairs from an array column
    via one zip of the array against its shifted tail — the bigram case
    of :func:`ngrams_zip_col`, shared by bigram_logprob / bpe_merges so
    the zip-shift kernel (and its NULL/pad edge handling) lives in one
    place. NULL input arrays yield [], and the NULL-padded tail entry
    drops in the right-not-null filter.
    """
    arr = F.coalesce(arr, F.array().cast("array<string>"))
    return F.filter(
        F.zip_with(
            arr,
            F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias(left), b.alias(right)),
        ),
        lambda s: s[right].isNotNull(),
    )


def word_shingles_col(text, n: int = 3):
    """Distinct word n-grams as an array column (pure built-ins)."""
    words = F.split(norm_text_col(text), " ")
    grams = ngrams_zip_col(words, n)
    return F.array_distinct(
        F.when(F.size(words) >= n, grams).otherwise(F.array(norm_text_col(text)))
    )


# --- n-gram Jaccard (exact, blocked) ----------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over word n-gram sets for all pairs sharing a blocking
    key. Blocking bounds the join fan-out (per-block cross join instead of
    a global O(N^2)); at corpus scale block on (lang, length-bucket) or
    feed LSH candidates instead."""
    base = df.select(
        F.col(id_col).alias("id"), *block_cols, word_shingles_col(F.col(text_col), n).alias("grams")
    )
    a = base.alias("a")
    b = base.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    cond.append(F.col("a.id") < F.col("b.id"))
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    jac = inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int = 20,
) -> DataFrame:
    """ASYMMETRIC near-dup detection: n-gram set containment
    |A ∩ B| / |A| — the metric that catches a document mostly CONTAINED
    in another (truncated mirrors, quote-wrapped copies, boilerplate-
    padded rehosts), which Jaccard dilutes toward 0 as the containing
    side grows (a 100-word doc inside a 10k-word page has Jaccard
    ~0.01 but containment 1.0).

    Candidate generation is an inverted-index self-join bounded by
    DISCRIMINATIVE shingles: only grams with corpus document frequency
    in [2, max_df] key the pair join. A gram shared by 10^6 docs would
    alone generate 10^12 candidate pairs and discriminates nothing
    (it IS boilerplate); dropping hot grams bounds per-gram fan-out at
    max_df^2 while keeping every pair that shares at least one
    non-boilerplate gram. Contract: a pair whose ONLY shared grams are
    hotter than max_df is not reported — by construction such a pair's
    overlap is pure boilerplate.

    Containment/Jaccard are then EXACT on candidates, computed over
    8-byte xxhash64 gram arrays (collision class as ``exact_dedup``) —
    gram text never shuffles; only hashed arrays move, and only for
    candidate docs.

    Output: (id_a, id_b, containment_a, containment_b, jaccard) with
    id_a < id_b, containment_a = |A∩B|/|A|, kept when
    max(containment_a, containment_b) >= threshold.
    """
    # NULL coalesces to "" (the engine-wide dedup identity, like
    # soft_dedup_weights): empty docs cluster together in BOTH engines
    # instead of Spark hashing the NULL gram to a constant while the
    # SQL oracle's NULL never equi-joins
    text = F.coalesce(F.col(text_col), F.lit(""))
    gsets = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            word_shingles_col(text, n), lambda g: F.xxhash64(g)
        ).alias("gh"),
    )
    postings = gsets.select("id", F.explode("gh").alias("g"))
    rare = (
        postings.groupBy("g")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter((F.col("__df") >= 2) & (F.col("__df") <= F.lit(int(max_df))))
        .select("g")
    )
    keyed = postings.join(rare, "g")
    cand = (
        keyed.alias("x")
        .join(keyed.alias("y"), "g")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    # semi-prune the gram-array sides to candidate docs BEFORE the array
    # join — otherwise every doc's full hashed gram array crosses the
    # exchange even when candidates are a tiny fraction of the corpus
    cand_ids = cand.select(F.col("id_a").alias("id")).union(
        cand.select(F.col("id_b").alias("id"))
    ).distinct()
    gcand = gsets.join(cand_ids, "id", "left_semi")
    a = gcand.select(F.col("id").alias("id_a"), F.col("gh").alias("__ga"))
    b = gcand.select(F.col("id").alias("id_b"), F.col("gh").alias("__gb"))
    inter = F.size(F.array_intersect("__ga", "__gb")).cast("double")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter / F.greatest(F.size("__ga"), F.lit(1)), 6).alias(
                "containment_a"
            ),
            F.round(inter / F.greatest(F.size("__gb"), F.lit(1)), 6).alias(
                "containment_b"
            ),
            F.round(
                inter
                / F.greatest(
                    F.size(F.array_union("__ga", "__gb")), F.lit(1)
                ),
                6,
            ).alias("jaccard"),
        )
        .filter(
            F.greatest("containment_a", "containment_b")
            >= F.lit(float(threshold))
        )
    )


# --- MinHash + LSH -------------------------------------------------------------------


def minhash_signature_col(grams, k: int = 16):
    """k-permutation MinHash via xxhash64(gram, seed_i) minima — all
    JVM-side, one pass over the gram array per permutation."""
    return F.array(
        *[F.array_min(F.transform(grams, lambda g: F.xxhash64(g, F.lit(i)))) for i in range(k)]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    band_entries: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: equal band slice of the MinHash signature.

    bands=4, rows=k/bands=4 -> P(candidate) = 1-(1-j^4)^4: ~0.97 at j=0.8,
    ~0.04 at j=0.3 — the classic S-curve. Pair generation is a self-join
    on (band_id, band_key); band_key is an 8-byte hash so the shuffle is
    narrow. Pass ``band_entries`` (an (id, band_id, band_key) frame for
    exactly ``df``'s docs, e.g. one already materialized for an index
    probe) to skip recomputing signatures."""
    if band_entries is None:
        band_entries = _band_entry_rows(df, text_col, id_col, k, bands, n)
    a = band_entries.alias("a")
    b = band_entries.alias("b")
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    verify_threshold: float | None = 0.7,
    max_iters: int = 20,
    band_entries: DataFrame | None = None,
) -> DataFrame:
    """Full pipeline: LSH candidates [-> exact Jaccard verify] -> connected
    docs collapse to min-id representative (single-link connected
    components, iterated to FIXPOINT: each round takes the min over
    neighbors' reps then pointer-jumps rep -> rep(rep), so convergence is
    O(log chain-length); the loop exits when no rep changed, with
    ``max_iters`` as a runaway valve, not a correctness bound).
    ``band_entries`` forwards to minhash_lsh_candidates (reuse a
    materialized band index instead of re-hashing)."""
    pairs = minhash_lsh_candidates(
        df, text_col, id_col, k, bands, n, band_entries=band_entries
    )
    if verify_threshold is not None:
        grams = df.select(
            F.col(id_col).alias("id"), word_shingles_col(F.col(text_col), n).alias("grams")
        )
        pairs = (
            pairs.join(grams.withColumnRenamed("id", "id_a").withColumnRenamed("grams", "ga"), "id_a")
            .join(grams.withColumnRenamed("id", "id_b").withColumnRenamed("grams", "gb"), "id_b")
            .withColumn(
                "jaccard",
                F.size(F.array_intersect("ga", "gb")).cast("double")
                / F.greatest(F.size(F.array_union("ga", "gb")), F.lit(1)).cast("double"),
            )
            .filter(F.col("jaccard") >= verify_threshold)
            .select("id_a", "id_b")
        )
    # min-representative propagation to fixpoint. Edges are materialized
    # ONCE (persist) and each iteration's rep is localCheckpoint'ed —
    # otherwise the plan re-evaluates the whole LSH + verify pipeline
    # 2^iters times (iterative algorithms must cut lineage). Each
    # iteration is (a) neighbor-min: rep <- min(rep, min of neighbors'
    # reps), then (b) pointer-jump: rep <- rep(rep) — (b) halves the
    # remaining chain depth each round, so long near-dup chains converge
    # in O(log n) rounds instead of O(n) hops. The convergence test is a
    # count over the just-checkpointed step (no recompute).
    rep = df.select(F.col(id_col).alias("id")).withColumn("rep", F.col("id"))
    edges = pairs.unionByName(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).persist()
    for _ in range(max_iters):
        better = (
            edges.join(rep.withColumnRenamed("id", "id_b").withColumnRenamed("rep", "rep_b"), "id_b")
            .groupBy("id_a")
            .agg(F.min("rep_b").alias("cand"))
        )
        stepped = (
            rep.join(better.withColumnRenamed("id_a", "id"), "id", "left")
            .select("id", F.col("rep").alias("__old"),
                    F.least(F.col("rep"), F.coalesce(F.col("cand"), F.col("rep"))).alias("rep"))
            # the pointer-jump self-join below reads this frame on BOTH
            # sides; checkpoint so the edges-join + neighbor-min aggregate
            # runs once per iteration, not twice
            .localCheckpoint(eager=False)
        )
        jumped = (
            stepped.alias("s")
            .join(
                stepped.select(F.col("id").alias("rep"), F.col("rep").alias("__rep2")).alias("j"),
                "rep", "left",
            )
            .select(
                "id",
                F.least(F.col("rep"), F.coalesce(F.col("__rep2"), F.col("rep"))).alias("rep"),
                (F.least(F.col("rep"), F.coalesce(F.col("__rep2"), F.col("rep")))
                 < F.col("__old")).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        rep = jumped.drop("__changed")
        if jumped.filter(F.col("__changed")).limit(1).count() == 0:
            break
    edges.unpersist()
    return rep.select(F.col("id").alias(id_col), F.col("rep").alias("cluster_id"))


# --- SimHash ---------------------------------------------------------------------------


def simhash_buckets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", band_bits: int = 8
) -> DataFrame:
    """64-bit SimHash (pandas UDF, Arrow-batched) + 64/band_bits band keys.
    Pigeonhole: two signatures within Hamming distance < n_bands ALWAYS
    share a band — the default 8 bands of 8 bits guarantees detection of
    hamming<=7 near-dups. Returns (id, simhash, band_id, band_key)."""
    from raven_spark.functions.text import simhash_udf

    sigs = df.select(
        F.col(id_col).alias("id"), simhash_udf(norm_text_col(F.col(text_col))).alias("simhash")
    )
    bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    return sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright("simhash", b * band_bits).bitwiseAND(F.lit(mask)).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "simhash", "band.band_id", "band.band_key")


# --- embedding cosine near-dup -----------------------------------------------------------


def cosine_col(a, b, dim: int):
    """Explicit index-based double-precision cosine — written so the SQL
    oracle (DuckDB list_transform over generate_series) folds in the same
    element order and precision."""
    idx = F.sequence(F.lit(1), F.lit(dim))
    dot = F.aggregate(
        idx, F.lit(0.0),
        lambda acc, i: acc + F.element_at(a, i.cast("int")).cast("double") * F.element_at(b, i.cast("int")).cast("double"),
    )
    na = F.sqrt(F.aggregate(idx, F.lit(0.0), lambda acc, i: acc + F.pow(F.element_at(a, i.cast("int")).cast("double"), 2)))
    nb = F.sqrt(F.aggregate(idx, F.lit(0.0), lambda acc, i: acc + F.pow(F.element_at(b, i.cast("int")).cast("double"), 2)))
    return dot / (na * nb)


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
    dim: int = 64,
    threshold: float = 0.9,
) -> DataFrame:
    """Cosine >= threshold pairs within a blocking key (exact within
    block). The scale path replaces the block key with LSH sign-buckets
    (similarity.lsh_buckets); block=None means all-pairs (test scale only).
    """
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    base = df.select(*cols)
    a, b = base.alias("a"), base.alias("b")
    cond = [F.col("a.id") < F.col("b.id")]
    if block_col:
        cond.append(F.col("a.blk") == F.col("b.blk"))
    sim = cosine_col(F.col("a.v"), F.col("b.v"), dim)
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(sim, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semdedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_clusters: int = 8,
    threshold: float = 0.95,
    anchors: DataFrame | None = None,
) -> DataFrame:
    """SemDedup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    clustering embeddings and pruning near-duplicates WITHIN clusters —
    the clusters bound the pair computation, so the corpus never goes
    all-pairs (the paper's point, and the scale contract here).

    Stages:
      1. anchors — default: the ``n_clusters`` lowest-id vectors
         (deterministic, so the SQL oracle replays assignment exactly).
         Pass ``anchors`` = (aid bigint, avec array<float>) to use real
         centroids (e.g. a k-means/IVF pass — similarity.ivf_assign_udf
         is the production assignment at 10^9 vectors: broadcast numpy
         anchors inside an Arrow batch matmul, zero shuffle).
      2. assignment — crossJoin(broadcast(anchors)) + max_by: cosine to
         each anchor (cosine_col's index-ordered double fold, rounded to
         6 dp; ties -> lowest anchor id). Partial aggregation collapses
         to one row per vector before the exchange, so the only
         assignment shuffle carries O(n) rows.
      3. prune — self-join on the cluster key (8-byte shuffle key),
         ``a.id < b.id``, cosine >= threshold marks the LATER id as a
         duplicate ("all-but-first", the span-dedup convention). Pair
         cost is sum of squared cluster sizes — pick n_clusters ~ sqrt(n)
         upward, or feed real centroids, to keep clusters bounded.

    Output: (``id_col``, cluster bigint, keep boolean) for every input
    row — keep=false iff an earlier same-cluster vector is within
    ``threshold`` cosine.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if anchors is None:
        anchors = base.orderBy("id").limit(int(n_clusters)).select(
            F.col("id").alias("aid"), F.col("v").alias("avec")
        )
    cs = F.round(cosine_col(F.col("v"), F.col("avec"), dim), 6)
    assign = (
        base.crossJoin(F.broadcast(anchors))
        .withColumn("__cs", cs)
        .groupBy("id")
        .agg(
            F.max_by(
                F.col("aid"), F.struct(F.col("__cs"), (-F.col("aid")).alias("na"))
            ).alias("cluster"),
            F.first("v").alias("v"),
        )
    )
    a, b = assign.alias("a"), assign.alias("b")
    pair_cs = F.round(cosine_col(F.col("a.v"), F.col("b.v"), dim), 6)
    dup_ids = (
        a.join(
            b,
            [F.col("a.cluster") == F.col("b.cluster"), F.col("a.id") < F.col("b.id")],
        )
        .filter(pair_cs >= F.lit(float(threshold)))
        .select(F.col("b.id").alias("id"))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return (
        assign.join(dup_ids, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("cluster").cast("bigint").alias("cluster"),
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("keep"),
        )
    )


# --- exact-substring span dedup (Lee et al. 2022) ----------------------------


def dup_span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 50,
    min_count: int = 2,
    keep_first: bool = True,
    out_col: str = "clean_text",
) -> DataFrame:
    """Exact-substring deduplication (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — ExactSubstr): any
    ``span_words``-token span occurring >= ``min_count`` times ANYWHERE in
    the corpus (across documents or within one) is removed from every
    occurrence except — with ``keep_first`` (the paper's "all but one") —
    the lexicographically-first one by (doc id, start). A token is removed
    iff a removable duplicated span covers it; the doc is reassembled from
    surviving tokens in order.

    The paper builds a corpus-wide suffix array on one large machine;
    that is the one structure that cannot shard cheaply. The distributed
    equivalent uses the standard fixed-length-window reduction: a
    duplicated substring of length >= L contains a duplicated L-token
    window at its start, and the union of duplicated L-windows covers the
    same tokens up to L-1 boundary tokens — so flag L-windows by corpus-
    global count and remove their cover. Same guarantee class, shuffle-
    friendly shape.

    Scale shape: per-position span hashes leave the map stage as 8-byte
    xxhash64 values ((id, pos, hash) triples; token text never shuffles);
    the occurrence count is a map-side-combinable groupBy on the hash;
    duplicate START positions come back per doc as one collect_set row
    joined on the 8-byte id, and the cover test filters the doc's own
    token array in place. Hashing a span by concat is O(L) per position —
    at L=50 that is the dominant map cost; a Rabin-Karp rolling hash over
    per-word hashes would make it O(1) amortized and slots in here
    without changing any downstream shape.

    Output: input row + (out_col, n_tokens, n_dup_starts, n_covered,
    dup_token_frac). ``n_covered``/``dup_token_frac`` measure removed
    tokens; Lee et al. report ~3% of C4 removed at L=50.
    """
    words = F.split(norm_text_col(F.coalesce(F.col(text_col), F.lit(""))), " ")
    n = F.size(words)
    k = F.greatest(n - F.lit(span_words - 1), F.lit(0))
    gram_hashes = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, span_words))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    base = df.withColumn("__words", words).withColumn("__gh", gram_hashes)
    occ = base.select(
        F.col(id_col).alias("__id"), F.posexplode("__gh").alias("__s", "__h")
    )
    dup = (
        occ.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= F.lit(min_count))
        .select("__h")
    )
    flagged = occ.join(dup, "__h")
    if keep_first:
        # the one kept occurrence per span = min (id, start) — an AGGREGATE,
        # not a row_number window: a pathological span duplicated 10^6 times
        # (empty boilerplate) partial-aggregates map-side instead of full-
        # ranking one hash partition; the join back reuses the __h keys
        first = flagged.groupBy("__h").agg(
            F.min(F.struct(F.col("__id"), F.col("__s"))).alias("__f")
        )
        flagged = (
            flagged.join(first, "__h")
            .filter(
                ~(
                    (F.col("__id") == F.col("__f.__id"))
                    & (F.col("__s") == F.col("__f.__s"))
                )
            )
            .drop("__f")
        )
    starts = flagged.groupBy("__id").agg(F.collect_set("__s").alias("__starts"))
    joined = base.join(starts, base[id_col] == starts["__id"], "left").drop("__id")
    st = F.coalesce(F.col("__starts"), F.array().cast("array<int>"))
    kept = F.filter(
        F.col("__words"),
        lambda w, i: ~F.exists(st, lambda s: (i >= s) & (i < s + F.lit(span_words))),
    )
    return (
        joined.withColumn(out_col, F.array_join(kept, " "))
        .withColumn("n_tokens", F.size("__words"))
        .withColumn("n_dup_starts", F.size(st))
        .withColumn("n_covered", F.size("__words") - F.size(kept))
        .withColumn(
            "dup_token_frac",
            F.round(
                F.col("n_covered").cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
                6,
            ),
        )
        .drop("__words", "__gh", "__starts")
    )


# --- soft dedup (down-weighting) -------------------------------------------------


def soft_dedup_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Duplicate DOWN-WEIGHTING instead of removal (the SoftDeDup idea:
    keep every copy but scale its training weight by 1/n for an n-way
    exact-duplicate cluster, so the corpus distribution is preserved
    while duplicated content stops dominating the gradient).

    Identity is the engine-wide dedup transform (``norm_text_col``);
    NULL and empty texts coalesce to "" and cluster together (matching
    SQL's COUNT(*) OVER (PARTITION BY norm), which groups NULLs).

    Output: (id_col, dup_count, weight) — weight = round(1/n, 9), one
    row per input document.

    Scale shape: one map-side-combinable count aggregate keyed on the
    8-byte xxhash64 of the identity text plus one hash join back; text
    never shuffles (collision class as ``exact_dedup``). A window over
    the hash would be one exchange instead of two but gives up the
    partial aggregate — at web scale a boilerplate cluster duplicated
    10^6 times must combine map-side, not land on one reducer rank.
    """
    key = F.xxhash64(F.coalesce(norm_text_col(F.col(text_col)), F.lit("")))
    base = df.select(F.col(id_col), key.alias("__k"))
    counts = base.groupBy("__k").agg(F.count(F.lit(1)).alias("dup_count"))
    return (
        base.join(counts, "__k")
        .select(
            id_col,
            "dup_count",
            F.round(F.lit(1.0) / F.col("dup_count"), 9).alias("weight"),
        )
    )


# --- content-defined chunk dedup -------------------------------------------------


def cdc_chunk_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    avg_chunk_words: int = 8,
) -> DataFrame:
    """Content-defined chunking dedup at the WORD level: cut each
    document at content-determined boundaries (a word ends a chunk when
    its SQL-replayable hash coin lands on 0, expected chunk length
    ``avg_chunk_words``), then count every chunk corpus-wide and report
    each document's duplicated-chunk fraction. The storage-dedup CDC
    idea applied to corpus text: because boundaries depend only on
    CONTENT, an insertion or deletion re-aligns within one chunk instead
    of shifting every downstream window — the property fixed-stride
    shingles (``dup_ngram_frac``) lack.

    A chunk is "duplicated" when its normalized string occurs >= 2 times
    corpus-wide, multiplicity included (a chunk repeated twice inside one
    document counts, matching the storage-dedup notion of a shared
    block).

    Output: (id_col, n_chunks, n_dup_chunks, dup_chunk_frac) — every
    input document appears (empty text -> 0 chunks, frac 0.0).

    Scale shape: chunking is pure column algebra fused into the scan
    (boundary positions via filter over a word-index sequence, chunks
    via dynamic-slice transform — no explode until chunks exist); the
    corpus count shuffles only the 8-byte xxhash64 of each chunk
    (collision class as ``exact_dedup``), map-side combinable; the
    count join reuses the hash partitioning; the per-doc rollup keys on
    the id. Chunk text never shuffles.
    """
    from raven_spark.operators.quality_model import feature_bucket_col

    norm = norm_text_col(F.col(text_col))
    words = F.split(norm, " ")
    n = F.size(words)
    # 1-based word positions that END a chunk (coin hit), plus the final
    # word if it didn't land on a boundary. transform-with-index over
    # the words array itself (NOT element_at over a sequence — that
    # re-evaluates the words expression per element, quadratic)
    bpos = F.filter(
        F.transform(
            words,
            lambda w, i: F.when(
                feature_bucket_col(w, avg_chunk_words) == F.lit(0), i + F.lit(1)
            ),
        ),
        lambda p: p.isNotNull(),
    )
    ends = F.when(
        F.coalesce(F.try_element_at(bpos, F.lit(-1)), F.lit(0)) < n,
        F.concat(bpos, F.array(n)),
    ).otherwise(bpos)
    # starts = previous end + 1 (first chunk starts at 1): shift ends
    # right by one instead of element_at(ends, j) per element (ends is
    # an expression — per-element references re-evaluate it)
    starts = F.transform(
        F.slice(F.concat(F.array(F.lit(0)), ends), 1, F.size(ends)),
        lambda e: e + F.lit(1),
    )
    chunks = F.zip_with(
        starts, ends, lambda s, e: F.array_join(F.slice(words, s, e - s + 1), " ")
    )
    chunks = F.when(
        F.coalesce(F.length(norm), F.lit(0)) == 0,
        F.array().cast("array<string>"),
    ).otherwise(chunks)

    docs = df.select(F.col(id_col), chunks.alias("__chunks"))
    ch = docs.select(id_col, F.explode("__chunks").alias("__c")).select(
        id_col, F.xxhash64("__c").alias("__h")
    )
    counts = ch.groupBy("__h").agg(F.count(F.lit(1)).alias("__n"))
    per_doc = (
        ch.join(counts, "__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("__n") >= 2).cast("bigint")).alias("n_dup_chunks"),
        )
    )
    return (
        docs.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("n_dup_chunks", F.lit(0)).alias("n_dup_chunks"),
            F.round(
                F.coalesce("n_dup_chunks", F.lit(0)).cast("double")
                / F.greatest(F.coalesce("n_chunks", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_chunk_frac"),
        )
    )


# Horner-fold polynomial hash constants (replayable in plain SQL — the
# q14 fingerprint convention, upgraded with a Knuth multiplicative mix):
# p Mersenne 2^31-1 keeps every intermediate < 2^38 in int64.
_KMV_P = 2147483647
_KMV_B = 131
_KMV_MIX = 2654435761


def _shingle_key_col(shingle):
    """Deterministic per-shingle key: Horner fold of char codes mod p,
    then a Knuth multiplicative mix. ASCII-domain (F.ascii / DuckDB
    unicode agree on ASCII; byte-fold over encode() is the full-Unicode
    variant). Pure column algebra, zero Python."""
    codes = F.transform(F.split(shingle, ""), lambda c: F.ascii(c).cast("long"))
    h = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda a, x: (a * F.lit(_KMV_B) + x) % F.lit(_KMV_P),
    )
    return (h * F.lit(_KMV_MIX)) % F.lit(_KMV_P)


def kmv_mirror_pairs(
    df: DataFrame,
    group_col,
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 64,
    audit: bool = True,
) -> DataFrame:
    """Host-mirror detection via KMV (k-minimum-values) bottom-k shingle
    sketches (Beyer et al., SIGMOD 2007) — the sketch family the engine
    still lacked next to HLL (q103), Count-Min (q107) and Misra-Gries
    (q86). A mirror/scraper host serves near-identical CONTENT under
    different URLs; URL-level dedup never sees it. The host-level
    verdict is shingle-set resemblance, and at 10^8 hosts the per-host
    shingle set must be a fixed-size sketch, not the set itself:

    - per host: distinct word-``shingle_n``-gram keys (Horner char fold,
      replayable — see _shingle_key_col), keep the k SMALLEST (one
      window with a LITERAL rank bound -> WindowGroupLimit pushdown,
      per-partition heaps; sketch = k x 8 bytes per host).
    - candidate pairs: sketch self-join on key (blocked — only hosts
      sharing a sketch member ever pair, never the H^2 cross join).
    - estimate: merge each candidate pair's sketches, keep the k
      smallest of the union (the KMV merge closure), resemblance est =
      |in both| / |merged sketch| (exact when the union fits in k).
    - audit (oracle duty, q111): with ``audit=True`` exact Jaccard over
      the full distinct key sets rides along. ``audit=False`` is the
      PRODUCTION mode: the full per-host key sets are never joined —
      the only self-join is over the k-row sketches — and the output
      drops the exact_jaccard column entirely (plan-asserted in
      tests/test_dedup.py).

    Output: (group_a, group_b, n_shared, est_jaccard 6dp[,
    exact_jaccard 6dp when audit]) per candidate pair, group_a < group_b.
    """
    words = F.filter(F.split(norm_text_col(F.col(text_col)), " "), lambda w: w != "")
    docs = df.filter(F.col(text_col).isNotNull()).select(
        group_col.alias("g"), words.alias("ws")
    )
    shingles = docs.select(
        "g",
        F.explode(
            F.when(
                F.size("ws") >= int(shingle_n),
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - int(shingle_n) + 1),
                    lambda i: F.array_join(
                        F.slice("ws", i.cast("int"), int(shingle_n)), " "
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("sh"),
    )
    keys = shingles.select("g", _shingle_key_col(F.col("sh")).alias("key")).distinct()
    w = Window.partitionBy("g").orderBy(F.col("key").asc())
    sketch = (
        keys.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(int(k)))  # literal -> WindowGroupLimit
        .select("g", "key")
    )
    a = sketch.select(F.col("g").alias("ga"), "key")
    b = sketch.select(F.col("g").alias("gb"), "key")
    cand = (
        a.join(b, "key")
        .filter(F.col("ga") < F.col("gb"))
        .select("ga", "gb")
        .distinct()
    )
    # merged bottom-k of each candidate pair's sketch union
    side_a = cand.join(sketch, cand["ga"] == sketch["g"]).select(
        "ga", "gb", "key", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    side_b = cand.join(sketch, cand["gb"] == sketch["g"]).select(
        "ga", "gb", "key", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    merged = (
        side_a.unionByName(side_b)
        .groupBy("ga", "gb", "key")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("ga", "gb").orderBy(F.col("key").asc())
    est = (
        merged.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= F.lit(int(k)))
        .groupBy("ga", "gb")
        .agg(
            F.sum(F.col("in_a") * F.col("in_b")).alias("n_shared"),
            F.round(
                F.sum((F.col("in_a") * F.col("in_b")).cast("double"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("est_jaccard"),
        )
    )
    if not audit:
        # sketch-only production mode: the full `keys` relation ends at
        # the bottom-k window above; no full-key-set join exists
        return est.select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            "n_shared",
            "est_jaccard",
        )
    # exact audit over the full key sets (test-scale duty)
    ka = keys.select(F.col("g").alias("ga"), "key")
    kb = keys.select(F.col("g").alias("gb"), "key")
    inter = (
        ka.join(kb, "key")
        .filter(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    sizes = keys.groupBy("g").agg(F.count(F.lit(1)).alias("__n"))
    exact = (
        inter.join(sizes.select(F.col("g").alias("ga"), F.col("__n").alias("__na")), "ga")
        .join(sizes.select(F.col("g").alias("gb"), F.col("__n").alias("__nb")), "gb")
        .select(
            "ga",
            "gb",
            F.round(
                F.col("__inter").cast("double")
                / (F.col("__na") + F.col("__nb") - F.col("__inter")).cast("double"),
                6,
            ).alias("exact_jaccard"),
        )
    )
    return (
        est.join(exact, ["ga", "gb"], "left")
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            "n_shared",
            "est_jaccard",
            F.coalesce("exact_jaccard", F.lit(0.0)).alias("exact_jaccard"),
        )
    )


# MinHash-contract permutation family: affine maps over the same Mersenne
# prime as the Horner shingle keys — replayable in plain SQL (q130), the
# Bloom-contract (pipeline_sketches.bloom_contract) convention applied to MinHash.
_MHC_A0, _MHC_DA = 2654435761, 40503
_MHC_B0, _MHC_DB = 998244353, 69069


def minhash_contract(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    shingle_n: int = 3,
    slack: float = 0.05,
) -> DataFrame:
    """MinHash estimation-accuracy contract (Broder 1997) — the
    oracle-checkable audit of the engine's near-dup workhorse, closing
    the probabilistic-contract family next to Bloom (q123), HLL (q103),
    GK (q106), CMS (q107) and KMV (q111): for given candidate pairs,
    compare the k-permutation signature agreement rate (the production
    estimator behind minhash_dedup/minhash_lsh_candidates) against the
    EXACT shingle-set Jaccard, and audit the absolute error against the
    Hoeffding deviation bound for k independent permutation-agreement
    indicators:

        |est - J| <= sqrt(ln(40) / (2k)) + slack     (95% two-sided
        at slack=0; the additive slack absorbs the family's residual
        min-collision bias so the verdict is a hard contract, not a
        statistical one)

    Both sides are deterministic functions of the data: shingle keys
    are the Horner char fold (_shingle_key_col), the permutations are
    the affine family (A0 + j*dA, B0 + j*dB) mod p, so the whole row —
    estimate, exact, verdict — replays bit-for-bit in the DuckDB twin.
    A broken signature kernel (biased permutation, lost minima, wrong
    band math upstream) blows abs_err past the bound and the driver
    hash goes red.

    Scale shape: signatures are pure array algebra per doc (nested
    transform/array_min — O(|shingles| * k) JVM work, no explosion, no
    shuffle of shingle text); the pairs join ships only (id, k x 8B
    signature, distinct-key array). The EXACT Jaccard rides along for
    contract/oracle duty — at production scale keep signatures only
    (the q111 KMV positioning).

    Output per pair: (id_a, id_b, n_sig_match, est_jaccard 6dp,
    exact_jaccard 6dp, abs_err 6dp, within_bound).
    """
    if k < 1:
        raise ValueError("minhash_contract: k must be >= 1")
    p = F.lit(_KMV_P)
    ws = F.filter(
        F.split(norm_text_col(F.col(text_col)), " "), lambda w: w != ""
    )
    n = int(shingle_n)
    sh = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    keys = F.array_distinct(F.transform(sh, _shingle_key_col))

    def perm_min(j):
        a = (F.lit(_MHC_A0) + j.cast("long") * F.lit(_MHC_DA)) % p
        b = (F.lit(_MHC_B0) + j.cast("long") * F.lit(_MHC_DB)) % p
        return F.array_min(
            F.transform(F.col("__keys"), lambda s: (s * a + b) % p)
        )

    keyed = docs.select(
        F.col(id_col).alias("__id"), keys.alias("__keys")
    ).withColumn(
        "__sig",
        F.transform(F.sequence(F.lit(0), F.lit(int(k) - 1)), perm_min),
    ).localCheckpoint(eager=False)
    a = keyed.select(
        F.col("__id").alias("id_a"),
        F.col("__keys").alias("__ka"),
        F.col("__sig").alias("__sa"),
    )
    b = keyed.select(
        F.col("__id").alias("id_b"),
        F.col("__keys").alias("__kb"),
        F.col("__sig").alias("__sb"),
    )
    joined = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    n_match = F.size(
        F.filter(
            F.zip_with(F.col("__sa"), F.col("__sb"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    est = n_match.cast("double") / F.lit(float(k))
    exact = F.coalesce(
        F.try_divide(
            F.size(F.array_intersect("__ka", "__kb")).cast("double"),
            F.size(F.array_union("__ka", "__kb")).cast("double"),
        ),
        F.lit(0.0),
    )
    bound = F.sqrt(F.log(F.lit(40.0)) / F.lit(2.0 * k)) + F.lit(float(slack))
    return joined.select(
        "id_a",
        "id_b",
        n_match.alias("n_sig_match"),
        F.round(est, 6).alias("est_jaccard"),
        F.round(exact, 6).alias("exact_jaccard"),
        F.round(F.abs(est - exact), 6).alias("abs_err"),
        (F.abs(est - exact) <= bound).alias("within_bound"),
    )


# --- Winnowing (Schleimer, Wilkerson, Aiken — SIGMOD 2003) ---------------------------


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    impl: str = "arrow",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    the MOSS algorithm): select, from every window of ``window``
    consecutive char ``k``-gram hashes, the RIGHTMOST MINIMUM — a
    position-robust fingerprint set with two guarantees the rest of the
    dedup family lacks:

    - any shared substring of length >= window + k - 1 between two
      documents yields at least one SHARED fingerprint (detection
      guarantee — MinHash only promises this probabilistically), and
    - density is bounded at 2/(window+1) of positions (storage
      guarantee — ExactSubstr/q65 keys EVERY position).

    That makes winnowing the right primitive for PARTIAL-overlap
    detection (quote reuse, syndicated paragraphs, license blocks)
    where resemblance (MinHash, whole-doc) and exact spans (suffix
    keys, storage-heavy) both miss the operating point.

    Gram hashes are the engine-wide replayable family: Horner char
    fold base 131 mod 2^31-1 with a Knuth mix (_shingle_key_col
    constants) over the dedup-normalized text, so the whole selection
    replays in plain SQL (q139). The rightmost-min tie-break makes the
    output a pure function of the text — no RNG, no partitioning
    dependence.

    Scale shape: everything up to the fingerprint rows is per-row
    array algebra inside one projection — split once, one O(n*k)
    gram-hash pass, one O(g*window^2) selection pass, zero Python,
    zero shuffles; only (id, pos, 8-byte fp) rows leave the scan. The
    O(n*k) gram pass trades a constant factor for SQL replayability;
    a rolling Rabin-Karp upgrade (prefix hashes + B^k pop) drops it
    to O(n) if profiling ever cares.

    IMPLEMENTATION NOTE (the CollapseProject/HOF recompute trap): the
    selection pass references the gram-hash array several times per
    window. Projected columns are NOT materialization points — Catalyst
    collapses adjacent projections and inlines the full gram-hash
    expression into EVERY reference, turning each window's array_min
    into a recompute of the whole O(n*k) gram pass (observed: quadratic
    wall, minutes for 500-char docs). Binding the array as an outer
    HOF lambda variable (transform over a 1-element array) forces one
    evaluation per row; inner lambdas capture the bound value.

    Docs shorter than ``k`` normalized chars emit no rows (they carry
    no k-gram). When grams number fewer than ``window``, one window
    spans them all (every short doc still fingerprints).

    ``impl``: "arrow" (default) runs the selection as a vectorized
    integer numpy kernel inside mapInPandas — ~100x the interpreted
    HOF path on kilobyte docs and BIT-IDENTICAL output (the whole
    algorithm is exact int64 modular arithmetic, so unlike float
    kernels there is no rounding question at all; differential-tested
    per commit). "column" is the pure column-algebra form — the
    executable spec the q139 SQL oracle mirrors.

    Output: (id, pos int 1-based char offset, fp bigint), distinct per
    (id, pos, fp).
    """
    if k < 2 or window < 1:
        raise ValueError("winnow_fingerprints: need k >= 2 and window >= 1")
    if impl == "arrow":
        return _winnow_fingerprints_arrow(df, text_col, id_col, k, window)
    if impl != "column":
        raise ValueError(f"winnow_fingerprints: unknown impl {impl!r}")
    p = F.lit(_KMV_P)
    norm = norm_text_col(F.col(text_col))
    codes = F.transform(
        F.split(norm, ""), lambda c: F.ascii(c).cast("long")
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.length(norm).alias("__n"),
        codes.alias("__codes"),
    )
    g = F.col("__n") - F.lit(int(k) - 1)  # k-gram count
    # bound clamped to >=1: F.sequence(1, g) DESCENDS for g < 1 (it
    # never yields an empty array), driving slice starts to 0 — and
    # optimizer rules may evaluate this projection on rows the g >= 1
    # filter below discards, so the expression must be total. Clamped
    # rows produce garbage that the filter then drops.
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(g, F.lit(1))),
        lambda i: (
            F.aggregate(
                F.slice(F.col("__codes"), i, int(k)),
                F.lit(0).cast("long"),
                lambda a, x: (a * F.lit(_KMV_B) + x) % p,
            )
            * F.lit(_KMV_MIX)
        )
        % p,
    )
    def select_fps(garr):
        # garr is a BOUND lambda variable — evaluated once per row,
        # shared by every window (see implementation note above)
        ng = F.size(garr)
        nw = F.greatest(ng - F.lit(int(window) - 1), F.lit(1))

        def pick(t):
            # window t covers grams [t, te]; rightmost argmin encoded
            # as pos * P + fp (both engines decode with one div/mod —
            # no struct lambdas, which the SQL twin lacks)
            te = F.least(t + F.lit(int(window) - 1), ng)
            sl = F.slice(garr, t, te - t + F.lit(1))
            m = F.array_min(sl)
            pos = F.aggregate(
                F.sequence(t, te),
                F.lit(0).cast("long"),
                lambda acc, j: F.when(
                    F.element_at(garr, j.cast("int")) == m, j.cast("long")
                ).otherwise(acc),
            )
            return pos * p.cast("long") + m

        return F.array_distinct(F.transform(F.sequence(F.lit(1), nw), pick))

    sel = base.filter(g >= 1).select(
        "id",
        F.element_at(
            F.transform(F.array(grams), select_fps), 1
        ).alias("__sel"),
    )
    enc = F.explode("__sel")
    fp = F.pmod(F.col("__e"), p.cast("long"))
    # decode pos with EXACT arithmetic (remainder-subtract then decimal
    # divide, the reputation.fdiv discipline): float division of the
    # packed value goes off-by-one once pos*P nears 2^53 (multi-MB docs)
    pos = (
        (F.col("__e") - fp).cast("decimal(38,0)")
        / F.lit(_KMV_P).cast("decimal(38,0)")
    ).cast("int")
    return sel.select("id", enc.alias("__e")).select(
        "id",
        pos.alias("pos"),
        fp.alias("fp"),
    )


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """MOSS-style pairwise overlap from winnowing fingerprints: two
    documents score by the fingerprint VALUES they share (positions
    drop out — a moved paragraph still matches), normalized by the
    smaller fingerprint set so a short doc fully quoted inside a long
    one scores ~1 (the containment convention, q80).

    Never all-pairs: pairs exist only through shared fp keys, and fps
    on more than ``max_df`` documents are dropped before pairing —
    corpus-wide boilerplate fingerprints are the quadratic hot keys
    (mirror_hosts discipline), and at max_df they stop discriminating
    anyway. One distinct (id, fp) projection, one per-fp doc-count
    filter, one self-join on the 8-byte fp, two broadcast size joins.

    Output: (id_a, id_b, n_shared, n_a, n_b, overlap 6dp) with
    id_a < id_b, n_shared >= ``min_shared``.
    """
    fps = (
        winnow_fingerprints(df, text_col, id_col, k, window)
        .select("id", "fp")
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = fps.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    keep = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .filter((F.col("__nd") >= 2) & (F.col("__nd") <= int(max_df)))
        .select("fp")
    )
    keyed = fps.join(keep, "fp")
    a = keyed.select("fp", F.col("id").alias("id_a"))
    b = keyed.select("fp", F.col("id").alias("id_b"))
    pairs = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared").cast("double")
                / F.least("n_a", "n_b").cast("double"),
                6,
            ).alias("overlap"),
        )
    )


def band_structs_col(sig_col, k: int, bands: int):
    """Array of (band_id, band_key) structs from a MinHash signature
    column — THE band-key definition. Batch candidate generation
    (_band_entry_rows) and the streaming stateful probe
    (streaming/neardup.py) both call this, so stream/batch band parity
    is structural, not two hand-maintained copies of an expression."""
    rows = k // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at(sig_col, b * rows + r + 1)
                            for r in range(rows)
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )


def _band_entry_rows(
    df: DataFrame, text_col: str, id_col: str, k: int, bands: int, n: int
) -> DataFrame:
    """(id, band_id, band_key) rows for LSH banding — the persisted
    shape of a production near-dup index (8-byte keys, one row per
    band). Shared by minhash-family candidate generation."""
    sigs = df.select(
        F.col(id_col).alias("id"),
        minhash_signature_col(
            word_shingles_col(F.col(text_col), n), k
        ).alias("sig"),
    )
    return sigs.select(
        "id",
        F.explode(band_structs_col(F.col("sig"), k, bands)).alias("band"),
    ).select("id", "band.band_id", "band.band_key")


def incremental_minhash_dedup(
    corpus: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    max_iters: int = 20,
) -> DataFrame:
    """Incremental near-dup ADMISSION of a new snapshot against an
    existing corpus — the dump-over-dump production shape (Common
    Crawl monthly refresh, recrawl rounds): the existing corpus is
    settled and indexed; only the NEW documents are classified, and
    nothing recomputes over corpus text. Re-running whole-corpus
    minhash_dedup on corpus+new every refresh is O(corpus) per dump —
    this is O(new + matched-candidates).

    Three verdicts per new doc:
      - ``dup_of_corpus``: shares an LSH band with a corpus doc and
        exact shingle Jaccard >= ``threshold``; dup_of = MIN matching
        corpus id (deterministic).
      - ``dup_of_new``: survives the corpus probe but clusters with an
        earlier-id surviving new doc (the same LSH + verify + min-rep
        fixpoint as minhash_dedup); dup_of = cluster rep.
      - ``kept``: a genuinely new document; dup_of NULL.

    Scale shape: the corpus side contributes ONLY its band-entry rows
    (id + two 8-byte keys per band — in production a persisted index
    table appended per dump, NOT recomputed; pass the raw corpus here
    and the same rows materialize once). The candidate probe is an
    equi-join new-bands -> corpus-bands on (band_id, band_key); gram
    arrays for the exact verify are built ONLY for candidate ids on
    both sides (left-semi prune — corpus text stays in its parquet
    unless a band matched). Intra-new clustering runs on the surviving
    subset only. Defaults use bands=8/rows=2: candidate recall at the
    J=0.5 decision boundary is 1-(1-0.25)^8 ~ 0.90 and >= 0.9999 by
    J=0.9 — admission tuned for high-J refresh dups; the exact verify
    keeps precision exact.

    Output: (id, status string, dup_of nullable) — one row per NEW doc.
    """
    # the new side's band entries serve BOTH the corpus probe and the
    # intra-new clustering below — materialize once (k xxhash64 passes
    # over every new doc's gram array are the dominant per-dump cost)
    nb = _band_entry_rows(new, text_col, id_col, k, bands, n).localCheckpoint(
        eager=False
    )
    cand = (
        nb.withColumnRenamed("id", "new_id")
        .join(
            _band_entry_rows(corpus, text_col, id_col, k, bands, n)
            .withColumnRenamed("id", "corpus_id"),
            ["band_id", "band_key"],
        )
        .select("new_id", "corpus_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    ng = new.join(
        cand.select(F.col("new_id").alias(id_col)).distinct(),
        id_col,
        "left_semi",
    ).select(
        F.col(id_col).alias("new_id"),
        word_shingles_col(F.col(text_col), n).alias("__gn"),
    )
    cg = corpus.join(
        cand.select(F.col("corpus_id").alias(id_col)).distinct(),
        id_col,
        "left_semi",
    ).select(
        F.col(id_col).alias("corpus_id"),
        word_shingles_col(F.col(text_col), n).alias("__gc"),
    )
    inter = F.size(F.array_intersect("__gn", "__gc")).cast("double")
    union = F.greatest(
        F.size(F.array_union("__gn", "__gc")), F.lit(1)
    ).cast("double")
    dupc = (
        cand.join(ng, "new_id")
        .join(cg, "corpus_id")
        .filter(inter / union >= F.lit(float(threshold)))
        .groupBy("new_id")
        .agg(F.min("corpus_id").alias("dup_of"))
    )
    survivors = new.join(
        dupc.select(F.col("new_id").alias(id_col)), id_col, "left_anti"
    )
    surv_bands = nb.join(
        dupc.select(F.col("new_id").alias("id")), "id", "left_anti"
    )
    clusters = minhash_dedup(
        survivors,
        text_col,
        id_col,
        k,
        bands,
        n,
        verify_threshold=threshold,
        max_iters=max_iters,
        band_entries=surv_bands,
    )
    id_type = dict(new.dtypes)[id_col]
    out_c = dupc.select(
        F.col("new_id").alias(id_col),
        F.lit("dup_of_corpus").alias("status"),
        F.col("dup_of").cast(id_type).alias("dup_of"),
    )
    out_n = clusters.select(
        F.col(id_col),
        F.when(F.col("cluster_id") == F.col(id_col), F.lit("kept"))
        .otherwise(F.lit("dup_of_new"))
        .alias("status"),
        F.when(F.col("cluster_id") != F.col(id_col), F.col("cluster_id"))
        .cast(id_type)
        .alias("dup_of"),
    )
    return out_c.unionByName(out_n)


def winnow_shared_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    min_fps: int = 2,
    max_df: int = 50,
    gap: int | None = None,
) -> DataFrame:
    """Localize WHERE two documents overlap — the span-level refinement
    of winnow_overlap_pairs (which only scores pairs): matched
    fingerprints carry positions on both sides, and fingerprints of one
    contiguous shared substring line up on a DIAGONAL (pos_a - pos_b
    constant). Grouping matches by diagonal and merging runs whose
    consecutive positions sit within ``gap`` chars (default
    window + k - 1, the winnowing guarantee spacing) recovers the
    shared char ranges — quote extents, syndicated paragraphs, license
    blocks — without ever comparing text.

    This is the MOSS report stage as pure relational algebra: one fp
    equi-join (hot fps df-capped first, the q139 discipline), one
    lag/flag/sum islands pass per (pair, diagonal), one aggregate.
    Position arithmetic is exact integers end to end, so the SQL twin
    replays byte-for-byte.

    Scale shape: only (id, pos, 8-byte fp) rows reach the join; the
    islands window partitions by (id_a, id_b, diagonal) — keys that
    subdivide hot pairs, so a pair sharing many separate spans never
    sorts as one slice. Text never shuffles; spans are emitted as
    offsets for the caller to slice.

    Output: (id_a, id_b, start_a, end_a, start_b, end_b, n_fps) with
    id_a < id_b, 1-based inclusive char ranges (end = last gram start
    + k - 1), n_fps >= ``min_fps`` matched fingerprints per span.
    """
    g = int(gap) if gap is not None else int(window) + int(k) - 1
    # localCheckpoint: the fingerprint kernel feeds THREE subtrees
    # (hot-fp count + both self-join sides) — without a barrier the
    # mapInPandas kernel and its scan re-execute per reference (the
    # winnow_overlap_pairs / bitext discipline)
    fps = winnow_fingerprints(df, text_col, id_col, k, window).localCheckpoint(
        eager=False
    )
    hot = (
        fps.select("id", "fp")
        .distinct()
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .filter((F.col("__nd") >= 2) & (F.col("__nd") <= int(max_df)))
        .select("fp")
    )
    keyed = fps.join(hot, "fp")
    a = keyed.select(
        "fp", F.col("id").alias("id_a"), F.col("pos").alias("pos_a")
    )
    b = keyed.select(
        "fp", F.col("id").alias("id_b"), F.col("pos").alias("pos_b")
    )
    m = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "pos_a",
            "pos_b",
            (F.col("pos_a") - F.col("pos_b")).alias("__d"),
        )
        .distinct()
    )
    wd = Window.partitionBy("id_a", "id_b", "__d").orderBy(F.col("pos_a").asc())
    islands = m.withColumn(
        "__brk",
        F.when(
            F.col("pos_a") - F.lag("pos_a").over(wd) > F.lit(g), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__isl",
        F.sum("__brk").over(
            wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy("id_a", "id_b", "__d", "__isl")
        .agg(
            F.min("pos_a").alias("start_a"),
            (F.max("pos_a") + F.lit(int(k) - 1)).alias("end_a"),
            F.min("pos_b").alias("start_b"),
            (F.max("pos_b") + F.lit(int(k) - 1)).alias("end_b"),
            F.count(F.lit(1)).alias("n_fps"),
        )
        .filter(F.col("n_fps") >= int(min_fps))
        .select(
            "id_a", "id_b", "start_a", "end_a", "start_b", "end_b", "n_fps"
        )
    )


def _winnow_fingerprints_arrow(
    df: DataFrame, text_col: str, id_col: str, k: int, window: int
) -> DataFrame:
    """Vectorized winnowing kernel (see winnow_fingerprints): per doc,
    gram hashes come from k shifted vector ops with precomputed
    B^j mod p (identical integers to the per-step Horner fold — modular
    arithmetic is exact, there is no accumulation-order question), and
    the rightmost-min window selection is a sliding-window argmin on
    the reversed axis. All int64; products bounded by p*MIX < 2^63.
    Normalization (lower/trim/ws-collapse) stays in the JVM so the
    identity transform is shared with every other dedup op; only
    (id, normalized text) crosses Arrow, and only (id, pos, fp) rows
    return."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    p, b, mix = _KMV_P, _KMV_B, _KMV_MIX
    pows = [pow(b, k - 1 - j, p) for j in range(k)]
    # preserve the caller's id type (string doc ids are common in WARC
    # corpora); the fast np.full(int64) path only applies to integral ids
    id_dtype = df.select(F.col(id_col)).schema[0].dataType
    id_integral = isinstance(
        id_dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    )
    out_schema = T.StructType(
        [
            T.StructField("id", id_dtype),
            T.StructField("pos", T.IntegerType()),
            T.StructField("fp", T.LongType()),
        ]
    )

    def kernel(pdfs):
        for pdf in pdfs:
            ids_out: list = []
            pos_out: list = []
            fp_out: list = []
            for did, norm in zip(pdf["id"], pdf["__norm"]):
                if norm is None or len(norm) < k:
                    continue
                codes = np.frombuffer(
                    norm.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                g = len(codes) - k + 1
                h = np.zeros(g, dtype=np.int64)
                for j in range(k):
                    h = (h + codes[j : j + g] * pows[j]) % p
                h = (h * mix) % p
                nw = max(g - window + 1, 1)
                w_eff = min(window, g)
                win = np.lib.stride_tricks.sliding_window_view(h, w_eff)[
                    :nw
                ]
                # rightmost argmin: first min of the reversed window
                ridx = np.argmin(win[:, ::-1], axis=1)
                idx = w_eff - 1 - ridx
                starts = np.arange(nw)
                sel_pos = starts + idx + 1  # 1-based gram offset
                sel_fp = h[starts + idx]
                enc = np.unique(sel_pos.astype(np.int64) * p + sel_fp)
                ids_out.append(
                    np.full(
                        len(enc), did, dtype=np.int64 if id_integral else object
                    )
                )
                pos_out.append((enc // p).astype(np.int32))
                fp_out.append(enc % p)
            if ids_out:
                yield pd.DataFrame(
                    {
                        "id": np.concatenate(ids_out),
                        "pos": np.concatenate(pos_out),
                        "fp": np.concatenate(fp_out),
                    }
                )

    base = df.select(
        F.col(id_col).alias("id"),
        norm_text_col(F.col(text_col)).alias("__norm"),
    )
    return base.mapInPandas(kernel, out_schema)
