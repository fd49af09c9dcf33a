"""Corpus-pipeline CORE ops — the operations a training-data pipeline
runs AFTER the crawl, composed from the engine's kernels.

Round-5 split (pure move): the filter canon lives in
``pipeline_filters`` (C4/CCNet/Gopher verdicts, boilerplate,
contamination, cleaning, within/line dedup, unigram fluency), the
sketch/statistical contracts in ``pipeline_sketches``, lexical
statistics and retrieval scoring in ``pipeline_lexical``, and the
composed curation funnels in ``pipeline_funnel``. This module keeps
the core plus the shared underscore helpers those modules import
(acyclic — this module imports nothing back):

- ``hash_split`` / ``split_col``: deterministic train/val/test by a
  Knuth multiplicative id hash — never row-order or partition
  dependent, SQL-replayable, overflow-free over the bigint id domain.
- ``dup_ngram_frac``: Gopher-style duplicate n-gram fraction per doc.
- ``pack_chunks`` / ``chunk_documents``: sequence packing placement
  and document chunking for fixed context windows.
- ``bpe_merges``: batched distributed BPE merge learning (q98).
- ``tokenizer_fertility``, ``calibration_bins``, ``mirror_hosts``,
  ``domain_score_normalize``: tokenizer/model/crawl-side auditing.

Everything here is whole-stage-codegen column algebra (no Python UDFs
in hot paths); DuckDB oracles replay the identical arithmetic.

The reference has no corpus ops at all (it stops at persistence); these
are task-brief-mandated LLM-pipeline additions, same tier as
operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from raven_spark.operators.dedup import adjacent_pairs_col, norm_text_col

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
    dedups for set-Jaccard) — repetition measurement needs multiplicity.
    Zip-shift kernel (see dedup.ngrams_zip_col): the transform/element_at
    form re-evaluates the words expression per element — quadratic."""
    from raven_spark.operators.dedup import ngrams_zip_col

    return ngrams_zip_col(F.split(norm_text_col(text), " "), n)


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


def _word_windows_col(text: Column, w: int) -> Column:
    """Non-overlapping w-word windows over the normalized text (the
    flat-text stand-in for CCNet's line segmentation; the last window may
    be shorter). Every doc yields >= 1 window: empty/whitespace text
    normalizes to "" -> split yields [""] -> one empty-string unit, the
    same edge the DuckDB oracle produces."""
    words = F.split(norm_text_col(text), " ")
    nwin = F.ceil(F.size(words) / F.lit(w)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(nwin, F.lit(1)) - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * w + 1, w)),
    )




def _word_ngrams_distinct(text: Column, n: int) -> Column:
    """Distinct overlapping word n-grams (set semantics — contamination
    is membership, not multiplicity)."""
    return F.array_distinct(_word_ngrams_all(text, n))






def pack_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    ctx_len: int = 2048,
    bucket_col: Column | None = None,
    n_buckets: int = 256,
    order_col: Column | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing — where a training corpus ends:
    documents are laid end-to-end in a deterministic order and the stream
    is cut every ``ctx_len`` tokens (the standard packing used to fill
    fixed-length context windows without padding).

    This operator computes each document's PLACEMENT, not the token
    stream itself: (pack_bucket, start_offset, chunk_id, chunks_spanned)
    — everything a writer needs to emit chunk k of bucket b by streaming
    its documents in order. Placement is what must be deterministic and
    distributed; tokenization stays wherever tokens_col came from.

    Scale shape: packing is inherently a running sum over an order, so it
    runs INSIDE hash buckets (default pmod(xxhash64(id), n_buckets) —
    content-deterministic like every identity in this engine): one
    shuffle on the bucket key, one in-partition sort per bucket, no
    global sort. Buckets trade off against sequence-boundary waste: the
    last partial chunk per bucket (< ctx_len tokens of padding) is the
    only loss, so waste <= n_buckets * ctx_len tokens over the whole
    corpus — noise at 10^10 docs, and each bucket packs in parallel.
    """
    idc = F.col(id_col)
    bucket = (
        bucket_col if bucket_col is not None
        else F.pmod(F.xxhash64(idc), F.lit(n_buckets)).cast("int")
    )
    order = order_col if order_col is not None else F.xxhash64(idc)
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(F.col("__ord").asc(), idc.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("pack_bucket", bucket)
        .withColumn("__ord", order)
        .withColumn("__cum", F.sum(F.col(tokens_col)).over(w))
        .withColumn("start_offset", (F.col("__cum") - F.col(tokens_col)).cast("bigint"))
        .withColumn("chunk_id", F.floor(F.col("start_offset") / ctx_len).cast("bigint"))
        .withColumn(
            "chunks_spanned",
            F.when(F.col(tokens_col) <= 0, F.lit(0)).otherwise(
                F.floor((F.col("__cum") - 1) / ctx_len) - F.col("chunk_id") + 1
            ).cast("bigint"),
        )
    )
    return out.drop("__ord", "__cum")










def _line_word_count(line: Column) -> Column:
    """Whitespace word count of an already-trimmed line ('' -> 1 — callers
    exclude empty lines first; identical to the oracle's
    len(string_split(regexp_replace(l,'\\s+',' ','g'), ' '))."""
    return F.size(F.split(line, r"\s+"))
























_BPE_SEP = "\x1f"  # unit separator; tokens carrying it are dropped (below)
_BPE_BATCH = 16  # max merges learned per Spark job (round); see bpe_merges
_BPE_CKPT = 25  # localCheckpoint the folded vocab every this many rounds


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    steps: int = 3,
) -> DataFrame:
    """Learn the first ``steps`` BPE merge rules over the corpus
    vocabulary (Sennrich et al. 2016 — the tokenizer-training pass):
    start from character symbols, and per step pick the adjacent symbol
    pair with the highest corpus frequency (ties to the lexicographically
    smallest (left, right)), then fuse it everywhere.

    Distributed shape: the corpus collapses to the (word, freq) vocab
    table ONCE (map-side-combinable aggregate; cached — it is O(vocab),
    not O(corpus), and every round replays from it); each ROUND is one
    pair-count hash aggregate + a (m+1)-row TakeOrdered that yields a
    BATCH of merges (below), so learning a real 10k-merge vocab is
    10^2-10^3 Spark jobs, not 10^4. The argmax sync point is inherent
    to BPE — O(m) driver bytes per round, nothing row-scaled.

    Batched rounds replay the sequential algorithm EXACTLY: the batch
    is the maximal all-disjoint PREFIX of the (count desc, pair lex
    asc)-sorted pair list — stop at the first pair sharing a symbol
    with an earlier batch member — further truncated to pairs whose
    count is STRICTLY greater than the stop pair's count. Applying a
    merge only ever (a) leaves disjoint pairs' counts unchanged, (b)
    decreases counts of pairs sharing a symbol, and (c) creates new
    pairs bounded by those touched counts; since every batch member
    strictly out-counts the best touched/creatable pair, the i-th batch
    member is precisely what sequential BPE would pick at step i (ties
    among equal-count batch members resolve by the same lex order the
    sort already applied). If the strict-count rule empties the batch
    (top pairs tie AND conflict), the round falls back to the plain
    1-merge step. The folded vocab is localCheckpoint'ed every
    _BPE_CKPT rounds so lineage depth stays bounded at any vocab size
    (the OPIC fix — without it a 10k-merge run stacks 10k nested
    replace() projections and dies in the analyzer long before the
    executors see work).

    Fusing is a literal string replace over an encoding that makes the
    boundary unmistakable: symbols are joined by a DOUBLE \\x1f with a
    single \\x1f at each end, so every symbol is flanked by exactly one
    separator that no neighboring match consumes. The replace pattern
    ``\\x1f l \\x1f\\x1f r \\x1f`` therefore (a) can never match inside
    a multi-char symbol (no separator mid-symbol — a bare
    ``l+SEP+r`` pattern WOULD false-match the tail of a fused symbol),
    and (b) re-emits its flanking separators, so left-to-right
    non-overlapping replacement fuses runs exactly like BPE's greedy
    scan ('a a a' -> '(aa) a'). The DuckDB oracle replays each step
    with the same replace(). Tokens containing \\x1f itself are dropped
    from the vocabulary (control chars are not meaningful BPE input and
    would corrupt any text-encoded symbol scheme).

    Output: (step, left_sym, right_sym, pair_count) — one row per merge,
    fewer if the vocabulary runs dry.
    """
    words = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.filter(
                    F.split(norm_text_col(F.col(text_col)), " "),
                    lambda w: (w != "") & ~w.contains(_BPE_SEP),
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    vocab = words.select(
        F.concat(
            F.lit(_BPE_SEP),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.length("w")),
                    lambda i: F.substr(F.col("w"), i, F.lit(1)),
                ),
                _BPE_SEP + _BPE_SEP,
            ),
            F.lit(_BPE_SEP),
        ).alias("sym"),
        "f",
    ).persist()
    spark = df.sparkSession
    merges: list[tuple] = []
    cur = vocab
    batch_m = int(_BPE_BATCH)
    rounds = 0
    try:
        while len(merges) < int(steps):
            # strip the single flanking separators, split on the double
            inner = F.substr(F.col("sym"), F.lit(2), F.length("sym") - 2)
            arr = F.split(inner, _BPE_SEP + _BPE_SEP)
            pairs = cur.select(
                F.explode(adjacent_pairs_col(arr, "l", "r")).alias("p"),
                "f",
            )
            want = min(batch_m, int(steps) - len(merges))
            # orderBy+limit -> TakeOrdered: (want+1) rows to the driver;
            # the extra row is the truncation sentinel
            top = (
                pairs.groupBy("p.l", "p.r")
                .agg(F.sum("f").alias("c"))
                .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
                .limit(want + 1)
                .collect()
            )
            if not top:
                break
            # maximal disjoint prefix, then strict-count truncation
            used: set[str] = set()
            batch: list = []
            stop_count = None
            for i, r in enumerate(top):
                if i >= want or r["l"] in used or r["r"] in used:
                    stop_count = int(r["c"])
                    break
                used.add(r["l"])
                used.add(r["r"])
                batch.append(r)
            if stop_count is not None:
                batch = [r for r in batch if int(r["c"]) > stop_count]
            if not batch:
                # top pairs tie AND conflict: sequential single merge
                batch = [top[0]]
            sym = F.col("sym")
            for b in batch:
                merges.append(
                    (len(merges) + 1, b["l"], b["r"], int(b["c"]))
                )
                sym = F.replace(
                    sym,
                    F.lit(
                        _BPE_SEP + b["l"] + _BPE_SEP + _BPE_SEP + b["r"] + _BPE_SEP
                    ),
                    F.lit(_BPE_SEP + b["l"] + b["r"] + _BPE_SEP),
                )
            cur = cur.select(sym.alias("sym"), "f")
            rounds += 1
            if rounds % _BPE_CKPT == 0:
                # bound lineage: 10k merges must not stack 10k nested
                # projections (analyzer blowup); checkpoint is O(vocab)
                cur = cur.localCheckpoint()
    finally:
        vocab.unpersist()
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, pair_count bigint"
    )






# public multiplicative-hash constants (Knuth 2654435761; xxhash primes
# 2246822519 / 3266489917; Murmur-finalizer-adjacent 668265263) — all
# coprime to 2^31-1, products with a < p stay under 2^63 in BIGINT
_CMS_A = (2654435761, 2246822519, 3266489917, 668265263)
_CMS_B = (1000000007, 998244353, 754974721, 167772161)
_CMS_P = 2147483647  # 2^31 - 1 (Mersenne)






def _token_ngrams_col(text, n: int = 1):
    """Token n-grams WITH multiplicity (unlike dedup's distinct
    ``word_shingles_col``) — the unit of frequency for zipf_fit /
    good_turing. n=1 is the plain q89 token stream; n>1 concatenates
    adjacent tokens with single spaces. Empty/whitespace-only text
    yields an empty array."""
    from raven_spark.operators.dedup import ngrams_zip_col

    words = F.filter(F.split(norm_text_col(F.col(text) if isinstance(text, str) else text), " "), lambda w: w != "")
    return ngrams_zip_col(words, n)
















def mirror_hosts(
    df: DataFrame,
    host_col: str = "host",
    content_col: str = "content_key",
    min_shared: int = 3,
    max_hosts_per_key: int = 20,
) -> DataFrame:
    """Content-based mirror-host detection — the HOST-level twin of
    document near-dup: two hosts serving largely the same content set
    (mirrors, CDNs, scraped re-hosts — a large, real slice of any
    Common-Crawl-style corpus) should be crawled once and deduped as a
    unit. Complements the GRAPH-structural signal (cocitation_pairs
    q124: pages cited together) with set resemblance over what the
    hosts actually serve:

        J(a,b) = |K_a ∩ K_b| / |K_a ∪ K_b|
        C(a,b) = |K_a ∩ K_b| / min(|K_a|, |K_b|)   (containment: a
                 small mirror fully inside a big host still scores 1)

    over each host's DISTINCT content-key set (text hash / simhash
    bucket / shingle sketch — caller's choice of identity).

    Never all-pairs: pairs materialize ONLY through shared keys (join
    on the 8-byte content key), and keys on more than
    ``max_hosts_per_key`` hosts are dropped before pairing — those are
    cross-site boilerplate (empty pages, soft-404 templates, CDN
    assets), not mirror evidence, and they are exactly the quadratic
    hot keys (a key on 10^4 hosts would emit 5*10^7 pairs). The cap
    bounds the per-key fan-out at C(cap, 2) pairs and the whole pair
    table at C(cap,2) * n_keys — the banded-LSH discipline applied to
    host pairing. Dropped-key count is observable via the gap between
    sum(n_shared) and raw key co-occurrence, and the cap is a named
    knob, not a silent truncation.

    Scale shape: one distinct (host, key) pass, one per-key host-count
    aggregate + filter, one self-join on key (a < b kills the
    symmetric duplicate), one per-pair count, two broadcast joins
    against the O(hosts) size table. Text never shuffles.

    Output: (host_a, host_b, n_shared, n_a, n_b, jaccard 6dp,
    containment 6dp), n_shared >= ``min_shared``.
    """
    hk = (
        df.select(
            F.col(host_col).alias("h"), F.col(content_col).alias("k")
        )
        .filter(F.col("h").isNotNull() & F.col("k").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = hk.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
    keep_keys = (
        hk.groupBy("k")
        .agg(F.count(F.lit(1)).alias("__nh"))
        .filter(
            (F.col("__nh") >= 2) & (F.col("__nh") <= int(max_hosts_per_key))
        )
        .select("k")
    )
    paired = hk.join(keep_keys, "k")
    left = paired.select("k", F.col("h").alias("host_a"))
    right = paired.select("k", F.col("h").alias("host_b"))
    pairs = (
        left.join(right, "k")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )
    sa = sizes.select(F.col("h").alias("host_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("h").alias("host_b"), F.col("n").alias("n_b"))
    sh = F.col("n_shared").cast("double")
    return (
        pairs.join(F.broadcast(sa), "host_a")
        .join(F.broadcast(sb), "host_b")
        .select(
            "host_a",
            "host_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                sh / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double"),
                6,
            ).alias("jaccard"),
            F.round(
                sh / F.least("n_a", "n_b").cast("double"), 6
            ).alias("containment"),
        )
    )


def calibration_bins(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + expected-calibration-error decomposition
    for a probabilistic quality classifier (Naeini et al. 2015 ECE;
    Guo et al. 2017 §2) — the eval-side companion of the hashed linear
    quality classifier (q51): a filter threshold chosen on scores is
    only meaningful if score ~= P(label), and corpus-scale filtering
    amplifies any miscalibration into systematic selection bias.

    Equal-width bins over [0, 1]: bin b = min(floor(score*n_bins),
    n_bins-1) (the right edge closes the last bin). Per bin:
    confidence = mean score, accuracy = mean label, gap = |conf - acc|,
    and the bin's ECE contribution (n_b / N) * gap. sum(contribution)
    over the output IS the ECE; max(gap) is the MCE.

    Scale shape: ONE map-side-combinable aggregate over the corpus
    keyed by the bin id (<= n_bins rows out), then pure column algebra
    with a broadcast 1-row total — the same zero-text-shuffle shape as
    temperature_weights. Rows with NULL score or label are excluded
    (counted nowhere); scores outside [0, 1] raise at the first
    action via an ANSI-safe guard column rather than silently folding
    into the edge bins.

    Output: (bin, n, confidence 6dp, accuracy 6dp, gap 6dp,
    contribution 6dp), one row per NON-EMPTY bin, bin ascending ids
    0..n_bins-1.
    """
    if n_bins < 1:
        raise ValueError("calibration_bins: n_bins must be >= 1")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    rows = df.filter(s.isNotNull() & y.isNotNull()).select(
        s.alias("__s"),
        y.alias("__y"),
        F.when(
            (s < 0) | (s > 1),
            F.raise_error(
                F.concat(
                    F.lit("calibration_bins: score out of [0,1]: "),
                    s.cast("string"),
                )
            ),
        ).otherwise(
            F.least(
                F.floor(s * F.lit(int(n_bins))).cast("int"),
                F.lit(int(n_bins) - 1),
            )
        ).alias("bin"),
    )
    per = rows.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("__s").alias("__conf"),
        F.avg("__y").alias("__acc"),
    )
    tot = per.agg(F.sum("n").alias("__N"))
    gap = F.abs(F.col("__conf") - F.col("__acc"))
    return per.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        F.round("__conf", 6).alias("confidence"),
        F.round("__acc", 6).alias("accuracy"),
        F.round(gap, 6).alias("gap"),
        F.round(
            gap * F.col("n").cast("double") / F.col("__N").cast("double"), 6
        ).alias("contribution"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    overlap: int = 64,
) -> DataFrame:
    """Sliding-window token chunking — the context-window prep step
    between a cleaned corpus and an embedding/RAG index (and the
    per-document dual of sequence packing q46, which CONCATENATES short
    docs; this SPLITS long ones): cut each document's whitespace-token
    stream into windows of ``chunk_tokens`` tokens advancing by
    stride = chunk_tokens - overlap, so consecutive chunks share
    ``overlap`` tokens of context and no token is orphaned.

    Chunk count is closed-form and deterministic:

        K(m) = 1 + ceil(max(m - C, 0) / S)      (C = chunk, S = stride)

    — one chunk when the doc fits, otherwise exactly enough windows
    that the last start s = (K-1)*S satisfies s + C >= m (full
    coverage) and s < m (the tail chunk is never empty). Empty/NULL
    docs emit no rows.

    Scale shape: pure column algebra — split once, build the K window
    structs with transform over sequence + slice (array ops on the
    already-materialized token array, no re-tokenization per chunk),
    then ONE posexplode. Zero shuffles, zero Python; the fan-out is
    bounded by m/S rows per doc, each carrying only its own window's
    text. Chunk ids are (doc, ordinal) — stable under repartitioning.

    Output: (id, chunk_id int, start_tok int, n_tok int, chunk_text).
    """
    C = int(chunk_tokens)
    S = C - int(overlap)
    if C < 1 or S < 1:
        raise ValueError("chunk_documents: need chunk_tokens >= 1 and overlap < chunk_tokens")
    ws = F.filter(
        F.split(norm_text_col(F.col(text_col)), " "), lambda w: w != ""
    )
    m = F.size(ws)
    k = F.lit(1) + F.ceil(
        F.greatest(m - F.lit(C), F.lit(0)).cast("double") / F.lit(float(S))
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), k - F.lit(1)),
        lambda i: F.struct(
            (i * S).cast("int").alias("start_tok"),
            F.least(m - i * S, F.lit(C)).cast("int").alias("n_tok"),
            F.concat_ws(" ", F.slice(ws, i * S + 1, C)).alias("chunk_text"),
        ),
    )
    return (
        df.select(F.col(id_col), F.when(m > 0, chunks).alias("__chunks"))
        .select(
            id_col, F.posexplode("__chunks").alias("chunk_id", "__c")
        )
        .select(
            id_col,
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.col("__c.start_tok").alias("start_tok"),
            F.col("__c.n_tok").alias("n_tok"),
            F.col("__c.chunk_text").alias("chunk_text"),
        )
    )


def domain_score_normalize(
    df: DataFrame,
    group_col: str = "source",
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain score normalization — the calibration step between a
    quality scorer (q51/q131 classifier, quality_cols heuristics) and a
    single GLOBAL keep threshold: score distributions differ per domain
    (a 0.6 on a news site is not a 0.6 on a forum), so thresholding raw
    scores over-selects easy domains. Emit two normalized views per row:

    - pct_rank: (rank(score) - 1) / (n - 1) within the domain (RANK so
      ties share a value — deterministic without an id tie-break; 0.0
      for singleton domains)
    - z: (score - mean) / stddev_pop within the domain, NULL when the
      domain's variance is 0

    DETERMINISM: mean/variance use fixed-point sums — scores are
    6-dp-rounded on entry, summed exactly as round(score*1e6) /
    round((score*1e6)^2) in decimal(38,0) — so the moments are
    partition-independent and the DuckDB twin replays them (HUGEINT
    sums). The rank is a pure order function of (score).

    Scale shape: ONE hash exchange on the domain key shared by the
    moment aggregate (map-side combinable) and the rank window; the
    moment table is O(domains) and broadcast back. A Zipf-hot domain
    pays an O(n log n) in-domain sort — the exact-rank cost; at
    extreme skew the same output shape can be fed from the GK quantile
    sketch (q106 gk_quantiles) instead of a full sort, trading
    exactness for a bounded-memory merge. NULL scores/groups pass
    through with NULL normalized columns (counted nowhere).

    Output: (id, group, score 6dp, n_domain, pct_rank 6dp, z 6dp).
    """
    s6 = F.round(F.col(score_col).cast("double"), 6)
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__g"),
        s6.alias("__s"),
    )
    ok = base.filter(F.col("__g").isNotNull() & F.col("__s").isNotNull())
    sfp = F.round(F.col("__s") * F.lit(1e6), 0).cast("decimal(38,0)")
    mom = ok.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(sfp).alias("__sum"),
        F.sum(sfp * sfp).alias("__sumsq"),
        F.min("__s").alias("__lo"),
        F.max("__s").alias("__hi"),
    )
    mean = F.col("__sum").cast("double") / F.lit(1e6) / F.col("__n")
    ex2 = F.col("__sumsq").cast("double") / F.lit(1e12) / F.col("__n")
    # zero-variance guard on EXACT order stats (min < max on the 6-dp
    # scores), not on the float moment difference — catastrophic
    # cancellation leaves +/- 1e-17 residues whose sign is luck
    mom = mom.select(
        "__g",
        "__n",
        mean.alias("__mean"),
        F.when(F.col("__lo") < F.col("__hi"), ex2 - mean * mean).alias("__var"),
    )
    w = Window.partitionBy("__g").orderBy(F.col("__s").asc())
    ranked = ok.withColumn("__rk", F.rank().over(w))
    out = ranked.join(F.broadcast(mom), "__g").select(
        F.col("__id").alias(id_col),
        F.col("__g").alias(group_col),
        F.col("__s").alias(score_col),
        F.col("__n").cast("bigint").alias("n_domain"),
        F.round(
            (F.col("__rk") - F.lit(1)).cast("double")
            / F.greatest(F.col("__n") - F.lit(1), F.lit(1)).cast("double"),
            6,
        ).alias("pct_rank"),
        F.when(
            F.col("__var") > 0,
            # + 0.0 folds IEEE -0.0 to +0.0 (DuckDB's double round keeps
            # the sign; BigDecimal HALF_UP does not — parity needs one)
            F.round((F.col("__s") - F.col("__mean")) / F.sqrt("__var"), 6)
            + F.lit(0.0),
        ).alias("z"),
    )
    skipped = base.filter(F.col("__g").isNull() | F.col("__s").isNull()).select(
        F.col("__id").alias(id_col),
        F.col("__g").alias(group_col),
        F.col("__s").alias(score_col),
        F.lit(None).cast("bigint").alias("n_domain"),
        F.lit(None).cast("double").alias("pct_rank"),
        F.lit(None).cast("double").alias("z"),
    )
    return out.unionByName(skipped)


def tokenizer_fertility(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility / compression-rate profile per language (or
    any group) — the mixture-diagnostic behind every token-denominated
    budget decision (q128 water-filling, q60/q121 mixture weights count
    TOKENS; a language whose tokenizer fragments words inflates its
    apparent share, the classic multilingual-fertility skew): aggregate
    bytes, chars, whitespace words and BPE-ish subword tokens per
    group and emit the ratios

        bytes_per_token, chars_per_token   (subword denominator)
        tokens_per_word                    (the fertility proper)

    Scale shape: per-row counts are pure codegen'd column algebra
    (functions/text.py token_count_cols), then ONE map-side-combinable
    aggregate keyed by the group — O(groups) rows out, text never
    shuffles. Ratios divide EXACT bigint sums (no float accumulation
    at all), so the output replays bit-for-bit. NULL-text rows count
    toward n_docs with zero length; NULL groups are excluded.

    Output: (group, n_docs, n_bytes, n_chars, n_words, n_subwords,
    bytes_per_token 6dp, chars_per_token 6dp, tokens_per_word 6dp).
    """
    from raven_spark.functions.text import token_count_cols

    t = F.col(text_col)
    c = token_count_cols(t)
    per = df.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("__g"),
        F.coalesce(F.octet_length(t), F.lit(0)).cast("bigint").alias("__b"),
        F.coalesce(F.length(t), F.lit(0)).cast("bigint").alias("__c"),
        F.coalesce(c["ws_tokens"], F.lit(0)).alias("__w"),
        F.coalesce(c["bpe_tokens"], F.lit(0)).alias("__s"),
    )
    agg = per.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__b").alias("n_bytes"),
        F.sum("__c").alias("n_chars"),
        F.sum("__w").alias("n_words"),
        F.sum("__s").alias("n_subwords"),
    )
    return agg.select(
        F.col("__g").alias(group_col),
        "n_docs",
        "n_bytes",
        "n_chars",
        "n_words",
        "n_subwords",
        F.round(
            F.try_divide(F.col("n_bytes").cast("double"), F.col("n_subwords").cast("double")), 6
        ).alias("bytes_per_token"),
        F.round(
            F.try_divide(F.col("n_chars").cast("double"), F.col("n_subwords").cast("double")), 6
        ).alias("chars_per_token"),
        F.round(
            F.try_divide(F.col("n_subwords").cast("double"), F.col("n_words").cast("double")), 6
        ).alias("tokens_per_word"),
    )




