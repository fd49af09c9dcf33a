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
- ``host_boilerplate``: CCNet-style per-host boilerplate detection —
  text units repeated across many documents of the same host/source
  (nav bars, footers, cookie banners) are chrome, not content. CCNet
  segments by line; crawl-extracted text has real newlines but the
  documents table is flat word soup, so the segmenter is generic:
  non-overlapping fixed word windows stand in for lines (the unit
  choice is a parameter, the counting algebra is identical).
- ``benchmark_contamination``: flag corpus documents sharing word
  n-grams with a held-out benchmark/eval set (the standard n-gram
  decontamination pass before training). The benchmark side of the
  join is eval-set sized — tiny against a 100 TB corpus — so it is an
  explicit broadcast; at extreme bench sizes the same set would ship
  as a Bloom sidecar instead (same posture as operators/seen.py).

All three are whole-stage-codegen column algebra (no Python, no UDFs),
so they run at scan speed and their DuckDB oracles replay the identical
arithmetic (driver queries q30-q32).

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


def host_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    window_words: int = 7,
    min_docs: int = 3,
) -> DataFrame:
    """Per-host boilerplate measurement (CCNet §2.1 "paragraph-level
    dedup per shard" adapted to host grouping): a unit is boilerplate
    when it occurs in >= min_docs DISTINCT documents of the same group.

    Returns one row per doc: (id, group_key, n_units, n_boiler, boiler_frac)
    where n_boiler counts window positions (with multiplicity) whose unit
    is group-boilerplate.

    Scale shape: the exploded units shuffle on (group, xxhash64(unit)) —
    8-byte unit keys, never the unit text; the distinct-doc count is a
    map-side-combinable groupBy; the count join reuses the same
    partitioning (same keys both sides). No Python, no window over text.
    """
    units = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.explode(_word_windows_col(F.col(text_col), window_words)).alias("unit"),
    ).withColumn("unit_h", F.xxhash64("unit")).drop("unit")
    counts = (
        units.select("grp", "unit_h", "id")
        .distinct()
        .groupBy("grp", "unit_h")
        .agg(F.count(F.lit(1)).alias("ndocs"))
    )
    flagged = units.join(counts, ["grp", "unit_h"])
    return (
        flagged.groupBy("id", "grp")
        .agg(
            F.count(F.lit(1)).alias("n_units"),
            F.sum((F.col("ndocs") >= min_docs).cast("bigint")).alias("n_boiler"),
        )
        .select(
            "id",
            F.col("grp").alias("group_key"),
            "n_units",
            "n_boiler",
            F.round(
                F.col("n_boiler").cast("double")
                / F.greatest(F.col("n_units"), F.lit(1)).cast("double"),
                6,
            ).alias("boiler_frac"),
        )
    )


def _word_ngrams_distinct(text: Column, n: int) -> Column:
    """Distinct overlapping word n-grams (set semantics — contamination
    is membership, not multiplicity)."""
    return F.array_distinct(_word_ngrams_all(text, n))


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 5,
    min_overlap: int = 1,
    bloom_fpp: float | None = None,
    bench_grams_hint: int | None = None,
) -> DataFrame:
    """N-gram decontamination check: for each corpus doc, how many of its
    distinct word n-grams appear anywhere in the benchmark set.

    Returns (id, n_grams, n_overlap, contaminated). Docs shorter than n
    words have n_grams = 0 and are trivially clean.

    Scale shape: the benchmark n-gram set (distinct, hashed to 8 bytes)
    is built once and broadcast — eval sets are MBs against a 100 TB
    corpus, so the corpus side never shuffles; the per-doc overlap count
    is a partial aggregate over the exploded grams. The left anti-ish
    zero-fill goes through a left join on the original ids, also
    shuffle-free on the corpus side (aggregate output is small only per
    doc — it re-joins on id; at corpus scale both sides of that join are
    id-partitioned by the same aggregate exchange).

    ``bloom_fpp`` enables the extreme-bench-size path (the seen.py
    posture): the bench gram set ships as a broadcast Bloom FILTER
    (~10 bits/gram vs 8 bytes/gram for the join table) and the exact
    broadcast join runs only on the maybe-hit survivors. No false
    negatives (Bloom property) and the exact join kills false
    positives, so the RESULT is bit-identical to the plain path — only
    the probe volume changes: ~(overlap + fpp x grams) rows instead of
    every gram. ``bench_grams_hint`` sizes the filter without the one
    count() job over the (bench-sized, tiny) gram set.
    """
    bench_grams = (
        benchmark.select(
            F.explode(_word_ngrams_distinct(F.col(text_col), ngram_n)).alias("g")
        )
        .select(F.xxhash64("g").alias("g_h"))
        .distinct()
    )
    doc_grams = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(_word_ngrams_distinct(F.col(text_col), ngram_n)).alias("g"),
    ).select("id", F.xxhash64("g").alias("g_h"))
    if bloom_fpp is not None:
        from raven_spark.operators.seen import bloom_prune, build_bloom

        expected = bench_grams_hint or bench_grams.count()
        sidecar = build_bloom(bench_grams, "g_h", max(int(expected), 1), bloom_fpp)
        doc_grams = (
            bloom_prune(doc_grams, sidecar, hash_col="g_h", flag_col="__maybe")
            .filter(F.col("__maybe"))
            .drop("__maybe")
        )
    overlap = (
        doc_grams.join(F.broadcast(bench_grams), "g_h")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.size(_word_ngrams_distinct(F.col(text_col), ngram_n)).alias("n_grams"),
    )
    return (
        base.join(overlap, "id", "left")
        .select(
            "id",
            "n_grams",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap).alias("contaminated"),
        )
    )


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


def dedup_within_doc(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    unit_words: int = 8,
    out_col: str = "text_dedup",
) -> DataFrame:
    """Intra-document repetition removal: cut each document into
    non-overlapping ``unit_words``-word windows, drop every window whose
    normalized form already appeared EARLIER IN THE SAME DOCUMENT, and
    reassemble the survivors in order. The in-document counterpart of
    ``dup_ngram_frac`` (which only SCORES repetition): boilerplate blocks
    and copy-paste loops inside one page disappear, cross-document
    content is untouched.

    Scale shape: pure column algebra, ZERO shuffles — the first-occurrence
    test is per-row array logic (sort (hash, index) pairs, keep hash-run
    heads, re-sort survivors by index: O(n log n) per doc), never an
    explode + window over (doc, unit), so a document's units stay inside
    its row and the pass fuses into the scan projection like every other
    text kernel here. Memory is O(units per doc) per row — bounded by the
    page size cap the fetch stage already enforces.

    Output: input columns + ``out_col`` (deduped text) +
    ``dropped_units`` (how many windows were removed).
    """
    norm = norm_text_col(F.col(text_col))
    words = F.split(norm, " ")
    n_units = F.ceil(F.size(words) / F.lit(unit_words)).cast("int")
    units = F.transform(
        F.sequence(F.lit(0), F.greatest(n_units - 1, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i * unit_words + 1, unit_words), " "),
    )
    # empty/whitespace text normalizes to "" (split -> [""]): no units
    units = F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(units)
    # first-occurrence filter without explode OR an accumulator fold: an
    # accumulator that grows per unit (array_contains over an appended
    # array, or map_contains_key over map_concat — Spark maps are
    # ArrayBasedMapData, so both lookup AND insert are O(k) copies) costs
    # O(units^2) per document. Instead detect first occurrences by
    # SORTING (hash, index) pairs — O(n log n) column algebra, no
    # per-step copies: after array_sort, an element is a first occurrence
    # iff its hash differs from its sorted predecessor's; re-sorting the
    # surviving indices restores document order. xxhash64 keys keep the
    # comparison 8 bytes/unit (same collision class as exact_dedup).
    pairs = F.transform(
        units, lambda u, i: F.struct(F.xxhash64(u).alias("h"), i.alias("i"))
    )
    out = (
        df.withColumn("__units", units)
        .withColumn("__sp", F.array_sort(pairs))
    )
    first_idx = F.array_sort(
        F.transform(
            F.filter(
                F.col("__sp"),
                lambda p, j: (j == F.lit(0))
                | (p["h"] != F.element_at(F.col("__sp"), j)["h"]),
            ),
            lambda p: p["i"],
        )
    )
    kept = F.transform(
        first_idx, lambda i: F.element_at(F.col("__units"), i + F.lit(1))
    )
    return (
        out.withColumn("__kept", kept)
        .withColumn(out_col, F.array_join(F.col("__kept"), " "))
        .withColumn(
            "dropped_units",
            (F.size("__units") - F.size("__kept")).cast("bigint"),
        )
        .drop("__units", "__sp", "__kept")
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "avg_logprob",
) -> DataFrame:
    """Corpus-relative fluency score — the SQL-able analogue of CCNet's
    LM-perplexity filter: score each document by the mean log-probability
    of its words under the corpus's own unigram distribution. Gibberish,
    OCR noise, and off-domain boilerplate score far below prose made of
    common words; rankings feed the same keep/drop thresholds CCNet's
    head/middle/tail buckets use.

    Two aggregates + one join, all on 8-byte word hashes:

        words   = explode(normalized words)          [one shuffle: hash]
        freq    = count per word-hash                [map-side partial]
        scored  = words join freq -> avg(ln(c/total)) per doc

    The join is hash-keyed (xxhash64(word), never the word text) and both
    sides arrive partitioned by it from the aggregate — same reuse
    posture as host_boilerplate. The corpus total is one scalar.

    Output: every input row's id + n_words + ``out_col`` (6 dp; nulls for
    empty/whitespace docs, which have no distribution to score).
    """
    norm = norm_text_col(F.col(text_col))
    words = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            F.explode(F.split(norm, " ")).alias("__w"),
        )
        .select(F.col(id_col), F.xxhash64("__w").alias("__wh"))
    )
    freq = words.groupBy("__wh").agg(F.count(F.lit(1)).alias("__c"))
    total = freq.agg(F.sum("__c")).first()[0] or 1
    scored = (
        words.join(freq, "__wh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.avg(F.log(F.col("__c") / F.lit(float(total)))), 6).alias(out_col),
        )
    )
    return df.select(id_col).join(scored, id_col, "left")


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


def ccnet_buckets(
    df: DataFrame,
    score_col: str = "avg_logprob",
    group_col: str = "lang",
    id_col: str = "doc_id",
    out_col: str = "ppl_bucket",
    sample_fraction: float = 1.0,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.4): within
    each language, rank documents by LM score and cut the corpus into
    thirds — "head" trains high-quality models, "tail" is usually
    dropped. Pair with ``unigram_logprob`` for the score (higher =
    more fluent here, so head = top third).

    Scale shape: NOT an ntile over a per-language sort (one reducer
    sorts an entire language — the dominant language IS the corpus).
    Instead: per-group score CUTOFFS at the 1/3 and 2/3 quantiles (one
    aggregate over (group, score) pairs), broadcast-joined back (groups
    are languages — O(100) rows), bucket assignment as a codegen'd
    comparison. This is how CCNet itself does it (cutoffs from a
    sample, assignment map-side). ``sample_fraction < 1`` computes the
    cutoffs from a deterministic ``hash_sample`` of the scores — at
    10^9+ docs/language exact percentile materializes a language's
    score list in one task, so sampling is the 100 TB switch; the
    assignment pass is unchanged either way.

    Output: input columns + ``out_col`` in ('head', 'middle', 'tail';
    null where the score is null, e.g. empty docs).
    """
    scored = df.where(F.col(score_col).isNotNull())

    def cuts_of(rows: DataFrame) -> DataFrame:
        return rows.groupBy(group_col).agg(
            F.percentile(F.col(score_col), [2.0 / 3.0, 1.0 / 3.0]).alias(
                "__cuts"
            )
        )

    if sample_fraction < 1.0:
        from raven_spark.operators.sampling import sample_flag

        # ONE corpus scan: percentile over the sampled rows only
        # (F.when(flag) nulls the rest; percentile ignores nulls) and
        # sampled-out detection ride the same aggregate — the previous
        # shape paid a second full scan (anti-join probe) even when no
        # group was missed, and recomputed the unpersisted aggregate.
        # persist (not localCheckpoint: lineage survives executor loss,
        # the recompute path dynamic-allocation clusters need) caches
        # the O(groups) result; the isEmpty branch decision below is
        # the action that populates it.
        flag = sample_flag([id_col], sample_fraction, salt="ccnet")
        cuts = scored.groupBy(group_col).agg(
            F.percentile(
                F.when(flag, F.col(score_col)), [2.0 / 3.0, 1.0 / 3.0]
            ).alias("__cuts"),
            F.max(flag.cast("int")).alias("__any_samp"),
        ).persist()
        missed_keys = cuts.filter(F.col("__any_samp") == 0).select(group_col)
        if missed_keys.isEmpty():
            cuts = cuts.drop("__any_samp")
        else:
            # a small group can be sampled out entirely — without a
            # fallback every one of its docs would bucket to null
            # (whole languages silently dropped). Missed groups get
            # EXACT cutoffs: they are exactly the groups small enough
            # that exact is cheap, and only their rows re-scan.
            kept = cuts.filter(F.col("__any_samp") > 0).drop("__any_samp")
            missed_rows = scored.join(
                F.broadcast(missed_keys), group_col, "leftsemi"
            )
            cuts = kept.unionByName(cuts_of(missed_rows))
    else:
        cuts = cuts_of(scored)
    out = df.join(F.broadcast(cuts), group_col, "left")
    score = F.col(score_col)
    bucket = (
        F.when(score.isNull() | F.col("__cuts").isNull(), F.lit(None))
        .when(score >= F.col("__cuts")[0], F.lit("head"))
        .when(score >= F.col("__cuts")[1], F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return out.withColumn(out_col, bucket).drop("__cuts")


def _line_word_count(line: Column) -> Column:
    """Whitespace word count of an already-trimmed line ('' -> 1 — callers
    exclude empty lines first; identical to the oracle's
    len(string_split(regexp_replace(l,'\\s+',' ','g'), ' '))."""
    return F.size(F.split(line, r"\s+"))


def c4_filters(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "clean_text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    badwords: tuple[str, ...] = (),
    drop_line_words: tuple[str, ...] = ("javascript",),
    drop_line_phrases: tuple[str, ...] = (
        "terms of use",
        "privacy policy",
        "cookie policy",
        "uses cookies",
        "use of cookies",
        "use cookies",
    ),
) -> DataFrame:
    """The C4 cleaning pass (Raffel et al. 2020, "Exploring the Limits of
    Transfer Learning...", §2.2) — the line- and page-level heuristics that
    turned Common Crawl into C4, as pure column algebra:

    line level (a line is kept iff ALL hold, evaluated on the trimmed line):
      - ends in a terminal punctuation mark ('.', '!', '?', '"')
      - has >= ``min_words_per_line`` words (paper: 3)
      - contains none of ``drop_line_words`` as a word token (paper: the
        word "javascript", from pages asking to enable it)
      - contains none of ``drop_line_phrases`` as a substring (paper's
        boilerplate-policy phrases: "terms of use", "privacy policy", ...)
    page level (flags; ``c4_keep`` is their conjunction):
      - >= ``min_sentences`` sentences in the CLEANED text, sentences
        counted by terminal punctuation (paper: 5)
      - no "lorem ipsum" (case-insensitive, raw text)
      - no curly brace '{' (raw text — code, not prose)
      - no ``badwords`` token hit (lowercase word-token match; stand-in
        seam for the paper's "List of Dirty, Naughty ..." blocklist)

    Output: input row + (out_col, n_lines, n_lines_kept, n_sentences,
    has_lorem_ipsum, has_brace, has_badword, c4_keep). Dropping rows /
    swapping text is left to the caller so audits can see WHY a page
    dropped (same posture as clean_corpus).

    Scale shape: zero shuffles, zero UDFs — split/filter/transform higher-
    order functions fused into the scan (whole-stage codegen); the DuckDB
    oracle (q62) replays every predicate verbatim. The reference engine
    stops at persistence (no corpus ops); this is task-brief LLM-pipeline
    tier, same as gopher_rules_cols.
    """
    # NULL text behaves as the empty page (0 lines, keep=false) — every
    # downstream column stays non-null so the keep conjunction never
    # NULL-propagates (the q51 NULL-text review lesson, applied up front).
    text = F.coalesce(F.col(text_col), F.lit(""))
    trimmed = F.transform(F.split(text, "\n"), lambda l: F.trim(l))
    lines = F.filter(trimmed, lambda l: F.length(l) > 0)

    def line_ok(l: Column) -> Column:
        ok = F.substring(l, -1, 1).isin(".", "!", "?", '"')
        ok = ok & (_line_word_count(l) >= F.lit(min_words_per_line))
        low = F.lower(l)
        if drop_line_words:
            toks = F.split(low, "[^a-z0-9]+")
            for w in drop_line_words:
                ok = ok & ~F.array_contains(toks, w)
        for p in drop_line_phrases:
            ok = ok & ~low.contains(p)
        return ok

    kept = F.filter(lines, line_ok)
    out = (
        df.withColumn("__lines", lines)
        .withColumn("__kept", kept)
        .withColumn(out_col, F.array_join(F.col("__kept"), "\n"))
    )
    clean = F.col(out_col)
    low_all = F.lower(text)
    if badwords:
        bad_toks = F.split(low_all, "[^a-z0-9]+")
        has_bad = F.arrays_overlap(bad_toks, F.array(*[F.lit(w) for w in badwords]))
    else:
        has_bad = F.lit(False)
    return (
        out.withColumn("n_lines", F.size("__lines"))
        .withColumn("n_lines_kept", F.size("__kept"))
        .withColumn("n_sentences", F.regexp_count(clean, F.lit(r"[.!?]")))
        .withColumn("has_lorem_ipsum", low_all.contains("lorem ipsum"))
        .withColumn("has_brace", text.contains("{"))
        .withColumn("has_badword", has_bad)
        .withColumn(
            "c4_keep",
            (F.col("n_sentences") >= F.lit(min_sentences))
            & ~F.col("has_lorem_ipsum")
            & ~F.col("has_brace")
            & ~F.col("has_badword"),
        )
        .drop("__lines", "__kept")
    )


def line_dedup_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    window_words: int | None = None,
    out_col: str = "clean_text",
) -> DataFrame:
    """Corpus-GLOBAL duplicated-unit removal (CCNet, Wenzek et al. 2020
    §2.1 — paragraph-level dedup over the whole dump; RefinedWeb runs the
    same pass at line level): a unit (line, or w-word window when
    ``window_words`` is set — the flat-text stand-in, same parameter as
    host_boilerplate) is DROPPED from every document when it occurs in
    >= ``min_docs`` distinct documents anywhere in the corpus. This is the
    global sibling of host_boilerplate (which only counts within a host
    group and only measures); it removes navigation chrome, cookie
    banners, and mirrored boilerplate that recurs across hosts.

    Output: input row + (out_col, n_units, n_dup_units) where out_col is
    the document reassembled IN ORDER from its non-duplicated units.

    Scale shape: unit text never shuffles — the exploded side carries only
    (id, pos, xxhash64(unit)) 20-byte rows; the distinct-doc count is a
    map-side-combinable groupBy on the 8-byte hash; duplicated POSITIONS
    come back per doc as one collect_set row and the final join is keyed
    on the 8-byte id. Reassembly filters the doc's own unit array by
    index (no re-shuffle of text). At 10^10 docs the dup-hash side is the
    boilerplate population — orders of magnitude smaller than the corpus.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    if window_words is not None:
        units = _word_windows_col(text, window_words)
        sep = " "
    else:
        units = F.filter(
            F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
            lambda l: F.length(l) > 0,
        )
        sep = "\n"
    base = df.withColumn("__units", units)
    exploded = base.select(
        F.col(id_col).alias("__id"), F.posexplode("__units").alias("__pos", "__u")
    ).select("__id", "__pos", F.xxhash64("__u").alias("__h"))
    dup = (
        exploded.select("__h", "__id")
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__ndocs"))
        .filter(F.col("__ndocs") >= F.lit(min_docs))
        .select("__h")
    )
    dup_pos = (
        exploded.join(dup, "__h")
        .groupBy("__id")
        .agg(F.collect_set("__pos").alias("__dup_pos"))
    )
    joined = base.join(dup_pos, base[id_col] == dup_pos["__id"], "left").drop("__id")
    dp = F.coalesce(F.col("__dup_pos"), F.array().cast("array<int>"))
    kept = F.filter(F.col("__units"), lambda u, i: ~F.array_contains(dp, i))
    return (
        joined.withColumn(out_col, F.array_join(kept, sep))
        .withColumn("n_units", F.size("__units"))
        .withColumn("n_dup_units", F.size(dp))
        .drop("__units", "__dup_pos")
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


def stuffing_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 30,
    top_frac_pct: int = 8,
) -> DataFrame:
    """Keyword-stuffing / low-diversity signals per document — the SEO-spam
    shape web filters catch before any model sees the text (a term
    repeated far beyond its natural share, or machine-generated text with
    collapsed character diversity):

    - ``top_token_frac``: share of tokens taken by the single most
      frequent token (argmax token reported; ties break to the
      lexicographically smallest).
    - ``char_entropy``: Shannon entropy (bits) of the normalized text's
      character unigram distribution — log2(n) - sum(c*log2 c)/n.
    - ``stuffed``: n_tokens >= min_tokens AND the top token holds >=
      ``top_frac_pct``% of the stream, tested in EXACT integer
      arithmetic (best*100 >= pct*n) so the verdict has no float
      boundary.

    100 TB shape: ZERO shuffles — every signal is a per-row fold over
    the doc's own sorted token/char arrays (sorted runs == multiset
    counts), whole-stage-codegen'd into the scan. The DuckDB oracle
    counts the same multisets by group instead; the float sums meet at
    6dp (the only order-divergent term), the integers exactly.
    """
    # NULL text behaves as empty (n_tokens 0, stuffed false) — the same
    # identity norm the dedup family applies before counting
    text = norm_text_col(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.array_sort(F.filter(F.split(text, " "), lambda w: w != ""))
    n_tok = F.size(toks)

    # fold over sorted tokens: (prev, run, best_count, best_token)
    tok_acc = F.aggregate(
        toks,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(0).cast("bigint").alias("best"),
            F.lit("").alias("best_tok"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1).cast("bigint")).alias("run"),
            F.when(
                F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)) > a["best"],
                F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)).cast("bigint"),
            ).otherwise(a["best"]).alias("best"),
            F.when(
                F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)) > a["best"], x
            ).otherwise(a["best_tok"]).alias("best_tok"),
        ),
    )

    # split(text, "") is the one-pass char array (the quality_model
    # convention); per-index substr would re-seek the UTF8String from
    # the start each call — O(len^2) per doc on the corpus hot path
    chars = F.array_sort(F.split(text, ""))
    n_ch = F.length(text)
    # fold over sorted chars: on run close, accumulate run*log2(run)
    ch_acc = F.aggregate(
        chars,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(0.0).alias("s"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1).cast("bigint")).alias("run"),
            F.when(
                x == a["prev"], a["s"]
            ).otherwise(
                a["s"]
                + F.when(
                    a["run"] > 0,
                    a["run"].cast("double") * F.log2(a["run"].cast("double")),
                ).otherwise(F.lit(0.0))
            ).alias("s"),
        ),
        lambda a: a["s"]
        + F.when(
            a["run"] > 0, a["run"].cast("double") * F.log2(a["run"].cast("double"))
        ).otherwise(F.lit(0.0)),
    )

    out = df.select(
        F.col(id_col),
        n_tok.cast("bigint").alias("n_tokens"),
        tok_acc.alias("__t"),
        F.when(n_ch > 0, F.round(F.log2(n_ch.cast("double")) - ch_acc / n_ch.cast("double"), 6))
        .otherwise(F.lit(0.0))
        .alias("char_entropy"),
    )
    return out.select(
        id_col,
        "n_tokens",
        F.when(F.col("n_tokens") > 0, F.col("__t.best_tok")).otherwise(F.lit(None).cast("string")).alias("top_token"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("__t.best").cast("double") / F.col("n_tokens").cast("double"), 6),
        ).otherwise(F.lit(0.0)).alias("top_token_frac"),
        "char_entropy",
        (
            (F.col("n_tokens") >= int(min_tokens))
            & (F.col("__t.best") * 100 >= F.col("n_tokens") * int(top_frac_pct))
        ).alias("stuffed"),
    )


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


# public multiplicative-hash constants (Knuth 2654435761; xxhash primes
# 2246822519 / 3266489917; Murmur-finalizer-adjacent 668265263) — all
# coprime to 2^31-1, products with a < p stay under 2^63 in BIGINT
_CMS_A = (2654435761, 2246822519, 3266489917, 668265263)
_CMS_B = (1000000007, 998244353, 754974721, 167772161)
_CMS_P = 2147483647  # 2^31 - 1 (Mersenne)


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


def _token_ngrams_col(text, n: int = 1):
    """Token n-grams WITH multiplicity (unlike dedup's distinct
    ``word_shingles_col``) — the unit of frequency for zipf_fit /
    good_turing. n=1 is the plain q89 token stream; n>1 concatenates
    adjacent tokens with single spaces. Empty/whitespace-only text
    yields an empty array."""
    from raven_spark.operators.dedup import ngrams_zip_col

    words = F.filter(F.split(norm_text_col(F.col(text) if isinstance(text, str) else text), " "), lambda w: w != "")
    return ngrams_zip_col(words, n)


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
