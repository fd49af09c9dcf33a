"""Web-text FILTER family (split from pipeline.py, round 5 — pure move).

C4/CCNet/Gopher-style page-quality verdicts, boilerplate and
contamination filters, corpus cleaning, and within/line dedup — the
keep/drop half of the LLM-data pipeline canon. See each docstring for
the paper citation and the oracle query it backs.
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
    _line_word_count,
    _word_ngrams_distinct,
    _word_windows_col,
    dup_ngram_frac,
    dup_ngram_frac_col,
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
