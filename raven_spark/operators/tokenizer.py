"""Distributed tokenizer TRAINING — the SentencePiece pair next to BPE.

``bpe_merges`` (operators/pipeline.py, q98) learns the merge half of the
public tokenizer-training canon; this module adds the OTHER half:
unigram-LM vocabulary learning (Kudo 2018, "Subword Regularization" —
the algorithm behind SentencePiece's default trainer), run as Spark
joins/aggregates with integer fixed-point likelihoods so every step is
deterministic, partition-invariant, and replayable in plain SQL (q153).

Reference parity note: tsuboshy/raven has no tokenizer trainer — this is
part of the LLM-data-pipeline surface the graft adds on top of the
reference's crawl semantics (SURVEY.md §2 extension families).

Semantics (hard-EM / Viterbi variant):

- The corpus collapses once to the distinct (word, freq) vocabulary
  table over dedup-normalized words (norm_text_col — the engine-wide
  identity transform), keeping words of 1..max_word_len chars. Longer
  tokens are excluded (not truncated) — at web scale they are a
  vanishing tail and truncation would corrupt substring statistics.
- SEED: every substring of length 1..max_piece_len of every word,
  counted with multiplicity times word freq; the seed vocabulary is the
  top ``seed_size`` pieces by (count desc, piece asc) UNION every
  single-character piece (so segmentation is always total — the same
  required-character rule SentencePiece applies). Piece score =
  round(ln(count / total) * 1e6) as BIGINT, where total sums the seed
  vocabulary's counts.
- EM round (x ``rounds``): E-step segments every word by Viterbi under
  the current integer scores (ties: maximal score, then SMALLEST start
  index, i.e. the longest piece ending at the position) and accumulates
  freq-weighted piece usage counts; M-step keeps the top ``vocab_size``
  used pieces (count desc, piece asc) plus all single chars, and
  rescores round(ln(count / total) * 1e6); zero-count single chars get
  the deterministic floor score _UNI_FLOOR_FP.

Scale shape: the substring/position table is built ONCE and reused by
every round (it is O(words x max_word_len x max_piece_len), linear in
the distinct-word vocabulary, never in corpus rows); each round is one
broadcast join (piece scores onto substrings), one shuffle on the word
key to assemble per-word edge arrays, and one aggregate for counts. The
Viterbi DP itself is pure column algebra: a single F.aggregate fold over
word positions with the edge array bound as a HOF lambda variable (the
CollapseProject-recompute guard documented in dedup._winnow_*), zero
Python, zero extra shuffles. Driver traffic per round is two scalars
(the count total) — nothing row-scaled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from raven_spark.operators.dedup import norm_text_col

_UNI_FP = 1_000_000  # fixed-point scale for ln-scores
_UNI_FLOOR_FP = -40_000_000  # score of zero-count (kept) single chars
_UNI_MINF = -(1 << 62)  # unreachable-DP sentinel


def _word_table(df: DataFrame, text_col: str, max_word_len: int) -> DataFrame:
    words = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.filter(
                    F.split(norm_text_col(F.col(text_col)), " "),
                    lambda w: (F.length(w) >= 1)
                    & (F.length(w) <= int(max_word_len)),
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    return words.select("word", "f", F.length("word").alias("n"))


def _substring_table(words: DataFrame, max_piece_len: int) -> DataFrame:
    """(word, f, n, i 0-based start, l, piece) for every substring of
    length 1..max_piece_len — the shared backbone of seeding and every
    round's edge build."""
    return (
        words.select(
            "word",
            "f",
            "n",
            F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("i"),
        )
        .select(
            "word",
            "f",
            "n",
            "i",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(int(max_piece_len)), F.col("n") - F.col("i")),
                )
            ).alias("l"),
        )
        .select(
            "word",
            "f",
            "n",
            "i",
            (F.col("i") + F.col("l")).alias("j"),
            F.col("word").substr(F.col("i") + 1, F.col("l")).alias("piece"),
        )
    )


def _score_vocab(counts: DataFrame) -> DataFrame:
    """(piece, c) -> (piece, s fixed-point ln(c/total)); c=0 -> floor.

    One scalar to the driver (the total); ln/round are the engine's
    replayable convention (round half away from zero in both Spark and
    the DuckDB twin)."""
    total = counts.agg(F.sum("c")).first()[0] or 1
    return counts.select(
        "piece",
        "c",
        F.when(F.col("c") > 0,
               F.round(
                   F.log(F.col("c").cast("double") / F.lit(float(total)))
                   * F.lit(float(_UNI_FP)),
                   0,
               ).cast("bigint"))
        .otherwise(F.lit(_UNI_FLOOR_FP).cast("bigint"))
        .alias("s"),
    )


def _viterbi_segments(
    words: DataFrame, subs: DataFrame, vocab: DataFrame
) -> DataFrame:
    """Viterbi-segment every DISTINCT word under the given scores.

    Returns (word, f, n, ps array<string>, tot_fp bigint, reachable
    boolean). Training corpora are always reachable (every single char
    is in the vocab by construction); at INFERENCE time a word carrying
    a character the training corpus never saw has no path — it comes
    back reachable=false with an empty ps, for the caller to count as
    OOV (never silently dropped)."""
    edges = subs.join(F.broadcast(vocab.select("piece", "s")), "piece").select(
        "word", "i", "j", "s", "piece"
    )
    # LEFT join from words: an inference-time word whose every char is
    # unseen has ZERO edges and must still come back (as unreachable),
    # not vanish from the output
    per_word = words.join(
        edges.groupBy("word").agg(
            F.sort_array(
                F.collect_list(F.struct("i", "j", "s", "piece"))
            ).alias("edges")
        ),
        "word",
        "left",
    ).withColumn(
        "edges",
        F.coalesce(
            F.col("edges"),
            F.array().cast("array<struct<i:int,j:int,s:bigint,piece:string>>"),
        ),
    )
    minf = F.lit(_UNI_MINF).cast("bigint")

    def dp_step(acc, j):
        # best over edges ending at j of acc[e.i].b + e.s; ties -> min i
        def pick(best, e):
            tot = F.element_at(acc, e["i"] + 1)["b"] + e["s"]
            reach = F.element_at(acc, e["i"] + 1)["b"] > minf
            better = reach & (
                (tot > best["b"]) | ((tot == best["b"]) & (e["i"] < best["bi"]))
            )
            return F.when(
                (e["j"] == j) & better,
                F.struct(
                    tot.alias("b"), e["i"].alias("bi"), e["piece"].alias("bp")
                ),
            ).otherwise(best)

        zero = F.struct(
            minf.alias("b"), F.lit(2147483647).alias("bi"), F.lit("").alias("bp")
        )
        return F.concat(acc, F.array(F.aggregate(F.col("edges"), zero, pick)))

    dp = F.aggregate(
        F.sequence(F.lit(1), F.col("n")),
        F.array(
            F.struct(
                F.lit(0).cast("bigint").alias("b"),
                F.lit(0).alias("bi"),
                F.lit("").alias("bp"),
            )
        ),
        dp_step,
    )

    # backtrack inside a 1-element transform so the DP array evaluates
    # once per row (the CollapseProject-recompute guard)
    def backtrack(d):
        def step(st, _):
            cur = F.element_at(d, st["pos"] + 1)
            return F.when(
                st["pos"] > 0,
                F.struct(
                    cur["bi"].alias("pos"),
                    F.concat(st["ps"], F.array(cur["bp"])).alias("ps"),
                ),
            ).otherwise(st)

        return F.aggregate(
            F.sequence(F.lit(1), F.col("n")),
            F.struct(
                F.col("n").alias("pos"),
                F.array().cast("array<string>").alias("ps"),
            ),
            step,
        )["ps"]

    # one evaluation of the DP array per row; unreachable final state
    # (inference-time OOV) -> empty ps + floor total, flagged
    def finish(d):
        fin = F.element_at(d, F.col("n") + 1)
        reach = fin["b"] > minf
        return F.struct(
            F.when(reach, backtrack(d))
            .otherwise(F.array().cast("array<string>"))
            .alias("ps"),
            F.when(reach, fin["b"]).otherwise(minf).alias("tot_fp"),
            reach.alias("reachable"),
        )

    return per_word.select(
        "word",
        "f",
        "n",
        F.element_at(F.transform(F.array(dp), lambda d: finish(d)), 1).alias("__r"),
    ).select(
        "word",
        "f",
        "n",
        F.col("__r")["ps"].alias("ps"),
        F.col("__r")["tot_fp"].alias("tot_fp"),
        F.col("__r")["reachable"].alias("reachable"),
    )


def _viterbi_counts(
    words: DataFrame, subs: DataFrame, vocab: DataFrame
) -> DataFrame:
    """E-step: freq-weighted piece usage counts (piece, c)."""
    segs = _viterbi_segments(words, subs, vocab)
    return (
        segs.select("f", F.explode("ps").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("f").alias("c"))
    )


def unigram_lm_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 120,
    seed_size: int = 150,
    max_piece_len: int = 3,
    max_word_len: int = 10,
    rounds: int = 2,
) -> DataFrame:
    """Train a unigram-LM subword vocabulary (module docstring for the
    full contract). Output: (rank, piece, n_count, score_fp) — rank by
    (count desc, piece asc) over the final vocabulary; score_fp is the
    integer fixed-point ln-probability (ln(c/total) * 1e6, floor for
    zero-count single chars). No floats leave the operator."""
    if max_piece_len < 1 or max_word_len < 1 or rounds < 1:
        raise ValueError("unigram_lm_train: need positive piece/word/rounds")
    words = _word_table(df, text_col, max_word_len).persist()
    subs = _substring_table(words, max_piece_len).persist()
    vocab = None
    try:
        seed_counts = subs.groupBy("piece").agg(F.sum("f").alias("c"))
        # orderBy+limit -> TakeOrdered: per-partition heaps, no global
        # sort, no single-partition window over the full piece universe
        top = (
            seed_counts.orderBy(F.col("c").desc(), F.col("piece").asc())
            .limit(int(seed_size))
            .select("piece")
        )
        chars = seed_counts.filter(F.length("piece") == 1).select("piece")
        kept = top.unionByName(chars).distinct()
        vocab = _score_vocab(seed_counts.join(kept, "piece")).persist()
        for _ in range(int(rounds)):
            counts = _viterbi_counts(words, subs, vocab)
            used_top = (
                counts.orderBy(F.col("c").desc(), F.col("piece").asc())
                .limit(int(vocab_size))
                .select("piece")
            )
            kept = used_top.unionByName(chars).distinct()
            nxt = _score_vocab(
                kept.join(counts, "piece", "left").select(
                    "piece", F.coalesce("c", F.lit(0)).cast("bigint").alias("c")
                )
            ).persist()
            vocab.unpersist()
            vocab = nxt
        # the final rank window runs over vocab_size+|chars| rows — tiny;
        # localCheckpoint materializes the result and CUTS the
        # rounds-deep lineage before the persisted backbones go away
        wrank = Window.orderBy(F.col("c").desc(), F.col("piece").asc())
        return vocab.select(
            F.row_number().over(wrank).alias("rank"),
            "piece",
            F.col("c").alias("n_count"),
            F.col("s").alias("score_fp"),
        ).localCheckpoint()
    finally:
        words.unpersist()
        subs.unpersist()
        if vocab is not None:
            vocab.unpersist()


def unigram_segment(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 3,
    max_word_len: int = 10,
    join_key: str = "word",
) -> DataFrame:
    """APPLY a trained unigram-LM vocabulary to a corpus — the
    inference half of q153's training (SentencePiece encode): Viterbi-
    segment every document's words under the vocabulary's fixed-point
    scores and report per-document tokenization stats.

    ``vocab`` is unigram_lm_train's output (or any (piece, score_fp)
    frame — score_fp aliased s is also accepted).

    This is the op that actually runs at 100 TB (training runs once on
    a sample; encoding touches every byte), so its shape is the
    classic distinct-word trick: segment each DISTINCT corpus word
    ONCE — O(vocabulary), not O(corpus tokens) — then join the
    per-word results back onto the per-doc word streams and aggregate.
    Words longer than ``max_word_len`` chars and words with no
    segmentation path (a character the training corpus never saw) are
    counted as OOV per doc, never silently dropped.

    ``join_key``: "word" (default — string-keyed, what the q154 oracle
    replays exactly) or "hash" (PRODUCTION — both sides of the
    corpus-scale join carry xxhash64(word) instead of the word text,
    so text never shuffles; the q09 exact-dedup hash/strict convention
    with the same negligible-collision acceptance).

    Output: (id, n_words, n_oov, n_pieces, sum_score_fp) — one row per
    input doc; empty/whitespace docs count zero everywhere. The score
    sum is exact bigint (SQL-replayable); ln-probabilities stay fixed-
    point end to end.
    """
    if join_key not in ("word", "hash"):
        raise ValueError(f"unigram_segment: unknown join_key {join_key!r}")
    score_col = "score_fp" if "score_fp" in vocab.columns else "s"
    v = vocab.select("piece", F.col(score_col).cast("bigint").alias("s"))
    doc_words = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.filter(
                    F.split(norm_text_col(F.col(text_col)), " "),
                    lambda w: F.length(w) >= 1,
                )
            ).alias("word"),
        )
    )
    words = (
        doc_words.filter(F.length("word") <= int(max_word_len))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
        .select("word", "f", F.length("word").alias("n"))
    )
    subs = _substring_table(words, max_piece_len)
    segs = _viterbi_segments(words, subs, v).select(
        "word",
        F.size("ps").alias("__np"),
        "tot_fp",
        "reachable",
    )
    if join_key == "hash":
        doc_words = doc_words.select("id", F.xxhash64("word").alias("word"))
        segs = segs.select(
            F.xxhash64("word").alias("word"), "__np", "tot_fp", "reachable"
        )
    joined = doc_words.join(segs, "word", "left").select(
        "id",
        # NULL seg row = word over the length cap -> OOV
        F.coalesce(F.col("reachable"), F.lit(False)).alias("__ok"),
        F.coalesce(F.col("__np"), F.lit(0)).alias("__np"),
        F.coalesce(F.col("tot_fp"), F.lit(0).cast("bigint")).alias("__fp"),
    )
    per_doc = joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum((~F.col("__ok")).cast("bigint")).alias("n_oov"),
        F.sum(F.when(F.col("__ok"), F.col("__np")).otherwise(0)).alias("n_pieces"),
        F.sum(
            F.when(F.col("__ok"), F.col("__fp")).otherwise(F.lit(0).cast("bigint"))
        ).alias("sum_score_fp"),
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_words", F.lit(0).cast("bigint")).alias("n_words"),
            F.coalesce("n_oov", F.lit(0).cast("bigint")).alias("n_oov"),
            F.coalesce("n_pieces", F.lit(0).cast("bigint")).alias("n_pieces"),
            F.coalesce("sum_score_fp", F.lit(0).cast("bigint")).alias(
                "sum_score_fp"
            ),
        )
    )


def bpe_encode(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    join_key: str = "word",
) -> DataFrame:
    """APPLY a learned BPE merge list to a corpus — the inference half
    of q98's bpe_merges (tokenize-by-merges): fold every merge rule, in
    learned order, over each word's separator-encoded symbol string
    (the exact \\x1f encoding bpe_merges trains with, so train and
    apply share one fusing semantics), and report per-document token
    stats.

    ``merges`` is a list of (left_sym, right_sym) pairs — pass
    bpe_merges' collected output rows (O(vocab) driver bytes; the rule
    list is part of the MODEL, like the unigram vocab, and compiles
    into the column expression — nothing per-row ships to the driver).

    Same 100 TB shape as unigram_segment: distinct words encode once,
    results join back onto the doc word streams; ``join_key="hash"``
    (vs the oracle-exact "word" default) carries xxhash64(word) on both
    sides of the corpus-scale join so text never shuffles.

    Output: (id, n_words, n_tokens, n_chars) per input doc — n_tokens
    is the post-merge symbol count, n_chars the normalized char count
    of counted words (tokens-per-word / chars-per-token fertility
    ratios are one division away, kept out so the row stays integer-
    exact).
    """
    from raven_spark.operators.pipeline import _BPE_SEP

    doc_words = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(norm_text_col(F.col(text_col)), " "),
                lambda w: (w != "") & ~w.contains(_BPE_SEP),
            )
        ).alias("word"),
    )
    words = doc_words.groupBy("word").agg(F.count(F.lit(1)).alias("f"))
    sym = F.concat(
        F.lit(_BPE_SEP),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.substr(F.col("word"), i, F.lit(1)),
            ),
            _BPE_SEP + _BPE_SEP,
        ),
        F.lit(_BPE_SEP),
    )
    for left, right in merges:
        sym = F.replace(
            sym,
            F.lit(_BPE_SEP + left + _BPE_SEP + _BPE_SEP + right + _BPE_SEP),
            F.lit(_BPE_SEP + left + right + _BPE_SEP),
        )
    if join_key not in ("word", "hash"):
        raise ValueError(f"bpe_encode: unknown join_key {join_key!r}")
    encoded = words.select(
        "word",
        F.size(
            F.split(F.substr(sym, F.lit(2), F.length(sym) - 2), _BPE_SEP + _BPE_SEP)
        ).alias("__nt"),
        F.length("word").alias("__nc"),
    )
    if join_key == "hash":
        doc_words = doc_words.select("id", F.xxhash64("word").alias("word"))
        encoded = encoded.select(
            F.xxhash64("word").alias("word"), "__nt", "__nc"
        )
    per_doc = (
        doc_words.join(encoded, "word")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__nt").alias("n_tokens"),
            F.sum("__nc").alias("n_chars"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_words", F.lit(0).cast("bigint")).alias("n_words"),
            F.coalesce("n_tokens", F.lit(0).cast("bigint")).alias("n_tokens"),
            F.coalesce("n_chars", F.lit(0).cast("bigint")).alias("n_chars"),
        )
    )
