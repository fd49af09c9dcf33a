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


def _viterbi_counts(
    words: DataFrame, subs: DataFrame, vocab: DataFrame
) -> DataFrame:
    """E-step: Viterbi-segment every word under the current scores and
    return freq-weighted piece usage counts (piece, c)."""
    edges = subs.join(F.broadcast(vocab.select("piece", "s")), "piece").select(
        "word", "i", "j", "s", "piece"
    )
    per_word = (
        edges.groupBy("word")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("i", "j", "s", "piece"))
            ).alias("edges")
        )
        .join(words, "word")
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

    pieces = per_word.select(
        "word",
        "f",
        F.element_at(
            F.transform(F.array(dp), lambda d: backtrack(d)), 1
        ).alias("ps"),
    )
    return (
        pieces.select("f", F.explode("ps").alias("piece"))
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
