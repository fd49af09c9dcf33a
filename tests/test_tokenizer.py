"""unigram_lm_train (q153) — differential + contract tests.

The pure-Python twin below re-implements the full hard-EM algorithm
(seed, Viterbi with the max-score-then-min-start tie-break, prune,
fixed-point rescore) independently of Spark; the differential test
asserts EXACT (rank, piece, n_count, score_fp) equality.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

_FP = 1_000_000
_FLOOR = -40_000_000
_MINF = -(1 << 62)


def _round_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _py_unigram(
    texts,
    vocab_size=120,
    seed_size=150,
    max_piece_len=3,
    max_word_len=10,
    rounds=2,
):
    words: Counter = Counter()
    for t in texts:
        if t is None:
            continue
        norm = re.sub(r"\s+", " ", t.strip().lower())
        for w in norm.split(" "):
            if 1 <= len(w) <= max_word_len:
                words[w] += 1

    sc: Counter = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                sc[w[i : i + l]] += f
    chars = {p for p in sc if len(p) == 1}
    top = [p for p, _ in sorted(sc.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]]
    kept = set(top) | chars

    def score(counts: dict) -> dict:
        total = sum(counts.values()) or 1
        return {
            p: (
                _round_away(math.log(c * 1.0 / total) * _FP)
                if c > 0
                else _FLOOR
            )
            for p, c in counts.items()
        }

    counts = {p: sc[p] for p in kept}
    vocab = score(counts)

    def viterbi(w: str) -> list:
        n = len(w)
        best = [(0, 0, "")] + [(_MINF, 2**31 - 1, "")] * n
        for j in range(1, n + 1):
            b = (_MINF, 2**31 - 1, "")
            for i in range(max(0, j - max_piece_len), j):
                p = w[i:j]
                s = vocab.get(p)
                if s is not None and best[i][0] > _MINF:
                    tot = best[i][0] + s
                    if tot > b[0] or (tot == b[0] and i < b[1]):
                        b = (tot, i, p)
            best[j] = b
        ps, pos = [], n
        while pos > 0:
            _, bi, bp = best[pos]
            ps.append(bp)
            pos = bi
        return ps

    for _ in range(rounds):
        used: Counter = Counter()
        for w, f in words.items():
            for p in viterbi(w):
                used[p] += f
        keep = {
            p
            for p, _ in sorted(used.items(), key=lambda kv: (-kv[1], kv[0]))[
                :vocab_size
            ]
        } | chars
        counts = {p: used.get(p, 0) for p in keep}
        vocab = score(counts)

    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [
        (r + 1, p, c, vocab[p]) for r, (p, c) in enumerate(ranked)
    ]


_TEXTS = [
    "the quick brown fox jumps over the lazy dog today",
    "the lazy dog sleeps while the quick fox runs away",
    "pack my box with five dozen liquor jugs right now",
    "sphinx of black quartz judge my vow says the sage",
    "how vexingly quick daft zebras jump over the fence",
    "the five boxing wizards jump quickly over the dog",
    None,
    "  The   QUICK  brown fox  ",  # norm: lower + ws collapse
    "supercalifragilistic is far too long to be a word here",
]


def test_unigram_differential_vs_python(spark):
    from raven_spark.operators.tokenizer import unigram_lm_train

    df = spark.createDataFrame([(t,) for t in _TEXTS], "text string")
    got = [
        (r["rank"], r["piece"], r["n_count"], r["score_fp"])
        for r in unigram_lm_train(
            df, vocab_size=40, seed_size=60, max_piece_len=3,
            max_word_len=10, rounds=2,
        ).orderBy("rank").collect()
    ]
    want = _py_unigram(
        _TEXTS, vocab_size=40, seed_size=60, max_piece_len=3,
        max_word_len=10, rounds=2,
    )
    assert got == want
    assert len(got) > 20


def test_unigram_partition_invariance(spark):
    from raven_spark.operators.tokenizer import unigram_lm_train

    df = spark.createDataFrame([(t,) for t in _TEXTS], "text string")
    a = [
        tuple(r)
        for r in unigram_lm_train(df, vocab_size=30, seed_size=40, rounds=1)
        .orderBy("rank").collect()
    ]
    b = [
        tuple(r)
        for r in unigram_lm_train(
            df.repartition(7), vocab_size=30, seed_size=40, rounds=1
        ).orderBy("rank").collect()
    ]
    assert a == b


def test_unigram_segmentation_is_total(spark):
    """Every char of every (length-capped) word must be covered: the
    freq-weighted piece-length mass equals the total char mass. Needs a
    non-pruning vocab_size — the M-step prune legitimately discards the
    tail of used pieces (and their counts) otherwise."""
    from raven_spark.operators.tokenizer import unigram_lm_train

    df = spark.createDataFrame([(t,) for t in _TEXTS], "text string")
    out = unigram_lm_train(
        df, vocab_size=100000, seed_size=60, rounds=1
    ).collect()
    piece_mass = sum(r["n_count"] * len(r["piece"]) for r in out)
    words: Counter = Counter()
    for t in _TEXTS:
        if t is None:
            continue
        for w in re.sub(r"\s+", " ", t.strip().lower()).split(" "):
            if 1 <= len(w) <= 10:
                words[w] += 1
    char_mass = sum(f * len(w) for w, f in words.items())
    assert piece_mass == char_mass


def test_unigram_rejects_bad_params(spark):
    from raven_spark.operators.tokenizer import unigram_lm_train

    df = spark.createDataFrame([("a b",)], "text string")
    with pytest.raises(ValueError):
        unigram_lm_train(df, rounds=0)


def _py_segment_docs(texts, vocab, max_piece_len=3, max_word_len=10):
    """Per-doc (n_words, n_oov, n_pieces, sum_score_fp) twin of
    unigram_segment under a piece->score_fp dict."""
    out = []
    for t in texts:
        nw = no = np_ = sfp = 0
        if t is not None:
            norm = re.sub(r"\s+", " ", t.strip().lower())
            for w in (x for x in norm.split(" ") if len(x) >= 1):
                nw += 1
                if len(w) > max_word_len:
                    no += 1
                    continue
                n = len(w)
                best = [(0, 0, "")] + [(_MINF, 2**31 - 1, "")] * n
                for j in range(1, n + 1):
                    b = (_MINF, 2**31 - 1, "")
                    for i in range(max(0, j - max_piece_len), j):
                        s = vocab.get(w[i:j])
                        if s is not None and best[i][0] > _MINF:
                            tot = best[i][0] + s
                            if tot > b[0] or (tot == b[0] and i < b[1]):
                                b = (tot, i, w[i:j])
                    best[j] = b
                if best[n][0] <= _MINF:
                    no += 1
                    continue
                pos, k = n, 0
                while pos > 0:
                    k += 1
                    pos = best[pos][1]
                np_ += k
                sfp += best[n][0]
        out.append((nw, no, np_, sfp))
    return out


def test_unigram_segment_differential(spark):
    from raven_spark.operators.tokenizer import unigram_lm_train, unigram_segment

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id bigint, text string"
    )
    vocab_df = unigram_lm_train(
        df.select("text"), vocab_size=40, seed_size=60, max_piece_len=3,
        max_word_len=10, rounds=2,
    )
    got = {
        r["id"]: (r["n_words"], r["n_oov"], r["n_pieces"], r["sum_score_fp"])
        for r in unigram_segment(df, vocab_df).collect()
    }
    pv = {p: s for _, p, _, s in (tuple(r) for r in vocab_df.collect())}
    want = _py_segment_docs(_TEXTS, pv)
    assert len(got) == len(_TEXTS)
    for i, w in enumerate(want):
        assert got[i] == w, (i, got[i], w)
    # the corpus really exercises both OOV reasons: the long word in
    # _TEXTS[-1] is over the cap
    assert got[8][1] >= 1


def test_unigram_segment_unseen_char_is_oov(spark):
    from raven_spark.operators.tokenizer import unigram_lm_train, unigram_segment

    train = spark.createDataFrame([("abc abd abe",)], "text string")
    vocab = unigram_lm_train(train, vocab_size=20, seed_size=20, rounds=1)
    infer = spark.createDataFrame(
        [(1, "abc xyz"), (2, None), (3, "   ")],
        "doc_id bigint, text string",
    )
    got = {r["id"]: tuple(r)[1:] for r in unigram_segment(infer, vocab).collect()}
    # 'xyz' has chars the training corpus never saw -> OOV, not dropped
    assert got[1][0] == 2 and got[1][1] == 1
    assert got[2] == (0, 0, 0, 0)
    assert got[3] == (0, 0, 0, 0)


def test_bpe_encode_hand_case(spark):
    from raven_spark.operators.tokenizer import bpe_encode

    df = spark.createDataFrame(
        [(1, "abab abc"), (2, "zz")], "doc_id bigint, text string"
    )
    # merges: (a,b) then (ab,ab): 'abab' -> [abab]; 'abc' -> [ab, c]
    got = {
        r["id"]: (r["n_words"], r["n_tokens"], r["n_chars"])
        for r in bpe_encode(df, [("a", "b"), ("ab", "ab")]).collect()
    }
    assert got[1] == (2, 3, 7)  # [abab] + [ab, c]
    assert got[2] == (1, 2, 2)  # no rule touches 'zz'


def test_bpe_encode_roundtrip_with_learned_merges(spark):
    from raven_spark.operators.pipeline import bpe_merges
    from raven_spark.operators.tokenizer import bpe_encode

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS) if t], "doc_id bigint, text string"
    )
    rules = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_merges(df, steps=5).orderBy("step").collect()
    ]
    assert len(rules) == 5
    out = bpe_encode(df, rules).collect()
    for r in out:
        # merges only ever fuse: words <= tokens <= chars
        assert r["n_words"] <= r["n_tokens"] <= r["n_chars"]
    # zero merges = one token per char
    base = {r["id"]: r["n_chars"] for r in bpe_encode(df, []).collect()}
    for r in bpe_encode(df, []).collect():
        assert r["n_tokens"] == base[r["id"]]


def test_inference_hash_join_mode_matches_word_mode(spark):
    """join_key='hash' (production: text never shuffles) must be
    result-identical to the oracle-exact string join."""
    from raven_spark.operators.tokenizer import (
        bpe_encode,
        unigram_lm_train,
        unigram_segment,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id bigint, text string"
    )
    vocab = unigram_lm_train(df.select("text"), vocab_size=40, seed_size=60, rounds=1)
    a = sorted(map(tuple, unigram_segment(df, vocab).collect()))
    b = sorted(map(tuple, unigram_segment(df, vocab, join_key="hash").collect()))
    assert a == b
    rules = [("t", "h"), ("th", "e")]
    c = sorted(map(tuple, bpe_encode(df, rules).collect()))
    d = sorted(map(tuple, bpe_encode(df, rules, join_key="hash").collect()))
    assert c == d
    with pytest.raises(ValueError):
        unigram_segment(df, vocab, join_key="nope")
