"""Corpus-pipeline composition ops (operators/pipeline.py): deterministic
hash split, duplicate-n-gram repetition signal, composed clean verdict."""

from __future__ import annotations

from pyspark.sql import functions as F

from raven_spark.operators.pipeline import dup_ngram_frac, hash_split
from raven_spark.operators.pipeline_filters import clean_corpus


def test_hash_split_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df, val_permille=100, test_permille=50).collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(df.repartition(17), val_permille=100, test_permille=50).collect()}
    assert a == b  # order/partitioning independent
    # proportions roughly match the permilles (multiplicative hash mixes)
    from collections import Counter

    c = Counter(a.values())
    assert 0.07 < c["val"] / 5000 < 0.13
    assert 0.03 < c["test"] / 5000 < 0.07
    assert c["train"] == 5000 - c["val"] - c["test"]


def test_dup_ngram_frac_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e"),            # 4 distinct 2-grams -> 0.0
            (2, "a b a b a b"),          # 5 grams: {a b, b a} -> 3/5 dup
            (3, "x"),                    # shorter than n -> 0 grams, 0.0
            (4, ""),                     # empty -> 0.0
            (5, "w w w w"),              # 3 grams all 'w w' -> 2/3
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["dup_ngram_frac"]
           for r in dup_ngram_frac(df, n=2).collect()}
    assert out[1] == 0.0
    assert abs(out[2] - 3 / 5) < 1e-6
    assert out[3] == 0.0 and out[4] == 0.0
    assert abs(out[5] - 2 / 3) < 1e-6


def test_clean_corpus_reasons(spark):
    en = ("the cat and the dog went to the house and it is a fine day "
          "that is good for the walk in the park for everyone today")
    df = spark.createDataFrame(
        [
            (1, en),                          # keeps: en, decent quality
            (2, en),                          # exact dup of 1 -> not canonical
            (3, "der hund und die katze ist nicht hier und der tag ist gut"),  # de
            (4, "the the the the the the the the the the the the"),  # repetitive
            (5, "!!! ??? ,,, ;;; :::"),       # junk -> und + low quality
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r.asDict() for r in
           clean_corpus(df, allowed_langs=("en",), min_quality=0.3,
                        max_dup_frac=0.3, ngram_n=2).collect()}
    assert out[1]["keep"] is True and out[1]["is_canonical"] is True
    assert out[2]["keep"] is False and out[2]["is_canonical"] is False
    assert out[3]["keep"] is False and out[3]["lang_ok"] is False
    assert out[4]["keep"] is False and out[4]["rep_ok"] is False
    assert out[5]["keep"] is False
    assert out[5]["lang_pred"] == "und"


# --- host_boilerplate ----------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_host_boilerplate_flags_repeated_windows_within_host(spark):
    from raven_spark.operators.pipeline_filters import host_boilerplate

    chrome = "home about contact privacy terms sitemap login"  # exactly 7 words
    rows = [
        (1, chrome + " alpha beta gamma delta epsilon zeta eta", "hostA"),
        (2, chrome + " one two three four five six seven", "hostA"),
        (3, chrome + " red green blue cyan magenta yellow black", "hostA"),
        # same chrome on a DIFFERENT host: must not count toward hostA,
        # and 1 occurrence on hostB is below min_docs there
        (4, chrome + " solo page body text words here now", "hostB"),
    ]
    out = {r["id"]: r for r in host_boilerplate(
        _docs(spark, rows), window_words=7, min_docs=3).collect()}
    for i in (1, 2, 3):
        assert out[i]["n_units"] == 2
        assert out[i]["n_boiler"] == 1  # only the chrome window
        assert abs(out[i]["boiler_frac"] - 0.5) < 1e-9
    assert out[4]["n_boiler"] == 0


def test_host_boilerplate_counts_distinct_docs_not_occurrences(spark):
    from raven_spark.operators.pipeline_filters import host_boilerplate

    u = "aa bb cc dd ee ff gg"  # 7 words
    # one doc repeating the unit 3x is NOT host-boilerplate (1 distinct doc)
    rows = [(1, " ".join([u] * 3), "h")]
    out = host_boilerplate(_docs(spark, rows), window_words=7, min_docs=3).collect()
    assert out[0]["n_units"] == 3 and out[0]["n_boiler"] == 0


def test_host_boilerplate_partial_last_window_and_empty(spark):
    from raven_spark.operators.pipeline_filters import host_boilerplate

    rows = [(1, "only three words", "h"), (2, "   ", "h")]
    out = {r["id"]: r for r in host_boilerplate(
        _docs(spark, rows), window_words=7, min_docs=3).collect()}
    assert out[1]["n_units"] == 1  # partial window kept
    assert out[2]["n_units"] == 1  # whitespace-only -> one empty unit


# --- benchmark_contamination ---------------------------------------------------


def test_contamination_flags_shared_ngrams(spark):
    from raven_spark.operators.pipeline_filters import benchmark_contamination

    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog", "b")])
    corpus = _docs(spark, [
        (1, "intro words then the quick brown fox jumps over a fence", "c"),
        (2, "completely unrelated text about spark shuffles and joins ok", "c"),
        (3, "tiny doc", "c"),  # < n words -> 0 grams, clean
    ])
    out = {r["id"]: r for r in benchmark_contamination(
        corpus, bench, ngram_n=5, min_overlap=1).collect()}
    assert out[1]["contaminated"] and out[1]["n_overlap"] >= 1
    assert not out[2]["contaminated"] and out[2]["n_overlap"] == 0
    assert out[3]["n_grams"] == 0 and not out[3]["contaminated"]


def test_contamination_set_semantics(spark):
    from raven_spark.operators.pipeline_filters import benchmark_contamination

    g = "one two three four five"
    bench = _docs(spark, [(100, g, "b")])
    # corpus doc repeats the contaminated gram: distinct-gram counting
    # reports 1 overlap, not 3
    corpus = _docs(spark, [(1, " ".join([g] * 3), "c")])
    out = benchmark_contamination(corpus, bench, ngram_n=5, min_overlap=1).collect()
    assert out[0]["n_overlap"] == 1 and out[0]["contaminated"]


def test_pack_chunks_invariants(spark):
    """Packing invariants: offsets within a bucket are contiguous
    (start_offset = sum of earlier docs' tokens), chunk ids are
    floor(start/ctx), span counts cover the doc's token range, and the
    whole placement is partition-invariant."""
    from raven_spark.operators.pipeline import pack_chunks

    df = spark.range(500, numPartitions=7).selectExpr(
        "id as doc_id", "1 + pmod(xxhash64(id, 't'), 700) as n_tokens"
    )
    out = pack_chunks(df, ctx_len=512, n_buckets=8)
    rows = sorted(
        ((r["pack_bucket"], r["start_offset"], r["doc_id"], r["n_tokens"],
          r["chunk_id"], r["chunks_spanned"]) for r in out.collect())
    )
    # contiguity + correctness per bucket
    pos = {}
    for b, start, _id, n, chunk, span in rows:
        assert start == pos.get(b, 0), (b, start)
        assert chunk == start // 512
        assert span == (start + n - 1) // 512 - chunk + 1
        pos[b] = start + n
    # partition invariance
    again = pack_chunks(df.repartition(3), ctx_len=512, n_buckets=8)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))


def test_dedup_within_doc(spark):
    """Repeated 8-word windows inside one doc are removed (first
    occurrence wins, order preserved); distinct docs never interact;
    empty and single-word docs survive."""
    from raven_spark.operators.pipeline_filters import dedup_within_doc

    unit_a = "a b c d e f g h"
    unit_b = "i j k l m n o p"
    rows = [
        (1, f"{unit_a} {unit_b} {unit_a} {unit_b}"),  # halves repeat
        (2, unit_a),                                   # same text, other doc
        (3, "solo"),
        (4, "   "),
    ]
    out = {r["doc_id"]: r.asDict() for r in dedup_within_doc(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    assert out[1]["text_dedup"] == f"{unit_a} {unit_b}"
    assert out[1]["dropped_units"] == 2
    assert out[2]["text_dedup"] == unit_a and out[2]["dropped_units"] == 0
    assert out[3]["text_dedup"] == "solo" and out[3]["dropped_units"] == 0
    assert out[4]["text_dedup"] == "" and out[4]["dropped_units"] == 0


def test_dedup_within_doc_long_doc_linear(spark):
    """A 2.4k-unit document (the r3 quadratic-cliff regression: the old
    accumulator fold cost O(units^2) copies) dedups correctly and fast —
    the sort-based kernel is O(n log n) per row. Pattern: 1200 distinct
    units each repeated twice, interleaved; survivors are the 1200 firsts
    in order."""
    import time

    from raven_spark.operators.pipeline_filters import dedup_within_doc

    n = 1200
    units = [f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g w{i}h" for i in range(n)]
    text = " ".join(u for i in range(n) for u in (units[i], units[i]))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    t0 = time.time()
    row = dedup_within_doc(df).collect()[0]
    assert row["dropped_units"] == n
    assert row["text_dedup"] == " ".join(units)
    # generous wall bound: the quadratic fold took minutes here
    assert time.time() - t0 < 60


def test_unigram_logprob(spark):
    """Common-word docs outscore rare-word docs; empty docs score null;
    values are partition-invariant."""
    from raven_spark.operators.pipeline_filters import unigram_logprob

    rows = [(1, "the the the cat"), (2, "the cat"), (3, "zyx qwv"), (4, "  ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in unigram_logprob(df).collect()}
    # corpus: the x4, cat x2, zyx, qwv -> total 8
    import math
    exp1 = round((3 * math.log(4 / 8) + math.log(2 / 8)) / 4, 6)
    assert out[1]["avg_logprob"] == exp1 and out[1]["n_words"] == 4
    assert out[1]["avg_logprob"] > out[3]["avg_logprob"]  # fluent > gibberish
    assert out[4]["avg_logprob"] is None and out[4]["n_words"] is None
    again = {r["doc_id"]: r["avg_logprob"]
             for r in unigram_logprob(df.repartition(7)).collect()}
    assert all(again[k] == out[k]["avg_logprob"] for k in again)


def test_corpus_stats(spark):
    from raven_spark.operators.pipeline_lexical import corpus_stats

    rows = [("a", "one two three"), ("a", "one"), ("a", "one two"), ("b", "")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["group_key"]: r.asDict() for r in corpus_stats(df).collect()}
    assert out["a"]["n_docs"] == 3
    assert out["a"]["p50_tokens"] == 2.0      # tokens 1,2,3 -> median 2
    assert out["a"]["p90_tokens"] == 2.8      # linear interpolation
    assert out["b"]["p50_tokens"] == 0.0      # empty text -> 0 tokens


def test_ccnet_buckets_thirds_and_nulls(spark):
    """Head/middle/tail per group: thirds by score with interpolated
    cutoffs; null scores bucket to null; a sampled-cutoff run still
    assigns every row."""
    from raven_spark.operators.pipeline_filters import ccnet_buckets

    rows = [(i, "en", float(i)) for i in range(90)] + [
        (100, "en", None),
        (200, "de", 1.0),  # single-doc group: cutoffs degenerate -> head
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
    out = {r["doc_id"]: r["b"] for r in ccnet_buckets(
        df, score_col="s", group_col="lang", out_col="b"
    ).select("doc_id", "b").collect()}
    assert out[89] == "head" and out[60] == "head"
    assert out[45] == "middle"
    assert out[5] == "tail" and out[29] == "tail"
    assert out[100] is None
    assert out[200] == "head"
    # boundaries: 2/3 quantile of 0..89 = 59.33.. -> 59 is middle, 60 head
    assert out[59] == "middle" and out[30] == "middle"
    # sampled-cutoff path still labels all rows
    sampled = ccnet_buckets(
        df, score_col="s", group_col="lang", out_col="b", sample_fraction=0.5
    )
    got = sampled.where("s is not null").where("b is null").count()
    assert got == 0


def test_ccnet_buckets_sampled_out_group_falls_back(spark):
    """A group small enough to vanish from the sampled cutoffs still
    buckets every doc (exact fallback cutoffs), never a null language."""
    from raven_spark.operators.pipeline_filters import ccnet_buckets

    rows = [(i, "en", float(i)) for i in range(300)] + [
        (1000 + j, "is", float(j)) for j in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
    out = ccnet_buckets(
        df, score_col="s", group_col="lang", out_col="b",
        sample_fraction=0.05,
    )
    assert out.where("s is not null and b is null").count() == 0
    assert out.where("lang = 'is' and b is not null").count() == 3


def test_c4_filters_line_and_page_rules(spark):
    from raven_spark.operators.pipeline_filters import c4_filters

    rows = [
        # 10 lines; drops: 2-word line, no-terminal-punct line, the
        # javascript line (word match), the privacy-policy phrase line.
        (1, "This is a good long sentence one.\nShort.\n"
            "Another full sentence right here!\nno terminal punct line\n"
            "Please enable JavaScript to continue.\n"
            "We value your privacy policy terms.\n"
            "A third proper sentence stands here.\n"
            "A fourth proper sentence stands here.\n"
            "A fifth proper sentence stands here.\n"
            'A sixth quoted sentence ends so."'),
        (2, "Lorem Ipsum dolor sit amet sentence one.\n"
            "Two more words here today fine.\nAnd a third one right here.\n"
            "And a fourth one right here.\nAnd a fifth one right here."),
        (3, "var x = { a: 1 };\nGood sentence one is here today.\n"
            "Good sentence two is here today.\nGood sentence three is here today.\n"
            "Good sentence four is here today.\nGood sentence five is here today."),
        (4, None),
        (5, "One badword here in a sentence fine.\n"
            "Second sentence is here today now.\nThird sentence is here today now.\n"
            "Fourth sentence is here today now.\nFifth sentence is here today now."),
        # only 4 sentences after cleaning -> dropped by min_sentences
        (6, "Sentence number one is right here.\nSentence number two is right here.\n"
            "Sentence number three is right here.\nSentence number four is right here."),
    ]
    out = {
        r["doc_id"]: r
        for r in c4_filters(
            spark.createDataFrame(rows, "doc_id long, text string"),
            badwords=("badword",),
        ).collect()
    }
    r1 = out[1]
    assert r1["n_lines"] == 10 and r1["n_lines_kept"] == 6
    assert r1["n_sentences"] == 6  # 5 ./! lines + the '.' inside '."'
    assert r1["c4_keep"] is True
    kept_lines = r1["clean_text"].split("\n")
    assert "Short." not in kept_lines
    assert all("javascript" not in ln.lower() for ln in kept_lines)
    assert all("privacy policy" not in ln.lower() for ln in kept_lines)
    assert not out[2]["c4_keep"] and out[2]["has_lorem_ipsum"]
    assert not out[3]["c4_keep"] and out[3]["has_brace"]
    # NULL text behaves as the empty page: all-false flags, keep=false
    r4 = out[4]
    assert r4["n_lines"] == 0 and r4["clean_text"] == "" and r4["c4_keep"] is False
    assert r4["has_lorem_ipsum"] is False and r4["has_badword"] is False
    assert not out[5]["c4_keep"] and out[5]["has_badword"]
    assert not out[6]["c4_keep"] and out[6]["n_sentences"] == 4


def test_c4_filters_badword_is_token_match(spark):
    from raven_spark.operators.pipeline_filters import c4_filters

    rows = [(1, "The scunthorpe problem is a classic sentence.\n" * 5)]
    out = c4_filters(
        spark.createDataFrame(rows, "doc_id long, text string"),
        badwords=("thorpe",),  # substring of a token must NOT hit
    ).first()
    assert out["has_badword"] is False and out["c4_keep"] is True


def test_line_dedup_corpus_drops_cross_doc_units_in_order(spark):
    from raven_spark.operators.pipeline_filters import line_dedup_corpus

    rows = [
        (1, "unique alpha content line\nCopyright Example Corp\nmore unique body text"),
        (2, "Copyright Example Corp\nsecond doc own words\nCookie banner accept all"),
        (3, "Cookie banner accept all\nCopyright Example Corp\nthird doc original stuff"),
        (4, None),
        (5, "  \n\nCopyright Example Corp\n"),
        # repeated WITHIN one doc only -> n_distinct_docs == 1 -> kept
        (6, "solo repeated line\nsolo repeated line\nsolo body"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup_corpus(df, min_docs=2).collect()}
    assert out[1]["clean_text"] == "unique alpha content line\nmore unique body text"
    assert out[2]["clean_text"] == "second doc own words"
    assert (out[3]["n_units"], out[3]["n_dup_units"]) == (3, 2)
    assert out[4]["clean_text"] == "" and out[4]["n_units"] == 0
    assert out[5]["clean_text"] == "" and out[5]["n_dup_units"] == 1
    assert out[6]["clean_text"].count("solo repeated line") == 2  # intra-doc kept
    # partitioning independence
    out2 = {r["doc_id"]: r["clean_text"]
            for r in line_dedup_corpus(df.repartition(7), min_docs=2).collect()}
    assert out2 == {k: v["clean_text"] for k, v in out.items()}


def test_line_dedup_corpus_window_mode(spark):
    from raven_spark.operators.pipeline_filters import line_dedup_corpus

    rows = [(1, "a b c d a b"), (2, "a b x y"), (3, "z z z z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           line_dedup_corpus(df, min_docs=2, window_words=2).collect()}
    assert out[1]["clean_text"] == "c d"        # both 'a b' positions removed
    assert out[2]["clean_text"] == "x y"
    assert out[3]["clean_text"] == "z z z z"    # single-doc unit survives


def test_benchmark_contamination_bloom_sidecar_is_exact(spark):
    """The Bloom path prunes probe volume but must be RESULT-identical:
    no false negatives by the Bloom property, false positives killed by
    the exact verify join."""
    from raven_spark.operators.pipeline_filters import benchmark_contamination

    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(1, "intro quick brown fox jumps over ending words"),
         (2, "totally different content with no shared grams at all"),
         (3, "the quick brown fox jumps over the lazy dog verbatim copy"),
         (4, "short")],
        "doc_id long, text string",
    )
    plain = {r["id"]: (r["n_grams"], r["n_overlap"], r["contaminated"])
             for r in benchmark_contamination(corpus, bench).collect()}
    bloomed = {r["id"]: (r["n_grams"], r["n_overlap"], r["contaminated"])
               for r in benchmark_contamination(
                   corpus, bench, bloom_fpp=0.01).collect()}
    assert bloomed == plain
    assert plain[3][2] is True and plain[2][2] is False
    # hint path skips the sizing count and still agrees
    hinted = {r["id"]: (r["n_grams"], r["n_overlap"], r["contaminated"])
              for r in benchmark_contamination(
                  corpus, bench, bloom_fpp=0.01, bench_grams_hint=64).collect()}
    assert hinted == plain


def test_tfidf_topk_values_and_ranking(spark):
    import math

    from raven_spark.operators.pipeline_lexical import tfidf_topk

    rows = [
        (1, "apple apple banana cherry"),
        (2, "banana cherry cherry cherry"),
        (3, "apple durian durian"),
        (4, "   "),  # whitespace-only: excluded from N and output
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_topk(df, k=2)
    rows_out = {(r["id"], r["rank"]): r for r in out.collect()}
    # N=3; df: apple 2, banana 2, cherry 2, durian 1
    # doc1: apple tf2*ln(3/2)=0.810930, banana/cherry tf1*ln(3/2)
    r11 = rows_out[(1, 1)]
    assert r11["term"] == "apple" and r11["tf"] == 2 and r11["df"] == 2
    assert abs(r11["tfidf"] - 2 * math.log(3 / 2)) < 1e-6
    # tie between banana and cherry at rank 2 -> term asc
    assert rows_out[(1, 2)]["term"] == "banana"
    # doc3: durian tf2*ln(3/1) beats apple tf1*ln(3/2)
    assert rows_out[(3, 1)]["term"] == "durian"
    assert abs(rows_out[(3, 1)]["tfidf"] - 2 * math.log(3)) < 1e-6
    assert (4, 1) not in rows_out
    assert max(r for (_, r) in rows_out) <= 2


def test_bigram_logprob_orders_and_nulls(spark):
    from raven_spark.operators.pipeline_lexical import bigram_logprob

    base = "the cat sat on the mat"
    rows = [
        (1, base),
        (2, base),                      # same prose: same score
        (3, "mat the on sat cat the"),  # same words, shuffled order
        (4, "single"),                  # < 2 words -> null
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_logprob(df, lam=0.9).collect()}
    assert out[1]["avg_logprob2"] == out[2]["avg_logprob2"]
    # the bigram model sees word order: shuffled prose scores lower
    assert out[3]["avg_logprob2"] < out[1]["avg_logprob2"]
    assert out[1]["n_bigrams"] == 5
    assert out[4]["n_bigrams"] == 0 and out[4]["avg_logprob2"] is None
    assert out[5]["n_bigrams"] == 0 and out[5]["avg_logprob2"] is None


def test_bm25_topk_against_pure_python(spark):
    """Differential: bm25_topk vs a pure-Python BM25 (Lucene idf,
    k1=1.2, b=0.75) on a tiny corpus with repeated terms, a doc-length
    spread, and a query term that misses every document."""
    import math
    from collections import Counter

    from raven_spark.operators.pipeline_lexical import bm25_topk

    docs = {
        1: "apple banana apple",
        2: "banana cherry",
        3: "apple apple apple apple durian",
        4: "elderberry",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    q = spark.createDataFrame(
        [(0, "apple banana"), (1, "cherry missingterm")],
        "query_id int, query string",
    )
    got = {
        (r["query_id"], r["id"]): (r["score"], r["rank"])
        for r in bm25_topk(df, q, k=3).collect()
    }

    toks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfreq = Counter(term for t in toks.values() for term in set(t))
    expect = {}
    for qid, qtext in [(0, "apple banana"), (1, "cherry missingterm")]:
        scores = {}
        for i, t in toks.items():
            tf = Counter(t)
            s = 0.0
            for term in dict.fromkeys(qtext.split()):
                if tf[term] == 0:
                    continue
                idf = math.log(1 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
                s += idf * tf[term] * 2.2 / (
                    tf[term] + 1.2 * (0.25 + 0.75 * len(t) / avgdl)
                )
            if s > 0.0:
                scores[i] = round(s, 6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rk, (i, s) in enumerate(ranked, 1):
            expect[(qid, i)] = (s, rk)
    assert got == expect
    # the all-miss doc (4) never appears; missingterm contributes nothing
    assert not any(i == 4 for (_, i) in got)


def test_bm25_topk_partition_invariance(spark):
    from raven_spark.operators.pipeline_lexical import bm25_topk

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = spark.createDataFrame([(0, "spark table join")], "query_id int, query string")
    one = sorted(map(tuple, bm25_topk(df.coalesce(1), q, k=5).collect()))
    many = sorted(map(tuple, bm25_topk(df.repartition(9), q, k=5).collect()))
    assert one == many and len(one) == 5


def test_bm25_topk_repeated_query_term_weights(spark):
    """Repeating a term in the query string multiplies its contribution
    by the occurrence count (the docstring's weighting recipe — it used
    to be silently collapsed by a distinct); laziness: plan construction
    runs no eager corpus count."""
    import math
    from collections import Counter

    from raven_spark.operators.pipeline_lexical import bm25_topk

    docs = {1: "apple banana", 2: "banana banana cherry", 3: "apple apple"}
    df = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    q = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "apple banana")],
        "query_id int, query string",
    )
    got = {
        (r["query_id"], r["id"]): r["score"]
        for r in bm25_topk(df, q, k=3).collect()
    }

    toks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfreq = Counter(term for t in toks.values() for term in set(t))

    def contrib(term, i):
        tf = Counter(toks[i])[term]
        if tf == 0:
            return 0.0
        idf = math.log(1 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(toks[i]) / avgdl))

    for i in docs:
        weighted = round(2 * contrib("apple", i) + contrib("banana", i), 6)
        flat = round(contrib("apple", i) + contrib("banana", i), 6)
        if weighted:
            assert got[(0, i)] == weighted
        if flat:
            assert got[(1, i)] == flat
    # the doubled term strictly outranks where it matters: doc 3 (pure
    # apple) beats doc 2 (banana-heavy) under q0 but not necessarily q1
    assert got[(0, 3)] > got[(0, 2)]


def test_phrase_search_semantics(spark):
    from raven_spark.operators.pipeline_lexical import phrase_search

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "beta  GAMMA beta gamma beta gamma"),  # overlaps + case/ws norm
            (2, "alpha delta"),
            (3, None),
            (4, ""),
            (5, "beta gamma"),
        ],
        "doc_id int, text string",
    )
    ph = spark.createDataFrame(
        [
            (0, "beta gamma"),
            (1, "alpha"),
            (2, "gamma beta gamma"),
            (3, "absent words only"),
        ],
        "phrase_id int, phrase string",
    )
    out = {
        (r["phrase_id"], r["id"]): (r["n_hits"], r["rank"])
        for r in phrase_search(docs, ph, k=10).collect()
    }
    # consecutive-only: doc 0 has beta gamma once; doc 1 three times
    # (positions 0, 2, 4 after normalization); doc 5 once
    assert out[(0, 1)] == (3, 1)
    assert out[(0, 0)] == (1, 2) and out[(0, 5)] == (1, 3)  # tie -> id asc
    # single-term phrase counts every occurrence
    assert out[(1, 0)] == (1, 1) and out[(1, 2)] == (1, 2)
    # 3-term phrase spanning overlapping repeats: "gamma beta gamma"
    # occurs at positions 1 and 3 of doc 1
    assert out[(2, 1)] == (2, 1)
    # absent phrase -> no rows; null/empty docs never match
    assert not any(p == 3 for p, _ in out)
    assert not any(d in (3, 4) for _, d in out)


def test_phrase_search_k_bound_and_partition_invariance(spark):
    from raven_spark.operators.pipeline_lexical import phrase_search

    docs = spark.createDataFrame(
        [(i, "x y " * (i % 5 + 1)) for i in range(40)], "doc_id int, text string"
    )
    ph = spark.createDataFrame([(0, "x y")], "phrase_id int, phrase string")
    out = phrase_search(docs, ph, k=7).collect()
    assert len(out) == 7
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(range(1, 8))
    # best docs are the ones with the most repeats, ties by id
    best = sorted(out, key=lambda r: r["rank"])[0]
    assert best["n_hits"] == 5 and best["id"] == 4

    a = sorted(map(tuple, phrase_search(docs.repartition(1), ph, k=7).collect()))
    b = sorted(map(tuple, phrase_search(docs.repartition(11), ph, k=7).collect()))
    assert a == b


def test_phrase_search_single_exchange_plan(spark):
    from raven_spark.operators.pipeline_lexical import phrase_search

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "b c d")], "doc_id int, text string"
    )
    ph = spark.createDataFrame([(0, "b c")], "phrase_id int, phrase string")
    jdf = phrase_search(docs, ph)._jdf
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = jdf.queryExecution().explainString(mode)
    # the corpus-side postings (id, pos, term) must cross exactly ONE
    # exchange — the repartition(id) that serves BOTH aggregates. The
    # other exchanges are query-sized (phrase-term distinct, top-k
    # window), never corpus-sized.
    postings_exchanges = [
        blk for blk in plan.split("\n\n")
        if blk.startswith("(") and "Exchange" in blk.split("\n")[0]
        and "pos#" in blk
    ]
    assert len(postings_exchanges) == 1, plan


def test_heavy_hitters_exact_regime_matches_groupby(spark):
    from raven_spark.operators.pipeline_sketches import heavy_hitters

    rows = [(i, f"apple banana {'apple ' * (i % 3)}cherry") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = [(r["term"], r["term_count"], r["rank"])
           for r in heavy_hitters(df, k=3, capacity=1000).collect()]
    # exact counts: apple 60 + 60 extra (i%3 avg 1), banana 60, cherry 60
    from pyspark.sql import functions as F
    from raven_spark.operators.dedup import norm_text_col
    exact = (
        df.select(F.explode(F.split(norm_text_col(F.col("text")), " ")).alias("term"))
        .groupBy("term").count()
        .orderBy(F.col("count").desc(), F.col("term").asc())
        .collect()
    )
    want = [(r["term"], r["count"], i + 1) for i, r in enumerate(exact[:3])]
    assert got == want

    # partition-invariant in the exact regime
    a = heavy_hitters(df.repartition(1), k=3, capacity=1000).collect()
    b = heavy_hitters(df.repartition(13), k=3, capacity=1000).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_heavy_hitters_eviction_regime_mg_guarantee(spark):
    from raven_spark.operators.pipeline_sketches import heavy_hitters

    # one majority term among 30 distinct noise terms, capacity 8:
    # evictions happen, but the majority term must survive with
    # count >= true - N/(capacity+1)
    text = " ".join(["big"] * 200 + [f"noise{i}" for i in range(30)])
    df = spark.createDataFrame([(0, text)], "doc_id bigint, text string").repartition(1)
    got = {r["term"]: r["term_count"] for r in heavy_hitters(df, k=5, capacity=8).collect()}
    n_tokens = 230
    assert "big" in got
    assert got["big"] >= 200 - n_tokens // 9
    assert got["big"] <= 200


def test_heavy_hitters_skips_null_and_empty(spark):
    from raven_spark.operators.pipeline_sketches import heavy_hitters

    df = spark.createDataFrame(
        [(0, None), (1, "   "), (2, "x y  x")], "doc_id bigint, text string"
    )
    got = [(r["term"], r["term_count"]) for r in heavy_hitters(df, k=10).collect()]
    assert got == [("x", 2), ("y", 1)]


def test_filter_funnel_single_pass_accounting(spark):
    from pyspark.sql import functions as F
    from raven_spark.operators.pipeline_funnel import filter_funnel

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, None), (5, 50)], "id bigint, v bigint"
    )
    out = filter_funnel(
        df,
        [
            ("v_not_null", F.col("v").isNotNull()),   # drops id=4
            ("v_ge_20", F.col("v") >= 20),            # drops id=1
            ("v_le_30", F.col("v") <= 30),            # drops id=5
        ],
    ).orderBy("stage").collect()
    got = [(r["stage"], r["rule"], r["n_in"], r["n_dropped"], r["n_out"]) for r in out]
    assert got == [
        (1, "v_not_null", 5, 1, 4),
        (2, "v_ge_20", 4, 1, 3),
        (3, "v_le_30", 3, 1, 2),
    ]
    # first-fail attribution: a row failing several rules counts only
    # at its first
    out2 = filter_funnel(df, [("ge_20", F.col("v") >= 20), ("ne_10", F.col("v") != 10)])
    rows = {r["rule"]: r["n_dropped"] for r in out2.collect()}
    assert rows == {"ge_20": 2, "ne_10": 0}  # id=1 and null both fail stage 1

    import pytest as _pytest
    with _pytest.raises(ValueError):
        filter_funnel(df, [])


def test_term_dictionary_dense_frequency_ranked_ids(spark):
    from raven_spark.operators.pipeline_lexical import term_dictionary

    df = spark.createDataFrame(
        [(0, "b b b a a c"), (1, "a c d"), (2, None), (3, "  ")],
        "doc_id bigint, text string",
    )
    got = {r["term"]: (r["term_count"], r["term_id"])
           for r in term_dictionary(df).collect()}
    # counts: a=3, b=3, c=2, d=1 -> order (count desc, term asc)
    assert got == {"a": (3, 1), "b": (3, 2), "c": (2, 3), "d": (1, 4)}

    # dense, total, partition-invariant; prefix_len deepening changes nothing
    ids = sorted(v[1] for v in got.values())
    assert ids == [1, 2, 3, 4]
    alt = {r["term"]: r["term_id"]
           for r in term_dictionary(df.repartition(7), prefix_len=2).collect()}
    assert alt == {t: i for t, (_, i) in got.items()}


def test_pmi_collocations_ranking_and_floor(spark):
    from raven_spark.operators.pipeline_lexical import pmi_collocations

    df = spark.createDataFrame(
        [
            (0, "strong tea strong tea strong tea"),
            (1, "tea cup tea cup tea cup"),
            (2, "strong tea again"),
            (3, None),
            (4, "   "),
        ],
        "doc_id bigint, text string",
    )
    out = pmi_collocations(df, min_count=3, k=10).collect()
    pairs = {(r["w1"], r["w2"]): (r["pair_count"], r["pmi"]) for r in out}
    # floored pairs only: every surviving pair co-occurs >= 3 times
    assert all(c >= 3 for c, _ in pairs.values())
    assert ("strong", "tea") in pairs and ("tea", "cup") in pairs
    # hand-check one PMI: W=15 tokens, P=12 bigrams, c(tea)=7, c(cup)=3
    import math

    c_xy, _ = pairs[("tea", "cup")]
    assert c_xy == 3
    expect = round(math.log2((3 * 15 * 15) / (7 * 3 * 12)), 6)
    assert abs(pairs[("tea", "cup")][1] - expect) < 1e-9

    # partition-invariant (counts are content-determined)
    alt = {
        (r["w1"], r["w2"]): (r["pair_count"], r["pmi"])
        for r in pmi_collocations(df.repartition(7), min_count=3, k=10).collect()
    }
    assert alt == pairs


def test_stuffing_signals_exact_counts_and_entropy(spark):
    import math

    from raven_spark.operators.pipeline_filters import stuffing_signals

    df = spark.createDataFrame(
        [
            (0, "Buy " * 40 + "now"),       # 41 tokens, 40x 'buy'
            (1, "all distinct words here"),
            (2, None),
            (3, "aaBB"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in stuffing_signals(df).collect()}
    r0 = got[0]
    assert (r0["n_tokens"], r0["top_token"]) == (41, "buy")
    assert abs(r0["top_token_frac"] - round(40 / 41, 6)) < 1e-9
    assert r0["stuffed"] is True                      # 40*100 >= 41*8
    r1 = got[1]
    assert r1["top_token_frac"] == 0.25 and r1["stuffed"] is False
    assert got[2]["n_tokens"] == 0 and got[2]["stuffed"] is False
    # entropy of normalized "aabb": 2 chars x2 -> log2(4) - (2*1+2*1)/4 = 1.0
    assert abs(got[3]["char_entropy"] - 1.0) < 1e-9
    # entropy of a uniform 4-char doc vs hand formula on doc 1
    t = "all distinct words here"
    from collections import Counter

    c = Counter(t)
    n = len(t)
    expect = round(math.log2(n) - sum(v * math.log2(v) for v in c.values()) / n, 6)
    assert abs(got[1]["char_entropy"] - expect) < 1e-6


def test_bpe_merges_hand_sequence(spark):
    from raven_spark.operators.pipeline import bpe_merges

    # vocab: 'low' x5, 'lower' x2, 'newest' x6  (classic BPE example shape)
    df = spark.createDataFrame(
        [(0, "low " * 5 + "lower " * 2 + "newest " * 6)],
        "doc_id bigint, text string",
    )
    out = bpe_merges(df, steps=3).orderBy("step").collect()
    got = [(r["step"], r["left_sym"], r["right_sym"], r["pair_count"]) for r in out]
    # step 1: 'we' rides both 'lower' (2) and 'newest' (6) -> 8, the max
    assert got[0] == (1, "w", "e", 8)
    # step 2: after fusing 'we', 'lo' (7 = low x5 + lower x2) leads
    assert got[1] == (2, "l", "o", 7)
    # step 3: 6-count tie {(e,we),(n,e),(s,t),(we,s)} -> smallest left 'e'
    assert got[2] == (3, "e", "we", 6)


def test_bpe_merges_overlapping_run_fuses_left_to_right(spark):
    from raven_spark.operators.pipeline import bpe_merges

    # 'aaa': pairs (a,a) x2, but fusing is non-overlapping left-to-right:
    # after merge 1 the word is (aa)(a), so step 2's best is (aa, a)
    df = spark.createDataFrame([(0, "aaa aaa")], "doc_id bigint, text string")
    out = bpe_merges(df, steps=2).orderBy("step").collect()
    assert (out[0]["left_sym"], out[0]["right_sym"], out[0]["pair_count"]) == ("a", "a", 4)
    assert (out[1]["left_sym"], out[1]["right_sym"], out[1]["pair_count"]) == ("aa", "a", 2)


def test_bpe_merge_never_crosses_symbol_boundaries(spark):
    """Regression: after step 1 fuses (a,b), step 2's (b,c) rule must not
    reach inside the fused 'ab' symbol of 'abc' (a bare l+SEP+r replace
    did, erasing the (ab,c) pair). With this corpus the corruption flips
    step 3's winner, so the output itself catches it."""
    from raven_spark.operators.pipeline import bpe_merges

    text = "ab " * 30 + "abc " * 20 + "zbc " * 13 + "wbc " * 13
    df = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
    out = bpe_merges(df, steps=3).orderBy("step").collect()
    got = [(r["step"], r["left_sym"], r["right_sym"], r["pair_count"]) for r in out]
    assert got[0] == (1, "a", "b", 50)
    assert got[1] == (2, "b", "c", 26)   # zbc + wbc only; abc's b is fused
    # correct impl: 'abc' is still (ab, c) -> 20 beats (z,bc)/(w,bc) at 13
    assert got[2] == (3, "ab", "c", 20)


def test_approx_distinct_contract_bounds_and_exact(spark):
    from raven_spark.operators.pipeline_sketches import approx_distinct_contract

    rows = [(f"h{i % 3}", f"/p/{i % 50}") for i in range(300)]
    df = spark.createDataFrame(rows, "host string, url string")
    got = {r["host"]: r for r in
           approx_distinct_contract(df, "host", "url").collect()}
    assert len(got) == 3
    for h, r in got.items():
        # each host sees a subset of the 50 urls; exact count is exact
        assert 0 < r["n_distinct"] <= 50
        assert r["within_bound"] is True
    # exact counts: host h0 gets urls i%50 for i%3==0 -> 50 distinct? no:
    # i in 0..299, i%3==0 -> 100 values, i%50 spans all residues -> 50
    assert got["h0"]["n_distinct"] == 50


def test_zipf_fit_exact_power_law(spark):
    # Corpus engineered so term t_r appears round(64 / r) times for
    # rank r in 1..8 -> log-log regression recovers slope ~ -1.
    from raven_spark.operators.pipeline_lexical import zipf_fit

    import math

    docs = []
    did = 0
    for r in range(1, 9):
        for _ in range(round(64 / r)):
            docs.append((did, f"t{r:02d}"))
            did += 1
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    row = zipf_fit(df, min_count=2, max_rank=100).collect()[0]
    assert row["n_terms"] == 8
    # exact OLS on (ln r, ln round(64/r)) computed independently
    xs = [math.log(r) for r in range(1, 9)]
    ys = [math.log(round(64 / r)) for r in range(1, 9)]
    n = 8.0
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    assert abs(row["slope"] - round(slope, 6)) < 1e-6
    assert -1.05 < row["slope"] < -0.9
    assert 0.99 < row["r2"] <= 1.0


def test_zipf_fit_bigrams_and_min_count(spark):
    from raven_spark.operators.pipeline_lexical import zipf_fit

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x y"), (3, None), (4, "  ")],
        "doc_id bigint, text string",
    )
    # bigrams with multiplicity: 'a b' x3, 'b a' x1, 'b c' x1, 'b x' x1,
    # 'x y' x1 -> only 'a b' survives min_count=2
    row = zipf_fit(df, min_count=2, max_rank=10, ngram_n=2).collect()[0]
    assert row["n_terms"] == 1
    # single point: OLS degenerates (varx = 0) -> slope NULL, not a crash
    assert row["slope"] is None


def test_good_turing_known_spectrum(spark):
    # 3 hapaxes, 2 doubletons, 1 tripleton:
    #   n_1=3, n_2=2, n_3=1 -> c*_1 = 2*2/3, c*_2 = 3*1/2, c*_3 = NULL
    from raven_spark.operators.pipeline_lexical import good_turing

    text = " ".join(["h1", "h2", "h3"] + ["d1", "d2"] * 2 + ["t1"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    rows = good_turing(df, max_c=5).collect()
    got = {r["c"]: r for r in rows}
    assert got[1]["n_c"] == 3 and abs(got[1]["gt_estimate"] - round(4 / 3, 6)) < 1e-9
    assert got[2]["n_c"] == 2 and abs(got[2]["gt_estimate"] - 1.5) < 1e-9
    assert got[3]["n_c"] == 1 and got[3]["gt_estimate"] is None
    assert 4 not in got and 5 not in got


def test_good_turing_gap_yields_null_estimate(spark):
    # counts 1 and 3 present, 2 absent: c*_1 must be NULL (not computed
    # against n_3), and c=3's next row is absent entirely.
    from raven_spark.operators.pipeline_lexical import good_turing

    text = " ".join(["a", "b"] + ["z"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    got = {r["c"]: r for r in good_turing(df, max_c=10).collect()}
    assert got[1]["n_c"] == 2 and got[1]["gt_estimate"] is None
    assert got[3]["n_c"] == 1 and got[3]["gt_estimate"] is None


def test_domain_diversity_known_distribution(spark):
    # domain A: 'x' x2 + 'y' x1 + 'z' x1 -> H = 1.5 bits, types 3/4;
    # domain B: single type -> entropy 0.0 (not -0.0), norm NULL.
    import math

    from raven_spark.operators.pipeline_lexical import domain_diversity

    df = spark.createDataFrame(
        [(1, "A", "x x y z"), (2, "B", "w w w")],
        "doc_id bigint, dom string, text string",
    )
    got = {r["domain"]: r for r in domain_diversity(df, "dom").collect()}
    a = got["A"]
    assert (a["n_tokens"], a["n_types"]) == (4, 3)
    assert abs(a["ttr"] - 0.75) < 1e-9
    expect = round(
        round(-(0.5) * math.log2(0.5), 9) * 1
        + round(-(0.25) * math.log2(0.25), 9) * 2,
        6,
    )
    assert abs(a["entropy"] - expect) < 1e-9
    assert abs(a["norm_entropy"] - round(a["entropy"] / math.log2(3), 6)) < 1e-6
    b = got["B"]
    assert (b["n_tokens"], b["n_types"]) == (3, 1)
    assert b["entropy"] == 0.0 and str(b["entropy"]) == "0.0"
    assert b["norm_entropy"] is None


def test_domain_diversity_partition_invariant(spark):
    from raven_spark.operators.pipeline_lexical import domain_diversity

    df = spark.createDataFrame(
        [(i, f"d{i % 3}", f"tok{i % 7} tok{i % 5} tok{i % 11} common")
         for i in range(60)],
        "doc_id bigint, dom string, text string",
    )
    a = sorted(map(tuple, domain_diversity(df, "dom").collect()))
    b = sorted(map(tuple, domain_diversity(df.repartition(13), "dom").collect()))
    assert a == b


def test_term_burstiness_exact_ratios(spark):
    # 'topic' appears 3+2 times in its 2 docs -> burstiness 2.5,
    # adaptation 1.0; 'the' once in each of 3 docs -> 1.0 / 0.0;
    # 'rare' df=1 -> dropped by min_df=2.
    from raven_spark.operators.pipeline_lexical import term_burstiness

    df = spark.createDataFrame(
        [
            (1, "topic topic topic the"),
            (2, "topic topic the rare"),
            (3, "the filler words"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["term"]: r for r in term_burstiness(df, min_df=2, k=10).collect()}
    assert "rare" not in got
    t = got["topic"]
    assert (t["doc_freq"], t["total_count"]) == (2, 5)
    assert abs(t["burstiness"] - 2.5) < 1e-9 and t["adaptation"] == 1.0
    th = got["the"]
    assert (th["doc_freq"], th["total_count"]) == (3, 3)
    assert th["burstiness"] == 1.0 and th["adaptation"] == 0.0
    # ordering: burstiness desc puts 'topic' first
    ordered = term_burstiness(df, min_df=2, k=10).collect()
    assert ordered[0]["term"] == "topic"


def test_shard_skew_uniform_vs_hot_key(spark):
    from raven_spark.operators.pipeline_sketches import shard_skew

    uniform = spark.createDataFrame([(i,) for i in range(4000)], "k bigint")
    hot = spark.createDataFrame([(0,)] * 3900 + [(i,) for i in range(100)], "k bigint")
    u = shard_skew(uniform, "k", n_shards=16).collect()[0]
    h = shard_skew(hot, "k", n_shards=16).collect()[0]
    assert u["total_rows"] == 4000 and u["n_shards"] == 16
    assert u["max_share"] < 0.12 and u["gini"] < 0.15
    # 3900/4000 rows share one key -> one shard holds >= 97.5%
    assert h["max_share"] >= 0.975 and h["gini"] > 0.8 and h["cov"] > u["cov"]


def test_shard_skew_gini_hand_computed(spark):
    # 4 shards, loads [0, 0, 1, 3] (keys chosen by probing the mix):
    # exact G = 2*(3*1 + 4*3)/(4*4) - 5/4 = 30/16 - 20/16 = 0.625
    from raven_spark.operators.pipeline import _CMS_A, _CMS_P
    from raven_spark.operators.pipeline_sketches import shard_skew

    # find keys hitting desired shards under the real mix
    def shard_of(k, n=4):
        return ((k % _CMS_P) * _CMS_A[0] % _CMS_P) % n

    ks = {}
    for k in range(1000):
        ks.setdefault(shard_of(k), []).append(k)
    a, b = sorted(ks)[0], sorted(ks)[1]
    rows = [(ks[a][0],)] * 3 + [(ks[b][0],)]
    df = spark.createDataFrame(rows, "k bigint")
    r = shard_skew(df, "k", n_shards=4).collect()[0]
    assert (r["n_used"], r["total_rows"]) == (2, 4)
    assert abs(r["gini"] - 0.625) < 1e-9
    assert abs(r["max_share"] - 0.75) < 1e-9


def test_ks_group_drift_hand_computed(spark):
    # group A = {1,2} inside corpus {1,2,10,11,12,13}: D = |1 - 2/6| = 2/3
    from raven_spark.operators.pipeline_sketches import ks_group_drift

    rows = [("A", 1), ("A", 2)] + [("B", x) for x in (10, 11, 12, 13)]
    df = spark.createDataFrame(rows, "g string, v int")
    got = {r["group"]: r for r in ks_group_drift(df, "g", "v", min_n=2).collect()}
    import math

    a = got["A"]
    assert a["n_group"] == 2
    assert abs(a["ks_stat"] - round(2 / 3, 6)) < 1e-9
    assert abs(a["ks_scaled"] - round(2 / 3 * math.sqrt(2 * 6 / 8), 6)) < 1e-6
    # B holds the complementary mass: F_B(9.99...) = 0 vs F_c = 2/6
    assert abs(got["B"]["ks_stat"] - round(2 / 6, 6)) < 1e-9


def test_ks_group_drift_identical_distribution_near_zero(spark):
    # every group IS the corpus shape -> part-vs-whole KS ~ 0
    from raven_spark.operators.pipeline_sketches import ks_group_drift

    rows = [(f"g{g}", v) for g in range(4) for v in range(50)]
    df = spark.createDataFrame(rows, "g string, v int")
    for r in ks_group_drift(df, "g", "v").collect():
        assert r["ks_stat"] < 1e-9


def test_ks_group_drift_partition_invariant_and_min_n(spark):
    from raven_spark.operators.pipeline_sketches import ks_group_drift

    rows = [(f"g{i % 3}", (i * 7) % 23) for i in range(90)] + [("tiny", 1)]
    df = spark.createDataFrame(rows, "g string, v int")
    a = sorted(map(tuple, ks_group_drift(df, "g", "v").collect()))
    b = sorted(map(tuple, ks_group_drift(df.repartition(11), "g", "v").collect()))
    assert a == b
    assert all(t[0] != "tiny" for t in a)


def test_bloom_contract_no_false_negatives_and_bound(spark):
    from raven_spark.operators.pipeline_sketches import bloom_contract

    members = spark.createDataFrame([(i * 2,) for i in range(500)], "k bigint")
    probes = spark.createDataFrame([(i * 2 + 1,) for i in range(500)], "k bigint")
    r = bloom_contract(members, probes, "k", m_bits=8192, k_hashes=3).collect()[0]
    assert r["n_members"] == 500 and r["n_probes"] == 500
    assert 0 < r["n_bits_set"] <= min(3 * 500, 8192)
    assert r["within_bound"]
    # members probed against their own filter must ALL pass (no false
    # negatives — the Bloom invariant)
    self_probe = bloom_contract(members, members, "k", m_bits=8192, k_hashes=3).collect()[0]
    assert self_probe["measured_fpr"] == 1.0


def test_bloom_contract_tiny_filter_saturates(spark):
    # m=8 bits with 500 members saturates the filter -> every probe
    # passes, expected_fpr ~ 1.0, so the bound still holds (honestly).
    from raven_spark.operators.pipeline_sketches import bloom_contract

    members = spark.createDataFrame([(i,) for i in range(500)], "k bigint")
    probes = spark.createDataFrame([(i + 1000,) for i in range(100)], "k bigint")
    r = bloom_contract(members, probes, "k", m_bits=8, k_hashes=2).collect()[0]
    assert r["measured_fpr"] == 1.0 and r["expected_fpr"] == 1.0 and r["within_bound"]


def test_dup_ngram_frac_null_text_scores_zero(spark):
    # the zip-shift kernel rewrite must keep the old transform form's
    # empty-array-on-NULL guarantee: NULL text -> 0 n-grams / 0.0 frac
    # (q31 oracle contract), never NULL (which would flip clean_corpus's
    # rep_ok verdict to NULL under ANSI three-valued logic)
    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["dup_ngram_frac"] for r in dup_ngram_frac(df, n=2).collect()}
    assert out[1] == 0.4  # "a b c a b c": 5 bigrams, 3 distinct -> 2/5
    assert out[2] == 0.0
    assert out[3] == 0.0
    rows = {r["id"]: r for r in clean_corpus(df).collect()}
    assert rows[2]["rep_ok"] is True and rows[2]["keep"] is not None
    assert rows[3]["rep_ok"] is True and rows[3]["keep"] is not None


def test_shard_skew_null_keys_and_string_rejection(spark):
    import pytest

    from raven_spark.operators.pipeline_sketches import shard_skew

    df = spark.createDataFrame(
        [(None,)] * 10 + [(int(i),) for i in range(100)], "k long"
    )
    row = shard_skew(df, "k", n_shards=8).collect()[0]
    # NULL keys land in a concrete shard: no phantom NULL group
    assert row["n_used"] <= 8
    assert row["total_rows"] == 110
    sdf = spark.createDataFrame([("x",)], "k string")
    with pytest.raises(ValueError, match="xxhash64"):
        shard_skew(sdf, "k")


def test_bloom_contract_single_job_counts(spark):
    from raven_spark.operators.pipeline_sketches import bloom_contract

    members = spark.range(0, 400, 2).withColumnRenamed("id", "k")
    probes = spark.range(1, 400, 2).withColumnRenamed("id", "k")
    row = bloom_contract(members, probes, "k", m_bits=4096, k_hashes=3).collect()[0]
    assert row["n_members"] == 200
    assert row["n_probes"] == 200
    assert 0 < row["n_bits_set"] <= min(3 * 200, 4096)
    assert row["within_bound"] in (True, False)


def test_mirror_hosts_pairs_cap_and_scores(spark):
    from raven_spark.operators.pipeline import mirror_hosts

    rows = []
    # hosts A and B share keys 1..4; C shares nothing real
    for k in (1, 2, 3, 4):
        rows += [("A", k), ("B", k)]
    rows += [("A", 100), ("B", 200), ("C", 300), ("C", 301)]
    # boilerplate key on every host: dropped by the cap (max 2 hosts)
    rows += [("A", -1), ("B", -1), ("C", -1)]
    df = spark.createDataFrame(rows, "host string, content_key long")
    out = mirror_hosts(df, min_shared=3, max_hosts_per_key=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["host_a"], r["host_b"]) == ("A", "B")
    assert r["n_shared"] == 4
    # sizes INCLUDE the boilerplate key (6 each), so J = 4/(6+6-4)
    assert r["n_a"] == 6 and r["n_b"] == 6
    assert abs(r["jaccard"] - 0.5) < 1e-9
    assert abs(r["containment"] - 4 / 6) < 1e-6


def test_calibration_bins_hand_computed(spark):
    from raven_spark.operators.pipeline import calibration_bins

    df = spark.createDataFrame(
        [(0.05, 0), (0.05, 1), (0.15, 0), (0.95, 1), (1.0, 1)],
        "score double, label int",
    )
    out = {r["bin"]: r for r in calibration_bins(df, n_bins=10).collect()}
    assert set(out) == {0, 1, 9}  # score=1.0 closes into the last bin
    assert out[0]["n"] == 2 and out[0]["confidence"] == 0.05
    assert out[0]["accuracy"] == 0.5 and out[0]["gap"] == 0.45
    assert abs(out[0]["contribution"] - 0.18) < 1e-9
    assert out[1]["n"] == 1 and out[1]["gap"] == 0.15
    assert out[9]["n"] == 2 and out[9]["accuracy"] == 1.0
    # ECE = sum of contributions
    assert abs(sum(r["contribution"] for r in out.values())
               - (0.18 + 0.03 + 0.01)) < 1e-9


def test_calibration_bins_rejects_out_of_range_scores(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from raven_spark.operators.pipeline import calibration_bins

    df = spark.createDataFrame([(1.5, 1)], "score double, label int")
    with pytest.raises(SparkRuntimeException, match="out of"):
        calibration_bins(df).collect()


def test_chunk_documents_windows_and_edges(spark):
    from raven_spark.operators.pipeline import chunk_documents

    ten = " ".join(f"w{i}" for i in range(10))
    eleven = " ".join(f"w{i}" for i in range(11))
    four = "a b c d"
    five = "a b c d e"
    df = spark.createDataFrame(
        [(1, ten), (2, eleven), (3, four), (4, five), (5, ""), (6, None),
         (7, "  Multi   space\ttokens  ")],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_id"]): r
        for r in chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    }
    # m=10, C=4, S=3 -> K=3: starts 0,3,6; full coverage, tail n_tok=4
    assert [rows[(1, k)]["start_tok"] for k in range(3)] == [0, 3, 6]
    assert rows[(1, 2)]["n_tok"] == 4
    assert rows[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[(1, 1)]["chunk_text"] == "w3 w4 w5 w6"
    assert (1, 3) not in rows
    # m=11 -> K=4, tail start 9 < m with n_tok 2
    assert rows[(2, 3)]["start_tok"] == 9 and rows[(2, 3)]["n_tok"] == 2
    assert rows[(2, 3)]["chunk_text"] == "w9 w10"
    # m=C -> exactly one chunk
    assert rows[(3, 0)]["n_tok"] == 4 and (3, 1) not in rows
    # m=C+1 -> two chunks, tail covers the orphan token with overlap
    assert rows[(4, 1)]["start_tok"] == 3 and rows[(4, 1)]["chunk_text"] == "d e"
    # empty and NULL docs emit nothing
    assert not any(d in (5, 6) for d, _ in rows)
    # whitespace normalization matches the dedup identity
    assert rows[(7, 0)]["chunk_text"] == "multi space tokens"
    # every token of doc 2 is covered by some window
    covered = set()
    for k in range(4):
        r = rows[(2, k)]
        covered |= set(range(r["start_tok"], r["start_tok"] + r["n_tok"]))
    assert covered == set(range(11))


def test_chunk_documents_shuffle_free_and_invariant(spark):
    from raven_spark.operators.pipeline import chunk_documents

    df = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(i % 23))) for i in range(80)],
        "doc_id long, text string",
    )
    plan = (
        chunk_documents(df, chunk_tokens=8, overlap=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    one = {tuple(r) for r in chunk_documents(df.coalesce(1), chunk_tokens=8, overlap=2).collect()}
    many = {tuple(r) for r in chunk_documents(df.repartition(13), chunk_tokens=8, overlap=2).collect()}
    assert one == many


def test_chunk_documents_rejects_bad_params(spark):
    import pytest as _pytest

    from raven_spark.operators.pipeline import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0, overlap=0)


def test_domain_score_normalize_hand_computed(spark):
    from raven_spark.operators.pipeline import domain_score_normalize

    df = spark.createDataFrame(
        [
            (1, "a", 0.1), (2, "a", 0.5), (3, "a", 0.5), (4, "a", 0.9),
            (5, "b", 0.7),                  # singleton domain
            (6, "c", 0.4), (7, "c", 0.4),   # zero-variance domain
            (8, None, 0.3), (9, "a", None), # NULL passthroughs
        ],
        "doc_id long, source string, score double",
    )
    rows = {r["doc_id"]: r for r in domain_score_normalize(df).collect()}
    # domain a: ranks 1,2,2,4 over n=4 -> pct (rk-1)/3
    assert rows[1]["pct_rank"] == 0.0
    assert rows[2]["pct_rank"] == rows[3]["pct_rank"] == round(1 / 3, 6)
    assert rows[4]["pct_rank"] == 1.0
    # domain a moments: mean 0.5, var = E[x^2]-mean^2 = 0.08
    import math

    mean, var = 0.5, (0.01 + 0.25 + 0.25 + 0.81) / 4 - 0.25
    assert rows[1]["z"] == round((0.1 - mean) / math.sqrt(var), 6)
    assert rows[4]["z"] == round((0.9 - mean) / math.sqrt(var), 6)
    assert rows[2]["z"] == 0.0
    # singleton: pct 0, z NULL (var 0)
    assert rows[5]["pct_rank"] == 0.0 and rows[5]["z"] is None
    # zero-variance domain: z NULL, both rows pct 0 (tied rank 1)
    assert rows[6]["z"] is None and rows[6]["pct_rank"] == 0.0
    # NULL group/score pass through unnormalized
    assert rows[8]["pct_rank"] is None and rows[8]["n_domain"] is None
    assert rows[9]["pct_rank"] is None and rows[9]["score"] is None
    assert rows[1]["n_domain"] == 4


def test_domain_score_normalize_partition_invariant(spark):
    from raven_spark.operators.pipeline import domain_score_normalize

    df = spark.createDataFrame(
        [(i, f"d{i % 5}", (i * 37 % 100) / 100.0) for i in range(200)],
        "doc_id long, source string, score double",
    )
    one = {tuple(r) for r in domain_score_normalize(df.coalesce(1)).collect()}
    many = {tuple(r) for r in domain_score_normalize(df.repartition(11)).collect()}
    assert one == many


def test_tokenizer_fertility_hand_computed(spark):
    from raven_spark.operators.pipeline import tokenizer_fertility

    df = spark.createDataFrame(
        [
            (1, "en", "hello world"),         # 2 words, 2 subwords, 11 ch
            (2, "en", "it's 2024!"),          # 2 words, subwords: it 's 2024? -> [a-z]+ 'it', punct "'", 's', '202','4','!'
            (3, "de", "Donaudampfschiff"),    # 1 word 1 subword 16 ch
            (4, "de", None),                  # NULL text counts as zero-length doc
            (5, None, "dropped"),             # NULL group excluded
            (6, "zz", ""),                    # empty text group
        ],
        "doc_id long, lang string, text string",
    )
    rows = {r["lang"]: r for r in tokenizer_fertility(df).collect()}
    en = rows["en"]
    assert en["n_docs"] == 2 and en["n_chars"] == 11 + 10
    assert en["n_words"] == 4
    # doc2 subwords: it, ', s, 202, 4, ! = 6; doc1 = 2
    assert en["n_subwords"] == 8
    assert en["tokens_per_word"] == 2.0
    assert en["chars_per_token"] == round(21 / 8, 6)
    de = rows["de"]
    assert de["n_docs"] == 2 and de["n_words"] == 1 and de["n_subwords"] == 1
    assert de["chars_per_token"] == 16.0
    assert "zz" in rows and rows["zz"]["n_subwords"] == 0
    assert rows["zz"]["chars_per_token"] is None  # try_divide by zero
    assert None not in rows and len(rows) == 3
    # multi-byte text: bytes > chars
    df2 = spark.createDataFrame([(1, "fr", "café")], "doc_id long, lang string, text string")
    r2 = tokenizer_fertility(df2).collect()[0]
    assert r2["n_bytes"] == 5 and r2["n_chars"] == 4


def test_tokenizer_fertility_partition_invariant(spark):
    from raven_spark.operators.pipeline import tokenizer_fertility

    df = spark.createDataFrame(
        [(i, f"l{i % 3}", f"word{i} and text {i}!") for i in range(120)],
        "doc_id long, lang string, text string",
    )
    one = {tuple(r) for r in tokenizer_fertility(df.coalesce(1)).collect()}
    many = {tuple(r) for r in tokenizer_fertility(df.repartition(9)).collect()}
    assert one == many


def test_mixture_diversity_uniform_and_skewed(spark):
    import math

    from raven_spark.operators.pipeline_lexical import mixture_diversity

    uniform = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(400)], "doc_id long, source string"
    )
    r = mixture_diversity(uniform).collect()[0]
    assert r["n_groups"] == 4 and r["total_mass"] == 400
    assert abs(r["eff_groups"] - 4.0) < 1e-6
    assert abs(r["hhi"] - 0.25) < 1e-6
    assert abs(r["top1_share"] - 0.25) < 1e-6
    # heavy skew: one group owns 90%
    skewed = spark.createDataFrame(
        [(i, "big" if i < 900 else f"s{i % 10}") for i in range(1000)],
        "doc_id long, source string",
    )
    r2 = mixture_diversity(skewed).collect()[0]
    assert r2["top1_share"] == 0.9
    assert r2["eff_groups"] < 2.0  # behaves like fewer than 2 sources
    # token-mass weighting: same docs, mass concentrated elsewhere
    massy = spark.createDataFrame(
        [(1, "a", 900), (2, "b", 50), (3, "c", 50), (4, None, 10**6)],
        "doc_id long, source string, n_tokens long",
    )
    r3 = mixture_diversity(massy, size_col="n_tokens").collect()[0]
    assert r3["total_mass"] == 1000 and r3["top1_share"] == 0.9
    # pure-python entropy replay
    ps = [0.9, 0.05, 0.05]
    eff = math.exp(-sum(p * math.log(p) for p in ps))
    assert abs(r3["eff_groups"] - round(eff, 6)) < 1e-6


def test_curation_funnel_stages_and_docs(spark):
    from raven_spark.operators.pipeline_funnel import curation_funnel

    good = ("This is a good english sentence with many words today. "
            "Here is another full sentence that also ends properly. "
            "The corpus needs quality text to survive the filters. "
            "A fourth sentence keeps the page over the minimum. "
            "And the fifth sentence completes the requirement.")
    lines = good.replace(". ", ".\n")
    corpus = spark.createDataFrame(
        [
            (1, lines),                       # survives everything
            (2, lines),                       # exact dup of 1 -> dropped at dedup
            (3, "short junk"),                # fails c4 (no sentences)
            (4, lines + "\nder die das und der die das hier ist."),  # still en overall
            (5, lines.replace("english", "contaminated marker phrase zone")),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "benchmark has contaminated marker phrase zone sentence inside")],
        "doc_id long, text string",
    )
    funnel = {r["name"]: r for r in curation_funnel(corpus, bench).collect()}
    assert funnel["input"]["rows_out"] == 5
    assert funnel["c4_clean"]["rows_out"] == 4       # doc 3 dropped
    assert funnel["exact_dedup"]["rows_in"] == funnel["quality"]["rows_out"]
    # doc 2 is an exact dup of doc 1
    assert funnel["exact_dedup"]["rows_out"] == funnel["exact_dedup"]["rows_in"] - 1
    # doc 5 shares the planted 5-gram with bench
    assert funnel["decontaminate"]["rows_out"] == funnel["exact_dedup"]["rows_out"] - 1
    docs = curation_funnel(corpus, bench, emit="docs").collect()
    ids = sorted(r["doc_id"] for r in docs)
    assert 1 in ids and 2 not in ids and 3 not in ids and 5 not in ids
    assert len(ids) == funnel["decontaminate"]["rows_out"]
    # partition invariance
    f2 = {r["name"]: r["rows_out"] for r in
          curation_funnel(corpus.repartition(7), bench).collect()}
    assert f2 == {k: v["rows_out"] for k, v in funnel.items()}
