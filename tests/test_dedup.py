"""Dedup family: exact, n-gram Jaccard, MinHash+LSH recall, SimHash,
embedding near-dup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

DOCS = [
    # near-identical cluster (whitespace/case variants -> exact dupes)
    (0, "The quick brown fox jumps over the lazy dog", "en"),
    (1, "the  quick Brown fox jumps   over the lazy dog", "en"),
    (2, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG", "en"),
    # near-dup (one word changed) -> high jaccard, not exact
    (3, "the quick brown fox jumps over the sleepy dog", "en"),
    # unrelated
    (4, "completely different content about spark engines and shuffles", "en"),
    (5, "another unrelated document mentioning bloom filters and queues", "en"),
    # cross-lang twin of 0 (blocked apart by lang)
    (6, "the quick brown fox jumps over the lazy dog", "de"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"]).persist()


def test_exact_dedup(docs, spark):
    from raven_spark.operators.dedup import exact_dedup, exact_dedup_strict

    out = {r["keep_id"]: r["dup_count"] for r in exact_dedup_strict(docs).collect()}
    assert out[0] == 4  # 0,1,2,6 collapse (text identity ignores lang); min id kept
    assert out[3] == 1 and out[4] == 1
    # hash-keyed variant agrees
    out2 = {r["keep_id"]: r["dup_count"] for r in exact_dedup(docs).collect()}
    assert out == out2


def test_ngram_jaccard_pairs(docs):
    from raven_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, block_cols=("lang",), threshold=0.3).collect()
    }
    assert pairs[(0, 1)] == 1.0 and pairs[(0, 2)] == 1.0  # exact dupes
    assert 0.3 <= pairs[(0, 3)] < 1.0  # near-dup
    assert (0, 4) not in pairs
    assert (0, 6) not in pairs  # lang block separates


def test_minhash_lsh_recall(docs):
    """LSH candidates must include every truly-similar pair (jaccard>=0.5
    here) — the S-curve guarantees it overwhelmingly at k=16,b=4."""
    from raven_spark.operators.dedup import minhash_lsh_candidates

    cand = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(docs).collect()}
    assert {(0, 1), (0, 2), (1, 2)} <= cand
    assert (0, 3) in cand  # j~0.6 pair found


def test_minhash_dedup_clusters(docs):
    from raven_spark.operators.dedup import minhash_dedup

    rep = {r["doc_id"]: r["cluster_id"] for r in minhash_dedup(docs, verify_threshold=0.9).collect()}
    assert rep[0] == rep[1] == rep[2] == 0  # exact cluster -> min id
    assert rep[4] == 4 and rep[5] == 5  # singletons survive
    # doc 6 is identical text but different lang — text-based: clusters with 0
    assert rep[6] == 0
    # near-dup 3 excluded at 0.9 verify threshold
    assert rep[3] == 3


def test_minhash_dedup_long_chain_fixpoint(spark):
    """A chain of 14 near-dup docs (each adjacent pair jaccard-similar,
    distant pairs dissimilar) must collapse into ONE cluster — the r2
    fixed-3-hop propagation silently split chains longer than 8; the
    fixpoint loop (neighbor-min + pointer-jump until no rep changes)
    must not."""
    from raven_spark.operators.dedup import minhash_dedup

    words = [f"w{i:02d}" for i in range(40)]
    docs = [
        (i, " ".join(words[i : i + 24]), "en") for i in range(14)
    ]  # adjacent overlap 23/24 words -> shingle jaccard ~0.9; d0 vs d13 share none
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
    rep = {
        r["doc_id"]: r["cluster_id"]
        for r in minhash_dedup(df, bands=8, verify_threshold=0.5).collect()
    }
    assert set(rep.values()) == {0}, rep  # single-link closure -> one cluster


def test_simhash_near_dup_buckets(docs):
    from raven_spark.operators.dedup import simhash_buckets

    rows = simhash_buckets(docs).collect()
    sig = {}
    buckets = {}
    for r in rows:
        sig[r["id"]] = r["simhash"]
        buckets.setdefault(r["id"], set()).add((r["band_id"], r["band_key"]))
    assert sig[0] == sig[1] == sig[2]  # normalization-insensitive? no — case differs
    # near-dup 3 shares at least one band with 0
    assert buckets[0] & buckets[3]
    # hamming distance between near-dups is small
    ham = bin((sig[0] ^ sig[3]) & ((1 << 64) - 1)).count("1")
    assert ham <= 12


def test_embedding_neardup(spark):
    from raven_spark.operators.dedup import embedding_neardup_pairs

    base = [0.1] * 8
    near = [0.1] * 7 + [0.12]
    far = [(-1.0) ** i * 0.3 for i in range(8)]
    df = spark.createDataFrame(
        [(0, base, 1), (1, near, 1), (2, far, 1), (3, base, 2)],
        ["vec_id", "embedding", "label"],
    )
    pairs = {
        (r["id_a"], r["id_b"]) for r in
        embedding_neardup_pairs(df, dim=8, threshold=0.95).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs
    assert (0, 3) not in pairs  # label block separates


def test_dup_span_dedup_keep_first_and_cover(spark):
    from raven_spark.operators.dedup import dup_span_dedup

    span = "alpha beta gamma delta epsilon"
    rows = [
        (1, f"intro words here {span} tail one"),
        (2, f"other start {span} closing two"),
        (3, f"{span} {span} pure repeat"),   # within-doc repeat counts too
        (4, "completely unrelated text piece"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dup_span_dedup(df, span_words=5, keep_first=True).collect()}
    # the lexicographically-first occurrence (doc 1) survives
    assert span in out[1]["clean_text"] and out[1]["n_covered"] == 0
    assert out[2]["clean_text"] == "other start closing two"
    assert out[2]["n_covered"] == 5
    assert out[3]["clean_text"] == "pure repeat" and out[3]["n_covered"] == 10
    assert out[4]["n_dup_starts"] == 0
    assert out[5]["clean_text"] == "" and out[5]["n_tokens"] == 1
    # remove-all variant strips every occurrence including the first
    out_all = {r["doc_id"]: r for r in
               dup_span_dedup(df, span_words=5, keep_first=False).collect()}
    assert out_all[1]["clean_text"] == "intro words here tail one"
    # partitioning independence (canonical pick is an aggregate, not order)
    out_p = {r["doc_id"]: r["clean_text"] for r in
             dup_span_dedup(df.repartition(7), span_words=5, keep_first=True).collect()}
    assert out_p == {k: v["clean_text"] for k, v in out.items()}


def test_semdedup_planted_clusters_vs_numpy(spark):
    """Differential vs a numpy twin on planted clusters: two tight
    directions with exact near-dups, plus an isotropic straggler. The
    lowest-id anchors (0 and 1) sit one per direction by construction."""
    import numpy as np

    from raven_spark.operators.dedup import semdedup

    rng = np.random.default_rng(11)
    a_dir = np.array([1.0, 0.0, 0.0, 0.0])
    b_dir = np.array([0.0, 1.0, 0.0, 0.0])
    vecs = {
        0: a_dir,                                  # anchor 0 (cluster A)
        1: b_dir,                                  # anchor 1 (cluster B)
        2: a_dir + 0.01 * rng.normal(size=4),      # near-dup of 0
        3: b_dir + 0.01 * rng.normal(size=4),      # near-dup of 1
        4: b_dir + 0.01 * rng.normal(size=4),      # near-dup of 1 and 3
        5: np.array([0.5, 0.5, 0.7, 0.1]),         # cluster-ambiguous, no dup
    }
    rows = [(i, [float(x) for x in v]) for i, v in vecs.items()]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r["vec_id"]: (r["cluster"], r["keep"])
           for r in semdedup(df, dim=4, n_clusters=2, threshold=0.95).collect()}

    def cos(x, y):
        x32 = np.asarray(x, dtype=np.float32).astype(np.float64)
        y32 = np.asarray(y, dtype=np.float32).astype(np.float64)
        return round(float(x32 @ y32 / (np.linalg.norm(x32) * np.linalg.norm(y32))), 6)

    expect = {}
    for i, v in vecs.items():
        sims = sorted(((cos(v, vecs[a]), -a) for a in (0, 1)), reverse=True)
        expect[i] = -sims[0][1]
    for i, (cl, _) in out.items():
        assert cl == expect[i], i
    dup = {
        i for i in vecs
        for j in vecs
        if j < i and expect[j] == expect[i] and cos(vecs[i], vecs[j]) >= 0.95
    }
    assert {i for i, (_, k) in out.items() if not k} == dup
    assert dup == {2, 3, 4}  # the planted near-dups, never the anchors


def test_semdedup_anchor_override_and_partitions(spark):
    import numpy as np

    from raven_spark.operators.dedup import semdedup

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    base = sorted(map(tuple, semdedup(df, dim=8, n_clusters=4, threshold=0.9).collect()))
    many = sorted(map(tuple, semdedup(df.repartition(9), dim=8, n_clusters=4,
                                      threshold=0.9).collect()))
    assert base == many and len(base) == 40
    # explicit anchors change the clustering but keep the contract
    anchors = spark.createDataFrame(
        [(100, rows[7][1]), (200, rows[13][1])], "aid bigint, avec array<float>"
    )
    out = semdedup(df, dim=8, n_clusters=99, threshold=0.9, anchors=anchors).collect()
    assert {r["cluster"] for r in out} <= {100, 200}
    assert len(out) == 40


def test_soft_dedup_weights(docs, spark):
    from raven_spark.operators.dedup import soft_dedup_weights

    out = {r["doc_id"]: (r["dup_count"], r["weight"]) for r in soft_dedup_weights(docs).collect()}
    assert len(out) == 7  # every doc kept — down-weighting, not removal
    for i in (0, 1, 2, 6):  # 4-way exact cluster
        assert out[i] == (4, 0.25)
    for i in (3, 4, 5):
        assert out[i] == (1, 1.0)
    # cluster-weight invariant: sum(weight) == number of distinct texts
    total = sum(w for _, w in out.values())
    assert abs(total - 4.0) < 1e-9

    # NULL and empty texts cluster together (documented identity)
    nulls = spark.createDataFrame(
        [(10, None), (11, ""), (12, "   "), (13, "x")], ["doc_id", "text"]
    )
    out2 = {r["doc_id"]: r["dup_count"] for r in soft_dedup_weights(nulls).collect()}
    assert out2 == {10: 3, 11: 3, 12: 3, 13: 1}


def test_cdc_chunk_dedup_counts_and_realignment(spark):
    from raven_spark.operators.dedup import cdc_chunk_dedup

    shared = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    )
    rows = [
        (0, shared),
        (1, shared),                       # exact duplicate -> all chunks dup
        (2, "PREFIXWORD " + shared),       # insertion: CDC re-aligns after 1 chunk
        (3, "entirely different words with no overlap whatsoever here"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in cdc_chunk_dedup(df, avg_chunk_words=4).collect()}

    assert len(out) == 6  # every doc present, incl. null/empty
    assert out[4]["n_chunks"] == 0 and out[4]["dup_chunk_frac"] == 0.0
    assert out[5]["n_chunks"] == 0 and out[5]["dup_chunk_frac"] == 0.0

    # exact duplicates share every chunk
    assert out[0]["n_chunks"] == out[1]["n_chunks"] >= 2
    assert out[0]["dup_chunk_frac"] == 1.0 and out[1]["dup_chunk_frac"] == 1.0

    # CDC property: a prefix insertion only corrupts the FIRST chunk —
    # boundaries depend on content, so later chunks re-align and stay
    # duplicated (a fixed-stride shingle would shift every window)
    assert out[2]["n_dup_chunks"] >= out[2]["n_chunks"] - 1 > 0

    # unrelated doc shares nothing
    assert out[3]["dup_chunk_frac"] == 0.0


def test_cdc_chunks_partition_invariance(spark):
    from raven_spark.operators.dedup import cdc_chunk_dedup

    words = ["w%d" % (i % 37) for i in range(300)]
    rows = [(i, " ".join(words[i % 7 :][: 40 + i % 23])) for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, cdc_chunk_dedup(df.repartition(1)).collect()))
    b = sorted(map(tuple, cdc_chunk_dedup(df.repartition(13)).collect()))
    assert a == b


def test_containment_pairs_asymmetric_and_hot_gram_block(spark):
    from raven_spark.operators.dedup import containment_pairs

    full = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    rows = [
        (0, full),
        (1, "alpha beta gamma delta epsilon zeta eta theta"),  # prefix of 0
        (2, "unrelated text about spark shuffles and broadcast joins today"),
        # hot boilerplate shared by many docs: every gram's df > max_df
        *[(10 + i, "same boiler plate words here") for i in range(8)],
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in containment_pairs(df, n=3, threshold=0.5, max_df=4).collect()
    }
    # doc 1 fully contained in doc 0: containment_a = 1.0, jaccard well below
    r01 = out[(0, 1)]
    assert r01["containment_b"] == 1.0          # |A∩B| / |B|, B is the prefix
    assert r01["containment_a"] < 0.5
    assert r01["jaccard"] == r01["containment_a"]  # A∪B = A when B ⊆ A
    # hot-gram contract: the 8-way boilerplate cluster (df=8 > max_df=4)
    # generates NO candidates — its overlap is pure boilerplate
    assert not any(ia >= 10 or ib >= 10 for ia, ib in out)
    assert (0, 2) not in out


def test_containment_pairs_partition_invariance(spark):
    from raven_spark.operators.dedup import containment_pairs

    # planted pairs: doc 2k+1 is a prefix of doc 2k, distinct vocab per pair
    rows = []
    for k in range(20):
        base = " ".join("p%d_%d" % (k, j) for j in range(20))
        rows.append((2 * k, base))
        rows.append((2 * k + 1, " ".join(base.split()[:8])))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, containment_pairs(df.repartition(1)).collect()))
    b = sorted(map(tuple, containment_pairs(df.repartition(13)).collect()))
    assert a == b and len(a) == 20


def test_containment_pairs_null_and_empty_cluster(spark):
    from raven_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   "), (3, "real content words here today")],
        "doc_id long, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["containment_a"]
        for r in containment_pairs(df, max_df=10).collect()
    }
    # NULL/empty/whitespace share the "" identity (engine convention)
    assert set(out) == {(0, 1), (0, 2), (1, 2)}
    assert all(v == 1.0 for v in out.values())


def test_minhash_contract_identical_disjoint_and_bound(spark):
    from raven_spark.operators.dedup import minhash_contract

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "the quick brown fox jumps over the lazy dog again today"),
            (3, "completely different words about spark shuffles and joins"),
            (4, "the quick brown fox jumps over the lazy dog again today "
                "with a small appended tail of extra words"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    out = {(r["id_a"], r["id_b"]): r for r in
           minhash_contract(docs, pairs, k=64).collect()}
    # identical docs: every permutation agrees, exact J = 1
    assert out[(1, 2)]["n_sig_match"] == 64
    assert out[(1, 2)]["est_jaccard"] == 1.0
    assert out[(1, 2)]["exact_jaccard"] == 1.0
    assert out[(1, 2)]["within_bound"]
    # disjoint shingle sets: exact 0, estimator within the bound of 0
    assert out[(1, 3)]["exact_jaccard"] == 0.0
    assert out[(1, 3)]["within_bound"]
    # containment-style pair: 0 < J < 1 and the estimate tracks it
    r = out[(1, 4)]
    assert 0.0 < r["exact_jaccard"] < 1.0
    assert r["within_bound"] and r["abs_err"] <= 0.3


def test_minhash_contract_partition_invariant(spark):
    from raven_spark.operators.dedup import minhash_contract

    docs = spark.range(40).selectExpr(
        "id as doc_id",
        "concat('w', id % 7, ' x', id % 5, ' y', id % 3, ' z', id % 11, "
        "' a', id % 13, ' b', id % 2) as text",
    )
    pairs = spark.range(39).selectExpr("id as id_a", "id + 1 as id_b")
    a = sorted(map(tuple, minhash_contract(docs, pairs, k=16).collect()))
    b = sorted(map(tuple,
                   minhash_contract(docs.repartition(9), pairs, k=16).collect()))
    assert a == b


def test_winnow_guarantee_and_density(spark):
    """Shared substring >= window+k-1 chars => >=1 shared fingerprint;
    density bounded; short docs fingerprint via the single spanning
    window; sub-k docs emit nothing."""
    from raven_spark.operators.dedup import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [
            (1, "AAA " + shared + " BBB"),
            (2, "zzz unrelated prefix " + shared),
            (3, "completely different content with no reuse at all"),
            (4, "tiny"),          # < k chars -> no rows
            (5, "exactly9ch"),    # just above k: single window
            (6, None),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df, k=8, window=4)
    rows = fps.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], set()).add(r["fp"])
    assert 4 not in by_id and 6 not in by_id
    assert len(by_id[5]) >= 1
    # detection guarantee on the shared 44-char substring
    assert by_id[1] & by_id[2]
    assert not (by_id[1] & by_id[3])
    # density: selections <= number of windows <= gram count
    n1 = len("aaa " + shared + " bbb")
    assert len(by_id[1]) <= n1 - 8 + 1


def test_winnow_rightmost_min_replay(spark):
    """Pin the exact selection against a pure-python replay of the same
    Horner/winnow arithmetic (the q139 oracle's contract)."""
    from raven_spark.operators.dedup import (
        _KMV_B,
        _KMV_MIX,
        _KMV_P,
        winnow_fingerprints,
    )

    text = "abab abab xyz abab"
    k, w = 5, 3
    norm = " ".join(text.lower().split())
    hs = []
    for i in range(len(norm) - k + 1):
        h = 0
        for c in norm[i : i + k]:
            h = (h * _KMV_B + ord(c)) % _KMV_P
        hs.append((h * _KMV_MIX) % _KMV_P)
    sel = set()
    nw = max(len(hs) - w + 1, 1)
    for t in range(nw):
        win = hs[t : t + w]
        m = min(win)
        pos = t + max(j for j, v in enumerate(win) if v == m)
        sel.add((pos + 1, m))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        (r["pos"], r["fp"])
        for r in winnow_fingerprints(df, k=k, window=w).collect()
    }
    assert got == sel


def test_winnow_overlap_pairs_partition_invariant(spark):
    from raven_spark.operators.dedup import winnow_overlap_pairs

    quote = "to be or not to be that is the question"
    rows = [(i, f"doc {i} filler text number {i*7} " + (quote if i % 3 == 0 else "")) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out1 = winnow_overlap_pairs(df, min_shared=1).collect()
    out2 = winnow_overlap_pairs(df.repartition(13), min_shared=1).collect()
    key = lambda r: (r["id_a"], r["id_b"])
    assert sorted(map(tuple, out1), key=lambda t: t[:2]) == sorted(
        map(tuple, out2), key=lambda t: t[:2]
    )
    # every quote-bearing pair shares fingerprints
    quoted = {i for i in range(30) if i % 3 == 0}
    got_pairs = {(r["id_a"], r["id_b"]) for r in out1}
    import itertools
    for a, b in itertools.combinations(sorted(quoted), 2):
        assert (a, b) in got_pairs


def test_incremental_dedup_statuses(spark):
    from raven_spark.operators.dedup import incremental_minhash_dedup

    base = "the quick brown fox jumps over the lazy dog near the riverbank today"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different corpus page about spark engines")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (101, base),                             # exact corpus dup
            (102, base + " tiny"),                   # near corpus dup
            (103, "a brand new page with fresh content about winnowing"),
            (104, "a brand new page with fresh content about winnowing"),  # intra-new dup
            (105, "totally unrelated solitary new document body text"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["status"], r["dup_of"])
        for r in incremental_minhash_dedup(corpus, new).collect()
    }
    assert out[101] == ("dup_of_corpus", 1)
    assert out[102] == ("dup_of_corpus", 1)
    assert out[103] == ("kept", None)
    assert out[104] == ("dup_of_new", 103)
    assert out[105] == ("kept", None)
    assert len(out) == 5


def test_incremental_dedup_partition_invariant_and_no_corpus_rescan(spark):
    from raven_spark.operators.dedup import incremental_minhash_dedup

    corpus = spark.createDataFrame(
        [(i, f"corpus doc {i} body words alpha beta gamma {i*3}") for i in range(40)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100 + i,
          f"corpus doc {i} body words alpha beta gamma {i*3}" if i % 2 == 0
          else f"new doc {i} completely fresh body {i*7}")
         for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, incremental_minhash_dedup(corpus, new).collect()))
    b = sorted(map(tuple, incremental_minhash_dedup(
        corpus.repartition(7), new.repartition(11)).collect()))
    assert a == b
    for i in range(40):
        row = next(t for t in a if t[0] == 100 + i)
        assert row[1] == ("dup_of_corpus" if i % 2 == 0 else "kept")


def test_winnow_shared_spans_localize_quote(spark):
    from raven_spark.operators.dedup import winnow_shared_spans

    quote = "we hold these truths to be self evident that all men are created equal"
    d1 = "opening words before the quote " + quote + " and some trailing words here"
    d2 = quote + " appears at the very start of this second document body"
    d3 = "no reuse in this document at all just original filler text content"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    spans = winnow_shared_spans(df, min_fps=2).collect()
    pair = [r for r in spans if r["id_a"] == 1 and r["id_b"] == 2]
    assert pair, spans
    best = max(pair, key=lambda r: r["n_fps"])
    # the dominant span must cover the quote region on both sides
    q1 = d1.lower().find(quote)
    assert best["start_a"] >= q1 - 2 and best["end_a"] <= q1 + len(quote) + 8
    assert best["start_b"] <= 8 and best["end_b"] <= len(quote) + 8
    # the recovered substrings agree
    sub1 = d1.lower()[best["start_a"] - 1 : best["end_a"]]
    sub2 = d2.lower()[best["start_b"] - 1 : best["end_b"]]
    assert sub1 == sub2
    assert not any(3 in (r["id_a"], r["id_b"]) for r in spans)
    # partition invariance
    again = winnow_shared_spans(df.repartition(5), min_fps=2).collect()
    assert sorted(map(tuple, spans)) == sorted(map(tuple, again))


def test_winnow_arrow_matches_column_impl(spark):
    """The vectorized kernel must be BIT-identical to the column-algebra
    spec on varied inputs (short docs, ties, long docs, unicode)."""
    import random

    from raven_spark.operators.dedup import winnow_fingerprints

    rng = random.Random(5)
    rows = [(0, None), (1, "tiny"), (2, "exactly9ch"),
            (3, "abab abab xyz abab"),
            (4, "x" * 200),  # degenerate: all grams identical (max ties)
            (25, "caf\u00e9 au lait et cr\u00e8me br\u00fbl\u00e9e pour tout le monde ici"),
            (26, "\u6f22\u5b57\u30c6\u30ad\u30b9\u30c8\u306e\u91cd\u8907\u691c\u51fa\u30c6\u30b9\u30c8\u884c \u3053\u308c\u306f\u9577\u3044\u6587\u66f8"),
            (27, "emoji \U0001f600 mixed \U0001f680 ascii text here and more")]
    for i in range(5, 25):
        n = rng.randint(10, 400)
        rows.append((i, " ".join(
            rng.choice(["alpha", "beta", "gamma", "delta", "the", "fox"])
            for _ in range(n // 5))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for kk, ww in [(8, 4), (5, 3), (2, 1)]:
        a = sorted(map(tuple, winnow_fingerprints(df, k=kk, window=ww, impl="arrow").collect()))
        c = sorted(map(tuple, winnow_fingerprints(df, k=kk, window=ww, impl="column").collect()))
        assert a == c, (kk, ww, a[:5], c[:5])
