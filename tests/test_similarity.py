"""Similarity search: brute-force exactness, LSH/IVF recall + speed shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").persist()


def _exact_topk_numpy(emb_rows, qvec, k):
    ids = np.array([r["vec_id"] for r in emb_rows])
    mat = np.stack([np.array(r["embedding"], dtype=np.float64) for r in emb_rows])
    q = np.array(qvec, dtype=np.float64)
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -np.round(sims, 6)))
    return [int(ids[i]) for i in order[:k]]


def test_brute_force_matches_numpy(embeddings):
    from raven_spark.operators.similarity import brute_force_topk

    rows = embeddings.collect()
    qvec = [float(x) for x in rows[0]["embedding"]]
    rest = [r for r in rows if r["vec_id"] != rows[0]["vec_id"]]
    want = _exact_topk_numpy(rest, qvec, 10)
    got = [
        r["vec_id"]
        for r in brute_force_topk(
            embeddings.filter(F.col("vec_id") != rows[0]["vec_id"]), qvec, k=10
        ).collect()
    ]
    assert got == want


def test_lsh_topk_recall_planted(spark):
    """LSH's contract is that NEAR vectors collide: plant 15 true
    near-neighbors of the query among 500 random background vectors;
    multi-probe LSH top-10 must recover most of the exact top-10.
    (On uniformly random data neighbors are near-orthogonal and any
    sublinear index degrades to chance — that is not the operator's
    contract, so it is not what we assert.)"""
    from raven_spark.operators.similarity import lsh_topk

    rng = np.random.RandomState(7)
    q = rng.randn(64)
    q /= np.linalg.norm(q)
    planted = [(1000 + i, (q + 0.03 * rng.randn(64)).tolist()) for i in range(15)]
    background = [(i, rng.randn(64).tolist()) for i in range(500)]
    df = spark.createDataFrame(planted + background, ["vec_id", "embedding"])
    rows = df.collect()
    exact = set(_exact_topk_numpy(rows, q.tolist(), 10))
    assert exact <= {1000 + i for i in range(15)}  # planted dominate the top-10
    approx = {
        r["vec_id"]
        for r in lsh_topk(df, q.tolist(), k=10, n_planes=6, multiprobe=7).collect()
    }
    assert len(exact & approx) >= 8


def test_probe_buckets_margin_order():
    """Multiprobe flips the most MARGINAL bits first: with projections
    (+5, -0.1, +3, -0.2), probe #2 must flip bit 1 (margin .1), #3 bit 3
    (.2), #4 bits 1+3 (.3), before any bucket touching bits 0/2."""
    from raven_spark.operators.similarity import probe_buckets

    qproj = np.array([5.0, -0.1, 3.0, -0.2])
    qb = 0b0101  # sign bits
    probes = probe_buckets(qproj, 4, 5)
    assert probes[0] == qb
    assert probes[1] == qb ^ 0b0010
    assert probes[2] == qb ^ 0b1000
    assert probes[3] == qb ^ 0b1010
    assert probes[4] in (qb ^ 0b0100, qb ^ 0b0001)  # next-cheapest single bit (3.0)
    assert len(set(probes)) == 5


def test_lsh_bucket_determinism(embeddings):
    from raven_spark.operators.similarity import with_lsh_buckets

    a = {r["vec_id"]: r["bucket"] for r in with_lsh_buckets(embeddings).collect()}
    b = {r["vec_id"]: r["bucket"] for r in with_lsh_buckets(embeddings.repartition(7)).collect()}
    assert a == b
    assert 0 <= min(a.values()) and max(a.values()) < 256


def test_ivf_topk_recall_planted(spark):
    from raven_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(11)
    q = rng.randn(64)
    q /= np.linalg.norm(q)
    planted = [(1000 + i, (q + 0.03 * rng.randn(64)).tolist()) for i in range(15)]
    background = [(i, rng.randn(64).tolist()) for i in range(500)]
    df = spark.createDataFrame(planted + background, ["vec_id", "embedding"])
    rows = df.collect()
    exact = set(_exact_topk_numpy(rows, q.tolist(), 10))
    approx = {
        r["vec_id"]
        for r in ivf_topk(df, q.tolist(), k=10, n_anchors=8, nprobe=3).collect()
    }
    assert len(exact & approx) >= 7


def test_bitext_margin_prefers_specific_match_over_hub(spark):
    """The Artetxe & Schwenk ratio margin's point: a 'hub' target close
    to EVERY source is normalized by its own (high) neighborhood
    average, so dedicated matches keep winning and the hub's margin is
    depressed (margin(s0, hub) < 1 < margin(s0, t1) here, while both
    cosines are positive and the hub is every source's #2)."""
    from raven_spark.operators.similarity import bitext_margin_pairs

    # 4-dim toy: hub = normalized all-ones (cos ~0.5+ with everything);
    # t_i = axis-aligned match for s_i with a small common component
    def v(*xs):
        return [float(x) for x in xs]

    src = spark.createDataFrame(
        [(0, v(1, 0.2, 0.2, 0.2)), (2, v(0.2, 1, 0.2, 0.2)),
         (4, v(0.2, 0.2, 1, 0.2)), (6, v(0.2, 0.2, 0.2, 1))],
        "vec_id bigint, embedding array<float>",
    )
    tgt = spark.createDataFrame(
        [(1, v(1, 0.1, 0.1, 0.1)), (3, v(0.1, 1, 0.1, 0.1)),
         (5, v(0.1, 0.1, 1, 0.1)), (7, v(1, 1, 1, 1))],  # 7 = hub
        "vec_id bigint, embedding array<float>",
    )
    out = {r["src_id"]: r for r in
           bitext_margin_pairs(src, tgt, k=2, dim=4).collect()}
    # every source appears exactly once (forward mining)
    assert sorted(out) == [0, 2, 4, 6]
    # s0/s2/s4 pick their dedicated targets, not the hub
    assert out[0]["tgt_id"] == 1
    assert out[2]["tgt_id"] == 3
    assert out[4]["tgt_id"] == 5
    # margins are the ratio score: > 1 means better than your neighborhood
    assert out[0]["margin"] > 1.0


def test_bitext_margin_partition_invariance(spark):
    from raven_spark.operators.similarity import bitext_margin_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    one = sorted(map(tuple, bitext_margin_pairs(
        src.coalesce(1), tgt.coalesce(1), k=4).collect()))
    many = sorted(map(tuple, bitext_margin_pairs(
        src.repartition(7), tgt.repartition(5), k=4).collect()))
    assert one == many and len(one) == src.count()


def test_bitext_margin_zero_denominator_defines_margin_zero(spark):
    """Orthogonal one-hot embeddings: every cosine is exactly 0, so both
    k-NN averages are 0 and the ratio is 0/0 — the convention defines
    margin = 0.0 (deterministic, SQL-replayable) instead of an
    engine-dependent NULL/NaN."""
    from raven_spark.operators.similarity import bitext_margin_pairs

    src = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    tgt = spark.createDataFrame(
        [(1, [0.0, 0.0, 1.0, 0.0]), (3, [0.0, 0.0, 0.0, 1.0])],
        "vec_id bigint, embedding array<float>",
    )
    rows = bitext_margin_pairs(src, tgt, k=2, dim=4).collect()
    assert sorted(r["src_id"] for r in rows) == [0, 2]
    for r in rows:
        assert r["margin"] == 0.0  # not None
        assert r["cosine"] == 0.0
        assert r["tgt_id"] == 1  # tie-break: lowest tgt_id


def test_quantize_embeddings_roundtrip_and_zero_vector(spark):
    from raven_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [
            (1, [1.0, -0.5, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),
            (3, None),
        ],
        "vec_id bigint, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert set(got) == {1, 2}  # null filtered
    r1 = got[1]
    assert abs(r1["scale"] - 1.0 / 127.0) < 1e-12
    assert r1["q"] == [127, -64, 32, 0]  # -63.5 rounds away from zero
    assert r1["rms_err"] < 0.005
    r2 = got[2]
    assert r2["scale"] == 0.0 and r2["q"] == [0, 0, 0, 0] and r2["rms_err"] == 0.0


def test_kmeans_lloyd_separates_planted_clusters(spark):
    from raven_spark.operators.similarity import kmeans_lloyd

    # two tight planted blobs in 4-d; k=2, ids 0/1 land one in each blob
    rows = []
    for i in range(10):
        rows.append((2 * i, [10.0 + 0.01 * i, 10.0, 0.0, 0.0]))
        rows.append((2 * i + 1, [-10.0, -10.0 - 0.01 * i, 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {r["vec_id"]: r["cluster"] for r in
           kmeans_lloyd(df, k=2, iterations=2, dim=4).collect()}
    evens = {got[i] for i in range(0, 20, 2)}
    odds = {got[i] for i in range(1, 20, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds

    # partition-invariant: fixed-point sums kill float-order drift
    alt = {r["vec_id"]: r["cluster"] for r in
           kmeans_lloyd(df.repartition(7), k=2, iterations=2, dim=4).collect()}
    assert alt == got


def test_kmeans_empty_cluster_keeps_centroid(spark):
    from raven_spark.operators.similarity import kmeans_lloyd

    # ids 0,1 both in the same blob -> one init centroid goes hungry but
    # the op must still emit a full assignment without error
    rows = [(i, [1.0 + 0.001 * i, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = kmeans_lloyd(df, k=2, iterations=2, dim=2).collect()
    assert len(out) == 6
    assert all(r["dist"] >= 0.0 for r in out)


def test_random_projection_shape_and_linearity(spark):
    from raven_spark.operators.similarity import random_projection

    base = [float(i % 5) for i in range(8)]
    doubled = [2.0 * v for v in base]
    df = spark.createDataFrame(
        [(0, base), (1, doubled), (2, [0.0] * 8)],
        "vec_id bigint, embedding array<float>",
    )
    got = {r["vec_id"]: r["proj"] for r in
           random_projection(df, out_dim=4, dim=8).collect()}
    assert all(len(p) == 4 for p in got.values())
    # linear map: proj(2x) == 2*proj(x) (rounding at 6dp)
    for a, b in zip(got[0], got[1]):
        assert abs(2 * a - b) < 1e-5
    assert got[2] == [0.0, 0.0, 0.0, 0.0]
    # deterministic across partitionings
    alt = {r["vec_id"]: r["proj"] for r in
           random_projection(df.repartition(5), out_dim=4, dim=8).collect()}
    assert alt == got


def test_retrieval_metrics_hand_computed(spark):
    # q1: ranks 1..3 = docs a(rel2), b(rel0), c(rel1); qrels also d(rel3)
    # missed. DCG = 3/1 + 1/2 = 3.5; IDCG = 7/1 + 3/log2(3) + 1/2;
    # MRR = 1; recall = 2/3.
    import math

    from raven_spark.operators.similarity import retrieval_metrics

    runs = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3)], "qid int, doc_id string, rank int"
    )
    qrels = spark.createDataFrame(
        [(1, "a", 2), (1, "b", 0), (1, "c", 1), (1, "d", 3)],
        "qid int, doc_id string, rel int",
    )
    r = retrieval_metrics(runs, qrels, k=10).collect()[0]
    dcg = 3.0 / 1.0 + 1.0 / 2.0
    idcg = 7.0 + 3.0 / math.log2(3) + 1.0 / 2.0
    assert r["n_rel"] == 3
    assert abs(r["ndcg"] - round(dcg / idcg, 6)) < 1e-9
    assert r["mrr"] == 1.0
    assert abs(r["recall"] - round(2 / 3, 6)) < 1e-9


def test_retrieval_metrics_missing_query_scores_zero(spark):
    from raven_spark.operators.similarity import retrieval_metrics

    runs = spark.createDataFrame([(1, "a", 1)], "qid int, doc_id string, rank int")
    qrels = spark.createDataFrame(
        [(1, "a", 1), (2, "z", 2)], "qid int, doc_id string, rel int"
    )
    got = {r["qid"]: r for r in retrieval_metrics(runs, qrels, k=5).collect()}
    assert got[1]["ndcg"] == 1.0 and got[1]["recall"] == 1.0
    # query 2 never retrieved anything -> all zeros, still present
    assert (got[2]["ndcg"], got[2]["mrr"], got[2]["recall"]) == (0.0, 0.0, 0.0)


def test_retrieval_metrics_on_real_ann_runs(spark):
    # compose with the engine's own retrieval ops: exact brute top-k is
    # the qrels (rel 1), LSH multiprobe the system — recall here equals
    # q23's measured recall by construction.
    from raven_spark.operators.similarity import brute_force_topk, retrieval_metrics

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
    ranked = brute_force_topk(emb, qvec, k=5).collect()  # (vec_id, cosine) desc
    spark_runs = spark.createDataFrame(
        [(1, r["vec_id"], i + 1) for i, r in enumerate(ranked)],
        "qid int, doc_id bigint, rank int",
    )
    truth = spark.createDataFrame(
        [(1, r["vec_id"], 1) for r in ranked], "qid int, doc_id bigint, rel int"
    )
    out = retrieval_metrics(spark_runs, truth, doc_col="doc_id", k=5).collect()
    for r in out:
        assert r["ndcg"] == 1.0 and r["recall"] == 1.0 and r["mrr"] == 1.0


def test_retrieval_metrics_keeps_judged_queries_with_no_relevant_docs(spark):
    """A query whose qrels are all rel=0 must still get its row (n_rel=0,
    NULL metrics) — building n_rel from rel>0-filtered qrels silently
    dropped judged queries and inflated downstream averages."""
    from raven_spark.operators.similarity import retrieval_metrics

    runs = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (7, 10, 1)], "qid int, doc_id int, rank int"
    )
    qrels = spark.createDataFrame(
        [(1, 10, 2), (1, 12, 1), (7, 10, 0), (7, 11, 0)],
        "qid int, doc_id int, rel int",
    )
    out = {r["qid"]: r for r in retrieval_metrics(runs, qrels, k=10).collect()}
    assert set(out) == {1, 7}  # one row per judged query
    assert out[7]["n_rel"] == 0
    assert out[7]["ndcg"] is None and out[7]["mrr"] is None and out[7]["recall"] is None
    assert out[1]["n_rel"] == 2 and out[1]["mrr"] == 1.0


def test_bitext_pairs_cover_every_source(spark):
    """Regression: the salted-cogroup cosine kernel must produce a pair
    row for EVERY source id (a bigint/int cogroup key mismatch silently
    dropped 7/8 of the groups at one store size)."""
    import random

    from raven_spark.operators.similarity import bitext_margin_pairs

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    src = emb.filter("vec_id % 2 = 0")
    tgt = emb.filter("vec_id % 2 = 1")
    out = bitext_margin_pairs(src, tgt, k=4, dim=64)
    assert out.count() == 100
    assert out.select("src_id").distinct().count() == 100


def test_bitext_rejects_zero_norm_vectors(spark):
    import pytest

    from raven_spark.operators.similarity import bitext_margin_pairs

    src = spark.createDataFrame(
        [(0, [0.0] * 64), (2, [1.0] * 64)], "vec_id long, embedding array<double>"
    )
    tgt = spark.createDataFrame(
        [(1, [1.0] * 64)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="zero-norm"):
        bitext_margin_pairs(src, tgt, k=1, dim=64).collect()
