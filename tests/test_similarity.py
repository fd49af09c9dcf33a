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
