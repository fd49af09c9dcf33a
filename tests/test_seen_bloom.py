"""Bloom filter + URL-seen subtraction: no-false-negatives property,
prune ⊆ seen, treeAggregate build equivalence."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from raven_spark.operators.seen import (
    BloomFilter,
    ShardedBloom,
    bloom_params,
    bloom_prune_sharded,
    build_bloom,
    build_bloom_shards,
    merge_bloom_shards,
    subtract_seen,
)


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=300))
@settings(max_examples=100, deadline=None)
def test_bloom_no_false_negatives(hashes):
    bl = BloomFilter.for_capacity(max(len(hashes), 16), fpp=0.01)
    arr = np.array(hashes, dtype=np.int64)
    if len(arr):
        bl.add_many(arr)
        assert bl.contains_many(arr).all()


def test_bloom_fpp_reasonable():
    rng = np.random.RandomState(42)
    present = rng.randint(-(2**62), 2**62, size=10_000).astype(np.int64)
    absent = rng.randint(-(2**62), 2**62, size=10_000).astype(np.int64)
    bl = BloomFilter.for_capacity(10_000, fpp=0.01)
    bl.add_many(present)
    fp = bl.contains_many(absent).mean()
    assert fp < 0.05, fp


def test_bloom_union_and_serde():
    a = BloomFilter.for_capacity(1000)
    b = BloomFilter(a.n_bits, a.n_hashes)
    xa = np.arange(100, dtype=np.int64)
    xb = np.arange(100, 200, dtype=np.int64)
    a.add_many(xa)
    b.add_many(xb)
    u = BloomFilter.from_bytes(a.union(b).to_bytes())
    assert u.contains_many(xa).all() and u.contains_many(xb).all()


def test_build_bloom_distributed_matches_local(spark):
    df = spark.range(0, 5000, numPartitions=8).selectExpr("xxhash64(id) as url_hash")
    bl = build_bloom(df, "url_hash", expected_n=5000)
    local = np.array([r[0] for r in df.collect()], dtype=np.int64)
    assert bl.contains_many(local).all()  # no false negatives across partitions


def test_sharded_build_probe_no_false_negatives(spark):
    """Every seen hash must be flagged maybe_seen by its own shard's
    filter (no false negatives across the shard boundary), and the
    false-positive rate over absent hashes must stay near fpp."""
    seen = spark.range(0, 4000, numPartitions=8).selectExpr("xxhash64(id) as url_hash")
    shards = build_bloom_shards(seen, "url_hash", n_shards=8, expected_n=4000)
    rows = shards.collect()
    assert 1 <= len(rows) <= 8 and len({r["shard"] for r in rows}) == len(rows)
    sb = ShardedBloom(shards, 8)

    flagged = bloom_prune_sharded(seen, sb)
    assert flagged.filter("NOT maybe_seen").count() == 0

    absent = spark.range(100_000, 110_000, numPartitions=8).selectExpr(
        "xxhash64(id) as url_hash"
    )
    fp = bloom_prune_sharded(absent, sb).filter("maybe_seen").count() / 10_000
    assert fp < 0.05, fp


def test_merge_bloom_shards_across_rounds(spark):
    """Two rounds' shard deltas OR-merge to a filter containing both."""
    r0 = spark.range(0, 500).selectExpr("xxhash64(id) as url_hash")
    r1 = spark.range(500, 1000).selectExpr("xxhash64(id) as url_hash")
    both = build_bloom_shards(r0, "url_hash", 4, 1000).unionByName(
        build_bloom_shards(r1, "url_hash", 4, 1000)
    )
    merged = merge_bloom_shards(both)
    sb = ShardedBloom(merged, 4)
    allhash = spark.range(0, 1000).selectExpr("xxhash64(id) as url_hash")
    assert bloom_prune_sharded(allhash, sb).filter("NOT maybe_seen").count() == 0


def test_subtract_seen_sharded_matches_exact(spark):
    cand = spark.range(0, 1000).selectExpr("id as url_hash", "cast(id as string) as url_canon")
    seen = spark.range(0, 600).selectExpr("id as url_hash", "cast(id as string) as url_canon")
    shards = build_bloom_shards(seen.select("url_hash"), "url_hash", 8, 600)
    out = subtract_seen(cand, seen, bloom=ShardedBloom(shards, 8))
    assert sorted(r["url_hash"] for r in out.collect()) == list(range(600, 1000))


def test_subtract_seen_exact_and_bloom(spark):
    cand = spark.range(0, 1000).selectExpr("id as url_hash", "cast(id as string) as url_canon")
    seen = spark.range(0, 600).selectExpr("id as url_hash", "cast(id as string) as url_canon")
    # exact path
    out = subtract_seen(cand, seen)
    assert sorted(r["url_hash"] for r in out.collect()) == list(range(600, 1000))
    # bloom-pruned path gives the identical answer (bloom only prunes)
    bl = build_bloom(seen, "url_hash", expected_n=600)
    out2 = subtract_seen(cand, seen, bloom=bl)
    assert sorted(r["url_hash"] for r in out2.collect()) == list(range(600, 1000))
