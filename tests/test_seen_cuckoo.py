"""Cuckoo filter (the deletable seen-set twin, north_star "Bloom/cuckoo"):
no-false-negatives property, deletion semantics, serde/union, sharded
build/probe/delete, subtract_seen equality with the exact anti-join."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raven_spark.operators.seen import (
    CuckooFilter,
    ShardedCuckoo,
    build_cuckoo_shards,
    cuckoo_params,
    cuckoo_prune_sharded,
    delete_from_cuckoo_shards,
    merge_cuckoo_shards,
    subtract_seen,
)


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=300))
@settings(max_examples=100, deadline=None)
def test_cuckoo_no_false_negatives(hashes):
    cf = CuckooFilter.for_capacity(max(len(hashes), 16))
    arr = np.array(hashes, dtype=np.int64)
    if len(arr):
        cf.add_many(arr)
        assert cf.contains_many(arr).all()


def test_cuckoo_fpp_reasonable():
    rng = np.random.RandomState(7)
    present = np.unique(rng.randint(-(2**62), 2**62, size=20_000).astype(np.int64))
    absent = rng.randint(-(2**62), 2**62, size=20_000).astype(np.int64)
    absent = absent[~np.isin(absent, present)]
    cf = CuckooFilter.for_capacity(len(present))
    cf.add_many(present)
    assert cf.contains_many(present).all()
    # 16-bit fp, 4 slots, 2 buckets -> fpp ~ 8/2^16 ~ 1.2e-4
    assert cf.contains_many(absent).mean() < 0.005


def test_cuckoo_high_load_insert_succeeds():
    """At the design load factor (0.84) every key must place, exercising
    the greedy->alt->eviction cascade."""
    n = 50_000
    cf = CuckooFilter.for_capacity(n)
    keys = np.arange(n, dtype=np.int64) * np.int64(2654435761)
    cf.add_many(keys)
    assert cf.contains_many(keys).all()


def test_cuckoo_delete_semantics():
    rng = np.random.RandomState(3)
    keys = np.unique(rng.randint(-(2**62), 2**62, size=10_000).astype(np.int64))
    cf = CuckooFilter.for_capacity(len(keys))
    cf.add_many(keys)
    gone, kept = keys[::2], keys[1::2]
    removed = cf.delete_many(gone)
    assert removed.all()
    # every non-deleted key still has no false negative
    assert cf.contains_many(kept).all()
    # deleted keys are absent unless they fp-collide with a kept key
    # (the documented cuckoo caveat); at 16-bit fps that's ~0
    assert cf.contains_many(gone).mean() < 0.005
    # deleting an absent key reports not-removed
    assert not cf.delete_many(np.array([keys.max() + 12345], dtype=np.int64)).any()


def test_cuckoo_delete_then_reinsert_roundtrip():
    keys = np.arange(1000, dtype=np.int64) * np.int64(-97)
    cf = CuckooFilter.for_capacity(2000)
    cf.add_many(keys)
    cf.delete_many(keys)
    assert not cf.contains_many(keys).any()
    cf.add_many(keys)
    assert cf.contains_many(keys).all()


def test_cuckoo_union_and_serde():
    a = CuckooFilter.for_capacity(4000)
    b = CuckooFilter(a.n_buckets)
    xa = np.arange(1000, dtype=np.int64)
    xb = np.arange(1000, 2000, dtype=np.int64)
    a.add_many(xa)
    b.add_many(xb)
    u = CuckooFilter.from_bytes(a.union(b).to_bytes())
    assert u.contains_many(xa).all() and u.contains_many(xb).all()


def test_cuckoo_params_power_of_two():
    for n in (1, 16, 1000, 123457):
        nb = cuckoo_params(n)
        assert nb & (nb - 1) == 0
        assert nb * 4 * 0.84 >= min(n, 16)


def test_sharded_cuckoo_build_probe_delete(spark):
    seen = spark.range(0, 4000, numPartitions=8).selectExpr("xxhash64(id) as url_hash")
    shards = build_cuckoo_shards(seen, "url_hash", n_shards=8, expected_n=4000)
    rows = shards.collect()
    assert 1 <= len(rows) <= 8 and len({r["shard"] for r in rows}) == len(rows)
    sc = ShardedCuckoo(shards, 8)

    flagged = cuckoo_prune_sharded(seen, sc)
    assert flagged.filter("NOT maybe_seen").count() == 0

    absent = spark.range(100_000, 110_000, numPartitions=8).selectExpr(
        "xxhash64(id) as url_hash"
    )
    fp = cuckoo_prune_sharded(absent, sc).filter("maybe_seen").count() / 10_000
    assert fp < 0.005, fp

    # TTL invalidation: delete half the keys across shards, then re-probe
    gone = seen.filter("pmod(url_hash, 2) = 0")
    kept = seen.filter("pmod(url_hash, 2) = 1")
    updated = ShardedCuckoo(delete_from_cuckoo_shards(shards, gone, 8), 8)
    assert cuckoo_prune_sharded(kept, updated).filter("NOT maybe_seen").count() == 0
    refetchable = cuckoo_prune_sharded(gone, updated).filter("maybe_seen").count()
    assert refetchable <= gone.count() * 0.005


def test_merge_cuckoo_shards_across_rounds(spark):
    r0 = spark.range(0, 2000, numPartitions=4).selectExpr("xxhash64(id) as url_hash")
    r1 = spark.range(2000, 4000, numPartitions=4).selectExpr("xxhash64(id) as url_hash")
    s0 = build_cuckoo_shards(r0, "url_hash", n_shards=4, expected_n=8000)
    s1 = build_cuckoo_shards(r1, "url_hash", n_shards=4, expected_n=8000)
    merged = merge_cuckoo_shards(s0.unionByName(s1))
    assert merged.groupBy("shard").count().filter("count > 1").count() == 0
    both = r0.unionByName(r1)
    flagged = cuckoo_prune_sharded(both, ShardedCuckoo(merged, 4))
    assert flagged.filter("NOT maybe_seen").count() == 0


@pytest.mark.parametrize("sharded", [False, True])
def test_subtract_seen_cuckoo_equals_exact(spark, sharded):
    cand = spark.range(0, 3000, numPartitions=8).selectExpr(
        "xxhash64(id) as url_hash", "cast(id as string) as url_canon"
    )
    seen = cand.filter("pmod(url_hash, 3) = 0")
    if sharded:
        filt = ShardedCuckoo(
            build_cuckoo_shards(seen, "url_hash", n_shards=4, expected_n=4000), 4
        )
    else:
        filt = CuckooFilter.for_capacity(4000)
        filt.add_many(
            np.array([r[0] for r in seen.select("url_hash").collect()], dtype=np.int64)
        )
    got = {r[0] for r in subtract_seen(cand, seen, bloom=filt).select("url_hash").collect()}
    want = {r[0] for r in cand.join(seen.select("url_hash"), "url_hash", "left_anti")
            .select("url_hash").collect()}
    assert got == want


def test_insert_after_delete_never_overwrites_live_keys():
    """Regression (code-review r3): deletions leave holes anywhere in a
    bucket row; a later insert must take a FREE slot, not the
    occupancy-count position (which would overwrite a live fingerprint
    and break the no-false-negative contract)."""
    from raven_spark.operators.seen import CuckooFilter, _cuckoo_index

    cf = CuckooFilter(16)
    # find three keys in the same home bucket with distinct fingerprints
    keys, fps, bucket = [], set(), None
    for k in range(200_000):
        i1, fp = _cuckoo_index(np.array([k], dtype=np.int64), 16)
        if bucket is None:
            bucket = int(i1[0])
        if int(i1[0]) == bucket and int(fp[0]) not in fps:
            keys.append(k)
            fps.add(int(fp[0]))
            if len(keys) == 3:
                break
    a, b, c = (np.array([k], dtype=np.int64) for k in keys)
    cf.add_many(a)
    cf.add_many(b)
    cf.delete_many(a)          # hole at slot 0, b live at slot 1
    cf.add_many(c)             # must NOT overwrite b
    assert cf.contains_many(b).all()
    assert cf.contains_many(c).all()
    assert not cf.contains_many(a).any()


def test_interleaved_insert_delete_property():
    """Churn property: after arbitrary rounds of insert/delete, every
    still-live key answers present (deleting only previously-inserted
    keys, the documented contract)."""
    rng = np.random.RandomState(5)
    cf = CuckooFilter.for_capacity(4000)
    live: set[int] = set()
    pool = np.unique(rng.randint(-(2**62), 2**62, size=3000).astype(np.int64))
    for step in range(6):
        ins = pool[rng.rand(len(pool)) < 0.3]
        new = np.array([k for k in ins.tolist() if k not in live], dtype=np.int64)
        if len(new):
            cf.add_many(new)
            live.update(new.tolist())
        dels = np.array([k for k in list(live) if rng.rand() < 0.25], dtype=np.int64)
        if len(dels):
            cf.delete_many(dels)
            live.difference_update(dels.tolist())
        if live:
            arr = np.array(sorted(live), dtype=np.int64)
            assert cf.contains_many(arr).all(), f"false negative at step {step}"
