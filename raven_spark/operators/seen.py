"""Distributed URL-seen set: Bloom prune + exact anti-join.

The reference has no seen-set at all (its task list is finite by
construction); BASELINE.json north_star mandates one at 10^10-URL scale:
"per-partition Bloom/cuckoo filters merged via treeAggregate", broadcast
to prune candidates BEFORE the exact anti-join.

Why both stages: the Bloom is tiny (bits ~ 1.44 * n * log2(1/fpp)) and
broadcast-joins against the candidate set with zero shuffle, eliminating
~(1-fpp) of duplicate candidates map-side; the exact ``left_anti`` join
then only shuffles the survivors (new URLs + fpp false positives), so the
big shuffle is proportional to NEW urls, not to frontier size. At 10^10
seen URLs the exact side lives in a hash-bucketed table and the anti-join
co-locates on the same bucketing, while the Bloom stays O(GB) broadcast.

Build path: per-partition numpy bitmaps built vectorized inside
``mapInPandas`` (one output row per partition), OR-merged. The merge uses
RDD ``treeAggregate`` (depth 2) so no single task receives all partial
filters at once — the choreography north_star names.
"""

from __future__ import annotations

from dataclasses import dataclass as _dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def bloom_params(expected_n: int, fpp: float = 0.01) -> tuple[int, int]:
    """(n_bits, n_hashes) for a target false-positive rate."""
    expected_n = max(1, expected_n)
    n_bits = int(-expected_n * np.log(fpp) / (np.log(2) ** 2))
    n_bits = max(1024, 1 << int(np.ceil(np.log2(n_bits))))  # pow2 -> mask indexing
    n_hashes = max(1, int(round(n_bits / expected_n * np.log(2))))
    return n_bits, min(n_hashes, 16)


def _positions(hashes: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """Double hashing (Kirsch-Mitzenmacher): pos_i = h1 + i*h2 mod m.
    Returns shape (len, n_hashes) of bit positions."""
    h = hashes.astype(np.uint64)
    h1 = h & np.uint64(n_bits - 1)
    h2 = ((h >> np.uint64(17)) | np.uint64(1)) & np.uint64(n_bits - 1)
    i = np.arange(n_hashes, dtype=np.uint64)[None, :]
    return (h1[:, None] + i * h2[:, None]) & np.uint64(n_bits - 1)


def _set_bits(bitmap: np.ndarray, hashes: np.ndarray, n_bits: int, n_hashes: int) -> None:
    pos = _positions(hashes, n_bits, n_hashes).ravel()
    np.bitwise_or.at(bitmap, pos >> np.uint64(3), (np.uint8(1) << (pos & np.uint64(7))).astype(np.uint8))


def _test_bits(bitmap: np.ndarray, hashes: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    pos = _positions(hashes, n_bits, n_hashes)
    bits = (bitmap[pos >> np.uint64(3)] >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
    return bits.all(axis=1)


class BloomFilter:
    """Serializable Bloom over int64 hashes (url_hash column values)."""

    def __init__(self, n_bits: int, n_hashes: int, bitmap: np.ndarray | None = None):
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bitmap = bitmap if bitmap is not None else np.zeros(n_bits // 8, dtype=np.uint8)

    @classmethod
    def for_capacity(cls, expected_n: int, fpp: float = 0.01) -> "BloomFilter":
        return cls(*bloom_params(expected_n, fpp))

    def add_many(self, hashes: np.ndarray) -> None:
        _set_bits(self.bitmap, hashes.astype(np.int64).view(np.uint64), self.n_bits, self.n_hashes)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        return _test_bits(self.bitmap, hashes.astype(np.int64).view(np.uint64), self.n_bits, self.n_hashes)

    def union(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.n_bits, self.n_hashes) == (other.n_bits, other.n_hashes)
        return BloomFilter(self.n_bits, self.n_hashes, np.bitwise_or(self.bitmap, other.bitmap))

    def to_bytes(self) -> bytes:
        head = np.array([self.n_bits, self.n_hashes], dtype=np.int64).tobytes()
        return head + self.bitmap.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "BloomFilter":
        n_bits, n_hashes = np.frombuffer(b[:16], dtype=np.int64)
        return cls(int(n_bits), int(n_hashes), np.frombuffer(b[16:], dtype=np.uint8).copy())


def build_bloom(df: DataFrame, hash_col: str, expected_n: int, fpp: float = 0.01) -> BloomFilter:
    """Per-partition vectorized build + treeAggregate OR-merge.

    Each partition contributes one partial filter built with numpy
    (no per-row Python); ``treeAggregate(depth=2)`` merges ~sqrt(P)
    partials per combiner so the driver never sees P full bitmaps at once.
    """
    n_bits, n_hashes = bloom_params(expected_n, fpp)

    def part(batches):
        bm = np.zeros(n_bits // 8, dtype=np.uint8)
        for pdf in batches:
            _set_bits(bm, pdf.iloc[:, 0].to_numpy(dtype=np.int64).view(np.uint64), n_bits, n_hashes)
        yield pd.DataFrame({"bloom": [bm.tobytes()]})

    # per-partition bitmaps built fully vectorized (Arrow in, numpy bit ops);
    # the rows crossing back to the driver are P bitmaps, not N hashes
    partials = df.select(F.col(hash_col).cast("long")).mapInPandas(part, "bloom binary")

    def seq(acc: np.ndarray, blob) -> np.ndarray:
        return np.bitwise_or(acc, np.frombuffer(bytes(blob[0]), dtype=np.uint8))

    def comb(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.bitwise_or(a, b)

    # treeAggregate merges ~sqrt(P) bitmaps per combiner: at 10^10 urls the
    # bitmap is GB-scale and P is thousands — the driver must never see all
    # P partials at once (the north_star merge choreography)
    bitmap = partials.rdd.treeAggregate(
        np.zeros(n_bits // 8, dtype=np.uint8), seq, comb, depth=2
    )
    return BloomFilter(n_bits, n_hashes, bitmap)


def bloom_prune(df: DataFrame, bloom: BloomFilter, hash_col: str = "url_hash",
                flag_col: str = "maybe_seen") -> DataFrame:
    """Adds ``maybe_seen`` (bloom membership) via a broadcast bitmap inside
    an Arrow-batched iterator — rows with maybe_seen=false are DEFINITELY
    new (no false negatives) and skip the exact anti-join entirely."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bloom.to_bytes())
    schema = StructType(list(df.schema.fields) + [StructField(flag_col, BooleanType())])

    def check(batches):
        bl = BloomFilter.from_bytes(bc.value)
        for pdf in batches:
            out = pdf.copy()
            out[flag_col] = bl.contains_many(pdf[hash_col].to_numpy(dtype=np.int64))
            yield out

    return df.mapInPandas(check, schema)


# --- sharded Bloom: the 10^10-URL posture ------------------------------------
#
# The monolithic filter above is correct at any scale but its BITMAP is
# not: at 10^10 seen URLs / fpp=0.01 the merged bitmap is ~12 GB — too big
# to broadcast per round and to hold on the driver. The sharded variant
# splits the seen-set by pmod(url_hash, n_shards) (uniform by
# construction — salt_bucket is host-derived and Zipf-skewed, url_hash is
# not) into n_shards independent filters:
#
# - BUILD is fully distributed: per-partition partial bitmaps per shard
#   (mapInPandas), OR-merged per shard via groupBy(shard).applyInPandas;
#   the result is a (shard, bloom) TABLE written through the catalog —
#   the driver never holds any bitmap.
# - PROBE is a cogroup: candidates repartition by their shard key and
#   each task unpacks only its own shard's bitmap (1/n_shards of the
#   total). Total bloom bytes cross the wire exactly once per round as a
#   narrow shuffle, never as a whole-cluster broadcast.


@_dataclass
class ShardedBloom:
    """Handle for the sharded seen-filter: (shard int, bloom binary) rows
    — possibly several per shard (one per committed round; union is
    bitwise OR because every shard filter has identical fixed params)."""

    shards: DataFrame
    n_shards: int


def bloom_shard_col(hash_col: str, n_shards: int):
    """Shard key: pmod(url_hash, n_shards) — matches numpy's floored mod
    used on the build/probe side (both non-negative for negative hashes)."""
    return F.pmod(F.col(hash_col), F.lit(n_shards)).cast("int")


def build_bloom_shards(
    df: DataFrame, hash_col: str, n_shards: int, expected_n: int, fpp: float = 0.01
) -> DataFrame:
    """df -> one (shard, bloom) row per non-empty shard, fully distributed.

    Each shard filter is sized for expected_n / n_shards keys, so total
    bits match the monolithic filter; per-partition partials OR-merge per
    shard (the treeAggregate choreography becomes a plain shuffle-by-shard
    — each merge task touches 1/n_shards of the bytes)."""
    n_bits, n_hashes = bloom_params(max(16, expected_n // max(1, n_shards)), fpp)

    def part(batches):
        acc: dict[int, np.ndarray] = {}
        for pdf in batches:
            h = pdf.iloc[:, 0].to_numpy(dtype=np.int64)
            s = h % n_shards  # numpy floored mod == Spark pmod
            for shard in np.unique(s):
                bm = acc.setdefault(int(shard), np.zeros(n_bits // 8, dtype=np.uint8))
                _set_bits(bm, h[s == shard].view(np.uint64), n_bits, n_hashes)
        if acc:
            yield pd.DataFrame({
                "shard": np.array(list(acc), dtype=np.int32),
                "bloom": [BloomFilter(n_bits, n_hashes, b).to_bytes() for b in acc.values()],
            })

    partials = df.select(F.col(hash_col).cast("long")).mapInPandas(part, "shard int, bloom binary")
    return merge_bloom_shards(partials)


def merge_bloom_shards(shards: DataFrame) -> DataFrame:
    """OR-merge (shard, bloom) rows down to one row per shard."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        bl = BloomFilter.from_bytes(bytes(pdf["bloom"].iloc[0]))
        for blob in pdf["bloom"].iloc[1:]:
            bl = bl.union(BloomFilter.from_bytes(bytes(blob)))
        return pd.DataFrame({"shard": pdf["shard"].iloc[:1], "bloom": [bl.to_bytes()]})

    return shards.select("shard", "bloom").groupBy("shard").applyInPandas(
        merge, "shard int, bloom binary"
    )


def bloom_prune_sharded(
    candidates: DataFrame,
    bloom: ShardedBloom,
    hash_col: str = "url_hash",
    flag_col: str = "maybe_seen",
) -> DataFrame:
    """Sharded twin of bloom_prune: candidates cogroup with their own
    shard's filter; a task never sees any other shard's bytes. A shard
    with no filter row holds no seen URLs -> maybe_seen=false (exact)."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    out_cols = candidates.columns
    schema = StructType(list(candidates.schema.fields) + [StructField(flag_col, BooleanType())])
    cand = candidates.withColumn("__shard", bloom_shard_col(hash_col, bloom.n_shards))
    merged = merge_bloom_shards(bloom.shards)

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        out = left[out_cols].copy()
        if len(right) == 0 or len(left) == 0:
            out[flag_col] = np.zeros(len(left), dtype=bool)
            return out
        bl = BloomFilter.from_bytes(bytes(right["bloom"].iloc[0]))
        out[flag_col] = bl.contains_many(left[hash_col].to_numpy(dtype=np.int64))
        return out

    return (
        cand.groupBy("__shard")
        .cogroup(merged.groupBy("shard"))
        .applyInPandas(probe, schema)
    )


def subtract_seen(
    candidates: DataFrame,
    url_seen: DataFrame | None,
    bloom: "BloomFilter | ShardedBloom | None" = None,
    hash_col: str = "url_hash",
) -> DataFrame:
    """candidates minus seen — the EXCEPT of the engine (§2.2 set ops).

    Plan shape: [bloom prune (broadcast bitmap, or sharded cogroup at
    10^10 scale) -> ] left_anti join on url_hash for the maybe-seen
    remainder -> union with the definitely-new rows. With no url_seen yet,
    candidates pass through.
    """
    if url_seen is None:
        return candidates
    seen_keys = url_seen.select(F.col(hash_col)).distinct()
    if bloom is None:
        return candidates.join(seen_keys, on=hash_col, how="left_anti")
    if isinstance(bloom, ShardedBloom):
        pruned = bloom_prune_sharded(candidates, bloom, hash_col)
    else:
        pruned = bloom_prune(candidates, bloom, hash_col)
    definitely_new = pruned.filter(~F.col("maybe_seen")).drop("maybe_seen")
    survivors = pruned.filter(F.col("maybe_seen")).drop("maybe_seen")
    checked = survivors.join(seen_keys, on=hash_col, how="left_anti")
    return definitely_new.unionByName(checked)
