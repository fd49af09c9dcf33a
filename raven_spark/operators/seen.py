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


def subtract_seen(
    candidates: DataFrame,
    url_seen: DataFrame | None,
    bloom: BloomFilter | None = None,
    hash_col: str = "url_hash",
) -> DataFrame:
    """candidates minus seen — the EXCEPT of the engine (§2.2 set ops).

    Plan shape: [bloom prune (broadcast, no shuffle)] -> left_anti join on
    url_hash for the maybe-seen remainder -> union with the definitely-new
    rows. With no url_seen yet, candidates pass through.
    """
    if url_seen is None:
        return candidates
    seen_keys = url_seen.select(F.col(hash_col)).distinct()
    if bloom is None:
        return candidates.join(seen_keys, on=hash_col, how="left_anti")
    pruned = bloom_prune(candidates, bloom, hash_col)
    definitely_new = pruned.filter(~F.col("maybe_seen")).drop("maybe_seen")
    survivors = pruned.filter(F.col("maybe_seen")).drop("maybe_seen")
    checked = survivors.join(seen_keys, on=hash_col, how="left_anti")
    return definitely_new.unionByName(checked)
