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


def bloom_prune(df: DataFrame, bloom, hash_col: str = "url_hash",
                flag_col: str = "maybe_seen") -> DataFrame:
    """Adds ``maybe_seen`` (filter membership) via a broadcast filter inside
    an Arrow-batched iterator — rows with maybe_seen=false are DEFINITELY
    new (no false negatives) and skip the exact anti-join entirely.
    Accepts any filter with to_bytes/from_bytes/contains_many (BloomFilter
    or CuckooFilter)."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    spark = df.sparkSession
    cls = type(bloom)
    bc = spark.sparkContext.broadcast(bloom.to_bytes())
    schema = StructType(list(df.schema.fields) + [StructField(flag_col, BooleanType())])

    def check(batches):
        bl = cls.from_bytes(bc.value)
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


# --- Cuckoo filter: the deletable twin ---------------------------------------
#
# north_star names "per-partition Bloom/cuckoo filters" — the cuckoo
# variant exists for the one thing a Bloom cannot do: DELETION. A crawl
# frontier needs it for recrawl/TTL invalidation: expiring a captured URL
# means removing it from the seen-set so the next round reschedules it,
# without rebuilding a 10^10-key filter from scratch.
#
# Layout: n_buckets (power of two) x 4 slots of 16-bit fingerprints
# (0 = empty). fp(h) = high 16 bits of the hash folded to 1..65535 (the
# bucket index uses the LOW bits, so fp and bucket are independent);
# alt(i, fp) = i XOR (fp * 0x5bd1e995) & mask — involutive, so either
# resident bucket recovers its partner (Fan et al., CoNLL'14 layout;
# public-algorithm implementation, no reference-code lineage).
#
# Same scale story as the Bloom: ~18 bits/key at fpp≈2e-4 for 4 slots /
# 16-bit fp, so shard the table by pmod(url_hash, n_shards) and probe via
# cogroup — no whole-filter broadcast. Insert/contains/delete are all
# numpy-vectorized (greedy rank-within-bucket placement; the eviction
# loop only ever sees the <1% overflow of a 0.84-load batch).

CUCKOO_SLOTS = 4
_FP_MUL = np.uint64(0x5BD1E995)
_MAX_KICKS = 500


def cuckoo_params(expected_n: int, load: float = 0.84) -> int:
    """Bucket count (power of two) for a target load factor."""
    expected_n = max(16, expected_n)
    n_buckets = int(np.ceil(expected_n / (CUCKOO_SLOTS * load)))
    return max(16, 1 << int(np.ceil(np.log2(n_buckets))))


def _mix64(h: np.ndarray) -> np.ndarray:
    """MurmurHash3 fmix64 finalizer (public constant set): the filter
    must not assume its int64 keys are already uniform — q17/q39-style
    callers feed raw ids whose high bits are all zero, which would
    otherwise collapse every fingerprint to 1."""
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xFF51AFD7ED558CCD)
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xC4CEB9FE1A85EC53)
        return h ^ (h >> np.uint64(33))


def _cuckoo_index(hashes: np.ndarray, n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, fingerprint) per hash: bucket from the low bits,
    fingerprint from the high 16 bits folded onto 1..65535 (never 0),
    both over the mixed key so structured inputs stay uniform."""
    h = _mix64(hashes.astype(np.int64).view(np.uint64))
    i1 = (h & np.uint64(n_buckets - 1)).astype(np.int64)
    fp = ((h >> np.uint64(48)) % np.uint64(65535) + np.uint64(1)).astype(np.uint16)
    return i1, fp


def _cuckoo_alt(buckets: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    mixed = (fp.astype(np.uint64) * _FP_MUL) & np.uint64(n_buckets - 1)
    return (buckets.astype(np.uint64) ^ mixed).astype(np.int64)


def _rank_within(keys: np.ndarray) -> np.ndarray:
    """Occurrence rank of each element among equal keys (vectorized)."""
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    first = np.searchsorted(sk, sk, side="left")
    rank = np.empty(len(keys), dtype=np.int64)
    rank[order] = np.arange(len(keys)) - first
    return rank


class CuckooFilter:
    """Serializable cuckoo filter over int64 hashes (url_hash values).

    Contract mirrors BloomFilter (no false negatives for inserted keys,
    tunable false positives ≈ 2*CUCKOO_SLOTS/2^16 per bucket pair) and
    adds ``delete_many``. Deleting a key that fingerprint-collides with a
    different inserted key can remove the survivor's only copy — the
    standard cuckoo caveat — so delete only keys previously inserted, and
    insert each distinct key once (``add_many`` dedupes its batch)."""

    def __init__(self, n_buckets: int, table: np.ndarray | None = None):
        self.n_buckets = n_buckets
        self.table = (
            table if table is not None
            else np.zeros((n_buckets, CUCKOO_SLOTS), dtype=np.uint16)
        )

    @classmethod
    def for_capacity(cls, expected_n: int, load: float = 0.84) -> "CuckooFilter":
        return cls(cuckoo_params(expected_n, load))

    # -- placement kernels -----------------------------------------------------

    def _greedy_place(self, buckets: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """Place (bucket, fp) pairs into free slots without eviction.
        Returns the boolean mask of PLACED pairs. Fully vectorized: each
        pair takes its bucket's (rank+1)-th ACTUAL free slot (ranks are
        per-bucket within the batch). Deletions leave holes anywhere in a
        bucket row, so occupancy-count indexing would overwrite live
        fingerprints — slots must be looked up, not assumed left-packed."""
        if len(buckets) == 0:
            return np.zeros(0, dtype=bool)
        free = self.table[buckets] == 0  # (n, SLOTS)
        # stable argsort of ~free lists each row's free slot indices first
        free_slots = np.argsort(~free, axis=1, kind="stable")
        rank = _rank_within(buckets)
        placed = rank < free.sum(axis=1)
        slot = free_slots[np.arange(len(buckets)), np.minimum(rank, CUCKOO_SLOTS - 1)]
        self.table[buckets[placed], slot[placed]] = fp[placed]
        return placed

    def _evict_place(self, bucket: int, fp: int) -> bool:
        """Single-pair insert with the classic eviction chain (bounded).
        Deterministic kick choice (LCG over the fingerprint) so replays
        rebuild byte-identical tables."""
        mask64 = 0xFFFFFFFFFFFFFFFF
        state = (int(fp) * 6364136223846793005 + 1) & mask64
        cur_b, cur_fp = int(bucket), np.uint16(fp)
        for _ in range(_MAX_KICKS):
            row = self.table[cur_b]
            free = np.nonzero(row == 0)[0]
            if len(free):
                self.table[cur_b, free[0]] = cur_fp
                return True
            state = (state * 6364136223846793005 + 1) & mask64
            victim = (state >> 61) % CUCKOO_SLOTS
            cur_fp, self.table[cur_b, victim] = row[victim], cur_fp
            cur_b = int(_cuckoo_alt(np.array([cur_b]), np.array([cur_fp], dtype=np.uint16),
                                    self.n_buckets)[0])
        return False

    def _place_pairs(self, buckets: np.ndarray, fp: np.ndarray) -> None:
        """Greedy pass on the home bucket, greedy pass on the alt bucket,
        eviction loop for the tail. Raises if the filter is over capacity
        (size with ``for_capacity`` to keep load ≤ 0.84)."""
        placed = self._greedy_place(buckets, fp)
        rem = ~placed
        if rem.any():
            alt = _cuckoo_alt(buckets[rem], fp[rem], self.n_buckets)
            placed2 = self._greedy_place(alt, fp[rem])
            if not placed2.all():
                left_b = buckets[rem][~placed2]
                left_fp = fp[rem][~placed2]
                for b, f in zip(left_b.tolist(), left_fp.tolist()):
                    if not self._evict_place(b, f):
                        raise RuntimeError(
                            f"cuckoo filter over capacity (n_buckets={self.n_buckets})"
                        )

    # -- public API --------------------------------------------------------------

    def add_many(self, hashes: np.ndarray) -> None:
        h = np.unique(np.asarray(hashes, dtype=np.int64))
        i1, fp = _cuckoo_index(h, self.n_buckets)
        self._place_pairs(i1, fp)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.int64)
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        i1, fp = _cuckoo_index(h, self.n_buckets)
        i2 = _cuckoo_alt(i1, fp, self.n_buckets)
        return (
            (self.table[i1] == fp[:, None]).any(axis=1)
            | (self.table[i2] == fp[:, None]).any(axis=1)
        )

    def delete_many(self, hashes: np.ndarray) -> np.ndarray:
        """Remove one stored copy per distinct requested key. Returns the
        per-key removed mask (aligned to the DEDUPED, sorted key order of
        ``np.unique``). Vectorized in rounds: each round clears all
        conflict-free (bucket, slot) targets at once; keys colliding on
        the same slot defer to the next round (bounded by multiplicity)."""
        h = np.unique(np.asarray(hashes, dtype=np.int64))
        i1, fp = _cuckoo_index(h, self.n_buckets)
        i2 = _cuckoo_alt(i1, fp, self.n_buckets)
        removed = np.zeros(len(h), dtype=bool)
        pending = np.arange(len(h))
        for _ in range(2 * CUCKOO_SLOTS + 2):
            if len(pending) == 0:
                break
            deferred = []
            for bucket_arr in (i1, i2):
                if len(pending) == 0:
                    break
                b = bucket_arr[pending]
                match = self.table[b] == fp[pending][:, None]
                has = match.any(axis=1)
                slot = match.argmax(axis=1)
                tgt = b * CUCKOO_SLOTS + slot
                first = _rank_within(tgt) == 0  # one deleter per slot per round
                do = has & first
                self.table[b[do], slot[do]] = 0
                removed[pending[do]] = True
                deferred.append(pending[has & ~first])  # slot collision: retry
                pending = pending[~has]  # absent here -> try the other bucket
            if deferred:
                pending = np.concatenate([pending, *deferred])
        return removed

    def union(self, other: "CuckooFilter") -> "CuckooFilter":
        """Merge by re-inserting the other table's resident (bucket, fp)
        pairs — residency already encodes the home/alt pair, which
        ``_place_pairs`` re-derives via the involutive alt mapping."""
        assert self.n_buckets == other.n_buckets
        out = CuckooFilter(self.n_buckets, self.table.copy())
        b, s = np.nonzero(other.table)
        out._place_pairs(b.astype(np.int64), other.table[b, s])
        return out

    def to_bytes(self) -> bytes:
        head = np.array([self.n_buckets, CUCKOO_SLOTS], dtype=np.int64).tobytes()
        return head + self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "CuckooFilter":
        n_buckets, slots = np.frombuffer(b[:16], dtype=np.int64)
        table = np.frombuffer(b[16:], dtype=np.uint16).reshape(int(n_buckets), int(slots)).copy()
        return cls(int(n_buckets), table)


@_dataclass
class ShardedCuckoo:
    """Handle for the sharded cuckoo seen-filter: (shard int, cuckoo
    binary) rows, one or more per shard (one per committed round; merge
    is fingerprint re-insertion, geometry fixed by construction)."""

    shards: DataFrame
    n_shards: int


def build_cuckoo_shards(
    df: DataFrame, hash_col: str, n_shards: int, expected_n: int
) -> DataFrame:
    """df -> one (shard, cuckoo) row per non-empty shard.

    Unlike the Bloom (partial bitmaps OR-merge, so partials shuffle), a
    cuckoo table has no lossless cheap union of PARTIALS at full size —
    so shuffle the raw 8-byte hashes by shard key instead (the same bytes
    the url_seen table append already shuffles) and build each shard's
    filter in a single pass inside its own task. Shards are sized with
    25% headroom over the even split to absorb shard-count variance."""
    n_buckets = cuckoo_params(max(16, expected_n * 5 // (4 * max(1, n_shards))))

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        cf = CuckooFilter(n_buckets)
        cf.add_many(pdf[hash_col].to_numpy(dtype=np.int64))
        return pd.DataFrame({"shard": pdf["__shard"].iloc[:1], "cuckoo": [cf.to_bytes()]})

    keyed = df.select(F.col(hash_col).cast("long").alias(hash_col)).withColumn(
        "__shard", bloom_shard_col(hash_col, n_shards)
    )
    return keyed.groupBy("__shard").applyInPandas(build, "shard int, cuckoo binary")


def merge_cuckoo_shards(shards: DataFrame) -> DataFrame:
    """Re-insertion merge of (shard, cuckoo) rows down to one per shard."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        cf = CuckooFilter.from_bytes(bytes(pdf["cuckoo"].iloc[0]))
        for blob in pdf["cuckoo"].iloc[1:]:
            cf = cf.union(CuckooFilter.from_bytes(bytes(blob)))
        return pd.DataFrame({"shard": pdf["shard"].iloc[:1], "cuckoo": [cf.to_bytes()]})

    return shards.select("shard", "cuckoo").groupBy("shard").applyInPandas(
        merge, "shard int, cuckoo binary"
    )


def delete_from_cuckoo_shards(
    shards: DataFrame, deletes: DataFrame, n_shards: int, hash_col: str = "url_hash"
) -> DataFrame:
    """Recrawl/TTL invalidation: remove the given url_hashes from their
    shards' filters and return the updated (shard, cuckoo) table — the
    operation a Bloom cannot express. Cogroup: each task touches one
    shard's bytes and its own deletion keys only; shards without
    deletions pass through merged-untouched."""

    def apply_del(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame({"shard": pd.Series([], dtype="int32"),
                                 "cuckoo": pd.Series([], dtype=object)})
        cf = CuckooFilter.from_bytes(bytes(left["cuckoo"].iloc[0]))
        for blob in left["cuckoo"].iloc[1:]:
            cf = cf.union(CuckooFilter.from_bytes(bytes(blob)))
        if len(right):
            cf.delete_many(right[hash_col].to_numpy(dtype=np.int64))
        return pd.DataFrame({"shard": left["shard"].iloc[:1], "cuckoo": [cf.to_bytes()]})

    keyed = deletes.select(F.col(hash_col).cast("long").alias(hash_col)).withColumn(
        "__shard", bloom_shard_col(hash_col, n_shards)
    )
    return (
        shards.groupBy("shard")
        .cogroup(keyed.groupBy("__shard"))
        .applyInPandas(apply_del, "shard int, cuckoo binary")
    )


def cuckoo_prune_sharded(
    candidates: DataFrame,
    cuckoo: ShardedCuckoo,
    hash_col: str = "url_hash",
    flag_col: str = "maybe_seen",
) -> DataFrame:
    """Sharded cuckoo twin of bloom_prune_sharded (cogroup probe; a task
    never sees another shard's table bytes)."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    out_cols = candidates.columns
    schema = StructType(list(candidates.schema.fields) + [StructField(flag_col, BooleanType())])
    cand = candidates.withColumn("__shard", bloom_shard_col(hash_col, cuckoo.n_shards))
    merged = merge_cuckoo_shards(cuckoo.shards)

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        out = left[out_cols].copy()
        if len(right) == 0 or len(left) == 0:
            out[flag_col] = np.zeros(len(left), dtype=bool)
            return out
        cf = CuckooFilter.from_bytes(bytes(right["cuckoo"].iloc[0]))
        out[flag_col] = cf.contains_many(left[hash_col].to_numpy(dtype=np.int64))
        return out

    return (
        cand.groupBy("__shard")
        .cogroup(merged.groupBy("shard"))
        .applyInPandas(probe, schema)
    )


def subtract_seen(
    candidates: DataFrame,
    url_seen: DataFrame | None,
    bloom: "BloomFilter | ShardedBloom | CuckooFilter | ShardedCuckoo | None" = None,
    hash_col: str = "url_hash",
    materialize: bool = False,
) -> DataFrame:
    """candidates minus seen — the EXCEPT of the engine (§2.2 set ops).

    Plan shape: [bloom prune (broadcast bitmap, or sharded cogroup at
    10^10 scale) -> ] left_anti join on url_hash for the maybe-seen
    remainder -> union with the definitely-new rows. With no url_seen yet,
    candidates pass through.

    The definitely-new / maybe-seen branches both read the pruned frame;
    inside the engine that frame is already part of plan_round's staged
    materialization, so the split is free. STANDALONE callers should pass
    ``materialize=True`` to localCheckpoint the pruned frame once instead
    of re-running the probe (and, for sharded filters, the filter build)
    per branch.
    """
    if url_seen is None:
        return candidates
    seen_keys = url_seen.select(F.col(hash_col)).distinct()
    if bloom is None:
        return candidates.join(seen_keys, on=hash_col, how="left_anti")
    if isinstance(bloom, ShardedBloom):
        pruned = bloom_prune_sharded(candidates, bloom, hash_col)
    elif isinstance(bloom, ShardedCuckoo):
        pruned = cuckoo_prune_sharded(candidates, bloom, hash_col)
    else:
        pruned = bloom_prune(candidates, bloom, hash_col)
    if materialize:
        pruned = pruned.localCheckpoint(eager=False)
    definitely_new = pruned.filter(~F.col("maybe_seen")).drop("maybe_seen")
    survivors = pruned.filter(F.col("maybe_seen")).drop("maybe_seen")
    checked = survivors.join(seen_keys, on=hash_col, how="left_anti")
    return definitely_new.unionByName(checked)
