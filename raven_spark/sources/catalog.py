"""Catalog seam — the Iceberg-shaped table contract with a Parquet fallback.

BASELINE.json mandates Iceberg tables for frontier/url_seen/pages/metrics.
This sandbox ships no Iceberg runtime jar, so the engine talks to a small
``Catalog`` protocol instead of a format:

- append(name, df, round_no): atomic append of a round's delta
- read(name, upto_round=None): snapshot-as-of semantics (all deltas with
  round <= upto_round) — this IS Iceberg's snapshot/time-travel contract,
  realized as round-partitioned Parquet directories
- exists / last_round: resume support

``IcebergCatalog`` implements the same protocol with real Iceberg DDL
(`CREATE TABLE ... USING iceberg`, `df.writeTo(...).append()`,
`VERSION AS OF`); it activates only when the session has the Iceberg
extension loaded, so prod clusters get snapshots/ACID for free while the
engine code stays identical.

Round-partitioned appends are the Spark analogue of the reference's
group-by-destination bulk writes into daily ES indexes
(instances.rs:124-159, index name metrics.rs:75).
"""

from __future__ import annotations

import json
import os
import time
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Catalog(Protocol):
    def append(self, name: str, df: DataFrame, round_no: int) -> None: ...

    def read(
        self, name: str, upto_round: int | None = None, from_round: int | None = None
    ) -> DataFrame | None: ...

    def exists(self, name: str) -> bool: ...

    def last_round(self, name: str) -> int | None: ...

    def compact(self, name: str, upto_round: int | None = None) -> bool: ...


class ParquetCatalog:
    """Round-partitioned Parquet directories under a state root.

    Layout: ``{root}/{table}/round={N}/*.parquet`` plus a ``_manifest.json``
    per table recording committed rounds (a committed round is one whose
    write finished AND was recorded — the crash-consistency token that
    makes resume exact; a torn write without a manifest entry is invisible
    to readers, like an uncommitted Iceberg snapshot).

    The root may be a plain local path OR any Hadoop-filesystem URI
    (``file:/...``, ``s3a://bucket/prefix`` — persist_method.rs:7-17's
    AmazonS3 sink maps to an s3a root via ``catalog_for_sink``). URI
    roots route manifest I/O through the JVM Hadoop FileSystem API — the
    exact code path an S3A deployment uses; the parquet data writes
    already go through Spark, which speaks any registered scheme.
    In-sandbox the URI path is exercised with ``file:/`` (no S3 endpoint
    or hadoop-aws jar here); S3A retry/committer behavior is Hadoop
    configuration, not engine code (s3.rs:18-42's retry x5 ->
    fs.s3a.retry.limit).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._is_uri = "://" in root or root.startswith("file:/")
        if not self._is_uri:
            os.makedirs(root, exist_ok=True)

    # -- manifest -----------------------------------------------------------

    def _join(self, *parts: str) -> str:
        if self._is_uri:
            return "/".join([self.root.rstrip("/"), *parts])
        return os.path.join(self.root, *parts)

    def _manifest_path(self, name: str) -> str:
        return self._join(name, "_manifest.json")

    def _hfs(self, path_str: str):
        """(FileSystem, Path) for a URI via the JVM Hadoop API."""
        jvm = self.spark.sparkContext._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path_str)
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        return jpath.getFileSystem(conf), jpath

    def _load_manifest(self, name: str) -> dict:
        p = self._manifest_path(name)
        if self._is_uri:
            fs, jp = self._hfs(p)
            if not fs.exists(jp):
                return {"rounds": [], "counts": {}}
            stream = fs.open(jp)
            try:
                # commons-io ships on Spark's classpath; returning byte[]
                # crosses py4j as Python bytes (mutated byte[] args do NOT
                # cross back, so no read-into-buffer loop here)
                jvm = self.spark.sparkContext._jvm
                data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
            finally:
                stream.close()
            return json.loads(data.decode("utf-8"))
        if not os.path.exists(p):
            return {"rounds": [], "counts": {}}
        with open(p) as f:
            return json.load(f)

    def _is_object_store(self) -> bool:
        return self.root.split("://", 1)[0] in ("s3a", "s3n", "s3", "gs", "oss", "wasb", "abfs", "abfss")

    def _put_uri(self, path_str: str, data: bytes) -> None:
        """Crash-consistent small-object write through the Hadoop FS API.

        Object stores (s3a & co.): a direct create(overwrite) IS a single
        atomic PUT. Filesystem schemes (file:/, hdfs:/): direct create is
        NOT atomic — a crash mid-write leaves a torn manifest that breaks
        resume — so write a sibling .tmp and rename() onto the target
        (atomic on file:/ and HDFS), mirroring the local os.replace path."""
        fs, jp = self._hfs(path_str)
        if self._is_object_store():
            out = fs.create(jp, True)
            try:
                out.write(data)
            finally:
                out.close()
            return
        _fs, jtmp = self._hfs(path_str + ".tmp")
        out = fs.create(jtmp, True)
        try:
            out.write(data)
        finally:
            out.close()
        if not fs.rename(jtmp, jp):  # dest exists on FS w/o overwrite-rename
            fs.delete(jp, False)
            if not fs.rename(jtmp, jp):
                raise IOError(f"atomic rename failed: {path_str}")

    def _save_manifest(self, name: str, manifest: dict) -> None:
        p = self._manifest_path(name)
        data = json.dumps(manifest, indent=1, sort_keys=True).encode("utf-8")
        if self._is_uri:
            self._put_uri(p, data)
            return
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)  # atomic commit

    # -- sidecar blobs (Bloom filters etc.) ---------------------------------

    def write_blob(self, relpath: str, data: bytes) -> None:
        """Write an opaque sidecar object under the root (e.g. a round's
        Bloom bitmap) — through Hadoop FS for URI roots, plain files
        locally. Parent directories are created as needed."""
        p = self._join(*relpath.split("/"))
        if self._is_uri:
            self._put_uri(p, data)
            return
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)

    def read_blob(self, relpath: str) -> bytes | None:
        p = self._join(*relpath.split("/"))
        if self._is_uri:
            fs, jp = self._hfs(p)
            if not fs.exists(jp):
                return None
            stream = fs.open(jp)
            try:
                jvm = self.spark.sparkContext._jvm
                return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
            finally:
                stream.close()
        if not os.path.exists(p):
            return None
        with open(p, "rb") as f:
            return f.read()

    # -- contract -----------------------------------------------------------

    def append(self, name: str, df: DataFrame, round_no: int) -> None:
        path = self._join(name, f"round={round_no}")
        if "round" in df.columns:
            # the partition directory IS the round column; a duplicate data
            # column would shadow it on read (COLUMN_ALREADY_EXISTS)
            df = df.drop("round")
        manifest = self._load_manifest(name)
        # idempotence guard: re-appending a LIVE round overwrites its dir
        # (crash-retry safe), but a round already folded into a compacted
        # segment cannot be overwritten — the rows would exist twice. The
        # engine keeps this unreachable (compaction is bounded at the
        # current round - 1; __init__ skips the robots prefetch on
        # resume); failing loudly here turns any future caller's silent
        # duplication into an immediate error.
        for lo, hi in manifest.get("segments", []):
            if lo <= round_no <= hi:
                raise ValueError(
                    f"append({name!r}, round={round_no}): round is inside "
                    f"compacted segment [{lo}, {hi}] — re-appending would "
                    "duplicate its rows; write to a new round instead"
                )
        df.write.mode("overwrite").parquet(path)  # idempotent per round
        if round_no not in manifest["rounds"]:
            manifest["rounds"].append(round_no)
            manifest["rounds"].sort()
        manifest.setdefault("committed_at", {})[str(round_no)] = time.time()
        self._save_manifest(name, manifest)

    def read(
        self, name: str, upto_round: int | None = None, from_round: int | None = None
    ) -> DataFrame | None:
        manifest = self._load_manifest(name)
        rounds = [
            r for r in manifest["rounds"]
            if (upto_round is None or r <= upto_round)
            and (from_round is None or r >= from_round)
        ]
        # compacted segments whose [lo, hi] span OVERLAPS the window join
        # the scan; rows outside the window are cut by the row-level round
        # filter below (round is a DATA column inside a segment, so any
        # window boundary stays exact even mid-segment)
        segs = [
            (lo, hi) for lo, hi in manifest.get("segments", [])
            if (upto_round is None or lo <= upto_round)
            and (from_round is None or hi >= from_round)
        ]
        if not rounds and not segs:
            return None
        dfs = []
        if rounds:
            paths = [self._join(name, f"round={r}") for r in rounds]
            dfs.append(
                self.spark.read.option("basePath", self._join(name)).parquet(*paths)
            )
        for lo, hi in segs:
            dfs.append(self.spark.read.parquet(self._join(name, f"segment_{lo}_{hi}")))
        df = dfs[0]
        for other in dfs[1:]:
            df = df.unionByName(other)
        if segs and "round" in df.columns:
            if from_round is not None:
                df = df.filter(F.col("round") >= from_round)
            if upto_round is not None:
                df = df.filter(F.col("round") <= upto_round)
        return df

    def compact(self, name: str, upto_round: int | None = None) -> bool:
        """Merge the table's per-round delta directories (and any earlier
        segments) up to ``upto_round`` into ONE segment directory — the
        Iceberg rewrite_data_files analogue for the Parquet fallback. A
        10^4-round crawl otherwise lists 10^4 directories (and their
        footers) on EVERY windowed read; after compaction the history is
        one columnar segment with ``round`` as an ordinary column, so
        windowed reads (TTL, resume) stay exact via row-level filtering
        and benefit from parquet min/max round stats.

        Crash-consistent like append: the segment is fully written before
        the manifest flips to it (a torn segment is unreferenced); source
        directories are removed best-effort AFTER the manifest commit
        (orphans are invisible to readers). Returns True if a merge ran.
        """
        manifest = self._load_manifest(name)
        rounds = [
            r for r in manifest["rounds"] if upto_round is None or r <= upto_round
        ]
        segs = [
            (lo, hi) for lo, hi in manifest.get("segments", [])
            if upto_round is None or hi <= upto_round
        ]
        if len(rounds) + len(segs) < 2:
            return False  # nothing to merge
        df = self.read(name, upto_round=upto_round)
        bounds = [*rounds, *(b for s in segs for b in s)]
        lo, hi = min(bounds), max(bounds)
        out = df.withColumn("round", F.col("round").cast("int"))
        out.write.mode("overwrite").parquet(self._join(name, f"segment_{lo}_{hi}"))
        manifest["rounds"] = [r for r in manifest["rounds"] if r not in set(rounds)]
        manifest["segments"] = sorted(
            [list(s) for s in manifest.get("segments", []) if tuple(s) not in set(segs)]
            + [[lo, hi]]
        )
        self._save_manifest(name, manifest)
        for r in rounds:
            self._rm(self._join(name, f"round={r}"))
        for slo, shi in segs:
            if (slo, shi) != (lo, hi):
                self._rm(self._join(name, f"segment_{slo}_{shi}"))
        return True

    def _rm(self, path_str: str) -> None:
        """Best-effort recursive delete (post-commit cleanup only — a
        survivor is an invisible orphan, never a correctness issue)."""
        try:
            if self._is_uri:
                fs, jp = self._hfs(path_str)
                fs.delete(jp, True)
                return
            import shutil

            shutil.rmtree(path_str, ignore_errors=True)
        except Exception:  # noqa: BLE001
            pass

    def exists(self, name: str) -> bool:
        m = self._load_manifest(name)
        return bool(m["rounds"] or m.get("segments"))

    def last_round(self, name: str) -> int | None:
        m = self._load_manifest(name)
        cands = list(m["rounds"]) + [hi for _lo, hi in m.get("segments", [])]
        return max(cands) if cands else None


class IcebergCatalog:
    """Same contract over real Iceberg tables. Requires the session to be
    built with the Iceberg Spark runtime (not present in this sandbox —
    exercised only via its contract tests shared with ParquetCatalog).
    """

    def __init__(self, spark: SparkSession, namespace: str):
        self.spark = spark
        self.namespace = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {namespace}")

    def _t(self, name: str) -> str:
        return f"{self.namespace}.{name}"

    def append(self, name: str, df: DataFrame, round_no: int) -> None:
        df = df.withColumn("round", F.lit(round_no))
        if not self.spark.catalog.tableExists(self._t(name)):
            df.writeTo(self._t(name)).partitionedBy(F.col("round")).create()
        else:
            df.writeTo(self._t(name)).append()

    def read(
        self, name: str, upto_round: int | None = None, from_round: int | None = None
    ) -> DataFrame | None:
        if not self.spark.catalog.tableExists(self._t(name)):
            return None
        df = self.spark.table(self._t(name))
        if upto_round is not None:
            df = df.filter(F.col("round") <= upto_round)
        if from_round is not None:
            df = df.filter(F.col("round") >= from_round)
        return df

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._t(name))

    def last_round(self, name: str) -> int | None:
        if not self.exists(name):
            return None
        row = self.spark.table(self._t(name)).agg(F.max("round")).first()
        return row[0]

    def compact(self, name: str, upto_round: int | None = None) -> bool:
        """Small-file maintenance on Iceberg is the engine's own
        ``rewrite_data_files`` procedure (table layout is unchanged —
        round stays a data column); run it out-of-band via CALL when the
        runtime ships the procedures. No-op here."""
        return False


def catalog_for_sink(spark: SparkSession, method) -> Catalog:
    """PersistMethod -> Catalog (the P1 fan-out builds one per sink).

    - local_file / parquet: ParquetCatalog rooted at the local path
    - s3: ParquetCatalog rooted at ``s3a://{bucket}/{object_key}`` — the
      Spark-native S3 sink (persist_method.rs:7-17, s3.rs:12-43). Requires
      hadoop-aws + credentials on a real cluster; fs.s3a.* conf carries
      region/retry (s3.rs:18-42), not engine code.
    - iceberg: IcebergCatalog in the named namespace.
    """
    if method.kind in ("local_file", "parquet"):
        return ParquetCatalog(spark, method.path)
    if method.kind == "s3":
        if not method.bucket:
            raise ValueError("s3 sink requires bucket_name")
        root = f"s3a://{method.bucket}/{method.path.lstrip('/')}"
        return ParquetCatalog(spark, root)
    if method.kind == "iceberg":
        return IcebergCatalog(spark, method.path)
    raise ValueError(f"unknown sink kind: {method.kind}")
