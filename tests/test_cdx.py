"""CDX index: per-member offsets, spec digests, SURT keys, and the
random-access contract — every record re-readable from its (offset,
length) slice ALONE, across a shuffle boundary from where the index was
built. Codec-level cases run on the pure helpers (no Spark)."""

from __future__ import annotations

import base64
import datetime as dt
import gzip
import hashlib

from pyspark.sql import functions as F

from raven_spark.sources.cdx import (
    cdx_index,
    cdx_index_from_files,
    cdx_records,
    random_access_fetch,
)
from raven_spark.sources.warc import (
    encode_response_record,
    iter_gzip_members_with_offsets,
    iter_records_with_extents,
    read_warc,
    write_warc,
)

TS = dt.datetime(2026, 1, 2, 3, 4, 5)


def _pages(spark, n=40):
    rows = [
        (
            f"https://host{i % 5}.example/p/{i}",
            TS + dt.timedelta(seconds=i),
            (f"<html><body><p>cdx doc {i}</p></body></html>").encode("utf-8"),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )


def test_member_offsets_are_range_fetchable():
    """Each (offset, length) must decompress standalone with PLAIN
    gzip.decompress — the Range-GET contract, no shared state."""
    recs = [
        encode_response_record(
            f"https://e.x/{i}", "2026-01-01T00:00:00Z", b"x" * (100 * i + 1)
        )
        for i in range(20)
    ]
    data = b"".join(recs)
    members = list(iter_gzip_members_with_offsets(data))
    assert len(members) == 20
    assert members[0][0] == 0
    assert members[-1][0] + members[-1][1] == len(data)
    for (off, length, plain), original in zip(members, recs):
        assert data[off:off + length] == original
        assert gzip.decompress(data[off:off + length]) == plain
    # offsets are contiguous: member i+1 starts where i ends
    for (o1, l1, _), (o2, _, _) in zip(members, members[1:]):
        assert o1 + l1 == o2


def test_plain_record_extents():
    recs = [
        encode_response_record(
            f"https://e.x/{i}", "2026-01-01T00:00:00Z", b"b" * (i + 1),
            gzip_member=False,
        )
        for i in range(5)
    ]
    data = b"".join(recs)
    got = list(iter_records_with_extents(data))
    assert len(got) == 5
    for (start, length, rec), original in zip(got, recs):
        assert data[start:start + length] == original
        assert rec["headers"]["warc-target-uri"].endswith(
            str(got.index((start, length, rec)))
        )
    rows = cdx_records("f.warc", data)
    assert [(r[6], r[7]) for r in rows] == [(s, l) for s, l, _ in got]


def test_cdx_records_fields_and_digest():
    body = b"<html>hello</html>"
    data = encode_response_record(
        "https://www.example.com/a/b?x=1", "2026-01-02T03:04:05Z", body,
        content_type="text/html; charset=utf-8",
    )
    [row] = cdx_records("crawl-00001.warc.gz", data)
    url, wdate, wtype, mime, status, digest, off, length, fname = row
    assert url == "https://www.example.com/a/b?x=1"
    assert wdate == "2026-01-02T03:04:05Z"
    assert (wtype, mime, status) == ("response", "text/html", 200)
    assert digest == base64.b32encode(hashlib.sha1(body).digest()).decode()
    assert (off, length, fname) == (0, len(data), "crawl-00001.warc.gz")


def test_cdx_index_and_random_access_round_trip(spark, tmp_path):
    """End-to-end: export → index → fetch-by-range in a different task.
    Every record comes back byte-identical (digest equality joins the
    index row to its fetched payload) and the SURT key matches the
    engine's surt_col over the same URL."""
    out = str(tmp_path / "warcs")
    write_warc(_pages(spark), out, n_files=4).collect()

    files = spark.read.format("binaryFile").load(f"{out}/*.warc.gz")
    idx = cdx_index(files).cache()
    assert idx.count() == 40
    assert idx.where(F.col("surt").isNull()).count() == 0
    # surt clusters the corpus: host5 variants → 5 distinct prefixes
    pref = idx.select(
        F.split_part("surt", F.lit(")"), F.lit(1)).alias("p")
    ).distinct()
    assert pref.count() == 5
    assert all(r["p"].startswith("example,host") for r in pref.collect())

    fetched = random_access_fetch(files, idx)
    j = idx.alias("i").join(
        fetched.alias("f"),
        (F.col("i.warc_file") == F.col("f.warc_file"))
        & (F.col("i.offset") == F.col("f.offset")),
    )
    assert j.count() == 40
    assert j.where(F.col("i.digest") != F.col("f.digest")).count() == 0
    assert j.where(F.col("i.url") != F.col("f.url")).count() == 0
    # payloads really are the original bodies
    got = {
        r["url"]: bytes(r["payload"])
        for r in fetched.select("url", "payload").collect()
    }
    for r in _pages(spark).collect():
        assert got[r["url"]] == bytes(r["html"])


def test_cdx_glob_reader_matches_read_warc(spark, tmp_path):
    out = str(tmp_path / "warcs")
    write_warc(_pages(spark, 25), out, n_files=3).collect()
    idx = cdx_index_from_files(spark, f"{out}/*.warc.gz")
    via_read = read_warc(spark, f"{out}/*.warc.gz")
    assert idx.count() == via_read.count() == 25
    assert (
        idx.select("url").exceptAll(via_read.select("url")).count() == 0
    )


def test_whole_file_gzip_member_fetch_is_deduped(spark):
    """A whole-file-gzip WARC (ONE member, k records) indexes every
    record at the member extent; the fetch must decompress that range
    once and emit k rows, not k^2 (review finding)."""
    k = 7
    plain = b"".join(
        encode_response_record(
            f"https://w.example/{i}", "2026-01-01T00:00:00Z",
            f"body {i}".encode(), gzip_member=False,
        )
        for i in range(k)
    )
    blob = gzip.compress(plain)
    rows = cdx_records("whole.warc.gz", blob)
    assert len(rows) == k
    assert {(r[6], r[7]) for r in rows} == {(0, len(blob))}  # member extent
    files = spark.createDataFrame(
        [("whole.warc.gz", bytearray(blob))], "path string, content binary"
    )
    idx = cdx_index(files)
    fetched = random_access_fetch(files, idx)
    got = fetched.collect()
    assert len(got) == k  # not k^2
    by_url = {r["url"]: r for r in got}
    assert bytes(by_url["https://w.example/3"]["payload"]) == b"body 3"


def _capture_pages(spark):
    """12 docs x 3 mirror captures; payload depends only on doc_id % 4,
    so there are 4 digest groups of 9 captures each (3 docs x 3
    mirrors per payload)."""
    rows = []
    for doc in range(12):
        body = f"<html><body>payload {doc % 4}</body></html>".encode()
        for cap in range(3):
            rows.append((
                f"https://m{cap}.h{doc % 5}.example/p/{doc}",
                TS + dt.timedelta(hours=cap, seconds=doc),
                body,
            ))
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )


def test_revisit_resolve_earliest_canonical(spark, tmp_path):
    """Digest dedup picks the EARLIEST capture per payload group as
    canonical; all others are revisits referencing it; n_captures is
    the group size; output is partitioning-independent."""
    from raven_spark.sources.cdx import revisit_resolve

    out = str(tmp_path / "warcs")
    write_warc(_capture_pages(spark), out, n_files=4).collect()
    idx = cdx_index_from_files(spark, f"{out}/*.warc.gz")
    res = revisit_resolve(idx).cache()

    assert res.count() == 36
    assert res.where("n_captures != 9").count() == 0
    assert res.where("not is_revisit").count() == 4  # one canon per digest
    # canonical is min (warc_date, url): hour-0 captures sort first, and
    # within hour 0 the smallest (date, url) — doc == payload group id
    # has second-offset == group id, the earliest in its group.
    canons = {
        r["digest"]: r for r in res.where("not is_revisit").collect()
    }
    for d, r in canons.items():
        assert r["url"].startswith("https://m0."), r["url"]
        assert r["canon_url"] == r["url"]
        assert r["canon_offset"] == r["offset"]
        assert r["canon_warc_file"] == r["warc_file"]
    # every revisit references its group's canonical exactly
    for r in res.where("is_revisit").collect():
        c = canons[r["digest"]]
        assert (r["canon_url"], r["canon_warc_date"]) == (
            c["url"], c["warc_date"]
        )
        assert (r["canon_warc_file"], r["canon_offset"]) == (
            c["warc_file"], c["offset"]
        )
    # partitioning-independent: same rows under a different layout
    res2 = revisit_resolve(idx.repartition(13)).orderBy("url", "offset")
    assert [tuple(r) for r in res2.collect()] == [
        tuple(r) for r in res.orderBy("url", "offset").collect()
    ]


def test_revisit_resolve_non_response_passthrough(spark):
    """Non-response records (warcinfo/metadata) pass through with NULL
    revisit fields — revisit semantics only apply to captures."""
    from raven_spark.sources.cdx import revisit_resolve

    idx = spark.createDataFrame(
        [
            ("https://a.example/", "2026-01-01T00:00:00Z", "response",
             "text/html", 200, "DIGA", 0, 100, "f1", "example,a)/"),
            ("https://a.example/", "2026-01-02T00:00:00Z", "response",
             "text/html", 200, "DIGA", 100, 100, "f1", "example,a)/"),
            (None, "2026-01-01T00:00:00Z", "warcinfo",
             "application/warc-fields", 0, "DIGW", 200, 50, "f1", None),
        ],
        "url string, warc_date string, warc_type string, mime string, "
        "http_status int, digest string, offset long, length long, "
        "warc_file string, surt string",
    )
    res = revisit_resolve(idx)
    rows = {(r["warc_type"], r["offset"]): r for r in res.collect()}
    assert rows[("warcinfo", 200)]["is_revisit"] is None
    assert rows[("warcinfo", 200)]["n_captures"] is None
    assert rows[("response", 0)]["is_revisit"] is False
    assert rows[("response", 100)]["is_revisit"] is True
    assert rows[("response", 100)]["canon_url"] == "https://a.example/"
    assert rows[("response", 100)]["canon_offset"] == 0


def test_revisit_canonical_parses_dates_and_is_unique(spark):
    """Review findings: (1) the canonical pick must compare WARC-Dates
    as INSTANTS — a '+09:00' capture at an earlier instant beats a 'Z'
    capture that sorts later lexicographically; missing/malformed dates
    sort LAST; (2) byte-identical index rows (duplicate captures inside
    one multi-record member share an extent) still yield EXACTLY one
    canonical per digest group."""
    from raven_spark.sources.cdx import revisit_resolve

    schema = (
        "url string, warc_date string, warc_type string, mime string, "
        "http_status int, digest string, offset long, length long, "
        "warc_file string, surt string"
    )
    idx = spark.createDataFrame(
        [
            # group A: +09:00 row is 03:00:00Z — EARLIER than 04:00:00Z
            ("https://a.example/z", "2026-01-01T04:00:00Z", "response",
             "text/html", 200, "DIGA", 0, 10, "f1", "s"),
            ("https://a.example/jst", "2026-01-01T12:00:00+09:00",
             "response", "text/html", 200, "DIGA", 10, 10, "f1", "s"),
            # group B: malformed + missing dates lose to any parseable one
            ("https://b.example/bad", "not-a-date", "response",
             "text/html", 200, "DIGB", 20, 10, "f1", "s"),
            ("https://b.example/none", None, "response",
             "text/html", 200, "DIGB", 30, 10, "f1", "s"),
            ("https://b.example/ok", "2030-01-01T00:00:00Z", "response",
             "text/html", 200, "DIGB", 40, 10, "f1", "s"),
            # group C: two byte-identical rows (shared member extent)
            ("https://c.example/", "2026-01-01T00:00:00Z", "response",
             "text/html", 200, "DIGC", 50, 10, "f1", "s"),
            ("https://c.example/", "2026-01-01T00:00:00Z", "response",
             "text/html", 200, "DIGC", 50, 10, "f1", "s"),
        ],
        schema,
    )
    res = revisit_resolve(idx).cache()
    by_url = {
        (r["url"], r["offset"]): r
        for r in res.where("digest != 'DIGC'").collect()
    }
    assert by_url[("https://a.example/jst", 10)]["is_revisit"] is False
    assert by_url[("https://a.example/z", 0)]["is_revisit"] is True
    assert by_url[("https://a.example/z", 0)]["canon_url"] == (
        "https://a.example/jst"
    )
    assert by_url[("https://b.example/ok", 40)]["is_revisit"] is False
    assert by_url[("https://b.example/bad", 20)]["is_revisit"] is True
    assert by_url[("https://b.example/none", 30)]["is_revisit"] is True
    c = res.where("digest = 'DIGC'").collect()
    assert sorted(r["is_revisit"] for r in c) == [False, True]
    assert all(r["n_captures"] == 2 for r in c)


def test_write_read_cdx_partition_pruning(spark, tmp_path):
    """The persisted CDX layout delivers the module-doc promise: a
    per-domain lookup reaches the scan as a PARTITION filter (directory
    pruning on surt_prefix) plus a data filter on the sorted surt
    column — asserted in the physical plan, and the pruned read returns
    exactly the manual filter's rows."""
    from raven_spark.sources.cdx import read_cdx, write_cdx

    out = str(tmp_path / "warcs")
    write_warc(_pages(spark, 60), out, n_files=4).collect()
    idx = cdx_index_from_files(spark, f"{out}/*.warc.gz")
    cdx_dir = str(tmp_path / "cdx")
    write_cdx(idx, cdx_dir, prefix_len=4)

    # one host -> surt 'example,host3)/p/N'
    key = "example,host3)"
    got = read_cdx(spark, cdx_dir, surt_starts_with=key)
    want = idx.where(F.col("surt").startswith(key))
    assert got.count() == want.count() == 12  # 60 pages, 5 hosts
    assert (
        got.select("url").exceptAll(want.select("url")).count() == 0
    )
    # toString() truncates long FileScan lines; "formatted" prints the
    # PartitionFilters section in full
    qe = got._jdf.queryExecution()
    jvm = spark._jvm
    plan = qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    assert "StartsWith(surt_prefix" in plan  # directory pruning
    assert "StringStartsWith(surt,example,host3)" in plan  # rowgroup skip
    # unfiltered read returns everything
    assert read_cdx(spark, cdx_dir).count() == 60


def test_read_cdx_derives_stored_prefix_length(spark, tmp_path):
    """A layout written with a non-default prefix length still prunes
    correctly: read_cdx probes the stored length instead of trusting a
    hardcoded one (a mismatch would silently read as 'no captures')."""
    from raven_spark.sources.cdx import read_cdx, write_cdx

    out = str(tmp_path / "warcs")
    write_warc(_pages(spark, 30), out, n_files=2).collect()
    idx = cdx_index_from_files(spark, f"{out}/*.warc.gz")
    cdx_dir = str(tmp_path / "cdx2")
    write_cdx(idx, cdx_dir, prefix_len=2)  # stores 2-char prefixes
    got = read_cdx(spark, cdx_dir, surt_starts_with="example,host2)")
    assert got.count() == idx.where(
        F.col("surt").startswith("example,host2)")
    ).count() > 0
