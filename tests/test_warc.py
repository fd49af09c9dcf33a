"""WARC container source/sink: distributed export → import round trip,
byte-determinism across partitionings, and record-type filtering.
Codec-level cases (gzip members, truncation, resync) live in the pure
helpers and are covered here via the file-level paths that exercise
them.
"""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F

from raven_spark.sources.warc import (
    encode_response_record,
    iter_warc_records,
    parse_http_response,
    read_warc,
    write_warc,
)

TS = dt.datetime(2026, 1, 2, 3, 4, 5)


def _pages(spark, n=40):
    rows = [
        (
            f"https://host{i % 5}.example/p/{i}",
            TS + dt.timedelta(seconds=i),
            (f"<html><body><p>doc {i} body</p></body></html>").encode(
                "shift_jis" if i % 7 == 0 else "utf-8"
            ),
            "text/html; charset=shift_jis" if i % 7 == 0 else "text/html",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, content_type string"
    )


def test_warc_export_import_round_trip(spark, tmp_path):
    out = str(tmp_path / "warc")
    pages = _pages(spark)
    manifest = write_warc(
        pages, out, n_files=3, content_type_col="content_type"
    ).collect()
    assert sum(m["records"] for m in manifest) == 40
    assert {m["file_name"] for m in manifest} <= {
        f"part-{b:05d}.warc.gz" for b in range(3)
    }
    on_disk = sorted(os.path.basename(p) for p in glob.glob(f"{out}/*.warc.gz"))
    assert on_disk == sorted(m["file_name"] for m in manifest)
    assert not glob.glob(f"{out}/.*.tmp")  # atomic rename cleaned up

    back = read_warc(spark, f"{out}/*.warc.gz")
    got = {r["url"]: r for r in back.collect()}
    want = {r["url"]: r for r in pages.collect()}
    assert set(got) == set(want)
    for u, w in want.items():
        g = got[u]
        assert bytes(g["html"]) == bytes(w["html"])  # byte-identical body
        assert g["warc_ts"] == w["warc_ts"]
        assert g["http_status"] == 200
        assert g["content_type"] == w["content_type"]
        assert g["warc_type"] == "response"


def test_warc_export_bytes_partitioning_independent(spark, tmp_path):
    """Output files are a pure function of the input SET: same rows at
    different partitionings/orderings produce byte-identical WARCs (the
    determinism the module doc promises, needed for resume-safe
    re-exports and the q52 oracle)."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    pages = _pages(spark, 25)
    write_warc(pages.repartition(1), a, n_files=2,
               content_type_col="content_type").collect()
    shuffled = pages.repartition(7, "url").sortWithinPartitions(
        "warc_ts", ascending=False
    )
    write_warc(shuffled, b, n_files=2,
               content_type_col="content_type").collect()
    fa = sorted(glob.glob(f"{a}/*.warc.gz"))
    fb = sorted(glob.glob(f"{b}/*.warc.gz"))
    assert [os.path.basename(p) for p in fa] == [os.path.basename(p) for p in fb]
    for pa, pb in zip(fa, fb):
        with open(pa, "rb") as ha, open(pb, "rb") as hb:
            assert ha.read() == hb.read(), os.path.basename(pa)


def test_read_warc_filters_record_types(spark, tmp_path):
    """warcinfo/request/metadata records are dropped inside the scan
    (never cross Arrow); a mixed CC-style file yields only responses."""
    rec = encode_response_record(
        "https://x.example/a", "2026-01-02T03:04:05Z", b"<p>A</p>",
        gzip_member=False,
    )
    warcinfo = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Record-ID: <urn:uuid:00000000-0000-5000-8000-000000000001>\r\n"
        b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 14\r\n\r\n"
        b"software: test\r\n\r\n"
    )
    request = (
        b"WARC/1.0\r\n"
        b"WARC-Type: request\r\n"
        b"WARC-Record-ID: <urn:uuid:00000000-0000-5000-8000-000000000002>\r\n"
        b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        b"WARC-Target-URI: https://x.example/a\r\n"
        b"Content-Type: application/http; msgtype=request\r\n"
        b"Content-Length: 35\r\n\r\n"
        b"GET /a HTTP/1.1\r\nHost: x.example\r\n\r\n"
    )
    p = tmp_path / "mixed.warc"
    p.write_bytes(warcinfo + request + rec)
    rows = read_warc(spark, str(p)).collect()
    assert len(rows) == 1
    assert rows[0]["url"] == "https://x.example/a"
    assert bytes(rows[0]["html"]) == b"<p>A</p>"
    # and the codec itself sees all three
    assert len(list(iter_warc_records(p.read_bytes()))) == 3


def test_warc_pages_table_matches_golden_extraction(spark, tmp_path):
    """Full Common-Crawl import path: synthetic corpus (multi-charset
    shift_jis/euc-jp/cp1251 bodies with golden extracted text) → WARC
    export carrying each page's real Content-Type → ``warc_pages_table``
    re-import. The re-imported ``text`` must equal the corpus's golden
    ``text`` byte-for-byte (the north-rule invariant holds through the
    container), and lang-ID must reproduce."""
    from raven_spark.sources.corpus import generate_pages
    from raven_spark.sources.warc import warc_pages_table

    corpus = generate_pages(spark, n_pages=60, seed=7).withColumn(
        "content_type",
        F.concat(F.lit("text/html; charset="), F.col("charset")),
    )
    out = str(tmp_path / "cc")
    write_warc(corpus, out, n_files=2, content_type_col="content_type").collect()

    from raven_spark.functions.text import lang_id_col

    back = warc_pages_table(spark, f"{out}/*.warc.gz")
    got = {r["url"]: r for r in back.collect()}
    # lang reference = the same heuristic over the GOLDEN text (the
    # corpus's lang column is the generation label, which the heuristic
    # need not reproduce; the import path must be self-consistent)
    want = {
        r["url"]: r
        for r in corpus.withColumn("lang_id", lang_id_col(F.col("text"))).collect()
    }
    assert set(got) == set(want)
    n_nonascii = 0
    for u, w in want.items():
        g = got[u]
        assert bytes(g["html"]) == bytes(w["html"])
        assert g["text"] == w["text"], u  # byte-identical extraction
        assert g["lang"] == w["lang_id"], u
        if w["charset"] != "utf-8":
            n_nonascii += 1
    assert n_nonascii > 0  # the corpus actually exercised non-UTF-8 pages


def test_object_store_export_rejected():
    with pytest.raises(NotImplementedError):
        write_warc(None, "s3a://bucket/warcs", n_files=1)


def test_parse_http_response_non_http_block():
    st, hh, body = parse_http_response(b"not http at all")
    assert (st, hh, body) == (0, {}, b"not http at all")


def test_gzip_member_scan_is_chunked_and_robust():
    """The member scan feeds 1 MiB slices (never the whole remainder —
    O(members × bytes) memcpy at CC scale) and must survive members
    larger than one slice, many small members, trailing garbage, and a
    truncated final member."""
    from raven_spark.sources.warc import _gzip_member_chunks

    big = encode_response_record(
        "https://e.x/big", "2026-01-01T00:00:00Z", b"A" * (3 << 20)
    )
    small = [
        encode_response_record(f"https://e.x/{i}", "2026-01-01T00:00:00Z", b"b")
        for i in range(50)
    ]
    data = big + b"".join(small)
    recs = list(iter_warc_records(data))
    assert len(recs) == 51
    assert parse_http_response(recs[0]["block"])[2] == b"A" * (3 << 20)

    # trailing non-gzip garbage: every complete member still parses
    assert len(list(iter_warc_records(data + b"\x00garbage"))) == 51
    # truncated final member: prior records survive, the torn one drops
    assert len(list(iter_warc_records(data[:-20]))) == 50
    # decompressed byte equality against the one-shot reference decode
    import gzip as _gz
    assert b"".join(_gzip_member_chunks(data)) == _gz.decompress(data)


def test_warc_date_parsing_is_defensive():
    from raven_spark.sources.warc import _warc_date

    assert _warc_date(None) is None
    assert _warc_date("") is None
    assert _warc_date("not a date") is None
    ts = _warc_date("2026-01-02T03:04:05Z")
    assert ts is not None and ts.tzinfo is None
    assert str(ts) == "2026-01-02 03:04:05"
    # non-Z offsets normalize to UTC, not wall time
    assert str(_warc_date("2026-01-02T05:04:05+02:00")) == "2026-01-02 03:04:05"


def test_non_ascii_headers_round_trip():
    """Real crawl headers carry UTF-8 junk; the codec must not crash and
    must round-trip what it wrote."""
    rec = encode_response_record(
        "https://例え.jp/ページ",
        "2026-01-01T00:00:00Z",
        "本文".encode("utf-8"),
        content_type='text/html; charset="utf-8"; note=日本語',
    )
    [parsed] = list(iter_warc_records(rec))
    assert parsed["headers"]["warc-target-uri"] == "https://例え.jp/ページ"
    st, hh, body = parse_http_response(parsed["block"])
    assert st == 200
    assert hh["content-type"] == 'text/html; charset="utf-8"; note=日本語'
    assert body == "本文".encode("utf-8")
