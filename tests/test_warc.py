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


def test_duplicate_url_export_is_partitioning_independent(spark, tmp_path):
    """Recrawls carry the same url at different times/bodies; the
    in-bucket sort needs (date, body-hash) tiebreaks or output bytes
    depend on shuffle-arrival order (review finding)."""
    rows = []
    for i in range(6):
        for cap in range(3):  # 3 captures per url, distinct ts + body
            rows.append((
                f"https://dup.example/p/{i}",
                TS + dt.timedelta(hours=cap),
                f"<html>capture {cap} of {i}</html>".encode(),
            ))
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )
    blobs = {}
    for parts in (1, 7):
        out = str(tmp_path / f"w{parts}")
        write_warc(df.repartition(parts), out, n_files=2).collect()
        blobs[parts] = {
            os.path.basename(p): open(p, "rb").read()
            for p in glob.glob(f"{out}/*.warc.gz")
        }
    assert blobs[1] == blobs[7]


def test_negative_content_length_resyncs():
    """'Content-Length: -1' must not swallow the rest of the stream
    (review finding: int() accepts it; len(rest) < -1 is never true)."""
    from raven_spark.sources.warc import iter_records_with_extents

    good1 = encode_response_record(
        "https://e.x/1", "2026-01-01T00:00:00Z", b"one", gzip_member=False
    )
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://e.x/bad\r\n"
        b"Content-Length: -1\r\n\r\n"
    )
    good2 = encode_response_record(
        "https://e.x/2", "2026-01-01T00:00:00Z", b"two", gzip_member=False
    )
    for data in (good1 + bad + good2, bad + good1 + good2):
        urls = [
            r["headers"]["warc-target-uri"]
            for r in iter_warc_records(data)
        ]
        assert urls == ["https://e.x/1", "https://e.x/2"]
        urls2 = [
            r["headers"]["warc-target-uri"]
            for _s, _l, r in iter_records_with_extents(data)
        ]
        assert urls2 == ["https://e.x/1", "https://e.x/2"]


def test_warc_dates_are_true_utc_under_any_session_tz(spark, tmp_path):
    """WARC-Date must be the row's UTC instant and output bytes must
    not depend on spark.sql.session.timeZone; reading back under a
    non-UTC session must restore the same instants (review finding:
    date_format renders session wall time; naive Arrow timestamps are
    reinterpreted as session-local)."""
    df = _pages(spark, 8)  # instants fixed while the session is UTC
    out_utc = str(tmp_path / "utc")
    write_warc(df, out_utc, n_files=2).collect()
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    assert tz0 == "UTC"
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        out_ny = str(tmp_path / "ny")
        write_warc(df, out_ny, n_files=2).collect()
        for p in glob.glob(f"{out_utc}/*.warc.gz"):
            q = os.path.join(out_ny, os.path.basename(p))
            assert open(p, "rb").read() == open(q, "rb").read()
        # raw header check: the stamped date IS the UTC instant
        blob = open(sorted(glob.glob(f"{out_ny}/*.warc.gz"))[0], "rb").read()
        dates = {
            r["headers"]["warc-date"] for r in iter_warc_records(blob)
        }
        assert all(d.startswith("2026-01-02T03:04:") for d in dates)
        # read back under the NY session: instants (not wall times) match
        back = read_warc(spark, f"{out_ny}/*.warc.gz")
        rendered = back.select(
            F.date_format(
                F.to_utc_timestamp("warc_ts", "America/New_York"),
                "yyyy-MM-dd'T'HH:mm:ss'Z'",
            ).alias("d"),
            "url",
        ).collect()
        for r in rendered:
            i = int(r["url"].rsplit("/", 1)[1])
            want = (TS + dt.timedelta(seconds=i)).strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            )
            assert r["d"] == want, r["url"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_deduped_export_and_reconstruction(spark, tmp_path):
    """Revisit-record dedup round trip (ISO 28500 identical-payload-
    digest profile): duplicate payloads are stored once, every other
    capture becomes a revisit stub, and reconstruction restores the full
    corpus byte-identically."""
    import datetime as dt

    from pyspark.sql import functions as F

    from raven_spark.sources.warc import (
        read_warc,
        reconstruct_from_revisits,
        sha1_b32,
        write_warc,
    )

    import hashlib

    def big_body(k: int) -> bytes:
        # ~4 KB of deterministic incompressible bytes per payload so the
        # size assertion reflects real dedup wins (a revisit stub is
        # ~300 gzipped bytes — bigger than a toy payload, smaller than
        # any real page)
        chunks, seed = [], f"payload {k}".encode()
        for i in range(128):
            seed = hashlib.sha256(seed + bytes([i])).digest()
            chunks.append(seed)
        return b"<html><body>" + seed.hex().encode() + b"".join(chunks)

    ts0 = dt.datetime(2026, 1, 2, 3, 4, 5)
    # 24 captures, 6 distinct payloads (doc % 6), later mirrors dup
    rows = [
        (
            f"https://m{i // 6}.example/p/{i % 6}",
            ts0 + dt.timedelta(hours=i // 6),
            big_body(i % 6),
        )
        for i in range(24)
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )
    root = str(tmp_path / "dedup")
    manifest = write_warc(df, root, n_files=3, dedupe=True).collect()
    assert sum(m["records"] for m in manifest) == 24

    back = read_warc(
        spark, f"{root}/*.warc.gz", warc_types=("response", "revisit")
    ).cache()
    resp = back.where("warc_type = 'response'").collect()
    revs = back.where("warc_type = 'revisit'").collect()
    assert len(resp) == 6 and len(revs) == 18
    # canonical is the earliest capture (hour 0 == mirror m0)
    assert all(r["url"].startswith("https://m0.") for r in resp)
    bodies = {r["url"]: bytes(r["html"]) for r in resp}
    # revisit stubs carry no payload but name their original + digest
    for r in revs:
        assert bytes(r["html"]) == b""
        assert r["refers_to_uri"] in bodies
        assert r["refers_to_date"] == "2026-01-02T03:04:05Z"
        assert r["payload_digest"] == "sha1:" + sha1_b32(
            bodies[r["refers_to_uri"]]
        )
    # deduped files really are smaller than the plain export
    plain_root = str(tmp_path / "plain")
    plain = write_warc(df, plain_root, n_files=3).collect()
    assert sum(m["bytes"] for m in manifest) < sum(
        m["bytes"] for m in plain
    )

    restored = reconstruct_from_revisits(back)
    got = {
        (r["url"], r["warc_ts"]): r for r in restored.collect()
    }
    assert len(got) == 24
    for url, ts, body in rows:
        r = got[(url, ts)]
        assert bytes(r["html"]) == body
        assert r["http_status"] == 200
        assert r["content_type"] == "text/html"
        assert r["was_revisit"] is (not url.startswith("https://m0."))


def test_deduped_export_bytes_partition_independent(spark, tmp_path):
    """Deduped output bytes are a pure function of the input SET."""
    import datetime as dt

    from raven_spark.sources.warc import assemble_warc_files_deduped

    ts0 = dt.datetime(2026, 1, 2, 3, 4, 5)
    rows = [
        (
            f"https://h{i % 3}.example/{i}",
            ts0 + dt.timedelta(seconds=i % 4),
            f"<html>{i % 5}</html>".encode(),
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )
    a = {
        r["file_name"]: bytes(r["content"])
        for r in assemble_warc_files_deduped(df, 4).collect()
    }
    b = {
        r["file_name"]: bytes(r["content"])
        for r in assemble_warc_files_deduped(df.repartition(17), 4).collect()
    }
    assert a == b and len(a) == 4


def test_reconstruction_orphan_and_exact_duplicates(spark, tmp_path):
    """Review findings: (a) an orphan revisit (original not in the read
    set) is flagged restored=false instead of silently null; (b) an
    EXACT duplicate capture (same url, ts, body) dedupes into one
    response + one self-referencing stub with deterministic bytes
    (the __revisit sort tiebreak)."""
    import datetime as dt

    from raven_spark.sources.warc import (
        assemble_warc_files_deduped,
        read_warc,
        reconstruct_from_revisits,
        write_warc,
    )

    ts0 = dt.datetime(2026, 1, 2, 3, 4, 5)
    dup = ("https://dup.example/", ts0, b"<html>same</html>")
    df = spark.createDataFrame(
        [dup, dup, ("https://other.example/", ts0, b"<html>other</html>")],
        "url string, warc_ts timestamp, html binary",
    )
    a = {
        r["file_name"]: bytes(r["content"])
        for r in assemble_warc_files_deduped(df, 2).collect()
    }
    b = {
        r["file_name"]: bytes(r["content"])
        for r in assemble_warc_files_deduped(df.repartition(7), 2).collect()
    }
    assert a == b  # exact-duplicate tie is ordered by the revisit flag

    root = str(tmp_path / "dup")
    write_warc(df, root, n_files=2, dedupe=True).collect()
    back = read_warc(
        spark, f"{root}/*.warc.gz", warc_types=("response", "revisit")
    )
    restored = reconstruct_from_revisits(back)
    rows = restored.where("url = 'https://dup.example/'").collect()
    assert sorted(r["was_revisit"] for r in rows) == [False, True]
    for r in rows:  # the stub restores its own payload back
        assert bytes(r["html"]) == b"<html>same</html>"
        assert r["restored"] is True

    # orphan: read ONLY the file(s) holding revisit stubs whose original
    # lives in the other file -> restored=false, html null, no crash
    import glob

    for f in sorted(glob.glob(f"{root}/*.warc.gz")):
        only = read_warc(
            spark, f, warc_types=("response", "revisit")
        )
        rec = reconstruct_from_revisits(only)
        orphans = rec.where("was_revisit AND NOT restored").collect()
        for o in orphans:
            assert o["html"] is None
            assert o["refers_to_uri"] is not None


def test_wet_export_import_round_trip(spark, tmp_path):
    """WET (extracted-text conversion records): export → import yields
    the exact text; records cross-reference the paired WARC export's
    response record ids by construction; bytes are partitioning-
    independent like every other exporter here."""
    import datetime as dt
    import uuid as uuid_mod

    from raven_spark.sources.warc import (
        assemble_wet_files,
        iter_warc_records,
        read_wet,
        write_wet,
    )

    ts0 = dt.datetime(2026, 1, 2, 3, 4, 5)
    rows = [
        (
            f"https://w{i % 4}.example/p/{i}",
            ts0 + dt.timedelta(seconds=i),
            f"extracted text of page {i} — naïve café é{i}",
        )
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    root = str(tmp_path / "wet")
    manifest = write_wet(df, root, n_files=3).collect()
    assert sum(m["records"] for m in manifest) == 30
    assert all(m["file_name"].endswith(".warc.wet.gz") for m in manifest)

    back = read_wet(spark, f"{root}/*.warc.wet.gz")
    got = {r["url"]: r for r in back.collect()}
    assert len(got) == 30
    for url, ts, text in rows:
        assert got[url]["text"] == text
        assert got[url]["warc_ts"] == ts

    # WARC-Refers-To == UUIDv5(url\ndate) — the paired response's id
    blobs = {
        r["file_name"]: bytes(r["content"])
        for r in assemble_wet_files(df, 3).collect()
    }
    seen_refers = 0
    for blob in blobs.values():
        for rec in iter_warc_records(blob):
            h = rec["headers"]
            assert h["warc-type"] == "conversion"
            assert h["content-type"] == "text/plain"
            want = uuid_mod.uuid5(
                uuid_mod.NAMESPACE_URL,
                f"{h['warc-target-uri']}\n{h['warc-date']}",
            )
            assert h["warc-refers-to"] == f"<urn:uuid:{want}>"
            seen_refers += 1
    assert seen_refers == 30

    # partition-independence
    a = {r["file_name"]: bytes(r["content"])
         for r in assemble_wet_files(df, 2).collect()}
    b = {r["file_name"]: bytes(r["content"])
         for r in assemble_wet_files(df.repartition(11), 2).collect()}
    assert a == b


def test_wat_export_import_round_trip(spark, tmp_path):
    """WAT (metadata/link-envelope records): export → import preserves
    outlinks in document order plus status/content-type; the WARC/WAT/
    WET triplet cross-references by record-id construction; bytes are
    partitioning-independent."""
    import datetime as dt
    import json

    from raven_spark.sources.warc import (
        assemble_wat_files,
        iter_warc_records,
        read_wat,
        write_wat,
    )

    ts0 = dt.datetime(2026, 1, 2, 3, 4, 5)
    rows = [
        (
            f"https://w{i % 3}.example/p/{i}",
            ts0 + dt.timedelta(seconds=i),
            [f"https://w{(i + k) % 3}.example/p/{(i * 7 + k) % 20}"
             for k in range(1, 1 + i % 4)],  # 0-3 links, order matters
            200 + (i % 2) * 104,
            "text/html; charset=utf-8",
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, links array<string>, "
        "status int, ct string",
    )
    root = str(tmp_path / "wat")
    manifest = write_wat(
        df, root, n_files=2, status_col="status", content_type_col="ct"
    ).collect()
    assert sum(m["records"] for m in manifest) == 20
    assert all(m["file_name"].endswith(".warc.wat.gz") for m in manifest)

    back = read_wat(spark, f"{root}/*.warc.wat.gz")
    got = {r["url"]: r for r in back.collect()}
    assert len(got) == 20
    for url, ts, links, status, ct in rows:
        g = got[url]
        assert list(g["links"]) == links  # order preserved
        assert g["http_status"] == status
        assert g["content_type"] == ct
        assert g["warc_ts"] == ts

    # envelope is canonical JSON and the record type is metadata
    blob = bytes(
        assemble_wat_files(df, 1, status_col="status",
                           content_type_col="ct").collect()[0]["content"]
    )
    recs = list(iter_warc_records(blob))
    assert len(recs) == 20
    h = recs[0]["headers"]
    assert h["warc-type"] == "metadata"
    assert h["content-type"] == "application/json"
    env = json.loads(recs[0]["block"])
    assert "Envelope" in env

    # partition-independence
    a = {r["file_name"]: bytes(r["content"])
         for r in assemble_wat_files(df, 2).collect()}
    b = {r["file_name"]: bytes(r["content"])
         for r in assemble_wat_files(df.repartition(9), 2).collect()}
    assert a == b


def test_codec_fuzz_round_trip():
    """Property: ANY body bytes (CRLF runs, 'WARC/' look-alikes, empty,
    gzip magic) and IRI-ish URLs survive encode → member scan → HTTP
    parse byte-identically, for all three record framings (gzip member,
    plain, whole-file mix)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from raven_spark.sources.warc import (
        encode_conversion_record,
        encode_response_record,
        iter_warc_records,
        parse_http_response,
    )

    body_st = st.binary(min_size=0, max_size=400)
    # header values are whitespace-trimmed per the header grammar, so a
    # URL with trailing whitespace cannot round-trip through ANY WARC
    # writer — the engine canonicalizes (percent-encodes) URLs before
    # export; the codec contract is header-representable URLs
    url_st = (
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs", "Cc"), blacklist_characters="\r\n"
            ),
            min_size=1,
            max_size=60,
        )
        .map(lambda s: "https://e.x/" + s)
        .filter(lambda u: u == u.strip())
    )

    @settings(max_examples=120, deadline=None)
    @given(st.lists(st.tuples(url_st, body_st), min_size=1, max_size=6),
           st.booleans())
    def check(pairs, use_gzip):
        date = "2026-01-02T03:04:05Z"
        blob = b"".join(
            encode_response_record(u, date, b, gzip_member=use_gzip)
            for u, b in pairs
        )
        recs = list(iter_warc_records(blob))
        assert len(recs) == len(pairs)
        for (u, b), rec in zip(pairs, recs):
            assert rec["headers"]["warc-target-uri"] == u
            status, _hh, body = parse_http_response(rec["block"])
            assert status == 200 and body == b

        # conversion records interleave cleanly with responses
        mixed = b"".join(
            encode_response_record(u, date, b, gzip_member=use_gzip)
            + encode_conversion_record(u, date, b, gzip_member=use_gzip)
            for u, b in pairs
        )
        recs2 = list(iter_warc_records(mixed))
        assert [r["headers"]["warc-type"] for r in recs2] == (
            ["response", "conversion"] * len(pairs)
        )
        for (u, b), conv in zip(pairs, recs2[1::2]):
            assert conv["block"] == b

    check()


def test_wat_export_deterministic_under_metadata_ties(spark):
    """Same url/ts/links but different status/content-type must still
    order deterministically (review: __bh hashes only the links JSON)."""
    import datetime as dt

    from raven_spark.sources.warc import assemble_wat_files

    t = dt.datetime(2026, 1, 2, 3, 4, 5)
    rows = [
        ("https://t.example/", t, ["https://t.example/a"], 200, "text/html"),
        ("https://t.example/", t, ["https://t.example/a"], 404, "text/css"),
    ] * 3
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, links array<string>, "
        "status int, ct string",
    )
    a = {r["file_name"]: bytes(r["content"]) for r in assemble_wat_files(
        df, 1, status_col="status", content_type_col="ct").collect()}
    b = {r["file_name"]: bytes(r["content"]) for r in assemble_wat_files(
        df.repartition(5), 1, status_col="status",
        content_type_col="ct").collect()}
    assert a == b


def test_warc_export_deterministic_under_content_type_ties(spark):
    """Same url/ts/body under two content-types orders deterministically
    (review: __bh hashes the body only)."""
    import datetime as dt

    from raven_spark.sources.warc import assemble_warc_files

    t = dt.datetime(2026, 1, 2, 3, 4, 5)
    rows = [
        ("https://t.example/", t, b"<p>x</p>", "text/html"),
        ("https://t.example/", t, b"<p>x</p>", "text/plain"),
    ] * 2
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, ct string"
    )
    a = {r["file_name"]: bytes(r["content"]) for r in assemble_warc_files(
        df, 1, content_type_col="ct").collect()}
    b = {r["file_name"]: bytes(r["content"]) for r in assemble_warc_files(
        df.repartition(5), 1, content_type_col="ct").collect()}
    assert a == b
