"""WARC/1.0 container source + sink — the Common-Crawl interchange
format for the pages this engine crawls (ISO 28500; the reference keeps
fetched bodies only in its sinks, s3.rs:12-43 / local_file.rs, so WARC
import/export is a Spark-side extension of the P-family, not a port).

Read path (``read_warc``): ``spark.read.format("binaryFile")`` — one
WARC file per task, the Common Crawl convention (their own Spark tooling
reads whole .warc.gz files per split; gzip members can't be split
without an external index, and CC sizes files ~1 GB precisely so that
file == task is the right granularity at 100 TB: a 100 TB crawl is
~10^5 files ⇒ ~10^5 tasks, ideal for a 1000-executor cluster). Records
are parsed by a streaming member-at-a-time gzip scan inside
``mapInPandas``: peak memory per task is O(largest record), never the
decompressed file.

Write path (``write_warc``): rows → WARC response records (encoded per
Arrow batch) → deterministic bucket assembly (``applyInPandas`` keyed on
``pmod(xxhash64(url), n_files)``, records sorted by canonical URL within
a bucket — output bytes are a pure function of the input SET, not of
partitioning) → distributed per-bucket file writes from the executors.
Each record is its own gzip member (``gzip_members=True``), so any
standard WARC reader — including this one — can random-access records
given an offset index.

Determinism: WARC-Record-IDs are name-based UUIDv5 over (url, date) and
WARC-Date comes from the row's ``warc_ts`` — re-exporting the same table
yields byte-identical files, which is what makes the round-trip oracle
(q52) and resume-safe re-exports possible.
"""

from __future__ import annotations

import gzip
import io
import uuid
import zlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"
_SOFTWARE = "raven-spark-warc/1.0"

# ---------------------------------------------------------------------------
# record-level codec (pure Python, no Spark) — unit-testable in isolation
# ---------------------------------------------------------------------------


def encode_response_record(
    url: str,
    date_iso: str,
    body: bytes,
    content_type: str = "text/html",
    http_status: int = 200,
    gzip_member: bool = True,
) -> bytes:
    """One WARC/1.0 ``response`` record wrapping an HTTP/1.1 response.

    The record id is UUIDv5(NAMESPACE_URL, url + "\\n" + date) — name
    based, so the encoding is deterministic (no wall clock, no PRNG: the
    same row always produces the same bytes, at any parallelism). The
    HTTP head encodes as UTF-8 (never crashes on the non-ASCII junk real
    Content-Type headers carry; this module's parser decodes header
    values the same way).
    """
    http_head = (
        f"HTTP/1.1 {http_status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("utf-8")
    block = http_head + body
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}\n{date_iso}")
    return _encode_record(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
            ("WARC-Date", date_iso),
            ("WARC-Target-URI", url),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        block,
        gzip_member,
    )


def _encode_record(
    headers: list[tuple[str, str]],
    block: bytes,
    gzip_member: bool,
) -> bytes:
    """Shared WARC record scaffolding for every encoder: ordered header
    lines (callers own the per-type header set/order — the bytes of
    existing exports are a compatibility surface), Content-Length from
    the block, the record's two trailing CRLFs, and the deterministic
    gzip-member wrapper. Header lines encode as UTF-8 — URIs should be
    ASCII but real frontiers carry IRIs, and the parser decodes header
    values the same way (ASCII-only lines are byte-identical either
    way). mtime=0 pins the gzip timestamp so re-exports are
    byte-identical (same reason parquet writes are dictionary-pinned).
    """
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode("utf-8") for k, v in headers
    ) + f"Content-Length: {len(block)}\r\n".encode("ascii") + _CRLF
    record = head + block + _CRLF + _CRLF
    if not gzip_member:
        return record
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record)
    return buf.getvalue()


def sha1_b32(payload: bytes) -> str:
    """The CDX/WARC digest form: SHA-1, RFC 4648 Base32 (what CC's cdxj
    and WARC-Payload-Digest headers carry after the ``sha1:`` prefix)."""
    import base64
    import hashlib

    return base64.b32encode(hashlib.sha1(payload).digest()).decode("ascii")


def encode_revisit_record(
    url: str,
    date_iso: str,
    refers_uri: str,
    refers_date: str,
    payload_digest_b32: str,
    gzip_member: bool = True,
) -> bytes:
    """One WARC/1.0 ``revisit`` record (ISO 28500 §6.7.2,
    identical-payload-digest profile): a capture whose payload bytes are
    stored ONCE in the referenced original record — the deduplicated
    form Common Crawl emits for recrawls. The block is empty
    (Content-Length: 0); everything a reader needs to restore the
    capture is in the headers: WARC-Refers-To-Target-URI /
    WARC-Refers-To-Date name the original, WARC-Payload-Digest carries
    the payload's sha1 so restoration can be verified. Record id is
    UUIDv5 over (url, date, "revisit") — distinct from a response
    record of the same (url, date), deterministic like everything else
    in this writer."""
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}\n{date_iso}\nrevisit")
    return _encode_record(
        [
            ("WARC-Type", "revisit"),
            ("WARC-Profile",
             "http://netpreserve.org/warc/1.0/revisit/"
             "identical-payload-digest"),
            ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
            ("WARC-Date", date_iso),
            ("WARC-Target-URI", url),
            ("WARC-Refers-To-Target-URI", refers_uri),
            ("WARC-Refers-To-Date", refers_date),
            ("WARC-Payload-Digest", f"sha1:{payload_digest_b32}"),
        ],
        b"",
        gzip_member,
    )


def encode_conversion_record(
    url: str,
    date_iso: str,
    text_bytes: bytes,
    gzip_member: bool = True,
) -> bytes:
    """One WARC/1.0 ``conversion`` record carrying extracted plain text —
    the record type Common Crawl's WET files are made of (ISO 28500
    §6.8: content "created as the result of a transformation"). The
    WARC-Refers-To header names the response record this text was
    extracted from: record ids here are name-based (UUIDv5 over
    url+date, see ``encode_response_record``), so the reference is
    computable without reading the WARC side — a WET export pairs with
    its WARC export by construction. The conversion record's own id
    salts the name with "conversion" so the pair never collides."""
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}\n{date_iso}\nconversion")
    refers = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}\n{date_iso}")
    return _encode_record(
        [
            ("WARC-Type", "conversion"),
            ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
            ("WARC-Refers-To", f"<urn:uuid:{refers}>"),
            ("WARC-Date", date_iso),
            ("WARC-Target-URI", url),
            ("Content-Type", "text/plain"),
        ],
        text_bytes,
        gzip_member,
    )


def encode_metadata_record(
    url: str,
    date_iso: str,
    json_bytes: bytes,
    gzip_member: bool = True,
) -> bytes:
    """One WARC/1.0 ``metadata`` record carrying a JSON envelope — the
    record type Common Crawl's WAT files are made of (per-capture
    metadata: HTTP headers, outlinks, title — everything a link-graph
    or header-analytics pipeline needs WITHOUT the payload bytes).
    WARC-Refers-To names the source response record via the same
    UUIDv5(url, date) construction as WET, so WARC/WAT/WET triplets
    cross-reference with no join."""
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}\n{date_iso}\nmetadata")
    refers = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}\n{date_iso}")
    return _encode_record(
        [
            ("WARC-Type", "metadata"),
            ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
            ("WARC-Refers-To", f"<urn:uuid:{refers}>"),
            ("WARC-Date", date_iso),
            ("WARC-Target-URI", url),
            ("Content-Type", "application/json"),
        ],
        json_bytes,
        gzip_member,
    )


def _member_chunk_scan(
    data: bytes,
) -> Iterator[tuple[int, int | None, bytes]]:
    """THE member scanner — both public iterators wrap it, so the
    tricky parts (magic checks, 1 MiB slice feed, eof/unused_data pos
    arithmetic, truncation/corruption endings) exist exactly once.

    Yields ``(member_start, member_end, chunk)`` per decompressed chunk;
    ``member_end`` is None until the chunk that completes the member.
    The compressed input is fed through a memoryview in 1 MiB slices —
    a whole-remainder feed would copy the tail into ``unused_data``
    once PER MEMBER, i.e. O(members x file_bytes) memcpy, which at CC
    scale (~50k members / 1 GB file) never finishes. Plain (non-gzip)
    input yields one pseudo-member ``(0, len(data), data)``; trailing
    non-gzip garbage and a truncated/corrupt final member end the scan
    at the last complete member.
    """
    if data[:2] != b"\x1f\x8b":
        yield 0, len(data), data
        return
    mv = memoryview(data)
    pos, total = 0, len(data)
    step = 1 << 20
    while pos < total:
        if bytes(mv[pos:pos + 2]) != b"\x1f\x8b":
            return  # trailing garbage after the last member
        start = pos
        d = zlib.decompressobj(wbits=47)  # 47 = auto gzip/zlib header
        pending = b""  # hold one chunk back so member_end rides the last
        while not d.eof:
            chunk = mv[pos:pos + step]
            if len(chunk) == 0:
                return  # truncated member
            try:
                out = d.decompress(bytes(chunk))
            except zlib.error:
                return  # corrupt member: stop at the last good record
            if d.eof:
                pos += len(chunk) - len(d.unused_data)
            else:
                pos += len(chunk)
            if out:
                if pending:
                    yield start, None, pending
                pending = out
        yield start, pos, pending  # final chunk: may be b"" (empty member)


def _gzip_member_chunks(data: bytes) -> Iterator[bytes]:
    """Decompressed chunks across all members, memory O(chunk):
    Common Crawl writes one record per member, so the record framer on
    top of this never buffers more than one record."""
    for _start, _end, chunk in _member_chunk_scan(data):
        if chunk:
            yield chunk


def iter_gzip_members_with_offsets(
    data: bytes,
) -> Iterator[tuple[int, int, bytes]]:
    """(compressed_offset, compressed_length, decompressed_bytes) per
    gzip member — the information a CDX index records: a member's
    [offset, offset+length) range in the .warc.gz is exactly the HTTP
    Range a reader fetches to random-access one record (CC writes one
    record per member). Each member's output is buffered whole —
    O(largest record), the same bound the record parse needs anyway.
    Plain input yields one pseudo-member ``(0, len(data), data)``."""
    parts: list[bytes] = []
    for start, end, chunk in _member_chunk_scan(data):
        parts.append(chunk)
        if end is not None:
            yield start, end - start, b"".join(parts)
            parts = []


def _parse_header_lines(lines: list[bytes]) -> dict[str, str]:
    """k/v header lines → {lower-name: value}; duplicate names last-win.
    Values decode as UTF-8 (what this writer emits; real-world crawl
    headers carry UTF-8 junk more often than latin-1)."""
    headers: dict[str, str] = {}
    for ln in lines:
        k, sep, v = ln.partition(b":")
        if sep:
            headers[k.decode("ascii", "replace").strip().lower()] = (
                v.decode("utf-8", "replace").strip()
            )
    return headers


def _warc_date(value: str | None) -> pd.Timestamp | None:
    """WARC-Date header → tz-naive UTC Timestamp (the read schema's
    TimestampType). Real crawls carry malformed dates and non-Z offsets;
    normalizing to UTC and returning None on junk beats a task-killing
    parse error over a 100 TB scan."""
    if not value:
        return None
    try:
        ts = pd.Timestamp(value)
    except (ValueError, TypeError):
        return None
    if ts.tzinfo is not None:
        ts = ts.tz_convert("UTC").tz_localize(None)
    return ts


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Scan a WARC file's bytes (gzip-member'd, whole-file gzip, or
    plain) into dicts: {headers: {lower-name: value}, block: bytes}.

    Framing is Content-Length per the spec; the scan buffers only until
    the current record is complete (streaming over gzip members), then
    releases it. Truncated trailing garbage is ignored (CC files
    occasionally end mid-record after transfer truncation) — a record is
    only yielded if its full declared block arrived.
    """
    # bytearray, not bytes: appends are amortized O(chunk) and consumed
    # prefixes release with one del — a bytes `buf += chunk` plus a
    # re-slice of the tail per fill is O(record^2) memcpy, which on a
    # whole-file-gzip WARC holding one large record (a 500 MB media
    # capture) turns the scan into hundreds of GB of copying.
    buf = bytearray()
    chunks = _gzip_member_chunks(data)
    exhausted = False

    def fill() -> bool:
        nonlocal exhausted
        if exhausted:
            return False
        try:
            buf.extend(next(chunks))
            return True
        except StopIteration:
            exhausted = True
            return False

    while True:
        # locate the header/block boundary, pulling more members as needed
        while (sep := buf.find(_CRLF + _CRLF)) < 0:
            if not fill():
                return
        lines = bytes(buf[:sep]).split(_CRLF)
        if not lines or not lines[0].startswith(b"WARC/"):
            # resync: skip to the next plausible record start
            nxt = buf.find(b"WARC/", 1)
            if nxt < 0:
                if not fill():
                    return
                continue
            del buf[:nxt]
            continue
        headers = _parse_header_lines(lines[1:])
        try:
            n = int(headers.get("content-length", ""))
        except ValueError:
            n = -1
        if n < 0:
            # malformed length (absent, junk, or negative — real crawls
            # carry all three): skip this header, resync on the block
            del buf[:sep + 4]
            continue
        while len(buf) - (sep + 4) < n:
            if not fill():
                return  # truncated final record: drop, per docstring
        end = sep + 4 + n
        yield {"headers": headers, "block": bytes(buf[sep + 4:end])}
        # each record ends with two CRLFs before the next one
        while end < len(buf) and buf[end] in (0x0D, 0x0A):
            end += 1
        del buf[:end]


def iter_records_with_extents(
    member: bytes,
) -> Iterator[tuple[int, int, dict]]:
    """Records in one (decompressed) member with their byte extents:
    yields ``(start, length, {headers, block})`` where [start,
    start+length) spans the record INCLUDING its two trailing CRLFs.
    Used by the CDX indexer for plain (uncompressed) WARCs, where a
    record's extent in the file IS its random-access range (gzip-member
    files use the member extent instead, ``iter_gzip_members_with_
    offsets``). Same framing rules as ``iter_warc_records``: resync on
    garbage, drop a truncated final record."""
    pos, total = 0, len(member)
    while pos < total:
        sep = member.find(_CRLF + _CRLF, pos)
        if sep < 0:
            return
        lines = member[pos:sep].split(_CRLF)
        if not lines or not lines[0].startswith(b"WARC/"):
            nxt = member.find(b"WARC/", pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        headers = _parse_header_lines(lines[1:])
        try:
            n = int(headers.get("content-length", ""))
        except ValueError:
            n = -1
        if n < 0:  # absent, junk, or negative: skip head, resync
            pos = sep + 4
            continue
        block_end = sep + 4 + n
        if block_end > total:
            return  # truncated final record
        end = block_end
        # consume the record's trailing CRLF pair(s) into its extent
        while member[end:end + 2] == _CRLF:
            end += 2
        yield pos, end - pos, {
            "headers": headers,
            "block": member[sep + 4: block_end],
        }
        pos = end


def parse_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """HTTP head + body out of a response record's block. Returns
    (status, lower-cased headers, body). A block that isn't HTTP (e.g.
    a warcinfo record routed here by mistake) returns (0, {}, block)."""
    sep = block.find(_CRLF + _CRLF)
    if sep < 0 or not block.startswith(b"HTTP/"):
        return 0, {}, block
    head = block[:sep].split(_CRLF)
    try:
        status = int(head[0].split()[1])
    except (IndexError, ValueError):
        return 0, {}, block
    return status, _parse_header_lines(head[1:]), block[sep + 4:]


# ---------------------------------------------------------------------------
# DataFrame source / sink
# ---------------------------------------------------------------------------

READ_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("warc_file", T.StringType()),
    # revisit-record linkage (ISO 28500 §6.7.2) — null for other types
    T.StructField("refers_to_uri", T.StringType()),
    T.StructField("refers_to_date", T.StringType()),
    T.StructField("payload_digest", T.StringType()),
])


def _record_scan(wanted: tuple[str, ...], tz: str):
    """The file→records Arrow kernel shared by the batch reader and the
    streaming reader (streaming/ingest.read_warc_stream) — one framing
    implementation, two sources. ``tz`` is the session timezone captured
    at PLAN BUILD: _warc_date yields naive TRUE-UTC timestamps, but
    Spark interprets naive Arrow timestamps as SESSION-timezone wall
    time — under a non-UTC session the stored instant would shift by
    the offset, so convert to session wall time here."""

    def to_session_wall(ts: pd.Timestamp | None) -> pd.Timestamp | None:
        if ts is None:
            return None
        return ts.tz_localize("UTC").tz_convert(tz).tz_localize(None)

    def scan(pdfs: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out: list[tuple] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in iter_warc_records(bytes(content)):
                    h = rec["headers"]
                    wtype = h.get("warc-type", "").lower()
                    if wtype not in wanted:
                        continue
                    status, _hh, body = (
                        parse_http_response(rec["block"])
                        if wtype == "response"
                        else (0, {}, rec["block"])
                    )
                    # responses without a stamped WARC-Payload-Digest get
                    # one computed over the payload (CC stamps it; this
                    # repo's plain writer does not) so digest-keyed
                    # consumers — revisit restoration — always have it
                    digest = h.get("warc-payload-digest")
                    if digest is None and wtype == "response":
                        digest = "sha1:" + sha1_b32(body)
                    out.append((
                        h.get("warc-target-uri"),
                        to_session_wall(_warc_date(h.get("warc-date"))),
                        wtype,
                        status,
                        _hh.get("content-type"),
                        body,
                        fpath,
                        h.get("warc-refers-to-target-uri"),
                        h.get("warc-refers-to-date"),
                        digest,
                    ))
            yield pd.DataFrame(
                out, columns=[f.name for f in READ_SCHEMA.fields]
            )

    return scan


def read_warc(
    spark: SparkSession,
    path: str,
    warc_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """WARC files → the input_hint page shape (url, warc_ts, html, ...).

    One file per task via binaryFile (see module doc for why that is the
    right split at 100 TB); the record scan is streaming per gzip
    member. Non-``warc_types`` records (warcinfo, request, metadata) are
    filtered inside the scan so they never cross Arrow.
    """
    files = spark.read.format("binaryFile").load(path)
    wanted = tuple(w.lower() for w in warc_types)
    tz = spark.conf.get("spark.sql.session.timeZone")
    return files.select("path", "content").mapInPandas(
        _record_scan(wanted, tz), READ_SCHEMA
    )


_PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
])


def _decode_pages_scan():
    """records → decoded pages Arrow kernel (shared batch/streaming):
    charset-decode each response body using its stored HTTP
    Content-Type (the same WHATWG label resolution the fetch stage
    uses, charset.py), extract text with the SAME pinned extractor
    (text.py — so WARC-imported corpora satisfy the byte-identical-text
    invariant vs a live crawl of the same bytes)."""
    from raven_spark.functions.charset import decode_to_str
    from raven_spark.functions.mime import parse_content_type
    from raven_spark.functions.text import extract_text

    def decode(pdfs: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            texts: list[str | None] = []
            for body, ctype in zip(pdf["html"], pdf["content_type"]):
                try:
                    _mime, charset = parse_content_type(ctype)
                    s = decode_to_str(bytes(body), charset)
                    texts.append(extract_text(s))
                except Exception:
                    texts.append(None)  # undecodable body: keep the bytes
            yield pd.DataFrame({
                "url": pdf["url"],
                "warc_ts": pdf["warc_ts"],
                "html": pdf["html"],
                "text": texts,
            })

    return decode


def warc_pages_table(spark: SparkSession, path: str) -> DataFrame:
    """WARC dump → the BASELINE input_hint table shape
    ``(url, warc_ts, html, text, lang)``: decode + extract ride the
    read's mapInPandas output through ONE more Arrow stage
    (``_decode_pages_scan``); lang stays JVM-side/codegen'd."""
    from raven_spark.functions.text import lang_id_col

    pages = read_warc(spark, path).mapInPandas(
        _decode_pages_scan(), _PAGES_SCHEMA
    )
    return pages.withColumn("lang", lang_id_col(F.col("text")))


_FILE_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType()),
    T.StructField("file_name", T.StringType()),
    T.StructField("records", T.LongType()),
    T.StructField("content", T.BinaryType()),
])


def assemble_warc_files(
    df: DataFrame,
    n_files: int,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    body_col: str = "html",
    content_type_col: str | None = None,
    prefix: str = "part",
) -> DataFrame:
    """Pages → (bucket, file_name, records, content) WARC file blobs.

    Bucket = pmod(xxhash64(url), n_files): the assembly shuffle is keyed
    on an 8-byte hash and each output file's record set — and, after the
    in-bucket sort by url, its exact bytes — is partition-independent.
    ``n_files`` sizes files the way CC does (aim ~1 GB compressed): at
    100 TB pick n_files ≈ bytes/1 GB; each bucket is one task whose
    memory is one output file, the same bound the write itself needs.
    """
    return _assemble(
        df, n_files, url_col, ts_col, body_col, content_type_col, prefix,
        dedupe=False,
    )


def assemble_warc_files_deduped(
    df: DataFrame,
    n_files: int,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    body_col: str = "html",
    content_type_col: str | None = None,
    prefix: str = "part",
) -> DataFrame:
    """Deduplicating WARC export: each distinct payload's bytes are
    written ONCE (in its earliest capture's ``response`` record); every
    other capture becomes a ``revisit`` record referencing it — the
    identical-payload-digest dedup Common Crawl ships its recrawls as.

    Canonical pick: row_number over payloads keyed by the JVM-side
    ``sha1(body)`` — the digest IS the dedup key, so two payloads merge
    only when their sha1 collides (the same guarantee Common Crawl's own
    digest dedup gives; a 64-bit xxhash key would silently merge
    distinct payloads at 10^9+ scale and is attacker-forgeable) —
    ordered by (UTC date string, url, bucket): fixed-width dates make
    lexicographic == chronological here because this writer FORMATS
    them itself (the read-side resolver, cdx.revisit_resolve, must
    parse foreign dates instead).

    Scale shape: CANONICAL payload bytes cross exactly two exchanges —
    the dedup window (partitioned by the 20-byte digest) and the bucket
    assembly; revisit rows have their body nulled BEFORE the assembly
    shuffle (the stub only needs the digest), so a k-deep recrawl
    corpus shuffles ~1/k + stubs into assembly, matching what the files
    contain. The window is what replaces a 2x-source-scan self-join.
    """
    return _assemble(
        df, n_files, url_col, ts_col, body_col, content_type_col, prefix,
        dedupe=True,
    )


def _export_src(
    df: DataFrame,
    n_files: int,
    url_col: str,
    ts_col: str,
    body_expr,
    ct_expr,
    extra: dict[str, "F.Column"] | None = None,
) -> DataFrame:
    """The export projection every WARC-family writer shares:
    (url, __date, __body, __ct, __bh, bucket).

    WARC-Date must be the true UTC instant: date_format alone renders
    SESSION-timezone wall time, so a non-UTC session (this is public
    library API — only the repo's own session factory pins UTC) would
    stamp wrong times under the literal 'Z' AND make output bytes
    depend on session config. to_utc_timestamp(ts, session_tz) shifts
    the wall time so the session-tz rendering IS the UTC rendering.
    Bucket = pmod(xxhash64(url), n_files): an 8-byte assembly shuffle
    key; __bh is the in-bucket sort tiebreak."""
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    utc_ts = F.to_utc_timestamp(F.col(ts_col), tz)
    return df.select(
        F.col(url_col).alias("url"),
        F.coalesce(
            F.date_format(utc_ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
            F.lit("1970-01-01T00:00:00Z"),
        ).alias("__date"),
        body_expr.alias("__body"),
        ct_expr.alias("__ct"),
        F.xxhash64(body_expr).alias("__bh"),
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_files))
        .cast("int").alias("bucket"),
        *[c.alias(name) for name, c in (extra or {}).items()],
    )


def _assemble(
    df: DataFrame,
    n_files: int,
    url_col: str,
    ts_col: str,
    body_col: str,
    content_type_col: str | None,
    prefix: str,
    dedupe: bool,
) -> DataFrame:
    """Shared assembly for the plain and deduplicating exports — one
    projection, one build kernel, so date formatting / bucketing /
    determinism rules cannot drift between the two paths."""
    ct = (
        F.coalesce(F.col(content_type_col), F.lit("text/html"))
        if content_type_col
        else F.lit("text/html")
    )
    src = _export_src(df, n_files, url_col, ts_col, F.col(body_col), ct)
    if dedupe:
        from pyspark.sql.window import Window

        # coalesce to empty bytes first: a null-body row must get the
        # digest of the b"" the encoder will actually write, and a null
        # sha1 would crash the stub's hex->b32 conversion
        src = src.withColumn(
            "__digest", F.sha1(F.coalesce(F.col("__body"), F.lit(b"")))
        )
        w = Window.partitionBy("__digest").orderBy("__date", "url", "bucket")
        src = src.select(
            "*",
            (F.row_number().over(w) > 1).alias("__revisit"),
            F.first("url").over(w).alias("__ref_url"),
            F.first("__date").over(w).alias("__ref_date"),
        )
        # a revisit stub carries no payload: null the body before the
        # assembly exchange so duplicate bytes never shuffle twice
        src = src.withColumn(
            "__body", F.when(~F.col("__revisit"), F.col("__body"))
        )
    else:
        src = (
            src.withColumn("__digest", F.lit(None).cast("string"))
            .withColumn("__revisit", F.lit(False))
            .withColumn("__ref_url", F.lit(None).cast("string"))
            .withColumn("__ref_date", F.lit(None).cast("string"))
        )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        import base64

        # url alone is not a total order: recrawls carry the same url at
        # different times — without the (date, body-hash, content-type,
        # revisit) tiebreaks a stable sort would preserve shuffle-arrival
        # order and the output bytes would depend on partitioning,
        # breaking the pure-function-of-the-input-SET promise re-exports
        # rely on. __ct is in the key because __bh hashes the BODY only
        # (same body under two content-types must still order); __revisit
        # because an exact-duplicate capture yields a response AND a
        # stub tied on everything else.
        pdf = pdf.sort_values(
            ["url", "__date", "__bh", "__ct", "__revisit"], kind="mergesort"
        )
        bucket = int(pdf["bucket"].iloc[0]) if len(pdf) else 0
        parts = []
        for u, d, b, c, rv, ru, rd, dg in zip(
            pdf["url"], pdf["__date"], pdf["__body"], pdf["__ct"],
            pdf["__revisit"], pdf["__ref_url"], pdf["__ref_date"],
            pdf["__digest"],
        ):
            if rv:
                b32 = base64.b32encode(bytes.fromhex(dg)).decode("ascii")
                parts.append(encode_revisit_record(u, d, ru, rd, b32))
            else:
                body = bytes(b) if b is not None else b""
                parts.append(encode_response_record(u, d, body, c))
        return pd.DataFrame({
            "bucket": [bucket],
            "file_name": [f"{prefix}-{bucket:05d}.warc.gz"],
            "records": [len(parts)],
            "content": [b"".join(parts)],
        })

    return src.groupBy("bucket").applyInPandas(build, _FILE_SCHEMA)


def assemble_wet_files(
    df: DataFrame,
    n_files: int,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    prefix: str = "wet-part",
) -> DataFrame:
    """Pages → WET file blobs: one ``conversion`` record of extracted
    plain text per page — the text-only sibling Common Crawl publishes
    beside every WARC (most corpus pipelines read WET, not WARC: ~1/10
    the bytes, no HTML parse). Same bucket/date/determinism rules as
    the WARC assemblers (shared ``_export_src``); each record's
    WARC-Refers-To names the response record a parallel
    ``assemble_warc_files`` export writes for the same row, so the pair
    cross-references by construction."""
    src = _export_src(
        df, n_files, url_col, ts_col,
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8"),
        F.lit("text/plain"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["url", "__date", "__bh"], kind="mergesort")
        bucket = int(pdf["bucket"].iloc[0]) if len(pdf) else 0
        parts = [
            encode_conversion_record(u, d, bytes(b))
            for u, d, b in zip(pdf["url"], pdf["__date"], pdf["__body"])
        ]
        return pd.DataFrame({
            "bucket": [bucket],
            "file_name": [f"{prefix}-{bucket:05d}.warc.wet.gz"],
            "records": [len(parts)],
            "content": [b"".join(parts)],
        })

    return src.groupBy("bucket").applyInPandas(build, _FILE_SCHEMA)


def assemble_wat_files(
    df: DataFrame,
    n_files: int,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    links_col: str = "links",
    status_col: str | None = None,
    content_type_col: str | None = None,
    prefix: str = "wat-part",
) -> DataFrame:
    """Pages → WAT file blobs: one ``metadata`` record per capture with
    a CC-style JSON envelope (HTTP status/content-type + outlink list)
    — the link-graph sibling of WET: a 100 TB crawl's WAT is the input
    to PageRank/host-reputation without ever touching payload bytes.
    ``links_col`` is an ``array<string>`` column (e.g.
    ``extract_links_udf(html)`` or the frontier's discovered edges).

    JSON is canonical (sorted keys, compact separators) so output bytes
    stay a pure function of the input set like every exporter here;
    link ORDER within a record is preserved from the input array (it is
    data — document order of the anchors)."""
    import json

    src = _export_src(
        df, n_files, url_col, ts_col,
        # carry the link array through the assembly shuffle as one
        # JSON string column (Arrow-friendly; the envelope is built in
        # the bucket task so the record shape stays in ONE place)
        F.to_json(F.coalesce(
            F.col(links_col), F.array().cast("array<string>")
        )),
        (F.coalesce(F.col(content_type_col), F.lit("text/html"))
         if content_type_col else F.lit("text/html")),
        extra={
            "__status": (
                F.coalesce(F.col(status_col), F.lit(200))
                if status_col else F.lit(200)
            ).cast("int"),
        },
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        # __bh hashes only the links JSON: __ct/__status join the key so
        # same-links captures with different metadata still total-order
        pdf = pdf.sort_values(
            ["url", "__date", "__bh", "__ct", "__status"], kind="mergesort"
        )
        bucket = int(pdf["bucket"].iloc[0]) if len(pdf) else 0
        parts = []
        for u, d, lj, c, st in zip(
            pdf["url"], pdf["__date"], pdf["__body"], pdf["__ct"],
            pdf["__status"],
        ):
            links = json.loads(lj) if lj else []
            envelope = {
                "Envelope": {
                    "WARC-Header-Metadata": {
                        "WARC-Target-URI": u,
                        "WARC-Date": d,
                        "WARC-Type": "response",
                    },
                    "Payload-Metadata": {
                        "HTTP-Response-Metadata": {
                            "Response-Message": {"Status": int(st)},
                            "Headers": {"Content-Type": c},
                            "HTML-Metadata": {
                                "Links": [{"url": l} for l in links],
                            },
                        },
                    },
                },
            }
            body = json.dumps(
                envelope, sort_keys=True, separators=(",", ":")
            ).encode("utf-8")
            parts.append(encode_metadata_record(u, d, body))
        return pd.DataFrame({
            "bucket": [bucket],
            "file_name": [f"{prefix}-{bucket:05d}.warc.wat.gz"],
            "records": [len(parts)],
            "content": [b"".join(parts)],
        })

    return src.groupBy("bucket").applyInPandas(build, _FILE_SCHEMA)


_WAT_ENVELOPE_SCHEMA = T.StructType([T.StructField("Envelope", T.StructType([
    T.StructField("Payload-Metadata", T.StructType([
        T.StructField("HTTP-Response-Metadata", T.StructType([
            T.StructField("Response-Message", T.StructType([
                T.StructField("Status", T.IntegerType()),
            ])),
            T.StructField("Headers", T.StructType([
                T.StructField("Content-Type", T.StringType()),
            ])),
            T.StructField("HTML-Metadata", T.StructType([
                T.StructField("Links", T.ArrayType(T.StructType([
                    T.StructField("url", T.StringType()),
                ]))),
            ])),
        ])),
    ])),
]))])


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """WAT files → (url, warc_ts, http_status, content_type, links,
    warc_file): metadata records' JSON envelopes parsed JVM-side
    (``from_json`` against the envelope schema — the Python scan only
    frames records; envelope decoding stays in codegen)."""
    records = read_warc(spark, path, warc_types=("metadata",))
    env = F.from_json(
        F.decode(F.col("html"), "utf-8"), _WAT_ENVELOPE_SCHEMA
    )["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"]
    return records.select(
        "url",
        "warc_ts",
        env["Response-Message"]["Status"].alias("http_status"),
        env["Headers"]["Content-Type"].alias("content_type"),
        F.transform(
            env["HTML-Metadata"]["Links"], lambda x: x["url"]
        ).alias("links"),
        "warc_file",
    )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET files → (url, warc_ts, text, warc_file): the ``conversion``
    records' plain-text payloads, decoded as the UTF-8 WET writes.
    Same one-file-per-task scan as ``read_warc``."""
    records = read_warc(spark, path, warc_types=("conversion",))
    return records.select(
        "url",
        "warc_ts",
        F.decode(F.col("html"), "utf-8").alias("text"),
        "warc_file",
    )


def reconstruct_from_revisits(records: DataFrame) -> DataFrame:
    """Inverse of the deduplicating export: restore every capture's
    payload from the ``response`` record its revisit points at.

    Input: ``read_warc(..., warc_types=("response", "revisit"))`` rows.
    Output: the same rows with ``html``/``http_status``/``content_type``
    restored on revisit rows, plus ``was_revisit`` and ``restored``
    (false on an ORPHAN revisit — its original wasn't in the read set;
    such rows keep null html rather than failing silently unmarked).

    Group identity is (coalesce(refers_to_uri, url), payload_digest) —
    digest, NOT WARC-Refers-To-Date: the identical-payload-digest
    profile's actual guarantee is that digest equality == payload
    equality, while date-string matching breaks on every real-archive
    wrinkle (sub-second foreign date forms, optional Refers-To-Date,
    unparseable dates). The read scan guarantees responses carry a
    digest (stamped or computed), so grouping is total. Restoration
    takes the group's response values as ONE struct (min over
    (html, status, content_type)) — never per-column maxima, which
    could mix fields from different responses when a URI carries
    several same-digest captures with differing metadata.

    Scale shape: ONE window over the identity — deliberately not a
    self-join of revisits against responses: both sides would re-scan
    the WARC source (filter+join over one source plans two source
    executions, same reasoning as cdx.revisit_resolve), whereas the
    window shuffles each payload once.
    """
    from pyspark.sql.window import Window

    is_resp = F.col("warc_type").eqNullSafe(F.lit("response"))
    w = Window.partitionBy(
        F.coalesce(F.col("refers_to_uri"), F.col("url")),
        F.col("payload_digest"),
    )
    canon = F.min(
        F.when(
            is_resp,
            F.struct(
                F.col("html").alias("h"),
                F.col("http_status").alias("s"),
                F.col("content_type").alias("c"),
            ),
        )
    ).over(w)
    restored = records.select(
        "url",
        "warc_ts",
        "warc_type",
        F.when(is_resp, F.col("http_status"))
        .otherwise(canon["s"]).alias("http_status"),
        F.when(is_resp, F.col("content_type"))
        .otherwise(canon["c"]).alias("content_type"),
        F.when(is_resp, F.col("html")).otherwise(canon["h"]).alias("html"),
        "warc_file",
        "refers_to_uri",
        "refers_to_date",
        "payload_digest",
        (~is_resp).alias("was_revisit"),
        (is_resp | canon["h"].isNotNull()).alias("restored"),
    )
    return restored


def write_warc(
    df: DataFrame,
    out_dir: str,
    n_files: int,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    body_col: str = "html",
    content_type_col: str | None = None,
    dedupe: bool = False,
) -> DataFrame:
    """Distributed WARC export: assemble file blobs, write each from the
    executor that built it, return the manifest (file_name, records,
    bytes) as a DataFrame — no file content ever visits the driver.
    ``dedupe=True`` stores each distinct payload once and every other
    capture as a revisit record (``assemble_warc_files_deduped``).

    Local/NFS paths are written directly; object-store exports on a real
    cluster route the same blobs through a cloud SDK in this function's
    writer (not installed in this sandbox — the seam is the single
    ``_put`` below, mirroring the catalog's ``_put_uri``).
    """
    _local_target(out_dir)  # reject object stores before any plan work
    assembler = assemble_warc_files_deduped if dedupe else assemble_warc_files
    files = assembler(
        df, n_files, url_col, ts_col, body_col, content_type_col
    )
    return _write_file_blobs(files, out_dir)


def write_wet(
    df: DataFrame,
    out_dir: str,
    n_files: int,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Distributed WET export (``assemble_wet_files`` + the same
    executor-side atomic writer as ``write_warc``)."""
    _local_target(out_dir)
    return _write_file_blobs(
        assemble_wet_files(df, n_files, url_col, ts_col, text_col), out_dir
    )


def write_wat(
    df: DataFrame,
    out_dir: str,
    n_files: int,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    links_col: str = "links",
    status_col: str | None = None,
    content_type_col: str | None = None,
) -> DataFrame:
    """Distributed WAT export (``assemble_wat_files`` + the shared
    atomic writer)."""
    _local_target(out_dir)
    return _write_file_blobs(
        assemble_wat_files(
            df, n_files, url_col, ts_col, links_col, status_col,
            content_type_col,
        ),
        out_dir,
    )


def _local_target(out_dir: str) -> str:
    target = out_dir[len("file:"):] if out_dir.startswith("file:") else out_dir
    if "://" in target:
        raise NotImplementedError(
            "object-store WARC export needs a cloud SDK on the executors; "
            "use a file:/ or mounted path here (see docstring)"
        )
    return target


def _write_file_blobs(files: DataFrame, out_dir: str) -> DataFrame:
    """(file_name, records, content) blobs → files on disk, written from
    the executors that hold them; returns the manifest DataFrame."""
    import os

    target = _local_target(out_dir)

    manifest_schema = T.StructType([
        T.StructField("file_name", T.StringType()),
        T.StructField("records", T.LongType()),
        T.StructField("bytes", T.LongType()),
    ])

    def _put(pdfs: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # mkdir on the EXECUTOR: a driver-side mkdir would only exist on
        # the driver's filesystem when the path is node-local
        os.makedirs(target, exist_ok=True)
        for pdf in pdfs:
            rows = []
            for name, nrec, content in zip(
                pdf["file_name"], pdf["records"], pdf["content"]
            ):
                data = bytes(content)
                tmp = os.path.join(target, f".{name}.tmp")
                with open(tmp, "wb") as fh:
                    fh.write(data)
                os.replace(tmp, os.path.join(target, name))  # atomic
                rows.append((name, int(nrec), len(data)))
            yield pd.DataFrame(
                rows, columns=["file_name", "records", "bytes"]
            )

    return files.mapInPandas(_put, manifest_schema)
