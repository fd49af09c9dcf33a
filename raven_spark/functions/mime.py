"""MIME model + Content-Type parsing (reference: src/mime.rs).

The reference models a closed MIME enum (mime.rs:12-39): octet-stream,
pdf, jpeg/gif/png, Text{10 subtypes, charset}, Other — parsed from the
Content-Type header (mime.rs:135-212). We keep the same closed domain as
a (mime, charset) string pair so it lives in ordinary columns.

Intentional divergence, documented: the reference *serializes* image
MIMEs as ``img/jpeg`` etc. (mime.rs:124-128,155-157 quirk); we emit the
standard ``image/jpeg`` and note the reference quirk here rather than
propagate it.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

TEXT_SUBTYPES = {
    # mime.rs:24-35 — the 10 text subtypes the reference recognizes
    "plain", "css", "csv", "html", "javascript", "xml",
    "json", "markdown", "calendar", "ecmascript",
}

_KNOWN = {
    "application/octet-stream",
    "application/pdf",
    "image/jpeg",
    "image/gif",
    "image/png",
}

# application/* types the reference folds into Text (json/xml/javascript
# are text-bodied; mime.rs parser treats them via text_type)
_APP_TEXT = {"json", "xml", "javascript", "ecmascript"}

_CT_RE = re.compile(r"^\s*([!#$%&'*+.^_`|~0-9a-zA-Z-]+)/([!#$%&'*+.^_`|~0-9a-zA-Z-]+)")
_CHARSET_RE = re.compile(r"charset\s*=\s*\"?([^\";\s]+)\"?", re.IGNORECASE)


def parse_content_type(
    header: str | None, fallback_charset: str | None = None
) -> tuple[str, str | None]:
    """Content-Type header -> (mime, charset).

    Semantics from crawler.rs:62-73 + mime.rs:135-212:
    - unparseable / missing header: fallback text/plain+input-charset if an
      input charset is configured (crawler.rs:163-176), else
      application/octet-stream (crawler.rs:73)
    - text/* keeps its charset param (default None -> treated as utf-8
      downstream); an input-charset override beats the header's
      (crawler.rs:150-161 applies the override at resolution time)
    - non-text known types carry no charset
    - anything else -> ('other/other' normalized form, None)
    """
    if not header or not _CT_RE.match(header):
        if fallback_charset:
            return "text/plain", fallback_charset
        return "application/octet-stream", None
    m = _CT_RE.match(header)
    assert m is not None
    major, minor = m.group(1).lower(), m.group(2).lower()
    full = f"{major}/{minor}"

    charset = None
    cm = _CHARSET_RE.search(header)
    if cm:
        charset = cm.group(1).lower()
    if fallback_charset:  # configured input charset overrides the header
        charset = fallback_charset

    if major == "text" and minor in TEXT_SUBTYPES:
        return full, charset
    if major == "application" and minor in _APP_TEXT:
        return full, charset
    if full in _KNOWN:
        return full, None
    if major == "text":
        # unknown text subtype -> Other in the reference (mime.rs closed
        # enum); we preserve the spelling but mark no charset handling
        return full, charset
    return full, None


def is_text_mime(mime: str) -> bool:
    """Does the charset pipeline apply? (result.rs:120-131 gates on Text)."""
    major, _, minor = mime.partition("/")
    return (major == "text") or (major == "application" and minor in _APP_TEXT)


# --- payload magic-byte sniffing (column algebra) ---------------------------

# (hex-prefix, offset-in-hex-chars, mime) — longest/most-specific first.
# Public magic numbers (IANA / file(1) magic database common set).
_MAGIC = [
    ("89504E47", 0, "image/png"),
    ("47494638", 0, "image/gif"),
    ("FFD8FF", 0, "image/jpeg"),
    ("25504446", 0, "application/pdf"),
    ("504B0304", 0, "application/zip"),
    ("504B0506", 0, "application/zip"),
    ("504B0708", 0, "application/zip"),
    ("1F8B", 0, "application/gzip"),
    ("494433", 0, "audio/mpeg"),
    ("4F676753", 0, "application/ogg"),
    ("424D", 0, "image/bmp"),
    ("66747970", 8, "video/mp4"),  # 'ftyp' at byte offset 4
]

_RIFF = "52494646"
_WEBP = "57454250"  # bytes 9-12
_WAVE = "57415645"


def sniff_mime_col(bin_col):
    """Content sniffing over a binary payload column — what the bytes
    actually are, independent of what the server CLAIMED (the header
    MIME resolution in resolve_mime, reference mime.rs C1, trusts the
    server; real crawls meet lying/absent Content-Type constantly, and
    a training pipeline routing payloads by declared type mis-shards
    them). Pure codegen'd column algebra: one 16-byte binary substring,
    one hex, a chain of prefix tests against the public magic-number
    set — zero Python, fused into the scan, SQL-replayable (the twin
    hexes the same 16 bytes).

    Returns 'application/octet-stream' when nothing matches; HTML is
    sniffed only by its unambiguous openings ('<!DO', '<htm', '<HTM',
    '<?xm') — full WHATWG sniffing is deliberately out of scope (it
    requires scanning, not prefixing).
    """
    if isinstance(bin_col, str):
        bin_col = F.col(bin_col)
    p = F.upper(F.hex(F.substring(bin_col, 1, 16)))
    expr = F.lit("application/octet-stream")
    # build the chain in reverse so the FIRST listed magic wins ties
    html_openings = ["3C21444F", "3C68746D", "3C48544D", "3C3F786D"]
    for h in reversed(html_openings):
        expr = F.when(p.startswith(h), F.lit("text/html")).otherwise(expr)
    for hexpre, off, mime in reversed(_MAGIC):
        cond = F.substring(p, off + 1, len(hexpre)) == F.lit(hexpre)
        expr = F.when(cond, F.lit(mime)).otherwise(expr)
    # RIFF container: subtype at bytes 9-12
    expr = F.when(
        p.startswith(_RIFF),
        F.when(F.substring(p, 17, 8) == _WEBP, F.lit("image/webp"))
        .when(F.substring(p, 17, 8) == _WAVE, F.lit("audio/wav"))
        .otherwise(F.lit("application/octet-stream")),
    ).otherwise(expr)
    # NULL payload sniffs to NULL, not 'application/octet-stream': a row
    # that was never fetched has no bytes to sniff, and conflating it
    # with "unrecognized bytes" mis-reports the no-payload population
    return F.when(bin_col.isNotNull(), expr)


def payload_mime_report(
    df,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    declared_col: str | None = None,
):
    """Per-row sniff + declared-vs-actual mismatch flag (NULL declared
    -> mismatch NULL). One projection, zero exchanges."""
    sniffed = sniff_mime_col(F.col(bin_col))
    cols = [
        F.col(id_col).alias("id"),
        sniffed.alias("sniffed_mime"),
        F.octet_length(F.col(bin_col)).cast("bigint").alias("n_bytes"),
    ]
    if declared_col is not None:
        d = F.lower(F.trim(F.split(F.col(declared_col), ";").getItem(0)))
        cols.append(F.col(declared_col).alias("declared_mime"))
        cols.append((d != sniffed).alias("mismatch"))
    return df.select(*cols)
