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
