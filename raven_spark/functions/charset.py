"""Charset model + conversion pipeline (reference: src/charset.rs,
src/application/core_types/crawler/result.rs:120-131).

The reference supports a 39-variant WHATWG charset set via encoding_rs
(charset.rs:13-53) and converts text bodies decode(source)->UTF-8->
encode(output) (charset.rs:100-103). Python's ``codecs`` covers the same
WHATWG encodings; we normalize the label set and replicate:

- conversion applies to *text* MIMEs only (result.rs:120-131)
- post-conversion charset mismatch vs configured output is error 700
  CharsetConversionError (crawler.rs:91-108, result.rs:32-40)
- 4xx/5xx error bodies are force-converted to UTF-8 before the error
  record is built (crawler.rs:111,114)

Our engine's pages/text tables are always UTF-8 (input_hint `text:string`);
non-UTF-8 output encodings exist for sink parity only.
"""

from __future__ import annotations

import codecs

# WHATWG label -> python codec. Mirrors the charset set of charset.rs:13-53
# (the subset with Python stdlib codecs; all the reference's CJK/cyrillic/
# latin variants are here).
WHATWG_TO_PYTHON: dict[str, str] = {
    "utf-8": "utf-8",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "ibm866": "cp866",
    "iso-8859-2": "iso8859-2",
    "iso-8859-3": "iso8859-3",
    "iso-8859-4": "iso8859-4",
    "iso-8859-5": "iso8859-5",
    "iso-8859-6": "iso8859-6",
    "iso-8859-7": "iso8859-7",
    "iso-8859-8": "iso8859-8",
    # iso-8859-8-i = logical-order hebrew; byte mapping identical to
    # iso-8859-8 (visual) — python has no separate codec, WHATWG maps both
    "iso-8859-8-i": "iso8859-8",
    "x-mac-cyrillic": "mac_cyrillic",
    "iso-8859-10": "iso8859-10",
    "iso-8859-13": "iso8859-13",
    "iso-8859-14": "iso8859-14",
    "iso-8859-15": "iso8859-15",
    "iso-8859-16": "iso8859-16",
    "koi8-r": "koi8-r",
    "koi8-u": "koi8-u",
    "macintosh": "mac-roman",
    "windows-874": "cp874",
    "windows-1250": "cp1250",
    "windows-1251": "cp1251",
    "windows-1252": "cp1252",
    "windows-1253": "cp1253",
    "windows-1254": "cp1254",
    "windows-1255": "cp1255",
    "windows-1256": "cp1256",
    "windows-1257": "cp1257",
    "windows-1258": "cp1258",
    "gbk": "gbk",
    "gb18030": "gb18030",
    "big5": "big5",
    "euc-jp": "euc-jp",
    "iso-2022-jp": "iso2022-jp",
    "shift_jis": "shift_jis",
    "euc-kr": "euc-kr",
    "utf-16": "utf-16",
    "x-user-defined": "latin-1",
}

# common aliases seen in Content-Type headers, normalized to WHATWG labels
_ALIASES = {
    "utf8": "utf-8",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "eucjp": "euc-jp",
    "latin1": "windows-1252",
    "iso-8859-1": "windows-1252",  # WHATWG maps latin-1 to windows-1252
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "cp1251": "windows-1251",
    "cp1252": "windows-1252",
    "gb2312": "gbk",  # WHATWG alias
}


def normalize_charset(label: str | None) -> str | None:
    """Charset label -> canonical WHATWG label, or None if unknown.
    Unknown labels are data errors, not exceptions (charset.rs:207-234
    rejects strictly at config parse; at fetch time unknowns degrade to
    octet-stream handling like mime.rs fallback)."""
    if not label:
        return None
    label = label.strip().strip('"').strip("'").lower()
    label = _ALIASES.get(label, label)
    return label if label in WHATWG_TO_PYTHON else None


class CharsetConversionError(Exception):
    """Maps to result_code 700 (result.rs:24-27, code at result.rs:38)."""


def convert_bytes(
    body: bytes, input_charset: str | None, output_charset: str = "utf-8"
) -> tuple[bytes, str]:
    """decode(input)->str->encode(output), the charset.rs:100-103 pipeline.

    Returns (converted_bytes, actual_output_charset). Decode errors use
    'replace' (encoding_rs substitutes U+FFFD the same way); encode errors
    raise CharsetConversionError -> caller records code 700.
    """
    in_label = normalize_charset(input_charset) or "utf-8"
    out_label = normalize_charset(output_charset) or "utf-8"
    text = body.decode(WHATWG_TO_PYTHON[in_label], errors="replace")
    try:
        out = text.encode(WHATWG_TO_PYTHON[out_label], errors="strict")
    except (UnicodeEncodeError, LookupError) as e:
        raise CharsetConversionError(
            f"cannot encode body to {out_label}: {e}"
        ) from e
    return out, out_label


def convert_and_decode(
    body: bytes, input_charset: str | None, output_charset: str = "utf-8"
) -> tuple[str, bytes, str]:
    """Single-decode variant of ``convert_bytes`` for the fetch hot path:
    returns (decoded_text, converted_bytes, actual_output_charset) so the
    caller gets the str for extraction AND the re-encoded body from ONE
    decode instead of two (charset.rs:100-103 semantics preserved)."""
    in_label = normalize_charset(input_charset) or "utf-8"
    out_label = normalize_charset(output_charset) or "utf-8"
    text = body.decode(WHATWG_TO_PYTHON[in_label], errors="replace")
    try:
        out = text.encode(WHATWG_TO_PYTHON[out_label], errors="strict")
    except (UnicodeEncodeError, LookupError) as e:
        raise CharsetConversionError(
            f"cannot encode body to {out_label}: {e}"
        ) from e
    return text, out, out_label


def decode_to_str(body: bytes, input_charset: str | None) -> str:
    """Decode to a Python str (our engine's UTF-8-native text path)."""
    in_label = normalize_charset(input_charset) or "utf-8"
    return body.decode(WHATWG_TO_PYTHON[in_label], errors="replace")


def is_known_charset(label: str) -> bool:
    return normalize_charset(label) is not None


# sanity: every mapped codec must exist in this interpreter
for _label, _codec in WHATWG_TO_PYTHON.items():
    codecs.lookup(_codec)
