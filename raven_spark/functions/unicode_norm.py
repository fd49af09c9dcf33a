"""Unicode normalization for multilingual dedup identity.

``operators/dedup.norm_text_col`` (lower/trim/collapse) is byte-exact
for ASCII-dominant corpora, but a web corpus carries the same logical
text in different Unicode spellings: composed vs combining accents
(U+00E9 vs e+U+0301), fullwidth forms, ligatures. Without normalization
those are distinct dedup keys and near-dup signatures diverge on
byte-identical-looking documents.

Two levels, matching what dedup actually needs:

- NFC (canonical composition): the safe default — visually/canonically
  identical strings become codepoint-identical, nothing lossy. DuckDB's
  ``nfc_normalize`` replays it exactly, so NFC-keyed dedup stays
  oracle-checkable.
- NFKC (compatibility): also folds fullwidth/ligature/superscript
  forms — stronger recall for CJK/web-typography corpora, slightly
  lossy (superscripts flatten). Exposed but not the default.

Implementation: Arrow-batched pandas UDF over ``unicodedata`` (CPython's
bundled Unicode tables — there is no JVM builtin for NFC in Spark SQL).
Cost model is the same class as the extract_text kernel: pure C-level
per-string calls inside an Arrow batch, no JVM<->Python row chatter.
ASCII fast path: chunks that are pure ASCII skip normalization entirely
(normalize is identity on ASCII), which on ASCII-dominant web text makes
the UDF a near-no-op.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf


def _norm_series(s: pd.Series, form: str) -> pd.Series:
    def one(x: str) -> str:
        if x.isascii():  # identity on ASCII: skip the table walk
            return x
        return unicodedata.normalize(form, x)

    return s.map(one, na_action="ignore")


@pandas_udf(T.StringType())
def nfc_normalize_udf(s: pd.Series) -> pd.Series:
    return _norm_series(s, "NFC")


@pandas_udf(T.StringType())
def nfkc_normalize_udf(s: pd.Series) -> pd.Series:
    return _norm_series(s, "NFKC")


def unicode_norm_col(text: Column, form: str = "NFC") -> Column:
    """The multilingual dedup identity: Unicode-normalize, then the same
    lower/trim/collapse as operators/dedup.norm_text_col. Drop-in
    replacement for that transform wherever the corpus isn't
    ASCII-dominant (exact_dedup/clean_corpus key on its xxhash64)."""
    udf = {"NFC": nfc_normalize_udf, "NFKC": nfkc_normalize_udf}[form]
    return F.regexp_replace(F.lower(F.trim(udf(text))), r"\s+", " ")
