"""PII detection + redaction — the scrub pass every public-web training
corpus runs before the text reaches a tokenizer (emails, phone numbers,
IP addresses are the canonical categories in published pipelines:
BigCode/StarCoder PII, Dolma, RefinedWeb).

Everything is JVM-side column algebra (`regexp_extract_all` /
`regexp_replace`) — no Python in the hot path, whole-stage codegen'd, and
the scan runs at parquet-read speed. The patterns are deliberately
restricted to the regex subset with identical semantics in Java's engine
(Spark) and RE2 (DuckDB): character classes, bounded repetition, `\\b`,
alternation — no lookaround, no backreferences — so the DuckDB oracle
replays the exact operator.

Redaction order is fixed (email -> ip -> phone) and each category uses a
distinct placeholder, so counts remain auditable post-hoc and the pass is
idempotent (placeholders contain no matchable characters).

The reference has no corpus ops (it stops at persistence); this is a
task-brief LLM-pipeline addition, same tier as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Local-part chars per RFC-5321 common subset; TLD >= 2 alpha. The host
# label must start alphanumeric so "user_@bad" and trailing-dot noise
# don't match (same behavior in RE2 and Java).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9][A-Za-z0-9.-]*\.[A-Za-z]{2,}"
# Dotted-quad with word boundaries; octet-range validation is left to the
# consumer (a 999.1.1.1 "IP" in text is still PII-shaped and gets scrubbed).
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# International-prefix phones: +CC then two separator-joined groups — the
# high-precision shape; bare digit runs are deliberately NOT matched
# (they'd scrub years, ids, prices).
PHONE_RE = r"\+\d{1,3}[ -]\d{3}[ -]\d{4}"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_count_cols(text: Column) -> dict[str, Column]:
    """Per-category match counts (BIGINT), computed on the raw text."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0))).cast("bigint"),
        "n_ips": F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), F.lit(0))).cast("bigint"),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), F.lit(0))).cast("bigint"),
    }


def redact_pii_col(text: Column) -> Column:
    """Replace every match with its category placeholder, in the fixed
    order email -> ip -> phone (emails first so an address' host part is
    never half-eaten by the IP pass on numeric hosts)."""
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IP_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per doc: (id, n_emails, n_ips, n_phones, has_pii,
    redacted) — counts from the raw text, text with all categories
    replaced. Single projection over one scan; no shuffle."""
    c = pii_count_cols(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        c["n_emails"].alias("n_emails"),
        c["n_ips"].alias("n_ips"),
        c["n_phones"].alias("n_phones"),
        (c["n_emails"] + c["n_ips"] + c["n_phones"] > 0).alias("has_pii"),
        redact_pii_col(F.col(text_col)).alias("redacted"),
    )


# Pseudonymization: constants of the engine-wide SQL-replayable hash
# family (quality_model.py POLY_P / KNUTH_32)
_POLY_P = 1_000_000_007
_KNUTH_32 = 2_654_435_761


def _email_key_col(m: Column, space: int) -> Column:
    """Stable surrogate id for one matched address: Horner codepoint
    fold of the LOWERCASED match mod 1e9+7, Knuth-mixed into
    ``space``. Case variants of the same address collapse; all
    intermediates fit bigint (h < 1e9+7, h*K < 2.7e18)."""
    cps = F.transform(
        F.split(F.lower(m), ""), lambda c: F.ascii(c).cast("bigint")
    )
    h = F.aggregate(
        cps,
        F.lit(0).cast("bigint"),
        lambda acc, cp: F.pmod(acc * F.lit(31) + cp, F.lit(_POLY_P)),
    )
    return F.pmod(h * F.lit(_KNUTH_32), F.lit(int(space)))


def pseudonymize_emails_col(text: Column, space: int = 1_000_000_000) -> Column:
    """Replace every email with a STABLE pseudonym ``<EMAIL:k>`` where
    k is a keyed hash of the lowercased address — unlike redact_pii_col's
    one-token-for-all, the same author keeps the same surrogate across
    every document (referential integrity survives; the identity does
    not — the exact trade published code-PII pipelines make when they
    keep distinct placeholder indices per file).

    Mechanics are pure column algebra: split the text around the email
    regex (parts), extract the matches, hash each match, and re-
    interleave parts[0] m0 parts[1] m1 ... with one in-row fold — no
    Python, no shuffle, and the pseudonym alphabet ('<EMAIL:...>')
    contains no '@', so the pass is IDEMPOTENT and never re-flagged by
    pii_count_cols."""
    ms = F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0))
    parts = F.split(text, EMAIL_RE)
    pseudo = F.transform(
        ms,
        lambda m: F.concat(
            F.lit("<EMAIL:"),
            _email_key_col(m, space).cast("string"),
            F.lit(">"),
        ),
    )
    rebuilt = F.aggregate(
        F.sequence(F.lit(1), F.size(ms)),
        F.element_at(parts, 1),
        lambda acc, i: F.concat(
            acc, F.element_at(pseudo, i), F.element_at(parts, i + 1)
        ),
    )
    return F.when(F.size(ms) == 0, text).otherwise(rebuilt)


def pseudonymize_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    space: int = 1_000_000_000,
) -> DataFrame:
    """One row per doc: (id, n_emails, pseudonymized) — emails swapped
    for stable surrogates, other categories left to scrub_pii (ips and
    phone numbers carry no cross-document identity worth preserving).
    Single projection over one scan; no shuffle."""
    return df.select(
        F.col(id_col).alias("id"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(EMAIL_RE), F.lit(0))
        ).cast("bigint").alias("n_emails"),
        pseudonymize_emails_col(F.col(text_col), space).alias("pseudonymized"),
    )
