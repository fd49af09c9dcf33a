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
