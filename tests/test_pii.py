"""PII scrub (functions/pii.py): category counts, redaction order,
idempotence, clean-text passthrough."""

from __future__ import annotations

from pyspark.sql import functions as F

from raven_spark.functions.pii import redact_pii_col, scrub_pii


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_scrub_counts_and_redaction(spark):
    texts = [
        "write to a.b+c@mail.example or x@y.io today",
        "server 10.0.3.7 gateway 255.255.255.0",
        "call +1 555-0042 or +44 207-9460",
        "mixed: bob@corp.example at 192.168.1.1 call +49 301-2345",
        "clean text with no identifiers at all",
    ]
    rows = {r["id"]: r for r in scrub_pii(_docs(spark, texts)).collect()}
    assert (rows[0]["n_emails"], rows[0]["n_ips"], rows[0]["n_phones"]) == (2, 0, 0)
    assert rows[0]["redacted"] == "write to <EMAIL> or <EMAIL> today"
    assert (rows[1]["n_emails"], rows[1]["n_ips"]) == (0, 2)
    assert rows[1]["redacted"] == "server <IP> gateway <IP>"
    assert rows[2]["n_phones"] == 2
    assert rows[2]["redacted"] == "call <PHONE> or <PHONE>"
    assert rows[3]["has_pii"] and rows[3]["redacted"] == "mixed: <EMAIL> at <IP> call <PHONE>"
    assert not rows[4]["has_pii"]
    assert rows[4]["redacted"] == texts[4]  # untouched


def test_scrub_negative_shapes_not_matched(spark):
    # shapes that look adjacent to PII but must NOT be scrubbed
    texts = [
        "version 1.2.3 released",        # 3-part dotted number: not an IPv4
        "user_@bad and a@b.c",           # bad host start / 1-char TLD
        "in 1999 2000 people came",      # bare digit runs: not phones
        "price +49 99",                  # too-short groups
    ]
    for r in scrub_pii(_docs(spark, texts)).collect():
        assert not r["has_pii"], r
        assert r["redacted"] == texts[r["id"]]


def test_redaction_idempotent(spark):
    df = _docs(spark, ["bob@corp.example at 10.1.2.3 call +1 555-0042"])
    once = df.select(redact_pii_col(F.col("text")).alias("t"))
    twice = once.select(redact_pii_col(F.col("t")).alias("t"))
    assert once.collect()[0]["t"] == twice.collect()[0]["t"]


def test_email_host_not_half_eaten_by_ip_pass(spark):
    # numeric-host email: the email pass must consume it whole before the
    # IP pass sees the dotted quad
    df = _docs(spark, ["root@10.1.2.3.example.com done"])
    out = scrub_pii(df).collect()[0]
    assert out["n_emails"] == 1
    assert out["redacted"] == "root@<IP>.example.com done" or out["redacted"] == "<EMAIL> done"
    # exact behavior: email regex matches the whole address (host starts
    # alphanumeric), so the full-address replacement wins
    assert out["redacted"] == "<EMAIL> done"


def test_pseudonymize_emails_stable_and_interleaved(spark):
    from raven_spark.functions.pii import pseudonymize_pii

    df = spark.createDataFrame(
        [
            (1, "contact Bob@Example.com or alice@test.org today"),
            (2, "reply to bob@example.com please"),  # same addr, lowercase
            (3, "no pii here"),
            (4, ""),
            (5, None),
            (6, "a@b.io b@c.io back-to-back a@b.io"),
        ],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in pseudonymize_pii(df).collect()}
    import re

    p1 = rows[1]["pseudonymized"]
    assert re.fullmatch(r"contact <EMAIL:\d+> or <EMAIL:\d+> today", p1)
    # case variants of the same address share the surrogate
    tok_bob_1 = re.findall(r"<EMAIL:\d+>", p1)[0]
    tok_bob_2 = re.findall(r"<EMAIL:\d+>", rows[2]["pseudonymized"])[0]
    assert tok_bob_1 == tok_bob_2
    # distinct addresses get distinct surrogates
    toks1 = re.findall(r"<EMAIL:\d+>", p1)
    assert toks1[0] != toks1[1]
    # repeated address within a doc repeats its surrogate
    toks6 = re.findall(r"<EMAIL:\d+>", rows[6]["pseudonymized"])
    assert toks6[0] == toks6[2] and toks6[0] != toks6[1]
    # non-matching docs unchanged; NULL stays NULL
    assert rows[3]["pseudonymized"] == "no pii here"
    assert rows[4]["pseudonymized"] == ""
    assert rows[5]["pseudonymized"] is None
    assert rows[1]["n_emails"] == 2 and rows[3]["n_emails"] == 0


def test_pseudonymize_idempotent_and_not_reflagged(spark):
    from raven_spark.functions.pii import pii_count_cols, pseudonymize_pii

    df = spark.createDataFrame(
        [(1, "mail me: x.y+z@host.co.uk!")], "doc_id long, text string"
    )
    once = pseudonymize_pii(df).withColumnRenamed("pseudonymized", "text")
    twice = pseudonymize_pii(once.withColumnRenamed("id", "doc_id"))
    a = once.collect()[0]["text"]
    b = twice.collect()[0]["pseudonymized"]
    assert a == b  # idempotent
    again = twice.select(
        pii_count_cols(twice["pseudonymized"])["n_emails"].alias("n")
    ).collect()[0]["n"]
    assert again == 0  # surrogates are not email-shaped


def test_pseudonymize_shuffle_free(spark):
    from raven_spark.functions.pii import pseudonymize_pii

    df = spark.createDataFrame([(1, "a@b.io")], "doc_id long, text string")
    plan = pseudonymize_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
