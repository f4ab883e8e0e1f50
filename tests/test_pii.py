"""ops/pii.py: redaction/count behavior, rule ordering, and the
Java-regex vs DuckDB-RE2 dialect lockstep (the op ships its own
mirror — any divergence on adversarial strings is a bug here, not
just a gate hash-mismatch)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


CASES = [
    ("mail bob.smith+tag@sub.example.co.uk now",
     "mail <EMAIL> now"),
    ("at 192.168.0.1 and 10.0.0.255.", "at <IP> and <IP>."),
    # '.' is a non-word char, so \b does NOT stop the first four
    # octets of a 5-octet version string from matching — the
    # false-positive redaction is accepted, documented behavior
    ("v 1.2.3.4.5 stays", "v <IP>.5 stays"),
    ("call +44 20 7946 0958 or +4915123456789",
     "call <PHONE> or <PHONE>"),
    # email wins over phone on its numeric fragments (rule order)
    ("x +12.3456@h.io y", "x <EMAIL> y"),
    ("no pii here 123 456", "no pii here 123 456"),
    # separated phone then ip in one string
    ("+1 555 0100 at 8.8.8.8", "<PHONE> at <IP>"),
]


def test_redaction_cases(spark):
    from pyspark.sql import functions as F

    from hickoryspark.ops.pii import redact_pii_col

    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(CASES)],
                               "i long, t string")
    got = {r["i"]: r["red"] for r in
           df.select("i", redact_pii_col(F.col("t")).alias("red")).collect()}
    for i, (t, want) in enumerate(CASES):
        assert got[i] == want, t


def test_counts(spark):
    from hickoryspark.ops.pii import pii_counts

    df = spark.createDataFrame(
        [(1, "a@b.io c@d.org 1.2.3.4 +44 123 4567 +12345678")],
        "doc_id long, text string")
    row = pii_counts(df).collect()[0]
    assert (row["n_email"], row["n_ip"], row["n_phone"]) == (2, 1, 2)


def test_counts_follow_redaction_order(spark):
    """Counts mirror the progressive redaction: a kind swallowed by an
    earlier rule is NOT counted, so n_<kind> always equals the number
    of <KIND> placeholders in text_redacted (review repro: counting on
    the original text reported an <IP> that no placeholder backs)."""
    from hickoryspark.ops.pii import pii_report

    rows = {r["doc_id"]: r for r in pii_report(spark.createDataFrame(
        [
            (1, "ping u@1.2.3.4.net ok"),      # the IP is email domain
            (2, "x +12 34 56@example.com y"),  # phone tail is email local
        ],
        "doc_id long, text string")).collect()}
    r1 = rows[1]
    assert r1["text_redacted"] == "ping <EMAIL> ok"
    assert (r1["n_email"], r1["n_ip"], r1["n_phone"]) == (1, 0, 0)
    r2 = rows[2]
    assert r2["text_redacted"] == "x +12 34 <EMAIL> y"
    assert (r2["n_email"], r2["n_ip"], r2["n_phone"]) == (1, 0, 0)
    for r in rows.values():
        for kind in ("EMAIL", "IP", "PHONE"):
            assert r[f"n_{kind.lower()}"] == \
                r["text_redacted"].count(f"<{kind}>")


def test_duckdb_mirror_matches_spark(spark):
    """Every CASES string plus hostile edge strings through BOTH
    dialects — redaction and counts must agree byte-for-byte."""
    import duckdb
    from pyspark.sql import functions as F

    from hickoryspark.ops.pii import (
        _count_cols, duckdb_count_sql, duckdb_redact_sql, redact_pii_col,
    )

    texts = [t for t, _ in CASES] + [
        "", "@", "+", "a@b", "a@b.c", "1.2.3", "....", "+1 2 3",
        "x" * 50 + "@" + "y" * 50 + ".com",
        "+123-45-678-90 and 0.0.0.0",
        "a@b.io@c.io", "tab\t+12 34 56\nnewline 9.9.9.9x",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    cols = _count_cols(F.col("t"))
    srows = df.select(
        "i", redact_pii_col(F.col("t")).alias("red"),
        *(c.cast("long").alias(k) for k, c in cols.items()),
    ).collect()
    con = duckdb.connect()
    csql = duckdb_count_sql("t")
    for r, t in zip(sorted(srows, key=lambda r: r["i"]), texts):
        red, ne, ni, np_ = con.execute(
            f"SELECT {duckdb_redact_sql('t')}, {csql['n_email']},"
            f" {csql['n_ip']}, {csql['n_phone']} FROM (SELECT ? AS t)",
            [t],
        ).fetchone()
        assert r["red"] == red, t
        assert (r["n_email"], r["n_ip"], r["n_phone"]) == (ne, ni, np_), t


# ------------------------------------------------------- deobfuscation

DEOB_CASES = [
    ("mail me: jo [at] ex [dot] com", 0, 1),
    ("jo(at)ex(dot)com and a@b.org", 1, 2),
    ("curly jo {at} ex {dot} org", 0, 1),
    ("mixed jo [at) ex (dot] net", 0, 1),   # unmatched pairs fold too
    ("plain a@b.org only", 1, 1),
    ("the cat sat", 0, 0),                  # bare words never fold
    (None, 0, 0),
]


def test_deobfuscated_emails(spark):
    from hickoryspark.ops.pii import deobfuscated_emails

    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(DEOB_CASES)],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_plain"], r["n_deobfuscated"], r["n_hidden"])
           for r in deobfuscated_emails(df).collect()}
    for i, (t, plain, deob) in enumerate(DEOB_CASES):
        assert got[i] == (plain, deob, deob - plain), (t, got[i])


def test_deobfuscated_mirror(spark):
    import duckdb

    from hickoryspark.ops.pii import duckdb_deobfuscated_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO d VALUES (?, ?)",
        [(i, t) for i, (t, _, _) in enumerate(DEOB_CASES)])
    mir = {r[0]: r[1:] for r in con.execute(
        duckdb_deobfuscated_sql("d")).fetchall()}
    for i, (t, plain, deob) in enumerate(DEOB_CASES):
        assert mir[i] == (plain, deob, deob - plain), (t, mir[i])
