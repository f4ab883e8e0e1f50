"""Invisible/bidi character audit (ops/invischars.py)."""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ZW = ["\u200b", "\u200c", "\u200d", "\u2060", "\ufeff"]
BIDI = ["\u061c", "\u200e", "\u200f",
        "\u202a", "\u202b", "\u202c", "\u202d", "\u202e",
        "\u2066", "\u2067", "\u2068", "\u2069"]
SHY = "\u00ad"


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-invischars-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, rows):
    from hickoryspark.ops.invischars import invisible_char_audit

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted(tuple(r) for r in
                  invisible_char_audit(df).collect())


def _mirror(rows):
    from hickoryspark.ops.invischars import duckdb_invischars_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?,?)", rows)
    got = con.execute(duckdb_invischars_sql("docs")).fetchall()
    con.close()
    return sorted(tuple(r) for r in got)


def _expect(doc_id, text):
    zw = sum(text.count(c) for c in ZW)
    bi = sum(text.count(c) for c in BIDI)
    shy = text.count(SHY)
    n = len(text)
    ppm = None if n == 0 else 1000000 * (zw + bi + shy) // n
    return (doc_id, n, zw, bi, shy, ppm, 1 if bi else 0)


def test_counts_and_flags(spark):
    rows = [
        (1, "clean text"),
        (2, "a" + ZW[0] + "b" + ZW[2] + "c"),
        (3, "x" + BIDI[5] + "evil" + BIDI[6] + " y "
            + BIDI[8] + "z" + BIDI[11]),
        (4, "hy" + SHY + "phen" + SHY + "ated"),
        (5, ""),
        (6, None),
    ]
    got = _run(spark, rows)
    assert got == [_expect(d, t) for d, t in rows if t is not None]
    assert got[1][2] == 2 and got[2][3] == 4 and got[3][4] == 2
    assert got[2][6] == 1  # Trojan-Source flag
    assert got == _mirror(rows)


def test_every_class_member_counted(spark):
    rows = [(i, f"a{c}b") for i, c in enumerate(ZW + BIDI + [SHY])]
    got = _run(spark, rows)
    for i, r in enumerate(got):
        assert r[2] + r[3] + r[4] == 1, r
        assert r[6] == (1 if len(ZW) <= i < len(ZW) + len(BIDI) else 0)
    assert got == _mirror(rows)


def test_fuzz_vs_mirror(spark):
    rng = random.Random(7)
    pool = ZW + BIDI + [SHY] + list("abc 123 é中")
    rows = [(i, "".join(rng.choice(pool)
                        for _ in range(rng.randint(0, 40))))
            for i in range(30)]
    assert _run(spark, rows) == _mirror(rows)
