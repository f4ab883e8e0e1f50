"""Document integrity / truncation flags (ops/integrity.py)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-integrity-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


CASES = [
    (1, "Hello world."),        # terminal
    (2, "  cut mid sent"),      # starts_lower (after ltrim 'c')
    (3, "wow… \t"),             # unicode ellipsis, trailing ws
    (4, 'a ("x'),               # unbalanced paren + odd quote
    (5, ""),                    # empty -> all zero
    (6, 'He said "hi" ok...'),  # ascii ellipsis AND terminal '.'
    (7, "Closing) twice))"),    # negative paren delta
    (8, "\tUpper start!"),      # not starts_lower; terminal '!'
]


def _flags(spark, rows):
    from hickoryspark.ops.integrity import text_integrity

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted(tuple(r) for r in text_integrity(docs).collect())


def test_flag_semantics(spark):
    got = _flags(spark, CASES)
    assert got == [
        (1, 1, 0, 0, 0, 0),
        (2, 0, 0, 1, 0, 0),
        (3, 0, 1, 1, 0, 0),
        (4, 0, 0, 1, 1, 1),
        (5, 0, 0, 0, 0, 0),
        (6, 1, 1, 0, 0, 0),
        (7, 0, 0, 0, -3, 0),
        (8, 1, 0, 0, 0, 0),
    ]


def test_duckdb_mirror_agrees(spark):
    from hickoryspark.ops.integrity import duckdb_integrity_sql

    got = _flags(spark, CASES)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ",".join("(%d, '%s')" % (i, t.replace("'", "''"))
                   for i, t in CASES)
        + ") t(doc_id, text)")
    want = sorted(tuple(r) for r in con.execute(
        duckdb_integrity_sql("d")).fetchall())
    assert got == want
