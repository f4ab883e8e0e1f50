"""Proper-noun candidate mining (ops/names.py)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-names-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _names(spark, rows):
    from hickoryspark.ops.names import name_candidates

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted(tuple(r) for r in name_candidates(docs).collect())


def test_runs_singletons_and_breaks(spark):
    got = _names(spark, [
        (1, "Alan Turing met Grace Brewster Hopper in Yorktown alone"),
    ])
    # 'Yorktown' is a single cap token -> dropped; 'in' breaks runs
    assert got == [
        (1, 0, "Alan Turing", 2),
        (1, 1, "Grace Brewster Hopper", 3),
    ]


def test_caps_rule_excludes_acronyms_digits_punct(spark):
    got = _names(spark, [
        (1, "IBM Watson Labs beat X1 Foo Bar. Baz Qux"),
    ])
    # IBM (all-caps) and X1 (digit) and 'Bar.' (punct) fail the rule;
    # 'Watson Labs' and 'Baz Qux' are runs; 'Foo' alone before the
    # broken 'Bar.' is a singleton
    assert got == [(1, 0, "Watson Labs", 2), (1, 1, "Baz Qux", 2)]


def test_no_candidates(spark):
    assert _names(spark, [(1, "all lower case words"), (2, "")]) == []


def test_duckdb_mirror_agrees(spark):
    from hickoryspark.ops.names import duckdb_names_sql

    rows = [
        (1, "Alan Turing met Grace Brewster Hopper in Yorktown"),
        (2, "IBM Watson Labs beat X1 Foo Bar. Baz Qux"),
        (3, ""),
        (4, "One Two Three Four Five six Seven Eight"),
    ]
    got = _names(spark, rows)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ",".join("(%d, '%s')" % r for r in rows)
        + ") t(doc_id, text)")
    want = sorted(tuple(r) for r in con.execute(
        duckdb_names_sql("d")).fetchall())
    assert got == want
