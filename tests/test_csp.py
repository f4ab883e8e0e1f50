"""CSP serialized-policy parsing (ops/csp.py)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-csp-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _parse(spark, policy):
    from hickoryspark.ops.csp import parse_csp

    df = spark.createDataFrame(
        [("u", 0, policy)], "url string, policy_idx long, policy string")
    return sorted(tuple(r)[2:] for r in parse_csp(df).collect())


def test_basic_directives_and_sources(spark):
    got = _parse(spark, "default-src 'self'; script-src 'self' cdn.ex")
    assert got == [
        (0, "default-src", 0, "'self'"),
        (1, "script-src", 0, "'self'"),
        (1, "script-src", 1, "cdn.ex"),
    ]


def test_valueless_directive_null_row(spark):
    got = _parse(spark, "upgrade-insecure-requests; img-src *")
    assert got == [
        (0, "upgrade-insecure-requests", None, None),
        (1, "img-src", 0, "*"),
    ]


def test_duplicate_directive_later_dropped_whole(spark):
    got = _parse(spark, "script-src a.ex; script-src b.ex; img-src c.ex")
    assert got == [
        (0, "script-src", 0, "a.ex"),
        (1, "img-src", 0, "c.ex"),
    ]


def test_case_fold_ws_and_empty_segments(spark):
    got = _parse(spark, " ;; \tDefault-SRC\t 'None' ;  ; ")
    assert got == [(0, "default-src", 0, "'None'")]


def test_bad_grammar_name_drops_segment(spark):
    got = _parse(spark, "defa*ult x; script-src a")
    assert got == [(0, "script-src", 0, "a")]


def test_empty_policy_no_rows(spark):
    assert _parse(spark, "") == []
    assert _parse(spark, " ; ; ") == []


def test_duckdb_mirror_agrees(spark):
    from hickoryspark.ops.csp import duckdb_csp_sql, parse_csp

    policies = [
        "default-src 'self'; script-src 'self' cdn.ex 'unsafe-inline'",
        "upgrade-insecure-requests",
        "script-src a; SCRIPT-src b; img-src c",
        " \t frame-ancestors\t'none' ;; style-src  a  b ",
        "bad*name x; ok-dir",
        "",
        "; ;",
        "a-b-c 1 2 3 4 5; a-b-c dup",
    ]
    rows = [("u%d" % i, i % 2, p) for i, p in enumerate(policies)]
    df = spark.createDataFrame(
        rows, "url string, policy_idx long, policy string")
    got = sorted(tuple(r) for r in parse_csp(df).collect())

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p AS SELECT * FROM (VALUES "
        + ",".join("('%s', %d, '%s')"
                   % (u, i, p.replace("'", "''")) for u, i, p in rows)
        + ") t(url, policy_idx, policy)")
    want = sorted(tuple(r) for r in con.execute(
        duckdb_csp_sql("p")).fetchall())
    assert got == want
