"""Soft-404 detection (ops/soft404.py): rule components, NULL
handling, thin threshold boundary, DuckDB mirror agreement."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-soft404-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


LONG = " ".join(f"w{i}" for i in range(50))

ROWS = [
    # (url, status, title, text)
    ("u0", 200, "Welcome", LONG),                      # clean
    ("u1", 200, "404 Not Found", LONG),                # title hit
    ("u2", 200, "ok", "this page does not exist"),     # phrase + thin
    ("u3", 404, "404 Not Found", "gone"),              # real 404
    ("u4", 200, "ok", LONG + " not be found here"),    # phrase, fat
    ("u5", 200, None, None),                           # NULLs
    ("u6", None, "Page Not Found", "x"),               # NULL status
    ("u7", 200, "PAGE NOT FOUND", LONG),               # case-fold
]

EXPECT_SOFT = {"u1", "u2", "u7"}


def _run(spark, thin_tokens=20):
    from hickoryspark.ops.soft404 import soft404_signals

    df = spark.createDataFrame(
        ROWS, "url string, status int, title string, text string")
    return {r["url"]: r.asDict()
            for r in soft404_signals(df, thin_tokens=thin_tokens).collect()}


def test_verdicts(spark):
    out = _run(spark)
    assert {u for u, r in out.items() if r["is_soft404"]} == EXPECT_SOFT


def test_components(spark):
    out = _run(spark)
    assert out["u1"]["title_404"] and not out["u1"]["thin"]
    assert out["u2"]["phrase_hit"] and out["u2"]["thin"]
    assert out["u4"]["phrase_hit"] and not out["u4"]["thin"]
    assert out["u5"]["n_tokens"] == 0 and not out["u5"]["is_soft404"]
    assert not out["u6"]["is_soft404"]  # NULL status never 200


def test_thin_threshold_boundary(spark):
    from hickoryspark.ops.soft404 import soft404_signals

    df = spark.createDataFrame(
        [("a", 200, "t", " ".join(["404"] + ["w"] * 19)),
         ("b", 200, "t", " ".join(["404"] + ["w"] * 18))],
        "url string, status int, title string, text string")
    out = {r["url"]: r for r in soft404_signals(df).collect()}
    assert out["a"]["n_tokens"] == 20 and not out["a"]["is_soft404"]
    assert out["b"]["n_tokens"] == 19 and out["b"]["is_soft404"]


def test_mirror_agrees(spark):
    import duckdb

    from hickoryspark.ops.soft404 import duckdb_soft404_sql

    got = _run(spark)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p(url VARCHAR, status INT, title VARCHAR, "
        "text VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?, ?)", ROWS)
    cols = duckdb_soft404_sql()
    for u, n, t4, ph, th, s4 in con.execute(
            f"SELECT url, {cols} FROM p").fetchall():
        g = got[u]
        assert (g["n_tokens"], g["title_404"], g["phrase_hit"],
                g["thin"], g["is_soft404"]) == (n, t4, ph, th, s4), u


def test_pattern_has_no_case_flag_and_folds_ascii_only(spark):
    # review regression: (?i) folds differently in Java vs RE2 on
    # non-ASCII (U+017F); the generated pattern must use explicit
    # ASCII classes and both engines must agree on a kafka-s subject
    import duckdb

    from hickoryspark.ops.soft404 import ERROR_PHRASE_RE, soft404_signals

    assert "(?i)" not in ERROR_PHRASE_RE
    tricky = "thiſ page doeſ not exiſt"
    df = spark.createDataFrame(
        [("u", 200, tricky, tricky)],
        "url string, status int, title string, text string")
    row = soft404_signals(df).collect()[0]
    got = (row["title_404"], row["phrase_hit"])
    con = duckdb.connect()
    want = con.execute(
        "SELECT regexp_matches(?, ?), regexp_matches(?, ?)",
        [tricky, ERROR_PHRASE_RE, tricky, ERROR_PHRASE_RE]).fetchone()
    assert got == tuple(want) == (False, False)
