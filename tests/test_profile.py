"""Column profiling (ops/profile.py): exact counts incl. the
null-counts-as-a-distinct-value convention, empties, empty input,
column subsetting, mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.profile import duckdb_profile_sql  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-profile-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


ROWS = [(1, "a", ""), (2, "a", None), (3, None, "x"), (4, "b", "x")]


def test_profile_counts(spark):
    from hickoryspark.ops.profile import profile_columns

    df = spark.createDataFrame(ROWS, "k long, s string, t string")
    out = {r["column"]: (r["col_pos"], r["n_rows"], r["n_null"],
                         r["n_distinct"], r["n_empty"])
           for r in profile_columns(df).collect()}
    assert out["k"] == (0, 4, 0, 4, 0)
    assert out["s"] == (1, 4, 1, 3, 0)   # a, b + NULL counts
    assert out["t"] == (2, 4, 1, 3, 1)   # '', x + NULL; one empty


def test_subset_and_empty_input(spark):
    from hickoryspark.ops.profile import profile_columns

    df = spark.createDataFrame([], "k long, s string")
    out = profile_columns(df, ["s"]).collect()
    assert [(r["column"], r["n_rows"], r["n_null"], r["n_distinct"],
             r["n_empty"]) for r in out] == [("s", 0, 0, 0, 0)]


def test_empty_column_list_raises(spark):
    from hickoryspark.ops.profile import (duckdb_profile_sql,
                                          profile_columns)

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        profile_columns(df, [])
    with pytest.raises(ValueError):
        duckdb_profile_sql("t", [])


def test_mirror_agreement(spark):
    from hickoryspark.ops.profile import profile_columns

    df = spark.createDataFrame(ROWS, "k long, s string, t string")
    got = sorted(tuple(r) for r in profile_columns(df).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (k BIGINT, s VARCHAR, t VARCHAR)")
    con.executemany("INSERT INTO t0 VALUES (?, ?, ?)", ROWS)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_profile_sql("t0", ["k", "s", "t"])).fetchall())
    assert got == want
