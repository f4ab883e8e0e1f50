"""Retention cohorts (ops/events.retention_cohorts) and postings
gap cost (ops/postings.postings_gap_cost): semantics + mirrors."""

from __future__ import annotations

import datetime as dt
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.events import duckdb_retention_sql  # noqa: E402
from hickoryspark.ops.postings import duckdb_gap_cost_sql  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-ret-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _ts(day, hour=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=day, hours=hour)


EVENTS = [
    # user 1: weeks 0, 1, 3 (two events in week 0)
    (1, _ts(0)), (1, _ts(2)), (1, _ts(8)), (1, _ts(22)),
    # user 2: weeks 0, 1
    (2, _ts(3)), (2, _ts(9)),
    # user 3: week 1 only (its own cohort)
    (3, _ts(10)),
    # NULLs drop
    (None, _ts(0)), (4, None),
    # pre-epoch events drop (negative week indices would diverge
    # between Spark's truncating div and DuckDB's flooring //)
    (5, _ts(-10)),
]


def test_retention_semantics(spark):
    from hickoryspark.ops.events import retention_cohorts

    df = spark.createDataFrame(EVENTS, "user_id long, ts timestamp_ntz")
    got = sorted(tuple(r) for r in retention_cohorts(df).collect())
    assert got == [
        (0, 0, 2, 2, 1000),   # users 1,2
        (0, 1, 2, 2, 1000),   # both retained in week 1
        (0, 3, 1, 2, 500),    # only user 1 at offset 3
        (1, 0, 1, 1, 1000),   # user 3's own cohort
    ]


def test_retention_mirror(spark):
    from hickoryspark.ops.events import retention_cohorts

    df = spark.createDataFrame(EVENTS, "user_id long, ts timestamp_ntz")
    got = sorted(tuple(r) for r in retention_cohorts(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE ev (user_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO ev VALUES (?, ?)", EVENTS)
    want = sorted(tuple(r) for r in
                  con.execute(duckdb_retention_sql("ev")).fetchall())
    assert got == want


DOCS = [
    (0, "alpha beta alpha"),
    (1, "beta gamma"),
    (130, "alpha"),        # gap 130 from doc 0 -> 2-byte varint
    (200, "beta delta"),
]


def test_gap_cost_semantics(spark):
    from hickoryspark.ops.postings import postings_gap_cost

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["term"]: tuple(r) for r in
           postings_gap_cost(df).collect()}
    # alpha: docs 0,130 -> gaps 1, 130 -> bytes 1+2=3; df 2
    assert got["alpha"] == ("alpha", 2, 3, 8000 * 3 // 2)
    # beta: docs 0,1,200 -> gaps 1,1,199 -> 1+1+2=4
    assert got["beta"] == ("beta", 3, 4, 8000 * 4 // 3)
    # delta: first gap = doc_id+1 = 201 -> 2 bytes
    assert got["delta"] == ("delta", 1, 2, 16000)
    assert got["gamma"] == ("gamma", 1, 1, 8000)


def test_gap_cost_mirror(spark):
    from hickoryspark.ops.postings import postings_gap_cost

    docs = DOCS + [(300 + i * 17, f"tok{i % 3} filler")
                   for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in postings_gap_cost(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE src (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?, ?)", docs)
    want = sorted(tuple(r) for r in
                  con.execute(duckdb_gap_cost_sql("src")).fetchall())
    assert got == want
