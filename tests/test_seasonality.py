"""Event seasonality (ops/seasonality.py): hour/weekday fields,
convention-free dow, shares, mirror agreement."""

from __future__ import annotations

import datetime as dt
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.seasonality import duckdb_seasonality_sql  # noqa: E402

EVENTS = [
    (dt.datetime(2024, 1, 1, 9, 30),),    # Monday 9h
    (dt.datetime(2024, 1, 1, 9, 45),),    # Monday 9h
    (dt.datetime(2024, 1, 7, 23, 5),),    # Sunday 23h
    (dt.datetime(2023, 12, 31, 0, 0),),   # pre-anchor Sunday 0h
    (None,),
]


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-season-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark):
    from hickoryspark.ops.seasonality import event_seasonality

    df = spark.createDataFrame(EVENTS, "ts timestamp_ntz")
    return sorted(tuple(r) for r in event_seasonality(df).collect())


def test_fields_and_shares(spark):
    got = _run(spark)
    # pre-anchor date must still land on dow=7 (pmod, not %)
    assert got == [
        (0, 7, 1, 250),
        (9, 1, 2, 500),
        (23, 7, 1, 250),
    ]


def test_mirror_agreement(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE ev (ts TIMESTAMP)")
    con.executemany("INSERT INTO ev VALUES (?)", EVENTS)
    want = sorted(tuple(r) for r in
                  con.execute(duckdb_seasonality_sql("ev")).fetchall())
    assert _run(spark) == want
