"""Range join (ops/intervals.py) and funnel (ops/funnel.py)."""

from __future__ import annotations

import datetime as dt
import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-intervals-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _ij(spark, points, intervals, **kw):
    from hickoryspark.ops.intervals import interval_join

    p = spark.createDataFrame(
        points, "pid long, ts timestamp_ntz, user_id long")
    iv = spark.createDataFrame(
        intervals,
        "iid long, start_ts timestamp_ntz, end_ts timestamp_ntz,"
        " user_id long")
    out = interval_join(p, iv, **kw)
    return sorted((r["pid"], r["iv_iid"]) for r in out.collect())


def test_containment_half_open_and_overlap(spark):
    points = [(1, _t(0), 1), (2, _t(50), 1), (3, _t(100), 1),
              (4, _t(50), 2)]
    intervals = [
        (10, _t(0), _t(100), 1),     # [0, 100): pids 1, 2
        (11, _t(40), _t(60), 1),     # overlaps: pid 2 again
        (12, _t(100), _t(100), 1),   # empty
        (13, _t(60), _t(40), 1),     # negative
    ]
    got = _ij(spark, points, intervals, bucket_seconds=30)
    assert got == [(1, 10), (2, 10), (2, 11)]


def test_bucket_spanning_and_cap(spark):
    points = [(1, _t(7150), 1)]
    intervals = [(10, _t(10), _t(7190), 1)]   # spans 3 hour-buckets
    assert _ij(spark, points, intervals) == [(1, 10)]
    # cap: the same interval at 1s buckets spans 7180 > max_buckets
    assert _ij(spark, points, intervals, bucket_seconds=1,
               max_buckets=1000) == []


def test_fuzz_vs_duckdb_range_join(spark):
    rng = random.Random(19)
    points = [(i, _t(rng.randint(0, 400)), rng.randint(1, 3))
              for i in range(60)]
    intervals = []
    for i in range(25):
        a = rng.randint(0, 380)
        intervals.append((100 + i, _t(a), _t(a + rng.randint(0, 80)),
                          rng.randint(1, 3)))
    got = _ij(spark, points, intervals, bucket_seconds=60)
    con = duckdb.connect()
    con.execute("CREATE TABLE p(pid BIGINT, ts TIMESTAMP,"
                " user_id BIGINT)")
    con.execute("CREATE TABLE iv(iid BIGINT, s TIMESTAMP,"
                " e TIMESTAMP, user_id BIGINT)")
    con.executemany("INSERT INTO p VALUES (?,?,?)", points)
    con.executemany("INSERT INTO iv VALUES (?,?,?,?)", intervals)
    exp = con.execute("""
        SELECT p.pid, iv.iid FROM p JOIN iv
        ON p.user_id = iv.user_id AND iv.s <= p.ts AND p.ts < iv.e
        """).fetchall()
    con.close()
    assert got == sorted((a, b) for a, b in exp)


def _funnel(spark, rows, steps=("view", "click", "purchase")):
    from hickoryspark.ops.funnel import funnel_stages

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long,"
              " event_type string")
    return {r["user_id"]: (r["n_stages"], r["stage1_ts"],
                           r["stage2_ts"], r["stage3_ts"])
            for r in funnel_stages(df).collect()}


def test_funnel_order_and_strictness(spark):
    rows = [
        # user 1: full funnel in order
        (1, _t(10), 1, "view"), (2, _t(20), 1, "click"),
        (3, _t(30), 1, "purchase"),
        # user 2: click BEFORE view never counts; no purchase
        (4, _t(5), 2, "click"), (5, _t(10), 2, "view"),
        (6, _t(90), 2, "click"),
        # user 3: equal-ts click does not chain (strict >)
        (7, _t(10), 3, "view"), (8, _t(10), 3, "click"),
        # user 4: purchase only -> absent (never reached stage 1)
        (9, _t(10), 4, "purchase"),
    ]
    got = _funnel(spark, rows)
    assert set(got) == {1, 2, 3}
    assert got[1][0] == 3 and got[1][3] is not None
    assert got[2][0] == 2
    assert got[3] == (1, "2024-01-01 00:00:10.000000", None, None)


def test_funnel_earliest_completion(spark):
    rows = [
        (1, _t(10), 1, "view"), (2, _t(50), 1, "view"),
        (3, _t(20), 1, "click"), (4, _t(60), 1, "click"),
        (5, _t(25), 1, "purchase"),
    ]
    got = _funnel(spark, rows)
    # t1=10 (min view), t2=20 (min click > 10), t3=25
    assert got[1] == (3, "2024-01-01 00:00:10.000000",
                      "2024-01-01 00:00:20.000000",
                      "2024-01-01 00:00:25.000000")
