"""Tracker audit (ops/resources.tracker_audit): suffix-chain match,
NULL-host handling, entry normalization, mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.resources import duckdb_tracker_sql  # noqa: E402

ROWS = [
    ("p1", "cdn.ads.ex"),      # suffix match ads.ex
    ("p1", "static.site.ex"),  # clean
    ("p1", None),              # counts, never matches
    ("p2", "metrics.ex"),      # exact match
    ("p2", "sub.metrics.ex"),  # suffix match
    ("p3", "clean.ex"),
]
TRACKERS = ["ads.ex", " Metrics.EX. ", ""]


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-tracker-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark):
    from hickoryspark.ops.resources import tracker_audit

    res = spark.createDataFrame(ROWS, "url string, res_host string")
    t = spark.createDataFrame([(h,) for h in TRACKERS], "host string")
    return sorted(tuple(r) for r in tracker_audit(res, t).collect())


def test_audit(spark):
    got = {r[0]: r for r in _run(spark)}
    assert got["p1"] == ("p1", 3, 1, 333, 1)
    assert got["p2"] == ("p2", 2, 2, 1000, 1)
    assert got["p3"] == ("p3", 1, 0, 0, 0)


def test_mirror_agreement(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE res (url VARCHAR, res_host VARCHAR)")
    con.executemany("INSERT INTO res VALUES (?, ?)", ROWS)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_tracker_sql("res", [h for h in TRACKERS if h.strip()])
    ).fetchall())
    assert _run(spark) == want


def test_entry_normalization_mirror_exact(spark):
    # regression (r5 review): '\r'-tailed and double-dotted entries
    # must normalize IDENTICALLY on both sides — ws-class trim, ONE
    # trailing dot stripped (so 'ads.ex..' keeps one dot and matches
    # nothing; 'ads.ex\r' matches normally)
    from hickoryspark.ops.resources import tracker_audit

    rows = [("p1", "cdn.ads.ex"), ("p1", "x.tr.ex")]
    hostile = ["ads.ex\r", "tr.ex..", "  ", "."]
    res = spark.createDataFrame(rows, "url string, res_host string")
    t = spark.createDataFrame([(h,) for h in hostile], "host string")
    got = sorted(tuple(r) for r in tracker_audit(res, t).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE res2 (url VARCHAR, res_host VARCHAR)")
    con.executemany("INSERT INTO res2 VALUES (?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_tracker_sql("res2", hostile)).fetchall())
    assert got == want
    assert got == [("p1", 2, 1, 500, 1)]  # only ads.ex survives


def test_empty_tracker_list_rejected():
    with pytest.raises(ValueError):
        duckdb_tracker_sql("res", ["  ", "."])
