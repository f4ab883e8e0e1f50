"""Bot detection (ops/botdetect.py): run-length math on planted
regular/irregular users, single-event users, tie ordering, the
decision rule, and mirror agreement."""

from __future__ import annotations

import datetime as dt
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.botdetect import duckdb_bot_signals_sql  # noqa: E402

T0 = dt.datetime(2024, 1, 1)


def _ev(eid, user, seconds, typ="view"):
    return (eid, T0 + dt.timedelta(seconds=seconds), user, typ)


ROWS = (
    # user 1: 7 events, exactly 10s apart -> 6 gaps all equal, bot
    [_ev(i, 1, i * 10) for i in range(7)]
    # user 2: ragged gaps (1,3,6,10,15s cumulative) -> no run > 1
    + [_ev(10 + i, 2, s, "click")
       for i, s in enumerate([0, 1, 4, 10, 20, 35])]
    # user 3: single event -> no gaps
    + [_ev(20, 3, 0)]
    # user 4: 5 equal + 1 different gap -> run 5 of 6, 833 milli, bot
    + [_ev(30 + i, 4, s)
       for i, s in enumerate([0, 5, 10, 15, 20, 25, 33])]
    # user 5: simultaneous events -> event_id breaks the tie; gaps 0
    + [_ev(40, 5, 0), _ev(41, 5, 0), _ev(42, 5, 0)]
)


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-bot-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark):
    from hickoryspark.ops.botdetect import bot_signals

    df = spark.createDataFrame(
        ROWS, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    return {r["user_id"]: (r["n_events"], r["n_types"], r["n_gaps"],
                           r["max_gap_run"], r["regular_milli"],
                           r["flagged"])
            for r in bot_signals(df).collect()}


def test_signals(spark):
    out = _run(spark)
    assert out[1] == (7, 1, 6, 6, 1000, 1)
    assert out[2][3] == 1 and out[2][5] == 0      # ragged: run 1
    assert out[3] == (1, 1, 0, 0, 0, 0)
    assert out[4] == (7, 1, 6, 5, 833, 1)
    assert out[5] == (3, 1, 2, 2, 1000, 0)        # n_gaps < 5


def test_mirror_agreement(spark):
    got = _run(spark)
    con = duckdb.connect()
    con.execute("CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP, "
                "user_id BIGINT, event_type VARCHAR)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?, ?)", ROWS)
    want = {u: (a, b, c, d, e, f) for u, a, b, c, d, e, f in
            con.execute(duckdb_bot_signals_sql("ev")).fetchall()}
    assert got == want
