

"""Event-stream operators (ops/events.py): transition-matrix
semantics — session-break exclusion and exact-permille rows."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-events-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_transitions_respect_session_breaks(spark):
    from datetime import datetime

    from hickoryspark.ops.events import event_transitions

    base = datetime(2024, 1, 1, 0, 0, 0)

    def at(mins):
        return base.replace(hour=mins // 60, minute=mins % 60)

    rows = [
        # user 1, session A: a->b->a ; 31-min gap ; session B: b->c
        (1, at(0), 10, "a"), (1, at(1), 11, "b"), (1, at(2), 12, "a"),
        (1, at(33), 13, "b"), (1, at(34), 14, "c"),
        # user 2: single event, no transitions
        (2, at(0), 20, "a"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, event_type string"
    )
    got = {
        (r["src"], r["dst"]): (r["n_trans"], r["p_milli"])
        for r in event_transitions(ev).collect()
    }
    # a->b once of a-total 1; b->a once, b->c once (b row-total 2)
    assert got == {
        ("a", "b"): (1, 1000),
        ("b", "a"): (1, 500),
        ("b", "c"): (1, 500),
    }
    # the a(2min)->b(33min) cross-session step must NOT appear as a->b
    # twice — gap 31min broke the session


def test_volume_anomaly_median_and_flags(spark):
    from datetime import datetime, timedelta

    from hickoryspark.ops.events import volume_anomaly

    rows = []
    eid = 0
    base = datetime(2024, 1, 1)
    # days 0..4 with counts 10, 10, 40, 10, 4 -> sorted 4,10,10,10,40
    # lower median (n=5 -> 3rd) = 10
    for day, n in enumerate([10, 10, 40, 10, 4]):
        for i in range(n):
            rows.append((eid, base + timedelta(days=day, minutes=i), 1, "e"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string",
    )
    out = {r["day_num"] - 19723: (r["n_events"], r["p_milli"], r["anomaly"])
           for r in volume_anomaly(ev).collect()}
    assert out[0] == (10, 1000, False)
    assert out[2] == (40, 4000, True)   # spike
    assert out[4] == (4, 400, True)     # dip
    assert len(out) == 5


def test_volume_anomaly_empty_feed_yields_no_rows(spark):
    from pyspark.sql import functions as F

    from hickoryspark.ops.events import volume_anomaly

    ev = spark.createDataFrame(
        [], "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )
    assert volume_anomaly(ev).count() == 0


def test_event_day_and_gap_are_timezone_independent(spark):
    # the r4 lesson: NTZ wall-clock arithmetic must not re-bucket
    # under a non-UTC driver session timezone
    from datetime import datetime

    from hickoryspark.ops.events import volume_anomaly

    ev = spark.createDataFrame(
        [(0, datetime(2024, 1, 2, 3, 0, 1), 1, "e")],
        "event_id long, ts timestamp_ntz, user_id long, event_type string",
    )
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        kolkata = volume_anomaly(ev).collect()[0]["day_num"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    utc = volume_anomaly(ev).collect()[0]["day_num"]
    assert kolkata == utc == 19724  # 2024-01-02 as NTZ-UTC wall clock


def test_touch_attribution_first_last_and_direct(spark):
    from datetime import datetime, timedelta

    from hickoryspark.ops.events import touch_attribution

    base = datetime(2024, 1, 1)

    def at(m):
        return base + timedelta(minutes=m)

    rows = [
        # user 1 session: view, click, purchase -> first=view, last=click
        (1, at(0), 10, "view"), (1, at(1), 11, "click"),
        (1, at(2), 12, "purchase"),
        # 40-min gap: new session with purchase but no touch -> direct
        (1, at(45), 13, "purchase"),
        # user 2: click then purchase -> first=last=click; later view
        # AFTER the purchase must not count
        (2, at(0), 20, "click"), (2, at(1), 21, "purchase"),
        (2, at(2), 22, "view"),
    ]
    ev = spark.createDataFrame(
        rows,
        "user_id long, ts timestamp_ntz, event_id long, event_type string",
    )
    out = {r["touch_type"]: (r["n_first"], r["n_last"])
           for r in touch_attribution(ev).collect()}
    assert out == {
        "view": (1, 0),
        "click": (1, 2),
        "(direct)": (1, 1),
    }


def test_attribution_drops_pre_epoch_and_keeps_long_types(spark):
    # review finding: signed secs break zero-padded key ordering —
    # pre-epoch rows drop; >40-char event types survive un-truncated
    from datetime import datetime

    from hickoryspark.ops.events import touch_attribution

    long_type = "view_" + "x" * 70
    rows = [
        (1, datetime(1969, 12, 31, 23, 0), 1, long_type),  # pre-epoch
        (1, datetime(2024, 1, 1, 0, 0), 2, long_type),
        (1, datetime(2024, 1, 1, 0, 1), 3, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows,
        "user_id long, ts timestamp_ntz, event_id long, event_type string",
    )
    out = {r["touch_type"]: (r["n_first"], r["n_last"]) for r in
           touch_attribution(ev, touch_types=(long_type,)).collect()}
    assert out == {long_type: (1, 1)}


def test_volume_anomaly_pre_epoch_day_floors(spark):
    # r5 advice: pre-epoch events must land in FLOOR day buckets
    # (matching the DuckDB mirror's `//`), not truncate-toward-zero —
    # an event at 1969-12-31T12:00:00 belongs to day -1, not day 0
    from datetime import datetime

    from hickoryspark.ops.events import volume_anomaly

    ev = spark.createDataFrame(
        [
            (1, datetime(1969, 12, 31, 12, 0, 0)),
            (2, datetime(1970, 1, 1, 12, 0, 0)),
        ],
        "uid long, ts timestamp_ntz",
    )
    days = {r["day_num"]: r["n_events"]
            for r in volume_anomaly(ev).collect()}
    assert days == {-1: 1, 0: 1}
