"""A/B conversion readout (ops/abtest.py): arm assignment,
conversion fold, empty-arm guard, mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.abtest import duckdb_ab_sql  # noqa: E402

EVENTS = [
    (0, "view"), (0, "purchase"),      # arm A converts
    (2, "view"),                       # arm A no
    (4, "purchase"), (4, "purchase"),  # arm A converts (counted once)
    (1, "view"),                       # arm B no
    (3, "signup"),                     # arm B no
    (None, "purchase"),                # dropped
    # negative id: pmod must land it in arm B on BOTH engines (a
    # truncated % would drop it from both arm sums in the mirror)
    (-3, "purchase"),
]


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-ab-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, events):
    from hickoryspark.ops.abtest import ab_conversion

    df = spark.createDataFrame(events, "user_id long, event_type string")
    return tuple(ab_conversion(df).collect()[0])


def test_readout(spark):
    # arms: A = {0,2,4} conv 2; B = {1,3,-3} conv 1 (the negative id)
    assert _run(spark, EVENTS) == (3, 2, 666, 3, 1, 333, -333)


def test_empty_arm_guard(spark):
    # only even (arm A) users: arm B denominator guards to 1
    only_a = [(0, "purchase"), (2, "view")]
    assert _run(spark, only_a) == (2, 1, 500, 0, 0, 0, -500)


def test_mirror_agreement(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE ev (user_id BIGINT, event_type VARCHAR)")
    con.executemany("INSERT INTO ev VALUES (?, ?)", EVENTS)
    want = tuple(con.execute(duckdb_ab_sql("ev")).fetchone())
    assert _run(spark, EVENTS) == want
