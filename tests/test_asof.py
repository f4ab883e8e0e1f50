"""As-of join (ops/asof.py) and two-level rollup (ops/events.py)."""

from __future__ import annotations

import datetime as dt
import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCHEMA = "event_id long, ts timestamp_ntz, user_id long, value double"


def _t(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-asof-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _asof(spark, left, right, **kw):
    from hickoryspark.ops.asof import asof_join

    ldf = spark.createDataFrame(left, SCHEMA)
    rdf = spark.createDataFrame(right, SCHEMA)
    out = asof_join(ldf, rdf, keys=("user_id",),
                    payload_cols=("event_id",), **kw)
    return sorted(
        (r["event_id"], r["matched_event_id"]) for r in out.collect())


def _brute(left, right, tol=None):
    out = []
    for le, lts, lu, _ in left:
        cands = [(rts, re_) for re_, rts, ru, _ in right
                 if ru == lu and rts <= lts
                 and (tol is None
                      or (lts - rts).total_seconds() <= tol)]
        if cands:
            # latest ts; among equal ts the greatest event_id
            best = max(cands)
            out.append((le, best[1]))
        else:
            out.append((le, None))
    return sorted(out)


def test_backward_inclusive_and_left_join(spark):
    left = [(10, _t(100), 1, 1.0), (11, _t(50), 1, 1.0),
            (12, _t(10), 2, 1.0), (13, _t(5), 3, 1.0)]
    right = [(1, _t(100), 1, 2.0), (2, _t(60), 1, 2.0),
             (3, _t(10), 2, 2.0)]
    got = _asof(spark, left, right)
    # 10 matches the EQUAL-ts view (inclusive); 13 has no match
    assert got == [(10, 1), (11, None), (12, 3), (13, None)]


def test_duplicate_right_ts_pinned_to_max_payload(spark):
    left = [(10, _t(100), 1, 1.0)]
    right = [(5, _t(90), 1, 2.0), (9, _t(90), 1, 2.0)]
    assert _asof(spark, left, right) == [(10, 9)]


def test_tolerance(spark):
    left = [(10, _t(1000), 1, 1.0)]
    right = [(1, _t(100), 1, 2.0)]
    assert _asof(spark, left, right) == [(10, 1)]
    assert _asof(spark, left, right,
                 tolerance_seconds=60) == [(10, None)]


def test_fuzz_vs_bruteforce_and_duckdb_asof(spark):
    rng = random.Random(8)
    eid = [0]

    def mk(n):
        rows = []
        for _ in range(n):
            eid[0] += 1
            rows.append((eid[0], _t(rng.randint(0, 500)),
                         rng.randint(1, 5), 1.0))
        return rows

    left, right = mk(60), mk(40)
    got = _asof(spark, left, right)
    assert got == _brute(left, right)

    con = duckdb.connect()
    con.execute("CREATE TABLE l(event_id BIGINT, ts TIMESTAMP,"
                " user_id BIGINT, value DOUBLE)")
    con.execute("CREATE TABLE r(event_id BIGINT, ts TIMESTAMP,"
                " user_id BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?,?,?,?)", left)
    con.executemany("INSERT INTO r VALUES (?,?,?,?)", right)
    rows = con.execute("""
        WITH rd AS (SELECT user_id, ts, MAX(event_id) AS event_id
                    FROM r GROUP BY user_id, ts)
        SELECT l.event_id, rd.event_id
        FROM l ASOF LEFT JOIN rd
        ON l.user_id = rd.user_id AND l.ts >= rd.ts""").fetchall()
    con.close()
    assert got == sorted((a, b) for a, b in rows)


def test_rollup_two_level_exact(spark):
    from hickoryspark.ops.events import rollup_two_level

    rows = [
        (1, _t(0), 1, 0.1), (2, _t(30), 1, 0.2),      # minute 0
        (3, _t(90), 1, 0.3),                          # minute 1
        (4, _t(3700), 1, 0.4),                        # next hour
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long,"
              " value double").withColumn("event_type",
                                          F.lit("click"))
    got = sorted(tuple(r) for r in rollup_two_level(df).collect())
    assert got == [
        ("2024-01-01 00:00:00", "click", 3, 0.6, 2),
        ("2024-01-01 01:00:00", "click", 1, 0.4, 1),
    ]


def test_ts_format_single_source_lockstep(spark):
    """The pinned 6-digit render: ops/asof.TS_FMT (Spark) and
    DUCKDB_TS_FMT (DuckDB/Python strftime) must render identically,
    and every entry oracle that renders raw event timestamps must
    use the shared literal — drift desyncs gate hashes."""
    import duckdb

    from hickoryspark.ops.asof import DUCKDB_TS_FMT, TS_FMT
    from pyspark.sql import functions as F

    t = dt.datetime(2024, 3, 1, 7, 8, 9, 73809)  # trailing zero case
    s_spark = (spark.createDataFrame([(t,)], "ts timestamp_ntz")
               .select(F.date_format("ts", TS_FMT)).collect()[0][0])
    s_duck = duckdb.sql(
        f"SELECT strftime(TIMESTAMP '2024-03-01 07:08:09.073809',"
        f" '{DUCKDB_TS_FMT}')").fetchone()[0]
    assert s_spark == s_duck == t.strftime(DUCKDB_TS_FMT)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_fmt_check",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    oracles = m.oracle_sql()
    for q in ("events_asof", "events_range_join", "events_funnel",
              "streaming_sessionize"):
        assert DUCKDB_TS_FMT in oracles[q], q
