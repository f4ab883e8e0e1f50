"""Quantity extraction (ops/measures.py): unit table exactness,
longest-unit-wins alternation, digit caps, floor rule, mirror
agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.measures import duckdb_measures_sql  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-measures-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, texts):
    from hickoryspark.ops.measures import extract_measures

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    return sorted(
        (r["doc_id"], r["raw"], r["unit"], r["dimension"],
         r["value_base"])
        for r in extract_measures(df).collect())


def test_units_and_normalization(spark):
    rows = _run(spark, [
        "walked 4.7 km then 3 mi and 12in",
        "dose 500 mg or 0.5 oz",
        "disk 1.5 GB cache 250ms runtime 2 h",
    ])
    assert rows == [
        (0, "12in", "in", "length", 304_800),
        (0, "3 mi", "mi", "length", 4_828_032_000),
        (0, "4.7 km", "km", "length", 4_700_000_000),
        (1, "0.5 oz", "oz", "mass", 14_174_761_562),   # floored
        (1, "500 mg", "mg", "mass", 500_000_000),
        (2, "1.5 GB", "GB", "data", 1_500_000_000),
        (2, "2 h", "h", "time", 7_200_000_000),
        (2, "250ms", "ms", "time", 250_000),
    ]


def test_longest_unit_and_caps(spark):
    rows = _run(spark, [
        "went 5 min not 5 mi+n; 3 ms not 3 m[s]",
        "1234567 km too many integer digits",
        "1.1234567 km too many fraction digits",
        "x5km embedded-word start does not match",
    ])
    # longest unit wins at the same position ("5 min" is min, never
    # mi); "5 mi+n" and "3 m[s]" legitimately match mi / m (the
    # boundary before +/[ satisfies \b — pinned syntactic rule)
    assert [(r[1], r[2]) for r in rows if r[0] == 0] == [
        ("3 m", "m"), ("3 ms", "ms"), ("5 mi", "mi"), ("5 min", "min")]
    # digit caps: over-long numbers match nothing at all (\b cannot
    # start mid-number, so no truncated submatch either)
    assert not [r for r in rows if r[0] in (1, 2, 3)]


def test_mirror_agreement(spark):
    texts = [
        "4.7 km 3mi 12 in 500 mg 0.5 oz 1.5 GB 250ms 2 h 90 min "
        "17 lb 3.25 ft",
        "no units 123 456.7 xyz",
        "edge 999999.999999 kg and 1 KB and 0.000001 s",
        "",
    ]
    got = _run(spark, texts)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    list(enumerate(texts)))
    want = sorted(tuple(r) for r in
                  con.execute(duckdb_measures_sql("t")).fetchall())
    assert got == want
