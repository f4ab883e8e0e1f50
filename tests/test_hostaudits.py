"""Host dup stats and coverage audit (ops/hosts.py additions)."""

from __future__ import annotations

import hashlib
import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-hostaudits-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _dup(spark, rows):
    from hickoryspark.ops.hosts import host_dup_stats

    df = spark.createDataFrame(rows, "url string, text string")
    return sorted(tuple(r) for r in host_dup_stats(df).collect())


def _dup_mirror(rows):
    from hickoryspark.ops.hosts import duckdb_host_dup_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE p(url VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?,?)", rows)
    got = con.execute(duckdb_host_dup_sql("p")).fetchall()
    con.close()
    return sorted(tuple(r) for r in got)


def test_host_dup_stats(spark):
    rows = [
        ("https://a.ex/1", "same"), ("https://a.ex/2", "same"),
        ("https://a.ex/3", "other"),
        ("https://b.ex/1", "same"),  # same text, other host: no dup
    ]
    got = _dup(spark, rows)
    assert got == [
        ("a.ex", 3, 2, 2, 1000000 * 2 // 3),
        ("b.ex", 1, 1, 0, 0),
    ]
    assert got == _dup_mirror(rows)


def test_dup_fuzz_vs_mirror(spark):
    rng = random.Random(23)
    rows = [(f"https://h{rng.randint(0, 3)}.ex/p{i}",
             f"t{rng.randint(0, 5)}") for i in range(60)]
    assert _dup(spark, rows) == _dup_mirror(rows)


def _cov(spark, listed, crawled):
    from hickoryspark.ops.hosts import coverage_audit

    li = spark.createDataFrame([(u,) for u in listed], "url string")
    cr = spark.createDataFrame([(u,) for u in crawled], "url string")
    return sorted(tuple(r) for r in coverage_audit(li, cr).collect())


def _cov_mirror(listed, crawled):
    from hickoryspark.ops.hosts import duckdb_coverage_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE li(url VARCHAR)")
    con.execute("CREATE TABLE cr(url VARCHAR)")
    con.executemany("INSERT INTO li VALUES (?)", [(u,) for u in listed])
    con.executemany("INSERT INTO cr VALUES (?)", [(u,) for u in crawled])
    got = con.execute(duckdb_coverage_sql("li", "cr")).fetchall()
    con.close()
    return sorted(tuple(r) for r in got)


def test_coverage_audit(spark):
    listed = ["https://a.ex/1", "https://a.ex/2", "https://a.ex/2",
              "https://b.ex/1"]
    crawled = ["https://a.ex/2", "https://a.ex/3"]
    got = _cov(spark, listed, crawled)
    # a.ex: listed {1,2}, crawled {2,3} -> both 1, missing 1, stray 1
    assert got == [
        ("a.ex", 2, 2, 1, 1, 1),
        ("b.ex", 1, 0, 0, 1, 0),
    ]
    assert got == _cov_mirror(listed, crawled)


def test_coverage_fuzz_vs_mirror(spark):
    rng = random.Random(29)
    pool = [f"https://h{h}.ex/p{i}" for h in range(3) for i in range(8)]
    for _ in range(3):
        listed = rng.sample(pool, rng.randint(0, 15))
        crawled = rng.sample(pool, rng.randint(0, 15))
        assert _cov(spark, listed, crawled) == _cov_mirror(
            listed, crawled)
