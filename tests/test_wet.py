"""WET conversion-record tests (ops/wet.py)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.wet import DUCKDB_WET_RECORD_SQL, wet_records


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-wet-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_wet_record_shape(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("https://ex.test/a/1", "hello wörld"), ("https://ex.test/b/2", None)],
        "url string, main_text string",
    ).withColumn(
        "ts", F.expr("TIMESTAMP_NTZ '2026-01-02 03:04:05'"))
    rows = {r["url"]: r for r in wet_records(df).collect()}
    r = rows["https://ex.test/a/1"]
    assert r["wet_date"] == "2026-01-02T03:04:05Z"
    assert r["record_id"].startswith("urn:md5:")
    # ö is two UTF-8 bytes: octet length, not char length
    assert r["content_length"] == len("hello wörld".encode()) == 12
    head, body = r["record"].split("\r\n\r\n", 1)
    assert head.splitlines()[0] == "WARC/1.0"
    assert "WARC-Type: conversion" in head
    assert "WARC-Target-URI: https://ex.test/a/1" in head
    assert "Content-Length: 12" in head
    assert body == "hello wörld\r\n\r\n"
    # failed extraction: row kept, record NULL
    assert rows["https://ex.test/b/2"]["record"] is None
    assert rows["https://ex.test/b/2"]["content_length"] is None


def test_wet_duckdb_mirror(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("https://ex.test/a/1", "héllo"), ("https://ex.test/b/2", "x y")],
        "url string, main_text string",
    ).withColumn(
        "ts", F.expr(
            "timestampadd(SECOND, CAST(length(url) AS INT), "
            "TIMESTAMP_NTZ '2026-01-01 00:00:00')"))
    got = {r["url"]: (r["wet_date"], r["record_id"], r["content_length"],
                      r["record"])
           for r in wet_records(df).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR, main_text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [("https://ex.test/a/1", "héllo"),
                     ("https://ex.test/b/2", "x y")])
    sql = (
        "SELECT " + DUCKDB_WET_RECORD_SQL(
            "url",
            "(TIMESTAMP '2026-01-01 00:00:00'"
            " + to_seconds(length(url)))",
            "main_text") + " FROM t")
    for row in con.execute(sql).fetchall():
        assert got[row[0]] == tuple(row[1:]), row


def test_wet_null_date_propagates(spark):
    # NULL ts -> NULL wet_date/record_id/record (matching the
    # mirror's NULL-propagating ||); content_length still computed
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("https://ex.test/a/1", "txt")], "url string, main_text string"
    ).withColumn("ts", F.lit(None).cast("timestamp_ntz"))
    r = wet_records(df).collect()[0]
    assert r["wet_date"] is None
    assert r["record_id"] is None
    assert r["record"] is None
    assert r["content_length"] == 3
