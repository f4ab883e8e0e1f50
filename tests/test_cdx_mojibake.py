"""CDX records (ops/cdx.py) and mojibake detection
(ops/textnorm.mojibake_stats) — including the DuckDB mirror."""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-cdx-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_cdx_record_fields(spark):
    from pyspark.sql import functions as F

    from hickoryspark.ops.cdx import cdx_records

    df = spark.createDataFrame(
        [("https://WWW.Ex.Test:8080/a/b?x=1", "2026-01-02 03:04:05",
          b"<!DOCTYPE html><p>hi")],
        "url string, ts_s string, payload binary",
    ).select("url", F.col("ts_s").cast("timestamp_ntz").alias("ts"),
             "payload")
    r = cdx_records(df).collect()[0]
    assert r["surt_key"] == "test,ex,www:8080)/a/b?x=1"
    assert r["ts14"] == "20260102030405"
    assert r["digest"] == hashlib.md5(b"<!DOCTYPE html><p>hi").hexdigest()
    assert r["mime"] == "text/html"
    assert r["status"] == 200
    assert r["length"] == 20


def test_cdx_null_payload_and_status_col(spark):
    from pyspark.sql import functions as F

    from hickoryspark.ops.cdx import cdx_records

    df = spark.createDataFrame(
        [("https://a.ex/", "2026-01-01 00:00:00", None, 404)],
        "url string, ts_s string, payload binary, status int",
    ).select("url", F.col("ts_s").cast("timestamp_ntz").alias("ts"),
             "payload", "status")
    r = cdx_records(df, status_col="status").collect()[0]
    assert r["status"] == 404 and r["length"] == 0
    assert r["digest"] is None and r["mime"] is None


MOJI = [
    (0, "clean ascii text"),
    (1, "bad Ã© double"),           # Ã©
    (2, "curly â€™ quote"),     # â€™
    (3, "repl �� and c1 \x85"),
    (4, ""),
]


def test_mojibake_counts(spark):
    from hickoryspark.ops.textnorm import mojibake_stats

    df = spark.createDataFrame(MOJI, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_fffd"], r["n_dbl_utf8"], r["n_c1"],
                         r["mojibake_ppm"])
           for r in mojibake_stats(df).collect()}
    assert got[0] == (0, 0, 0, 0)
    assert got[1] == (0, 1, 0, 1000000 // len(MOJI[1][1]))
    assert got[2] == (0, 1, 0, 1000000 // len(MOJI[2][1]))
    assert got[3][0] == 2 and got[3][2] == 1
    assert got[4] == (0, 0, 0, 0)


def test_mojibake_duckdb_mirror(spark):
    from hickoryspark.ops.textnorm import duckdb_mojibake_sql, mojibake_stats

    df = spark.createDataFrame(MOJI, "doc_id long, text string")
    spark_rows = {
        r["doc_id"]: (r["n_chars"], r["n_fffd"], r["n_dbl_utf8"],
                      r["n_c1"], r["mojibake_ppm"])
        for r in mojibake_stats(df).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", MOJI)
    sql = f"SELECT doc_id, {duckdb_mojibake_sql('text')} FROM t"
    for row in con.execute(sql).fetchall():
        assert spark_rows[row[0]] == tuple(row[1:]), row
def test_cdx_dedup_revisits(spark):
    from hickoryspark.ops.cdx import cdx_dedup, cdx_records

    caps = spark.createDataFrame(
        [("https://a.ex/p", "2026-01-01 00:00:00", b"same"),
         ("https://a.ex/p", "2026-01-02 00:00:00", b"same"),
         ("https://a.ex/p", "2026-01-03 00:00:00", b"changed"),
         ("https://A.EX/p", "2025-12-31 00:00:00", b"same"),  # surt folds
         ("https://b.ex/q", "2026-01-01 00:00:00", b"same")],  # other key
        "url string, ts string, payload binary").selectExpr(
        "url", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "payload")
    out = {(r["surt_key"], r["digest"][:6]): (r["first_ts14"],
                                              r["n_captures"])
           for r in cdx_dedup(cdx_records(caps)).collect()}
    import hashlib
    same6 = hashlib.md5(b"same").hexdigest()[:6]
    chg6 = hashlib.md5(b"changed").hexdigest()[:6]
    a_key = [k for k in out if k[0].startswith("ex,a)")][0][0]
    b_key = [k for k in out if k[0].startswith("ex,b)")][0][0]
    assert out[(a_key, same6)] == ("20251231000000", 3)
    assert out[(a_key, chg6)] == ("20260103000000", 1)
    assert out[(b_key, same6)] == ("20260101000000", 1)


def test_cdx_dedup_excludes_null_digests(spark):
    # review regression: payload-less fetches (NULL digest) must not
    # group together as "revisits" of one another
    from hickoryspark.ops.cdx import cdx_dedup, cdx_records

    caps = spark.createDataFrame(
        [("https://n.ex/p", "2026-01-01 00:00:00", None),
         ("https://n.ex/p", "2026-01-02 00:00:00", None),
         ("https://n.ex/p", "2026-01-03 00:00:00", b"real")],
        "url string, ts string, payload binary").selectExpr(
        "url", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "payload")
    out = cdx_dedup(cdx_records(caps)).collect()
    assert len(out) == 1 and out[0]["n_captures"] == 1
