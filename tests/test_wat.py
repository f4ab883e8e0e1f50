"""WAT metadata-record tests (ops/wat.py)."""

import hashlib
import json
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.wat import (duckdb_json_escape_sql, json_escape,
                                  wat_records)


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-wat-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _nodes(spark, rows):
    import pyspark.sql.functions as F

    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame(rows, "url string, html string").select(
        "url", F.encode("html", "utf-8").alias("html"))
    return explode_nodes(pages)


def _caps(spark, urls, ts="2026-01-02 03:04:05"):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return df.withColumn("ts", F.expr(f"TIMESTAMP_NTZ '{ts}'"))


def test_wat_record_shape_and_payload(spark):
    url = "https://ex.test/a/b/page"
    html = ('<html><head><title>My Page</title></head><body>'
            '<a href="../up">go <b>up</b></a>'
            '<a href="https://o.ex/x">out</a></body></html>')
    out = wat_records(_nodes(spark, [(url, html)]), _caps(spark, [url]))
    r = out.collect()[0]
    assert r["wat_date"] == "2026-01-02T03:04:05Z"
    want_id = "urn:md5:" + hashlib.md5(
        f"wat:{url}\n2026-01-02T03:04:05Z".encode()).hexdigest()
    assert r["record_id"] == want_id
    head, rest = r["record"].split("\r\n\r\n", 1)
    assert "WARC-Type: metadata" in head
    assert "Content-Type: application/json" in head
    payload = rest[:-4]
    assert rest.endswith("\r\n\r\n")
    assert r["content_length"] == len(payload.encode())
    env = json.loads(payload)["Envelope"]
    assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == url
    hm = env["Payload-Metadata"]["HTML-Metadata"]
    assert hm["Head"]["Title"] == "My Page"
    # subtree anchor text; ../up resolved with the dot-segment fold
    assert hm["Links"] == [
        {"url": "https://ex.test/a/up", "text": "go up"},
        {"url": "https://o.ex/x", "text": "out"},
    ]
    # pinned key order + no whitespace
    assert payload.startswith(
        '{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":')


def test_wat_escaping_roundtrips(spark):
    url = "https://ex.test/q"
    title = 'He said "hi" \\ there\tnow'
    html = (f'<html><head><title>{title}</title></head><body>'
            '<a href="/x">a\nb</a></body></html>')
    out = wat_records(_nodes(spark, [(url, html)]), _caps(spark, [url]))
    payload = out.collect()[0]["record"].split("\r\n\r\n", 1)[1][:-4]
    assert '\\"hi\\"' in payload and "\\\\ there\\t" in payload
    env = json.loads(payload)["Envelope"]
    hm = env["Payload-Metadata"]["HTML-Metadata"]
    assert hm["Head"]["Title"] == title
    assert hm["Links"][0]["text"] == "a\nb"


def test_wat_missing_title_and_links(spark):
    rows = [("https://ex.test/1", "<html><body><p>x</p></body></html>")]
    out = wat_records(_nodes(spark, rows), _caps(spark, [r[0] for r in rows]))
    payload = out.collect()[0]["record"].split("\r\n\r\n", 1)[1][:-4]
    assert '"Head":{},"Links":[]' in payload
    assert json.loads(payload)  # still valid JSON


def test_wat_null_date_propagates(spark):
    import pyspark.sql.functions as F

    url = "https://ex.test/n"
    caps = spark.createDataFrame([(url,)], "url string").withColumn(
        "ts", F.lit(None).cast("timestamp_ntz"))
    out = wat_records(
        _nodes(spark, [(url, "<html><head><title>t</title></head></html>")]),
        caps)
    r = out.collect()[0]
    assert r["wat_date"] is None and r["record_id"] is None
    assert r["content_length"] is None and r["record"] is None


def test_json_escape_matches_python_and_duckdb(spark):
    import pyspark.sql.functions as F

    tricky = 'a"b\\c\nd\te\rf\x00g\x1fh\bi\fj\x7f€'
    want = json.dumps(tricky, ensure_ascii=False)[1:-1]
    got_spark = (spark.createDataFrame([(tricky,)], "s string")
                 .select(json_escape(F.col("s")).alias("e"))
                 .collect()[0]["e"])
    assert got_spark == want
    con = duckdb.connect()
    got_duck = con.execute(
        "SELECT " + duckdb_json_escape_sql("?::VARCHAR"), [tricky]
    ).fetchone()[0]
    assert got_duck == want
