"""Geotag extraction (ops/geo.py): carrier priority, validity
fall-through, og pair requirement, region/placename companions,
micro-degree exactness, mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.geo import duckdb_geo_sql  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-geo-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, pages):
    from hickoryspark.ops.geo import extract_geo
    from hickoryspark.spark.nodes_table import explode_nodes

    df = spark.createDataFrame(
        [(u, bytearray(h.encode("utf-8"))) for u, h in pages],
        "url string, html binary")
    return {r["url"]: (r["lat_micro"], r["lon_micro"], r["src"],
                       r["region"], r["placename"])
            for r in extract_geo(explode_nodes(df)).collect()}


def test_carriers_and_priority(spark):
    out = _run(spark, [
        ("u1", '<meta name="geo.position" content="48.2;16.37">'
               '<meta name="ICBM" content="1, 2">'),
        ("u2", '<meta name="ICBM" content="-33.86, 151.2">'),
        ("u3", '<meta property="place:location:latitude" '
               'content="40.7128">'
               '<meta property="place:location:longitude" '
               'content="-74.006">'),
        ("u4", "<p>no geo</p>"),
    ])
    assert out["u1"] == (48_200_000, 16_370_000, "position",
                         None, None)
    assert out["u2"] == (-33_860_000, 151_200_000, "icbm", None, None)
    assert out["u3"] == (40_712_800, -74_006_000, "og", None, None)
    assert "u4" not in out


def test_invalid_carriers_fall_through(spark):
    out = _run(spark, [
        # out-of-range position falls through to ICBM
        ("u1", '<meta name="geo.position" content="91;0">'
               '<meta name="ICBM" content="10, 20">'),
        # og latitude without longitude: no coordinates at all
        ("u2", '<meta property="place:location:latitude" '
               'content="1.5">'),
        # malformed separators
        ("u3", '<meta name="geo.position" content="48.2,16.37">'
               '<meta name="geo.region" content="AT-9">'
               '<meta name="geo.placename" content="Vienna">'),
    ])
    assert out["u1"] == (10_000_000, 20_000_000, "icbm", None, None)
    assert "u2" not in out
    assert out["u3"] == (None, None, None, "AT-9", "Vienna")


def test_first_in_doc_order_wins(spark):
    out = _run(spark, [
        ("u1", '<meta name="ICBM" content="1, 1">'
               '<meta name="ICBM" content="2, 2">'),
    ])
    assert out["u1"][0] == 1_000_000


def test_mirror_agreement(spark):
    rows = [
        ("u1", 0, "geo.position", None, "48.2;16.37"),
        ("u1", 1, "icbm", None, "1, 2"),
        ("u2", 0, "icbm", None, "-33.86, 151.2"),
        ("u3", 0, None, "place:location:latitude", "40.7128"),
        ("u3", 1, None, "place:location:longitude", "-74.006"),
        ("u4", 0, "geo.position", None, "91;0"),
        ("u4", 1, "geo.region", None, "AT-9"),
        ("u5", 0, "icbm", None, "5, 5"),
        ("u5", 1, "icbm", None, "6, 6"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE m (url VARCHAR, pre_ord BIGINT, "
                "name VARCHAR, prop VARCHAR, content VARCHAR)")
    con.executemany("INSERT INTO m VALUES (?, ?, ?, ?, ?)", rows)
    want = {r[0]: tuple(r[1:]) for r in
            con.execute(duckdb_geo_sql("m")).fetchall()}
    assert want["u1"] == (48_200_000, 16_370_000, "position",
                          None, None)
    assert want["u2"] == (-33_860_000, 151_200_000, "icbm",
                          None, None)
    assert want["u3"] == (40_712_800, -74_006_000, "og", None, None)
    assert want["u4"] == (None, None, None, "AT-9", None)
    assert want["u5"][0] == 5_000_000
