"""Tech fingerprinting (ops/techstack.py): rule matching, case
insensitivity, carrier scoping, NULLs, node-level wrapper through the
real parser, mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.techstack import duckdb_tech_sql  # noqa: E402

CARRIERS = [
    ("p1", "generator", "WordPress 6.4"),
    ("p1", "script", "/wp-content/t.js"),          # 2nd wordpress signal
    ("p1", "script", "https://code.JQUERY.com/jquery-3.min.js"),
    ("p2", "link", "https://cdn.shopify.com/x.css"),
    ("p2", "generator", "wp-content"),             # wrong carrier: no hit
    ("p3", "script", None),                        # NULL never matches
    ("p3", "script", "/assets/REACT.production.js"),
    ("p4", "script", "/clean/app.js"),             # no hits at all
]


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-tech-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark):
    from hickoryspark.ops.techstack import tech_from_carriers

    c = spark.createDataFrame(
        CARRIERS, "url string, carrier string, value string")
    return sorted(tuple(r) for r in tech_from_carriers(c).collect())


def test_carriers(spark):
    assert _run(spark) == [
        ("p1", "jquery", 1),
        ("p1", "wordpress", 2),
        ("p2", "shopify", 1),
        ("p3", "react", 1),
    ]


def test_mirror_agreement(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE car (url VARCHAR, carrier VARCHAR,"
        " value VARCHAR)")
    con.executemany("INSERT INTO car VALUES (?, ?, ?)", CARRIERS)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_tech_sql("car")).fetchall())
    assert _run(spark) == want


def test_node_wrapper_real_parser(spark):
    from hickoryspark.ops.techstack import detect_tech
    from hickoryspark.spark.nodes_table import explode_nodes

    html = (b"<html><head>"
            b"<meta name=GENERATOR content='Hugo 0.120'>"
            b"<meta name=description content='drupal'>"  # wrong meta
            b"<link rel=stylesheet href='/wp-content/a.css'>"
            b"<script src='/_next/b.js'></script>"
            b"</head><body><script>inline no src</script></body></html>")
    pages = spark.createDataFrame([("u1", html)],
                                  "url string, html binary")
    got = sorted(tuple(r)
                 for r in detect_tech(explode_nodes(pages)).collect())
    assert got == [("u1", "hugo", 1), ("u1", "nextjs", 1),
                   ("u1", "wordpress", 1)]
