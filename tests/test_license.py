"""License detection (ops/license.py): rel-token matching, CC href
parsing, first-declaration rollup."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-license-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _nodes(spark, html: bytes):
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([("u", bytearray(html))],
                                  "url string, html binary")
    return explode_nodes(pages)


def test_detect_and_parse(spark):
    from hickoryspark.ops.license import detect_licenses

    html = (
        b'<link rel=" LICENSE other" '
        b'href="https://WWW.CreativeCommons.ORG/licenses/by-nc-nd/3.0/deed.en">'
        b'<a rel="license" href="http://creativecommons.org/licenses/by-sa/4.0/">c</a>'
        b'<a rel="nofollow license" href="/custom">x</a>'
        b'<a rel="license" href="https://creativecommons.org/publicdomain/zero/1.0/">z</a>'
        b'<a href="https://creativecommons.org/licenses/by/4.0/">no rel</a>'
    )
    rows = [(r["lic_pos"], r["tag"], r["license_id"], r["license_version"])
            for r in detect_licenses(_nodes(spark, html))
            .orderBy("lic_pos").collect()]
    assert rows == [
        (1, "link", "cc-by-nc-nd", "3.0"),
        (2, "a", "cc-by-sa", "4.0"),
        (3, "a", None, None),
        (4, "a", "cc0", "1.0"),
    ]


def test_publicdomain_mark_and_plus_code(spark):
    from hickoryspark.ops.license import detect_licenses

    html = (
        b'<a rel="license" href="https://creativecommons.org/publicdomain/mark/1.0/">m</a>'
        b'<a rel="license" href="https://creativecommons.org/licenses/by-nc-sa/2.5/br/">j</a>'
    )
    rows = [(r["license_id"], r["license_version"])
            for r in detect_licenses(_nodes(spark, html))
            .orderBy("lic_pos").collect()]
    assert rows == [("pdm", "1.0"), ("cc-by-nc-sa", "2.5")]


def test_page_license_first_wins(spark):
    from hickoryspark.ops.license import page_license

    # the FIRST declaration wins even when unrecognized — no
    # recognized-beats-first reordering
    html = (
        b'<a rel="license" href="/house-rules">h</a>'
        b'<a rel="license" href="https://creativecommons.org/licenses/by/4.0/">c</a>'
    )
    rows = page_license(_nodes(spark, html)).collect()
    assert len(rows) == 1
    assert rows[0]["href"] == "/house-rules"
    assert rows[0]["license_id"] is None
    # a page with no declaration yields no row
    assert page_license(_nodes(spark, b"<p>none</p>")).count() == 0


def test_page_license_no_window_plan(spark):
    from hickoryspark.ops.license import page_license

    df = page_license(_nodes(
        spark, b'<a rel="license" href="/x">l</a>'))
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
