"""DOM shape statistics (ops/domstats.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-domstats-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _stats(spark, html):
    from hickoryspark.ops.domstats import dom_stats
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([("u", html)], "url string, html string")
    (row,) = dom_stats(explode_nodes(pages)).collect()
    return tuple(row)[1:]


def test_simple_div(spark):
    # document + html + head + body + div + text
    assert _stats(spark, "<div>xy</div>") == (6, 4, 4, 1, 2, 0, 0)


def test_script_in_head_and_prose(spark):
    # script rawtext is code: 8 chars vs 2 prose chars
    got = _stats(spark, "<script>var a=1;</script><p>tz</p>")
    assert got == (8, 5, 4, 1, 2, 8, 800)


def test_style_counts_as_code(spark):
    got = _stats(spark, "<style>p{}</style>")
    assert got == (6, 4, 4, 0, 0, 3, 1000)


def test_deep_nesting_depth(spark):
    got = _stats(spark, "<div><div><div>d</div></div></div>")
    assert got == (8, 6, 6, 1, 1, 0, 0)


def test_comment_payload_excluded(spark):
    got = _stats(spark, "<!--note-->")
    # document, comment, payload string, html, head, body
    assert got == (6, 3, 2, 0, 0, 0, 0)


def test_empty_page(spark):
    got = _stats(spark, "")
    assert got == (4, 3, 2, 0, 0, 0, 0)
