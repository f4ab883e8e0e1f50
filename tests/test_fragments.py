"""Fragment-link audit (ops/fragments.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-fragments-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _frags(spark, html):
    from hickoryspark.ops.fragments import fragment_links
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([("u", html)], "url string, html string")
    return sorted(tuple(r)[1:] for r in
                  fragment_links(explode_nodes(pages)).collect())


def test_hit_and_miss(spark):
    got = _frags(
        spark,
        '<a href="#fn1">1</a><a href="#nope">2</a>'
        '<li id="fn1">note</li>')
    assert got == [(1, "fn1", 1, "li"),
                   (2, "nope", 0, None)]


def test_duplicate_id_first_in_doc_order_wins(spark):
    got = _frags(
        spark,
        '<a href="#x">l</a><h2 id="x">a</h2><div id="x">b</div>')
    assert got == [(1, "x", 1, "h2")]


def test_bare_hash_and_case_sensitivity(spark):
    got = _frags(
        spark, '<a href="#">top</a><a href="#FN">c</a>'
               '<p id="fn">x</p>')
    assert got == [(1, "", 0, None), (2, "FN", 0, None)]


def test_non_fragment_hrefs_excluded(spark):
    got = _frags(
        spark, '<a href="/page#frag">ext</a><a href="#ok">i</a>'
               '<span id="ok"></span>')
    assert got == [(1, "ok", 1, "span")]
