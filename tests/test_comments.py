"""Comment-section detection (ops/comments.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-comments-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _rows(spark, html):
    from hickoryspark.ops.comments import comment_sections
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([("u", html)], "url string, html string")
    return [tuple(r)[1:] for r in
            comment_sections(explode_nodes(pages)).collect()]


def test_id_marker_and_share(spark):
    got = _rows(
        spark, '<div id="comments"><p>ccc</p></div><p>bodybod</p>')
    assert got == [(1, 3, 10, 300)]


def test_class_token_exact_match_case_folded(spark):
    got = _rows(
        spark,
        '<section class="x Comment-List y"><p>cc</p></section>'
        "<p>bb</p>")
    assert got == [(1, 2, 4, 500)]


def test_nested_markers_count_twice_text_once(spark):
    got = _rows(
        spark,
        '<div class="comments"><div id="respond"><p>abc</p></div>'
        "</div><p>zz</p>")
    assert got == [(2, 3, 5, 600)]


def test_substring_token_never_matches(spark):
    got = _rows(
        spark, '<div class="commentary"><p>x</p></div><p>yy</p>')
    assert got == [(0, 0, 3, 0)]


def test_textless_page_zero_row(spark):
    got = _rows(spark, '<div id="comments"></div>')
    assert got == [(1, 0, 0, 0)]
