"""Accessibility signals (ops/a11y.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-a11y-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _sig(spark, html):
    from hickoryspark.ops.a11y import accessibility_signals
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([("u", html)], "url string, html string")
    (row,) = accessibility_signals(explode_nodes(pages)).collect()
    return tuple(row)[1:]


def test_imgs_and_headings(spark):
    # img without alt flagged, alt="" is labeled; h1->h3 is a skip
    got = _sig(
        spark,
        '<html lang="en"><body><img src=a alt="x"><img src=b>'
        '<img src=c alt=""><h1>t</h1><h3>s</h3></body></html>')
    assert got == (3, 1, 2, 1, 0, 0, 1)


def test_first_heading_deep_is_a_skip(spark):
    got = _sig(spark, "<h2>first</h2><h2>second</h2>")
    assert got == (0, 0, 2, 1, 0, 0, 0)


def test_controls_labeling(spark):
    # label-for labels the id'd input; hidden excluded; bare input
    # unlabeled; wrapped select labeled; aria-label'd textarea labeled
    got = _sig(
        spark,
        '<label for="i">L</label><input id="i">'
        '<input type="HIDDEN" name=h><input name=bare>'
        "<label>Wrap<select></select></label>"
        '<textarea aria-label="y"></textarea>')
    assert got == (0, 0, 0, 0, 4, 1, 0)


def test_label_for_mismatch_unlabeled(spark):
    got = _sig(spark, '<label for="other">L</label><input id="z">')
    assert got == (0, 0, 0, 0, 1, 1, 0)


def test_empty_aria_label_does_not_count(spark):
    got = _sig(spark, '<input aria-label="">')
    assert got == (0, 0, 0, 0, 1, 1, 0)


def test_empty_page_one_zero_row(spark):
    got = _sig(spark, "")
    assert got == (0, 0, 0, 0, 0, 0, 0)


def test_empty_html_lang_is_zero(spark):
    got = _sig(spark, '<html lang=""><body>x</body></html>')
    assert got == (0, 0, 0, 0, 0, 0, 0)
