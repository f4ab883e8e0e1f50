"""Breadcrumb-trail extraction (ops/breadcrumbs.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-breadcrumbs-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _crumbs(spark, html):
    from hickoryspark.ops.breadcrumbs import extract_breadcrumbs
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([("u", html)], "url string, html string")
    out = extract_breadcrumbs(explode_nodes(pages))
    return sorted((tuple(r)[1:] for r in out.collect()))


def test_class_carrier_with_tail_crumb(spark):
    got = _crumbs(
        spark,
        '<nav class="breadcrumb"><ol><li><a href="/">Home</a></li>'
        '<li><a href="/c">C</a></li><li>Now</li></ol></nav>')
    assert got == [
        (1, 1, "Home", "/"),
        (1, 2, "C", "/c"),
        (1, 3, "Now", None),
    ]


def test_aria_carrier_case_and_markup(spark):
    got = _crumbs(
        spark,
        '<div aria-label="Breadcrumb"><ul><li> <a href="/a">A</a> </li>'
        '<li><a href="/b">B<b>!</b></a></li></ul></div>')
    assert got == [(1, 1, "A", "/a"), (1, 2, "B!", "/b")]


def test_class_token_among_others_and_other_lists_ignored(spark):
    got = _crumbs(
        spark,
        '<ul class="x BreadCrumb y"><li><a href="/p">P</a></li></ul>'
        "<ul><li>not a crumb</li></ul>")
    assert got == [(1, 1, "P", "/p")]


def test_substring_class_does_not_match(spark):
    assert _crumbs(
        spark, '<ul class="breadcrumbs"><li>x</li></ul>') == []


def test_two_trails_numbered(spark):
    got = _crumbs(
        spark,
        '<ol class=breadcrumb><li>a</li></ol>'
        '<ol class=breadcrumb><li>b</li></ol>')
    assert got == [(1, 1, "a", None), (2, 1, "b", None)]


def test_hrefless_anchor_skipped_for_href(spark):
    got = _crumbs(
        spark,
        '<ul class=breadcrumb><li><a>skip</a><a href="/real">R</a></li></ul>')
    assert got == [(1, 1, "skipR", "/real")]


def test_no_breadcrumbs(spark):
    assert _crumbs(spark, "<ul><li>plain</li></ul>") == []
