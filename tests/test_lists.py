"""List-item extraction (ops/lists.py): nesting, ownership, text."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-lists-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _rows(spark, html):
    from hickoryspark.ops.lists import extract_list_items
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([("u", html)], "url string, html string")
    out = extract_list_items(explode_nodes(pages))
    return sorted(
        (tuple(r) for r in out.collect()),
        key=lambda t: (t[1], t[3]),
    )


def test_flat_ol(spark):
    rows = _rows(spark, "<ol><li>a</li><li>b</li><li>c</li></ol>")
    assert rows == [
        ("u", 1, "ol", 1, 1, "a", 0),
        ("u", 1, "ol", 2, 1, "b", 0),
        ("u", 1, "ol", 3, 1, "c", 0),
    ]


def test_nested_ul_text_ownership(spark):
    # "y" belongs to the NESTED li, not to "x"'s item_text; the outer
    # li owns one sub-list
    rows = _rows(
        spark, "<ul><li>x<ul><li>y</li></ul></li><li>z</li></ul>")
    assert rows == [
        ("u", 1, "ul", 1, 1, "x", 1),
        ("u", 1, "ul", 2, 1, "z", 0),
        ("u", 2, "ul", 1, 2, "y", 0),
    ]


def test_stray_li_dropped_and_markup_text(spark):
    # stray li (div parent) ignored; nested non-list markup's text
    # still owned by the li
    rows = _rows(spark, "<div><li>stray</li></div><ol><li>q<b>r</b></li></ol>")
    assert rows == [("u", 1, "ol", 1, 1, "qr", 0)]


def test_empty_list_and_empty_item(spark):
    rows = _rows(spark, "<ul></ul><ol><li></li></ol>")
    assert rows == [("u", 2, "ol", 1, 1, "", 0)]


def test_sublist_wrapped_in_div_still_counted(spark):
    # the sub-list is not a DIRECT child of the li but its nearest li
    # ancestor is still the outer item
    rows = _rows(
        spark,
        "<ul><li>a<div><ul><li>b</li></ul></div></li></ul>")
    assert rows == [
        ("u", 1, "ul", 1, 1, "a", 1),
        ("u", 2, "ul", 1, 2, "b", 0),
    ]


def test_comment_counts_as_text(spark):
    rows = _rows(spark, "<ul><li>a<!--c--></li></ul>")
    assert rows == [("u", 1, "ul", 1, 1, "ac", 0)]
