"""Anchor contexts (ops/anchorcontext.py): span rule with nested
markup, window clipping at page edges, no-direct-text anchors,
link_pos ordering."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-anchorctx-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


PAGES = [
    # page text: aaaaaaLINKzzzzzz; span [6,10)
    ("p1", b"<html><body><p>aaaaaa</p><a href=u>LINK</a>"
           b"<p>zzzzzz</p></body></html>"),
    # anchor at page start: before is empty, after clipped to k
    ("p2", b"<html><body><a href=u>GO</a><p>tail</p></body></html>"),
    # nested <b> inside anchor 1: page text xyAdeepBCC; anchor 'AB'
    # spans [2,8) (the nested text sits INSIDE the span); anchor 2
    # 'CC' at [8,10)
    ("p3", b"<html><body><p>xy</p><a href=u>A<b>deep</b>B</a>"
           b"<a href=v>CC</a></body></html>"),
    # no direct text -> no row
    ("p4", b"<html><body><a href=u><b>only nested</b></a>"
           b"</body></html>"),
]


def test_contexts(spark):
    from hickoryspark.ops.anchorcontext import anchor_contexts
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame(PAGES, "url string, html binary")
    got = sorted(tuple(r) for r in anchor_contexts(
        explode_nodes(pages), k=4).collect())
    assert got == [
        ("p1", 1, "u", "LINK", "aaaa", "zzzz"),
        ("p2", 1, "u", "GO", "", "tail"),
        ("p3", 1, "u", "AB", "xy", "CC"),
        ("p3", 2, "v", "CC", "eepB", ""),
    ]
