"""Anchor-text / target-title pair mining (ops/anchorpairs.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-anchorpairs-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _pairs(spark, pages):
    from hickoryspark.ops.anchorpairs import anchor_title_pairs
    from hickoryspark.spark.nodes_table import explode_nodes

    df = spark.createDataFrame(pages, "url string, html string")
    return sorted(tuple(r) for r in
                  anchor_title_pairs(explode_nodes(df)).collect())


def test_basic_pair_nested_markup_anchor(spark):
    got = _pairs(spark, [
        ("https://s.ex/a", '<a href="b"><b>Click</b> me</a>'),
        ("https://s.ex/b", "<title>Target B</title>"),
    ])
    assert got == [("https://s.ex/a", 1, "https://s.ex/b",
                    "Click me", "Target B")]


def test_dot_segment_fold_reaches_target(spark):
    got = _pairs(spark, [
        ("https://s.ex/d/a", '<a href="/x/../b">t</a>'),
        ("https://s.ex/b", "<title>B</title>"),
    ])
    assert got == [("https://s.ex/d/a", 1, "https://s.ex/b", "t", "B")]


def test_empty_anchor_and_missing_target_dropped(spark):
    got = _pairs(spark, [
        ("https://s.ex/a",
         '<a href="b"> \t </a><a href="missing">m</a>'
         '<a href="b">ok</a>'),
        ("https://s.ex/b", "<title>B</title>"),
    ])
    # link_pos 3 survives: whitespace-only anchor (pos 1) and
    # dangling target (pos 2) are dropped
    assert got == [("https://s.ex/a", 3, "https://s.ex/b", "ok", "B")]


def test_untitled_target_yields_no_pair(spark):
    got = _pairs(spark, [
        ("https://s.ex/a", '<a href="b">x</a>'),
        ("https://s.ex/b", "<p>no title</p>"),
    ])
    assert got == []


def test_multiplicity_kept(spark):
    got = _pairs(spark, [
        ("https://s.ex/a", '<a href="b">x</a><a href="b">x</a>'),
        ("https://s.ex/b", "<title>B</title>"),
    ])
    assert [g[1] for g in got] == [1, 2]
