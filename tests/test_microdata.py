"""HTML microdata extraction (ops/structured.py extract_microdata):
ownership, nesting, value table, token splitting, ordering."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-microdata-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _rows(spark, html, url="https://ex.test/p"):
    from hickoryspark.ops.structured import extract_microdata
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([(url, html)], "url string, html string")
    out = extract_microdata(explode_nodes(pages)).collect()
    return sorted(
        ((r["item_idx"], r["prop_pos"], r["itemtype"], r["prop_name"],
          r["prop_value"], r["nested_item"]) for r in out)
    )


def test_basic_item_with_text_prop(spark):
    rows = _rows(
        spark,
        '<div itemscope itemtype="https://schema.org/Person">'
        '<span itemprop="name">Ann <b>B</b></span></div>',
    )
    # subtree text, not direct text: the <b> child's text is included
    assert rows == [(0, 0, "https://schema.org/Person", "name", "Ann B", None)]


def test_value_table(spark):
    rows = _rows(
        spark,
        "<div itemscope>"
        '<meta itemprop="m" content="MC">'
        '<img itemprop="i" src="IS">'
        '<a itemprop="a" href="AH">ignored</a>'
        '<object itemprop="o" data="OD"></object>'
        '<data itemprop="d" value="DV">ignored</data>'
        '<time itemprop="t1" datetime="2024-01-02">ignored</time>'
        '<time itemprop="t2">fallback</time>'
        '<img itemprop="noattr">'
        "</div>",
    )
    vals = {r[3]: r[4] for r in rows}
    assert vals == {
        "m": "MC", "i": "IS", "a": "AH", "o": "OD", "d": "DV",
        "t1": "2024-01-02", "t2": "fallback", "noattr": "",
    }
    # prop_pos follows document order
    assert [r[3] for r in sorted(rows, key=lambda r: r[1])] == [
        "m", "i", "a", "o", "d", "t1", "t2", "noattr"]


def test_nearest_ancestor_and_nested_item(spark):
    rows = _rows(
        spark,
        '<div itemscope itemtype="T0">'
        '<span itemprop="p0">v0</span>'
        '<div itemprop="addr" itemscope itemtype="T1">'
        '<span itemprop="p1">v1</span></div>'
        "</div>",
    )
    assert (0, 0, "T0", "p0", "v0", None) in rows
    # the inner item is a property OF THE OUTER item, value NULL,
    # carrying its own index as the structural edge
    assert (0, 1, "T0", "addr", None, 1) in rows
    # and the inner prop belongs to the INNER (nearest) item
    assert (1, 0, "T1", "p1", "v1", None) in rows
    assert len(rows) == 3


def test_multi_token_itemprop_and_empty(spark):
    rows = _rows(
        spark,
        "<div itemscope>"
        '<span itemprop="author creator">X</span>'
        '<span itemprop="  ">dropped</span>'
        '<span itemprop="z">Y</span></div>',
    )
    assert [(r[1], r[3], r[4]) for r in sorted(rows, key=lambda r: r[1])] == [
        (0, "author", "X"), (1, "creator", "X"), (2, "z", "Y")]


def test_unowned_props_dropped(spark):
    rows = _rows(
        spark,
        '<span itemprop="stray">v</span>'
        '<div itemscope><span itemprop="kept">k</span></div>',
    )
    assert [(r[3], r[4]) for r in rows] == [("kept", "k")]


def test_sibling_items_index_in_document_order(spark):
    rows = _rows(
        spark,
        '<div itemscope itemtype="A"><span itemprop="x">1</span></div>'
        '<div itemscope itemtype="B"><span itemprop="x">2</span></div>',
    )
    assert rows == [
        (0, 0, "A", "x", "1", None),
        (1, 0, "B", "x", "2", None),
    ]


def test_itemtype_absent_is_null(spark):
    rows = _rows(spark, '<div itemscope><span itemprop="x">1</span></div>')
    assert rows == [(0, 0, None, "x", "1", None)]
