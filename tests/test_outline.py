"""Heading outline (ops/outline.py): section-path stack semantics."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-outline-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _outline(spark, html, url="u"):
    from hickoryspark.ops.outline import heading_outline
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([(url, html)], "url string, html string")
    rows = heading_outline(explode_nodes(pages)).collect()
    return sorted(rows, key=lambda r: r["heading_pos"])


def test_stack_semantics_h2_does_not_leak_across_h1(spark):
    rows = _outline(
        spark,
        "<h1>A</h1><p>x</p><h2>B</h2><h3>C</h3>"
        "<h1>D</h1><h3>E</h3><h2>F</h2>",
    )
    got = [(r["level"], r["text"], r["h1_section"], r["h2_section"])
           for r in rows]
    assert got == [
        (1, "A", "A", None),
        (2, "B", "A", "B"),
        (3, "C", "A", "B"),
        (1, "D", "D", None),
        (3, "E", "D", None),  # B belongs to section A: no leak
        (2, "F", "D", "F"),
    ]
    assert [r["heading_pos"] for r in rows] == [1, 2, 3, 4, 5, 6]


def test_heading_before_any_h1_and_empty_pages(spark):
    rows = _outline(spark, "<h2>orphan</h2><h1>top</h1>")
    assert [(r["text"], r["h1_section"], r["h2_section"])
            for r in rows] == [("orphan", None, "orphan"),
                               ("top", "top", None)]
    assert _outline(spark, "<p>no headings</p>") == []


def test_markup_nested_heading_text_is_direct_children_only(spark):
    rows = _outline(spark, "<h1>one <b>bold</b> two</h1>")
    assert rows[0]["text"] == "one  two"  # direct children, as written
