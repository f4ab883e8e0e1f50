"""Unified structured-data view (ops/structured.structured_union)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-structured-union-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _union(spark, html):
    from hickoryspark.ops.structured import structured_union
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([("u", html)], "url string, html string")
    return sorted(tuple(r)[1:] for r in
                  structured_union(explode_nodes(pages)).collect())


def test_three_carriers_one_schema(spark):
    html = (
        '<div itemscope itemtype="https://schema.org/Person">'
        '<span itemprop="name">Ada</span></div>'
        '<div vocab="https://schema.org/" typeof="Book">'
        '<span property="name">SICP</span></div>'
        '<script type="application/ld+json">'
        '{"@type": "Article", "headline": "H1", "name": "N1"}'
        "</script>"
    )
    got = _union(spark, html)
    assert got == sorted([
        ("microdata", 0, "https://schema.org/Person", "name", 0, "Ada"),
        ("rdfa", 0, "Book", "name", 0, "SICP"),
        ("jsonld", 0, "Article", "name", 0, "N1"),
        ("jsonld", 0, "Article", "headline", 1, "H1"),
    ])


def test_invalid_jsonld_and_propless_block_contribute_nothing(spark):
    html = (
        '<script type="application/ld+json">{broken</script>'
        '<script type="application/ld+json">{"@type": "Thing"}'
        "</script>"
    )
    assert _union(spark, html) == []


def test_nested_item_edge_row_kept_with_null_value(spark):
    html = (
        '<div itemscope itemtype="T1">'
        '<div itemprop="child" itemscope itemtype="T2">'
        '<span itemprop="k">v</span></div></div>'
    )
    got = _union(spark, html)
    assert ("microdata", 0, "T1", "child", 0, None) in got
    assert ("microdata", 1, "T2", "k", 0, "v") in got
