"""Quotation extraction (ops/quotes.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-quotes-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _quotes(spark, html):
    from hickoryspark.ops.quotes import extract_quotes
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([("u", html)], "url string, html string")
    return sorted(tuple(r)[1:] for r in
                  extract_quotes(explode_nodes(pages)).collect())


def test_blockquote_with_cite_attr_and_element(spark):
    got = _quotes(
        spark,
        '<blockquote cite="https://s.ex/1"><p>Wise words</p>'
        "<cite>A. Author</cite></blockquote>")
    assert got == [
        (1, "blockquote", "Wise wordsA. Author", "https://s.ex/1",
         "A. Author"),
    ]


def test_inline_q_and_numbering(spark):
    got = _quotes(spark, "<p><q>one</q> then <q>two</q></p>")
    assert got == [(1, "q", "one", None, None),
                   (2, "q", "two", None, None)]


def test_nested_quote_rows(spark):
    got = _quotes(
        spark, "<blockquote>outer <q>inner</q></blockquote>")
    assert got == [(1, "blockquote", "outer inner", None, None),
                   (2, "q", "inner", None, None)]


def test_first_cite_wins(spark):
    got = _quotes(
        spark,
        "<blockquote>x<cite>first</cite><cite>second</cite></blockquote>")
    assert got == [(1, "blockquote", "xfirstsecond", None, "first")]


def test_empty_quote_trimmed(spark):
    got = _quotes(spark, "<blockquote>  \n </blockquote>")
    assert got == [(1, "blockquote", "", None, None)]


def test_cite_outside_quote_ignored(spark):
    got = _quotes(spark, "<cite>nope</cite><q>y</q>")
    assert got == [(1, "q", "y", None, None)]
