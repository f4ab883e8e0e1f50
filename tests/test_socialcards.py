"""Social-card metadata rows (ops/socialcards.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-socialcards-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _cards(spark, html):
    from hickoryspark.ops.socialcards import social_cards
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([("u", html)], "url string, html string")
    return sorted(tuple(r)[1:] for r in
                  social_cards(explode_nodes(pages)).collect())


def test_og_twitter_and_ordering(spark):
    got = _cards(
        spark,
        '<meta property="og:image" content="/i.png">'
        '<meta name="twitter:card" content="summary">'
        '<meta name="description" content="not a card">')
    assert got == [
        (1, "og", "og:image", "/i.png"),
        (2, "twitter", "twitter:card", "summary"),
    ]


def test_case_fold_and_property_wins_over_name(spark):
    got = _cards(
        spark,
        '<meta property="OG:Image" name="twitter:image" content="x">')
    assert got == [(1, "og", "og:image", "x")]


def test_missing_content_kept_null(spark):
    got = _cards(spark, '<meta property="og:video">')
    assert got == [(1, "og", "og:video", None)]


def test_prefix_must_anchor(spark):
    got = _cards(
        spark, '<meta name="blog:twitter:x" content="n">'
               '<meta name="ogx" content="n">')
    assert got == []
