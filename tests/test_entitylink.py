"""Anchor-prior entity linking: argmax/tie rule, surface folding,
occurrence multiplicity, and unknown-mention drop."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-entitylink-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_priors_argmax_and_folding(spark):
    from hickoryspark.ops.entitylink import anchor_priors

    edges = spark.createDataFrame(
        [
            ("u1", "Paris", "https://w/paris_france"),
            ("u2", "paris", "https://w/paris_france"),
            ("u3", " PARIS ", "https://w/paris_texas"),
            ("u4", "", "https://w/empty"),       # empty surface drops
            ("u5", "x", None),                   # null target drops
        ],
        "url string, anchor_text string, resolved string",
    )
    out = {r["surface"]: (r["target"], r["n"])
           for r in anchor_priors(edges).collect()}
    assert out == {"paris": ("https://w/paris_france", 2)}


def test_tie_breaks_by_greater_target(spark):
    from hickoryspark.ops.entitylink import anchor_priors

    edges = spark.createDataFrame(
        [("u1", "go", "https://a"), ("u2", "go", "https://b")],
        "url string, anchor_text string, resolved string",
    )
    out = anchor_priors(edges).collect()
    assert out[0]["target"] == "https://b"  # (1,'https://b') > (1,'https://a')


def test_mentions_link_with_multiplicity(spark):
    from hickoryspark.ops.entitylink import anchor_priors, link_mentions

    edges = spark.createDataFrame(
        [("u", "new york", "https://w/nyc"), ("u2", "york", "https://w/york")],
        "url string, anchor_text string, resolved string",
    )
    docs = spark.createDataFrame(
        [(0, "I left New York for New York again, said Zebra. york stays"),
         (1, "lowercase new york never matches the mention rule")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["mention"], r["target"])
        for r in link_mentions(docs, anchor_priors(edges)).collect()
    )
    # 'New York' twice (multi-word run wins over 'York' alone);
    # 'Zebra' has no prior; lowercase text yields no mentions
    assert rows == [
        (0, "New York", "https://w/nyc"),
        (0, "New York", "https://w/nyc"),
    ]
