"""Article stitching over pagination chains: member order, terminal
keying, cycle exclusion, and missing-text drop."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-stitch-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _pages(spark, rows):
    from hickoryspark.spark.nodes_table import explode_nodes

    return explode_nodes(
        spark.createDataFrame(rows, "url string, html string")
    )


def test_stitch_orders_and_keys_by_terminal(spark):
    from hickoryspark.ops.crawlgraph import pagination_chains
    from hickoryspark.ops.stitch import stitch_articles

    base = "https://s.ex/a"
    nodes = _pages(spark, [
        (f"{base}/p0",
         f'<html><head><link rel="next" href="p1"></head>'
         "<body>part0</body></html>"),
        (f"{base}/p1",
         f'<html><body><a rel="next" href="p2">next</a>part1</body></html>'),
        (f"{base}/p2", "<html><body>part2</body></html>"),
        # a standalone cycle: c0 <-> c1 must not become an article
        ("https://s.ex/c0",
         '<html><body><a rel="next" href="c1">n</a>c</body></html>'),
        ("https://s.ex/c1",
         '<html><body><a rel="next" href="c0">n</a>c</body></html>'),
    ])
    chains = pagination_chains(nodes)
    texts = spark.createDataFrame(
        [(f"{base}/p0", "zero"), (f"{base}/p1", "one"),
         (f"{base}/p2", "two"),
         ("https://s.ex/c0", "cyc"), ("https://s.ex/c1", "cyc")],
        "url string, text string",
    )
    out = {r["article_id"]: r for r in
           stitch_articles(chains, texts).collect()}
    assert list(out) == [f"{base}/p2"]
    assert out[f"{base}/p2"]["n_pages"] == 3
    assert out[f"{base}/p2"]["text"] == "zero\none\ntwo"


def test_missing_text_members_drop(spark):
    from hickoryspark.ops.crawlgraph import pagination_chains
    from hickoryspark.ops.stitch import stitch_articles

    nodes = _pages(spark, [
        ("https://s.ex/q0",
         '<html><body><a rel="next" href="q1">n</a>x</body></html>'),
        ("https://s.ex/q1", "<html><body>y</body></html>"),
    ])
    texts = spark.createDataFrame(
        [("https://s.ex/q0", "only first")], "url string, text string"
    )
    out = stitch_articles(pagination_chains(nodes), texts).collect()
    assert len(out) == 1
    assert out[0]["n_pages"] == 1 and out[0]["text"] == "only first"
    assert out[0]["article_id"] == "https://s.ex/q1"
