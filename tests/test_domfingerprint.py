"""DOM structural fingerprints (ops/boilerplate.dom_fingerprints)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-domfp-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _fps(spark, pages):
    from hickoryspark.ops.boilerplate import dom_fingerprints
    from hickoryspark.spark.nodes_table import explode_nodes

    df = spark.createDataFrame(pages, "url string, html string")
    return {r["url"]: r["fingerprint"]
            for r in dom_fingerprints(explode_nodes(df)).collect()}


def test_same_structure_different_text_clusters(spark):
    out = _fps(spark, [
        ("u1", "<html><body><p>alpha</p><p>beta</p></body></html>"),
        ("u2", "<html><body><p>gamma x</p><p>delta y</p></body></html>"),
        ("u3", "<html><body><p>a</p><p>b</p><p>c</p></body></html>"),
        ("u4", "<html><body><div><p>a</p></div><p>b</p></body></html>"),
    ])
    assert out["u1"] == out["u2"]
    assert out["u1"] != out["u3"]
    assert out["u1"] != out["u4"]
    assert out["u3"] != out["u4"]


def test_attribute_changes_do_not_split_clusters(spark):
    out = _fps(spark, [
        ("u1", '<html><body><p class="a">x</p></body></html>'),
        ("u2", '<html><body><p id="z">y</p></body></html>'),
    ])
    assert out["u1"] == out["u2"]


def test_cluster_sizes_distribution(spark):
    from hickoryspark.ops.boilerplate import template_cluster_sizes
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = [
        ("u1", "<p>a</p>"), ("u2", "<p>b</p>"), ("u3", "<p>c</p>"),
        ("u4", "<div>d</div>"), ("u5", "<div>e</div>"),
        ("u6", "<span>f</span>"),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    out = {r["cluster_size"]: r["n_clusters"]
           for r in template_cluster_sizes(explode_nodes(df)).collect()}
    assert out == {3: 1, 2: 1, 1: 1}


def test_sibling_placement_distinguished(spark):
    # review regression: a sorted multiset merges trees that differ
    # only in WHICH sibling a subtree hangs under — the pre-order
    # sequence must split them
    out = _fps(spark, [
        ("u1", "<html><body><div><p>x</p></div><div></div></body></html>"),
        ("u2", "<html><body><div></div><div><p>y</p></div></body></html>"),
    ])
    assert out["u1"] != out["u2"]


def test_hostile_tag_names_do_not_collide(spark):
    # review regression: tags may contain separator bytes; the
    # self-delimiting token encoding must keep distinct structures
    # distinct
    out = _fps(spark, [
        ("u1", "<html><body><x\x1fy\x40z>a</x\x1fy\x40z></body></html>"),
        ("u2", "<html><body><x>a</x><y\x40z>b</y\x40z></body></html>"),
    ])
    assert out["u1"] != out["u2"]
