"""Microformats2 extraction (ops/microformats.py): root detection,
value resolution per kind, nesting/composition, ownership, token
grammar (case-sensitivity, multi-token classes), orphan drop."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-mf2-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, html):
    from hickoryspark.ops.microformats import extract_microformats
    from hickoryspark.spark.nodes_table import explode_nodes

    df = spark.createDataFrame(
        [("u", bytearray(html.encode("utf-8")))],
        "url string, html binary")
    return [
        (r["item_idx"], r["item_types"], r["prop_kind"], r["prop_name"],
         r["prop_pos"], r["value"], r["nested_item"])
        for r in extract_microformats(explode_nodes(df))
        .orderBy("item_idx", "prop_pos").collect()
    ]


def test_value_resolution_kinds(spark):
    rows = _run(spark, (
        '<div class="h-card extra">'
        '<span class="p-name">Ann <b>B</b></span>'
        '<a class="u-url" href="/ann">home</a>'
        '<img class="u-photo" src="/a.png" alt="">'
        '<time class="dt-bday" datetime="1990-01-02">Jan 2</time>'
        '<span class="e-note">a<i>b</i></span></div>'))
    assert rows == [
        (0, "h-card", "p", "name", 0, "Ann B", None),
        (0, "h-card", "u", "url", 1, "/ann", None),
        (0, "h-card", "u", "photo", 2, "/a.png", None),
        (0, "h-card", "dt", "bday", 3, "1990-01-02", None),
        (0, "h-card", "e", "note", 4, "ab", None),
    ]


def test_nested_item_composition(spark):
    rows = _run(spark, (
        '<div class="h-entry"><div class="p-author h-card">'
        '<span class="p-name">Org</span></div></div>'))
    assert rows == [
        (0, "h-entry", "p", "author", 0, None, 1),
        (1, "h-card", "p", "name", 0, "Org", None),
    ]


def test_orphans_and_case_sensitivity(spark):
    # properties outside any root drop; H-CARD is not a root
    rows = _run(spark, (
        '<span class="p-orphan">o</span>'
        '<div class="H-CARD"><span class="p-x">y</span></div>'
        '<div class="h-x"><span class="p-k">v</span></div>'))
    assert rows == [(0, "h-x", "p", "k", 0, "v", None)]


def test_u_fallbacks(spark):
    # href only counts on a/area/link; span href falls to subtree text
    rows = _run(spark, (
        '<div class="h-x"><span class="u-a" href="/no">T</span>'
        '<a class="u-b">notext-href</a></div>'))
    assert rows == [
        (0, "h-x", "u", "a", 0, "T", None),
        (0, "h-x", "u", "b", 1, "notext-href", None),
    ]


def test_dt_fallback_and_multi_token(spark):
    rows = _run(spark, (
        '<div class="h-x"><span class="dt-start">2020</span>'
        '<img class="p-a u-b" src="/s"></div>'))
    assert rows == [
        (0, "h-x", "dt", "start", 0, "2020", None),
        (0, "h-x", "p", "a", 1, "", None),
        (0, "h-x", "u", "b", 2, "/s", None),
    ]


def test_nearest_root_ownership(spark):
    # inner property belongs to the INNER root even without a p-* on it
    rows = _run(spark, (
        '<div class="h-outer"><div class="h-inner">'
        '<span class="p-name">N</span></div>'
        '<span class="p-top">T</span></div>'))
    assert rows == [
        (0, "h-outer", "p", "top", 0, "T", None),
        (1, "h-inner", "p", "name", 0, "N", None),
    ]


def test_multiple_h_types(spark):
    rows = _run(spark, (
        '<div class="h-card h-org"><span class="p-name">X</span></div>'))
    assert rows == [(0, "h-card h-org", "p", "name", 0, "X", None)]
