"""Link-graph extraction (ops/links.py): resolution cases, document
order, direct-text anchor semantics."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-links-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _links(spark, html, url="https://ex.test/a/b"):
    from hickoryspark.ops.links import extract_links
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([(url, html)], "url string, html string")
    rows = extract_links(explode_nodes(pages)).collect()
    return sorted(rows, key=lambda r: r["link_pos"])


def test_resolution_absolute_host_relative_path_relative(spark):
    rows = _links(
        spark,
        '<a href="https://other.example/x">abs</a>'
        '<a href="/root">hostrel</a>'
        '<a href="sib.html">pathrel</a>'
        '<a href="mailto:x@y.z">mail</a>',
    )
    assert [(r["href"], r["resolved"]) for r in rows] == [
        ("https://other.example/x", "https://other.example/x"),
        ("/root", "https://ex.test/root"),
        ("sib.html", "https://ex.test/a/sib.html"),
        ("mailto:x@y.z", "mailto:x@y.z"),  # scheme-qualified: kept
    ]
    assert [r["link_pos"] for r in rows] == [1, 2, 3, 4]


def test_anchor_text_is_direct_text_only_in_document_order(spark):
    rows = _links(
        spark,
        '<a href="/1">one <b>bold</b> two</a>'
        '<a href="/2"><i>all nested</i></a>'
        '<a href="/3"></a>',
    )
    # direct strings concatenated in order; nested element text excluded
    assert [r["anchor_text"] for r in rows] == ["one  two", "", ""]


def test_anchors_without_href_are_skipped(spark):
    rows = _links(spark, '<a name="top">x</a><a href="/y">y</a>')
    assert [(r["link_pos"], r["href"]) for r in rows] == [(1, "/y")]


def test_protocol_relative_and_query_fragment_refs(spark):
    # review repros: RFC 3986 network-path / query-only / fragment-only
    # references, and a '/' inside the page query must not become the
    # base truncation point
    rows = _links(
        spark,
        '<a href="//cdn.example/x">p</a>'
        '<a href="rel.html">r</a>'
        '<a href="#frag">f</a>'
        '<a href="?q=1">q</a>',
        url="https://ex.test/a/b?x=/deep/y",
    )
    assert [r["resolved"] for r in rows] == [
        "https://cdn.example/x",
        "https://ex.test/a/rel.html",
        "https://ex.test/a/b?x=/deep/y#frag",
        "https://ex.test/a/b?q=1",
    ]


def test_origin_only_page_url_and_scheme_case(spark):
    # review repro: an origin-only page url must not lose its host to
    # the truncate-to-last-slash base, and uppercase schemes are
    # absolute too
    rows = _links(
        spark,
        '<a href="news.html">n</a><a href="HTTPS://other.site/x">o</a>',
        url="https://ex.test",
    )
    assert [r["resolved"] for r in rows] == [
        "https://ex.test/news.html",
        "HTTPS://other.site/x",
    ]
