"""Page-requisite resource extraction (ops/resources.py): carrier
tags, link rel kinds, resolution, host fold, third-party audit."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-resources-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _rows(spark, html, url="https://r.ex/a/p1"):
    from hickoryspark.ops.resources import extract_resources
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([(url, html)], "url string, html string")
    out = extract_resources(explode_nodes(pages)).orderBy("res_pos")
    return [r.asDict() for r in out.collect()]


def test_src_tags_in_document_order(spark):
    rows = _rows(
        spark,
        "<script src='/js/a.js'></script><img src='i.png'>"
        "<iframe src='https://ads.ex/f'></iframe>"
        "<embed src='e.bin'><object data='/o.swf'></object>"
        "<video src='v.mp4'></video><audio><source src='a.ogg'></audio>",
    )
    assert [(r["res_pos"], r["kind"]) for r in rows] == [
        (1, "script"), (2, "image"), (3, "frame"), (4, "embed"),
        (5, "object"), (6, "media"), (7, "media"),
    ]
    assert rows[0]["resolved"] == "https://r.ex/js/a.js"
    assert rows[1]["resolved"] == "https://r.ex/a/i.png"  # path-relative
    assert rows[2]["resolved"] == "https://ads.ex/f"


def test_third_party_audit(spark):
    rows = _rows(
        spark,
        "<script src='//cdn.ex/t.js'></script><img src='/l.png'>"
        "<img src='mailto:x@y'>",
    )
    assert rows[0]["res_host"] == "cdn.ex" and rows[0]["third_party"] == 1
    assert rows[1]["res_host"] == "r.ex" and rows[1]["third_party"] == 0
    # mailto: has no authority -> host NULL -> third_party NULL
    assert rows[2]["res_host"] is None and rows[2]["third_party"] is None


def test_link_rel_kinds_and_priority(spark):
    rows = _rows(
        spark,
        "<link rel='Stylesheet' href='/c.css'>"
        "<link rel='shortcut ICON' href='/f.ico'>"
        "<link rel='preload' href='/p.woff2'>"
        "<link rel='stylesheet icon' href='/both.css'>"
        "<link rel='canonical' href='/c'>"
        "<link rel='stylesheet'>",  # no href -> no row
    )
    assert [(r["kind"], r["src"]) for r in rows] == [
        ("stylesheet", "/c.css"), ("icon", "/f.ico"),
        ("preload", "/p.woff2"), ("stylesheet", "/both.css"),
    ]


def test_non_carriers_emit_nothing(spark):
    rows = _rows(
        spark,
        "<script>inline()</script><img srcset='a 1x'>"
        "<object></object><a href='/x'>t</a>",
    )
    assert rows == []


def test_empty_src_kept_and_resolves_base_rule(spark):
    rows = _rows(spark, "<img src=''>")
    assert len(rows) == 1
    # links.py '' rule: base sans fragment... raw-empty returns base
    assert rows[0]["resolved"] == "https://r.ex/a/p1"


def test_res_pos_is_per_page(spark):
    from hickoryspark.ops.resources import extract_resources
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame(
        [("https://r.ex/1", "<img src='a'><img src='b'>"),
         ("https://r.ex/2", "<img src='c'>")],
        "url string, html string")
    out = extract_resources(explode_nodes(pages))
    got = {(r["url"], r["res_pos"], r["src"]) for r in out.collect()}
    assert got == {("https://r.ex/1", 1, "a"), ("https://r.ex/1", 2, "b"),
                   ("https://r.ex/2", 1, "c")}


def test_mixed_content_rollup(spark):
    from hickoryspark.ops.resources import extract_resources, mixed_content
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([
        ("https://s.ex/p",
         '<script src="http://ads.ex/a.js"></script>'
         '<img src="http://i.ex/i.png">'
         '<link rel=stylesheet href="https://s.ex/s.css">'),
        # protocol-relative resolves to page scheme — never mixed
        ("https://s.ex/q", '<img src="//img.ex/x"><script src="/l.js">'
                           "</script>"),
        # http page: nothing is mixed by definition
        ("http://s.ex/r", '<script src="http://other.ex/s.js"></script>'),
    ], "url string, html string")
    got = {
        r["url"]: (r["n_resources"], r["n_mixed_active"],
                   r["n_mixed_passive"], r["n_third_party"])
        for r in mixed_content(
            extract_resources(explode_nodes(pages))).collect()
    }
    assert got["https://s.ex/p"] == (3, 1, 1, 2)
    assert got["https://s.ex/q"] == (2, 0, 0, 1)
    assert got["http://s.ex/r"] == (1, 0, 0, 1)
