"""OPML parsing (ops/opml.py): nesting depth, attribute extraction +
entity unescape, case-insensitive attr names, head title, gzip +
corrupt-gzip degrade, stray closes, Spark path."""

from __future__ import annotations

import gzip
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.opml import parse_opml  # noqa: E402

DOC = b"""<?xml version="1.0"?><opml version="2.0">
<head><title>My &amp; Feeds</title></head>
<body>
<outline text="News" title="News">
  <outline type="rss" text="A &amp; B" xmlUrl="https://a.ex/feed?x=1&amp;y=2" htmlUrl="https://a.ex/"/>
  <outline TYPE="rss" TEXT="C" XMLURL="https://c.ex/rss"/>
</outline>
<outline text="Flat" type="link" htmlUrl='https://f.ex/'/>
</body></opml>"""


def test_parse_structure():
    rows = parse_opml(DOC)
    assert [(r["pos"], r["depth"], r["text"]) for r in rows] == [
        (0, 0, "News"), (1, 1, "A & B"), (2, 1, "C"), (3, 0, "Flat")]
    assert all(r["opml_title"] == "My & Feeds" for r in rows)
    assert rows[1]["xml_url"] == "https://a.ex/feed?x=1&y=2"
    assert rows[1]["html_url"] == "https://a.ex/"
    # case-insensitive attribute names
    assert rows[2]["xml_url"] == "https://c.ex/rss"
    assert rows[3]["type"] == "link" and rows[3]["html_url"] == "https://f.ex/"
    assert rows[0]["xml_url"] is None


def test_gzip_and_degrade():
    assert parse_opml(gzip.compress(DOC)) == parse_opml(DOC)
    assert parse_opml(gzip.compress(DOC)[:20]) == []
    assert parse_opml(b"\x1f\x8b\x00garbage") == []
    assert parse_opml(b"no outlines here") == []


def test_quoted_gt_in_attribute():
    # raw '>' inside a quoted attr value is legal XML — the tag must
    # not truncate there (attrs survive, self-closing stays leaf)
    rows = parse_opml(
        b'<body><outline text="a > b" type="rss" '
        b'xmlUrl="https://x.ex/f"/>'
        b"<outline text='c'/></body>")
    assert [(r["text"], r["depth"], r["xml_url"]) for r in rows] == [
        ("a > b", 0, "https://x.ex/f"), ("c", 0, None)]
    assert rows[0]["type"] == "rss"


def test_stray_close_floors_depth():
    rows = parse_opml(
        b"<body></outline><outline text='a'/>"
        b"<outline text='b'><outline text='c'/></outline>"
        b"<outline text='d'/></body>")
    assert [(r["text"], r["depth"]) for r in rows] == [
        ("a", 0), ("b", 0), ("c", 1), ("d", 0)]


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-opml-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_parse_opml_df(spark):
    from hickoryspark.ops.opml import parse_opml_df

    df = spark.createDataFrame(
        [("h1", bytearray(DOC)), ("h2", None),
         ("h3", bytearray(b"\x1f\x8b\x00bad"))],
        "host string, payload binary")
    rows = parse_opml_df(df).collect()
    assert {r["host"] for r in rows} == {"h1"}
    assert len(rows) == 4
