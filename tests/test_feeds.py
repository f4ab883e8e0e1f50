"""Feed parsing (ops/feeds.py): RSS/Atom field mapping, atom link rel
preference, CDATA, entities, gzip, degradation."""

from __future__ import annotations

import gzip
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.feeds import parse_feed

RSS = b"""<?xml version="1.0"?>
<rss version="2.0"><channel>
<title>Chan &amp; Co</title><link>https://c.test/</link>
<item><title><![CDATA[One & only]]></title>
  <link>https://c.test/1?a=1&amp;b=2</link>
  <guid>g-1</guid><pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>
  <description>first post</description></item>
<item><title>Two</title><link>https://c.test/2</link></item>
</channel></rss>"""

ATOM = b"""<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
<title>A Feed</title>
<link rel="self" href="https://a.test/feed.xml"/>
<entry><title>E1</title>
  <link rel="self" href="https://a.test/e1.xml"/>
  <link rel="alternate" href="https://a.test/e1"/>
  <id>tag:a.test,2024:e1</id>
  <published>2024-02-03T04:05:06Z</published>
  <summary>sum1</summary></entry>
<entry><title>E2</title><link href="https://a.test/e2"/>
  <updated>2024-03-04T00:00:00Z</updated></entry>
</feed>"""


def test_rss_fields_cdata_entities():
    rows = parse_feed(RSS)
    assert [r["kind"] for r in rows] == ["rss", "rss"]
    assert rows[0]["feed_title"] == "Chan & Co"
    assert rows[0]["title"] == "One & only"  # CDATA verbatim
    assert rows[0]["link"] == "https://c.test/1?a=1&b=2"  # unescaped
    assert rows[0]["guid"] == "g-1"
    assert rows[0]["published"] == "Mon, 01 Jan 2024 00:00:00 GMT"
    assert rows[0]["summary"] == "first post"
    assert rows[1]["title"] == "Two" and rows[1]["guid"] is None
    assert [r["entry_pos"] for r in rows] == [1, 2]


def test_atom_link_rel_preference_and_updated_fallback():
    rows = parse_feed(ATOM)
    assert [r["kind"] for r in rows] == ["atom", "atom"]
    assert rows[0]["feed_title"] == "A Feed"
    assert rows[0]["link"] == "https://a.test/e1"  # alternate, not self
    assert rows[0]["guid"] == "tag:a.test,2024:e1"
    assert rows[0]["published"] == "2024-02-03T04:05:06Z"
    assert rows[1]["link"] == "https://a.test/e2"  # rel absent = alternate
    assert rows[1]["published"] == "2024-03-04T00:00:00Z"  # updated
    assert rows[1]["summary"] is None


def test_gzip_payload():
    rows = parse_feed(gzip.compress(RSS))
    assert len(rows) == 2 and rows[0]["title"] == "One & only"


def test_garbage_and_empty_entries_degrade():
    assert parse_feed(b"not xml at all") == []
    assert parse_feed(b"<rss><channel><item><category>x</category>"
                      b"</item></channel></rss>") == []


def test_feed_title_is_before_first_entry_only():
    # an item's own <title> must not leak into feed_title when the
    # channel has none
    rows = parse_feed(b"<rss><channel><item><title>T</title>"
                      b"<guid>g</guid></item></channel></rss>")
    assert rows[0]["feed_title"] is None and rows[0]["title"] == "T"


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-feeds-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_parse_feeds_df(spark):
    from hickoryspark.ops.feeds import parse_feeds_df

    feeds = spark.createDataFrame(
        [("c.test", bytearray(RSS)), ("a.test", bytearray(gzip.compress(ATOM)))],
        "host string, payload binary",
    )
    rows = sorted(
        parse_feeds_df(feeds).collect(),
        key=lambda r: (r["host"], r["entry_pos"]),
    )
    assert [(r["host"], r["kind"], r["title"]) for r in rows] == [
        ("a.test", "atom", "E1"),
        ("a.test", "atom", "E2"),
        ("c.test", "rss", "One & only"),
        ("c.test", "rss", "Two"),
    ]


def test_truncated_gzip_degrades_not_fails():
    import gzip as g

    assert parse_feed(g.compress(RSS)[:20]) == []


def test_sitemap_truncated_gzip_degrades_not_fails():
    import gzip as g

    from hickoryspark.ops.sitemaps import parse_sitemap

    full = g.compress(b"<urlset><url><loc>https://x.test/</loc></url>"
                      b"</urlset>")
    assert parse_sitemap(full)[0]["loc"] == "https://x.test/"
    assert parse_sitemap(full[:15]) == []


def test_corrupt_deflate_body_degrades_not_fails():
    import gzip as g

    from hickoryspark.ops.sitemaps import parse_sitemap

    blob = bytearray(g.compress(RSS))
    blob[12:16] = b"\xff\xfe\xfd\xfc"  # valid header, corrupt DEFLATE
    assert parse_feed(bytes(blob)) == []
    assert parse_sitemap(bytes(blob)) == []


def test_null_payload_rows_skip(spark):
    from hickoryspark.ops.feeds import parse_feeds_df
    from hickoryspark.ops.sitemaps import parse_sitemaps_df

    feeds = spark.createDataFrame(
        [("a.test", None), ("c.test", bytearray(RSS))],
        "host string, payload binary",
    )
    assert parse_feeds_df(feeds).count() == 2  # only c.test's items
    sm = spark.createDataFrame(
        [("a.test", None)], "host string, payload binary"
    )
    assert parse_sitemaps_df(sm).count() == 0


def test_feed_autodiscovery(spark):
    from hickoryspark.ops.feeds import feed_autodiscovery
    from hickoryspark.spark.nodes_table import explode_nodes

    html = (
        '<head>'
        '<link rel="alternate" type="application/rss+xml" href="/feed.xml"'
        ' title="Main">'
        '<link rel="ALTERNATE stylesheet" type=" Application/Atom+XML "'
        ' href="atom.xml">'
        '<link rel="alternate" type="text/html" href="/alt.html">'
        '<link rel="stylesheet" type="application/rss+xml" href="/no.css">'
        '<link rel="alternate" type="application/rss+xml">'
        '</head><body>'
        '<link rel="alternate" type="application/atom+xml" href="/body.xml">'
        '</body>'
    )
    pages = spark.createDataFrame(
        [("https://f.ex/dir/page", html)], "url string, html string")
    rows = sorted(feed_autodiscovery(explode_nodes(pages)).collect(),
                  key=lambda r: r["feed_pos"])
    got = [(r["feed_pos"], r["feed_type"], r["href"], r["resolved"],
            r["title"]) for r in rows]
    assert got == [
        (1, "rss", "/feed.xml", "https://f.ex/feed.xml", "Main"),
        (2, "atom", "atom.xml", "https://f.ex/dir/atom.xml", None),
        (3, "atom", "/body.xml", "https://f.ex/body.xml", None),
    ]
