"""Sitemap parsing (ops/sitemaps.py): urlset/sitemapindex shapes, gzip
payloads, entity unescaping, mandatory loc."""

from __future__ import annotations

import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.sitemaps import parse_sitemap

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://ex.test/a?x=1&amp;y=2</loc>
    <lastmod>2025-07-01</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://ex.test/b</loc></url>
  <url><lastmod>2025-07-02</lastmod></url>
  <url><loc>https://ex.test/c</loc><priority>not-a-number</priority></url>
</urlset>"""

INDEX = b"""<sitemapindex>
  <sitemap><loc>https://ex.test/sitemap1.xml</loc>
    <lastmod>2025-01-01</lastmod></sitemap>
  <sitemap><loc>https://ex.test/sitemap2.xml.gz</loc></sitemap>
</sitemapindex>"""


def test_urlset_fields_and_unescaping():
    es = parse_sitemap(URLSET)
    # the loc-less entry is dropped; positions stay contiguous
    assert [e["loc"] for e in es] == [
        "https://ex.test/a?x=1&y=2",  # &amp; unescaped
        "https://ex.test/b",
        "https://ex.test/c",
    ]
    assert [e["entry_pos"] for e in es] == [1, 2, 3]
    assert es[0]["lastmod"] == "2025-07-01"
    assert es[0]["changefreq"] == "daily"
    assert es[0]["priority"] == 0.8
    assert es[1]["lastmod"] is None and es[1]["priority"] is None
    assert es[2]["priority"] is None  # malformed number -> NULL
    assert all(e["is_index"] is False for e in es)


def test_sitemapindex_rows():
    es = parse_sitemap(INDEX)
    assert [e["loc"] for e in es] == [
        "https://ex.test/sitemap1.xml",
        "https://ex.test/sitemap2.xml.gz",
    ]
    assert all(e["is_index"] is True for e in es)
    assert es[0]["lastmod"] == "2025-01-01"


def test_gzip_payload():
    assert parse_sitemap(gzip.compress(URLSET)) == parse_sitemap(URLSET)


def test_garbage_payload_yields_no_entries():
    assert parse_sitemap(b"\x00\xffnot xml at all") == []
    assert parse_sitemap(b"<urlset></urlset>") == []


def test_numeric_character_references():
    xml = (b"<urlset><url><loc>https://ex.test/a&#47;b?x=1&#38;y=2"
           b"&#x2F;z</loc></url></urlset>")
    es = parse_sitemap(xml)
    assert es[0]["loc"] == "https://ex.test/a/b?x=1&y=2/z"
    # out-of-range reference stays as written, no crash
    assert parse_sitemap(
        b"<urlset><url><loc>/a&#1114112;</loc></url></urlset>"
    )[0]["loc"] == "/a&#1114112;"


def test_surrogate_character_reference_stays_as_written():
    # advice repro: '&#xD800;' must NOT become a lone surrogate (Arrow
    # rejects surrogates when serializing the task output) — XML
    # prohibits surrogate charrefs, so the entity stays literal
    es = parse_sitemap(
        b"<urlset><url><loc>/a&#xD800;b&#55296;c</loc></url></urlset>"
    )
    assert es[0]["loc"] == "/a&#xD800;b&#55296;c"
    es[0]["loc"].encode("utf-8")  # would raise on a lone surrogate


def test_surrogate_payload_survives_spark_arrow_path():
    # the actual advice failure mode was Arrow serialization of the
    # mapInPandas TASK OUTPUT — so the hostile payload must round-trip
    # through parse_sitemaps_df on a real session, not just the
    # driver-side parser (a review pass flagged the earlier version of
    # this test for claiming end-to-end coverage it didn't have)
    from hickoryspark.ops.sitemaps import parse_sitemaps_df
    from hickoryspark.spark.session import get_spark

    spark = get_spark(2, shuffle_partitions=2)
    df = spark.createDataFrame(
        [("ex.test",
          b"<urlset><url><loc>/a&#xD800;b&#55296;c</loc></url></urlset>")],
        "host string, payload binary",
    )
    rows = parse_sitemaps_df(df).collect()
    assert [r["loc"] for r in rows] == ["/a&#xD800;b&#55296;c"]
