"""Page metadata extraction (ops/metadata.py): field semantics —
first-in-document-order picks, case-insensitive name/property/rel
matching, title concatenation, lang as-written."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-metadata-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _meta(spark, html, url="https://ex.test/p"):
    from hickoryspark.ops.metadata import page_metadata
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([(url, html)], "url string, html string")
    rows = page_metadata(explode_nodes(pages)).collect()
    assert len(rows) == 1
    return rows[0]


def test_full_head(spark):
    r = _meta(
        spark,
        '<html lang="en-US"><head><meta charset="UTF-8">'
        "<title>Hello</title>"
        '<meta name="Description" content="a page">'
        '<meta property="OG:Title" content="OG Hello">'
        '<meta property="og:description" content="og desc">'
        '<link rel=" stylesheet  CANONICAL" href="https://ex.test/c">'
        "</head><body>x</body></html>",
    )
    assert r["title"] == "Hello"
    assert r["charset"] == "utf-8"  # lowercased label
    assert r["meta_description"] == "a page"  # name matched case-insens.
    assert r["og_title"] == "OG Hello"
    assert r["og_description"] == "og desc"
    assert r["canonical"] == "https://ex.test/c"  # rel token list match
    assert r["html_lang"] == "en-US"  # as written, not normalized
    assert r["n_meta"] == 4


def test_first_in_document_order_wins(spark):
    r = _meta(
        spark,
        '<meta name="description" content="first">'
        '<meta name="description" content="second">'
        '<link rel="canonical" href="/one">'
        '<link rel="canonical" href="/two">'
        '<meta charset="B"><meta charset="A">',
    )
    assert r["meta_description"] == "first"
    assert r["canonical"] == "/one"
    assert r["charset"] == "b"
    assert r["n_meta"] == 4


def test_missing_fields_are_null_and_title_concat(spark):
    r = _meta(spark, "<title>a</title><title>b</title><p>x</p>")
    # the parser's RCDATA rule yields one text child per title;
    # multiple HEAD titles concatenate in document order
    assert r["title"] == "ab"
    for f in ("charset", "meta_description", "og_title",
              "og_description", "canonical", "html_lang"):
        assert r[f] is None
    assert r["n_meta"] == 0


def test_rel_without_canonical_token_not_matched(spark):
    r = _meta(spark, '<link rel="canonicalish" href="/no">'
                     '<link rel="alternate" href="/also-no">')
    assert r["canonical"] is None


def test_meta_without_content_skipped(spark):
    # valueless content must not shadow a later real one (_first
    # excludes null values, not just non-matching rows)
    r = _meta(
        spark,
        '<meta name="description">'
        '<meta name="description" content="real">',
    )
    assert r["meta_description"] == "real"
    assert r["n_meta"] == 2


def test_empty_title_and_pages_without_head(spark):
    r = _meta(spark, "<p>bare body</p>")
    assert r["title"] == "" and r["n_meta"] == 0


def test_one_row_per_url(spark):
    from hickoryspark.ops.metadata import page_metadata
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame(
        [("u1", "<title>t1</title>"), ("u2", "<title>t2</title>")],
        "url string, html string",
    )
    rows = sorted(page_metadata(explode_nodes(pages)).collect(),
                  key=lambda r: r["url"])
    assert [(r["url"], r["title"]) for r in rows] == [("u1", "t1"),
                                                      ("u2", "t2")]


def test_meta_robots_first_as_written_case_insensitive_name(spark):
    r = _meta(
        spark,
        '<meta name="ROBOTS" content="NOINDEX, nofollow">'
        '<meta name="robots" content="all">',
    )
    assert r["meta_robots"] == "NOINDEX, nofollow"
    r2 = _meta(spark, "<title>t</title>")
    assert r2["meta_robots"] is None


def test_svg_and_body_titles_excluded_from_page_title(spark):
    r = _meta(
        spark,
        "<head><title>Home</title></head>"
        "<body><svg><title>Q3 revenue chart</title></svg>"
        "<p>x</p><title>stray</title></body>",
    )
    assert r["title"] == "Home"


def test_meta_robots_flags_parsing(spark):
    from pyspark.sql import functions as F

    from hickoryspark.ops.metadata import meta_robots_flags

    cases = [
        (0, None, False, False),          # absent -> crawler default
        (1, "noindex", True, False),
        (2, " NOFOLLOW ,\tNoIndex ", True, True),
        (3, "none", True, True),
        (4, "index, follow", False, False),
        (5, "", False, False),            # empty content
        (6, ",", False, False),           # empty tokens only
        (7, "noindexx", False, False),    # unknown directive ignored
        (8, "max-snippet:-1, noindex", True, False),
        (9, "\x0bnone\f", True, True),    # full ASCII-ws trim set
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c, *_ in cases], "doc_id long, meta_robots string"
    )
    got = {r["doc_id"]: (r["noindex"], r["nofollow"])
           for r in meta_robots_flags(df).collect()}
    for i, _, ni, nf in cases:
        assert got[i] == (ni, nf), i


def test_canonical_targets_resolution(spark):
    from hickoryspark.ops.metadata import canonical_targets

    cases = [
        # (url, canonical, expected target)
        ("https://M.EX/p/1", None, "https://m.ex/p/1"),
        ("https://m.ex/p/2",
         "HTTPS://M.EX:443/c/9?utm_source=x#f", "https://m.ex/c/9"),
        ("https://m.ex/p/3", "/c/7", "https://m.ex/c/7"),
        ("https://m.ex/p/4", "x/../c/5", "https://m.ex/p/c/5"),
        ("https://m.ex/p/5/", None, "https://m.ex/p/5"),
    ]
    df = spark.createDataFrame(
        [(u, c) for u, c, _ in cases], "url string, canonical string"
    )
    got = {r["url"]: r["canonical_target"]
           for r in canonical_targets(df).collect()}
    for u, _, want in cases:
        assert got[u] == want, (u, got[u])


def test_canonical_clusters_rollup(spark):
    from hickoryspark.ops.metadata import canonical_clusters

    df = spark.createDataFrame(
        [
            ("https://m.ex/a", None),            # self cluster
            ("https://m.ex/b", "/a"),            # joins /a's cluster
            ("https://m.ex/c", "https://x.ex/z"),  # uncrawled target
            ("https://m.ex/d", "https://x.ex/z"),
        ],
        "url string, canonical string",
    )
    rows = {r["canonical_target"]: (r["n_pages"], r["n_self"])
            for r in canonical_clusters(df).collect()}
    assert rows["https://m.ex/a"] == (2, 1)
    assert rows["https://x.ex/z"] == (2, 0)


def test_extract_hreflang(spark):
    from hickoryspark.ops.metadata import extract_hreflang
    from hickoryspark.spark.nodes_table import explode_nodes

    html = (
        "<html><head>"
        "<link rel='alternate' hreflang='en' href='/en/p'>"
        "<link rel='ALTERNATE stylesheet' hreflang='x-default' "
        "href='https://x.ex/'>"
        "<link rel='alternate' href='/no-lang'>"         # no hreflang
        "<link rel='alternate' hreflang='de'>"           # no href
        "<link rel='alternates' hreflang='fr' href='/f'>"  # wrong token
        "</head><body></body></html>"
    )
    pages = spark.createDataFrame([("https://m.ex/p/1", html)],
                                  "url string, html string")
    rows = [r.asDict() for r in
            extract_hreflang(explode_nodes(pages)).orderBy("alt_pos")
            .collect()]
    assert [(r["alt_pos"], r["hreflang"], r["resolved"]) for r in rows] == [
        (1, "en", "https://m.ex/en/p"),
        (2, "x-default", "https://x.ex/"),
    ]
