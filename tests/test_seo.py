"""SEO audit (ops/seo.py): bands, first-H1 pick, Jaccard overlap,
canonical self rule, missing-everything page."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-seo-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


PAGES = [
    # all four checks pass; overlap {Big,Data,Guide}∩{Big,Data,Guide,9}
    ("p1", b'<html><head><title>Big Data Guide 9</title>'
           b'<meta name=description content="'
           + b"x" * 60 + b'">'
           b'<link rel=canonical href="p1"></head>'
           b'<body><h1>Big Data Guide</h1></body></html>'),
    # nothing present
    ("p2", b'<html><body><p>bare</p></body></html>'),
    # every check fails; FIRST h1 ("One") drives the overlap
    ("p3", b'<html><head><title>Hi</title>'
           b'<meta name=description content="short">'
           b'<link rel=canonical href="elsewhere"></head>'
           b'<body><h1>One</h1><h1>Two</h1></body></html>'),
]


def test_audit(spark):
    from hickoryspark.ops.seo import seo_audit
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame(PAGES, "url string, html binary")
    got = {r["url"]: tuple(r)[1:]
           for r in seo_audit(explode_nodes(pages)).collect()}
    # (title_len, desc_len, n_h1, canonical_self, overlap, n_issues)
    assert got["p1"] == (16, 60, 1, 1, 750, 0)
    assert got["p2"] == (0, 0, 0, 0, 0, 4)
    assert got["p3"] == (2, 5, 2, 0, 0, 4)
