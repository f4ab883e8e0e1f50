"""Page-type classification (ops/pagetype.py): the five classes
through the real parser, priority order, density arithmetic."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-pagetype-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


PAGES = [
    ("art", b"<html><body><p>" + b"a" * 600
     + b'</p><a href=x>hi</a></body></html>'),
    ("lst", b"<html><body>" + b'<a href=u>li</a>' * 25
     + b"</body></html>"),
    ("frm", b"<html><body><form><input></form>"
     b"<p>fill this</p></body></html>"),
    ("med", b"<html><body>" + b"<img src=i>" * 6
     + b"<p>pics</p></body></html>"),
    ("oth", b"<html><body><p>" + b"b" * 100 + b"</p></body></html>"),
    # priority: a form page that ALSO looks like a listing is 'form'
    ("pri", b"<html><body><form><input></form>"
     + b'<a href=u>li</a>' * 25 + b"</body></html>"),
]


def test_classes(spark):
    from hickoryspark.ops.pagetype import classify_pages
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame(PAGES, "url string, html binary")
    got = {r["url"]: tuple(r)[1:]
           for r in classify_pages(explode_nodes(pages)).collect()}
    # (n_links, n_imgs, n_forms, text_chars, density, page_type)
    assert got["art"] == (1, 0, 0, 602, 3, "article")
    assert got["lst"] == (25, 0, 0, 50, 1000, "listing")
    assert got["frm"] == (0, 0, 1, 9, 0, "form")
    assert got["med"] == (0, 6, 0, 4, 0, "media")
    assert got["oth"] == (0, 0, 0, 100, 0, "other")
    assert got["pri"][5] == "form"
