"""HTML sanitizer (ops/sanitize.py): drop/unwrap/attr/URL policy,
WHATWG-strip scheme bypasses, foreign content, hostile depth
(iterative machine), render well-formedness (idempotence), and the
Spark mapInPandas path."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.sanitize import (  # noqa: E402
    _url_allowed, sanitize_html)

BODY = "<html><head></head><body>%s</body></html>"


def test_drop_script_and_event_handlers():
    out, counts = sanitize_html(
        '<div onclick="x()"><script>evil</script>'
        '<p class=a data-x=1>hi</p><!--c--></div>')
    assert out == BODY % '<div><p class="a">hi</p></div>'
    assert counts == (1, 0, 2, 0)  # script; onclick + data-x


def test_unwrap_unknown_elements():
    out, counts = sanitize_html("<section><p>t</p></section>")
    assert out == BODY % "<p>t</p>"
    assert counts == (0, 1, 0, 0)


def test_url_scheme_blocking():
    out, counts = sanitize_html(
        '<a href="jav\tascript:alert(1)">l</a>'
        '<a href="/rel">r</a>'
        '<a href="  HTTPS://ok.example/#f">k</a>'
        '<a href="mailto:a@b">m</a>'
        '<a href="vbscript:x">v</a>')
    assert out == BODY % (
        '<a>l</a><a href="/rel">r</a>'
        '<a href="  HTTPS://ok.example/#f">k</a>'
        '<a href="mailto:a@b">m</a><a>v</a>')
    assert counts == (0, 0, 0, 2)


def test_data_url_and_img_attrs():
    out, counts = sanitize_html(
        '<p><img src="data:image/png;base64,xx" alt="a" onerror="e">i</p>')
    assert out == BODY % '<p><img alt="a">i</p>'
    assert counts == (0, 0, 1, 1)


def test_relative_colon_paths_allowed():
    # ':' after /?# is not a scheme
    assert _url_allowed("a/b:c")
    assert _url_allowed("?q=x:y")
    assert _url_allowed("#f:g")
    assert _url_allowed("")
    assert not _url_allowed("JaV\nascript:1")
    assert not _url_allowed("data:text/html,x")
    # non-letter scheme head is not relative — blocked
    assert not _url_allowed("1http:x")


def test_foreign_content_unwraps():
    out, counts = sanitize_html(
        "<svg><title>t</title><circle r=1/>txt</svg><math><mi>x</mi></math>")
    # svg-title is a DROP tag; svg/circle/math/mi unwrap
    assert out == BODY % "txtx"
    assert counts == (1, 4, 0, 0)


def test_head_metadata_dropped():
    out, counts = sanitize_html(
        "<head><title>T</title><meta charset=utf-8>"
        "<link rel=stylesheet href=x></head><body>b</body>")
    assert out == BODY % "b"
    assert counts == (3, 0, 0, 0)


def test_table_attrs():
    out, counts = sanitize_html(
        '<table><tr><td colspan=2 style="color:red">c</td></tr></table>')
    assert out == BODY % (
        '<table><tbody><tr><td colspan="2">c</td></tr></tbody></table>')
    assert counts == (0, 0, 1, 0)


def test_hostile_depth_iterative():
    deep = "<section>" * 6000 + "x" + "</section>" * 6000
    out, counts = sanitize_html(deep)
    assert out == BODY % "x"
    assert counts[1] == 6000


def test_idempotent_on_own_output():
    dirty = ('<div onclick=x><script>s</script><custom><p>t</p></custom>'
             '<a href="javascript:1">j</a></div>')
    clean, _ = sanitize_html(dirty)
    again, counts = sanitize_html(clean)
    assert again == clean
    assert counts == (0, 0, 0, 0)


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-sanitize-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_sanitize_pages_df(spark):
    from hickoryspark.ops.sanitize import sanitize_pages

    df = spark.createDataFrame(
        [("u1", "<p onclick=x>a</p>"),
         ("u2", "<script>s</script>ok"),
         ("u3", None)],
        "url string, html string")
    rows = {r["url"]: r for r in sanitize_pages(df).collect()}
    assert set(rows) == {"u1", "u2"}  # NULL html row skipped
    assert rows["u1"]["clean_html"] == BODY % "<p>a</p>"
    assert rows["u1"]["n_dropped_attrs"] == 1
    assert rows["u2"]["clean_html"] == BODY % "ok"
    assert rows["u2"]["n_dropped"] == 1


def test_sanitize_pages_binary(spark):
    from hickoryspark.ops.sanitize import sanitize_pages

    df = spark.createDataFrame(
        [("u1", bytearray("<p>café</p>".encode("utf-8")))],
        "url string, html binary")
    rows = sanitize_pages(df).collect()
    assert rows[0]["clean_html"] == BODY % "<p>café</p>"
