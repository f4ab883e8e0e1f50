"""Image/media-text pair extraction (ops/media.py): src resolution,
srcset parsing, dimensions, figure/figcaption captions."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-media-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _rows(spark, html, url="https://m.ex/p/1"):
    from hickoryspark.ops.media import extract_images
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([(url, html)], "url string, html string")
    out = extract_images(explode_nodes(pages)).orderBy("media_pos")
    return [r.asDict() for r in out.collect()]


def test_img_with_figure_caption(spark):
    rows = _rows(
        spark,
        "<figure><img src='/i/1.jpg' alt='a pic'>"
        "<figcaption>Cap <b>one</b></figcaption></figure>",
    )
    assert len(rows) == 1
    r = rows[0]
    assert r["tag"] == "img" and r["media_pos"] == 1
    assert r["resolved"] == "https://m.ex/i/1.jpg"
    assert r["alt"] == "a pic"
    assert r["caption"] == "Cap one"


def test_nearest_figure_owns_and_no_figure_is_null(spark):
    rows = _rows(
        spark,
        "<figure><figcaption>outer</figcaption>"
        "<figure><figcaption>inner</figcaption>"
        "<img src='x.png'></figure></figure>"
        "<img src='y.png'>",
    )
    assert rows[0]["caption"] == "inner"   # nearest figure, not outer
    assert rows[1]["caption"] is None      # no enclosing figure


def test_srcset_candidates_and_dimensions(spark):
    rows = _rows(
        spark,
        '<img srcset=" /a.jpg 1x ,/b.jpg 2x, ,/c.jpg " '
        'width="640" height="20px">',
    )
    r = rows[0]
    assert r["src"] is None and r["resolved"] is None
    assert r["srcset"] == "/a.jpg|/b.jpg|/c.jpg"
    assert r["width"] == 640
    assert r["height"] == 20              # leading digit run of '20px'


def test_height_garbage_is_null_and_empty_alt_kept(spark):
    rows = _rows(spark, "<img src='i.gif' alt='' height='tall'>")
    r = rows[0]
    assert r["alt"] == "" and r["height"] is None and r["width"] is None


def test_video_audio_source_rows_in_doc_order(spark):
    rows = _rows(
        spark,
        "<video src='v.mp4'><source srcset='s.webm'></video>"
        "<audio src='../a.ogg'></audio><source>",
    )
    assert [(r["media_pos"], r["tag"]) for r in rows] == [
        (1, "video"), (2, "source"), (3, "audio")]
    assert rows[2]["resolved"] == "https://m.ex/a.ogg"  # dot-segment fold
    # the bare <source> with neither src nor srcset emits no row


def test_dedup_nested_figcaption_text_once(spark):
    # a figcaption inside a figcaption: its text must count ONCE
    rows = _rows(
        spark,
        "<figure><img src='p.png'><figcaption>a"
        "<figcaption>b</figcaption></figcaption></figure>",
    )
    assert rows[0]["caption"] == "ab"


def test_multiple_pages_positions_are_per_page(spark):
    from hickoryspark.ops.media import extract_images
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame(
        [("u1", "<img src='a.png'><img src='b.png'>"),
         ("u2", "<img src='c.png'>")],
        "url string, html string",
    )
    got = {(r["url"], r["media_pos"]): r["src"] for r in
           extract_images(explode_nodes(pages)).collect()}
    assert got == {("u1", 1): "a.png", ("u1", 2): "b.png",
                   ("u2", 1): "c.png"}


def test_srcset_only_video_audio_excluded(spark):
    # review fix: srcset qualifies only img/source (the pinned
    # semantics) — a srcset-only <video> emits no row and must not
    # shift media_pos of later elements
    rows = _rows(spark,
                 "<video srcset='v.webm'></video><img src='a.png'>")
    assert [(r["media_pos"], r["tag"]) for r in rows] == [(1, "img")]
