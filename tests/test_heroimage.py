"""Hero image selection (ops/heroimage.py): carrier priority,
first-in-doc-order picks, sized-img rule, no-carrier pages."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-hero-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


PAGES = [
    # og beats everything, first og wins
    ("p1", b'<html><head><meta property="og:image" content="og1.png">'
           b'<meta property="OG:IMAGE" content="og2.png"></head>'
           b'<body><img src=big.png width=500 height=400>'
           b"</body></html>"),
    # legacy link rel=image_src beats imgs
    ("p2", b'<html><head><link rel=image_src href="l.png"></head>'
           b'<body><img src=x.png width=500 height=500></body></html>'),
    # sized img beats the earlier small one
    ("p3", b'<html><body><img src=icon.png width=16 height=16>'
           b'<img src=photo.jpg width="640px" height=480>'
           b"</body></html>"),
    # only unsized imgs: first wins
    ("p4", b'<html><body><img src=a.png><img src=b.png></body></html>'),
    # no carriers: no row
    ("p5", b"<html><body><p>text only</p></body></html>"),
]


def test_hero(spark):
    from hickoryspark.ops.heroimage import hero_images
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame(PAGES, "url string, html binary")
    got = {r["url"]: (r["hero_src"], r["hero_source"])
           for r in hero_images(explode_nodes(pages)).collect()}
    assert got == {
        "p1": ("og1.png", "og"),
        "p2": ("l.png", "link"),
        "p3": ("photo.jpg", "sized_img"),
        "p4": ("a.png", "first_img"),
    }
