"""Image dimension sniffing (ops/imagemeta.py): fixed-offset header
parses for PNG/GIF/BMP, truncation and NULL handling."""

from __future__ import annotations

import os
import struct
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-imagemeta-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h))


def _gif(w, h, ver=b"89a"):
    return b"GIF" + ver + struct.pack("<HH", w, h)


def _bmp(w, h):
    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h)


def _dims(spark, payloads):
    from hickoryspark.ops.imagemeta import image_dims

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)],
        "doc_id long, payload binary")
    out = image_dims(df).orderBy("doc_id")
    return [(r["format"], r["width"], r["height"]) for r in out.collect()]


def test_png_gif_bmp_dims(spark):
    got = _dims(spark, [
        _png(800, 600),
        _gif(320, 200),
        _gif(16, 9, ver=b"87a"),
        _bmp(1024, 768),
    ])
    assert got == [("png", 800, 600), ("gif", 320, 200),
                   ("gif", 16, 9), ("bmp", 1024, 768)]


def test_bmp_negative_height_is_absolute(spark):
    got = _dims(spark, [_bmp(640, -480)])
    assert got == [("bmp", 640, 480)]


def test_large_png_dims_not_sign_bent(spark):
    # width > 2^15 exercises the u32 conv path, not a short cast
    got = _dims(spark, [_png(70000, 3)])
    assert got == [("png", 70000, 3)]


def test_truncated_header_yields_null_format(spark):
    got = _dims(spark, [
        _png(8, 8)[:20],        # signature ok, header short
        _gif(5, 5)[:9],
        _bmp(5, 5)[:25],
        b"\x00" * 30,           # unknown magic
        b"",
    ])
    assert got == [(None, None, None)] * 5


def test_null_payload(spark):
    from hickoryspark.ops.imagemeta import image_dims

    df = spark.createDataFrame([(1, None)], "doc_id long, payload binary")
    r = image_dims(df).collect()[0]
    assert (r["format"], r["width"], r["height"]) == (None, None, None)
