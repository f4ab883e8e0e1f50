"""WHATWG MIME sniffing (ops/mime.py): magic-number table, whitespace
skip + case-insensitive tag matching, RIFF family discrimination,
text/plain vs octet-stream fallback, and the no-shuffle plan shape."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-mime-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


CASES = [
    (b"\t \n<!DOCTYPE html><html>", "text/html"),
    (b"<HtMl><head>", "text/html"),
    (b"   <h1>Title", "text/html"),          # ws-skip + tag-terminator 0x20
    (b"<!-- comment -->", "text/html"),
    (b"<htmlx>", "text/plain"),               # no tag terminator -> fallback
    (b'<?xml version="1.0"?>', "text/xml"),
    (b"%PDF-1.7\nstream", "application/pdf"),
    (b"%!PS-Adobe-3.0", "application/postscript"),
    (b"\xfe\xff\x00h\x00i", "text/plain"),    # UTF-16BE BOM beats binary-byte check
    (b"\xef\xbb\xbfhello", "text/plain"),
    (b"\x00\x00\x01\x00\x01\x00", "image/x-icon"),
    (b"BM\x36\x00", "image/bmp"),
    (b"GIF89a\x01\x00", "image/gif"),
    (b"RIFF\x12\x34\x56\x78WEBPVP8 ", "image/webp"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff\xe0JFIF", "image/jpeg"),
    (b".snd\x00\x00", "audio/basic"),
    (b"FORM\x00\x00\x00\x20AIFF", "audio/aiff"),
    (b"ID3\x03\x00", "audio/mpeg"),
    (b"OggS\x00\x02", "application/ogg"),
    (b"MThd\x00\x00\x00\x06", "audio/midi"),
    (b"RIFF\x00\x00\x00\x00AVI LIST", "video/avi"),
    (b"RIFF\x24\x00\x00\x00WAVEfmt ", "audio/wave"),
    (b"\x00\x00\x00\x18ftypmp42", "video/mp4"),
    (b"\x00\x00\x00\x18ftypisom", "application/octet-stream"),  # brand not mp4*
    (b"\x1f\x8b\x08\x00", "application/x-gzip"),
    (b"PK\x03\x04", "application/zip"),
    (b"Rar \x1a\x07\x00", "application/x-rar-compressed"),
    (b"Rar!\x1a\x07\x00", "application/x-rar-compressed"),  # real-world magic
    (b"just some words\nand more", "text/plain"),
    (b"text with a nul\x00inside", "application/octet-stream"),
    (b"esc byte \x1b ok", "text/plain"),      # 0x1B is NOT a binary data byte
    (b"bell byte \x07 bad", "application/octet-stream"),
    (b"", "text/plain"),                      # empty header: no binary bytes
]


def test_sniff_table(spark):
    from hickoryspark.ops.mime import sniff_df

    df = spark.createDataFrame(
        [(i, payload) for i, (payload, _) in enumerate(CASES)],
        "id long, payload binary",
    )
    got = {r["id"]: r["mime"] for r in sniff_df(df).collect()}
    for i, (payload, want) in enumerate(CASES):
        assert got[i] == want, f"case {i} ({payload[:16]!r}): {got[i]} != {want}"


def test_sniff_null_payload_is_null(spark):
    """A failed fetch (payload NULL) must sniff to NULL, not
    text/plain (regression: every when() was NULL and fell through
    to the fallback otherwise)."""
    from hickoryspark.ops.mime import sniff_df

    df = spark.createDataFrame(
        [(1, None), (2, b"GIF89a")], "id long, payload binary"
    )
    got = {r["id"]: r["mime"] for r in sniff_df(df).collect()}
    assert got[1] is None and got[2] == "image/gif"


def test_sniff_header_bound_and_late_magic(spark):
    """Magic past the header window must NOT match; binary bytes past
    it must not flip the fallback."""
    from pyspark.sql import functions as F

    from hickoryspark.ops.mime import sniff_mime

    df = spark.createDataFrame(
        [
            (1, b" " * 600 + b"<html>"),       # tag past 512-byte header
            (2, b"a" * 512 + b"\x00"),          # nul past header
        ],
        "id long, payload binary",
    )
    got = {
        r["id"]: r["m"]
        for r in df.select("id", sniff_mime(F.col("payload")).alias("m")).collect()
    }
    assert got[1] == "text/plain"
    assert got[2] == "text/plain"


def test_sniff_plan_shuffle_free(spark):
    """The classifier is a pure map: no Exchange in the executed plan."""
    from hickoryspark.ops.mime import sniff_df

    df = spark.createDataFrame(
        [(1, b"GIF89a")], "id long, payload binary"
    )
    out = sniff_df(df)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
