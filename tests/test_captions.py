"""Timed-text extraction (ops/captions.py): track rows (kind enum
defaults, ownership, resolution), WebVTT grammar (header, blocks,
timings, settings, tag strip + named refs), and the Spark paths."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.captions import parse_webvtt  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-captions-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


# ---------------------------------------------------------------- WebVTT

def test_webvtt_minimal():
    cues = parse_webvtt(b"WEBVTT\n\n00:00:01.000 --> 00:00:04.500\nHello")
    assert cues == [{
        "cue_id": None, "start_ms": 1000, "end_ms": 4500,
        "settings": None, "text": "Hello", "plain": "Hello"}]


def test_webvtt_bom_header_meta_id_settings_multiline():
    raw = ("﻿WEBVTT - with meta\nKind: captions\n\n"
           "id7\n01:02:03.004 --> 01:02:03.999 align:start position:10%\n"
           "<v Speaker>Hi &amp; bye\nsecond line\n")
    (c,) = parse_webvtt(raw.encode())
    assert c["cue_id"] == "id7"
    assert c["start_ms"] == 3723004 and c["end_ms"] == 3723999
    assert c["settings"] == "align:start position:10%"
    assert c["text"] == "<v Speaker>Hi &amp; bye\nsecond line"
    assert c["plain"] == "Hi & bye\nsecond line"


def test_webvtt_invalid_header_and_null_like():
    assert parse_webvtt(b"WEBVTTX\n\n00:00:01.000 --> 00:00:02.000\nx") == []
    assert parse_webvtt(b"") == []
    assert parse_webvtt(b"not a vtt") == []
    # WEBVTT followed by a non-ws char on the same line is invalid
    assert parse_webvtt(b"WEBVTT2\n\n00:00:01.000 --> 00:00:02.000\nx") == []


def test_webvtt_skips_note_style_region_and_bad_timings():
    raw = ("WEBVTT\n\nNOTE a comment\nspanning lines\n\n"
           "STYLE\n::cue { color: red }\n\n"
           "REGION\nid:r1\n\n"
           "garbage\nno timing here\n\n"
           "00:60:00.000 --> 00:61:00.000\nminutes out of range\n\n"
           "05:07.123 --> 05:08.000\nhours omitted\n")
    (c,) = parse_webvtt(raw.encode())
    assert c["start_ms"] == 307123 and c["end_ms"] == 308000
    assert c["text"] == "hours omitted"


def test_webvtt_crlf_cr_and_empty_body():
    raw = b"WEBVTT\r\n\r\n00:00:00.000 --> 00:00:01.000\r\n\r\nx\ny\n"
    # blank line ENDS the first cue (empty body); x/y is a new block
    # without a timing line -> skipped
    (c,) = parse_webvtt(raw)
    assert c["text"] == "" and c["plain"] == ""
    raw_cr = b"WEBVTT\r\r00:00:00.000 --> 00:00:01.000\rbody\r"
    (c2,) = parse_webvtt(raw_cr)
    assert c2["text"] == "body"


def test_webvtt_refs_amp_last_and_tag_strip():
    raw = (b"WEBVTT\n\n00:00:00.000 --> 00:00:01.000\n"
           b"&amp;lt; <b>b&lt;old</b> &nbsp;&lrm;&rlm;")
    (c,) = parse_webvtt(raw)
    assert c["plain"] == "&lt; b<old  ‎‏"


def test_webvtt_big_hours_and_timestamp_tags():
    raw = (b"WEBVTT\n\n123:00:00.000 --> 123:00:01.000\n"
           b"a<00:00:00.500>b")
    (c,) = parse_webvtt(raw)
    assert c["start_ms"] == 123 * 3600000
    assert c["plain"] == "ab"


def test_webvtt_df_and_null_payload(spark):
    from hickoryspark.ops.captions import parse_webvtt_df

    df = spark.createDataFrame(
        [("u1", b"WEBVTT\n\n00:00:01.000 --> 00:00:02.000\nA\n\n"
                b"00:00:03.000 --> 00:00:04.000\nB"),
         ("u2", None),
         ("u3", b"broken")],
        "url string, payload binary")
    rows = sorted((r["url"], r["cue_pos"], r["text"])
                  for r in parse_webvtt_df(df).collect())
    assert rows == [("u1", 1, "A"), ("u1", 2, "B")]


# ---------------------------------------------------------------- tracks

def _tracks(spark, html, url="https://t.ex/a/b"):
    from hickoryspark.ops.captions import extract_tracks
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([(url, html)], "url string, html string")
    return sorted(extract_tracks(explode_nodes(pages)).collect(),
                  key=lambda r: r["track_pos"])


def test_track_kinds_owner_and_resolution(spark):
    rows = _tracks(spark, (
        '<video src="/v.mp4" poster="p.jpg">'
        '<track src="/c.vtt" kind="Captions" srclang="en" label="En" default>'
        '<track src="m.vtt" kind="bogus">'
        '<track src="s.vtt">'
        "</video>"
        '<audio src="a.ogg"><track src="au.vtt" kind="chapters"></audio>'
        '<track src="orphan.vtt">'
        "<track kind=captions>"  # srcless: dropped
    ))
    assert [r["kind"] for r in rows] == [
        "captions", "metadata", "subtitles", "chapters", "subtitles"]
    assert rows[0]["srclang"] == "en" and rows[0]["label"] == "En"
    assert rows[0]["is_default"] is True and rows[1]["is_default"] is False
    assert rows[0]["resolved"] == "https://t.ex/c.vtt"
    assert rows[1]["resolved"] == "https://t.ex/a/m.vtt"
    assert [r["owner_tag"] for r in rows] == [
        "video", "video", "video", "audio", None]
    assert rows[0]["owner_src"] == "/v.mp4"
    assert rows[0]["owner_poster"] == "p.jpg"
    assert rows[3]["owner_src"] == "a.ogg" and rows[3]["owner_poster"] is None
    assert rows[4]["owner_src"] is None


def test_track_nested_owner_is_nearest(spark):
    # video inside video cannot nest in HTML parsing? it can: video is
    # not a special element — the inner one is the nearest encloser
    rows = _tracks(spark, (
        '<video src="outer.mp4"><div>'
        '<video src="inner.mp4"><track src="t.vtt"></video>'
        "</div></video>"
    ))
    assert len(rows) == 1 and rows[0]["owner_src"] == "inner.mp4"
