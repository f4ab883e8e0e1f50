"""AI-training / TDM opt-out audit (ops/optout.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-optout-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _meta(spark, pages):
    from hickoryspark.ops.optout import meta_ai_optout
    from hickoryspark.spark.nodes_table import explode_nodes

    df = spark.createDataFrame(pages, "url string, html string")
    return {r["url"]: tuple(r)[1:] for r in
            meta_ai_optout(explode_nodes(df)).collect()}


def _http(spark, rows, agent=None):
    from hickoryspark.ops.optout import http_ai_optout

    df = spark.createDataFrame(rows, "url string, raw string")
    return {r["url"]: tuple(r)[1:] for r in
            http_ai_optout(df, agent=agent).collect()}


def test_meta_side(spark):
    got = _meta(spark, [
        ("a", '<meta name=robots content="NoAI, nosnippet">'),
        ("b", '<meta name="ROBOTS" content="noimageai">'
              '<meta name=robots content="max-snippet: 20">'
              '<meta name=robots content="max-snippet:5">'
              '<meta name=robots content="max-snippet:-1">'),
        ("c", '<meta name=tdm-reservation content=" 1 ">'
              '<meta name=tdm-policy content="https://p.ex/pol">'),
        ("d", '<meta name=tdm-reservation content="0">'),
        ("e", "<p>no carriers</p>"),
    ])
    # (noai, noimageai, nosnippet, noarchive, max_snippet,
    #  tdm_reserved, tdm_policy)
    assert got["a"] == (1, 0, 1, 0, None, 0, None)
    assert got["b"] == (0, 1, 0, 0, 5, 0, None)
    assert got["c"] == (0, 0, 0, 0, None, 1, "https://p.ex/pol")
    assert got["d"] == (0, 0, 0, 0, None, 0, None)
    assert "e" not in got  # no carrier rows at all


def test_http_side_scope_and_tdm(spark):
    head = ("HTTP/1.1 200 OK\r\n{h}\r\n\r\n").format
    got = _http(spark, [
        ("a", head(h="X-Robots-Tag: noai, noarchive")),
        ("b", head(h="X-Robots-Tag: badbot: noai")),     # scoped
        ("c", head(h="TDM-Reservation: 1\r\n"
                     "TDM-Policy: https://p.ex/t")),
        ("d", head(h="X-Robots-Tag: max-snippet:7")),
    ])
    assert got["a"] == (1, 0, 0, 1, None, 0, None)
    assert got["b"] == (0, 0, 0, 0, None, 0, None)
    assert got["c"] == (0, 0, 0, 0, None, 1, "https://p.ex/t")
    assert got["d"] == (0, 0, 0, 0, 7, 0, None)
    scoped = _http(spark, [
        ("b", head(h="X-Robots-Tag: badbot: noai"))], agent="BadBot")
    assert scoped["b"][0] == 1


def test_combined_most_restrictive(spark):
    from hickoryspark.ops.optout import ai_optout
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame(
        [("a", '<meta name=robots content="max-snippet:30">'),
         ("m", '<meta name=robots content="noai">')],
        "url string, html string")
    resp = spark.createDataFrame(
        [("a", "HTTP/1.1 200 OK\r\n"
               "X-Robots-Tag: max-snippet:10\r\n\r\n"),
         ("h", "HTTP/1.1 200 OK\r\nTDM-Reservation: 1\r\n\r\n")],
        "url string, raw string")
    got = {r["url"]: r.asDict() for r in
           ai_optout(explode_nodes(pages), resp).collect()}
    assert got["a"]["max_snippet"] == 10
    assert got["a"]["ai_optout"] == 0
    assert got["m"]["noai"] == 1 and got["m"]["ai_optout"] == 1
    assert got["h"]["tdm_reserved"] == 1 and got["h"]["ai_optout"] == 1
    assert set(got) == {"a", "m", "h"}  # full outer


def test_empty_meta_policy_never_shadows_header(spark):
    from hickoryspark.ops.optout import ai_optout
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame(
        [("a", '<meta name=tdm-policy content="">')],
        "url string, html string")
    resp = spark.createDataFrame(
        [("a", "HTTP/1.1 200 OK\r\n"
               "TDM-Policy: https://p.ex/real\r\n\r\n")],
        "url string, raw string")
    got = ai_optout(explode_nodes(pages), resp).collect()
    assert got[0]["tdm_policy"] == "https://p.ex/real"
