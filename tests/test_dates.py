"""Publication-date extraction (ops/dates.py): carrier priority,
invalid fall-through, document order, URL fallback forms."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-dates-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, pages):
    from hickoryspark.ops.dates import publish_dates
    from hickoryspark.spark.nodes_table import explode_nodes

    df = spark.createDataFrame(pages, "url string, html string")
    nodes = explode_nodes(df.selectExpr(
        "url", "CAST(html AS BINARY) AS html"))
    return {r["url"]: (r["published"], r["date_source"])
            for r in publish_dates(nodes).collect()}


META = '<meta property="article:published_time" content="2024-03-05T10:00:00Z">'
LD = ('<script type="application/ld+json">'
      '{"@type":"Article","datePublished":"2023-11-30"}</script>')
TIME = '<time datetime="2022-01-02T08:00:00">x</time>'


def _page(head="", body=""):
    return f"<html><head><title>t</title>{head}</head><body>{body}</body></html>"


def test_meta_beats_jsonld_beats_time(spark):
    out = _run(spark, [
        ("u1", _page(head=META + LD, body=TIME)),
        ("u2", _page(head=LD, body=TIME)),
        ("u3", _page(body=TIME)),
    ])
    assert out["u1"] == ("2024-03-05", "meta")
    assert out["u2"] == ("2023-11-30", "jsonld")
    assert out["u3"] == ("2022-01-02", "time")


def test_invalid_higher_priority_falls_through(spark):
    bad = '<meta property="article:published_time" content="yesterday">'
    out = _run(spark, [("u", _page(head=bad, body=TIME))])
    assert out["u"] == ("2022-01-02", "time")


def test_first_in_document_order_within_priority(spark):
    out = _run(spark, [(
        "u",
        _page(body='<time datetime="2020-05-06">a</time>'
                   '<time datetime="2021-07-08">b</time>'),
    )])
    assert out["u"] == ("2020-05-06", "time")


def test_implausible_month_day_rejected(spark):
    out = _run(spark, [
        ("u1", _page(body='<time datetime="2020-13-01">x</time>')),
        ("u2", _page(body='<time datetime="2020-12-32">x</time>')),
        ("u3", _page(body='<time datetime="2020-12-31">x</time>')),
    ])
    assert out["u1"] == (None, "")
    assert out["u2"] == (None, "")
    assert out["u3"] == ("2020-12-31", "time")


def test_url_fallback_forms(spark):
    out = _run(spark, [
        ("https://b.ex/2021/07/15/post", _page()),
        ("https://b.ex/2021/07/post", _page()),
        ("https://b.ex/archive/2021/13/x", _page()),
        ("https://b.ex/plain", _page()),
        ("https://b.ex/1899/07/15/x", _page()),
    ])
    assert out["https://b.ex/2021/07/15/post"] == ("2021-07-15", "url")
    assert out["https://b.ex/2021/07/post"] == ("2021-07-01", "url")
    assert out["https://b.ex/archive/2021/13/x"] == (None, "")
    assert out["https://b.ex/plain"] == (None, "")
    assert out["https://b.ex/1899/07/15/x"] == (None, "")


def test_markup_beats_url_fallback(spark):
    out = _run(spark, [("https://b.ex/2021/07/15/p", _page(body=TIME))])
    assert out["https://b.ex/2021/07/15/p"] == ("2022-01-02", "time")


def test_whitespace_trim_and_malformed_json(spark):
    out = _run(spark, [
        ("u1", _page(body='<time datetime="  2020-01-02  ">x</time>')),
        ("u2", _page(head='<script type="application/ld+json">'
                          '{not json</script>')),
    ])
    assert out["u1"] == ("2020-01-02", "time")
    assert out["u2"] == (None, "")


def test_every_url_keeps_a_row(spark):
    out = _run(spark, [("u1", _page()), ("u2", "<p>bare</p>")])
    assert set(out) == {"u1", "u2"}


def test_url_date_with_query_or_fragment_terminator(spark):
    # review regression: a day segment followed by '?' or '#' must
    # keep its day (not silently degrade to day 01)
    out = _run(spark, [
        ("https://b.ex/2021/07/15?utm_source=x", _page()),
        ("https://b.ex/2021/07/15#frag", _page()),
        ("https://b.ex/2021/07?x=1", _page()),
        ("https://b.ex/2021/07/159abc", _page()),
    ])
    assert out["https://b.ex/2021/07/15?utm_source=x"] == ("2021-07-15", "url")
    assert out["https://b.ex/2021/07/15#frag"] == ("2021-07-15", "url")
    assert out["https://b.ex/2021/07?x=1"] == ("2021-07-01", "url")
    assert out["https://b.ex/2021/07/159abc"] == ("2021-07-01", "url")
