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


# ---------------------------------------------------------------------------
# In-text date mentions (ops/dates.date_mentions)


def test_date_mentions_validity_and_normalization(spark):
    from hickoryspark.ops.dates import date_mentions

    df = spark.createDataFrame(
        [
            (0,
             "met 2024-03-15 then 2023-02-29 and January 31, 1999 "
             "also 2024-13-01 plus February 29, 2024 x2024-01-01 "
             "end 2024-04-31 twice 2024-03-15"),
            (1, "April 31, 2024 nothing else"),
            (2, "no dates here at all"),
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["raw"], r["iso"])
        for r in date_mentions(df).collect()
    )
    assert rows == [
        (0, "2024-03-15", "2024-03-15"),   # valid ISO, twice
        (0, "2024-03-15", "2024-03-15"),
        (0, "February 29, 2024", "2024-02-29"),  # leap year OK
        (0, "January 31, 1999", "1999-01-31"),
    ]
    # dropped: 2023-02-29 (non-leap), 2024-13-01 (month), 2024-04-31
    # (April has 30), x2024-01-01 (no boundary), April 31 long form


def test_date_mentions_mirror_matches(spark):
    import duckdb

    from hickoryspark.ops.dates import (
        MENTION_ISO_RE, MENTION_LONG_RE, date_mentions)

    rows = [
        (0, "on 2000-02-29 and 1900-02-29 or December 1, 0400 "
            "and May 05, 2024"),
        (1, "2024-01-01 2024-01-02"),  # adjacent matches both found
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in date_mentions(df).collect())
    # 1900-02-29 invalid (century non-leap); 2000-02-29 valid (400)
    assert (0, "1900-02-29", "1900-02-29") not in got
    assert (0, "2000-02-29", "2000-02-29") in got
    assert (1, "2024-01-01", "2024-01-01") in got
    assert (1, "2024-01-02", "2024-01-02") in got
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    # the RE2 side sees the same matches (regex-subset contract)
    n_iso = con.execute(
        "SELECT SUM(len(regexp_extract_all(text, ?, 0))) FROM d",
        [MENTION_ISO_RE],
    ).fetchone()[0]
    n_long = con.execute(
        "SELECT SUM(len(regexp_extract_all(text, ?, 0))) FROM d",
        [MENTION_LONG_RE],
    ).fetchone()[0]
    assert n_iso == 4 and n_long == 2  # raw matches before validity


def test_cal_valid_fuzz_vs_python_datetime(spark):
    # INDEPENDENT oracle: Python's datetime constructor is the
    # calendar authority; _cal_valid must agree on every (y, m, d)
    from datetime import date

    from pyspark.sql import functions as F

    from hickoryspark.ops.dates import _cal_valid

    import random

    rng = random.Random(42)
    cases = [(rng.randint(1583, 2400), rng.randint(0, 13),
              rng.randint(0, 32)) for _ in range(300)]
    cases += [(2000, 2, 29), (1900, 2, 29), (2400, 2, 29), (2023, 2, 29),
              (2024, 4, 31), (2024, 12, 31), (2024, 1, 0), (2024, 13, 1)]
    df = spark.createDataFrame(cases, "y int, m int, d int").withColumn(
        "ok", _cal_valid(F.col("y"), F.col("m"), F.col("d"))
    )
    for r in df.collect():
        try:
            date(r["y"], r["m"], r["d"])
            want = True
        except ValueError:
            want = False
        assert r["ok"] == want, (r["y"], r["m"], r["d"])
