"""Plain-text URL harvesting (ops/texturls.py): match/trim rules,
canonical composition, mentions rollup, DuckDB mirror agreement, and
the shuffle-free plan shape of the harvest itself."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.texturls import (  # noqa: E402
    duckdb_harvest_sql,
    duckdb_mentions_sql,
)


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-texturls-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


TEXTS = [
    "Visit http://Example.COM/a/../b?q=1. thanks",          # fold + trim
    "wrapped (https://sub.site.org:443/path/) end",          # port+slash
    "no links here at all",                                  # zero rows
    "two http://h.net/x,y and HTTPS://H.NET/x#frag! done",   # comma kept
    "tab splits http://t.io/a\tb and quote \"http://q.io/z\"",
    "trailing run http://p.io/a)].,;:!?'\" next",            # full trim set
    "bare scheme http:// only",                              # empty rest
]


def _spark_rows(spark, texts):
    from hickoryspark.ops.texturls import harvest_urls

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    return sorted(
        (r["doc_id"], r["pos"], r["url"], r["norm_url"], r["host"])
        for r in harvest_urls(df).collect())


def _duck_rows(texts, sql_fn=duckdb_harvest_sql, cols=5):
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, '" + t.replace("'", "''") + "')"
        for i, t in enumerate(texts))
    rel = f"(SELECT * FROM (VALUES {vals}) AS v(doc_id, text)) src"
    return sorted(tuple(r[:cols]) for r in
                  con.execute(sql_fn(rel)).fetchall())


def test_match_and_trim(spark):
    rows = _spark_rows(spark, TEXTS)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r[0], []).append(r)
    # doc 0: dot-segment folded, trailing '.' trimmed, host lowercased
    assert by_doc[0][0][2] == "http://Example.COM/a/../b?q=1"
    assert by_doc[0][0][3] == "http://example.com/b?q=1"
    assert by_doc[0][0][4] == "example.com"
    # doc 2: no rows
    assert 2 not in by_doc
    # doc 3: comma survives inside the run; both case forms match
    assert [r[2] for r in by_doc[3]] == [
        "http://h.net/x,y", "HTTPS://H.NET/x#frag"]
    assert by_doc[3][0][1] == 1 and by_doc[3][1][1] == 2
    # doc 4: tab terminates the match; quote terminates the match
    assert [r[2] for r in by_doc[4]] == ["http://t.io/a", "http://q.io/z"]
    # doc 5: the whole trailing punctuation run is stripped
    assert by_doc[5][0][2] == "http://p.io/a"


def test_mirror_agreement(spark):
    assert _spark_rows(spark, TEXTS) == _duck_rows(TEXTS)


def test_mentions_rollup(spark):
    from hickoryspark.ops.texturls import harvest_urls, url_mentions

    texts = [
        "a http://x.io/p and http://x.io/p/ again",
        "b http://x.io/p. end",
        "c http://y.io/q only",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    got = sorted(
        (r["norm_url"], r["n_mentions"], r["n_docs"], r["first_doc"])
        for r in url_mentions(harvest_urls(df)).collect())
    # trailing-slash normalization merges the doc-0 pair
    assert got == [("http://x.io/p", 3, 2, 0), ("http://y.io/q", 1, 1, 2)]

    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, '" + t.replace("'", "''") + "')"
        for i, t in enumerate(texts))
    rel = f"(SELECT * FROM (VALUES {vals}) AS v(doc_id, text)) src"
    want = sorted(tuple(r) for r in
                  con.execute(duckdb_mentions_sql(rel)).fetchall())
    assert got == want


def test_harvest_plan_shuffle_free(spark):
    from hickoryspark.ops.texturls import harvest_urls

    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string")
    plan = harvest_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" in plan  # the posexplode
