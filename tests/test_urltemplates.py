"""URL template mining tests (ops/urltemplates.py)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.urltemplates import (duckdb_url_template_sql,
                                           url_template_signature,
                                           url_templates)


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-urltpl-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


CASES = [
    ("https://s.ex/product/123/view", "s.ex/product/{d}/view"),
    ("https://s.ex/art/deadbeefcafe1234", "s.ex/art/{x}"),
    ("https://s.ex/art/DEADBEEFCAFE1234", "s.ex/art/{x}"),  # lowered
    ("https://s.ex/art/deadbe", "s.ex/art/deadbe"),         # <8 hex
    ("https://s.ex/page12.html", "s.ex/page{n}.html"),
    ("https://s.ex/a//b/", "s.ex/a/b"),                     # empties drop
    ("https://S.EX./x?b=2&a=1&a=3", "s.ex/x?a,a,b"),        # names sorted
    ("https://s.ex/x?flag", "s.ex/x?flag"),                 # bare param
    ("https://s.ex/", "s.ex/"),
    ("rel/7", "/rel/{d}"),                                  # no authority
]


def test_signature_pinned_cases(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r["s"] for r in
           df.select(url_template_signature(F.col("url")).alias("s"))
           .collect()]
    assert got == [want for _, want in CASES]


def test_signature_duckdb_mirror(spark):
    con = duckdb.connect()
    for u, want in CASES:
        got = con.execute(
            "WITH t(u) AS (VALUES (?::VARCHAR)) SELECT "
            + duckdb_url_template_sql("u") + " FROM t", [u]
        ).fetchone()[0]
        assert got == want, (u, got, want)


def test_rollup_counts_and_trap_flags(spark):
    urls = (
        [(f"https://t.ex/cal/2026/{i % 12}",) for i in range(40)]
        + [(f"https://t.ex/about",) for _ in range(40)]
        + [("https://t.ex/faq",)]
    )
    df = spark.createDataFrame(urls, "url string")
    got = {r["signature"]: r for r in
           url_templates(df, trap_min_urls=30).collect()}
    cal = got["t.ex/cal/{d}/{d}"]
    assert cal["n_urls"] == 40 and cal["n_distinct_urls"] == 12
    assert cal["is_variable"] and cal["is_trap"]
    about = got["t.ex/about"]
    assert about["n_urls"] == 40 and not about["is_variable"]
    assert not about["is_trap"]          # big but static: not a trap
    assert not got["t.ex/faq"]["is_trap"]


def test_query_signature_counts_as_variable(spark):
    df = spark.createDataFrame(
        [(f"https://t.ex/search?q=x{i}",) for i in range(5)],
        "url string")
    r = url_templates(df, trap_min_urls=5).collect()[0]
    assert r["signature"] == "t.ex/search?q"
    assert r["is_variable"] and r["is_trap"]
