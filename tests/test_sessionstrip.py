"""Session-id stripping (ops/urls.strip_session_params): path and
query forms, case variants, anchoring (userid survives), separator
cleanup, mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.urls import duckdb_strip_session_sql  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-sess-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


CASES = [
    ("http://x/p;jsessionid=A1B2!x/next?q=1",
     "http://x/p/next?q=1"),
    ("http://x/p;JSESSIONID=abc", "http://x/p"),
    ("http://x/p?PHPSESSID=9&q=1", "http://x/p?q=1"),
    ("http://x/p?q=1&sid=22", "http://x/p?q=1"),
    ("http://x/p?sid=1&SID=2&q=2", "http://x/p?q=2"),
    ("http://x/p?ASPSESSIONIDQGGGQC=x&a=1", "http://x/p?a=1"),
    ("http://x/p?userid=7&residue=1", "http://x/p?userid=7&residue=1"),
    ("http://x/p?sessionid=5", "http://x/p"),
    ("http://x/p?sid=1", "http://x/p"),
    ("http://x/plain", "http://x/plain"),
]


def test_cases(spark):
    from hickoryspark.ops.urls import strip_session_params

    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r[0] for r in
           df.select(strip_session_params("url")).collect()]
    assert got == [w for _, w in CASES]


def test_mirror_agreement(spark):
    con = duckdb.connect()
    vals = ", ".join(f"('{u}')" for u, _ in CASES)
    rows = con.execute(
        f"SELECT {duckdb_strip_session_sql('u')} FROM "
        f"(VALUES {vals}) v(u)").fetchall()
    assert [r[0] for r in rows] == [w for _, w in CASES]
