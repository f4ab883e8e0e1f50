"""Cross-host syndication detection (ops/syndication.py)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-syndication-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


PAGES = [
    ("https://a.ex/1", "story one"),
    ("https://b.ex/1", "story one"),     # cross-host copy
    ("https://a.ex/2", "story two"),
    ("https://a.ex/3", "story two"),     # same-host dup only
    ("https://c.ex/x", "unique text"),   # singleton -> dropped
    ("https://A.EX:443/9", "story one"),  # host folds to a.ex
]


def _groups(spark, pages):
    from hickoryspark.ops.syndication import cross_host_duplicates

    df = spark.createDataFrame(pages, "url string, text string")
    return sorted(tuple(r)[1:] for r in
                  cross_host_duplicates(df).collect())


def test_groups_hosts_and_flags(spark):
    got = _groups(spark, PAGES)
    # 'story one': 3 copies, hosts {a.ex, b.ex} (the :443 uppercase
    # variant folds into a.ex) -> syndicated; 'story two': 2 copies,
    # 1 host -> not syndicated
    assert got == sorted([
        (3, 2, "https://A.EX:443/9", 1),
        (2, 1, "https://a.ex/2", 0),
    ])


def test_duckdb_mirror_agrees(spark):
    from hickoryspark.ops.syndication import duckdb_syndication_sql

    got = sorted(
        tuple(r) for r in __import__("hickoryspark.ops.syndication",
                                     fromlist=["x"])
        .cross_host_duplicates(
            spark.createDataFrame(PAGES, "url string, text string"))
        .collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p AS SELECT * FROM (VALUES "
        + ",".join("('%s', '%s')" % r for r in PAGES)
        + ") t(url, text)")
    want = sorted(tuple(r) for r in con.execute(
        duckdb_syndication_sql("p")).fetchall())
    assert got == want
