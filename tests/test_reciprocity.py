"""Host reciprocity (ops/hostgraph.host_reciprocity): reciprocal
detection, self-loop exclusion, mutual-weight tie rule, milli share,
DuckDB mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.hostgraph import duckdb_reciprocity_sql  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-recip-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


# url-grain edges; hosts fold via url_host (case fold exercised)
EDGES = [
    # a <-> b mutual (weight 2 fwd, 1 back -> mutual 1)
    ("https://A.ex/p", "https://b.ex/x"),
    ("https://a.ex/q", "https://b.ex/y"),
    ("https://b.ex/r", "https://a.ex/z"),
    # a -> c reciprocated with weight 3 back -> mutual 1 (> b's? same)
    ("https://a.ex/p", "https://c.ex/x"),
    ("https://c.ex/1", "https://a.ex/"),
    ("https://c.ex/2", "https://a.ex/"),
    ("https://c.ex/3", "https://a.ex/"),
    # a -> d one-way
    ("https://a.ex/p", "https://d.ex/"),
    # e: only self-loops -> absent
    ("https://e.ex/p", "https://e.ex/q"),
    # a self-loop ignored
    ("https://a.ex/p", "https://a.ex/q"),
]


def _spark_rows(spark, edges):
    from hickoryspark.ops.hostgraph import host_edges, host_reciprocity

    df = spark.createDataFrame(edges, "url string, resolved string")
    return sorted(tuple(r) for r in
                  host_reciprocity(host_edges(df)).collect())


def _duck_rows(edges):
    con = duckdb.connect()
    con.execute("CREATE TABLE links (url VARCHAR, resolved VARCHAR)")
    con.executemany("INSERT INTO links VALUES (?, ?)", edges)
    return sorted(tuple(r) for r in
                  con.execute(duckdb_reciprocity_sql("links")).fetchall())


def test_semantics(spark):
    rows = {r[0]: r for r in _spark_rows(spark, EDGES)}
    # a: out pairs b,c,d; b and c reciprocal; mutual weights both 1
    # -> tie broken host-ascending = b
    assert rows["a.ex"] == ("a.ex", 3, 2, 666, "b.ex")
    # b: one out pair (a), reciprocal, mutual min(1,2)=1
    assert rows["b.ex"] == ("b.ex", 1, 1, 1000, "a.ex")
    # c: one out pair (a) weight 3, reciprocal (back weight 1)
    assert rows["c.ex"] == ("c.ex", 1, 1, 1000, "a.ex")
    # d has no out-edges; e only self-loops: both absent
    assert "d.ex" not in rows and "e.ex" not in rows


def test_mutual_weight_beats_tie(spark):
    edges = [
        ("https://s.ex/1", "https://z.ex/"),  # fwd 2
        ("https://s.ex/2", "https://z.ex/"),
        ("https://z.ex/1", "https://s.ex/"),  # back 2 -> mutual 2
        ("https://z.ex/2", "https://s.ex/"),
        ("https://s.ex/1", "https://a.ex/"),  # fwd 1
        ("https://a.ex/1", "https://s.ex/"),  # mutual 1
    ]
    rows = {r[0]: r for r in _spark_rows(spark, edges)}
    # z's mutual weight 2 beats a's 1 despite a < z alphabetically
    assert rows["s.ex"][4] == "z.ex"


def test_mirror_agreement(spark):
    assert _spark_rows(spark, EDGES) == _duck_rows(EDGES)
