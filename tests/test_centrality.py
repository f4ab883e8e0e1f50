"""HyperBall harmonic centrality (ops/centrality.py): exact-regime
values on small graphs, center-dominance, mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.centrality import duckdb_hyperball_sql  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-hb-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, edges, hops=3, k=64):
    from hickoryspark.ops.centrality import hyperball_harmonic

    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: tuple(r)[1:]
            for r in hyperball_harmonic(df, hops, k).collect()}


def test_exact_path_centrality(spark):
    # path a-b-c-d-e: center c has harmonic 2/1 + 2/2 + 0/3 = 3.0
    # with exact (k=64) counts at hops=3
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    got = _run(spark, edges)
    # c: est1=3 (self+b+d), est2=5, est3=5
    assert got["c"] == (3.0, 5.0, 5.0, (3 - 1) / 1 + (5 - 3) / 2 + 0.0)
    # a: est1=2, est2=3, est3=4 -> 1 + 0.5 + 1/3
    a = got["a"]
    assert a[:3] == (2.0, 3.0, 4.0)
    assert abs(a[3] - (1 + 0.5 + 1 / 3)) < 1e-12
    # center strictly beats the end
    assert got["c"][3] > got["a"][3]


def test_mirror_agreement(spark):
    edges = ([(f"n{i}", f"n{(i * 3 + 1) % 30}") for i in range(30)]
             + [("n0", "n15")])
    for hops, k in ((2, 8), (3, 16)):
        got = _run(spark, edges, hops, k)
        con = duckdb.connect()
        con.execute("CREATE TABLE e (src VARCHAR, dst VARCHAR)")
        con.executemany("INSERT INTO e VALUES (?, ?)", edges)
        want = {r[0]: tuple(r)[1:] for r in con.execute(
            duckdb_hyperball_sql("e", hops, k)).fetchall()}
        con.close()
        assert got == want, (hops, k)
