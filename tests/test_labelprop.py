"""Deterministic label propagation (ops/labelprop.py): synchronous
update + tie rule, convergence on cliques, community separation,
rounds=0 identity, mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.labelprop import duckdb_labelprop_sql  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-lpa-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, edges, rounds):
    from hickoryspark.ops.labelprop import label_propagation

    df = spark.createDataFrame(edges, "src string, dst string")
    return dict(
        (r["node"], r["label"])
        for r in label_propagation(df, rounds).collect())


def _duck(edges, rounds):
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    return dict(con.execute(duckdb_labelprop_sql("e", rounds)).fetchall())


TRI = [("a", "b"), ("b", "c"), ("c", "a")]


def test_triangle_converges_to_min(spark):
    # round 1: every node tie-breaks to its smallest neighbor;
    # round 2: majority pulls everything to 'a'
    assert _run(spark, TRI, 1) == {"a": "b", "b": "a", "c": "a"}
    assert _run(spark, TRI, 2) == {"a": "a", "b": "a", "c": "a"}


def test_two_communities_with_bridge(spark):
    edges = (TRI + [("x", "y"), ("y", "z"), ("z", "x")]
             + [("c", "x")])  # weak bridge
    got = _run(spark, edges, 4)
    assert got["a"] == got["b"] == got["c"] == "a"
    # the x-triangle keeps its own community despite the bridge
    assert got["x"] == got["y"] == got["z"]
    assert got["x"] != "a"


def test_rounds_zero_and_normalization(spark):
    # self-loops, reversed duplicates, NULL endpoints all drop
    edges = [("a", "b"), ("b", "a"), ("a", "a"), (None, "b")]
    assert _run(spark, edges, 0) == {"a": "a", "b": "b"}


def test_mirror_agreement(spark):
    edges = [(f"n{i}", f"n{(i + 1) % 5 + 5 * (i // 5)}")
             for i in range(25)] + [("n0", "n5"), ("n10", "n20")]
    for rounds in (1, 3):
        assert _run(spark, edges, rounds) == _duck(edges, rounds)
