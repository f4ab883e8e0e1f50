"""Triangle counting (ops/trianglecount.py): known closed-form
graphs, input hygiene (self-loops / duplicates / reversed edges /
NULLs), a randomized brute-force cross-check, the DuckDB mirror, and
a plan guard (the wedge join must stay an equi-join — never
BroadcastNestedLoop)."""

from __future__ import annotations

import itertools
import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.trianglecount import (  # noqa: E402
    duckdb_triangles_sql, triangle_counts)


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-tri-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: (r["degree"], r["n_triangles"], r["cc_milli"])
            for r in triangle_counts(df).collect()}


def test_single_triangle(spark):
    out = _run(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    assert out == {"a": (2, 1, 1000), "b": (2, 1, 1000),
                   "c": (2, 1, 1000)}


def test_k4_all_nodes_three_triangles(spark):
    edges = [(u, v) for u, v in
             itertools.combinations(["a", "b", "c", "d"], 2)]
    out = _run(spark, edges)
    assert all(out[n] == (3, 3, 1000) for n in "abcd")


def test_square_with_diagonal(spark):
    out = _run(spark, [("a", "b"), ("b", "c"), ("c", "d"),
                       ("d", "a"), ("a", "c")])
    assert out["a"] == (3, 2, 666)
    assert out["c"] == (3, 2, 666)
    assert out["b"] == (2, 1, 1000)
    assert out["d"] == (2, 1, 1000)


def test_star_and_path_have_no_triangles(spark):
    out = _run(spark, [("hub", "x"), ("hub", "y"), ("hub", "z")])
    assert out["hub"] == (3, 0, 0)
    assert out["x"] == (1, 0, 0)


def test_input_hygiene(spark):
    # self-loop drops, duplicate + reversed edges collapse, NULL drops
    out = _run(spark, [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b"),
                       ("b", "c"), ("c", "a"), (None, "b"), ("a", None)])
    assert out == {"a": (2, 1, 1000), "b": (2, 1, 1000),
                   "c": (2, 1, 1000)}


def _brute(edges):
    adj = {}
    es = set()
    for a, b in edges:
        if a is None or b is None or a == b:
            continue
        a, b = min(a, b), max(a, b)
        if (a, b) in es:
            continue
        es.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return {
        n: (len(adj[n]), tri[n],
            (2000 * tri[n]) // (len(adj[n]) * (len(adj[n]) - 1))
            if len(adj[n]) >= 2 else 0)
        for n in adj
    }


def test_random_graph_vs_bruteforce_and_mirror(spark):
    rng = random.Random(42)
    nodes = [f"n{i}" for i in range(30)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)]
    want = _brute(edges)
    assert _run(spark, edges) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE ed (src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO ed VALUES (?, ?)", edges)
    got = {n: (d, t, c) for n, d, t, c in
           con.execute(duckdb_triangles_sql("ed")).fetchall()}
    assert got == want


def test_plan_no_bnlj(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string")
    plan = triangle_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
