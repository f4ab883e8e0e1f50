"""Exact-integer PageRank (ops/graph.py): recurrence vs a python
reference, partition invariance (the point of integer arithmetic),
multi-edges, dangling nodes, isolated nodes, damping extremes."""

from __future__ import annotations

import os
import sys
from collections import defaultdict

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-graph-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _py_pagerank(edges, n_iter=3, damping=85, scale=10**12, node_ids=None):
    nodes = set(node_ids or ())
    for s, d in edges:
        nodes.add(s)
        nodes.add(d)
    n = len(nodes)
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    tele = (scale * (100 - damping) // 100) // n
    rank = {v: scale // n for v in nodes}
    for _ in range(n_iter):
        nxt = {v: tele for v in nodes}
        for s, d in edges:
            nxt[d] += (rank[s] * damping) // (100 * outdeg[s])
        rank = nxt
    return rank


EDGES = [(0, 1), (1, 2), (2, 0), (2, 1), (2, 1), (3, 0), (4, 2)]
# node 5 is isolated (declared via nodes=), node 3/4 are dangling-free,
# node 1 gets a double vote from 2 (multi-edge)


def test_matches_python_reference_and_partition_invariant(spark):
    from hickoryspark.ops.graph import pagerank

    edges = spark.createDataFrame(EDGES, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
    want = _py_pagerank(EDGES, node_ids=range(6))
    got = {r["id"]: r["rank_e12"]
           for r in pagerank(edges, 3, nodes=nodes).collect()}
    assert got == want
    got7 = {r["id"]: r["rank_e12"]
            for r in pagerank(edges.repartition(7), 3, nodes=nodes).collect()}
    assert got7 == want        # bit-identical under repartitioning
    # multi-edge double vote: node 1 outranks node 0
    assert got[1] > got[0]
    # isolated node ends at teleport mass only
    tele = (10**12 * 15 // 100) // 6
    assert got[5] == tele


def test_dangling_mass_drops_not_crashes(spark):
    from hickoryspark.ops.graph import pagerank

    # 1 is a sink: its mass is dropped each iteration (documented)
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = {r["id"]: r["rank_e12"] for r in pagerank(edges, 2).collect()}
    assert got == _py_pagerank([(0, 1)], n_iter=2)
    assert sum(got.values()) < 10**12   # mass decays, never grows


def test_damping_extremes(spark):
    from hickoryspark.ops.graph import pagerank

    edges = spark.createDataFrame(EDGES, "src long, dst long")
    # damping 0: pure teleport — every node identical
    flat = {r["rank_e12"] for r in pagerank(edges, 2, damping_pct=0).collect()}
    assert len(flat) == 1
    with pytest.raises(ValueError):
        pagerank(edges, 1, damping_pct=101)
