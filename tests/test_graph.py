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


# ---------------------------------------------------------------- bfs


def _py_bfs(edges, seeds, max_depth):
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    for r in range(1, max_depth + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = r
                    nxt.append(v)
        if not nxt:
            break
        frontier = nxt
    return dist


def test_bfs_depth_matches_reference(spark):
    from hickoryspark.ops.graph import bfs_depth

    # chain 0->1->2->3, branch 1->4, cycle back 3->0, island 9->10
    E = [(0, 1), (1, 2), (2, 3), (1, 4), (3, 0), (9, 10)]
    edges = spark.createDataFrame(E, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {r["id"]: r["depth"] for r in bfs_depth(edges, seeds, 10).collect()}
    want = _py_bfs(E, [0], 10)
    assert {k: v for k, v in got.items() if v is not None} == want
    assert got[9] is None and got[10] is None  # unreachable island
    # depth cap: with max_depth=1 only 0 and its successors settle
    got1 = {r["id"]: r["depth"] for r in bfs_depth(edges, seeds, 1).collect()}
    assert got1 == {0: 0, 1: 1, 2: None, 3: None, 4: None, 9: None, 10: None}
    # multiple seeds: min distance wins, seed depth is 0 even with in-edges
    seeds2 = spark.createDataFrame([(0,), (3,)], "id long")
    got2 = {r["id"]: r["depth"]
            for r in bfs_depth(edges, seeds2, 10).collect()}
    assert got2[3] == 0 and got2[0] == 0 and got2[1] == 1 and got2[2] == 2


def test_bfs_depth_partition_invariant_and_validation(spark):
    from hickoryspark.ops.graph import bfs_depth

    E = [(i, (i * 3 + 1) % 20) for i in range(20)]
    edges = spark.createDataFrame(E, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (7,)], "id long")
    a = sorted(bfs_depth(edges, seeds, 5).collect())
    b = sorted(bfs_depth(edges.repartition(7), seeds, 5).collect())
    assert a == b
    with pytest.raises(ValueError):
        bfs_depth(edges, seeds, -1)


# ---------------------------------------------------------------- hits


def _py_hits(edges, nodes, n_iter, scale=10**6):
    hub = {v: scale for v in nodes}
    auth = {v: scale for v in nodes}

    def norm(raw):
        mx = max(raw.values()) if raw else 0
        if mx <= 0:
            return {v: 0 for v in nodes}
        return {v: (raw.get(v, 0) * scale) // mx for v in nodes}

    for _ in range(n_iter):
        ra = defaultdict(int)
        for s, d in edges:
            ra[d] += hub[s]
        auth = norm(ra)
        rh = defaultdict(int)
        for s, d in edges:
            rh[s] += auth[d]
        hub = norm(rh)
    return hub, auth


def test_hits_matches_reference_and_partition_invariant(spark):
    from hickoryspark.ops.graph import hits

    E = [(0, 1), (0, 2), (1, 2), (3, 2), (2, 0), (2, 0)]  # multi-edge
    nodes = list(range(5))  # 4 is isolated
    edges = spark.createDataFrame(E, "src long, dst long")
    ndf = spark.createDataFrame([(i,) for i in nodes], "id long")
    want_h, want_a = _py_hits(E, nodes, 3)
    rows = hits(edges, 3, nodes=ndf).collect()
    got_h = {r["id"]: r["hub_e6"] for r in rows}
    got_a = {r["id"]: r["auth_e6"] for r in rows}
    assert got_h == want_h and got_a == want_a
    # node 2 has max in-mass -> top authority at exactly scale
    assert got_a[2] == 10**6
    assert got_h[4] == 0 and got_a[4] == 0  # isolated
    rows7 = hits(edges.repartition(7), 3, nodes=ndf).collect()
    assert sorted(map(tuple, rows7)) == sorted(map(tuple, rows))


def test_hits_empty_edges(spark):
    from hickoryspark.ops.graph import hits

    edges = spark.createDataFrame([], "src long, dst long")
    ndf = spark.createDataFrame([(1,), (2,)], "id long")
    got = {r["id"]: (r["hub_e6"], r["auth_e6"])
           for r in hits(edges, 2, nodes=ndf).collect()}
    assert got == {1: (0, 0), 2: (0, 0)}
