"""Redirect resolution (ops/crawlgraph.py): chain following vs a
python reference, exact hop counts, terminals, cycles, budget,
functional-dedup of multi-edges."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-crawlgraph-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _py_resolve(edges, budget):
    f = {}
    for s, d in edges:
        f[s] = min(d, f.get(s, d))
    nodes = set(f) | {d for _, d in edges}
    out = {}
    for n in nodes:
        cur, hops = n, 0
        while cur in f and hops < budget:
            cur = f[cur]
            hops += 1
        out[n] = (cur, hops, int(cur not in f))
    return out


def test_chains_terminals_cycles_vs_reference(spark):
    from hickoryspark.ops.crawlgraph import resolve_redirects

    edges = [
        (1, 2), (2, 3), (3, 4),          # chain of 3 -> terminal 4
        (10, 11), (11, 10),              # 2-cycle
        (20, 4),                         # short hop to shared terminal
        (30, 31), (31, 32), (32, 33), (33, 34), (34, 35),
        (35, 36), (36, 37), (37, 38), (38, 39),  # 10-chain > budget 8
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["final_id"], r["hops"], r["resolved"])
           for r in resolve_redirects(df, rounds=3).collect()}
    want = _py_resolve(edges, 8)
    assert got == want
    assert got[1] == (4, 3, 1)
    assert got[4] == (4, 0, 1)           # terminal resolves to itself
    assert got[10][2] == 0 and got[10][1] == 8   # cycle: budget burned
    assert got[30] == (38, 8, 0)         # over-budget chain unresolved


def test_multi_edge_min_dst_wins_and_left_universe(spark):
    from hickoryspark.ops.crawlgraph import resolve_redirects

    df = spark.createDataFrame(
        [(1, 9), (1, 5), (5, 7)], "src long, dst long"
    )
    got = {r["node"]: (r["final_id"], r["hops"], r["resolved"])
           for r in resolve_redirects(df, rounds=2).collect()}
    assert got[1] == (7, 2, 1)           # min dst 5 chosen, then 7
    # narrowed universe: dst 7 missing from nodes, rows survive
    nodes = spark.createDataFrame([(1,), (5,)], "id long")
    got2 = {r["node"]: (r["final_id"], r["resolved"])
            for r in resolve_redirects(df, rounds=2, nodes=nodes).collect()}
    assert got2[1] == (7, 1) and got2[5] == (7, 1)


def _pg_nodes(spark, pages):
    from hickoryspark.spark.nodes_table import explode_nodes

    return explode_nodes(spark.createDataFrame(
        [(u, bytearray(h.encode())) for u, h in pages],
        "url string, html binary"))


def test_pagination_chain_and_first_next_wins(spark):
    from hickoryspark.ops.crawlgraph import pagination_chains

    pages = [
        # anchor form, case+multi-token rel, later decoy ignored
        ("https://s.ex/a/1",
         '<a rel="NEXT other" href="/a/2">n</a>'
         '<link rel="next" href="/decoy">'),
        ("https://s.ex/a/2", '<link rel="next" href="/a/3">'),
        ("https://s.ex/a/3", "<p>last</p>"),
    ]
    got = {r["url"]: r for r in pagination_chains(
        _pg_nodes(spark, pages)).collect()}
    assert got["https://s.ex/a/1"]["next_url"] == "https://s.ex/a/2"
    for u, hops in [("https://s.ex/a/1", 2), ("https://s.ex/a/2", 1),
                    ("https://s.ex/a/3", 0)]:
        assert got[u]["seq_last"] == "https://s.ex/a/3"
        assert got[u]["hops_to_last"] == hops
        assert got[u]["resolved"] == 1


def test_pagination_cycle_unresolved_and_universe(spark):
    from hickoryspark.ops.crawlgraph import pagination_chains

    pages = [
        ("https://s.ex/c/1", '<link rel="next" href="/c/2">'),
        ("https://s.ex/c/2", '<link rel="next" href="/c/1">'),
        ("https://s.ex/solo", "<p>standalone</p>"),
    ]
    uni = _pg_nodes(spark, pages).sparkSession.createDataFrame(
        [(u,) for u, _ in pages], "url string")
    got = {r["url"]: r for r in pagination_chains(
        _pg_nodes(spark, pages), rounds=3, universe=uni).collect()}
    # 2-cycle, 2**3 = 8 hops budget: back at self, unresolved
    assert got["https://s.ex/c/1"]["resolved"] == 0
    assert got["https://s.ex/c/1"]["hops_to_last"] == 8
    assert got["https://s.ex/c/1"]["seq_last"] == "https://s.ex/c/1"
    # standalone page kept by the explicit universe: terminal of itself
    s = got["https://s.ex/solo"]
    assert (s["next_url"], s["hops_to_last"], s["resolved"]) == (
        None, 0, 1)
    assert s["seq_last"] == "https://s.ex/solo"
