"""k-core peeling (ops/kcore.py): closed-form graphs, multi-round
peeling (path tails), randomized cross-check vs an independent
sequential peeler, hygiene, empty cores."""

from __future__ import annotations

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-kcore-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, edges, k):
    from hickoryspark.ops.kcore import k_core

    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["degree"] for r in k_core(df, k).collect()}


def _ref_peel(edges, k):
    adj = {}
    es = set()
    for a, b in edges:
        if a is None or b is None or a == b:
            continue
        a, b = min(a, b), max(a, b)
        if (a, b) not in es:
            es.add((a, b))
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(v) for n, v in adj.items()}


def test_k4_is_its_own_3core(spark):
    import itertools

    edges = list(itertools.combinations(["a", "b", "c", "d"], 2))
    assert _run(spark, edges, 3) == {n: 3 for n in "abcd"}


def test_path_peels_to_empty(spark):
    edges = [(f"p{i}", f"p{i+1}") for i in range(9)]
    assert _run(spark, edges, 2) == {}


def test_cycle_is_2core(spark):
    edges = [(f"c{i}", f"c{(i+1) % 6}") for i in range(6)]
    assert _run(spark, edges, 2) == {f"c{i}": 2 for i in range(6)}


def test_clique_with_squared_tail_multi_round(spark):
    import itertools

    clique = list(itertools.combinations([f"c{i}" for i in range(6)], 2))
    # SQUARED path: (i,i+1) + (i,i+2) — under k=3 the erosion
    # cascades one node per round from the free end (9 rounds,
    # simulated), exercising the per-round localCheckpoint path;
    # a plain path would peel entirely in round 1 at k=3
    tail = [(f"p{i}", f"p{i+1}") for i in range(9)] + \
           [(f"p{i}", f"p{i+2}") for i in range(8)]
    edges = clique + tail + [("c0", "p0")]
    assert _run(spark, edges, 3) == {f"c{i}": 5 for i in range(6)}


def test_random_vs_reference(spark):
    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(24)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(70)]
    for k in (2, 3):
        assert _run(spark, edges, k) == _ref_peel(edges, k)


def test_hygiene_and_guard(spark):
    from hickoryspark.ops.kcore import k_core

    assert _run(spark, [("a", "a"), ("a", None)], 1) == {}
    with pytest.raises(ValueError):
        df = None
        k_core(df, 0)
