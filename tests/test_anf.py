"""ANF reach sketches (ops/anf.py): exact regime = true h-hop
neighborhood counts, sketch regime accuracy, hops=0, mirror
agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.anf import duckdb_anf_sql  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-anf-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, edges, hops, k):
    from hickoryspark.ops.anf import neighborhood_reach

    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: (r["n_state"], r["est_reach"])
            for r in neighborhood_reach(df, hops, k).collect()}


def test_exact_regime_matches_true_reach(spark):
    # path a-b-c-d plus isolated pair x-y; k large -> exact counts
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")]
    got = _run(spark, edges, hops=2, k=64)
    # 2-hop reach on the path: a:{a,b,c}, b:{all4}, c:{all4}, d:{b,c,d}
    assert got["a"] == (3, 3.0)
    assert got["b"] == (4, 4.0)
    assert got["c"] == (4, 4.0)
    assert got["d"] == (3, 3.0)
    assert got["x"] == (2, 2.0) and got["y"] == (2, 2.0)


def test_hops_zero_is_self(spark):
    got = _run(spark, [("a", "b")], hops=0, k=8)
    assert got["a"] == (1, 1.0) and got["b"] == (1, 1.0)


def test_sketch_regime_estimates(spark):
    # star: hub reaches all 200 spokes in 1 hop; k=16 engages the
    # estimator — it should land within a factor ~2 of truth
    edges = [("hub", f"s{i}") for i in range(200)]
    got = _run(spark, edges, hops=1, k=16)
    n_state, est = got["hub"]
    assert n_state == 16
    assert 100 < est < 400


def test_mirror_agreement(spark):
    edges = ([(f"n{i}", f"n{(i * 3 + 1) % 40}") for i in range(40)]
             + [("n0", "n20")])
    for hops, k in ((1, 8), (2, 16), (3, 64)):
        got = _run(spark, edges, hops, k)
        con = duckdb.connect()
        con.execute("CREATE TABLE e (src VARCHAR, dst VARCHAR)")
        con.executemany("INSERT INTO e VALUES (?, ?)", edges)
        want = {r[0]: (r[1], r[2]) for r in con.execute(
            duckdb_anf_sql("e", hops, k)).fetchall()}
        con.close()
        assert got == want, (hops, k)
