"""KMV distinct sketch (ops/sketch.py): bottom-k state, exact
regime, estimator accuracy, mergeability, two-level pruning
equivalence, DuckDB mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.sketch import (  # noqa: E402
    duckdb_kmv_estimate_sql,
    duckdb_kmv_sql,
)


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-kmv-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _df(spark, rows):
    return spark.createDataFrame(rows, "grp string, key string")


def test_state_and_exact_regime(spark):
    from hickoryspark.ops.sketch import kmv_estimate, kmv_state

    rows = ([("a", f"k{i}") for i in range(100)]
            + [("a", "k5")]          # duplicate collapses
            + [("b", "x"), ("b", "y"), ("b", None)])
    state = kmv_state(_df(spark, rows), k=16)
    got = sorted((r["grp"], r["rank"]) for r in state.collect())
    assert [g for g in got if g[0] == "a"] == [("a", i) for i in range(1, 17)]
    assert [g for g in got if g[0] == "b"] == [("b", 1), ("b", 2)]
    # hashes ascend with rank
    hs = [r["h"] for r in sorted(state.where("grp='a'").collect(),
                                 key=lambda r: r["rank"])]
    assert hs == sorted(hs) and len(set(hs)) == 16
    est = {r["grp"]: r for r in kmv_estimate(state, k=16).collect()}
    assert est["b"]["n_state"] == 2 and est["b"]["est_distinct"] == 2.0
    # estimator lands near 100 for the filled group
    assert 50 < est["a"]["est_distinct"] < 200


def test_merge_equals_full_build(spark):
    from hickoryspark.ops.sketch import kmv_merge, kmv_state

    rows = [("g", f"k{i}") for i in range(200)]
    full = kmv_state(_df(spark, rows), k=32)
    left = kmv_state(_df(spark, rows[:90]), k=32)
    right = kmv_state(_df(spark, rows[90:]), k=32)
    merged = kmv_merge(left, right, k=32)
    assert sorted(map(tuple, full.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_mirror_agreement(spark):
    from hickoryspark.ops.sketch import kmv_estimate, kmv_state

    rows = ([("a", f"u{i * 7}") for i in range(300)]
            + [("b", f"v{i % 5}") for i in range(40)])
    state = kmv_state(_df(spark, rows), k=24)
    est = kmv_estimate(state, k=24)
    con = duckdb.connect()
    con.execute("CREATE TABLE src (grp VARCHAR, key VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?, ?)", rows)
    want_state = sorted(tuple(r) for r in con.execute(
        duckdb_kmv_sql("src", k=24)).fetchall())
    want_est = sorted(tuple(r) for r in con.execute(
        duckdb_kmv_estimate_sql("src", k=24)).fetchall())
    assert sorted(tuple(r) for r in state.collect()) == want_state
    assert sorted(tuple(r) for r in est.collect()) == want_est
