"""Levenshtein near-dup pairs (ops/editdist.py): verification rule,
blocking recall/loss, orientation, the ASCII-only mirror contract
(byte-vs-char levenshtein divergence), plan guard, mirror fuzz."""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.editdist import (  # noqa: E402
    duckdb_levenshtein_pairs_sql, levenshtein_pairs)


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-editdist-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, title string")
    return sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in levenshtein_pairs(df, **kw).collect())


def test_pairs_and_blocking(spark):
    rows = [(1, "Spark Guide"), (2, "Spark Guide!"), (3, "Spark Guido"),
            (4, "Flink Guide"),        # different prefix: no pair
            (5, "Spark Guide extended ed."),  # length band exceeded
            (6, None)]
    assert _run(spark, rows) == [
        (1, 2, 1), (1, 3, 1), (2, 3, 2)]


def test_exact_dupes_distance_zero(spark):
    assert _run(spark, [(1, "abc"), (2, "abc")]) == [(1, 2, 0)]


def test_ascii_mirror_divergence_documented(spark):
    # Spark: char-based -> dist 1; DuckDB byte-based would say 2.
    # The op is correct standalone; only the MIRROR is ASCII-pinned.
    assert _run(spark, [(1, "café"), (2, "cafe")]) == [(1, 2, 1)]
    assert duckdb.sql(
        "SELECT levenshtein('café', 'cafe')").fetchone()[0] == 2


def test_plan_no_bnlj(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, title string")
    plan = levenshtein_pairs(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_mirror_fuzz(spark):
    rng = random.Random(13)
    words = ["spark", "sparc", "spars", "guide", "guide!", "guids",
             "flink", "flint"]
    rows = [(i, rng.choice(words) + (" x" * rng.randint(0, 2)))
            for i in range(40)]
    got = _run(spark, rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, title VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_levenshtein_pairs_sql("t")).fetchall())
    assert got == want
