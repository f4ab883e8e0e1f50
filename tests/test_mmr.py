"""MMR diversified reranking (ops/retrieval.mmr_rerank): hand-derived
pick order, tie rule, missing-sim = 0, short pools, mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.retrieval import duckdb_mmr_sql  # noqa: E402

# query 1: doc 10 rel 900, doc 11 rel 880, doc 12 rel 500.
# sim(10,11)=950 (near-dup), sim(10,12)=100, sim(11,12)=0 (absent).
# lambda=700: r1 -> 10 (630000). r2: 11 = 700*880-300*950=331000,
#   12 = 700*500-300*100=320000 -> 11. r3 -> 12 (350000-300*100=320000;
#   max sim vs {10,11} = max(100, 0) = 100).
# query 2: two docs EQUAL rel 600, no sims -> tie breaks to smaller
#   doc_id each round.
CAND = [
    (1, 10, 900), (1, 11, 880), (1, 12, 500),
    (2, 21, 600), (2, 20, 600),
]
SIMS = [(1, 10, 11, 950), (1, 12, 10, 100)]  # mixed orientations


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-mmr-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, k=3):
    from hickoryspark.ops.retrieval import mmr_rerank

    cand = spark.createDataFrame(
        CAND, "query_id long, doc_id long, rel_milli long")
    sims = spark.createDataFrame(
        SIMS, "query_id long, a long, b long, sim_milli long")
    return sorted(tuple(r) for r in mmr_rerank(cand, sims, k=3).collect())


def test_pick_order(spark):
    got = _run(spark)
    assert got == sorted([
        (1, 1, 10, 630000), (1, 2, 11, 331000), (1, 3, 12, 320000),
        (2, 1, 20, 420000), (2, 2, 21, 420000),  # tie -> doc_id asc
    ])


def test_mirror_agreement(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE mc (query_id BIGINT, doc_id BIGINT,"
        " rel_milli BIGINT)")
    con.executemany("INSERT INTO mc VALUES (?, ?, ?)", CAND)
    con.execute(
        "CREATE TABLE msim (query_id BIGINT, a BIGINT, b BIGINT,"
        " sim_milli BIGINT)")
    con.executemany("INSERT INTO msim VALUES (?, ?, ?, ?)", SIMS)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_mmr_sql("mc", "msim", k=3)).fetchall())
    assert _run(spark) == want
