"""RRF fusion + retrieval metrics (ops/retrieval.py additions)."""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-rrf-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _fuse(spark, rows, k=60):
    from hickoryspark.ops.retrieval import rrf_fuse

    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, rank long")
    return sorted(tuple(r) for r in rrf_fuse(df, k=k).collect())


def _fuse_mirror(rows, k=60):
    from hickoryspark.ops.retrieval import duckdb_rrf_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE r(query_id BIGINT, doc_id BIGINT,"
                " rank BIGINT)")
    con.executemany("INSERT INTO r VALUES (?,?,?)", rows)
    got = con.execute(duckdb_rrf_sql("r", k=k)).fetchall()
    con.close()
    return sorted(tuple(r) for r in got)


def test_rrf_fusion_and_ties(spark):
    rows = [
        (1, 10, 1), (1, 11, 2),   # source A
        (1, 11, 1), (1, 12, 2),   # source B: doc 11 tops both-ish
    ]
    got = _fuse(spark, rows, k=0)
    by = {r[1]: r for r in got}
    assert by[11][2] == 1000000 + 500000 and by[11][3] == 1
    assert by[10][2] == 1000000 and by[10][3] == 2
    assert by[12][2] == 500000 and by[12][3] == 3
    assert got == _fuse_mirror(rows, k=0)


def test_rrf_fuzz_vs_mirror(spark):
    rng = random.Random(37)
    rows = []
    for q in range(4):
        for src in range(3):
            docs = rng.sample(range(20), rng.randint(0, 8))
            rows += [(q, d, i + 1) for i, d in enumerate(docs)]
    assert _fuse(spark, rows) == _fuse_mirror(rows)


def _metrics(spark, rankings, qrels, k=10):
    from hickoryspark.ops.retrieval import retrieval_metrics

    r = spark.createDataFrame(
        rankings, "query_id long, doc_id long, rank long")
    q = spark.createDataFrame(qrels, "query_id long, doc_id long")
    return sorted(tuple(x) for x in
                  retrieval_metrics(r, q, k=k).collect())


def test_metrics(spark):
    rankings = [(1, 10, 1), (1, 11, 2), (1, 12, 3),
                (2, 20, 1), (2, 21, 2)]
    qrels = [(1, 11), (1, 99), (2, 77), (3, 30)]
    got = _metrics(spark, rankings, qrels, k=2)
    assert got == [
        (1, 2, 1, 500, 500),   # first rel at rank 2
        (2, 1, 0, 0, 0),       # rel doc never retrieved
        (3, 1, 0, 0, 0),       # query with no ranking rows at all
    ]
    from hickoryspark.ops.retrieval import duckdb_retrieval_metrics_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE rk(query_id BIGINT, doc_id BIGINT,"
                " rank BIGINT)")
    con.execute("CREATE TABLE qr(query_id BIGINT, doc_id BIGINT)")
    con.executemany("INSERT INTO rk VALUES (?,?,?)", rankings)
    con.executemany("INSERT INTO qr VALUES (?,?)", qrels)
    exp = sorted(tuple(r) for r in con.execute(
        duckdb_retrieval_metrics_sql("rk", "qr", 2)).fetchall())
    con.close()
    assert got == exp
