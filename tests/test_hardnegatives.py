"""Hard-negative mining (ops/retrieval.mine_hard_negatives):
positive exclusion, re-rank, pool bound, mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.retrieval import (  # noqa: E402
    duckdb_hard_negatives_sql,
)

DOCS = [
    (0, "spark join shuffle"),
    (1, "join order planner"),
    (2, "window sort join"),
    (3, "cats and dogs"),
    (4, "join join join"),
]
QUERIES = [(0, "join"), (1, "cats")]
POSITIVES = [(0, 4), (1, 3)]


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-hn-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, k=2, pool_extra=2):
    from hickoryspark.ops.retrieval import mine_hard_negatives

    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "query_id long, query string")
    p = spark.createDataFrame(POSITIVES, "query_id long, doc_id long")
    return sorted(tuple(r) for r in
                  mine_hard_negatives(d, q, p, k, pool_extra).collect())


def test_exclusion_and_rerank(spark):
    got = _run(spark)
    by_q = {}
    for r in got:
        by_q.setdefault(r[0], []).append(r)
    # query 0: doc 4 (top positive) excluded; negatives re-rank 1..2
    q0 = by_q[0]
    assert [r[3] for r in q0] == [1, 2]
    assert all(r[1] != 4 for r in q0)
    # query 1: only doc 3 matches "cats" and it's the positive ->
    # zero negatives survive
    assert 1 not in by_q


def test_mirror_agreement(spark):
    got = _run(spark)
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    con.execute("CREATE TABLE p (query_id BIGINT, doc_id BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", POSITIVES)
    qv = ", ".join(f"({i}, '{q}')" for i, q in QUERIES)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_hard_negatives_sql("d", qv, "p", k=2,
                                  pool_extra=2)).fetchall())
    assert got == want
