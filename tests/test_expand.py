"""PRF query expansion (ops/retrieval.expand_queries): feedback LM
weights, original-term exclusion, tie rank, mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.retrieval import duckdb_expand_sql  # noqa: E402

DOCS = [
    (1, "spark join batch batch"),
    (2, "spark merge merge sort"),
    (3, "unrelated words entirely"),
    (4, "spark alone"),
]
QUERIES = [(0, "spark")]
QV = "(0, 'spark')"


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-expand-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, fb_k=2, n_terms=3):
    from hickoryspark.ops.retrieval import expand_queries

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, query string")
    return sorted(tuple(r) for r in expand_queries(
        docs, qs, fb_k=fb_k, n_terms=n_terms).collect())


def test_expansion_terms(spark):
    got = _run(spark)
    # fb docs for 'spark' (k=2) = the two highest-BM25 matches; the
    # original term 'spark' itself must be excluded, weights are
    # milli shares of the feedback token mass, ties by term asc
    terms = [t for _, t, _, _ in got]
    assert "spark" not in terms
    assert len(terms) == 3
    ranks = [r for *_, r in got]
    assert sorted(ranks) == [1, 2, 3]


def test_mirror_agreement(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_expand_sql("d", QV, fb_k=2, n_terms=3)).fetchall())
    assert _run(spark) == want


def test_no_match_query_emits_nothing(spark):
    from hickoryspark.ops.retrieval import expand_queries

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame([(9, "absentterm")],
                               "query_id long, query string")
    assert expand_queries(docs, qs).count() == 0
