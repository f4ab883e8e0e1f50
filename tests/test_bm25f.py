"""BM25F fielded retrieval (ops/retrieval.bm25f_scores): field
weighting, NULL fields, degenerate single-field equivalence to BM25,
mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.retrieval import duckdb_bm25f_sql  # noqa: E402

DOCS = [
    (1, "spark engine", "slow batch join merge"),
    (2, None, "spark spark join"),          # NULL title
    (3, "join order", "window sort"),
    (4, "quiet", "nothing relevant here"),
]
QUERIES = [(0, "spark"), (1, "join sort")]
QV = "(0, 'spark'), (1, 'join sort')"


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-bm25f-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, fields=(("title", 3), ("text", 1))):
    from hickoryspark.ops.retrieval import bm25f_scores

    docs = spark.createDataFrame(
        DOCS, "doc_id long, title string, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, query string")
    return sorted(tuple(r)
                  for r in bm25f_scores(docs, qs, fields).collect())


def test_title_boost_raises_title_hits(spark):
    boosted = {(r[0], r[1]): r[2] for r in _run(spark)}
    flat = {(r[0], r[1]): r[2]
            for r in _run(spark, fields=(("title", 1), ("text", 1)))}
    # doc 1's only 'spark' hit is in the title: tripling the title
    # weight must raise its score (1375 vs 830 milli), both absolutely
    # and relative to body-only doc 2 (whose shorter weighted dl still
    # keeps it rank 1 here — boost changes scores, not this ordering)
    assert boosted[(0, 1)] > flat[(0, 1)]
    assert (boosted[(0, 1)] * flat[(0, 2)]
            > flat[(0, 1)] * boosted[(0, 2)])
    assert {k for k in boosted} == {k for k in flat}


def test_mirror_agreement(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, title VARCHAR,"
                " text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", DOCS)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_bm25f_sql("d", QV)).fetchall())
    assert _run(spark) == want


def test_single_unit_field_equals_bm25(spark):
    from hickoryspark.ops.retrieval import bm25_scores

    docs = spark.createDataFrame(
        DOCS, "doc_id long, title string, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, query string")
    got = _run(spark, fields=(("text", 1),))
    want = sorted(tuple(r)
                  for r in bm25_scores(docs, qs).collect())
    assert got == want
