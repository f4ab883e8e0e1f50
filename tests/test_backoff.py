"""Stupid Backoff (ops/backoff.py): level selection, exact score
arithmetic, oov, mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.backoff import duckdb_backoff_sql  # noqa: E402

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ran"),
    (2, "a dog sat"),
]
# corpus: c(the cat)=2, c(the cat sat)=1, c(cat sat)=1, c(sat)=2,
# c(on)=1, N=12
QUERIES = [
    (0, "the", "cat", "sat"),   # trigram: 1e6*1//2
    (1, "a", "cat", "sat"),     # no trigram; bigram cat sat: 4e5*1//2
    (2, "x", "y", "sat"),       # unigram: 16e4*2//12
    (3, "x", "y", "zebra"),     # oov
]


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-bo-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark):
    from hickoryspark.ops.backoff import stupid_backoff_scores

    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(
        QUERIES, "qid long, w1 string, w2 string, w3 string")
    return {r["qid"]: (r["level"], r["score_micro"])
            for r in stupid_backoff_scores(d, q).collect()}


def test_levels_and_scores(spark):
    got = _run(spark)
    assert got[0] == ("trigram", 1000000 * 1 // 2)
    assert got[1] == ("bigram", 400000 * 1 // 2)
    assert got[2] == ("unigram", 160000 * 2 // 12)
    assert got[3] == ("oov", 0)


def test_mirror_agreement(spark):
    got = _run(spark)
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    con.execute("CREATE TABLE q (qid BIGINT, w1 VARCHAR, w2 VARCHAR,"
                " w3 VARCHAR)")
    con.executemany("INSERT INTO q VALUES (?, ?, ?, ?)", QUERIES)
    want = {r[0]: (r[4], r[5]) for r in con.execute(
        duckdb_backoff_sql("d", "q")).fetchall()}
    assert got == want
